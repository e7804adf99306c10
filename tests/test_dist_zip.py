"""The committed spark-submit bundle must match the source tree.

A stale dist/bids_spark.zip ships old bytecode to executors while the
driver-side registry imports the live package — the mismatch surfaces
as AttributeError on the cluster only (tools/submit_job.py path).  This
test is the CI guard: every .py in bids_spark/ must be present in the
zip with identical bytes, and the zip must not carry files that no
longer exist.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "bids_spark.zip")


def _tree_files() -> dict[str, bytes]:
    out = {}
    pkg = os.path.join(REPO, "bids_spark")
    for root, _dirs, files in os.walk(pkg):
        for f in sorted(files):
            if f.endswith((".py", ".txt")):
                full = os.path.join(root, f)
                with open(full, "rb") as fh:
                    out[os.path.relpath(full, REPO)] = fh.read()
    return out


def test_dist_zip_matches_source_tree():
    assert os.path.exists(ZIP), (
        "dist/bids_spark.zip missing — run tools/build_pyfiles.py"
    )
    tree = _tree_files()
    with zipfile.ZipFile(ZIP) as z:
        members = {
            n: z.read(n)
            for n in z.namelist()
            if n.endswith((".py", ".txt"))
        }
    missing = sorted(set(tree) - set(members))
    extra = sorted(set(members) - set(tree))
    stale = sorted(
        n for n in set(tree) & set(members) if tree[n] != members[n]
    )
    assert not (missing or extra or stale), (
        "dist/bids_spark.zip is out of sync with the source tree — "
        f"run tools/build_pyfiles.py (missing={missing}, extra={extra}, "
        f"stale={stale})"
    )
