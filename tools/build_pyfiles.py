"""Package bids_spark as a --py-files zip for spark-submit."""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str = None) -> str:
    out = out or os.path.join(REPO, "dist", "bids_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "bids_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                # .py modules plus committed data fixtures the package
                # reads at runtime (e.g. functions/bpe_merges.txt via
                # importlib.resources when running from the zip)
                if f.endswith((".py", ".txt")):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
