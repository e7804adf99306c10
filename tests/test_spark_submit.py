"""Real `spark-submit --py-files dist/bids_spark.zip` run (north rule:
"runs via spark-submit --py-files on a multi-executor cluster").

The job runs from a scratch cwd with no PYTHONPATH, so every
bids_spark import on the driver AND the Python workers must resolve
from the committed zip — the same mechanics a real cluster submit
uses; only --master differs (tools/submit_job.py docstring).  The
returned top-k must be rank- and score-identical to the in-process
engine over the same corpus.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.slow
def test_spark_submit_pyfiles_end_to_end(tmp_path, spark, docs):
    if not os.path.exists(SPARK_SUBMIT):
        pytest.skip("spark-submit binary not available")
    corpus = str(tmp_path / "corpus.parquet")
    docs.select("doc_id", "text").write.parquet(corpus)

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # imports must come from the zip
    }
    env["SPARK_LOCAL_DIRS"] = str(tmp_path / "scratch")
    run_cwd = str(tmp_path / "cwd")
    os.makedirs(run_cwd)
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", os.path.join(REPO, "dist", "bids_spark.zip"),
            os.path.join(REPO, "tools", "submit_job.py"),
            corpus, str(tmp_path / "idx"),
            "data", "merge join",
        ],
        capture_output=True, text=True, env=env, cwd=run_cwd, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    results = {
        json.loads(ln[len("RESULT "):])["query"]:
            json.loads(ln[len("RESULT "):])["topk"]
        for ln in r.stdout.splitlines() if ln.startswith("RESULT ")
    }
    assert set(results) == {"data", "merge join"}

    # identical to the in-process engine over the same corpus
    from bids_spark.operators.blocked_index import BlockedIndex
    from bids_spark.operators.wand import BlockedSearchEngine

    bi = BlockedIndex(str(tmp_path / "idx_local"))
    bi.build(spark.read.parquet(corpus), fingerprint="submit-parity")
    eng = BlockedSearchEngine(spark, bi)
    for q, want_topk in results.items():
        got = [
            [r_["rank"], r_["doc_id"], round(r_["score"], 6)]
            for r_ in eng.search(q, 10).collect()
        ]
        assert got == [list(t) for t in want_topk], q
