"""Segmented chunk-max sidecar bench: cold cm-array fetch through the
per-segment sidecar reader vs the rescaled-union aggregation, at 3M
docs (the corpus-scale twin of the single-index sidecar row in
BENCH/PLANS.md "Chunk-max sidecar").

Builds a 2-segment SegmentedIndex from the pruning-evidence drift
corpus (split at the replica midpoint — disjoint doc ranges, like
streaming ingest), each segment with a build-time cm sidecar, then
times a COLD _cm_arrays call per path (fresh engine per trial so the
per-term memo and Spark caches of the engine cannot help), and
asserts rank identity between the two paths on a multi-term query.

Usage: python tools/seg_cm_bench.py [corpus_parquet] [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bids_spark.operators.segments import SegmentedIndex  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402

CORPUS = (
    sys.argv[1]
    if len(sys.argv) > 1
    else "/tmp/pruning_evidence/corpus_sf0.1_x600_drift16.parquet"
)
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/seg_cm_bench"
TERMS = ["data", "the", "t3x", "t12x", "merge"]
QUERY = "data t3x"


def cold_engine(si, spark, use_sidecars: bool):
    e = si.engine(spark)
    e.OM_MIN_BLOCKS = 0
    if use_sidecars:
        e.SEG_CM_AGG_BELOW = 0  # bypass the size dispatch: force sidecars
    else:
        e._seg_cm_cache = [None] * len(e.segs)
    return e


def main() -> None:
    spark = get_spark(app_name="seg-cm-bench")
    docs = spark.read.parquet(CORPUS)
    mid = 300 * 10_000_000  # replica midpoint of the x600 corpus
    si = SegmentedIndex(os.path.join(WORK, "segroot"))
    if not si.segment_paths():
        t0 = time.time()
        si.add_segment(
            docs.filter(F.col("doc_id") < mid),
            fingerprint="lo3m", name="seg-lo",
            with_positions=False, cm_sidecar=True,
        )
        si.add_segment(
            docs.filter(F.col("doc_id") >= mid),
            fingerprint="hi3m", name="seg-hi",
            with_positions=False, cm_sidecar=True,
        )
        print(f"built 2 segments in {time.time() - t0:.1f}s", flush=True)

    walls = {}
    for path in ("sidecar", "aggregation"):
        runs = []
        for _ in range(3):
            e = cold_engine(si, spark, use_sidecars=(path == "sidecar"))
            t0 = time.time()
            arrs = e._cm_arrays(e._term_blocks(TERMS), TERMS)
            runs.append(round(time.time() - t0, 3))
            assert len(arrs) == len(TERMS)
        walls[path] = runs
        print(f"{path}: cold _cm_arrays({len(TERMS)} terms) = {runs}",
              flush=True)

    # rank identity between the two paths on a pruned multi-term query
    a = [
        (r["doc_id"], round(r["score"], 9))
        for r in cold_engine(si, spark, True).search(QUERY, 10).collect()
    ]
    b = [
        (r["doc_id"], round(r["score"], 9))
        for r in cold_engine(si, spark, False).search(QUERY, 10).collect()
    ]
    assert a == b, "rank identity violated between sidecar and aggregation"
    print("RESULT " + json.dumps({
        "n_docs": docs.count(),
        "terms": TERMS,
        "cold_cm_fetch_sec": walls,
        "rank_identity": True,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
