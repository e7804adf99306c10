"""Query latency vs segment count (BENCH/BASELINE.md).

The segmented engine pays one dictionary scan + one blocks scan per
segment per query (unioned into a single job, operators/segments.py
_term_meta), so latency should grow mildly with segment count — this
script measures the curve that motivates the auto-compaction policy
(SegmentedIndex auto_compact_segments).

For each segment count S the SAME corpus (sf0.1 × replicate, default
20 → 100k docs) is split by doc_id % S into S independently built
segments; per-query latency is the median of `iters` runs on a warmed
engine.  Indexes are cached under the workdir — re-runs only re-time.

Usage:
    python tools/segment_curve.py [sf_dir] [replicate] [workdir]
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
from bids_spark.sources.replicate import replicated_corpus  # noqa: E402

SEG_COUNTS = [1, 5, 10, 20]
QUERIES = {
    "q_single": "data",
    "q_or2": "merge join",
    "q_and": "merge AND join",
    "q_phrase": '"merge join"',
}
ITERS = 5


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    workdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/segment_curve"
    spark = get_spark(app_name="segment-curve")
    big = replicated_corpus(spark, sf_dir, replicate, workdir, files=32)
    n_docs = big.count()
    out = []
    for s in SEG_COUNTS:
        root = os.path.join(workdir, f"x{replicate}_segs_{s:02d}")
        si = SegmentedIndex(root)
        if len(si.segment_paths()) < s:
            for i in range(s):
                si.add_segment(
                    big.filter(F.col("doc_id") % s == i),
                    fingerprint=f"curve-{s}-{i}",
                )
        eng = si.engine(spark)
        eng.search("data", 10).collect()  # warm plans + dictionaries
        row = {"segments": s, "n_docs": n_docs, "latency_sec": {}}
        for name, q in QUERIES.items():
            xs = []
            for _ in range(ITERS):
                t0 = time.time()
                eng.search(q, 10).collect()
                xs.append(time.time() - t0)
            row["latency_sec"][name] = round(sorted(xs)[ITERS // 2], 3)
        out.append(row)
        print("ROW " + json.dumps(row), flush=True)
    print("RESULT " + json.dumps({
        "sf_dir": sf_dir, "replicate": replicate, "n_docs": n_docs,
        "iters": ITERS, "rows": out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
