"""Block-max pruning evidence at corpus scale (BENCH/PLANS.md).

Small-corpus bench latencies are Spark-job-scheduling-bound, so they
never demonstrate the BMW design actually pruning.  This script builds
a large replicated corpus (default sf0.1 × 600 = 3M docs), then for
each bench query records the DETERMINISTIC counters from
`BlockedSearchEngine.pruning_stats`: candidate blocks/postings of the
query's terms vs the blocks/postings that survive the θ filter (what
actually gets decoded), for θ from the term dictionary ("dict") and
from the probe ("probe").  Counts are noise-free — the right evidence
on a machine whose wall-clock swings 3× (BENCH/BASELINE.md).

Wall latencies (median of 3) for pruned/unpruned are reported too, but
read them as indicative only.

Usage:
    python tools/pruning_evidence.py [sf_dir] [replicate] [workdir]

The index build is resumable (staged manifest): re-runs reuse it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bids_spark.operators.blocked_index import BlockedIndex  # noqa: E402
from bids_spark.operators.wand import BlockedSearchEngine  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402
from bids_spark.sources.replicate import replicated_corpus  # noqa: E402

QUERIES = [
    "data",
    "merge join",
    "the",
    "the data",
    "data merge join sort window",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    workdir = (
        sys.argv[3] if len(sys.argv) > 3 else "/tmp/pruning_evidence"
    )
    spark = get_spark(app_name="pruning-evidence")
    big = replicated_corpus(spark, sf_dir, replicate, workdir, files=64)
    n_docs = big.count()
    idx_dir = os.path.join(workdir, f"idx_x{replicate}")
    bi = BlockedIndex(idx_dir)
    t0 = time.time()
    bi.build(
        big,
        fingerprint=f"prune-evidence-{sf_dir}-x{replicate}",
        with_positions=False,
    )
    build_s = time.time() - t0
    eng = BlockedSearchEngine(spark, bi)
    eng.search("data", 10).collect()  # warm plans

    def lat(fn, n=3):
        xs = []
        for _ in range(n):
            t = time.time()
            fn()
            xs.append(time.time() - t)
        return round(sorted(xs)[n // 2], 3)

    rows = []
    for q in QUERIES:
        d = eng.pruning_stats(q, 10, "dict")
        p = eng.pruning_stats(q, 10, "probe")
        assert d["blocks_total"] == p["blocks_total"]
        rows.append(
            {
                "query": q,
                "blocks_total": d["blocks_total"],
                "postings_total": d["postings_total"],
                "dict": {
                    "theta": round(d["theta"], 4),
                    "blocks_survive": d["blocks_survive"],
                    "postings_survive": d["postings_survive"],
                },
                "probe": {
                    "theta": round(p["theta"], 4),
                    "blocks_survive": p["blocks_survive"],
                    "postings_survive": p["postings_survive"],
                },
                "latency_sec": {
                    "pruned_dict": lat(
                        lambda: eng.search(q, 10, theta_mode="dict").collect()
                    ),
                    "pruned_probe": lat(
                        lambda: eng.search(q, 10, theta_mode="probe").collect()
                    ),
                    "unpruned": lat(
                        lambda: eng.search(q, 10, prune=False).collect()
                    ),
                },
            }
        )
        print("ROW " + json.dumps(rows[-1]), flush=True)
    print(
        "RESULT "
        + json.dumps(
            {
                "sf_dir": sf_dir,
                "replicate": replicate,
                "n_docs": n_docs,
                "build_sec": round(build_s, 1),
                "k": 10,
                "rows": rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
