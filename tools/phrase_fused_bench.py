"""PHRASE_FUSED A/B: one decode scan + one groupBy aggregation scoring
from the payload dl column (eval_phrase_fused) vs the per-ordinal
join-chain + doclens-join twin (eval_phrase).

Interleaved arms on a hot engine so machine drift hits both equally;
rank+score BIT identity asserted per query before timing (full suite:
tests/test_phrase_fused.py).  Records p50 walls and Spark job counts —
the fusion's claim is fewer scheduling round-trips (no per-ordinal
join branches, no doclens materialization) and one fewer shuffle.

Usage: python tools/phrase_fused_bench.py [replicate] [iters]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.session import get_spark
from bids_spark.sources.replicate import replicated_corpus

QUERIES = {
    "q_phrase2": '"merge join"',
    "q_phrase3": '"table key filter"',
    "q_slop": '"data merge"~2',
    "q_bool_phrase": 'data AND "merge join"',
}


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="phrase-fused-bench", cores=cpus,
                      shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="bids_pfbench_")
    try:
        big = replicated_corpus(spark, sf_dir, replicate, work,
                                files=cpus * 2)
        bi = BlockedIndex(os.path.join(work, "idx"))
        bi.build(big, fingerprint=f"pfbench-{replicate}",
                 n_partitions=cpus, with_positions=True)
        eng = BlockedSearchEngine(spark, bi, cache=True)
        eng.search("data", 10).collect()  # warm listings + memos

        for qn, q in QUERIES.items():
            eng.PHRASE_FUSED = True
            a = [(r["doc_id"], r["score"])
                 for r in eng.search(q, 10).collect()]
            eng.PHRASE_FUSED = False
            b = [(r["doc_id"], r["score"])
                 for r in eng.search(q, 10).collect()]
            assert a == b and a, f"arm mismatch on {qn}"

        sc = spark.sparkContext
        lat = {arm: {q: [] for q in QUERIES} for arm in ("fused", "twin")}
        jobs = {arm: {} for arm in ("fused", "twin")}
        for _it in range(iters):
            for arm in ("fused", "twin"):
                eng.PHRASE_FUSED = arm == "fused"
                for qn, q in QUERIES.items():
                    before = len(sc.statusTracker().getJobIdsForGroup(None))
                    t0 = time.time()
                    eng.search(q, 10).collect()
                    lat[arm][qn].append(time.time() - t0)
                    after = len(sc.statusTracker().getJobIdsForGroup(None))
                    jobs[arm][qn] = after - before
        eng.PHRASE_FUSED = True

        out = {"replicate": replicate, "iters": iters, "arms": {}}
        for arm in ("fused", "twin"):
            med = {q: round(statistics.median(v), 3)
                   for q, v in lat[arm].items()}
            out["arms"][arm] = {
                "p50_per_query": med,
                "p50_sum": round(sum(med.values()), 3),
                "jobs_last_iter": jobs[arm],
            }
        print(json.dumps(out, indent=1))
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
