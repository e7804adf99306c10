"""PHRASE_FUSED A/B: one decode scan + one groupBy aggregation scoring
from the payload dl column (eval_phrase_fused) vs the per-ordinal
join-chain + doclens-join twin (eval_phrase).

Interleaved arms on a hot engine so machine drift hits both equally;
rank+score BIT identity asserted per query before timing (full suite:
tests/test_phrase_fused.py).  Records p50 walls and Spark job counts —
the fusion's claim is fewer scheduling round-trips (no per-ordinal
join branches, no doclens materialization) and one fewer shuffle.

Usage: python tools/phrase_fused_bench.py [replicate] [iters] [--drift]
                                           [--batch]
  --drift: measure on the 3M-doc drifted positions-ON index the
  pruning-evidence/batch tools share (built at /tmp/pruning_evidence
  if absent) instead of building a throwaway replicated index —
  decode work is real there, so the shuffle-count claim isn't
  extrapolated from scheduling-dominated toy scale.
  --batch: measure search_many on the phrase set instead — shared
  decode (BATCH_PHRASE_SHARED) vs the per-qid subplan twin,
  interleaved, per-qid identity vs search() asserted before timing.
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


BATCH_PHRASES = {
    "p2": '"merge join"',
    "p2b": '"data merge"',      # shares "merge" with p2
    "p3": '"table key filter"',
    "pslop": '"data merge"~2',
}


def _batch_mode(spark, eng, iters: int) -> None:
    """search_many over BATCH_PHRASES: shared decode vs per-qid
    subplans, interleaved; per-qid identity vs search() asserted."""

    def run():
        rows = eng.search_many(BATCH_PHRASES, 10).collect()
        out: dict[str, list] = {}
        for r in rows:
            out.setdefault(r["qid"], []).append(
                (r["rank"], r["doc_id"], r["score"])
            )
        return {q: sorted(v) for q, v in out.items()}

    seq = {
        qn: sorted(
            (r["rank"], r["doc_id"], r["score"])
            for r in eng.search(q, 10).collect()
        )
        for qn, q in BATCH_PHRASES.items()
    }
    for arm in (True, False):
        eng.BATCH_PHRASE_SHARED = arm
        got = run()
        assert got == {q: v for q, v in seq.items() if v}, f"arm {arm}"
    sc = spark.sparkContext
    lat = {"shared": [], "twin": []}
    jobs: dict[str, int] = {}
    for _it in range(iters):
        for arm in ("shared", "twin"):
            eng.BATCH_PHRASE_SHARED = arm == "shared"
            before = len(sc.statusTracker().getJobIdsForGroup(None))
            t0 = time.time()
            eng.search_many(BATCH_PHRASES, 10).collect()
            lat[arm].append(time.time() - t0)
            jobs[arm] = (
                len(sc.statusTracker().getJobIdsForGroup(None)) - before
            )
    eng.BATCH_PHRASE_SHARED = True
    seq_wall = []
    for _it in range(iters):
        t0 = time.time()
        for q in BATCH_PHRASES.values():
            eng.search(q, 10).collect()
        seq_wall.append(time.time() - t0)
    print(json.dumps({
        "n_phrases": len(BATCH_PHRASES),
        "iters": iters,
        "batch_shared_p50": round(statistics.median(lat["shared"]), 3),
        "batch_twin_p50": round(statistics.median(lat["twin"]), 3),
        "sequential_p50": round(statistics.median(seq_wall), 3),
        "jobs": jobs,
    }, indent=1))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    drift = "--drift" in sys.argv
    replicate = int(args[0]) if args else (600 if drift else 6)
    iters = int(args[1]) if len(args) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="phrase-fused-bench", cores=cpus,
                      shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="bids_pfbench_")
    try:
        if drift:
            from bids_spark.sources.replicate import drifted_corpus

            workdir = "/tmp/pruning_evidence"
            idx_dir = os.path.join(workdir, f"idx_drift_pos_x{replicate}")
            bi = BlockedIndex(idx_dir)
            if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
                big = drifted_corpus(spark, sf_dir, replicate, workdir,
                                     files=64)
                bi.build(
                    big,
                    fingerprint=(
                        f"prune-evidence-drift_pos-{sf_dir}-x{replicate}"
                    ),
                    with_positions=True,
                )
        else:
            big = replicated_corpus(spark, sf_dir, replicate, work,
                                    files=cpus * 2)
            bi = BlockedIndex(os.path.join(work, "idx"))
            bi.build(big, fingerprint=f"pfbench-{replicate}",
                     n_partitions=cpus, with_positions=True)
        eng = BlockedSearchEngine(spark, bi, cache=True)
        eng.search("data", 10).collect()  # warm listings + memos

        if "--batch" in sys.argv:
            _batch_mode(spark, eng, iters)
            return

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
