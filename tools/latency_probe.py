"""Where does the ~0.9 s hot-query p50 floor come from?

Round-1..4 benches show per-query p50 ~0.89-0.95 s regardless of code
changes; the round-1 note attributes it to job scheduling.  This probe
measures HOT serving latency (cache=True engine, warmed) under two
interleaved arms — machine drift hits both equally:

  literal  TINY_LOOKUP_LITERAL=True  — per-query tiny dim lookups
           (gmax / boosts / batched thresholds) as CASE-literal
           columns: no broadcast materialization job per query
  join     TINY_LOOKUP_LITERAL=False — the broadcast-dim twin
           (the pre-round-4 serving path)

Per-query Spark JOB COUNTS are recorded alongside walls: the literal
arm should run exactly one fewer job per pruned query (the broadcast
exchange of the ≤|terms|-row local relation is its own scheduling
round-trip).  Rank+score identity between arms is asserted on every
query before timing starts (the full bit-identity suite is
tests/test_tiny_lookup.py).

Optional `--conf-arms` adds the AQE / shuffle-partition sweep (both
runtime-settable SQL confs) on top of the literal arm, interleaved the
same way.

Usage: python tools/latency_probe.py [replicate] [iters] [--conf-arms]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.session import get_spark
from bids_spark.sources.replicate import replicated_corpus

QUERIES = {
    "q_single": "data",
    "q_or2": "merge join",
    "q_and": "merge AND join",
    "q_or5": "data merge join sort window",
    "q_phrase": '"merge join"',
}

CONF_ARMS = {
    "C_sp4": {"spark.sql.adaptive.enabled": "true",
              "spark.sql.shuffle.partitions": "4"},
    "B_noaqe": {"spark.sql.adaptive.enabled": "false",
                "spark.sql.shuffle.partitions": None},
    "D_noaqe_sp4": {"spark.sql.adaptive.enabled": "false",
                    "spark.sql.shuffle.partitions": "4"},
}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    replicate = int(args[0]) if args else 6
    iters = int(args[1]) if len(args) > 1 else 7
    conf_arms = "--conf-arms" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="latency-probe", cores=cpus,
                      shuffle_partitions=cpus)
    default_sp = str(cpus)
    work = tempfile.mkdtemp(prefix="bids_latprobe_")

    arms: dict[str, dict] = {
        "literal": {"lookup_literal": True, "conf": None},
        "join": {"lookup_literal": False, "conf": None},
    }
    if conf_arms:
        for name, conf in CONF_ARMS.items():
            arms[name] = {"lookup_literal": True, "conf": conf}

    try:
        big = replicated_corpus(spark, sf_dir, replicate, work,
                                files=cpus * 2)
        bi = BlockedIndex(os.path.join(work, "idx"))
        bi.build(big, fingerprint=f"latprobe-{replicate}",
                 n_partitions=cpus, with_positions=True)
        eng = BlockedSearchEngine(spark, bi, cache=True)
        eng.search("data", 10).collect()  # warm listings + memo

        # rank+score identity between lookup arms, once per query
        for qn, q in QUERIES.items():
            eng.TINY_LOOKUP_LITERAL = True
            a = [(r["doc_id"], r["score"])
                 for r in eng.search(q, 10).collect()]
            eng.TINY_LOOKUP_LITERAL = False
            b = [(r["doc_id"], r["score"])
                 for r in eng.search(q, 10).collect()]
            assert a == b and a, f"arm mismatch on {qn}"
        del eng.TINY_LOOKUP_LITERAL

        sc = spark.sparkContext
        lat: dict[str, dict[str, list[float]]] = {
            a: {q: [] for q in QUERIES} for a in arms
        }
        jobs: dict[str, dict[str, int]] = {a: {} for a in arms}
        for _it in range(iters):
            for arm, spec in arms.items():
                eng.TINY_LOOKUP_LITERAL = spec["lookup_literal"]
                conf = spec["conf"] or {
                    "spark.sql.adaptive.enabled": "true",
                    "spark.sql.shuffle.partitions": None,
                }
                spark.conf.set("spark.sql.adaptive.enabled",
                               conf["spark.sql.adaptive.enabled"])
                spark.conf.set(
                    "spark.sql.shuffle.partitions",
                    conf["spark.sql.shuffle.partitions"] or default_sp,
                )
                for qn, q in QUERIES.items():
                    before = len(sc.statusTracker().getJobIdsForGroup(None))
                    t0 = time.time()
                    eng.search(q, 10).collect()
                    lat[arm][qn].append(time.time() - t0)
                    after = len(sc.statusTracker().getJobIdsForGroup(None))
                    jobs[arm][qn] = after - before
        # restore defaults
        del eng.TINY_LOOKUP_LITERAL
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", default_sp)

        out = {"replicate": replicate, "iters": iters, "arms": {}}
        for arm in arms:
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
