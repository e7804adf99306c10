"""Benchmark harness (driver contract): build + query timings at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-stage/per-query sec...}, "sf": <sf>,
   "throughput": {...docs_per_sec / postings_per_sec / bytes...}}

Two workloads:
  * corpus-scale build: blocked index over documents.parquet at SF,
    replicated REPLICATE× (deterministic doc_id offsets) so build
    throughput is measured on ~100k docs, not 5k — set
    SPARK_GRAFT_BENCH_REPLICATE to change.
  * query serving: committed reference query set (FIXTURES.md §5
    analogues) over the blocked index (pruned path) + the phrase query
    on the naive positions path.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.session import get_spark
from bids_spark.sources.replicate import replicated_corpus

BLOCKED_QUERIES = {
    "q_single": "data",
    "q_or2": "merge join",
    "q_and": "merge AND join",
    "q_not": "merge -join",
    "q_head": "the",
    "q_or5": "data merge join sort window",
    "q_phrase": '"merge join"',  # blocked path too (positions-built index)
}
QUERY_ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "20"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="bids-spark-bench", cores=cpus,
                      shuffle_partitions=cpus)
    timings: dict[str, float] = {}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_n = docs.count()
    n_docs = base_n * replicate

    work = tempfile.mkdtemp(prefix="bids_bench_")
    try:
        # corpus materialized OUTSIDE the timed build (real input is
        # multi-file parquet on disk, not a lazy generator)
        big = replicated_corpus(spark, sf_dir, replicate, work, files=cpus * 4)
        t0 = time.time()
        bi = BlockedIndex(os.path.join(work, "idx"))
        man = bi.build(big, fingerprint=f"bench-{sf_dir}-{replicate}",
                       n_partitions=cpus, with_positions=True)
        timings["build"] = time.time() - t0
        bstage = man["stages"]["blocks"]

        beng = BlockedSearchEngine(spark, bi, cache=True)
        # warm: file listing + parquet footers
        beng.search("data", 10).collect()
        # per-query latency distribution (north rule: p50/p99)
        all_lat: list[float] = []
        for name, q in BLOCKED_QUERIES.items():
            lats = []
            for _ in range(QUERY_ITERS):
                t0 = time.time()
                beng.search(q, 10).collect()
                lats.append(time.time() - t0)
            lats.sort()
            timings[name] = lats[len(lats) // 2]  # per-query p50
            all_lat.extend(lats)
        all_lat.sort()
        p50 = all_lat[len(all_lat) // 2]
        p99 = all_lat[min(len(all_lat) - 1, int(len(all_lat) * 0.99))]

        # batched serving: the SAME query set in ONE Spark action
        # (wand.search_many) — kept OUT of `timings` so `total` stays
        # comparable round-over-round; reported as its own section
        batch_lats = []
        for _ in range(QUERY_ITERS):
            t0 = time.time()
            beng.search_many(BLOCKED_QUERIES, 10).collect()
            batch_lats.append(time.time() - t0)
        batch_lats.sort()
        batch_p50 = batch_lats[len(batch_lats) // 2]
        seq_sum = sum(timings[n] for n in BLOCKED_QUERIES)

        # round-5 grammar surfaces (fuzzy / prefix / phrase-prefix) —
        # kept OUT of `timings` like `batch` so `total` stays
        # comparable round-over-round; reported as their own section
        ext: dict[str, float] = {}
        for name, q in (
            ("q_fuzzy", "merge~1"),
            ("q_prefix", "mer*"),
            ("q_phrase_prefix", '"merge jo"*'),
        ):
            lats = []
            for _ in range(QUERY_ITERS):
                t0 = time.time()
                beng.search(q, 10).collect()
                lats.append(time.time() - t0)
            lats.sort()
            ext[name] = round(lats[len(lats) // 2], 3)

        total = sum(timings.values())
        print(
            json.dumps(
                {
                    "metric": "blocked-index build + BM25 query set wall time",
                    "value": round(total, 3),
                    "unit": "sec",
                    "queries": {k: round(v, 3) for k, v in timings.items()},
                    "sf": sf,
                    "latency": {
                        "p50": round(p50, 3),
                        "p99": round(p99, 3),
                        "iters_per_query": QUERY_ITERS,
                    },
                    "extended": ext,
                    "batch": {
                        "n_queries": len(BLOCKED_QUERIES),
                        "wall_p50": round(batch_p50, 3),
                        "sequential_p50_sum": round(seq_sum, 3),
                        "speedup": round(seq_sum / batch_p50, 2),
                        "queries_per_sec": round(
                            len(BLOCKED_QUERIES) / batch_p50, 2
                        ),
                    },
                    "throughput": {
                        "n_docs": n_docs,
                        "docs_per_sec": round(n_docs / timings["build"], 1),
                        "postings": bstage["postings"],
                        "postings_per_sec": round(bstage["postings_per_sec"], 1),
                        "compressed_bytes": bstage["compressed_bytes"],
                        "bytes_per_posting": round(bstage["bytes_per_posting"], 3),
                        "cpus": cpus,
                        "replicate": replicate,
                    },
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
