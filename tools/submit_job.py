"""spark-submit entry point: build the blocked index and run the
reference query set.  Usage (north rule: runs via spark-submit
--py-files on a multi-executor cluster):

    python tools/build_pyfiles.py
    spark-submit --py-files dist/bids_spark.zip tools/submit_job.py \
        <corpus.parquet> <index_dir> [query ...]

In local sandbox testing the same invocation runs under
`--master local[N]`; on a real cluster only --master changes.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> int:
    corpus, index_dir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:] or ["data", "merge join", "merge AND join"]
    spark = SparkSession.builder.appName("bids-spark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from bids_spark.operators.blocked_index import BlockedIndex
    from bids_spark.operators.wand import BlockedSearchEngine

    docs = spark.read.parquet(corpus)
    bi = BlockedIndex(index_dir)
    man = bi.build(docs, fingerprint=f"submit-{corpus}")
    print("MANIFEST " + json.dumps(man["stages"]["blocks"]))

    eng = BlockedSearchEngine(spark, bi, cache=True)
    for q in queries:
        rows = eng.search(q, 10).collect()
        print("RESULT " + json.dumps({
            "query": q,
            "topk": [(r["rank"], r["doc_id"], round(r["score"], 6)) for r in rows],
        }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
