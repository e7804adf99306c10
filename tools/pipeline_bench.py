"""One-shot timings of the training-data-pipeline operators at a given
SF — evidence that the hygiene layer keeps up with the index build.

Usage: python tools/pipeline_bench.py [sf_dir] [replicate]
Prints one JSON line: {op: {"sec": ..., "rows": ...}, ...}

Each op is timed over a fully-materialized action (count or write to
/dev/null-like noop via count) after a shared cached read, so timings
are the operator's own dataflow, not the parquet scan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bids_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import tempfile

    from pyspark.sql import functions as F

    from bids_spark.operators import dedup as dd
    from bids_spark.operators import events as ev
    from bids_spark.operators import textstats as ts
    from bids_spark.operators import webtext as wt
    from bids_spark.sources.replicate import replicated_corpus

    spark = get_spark(app_name="pipeline-bench")
    if replicate > 1:
        docs = replicated_corpus(
            spark, sf_dir, replicate, tempfile.gettempdir()
        ).select(
            "doc_id", "text",
            # replicated corpus carries (doc_id, text) only — attach
            # deterministic source/lang for the per-source profile op
            F.concat(F.lit("src"), (F.col("doc_id") % 20)).alias("source"),
            F.lit("en").alias("lang"),
        )
    else:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.cache()
    n_docs = docs.count()  # materialize the cache before timing
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).cache()
    events.count()

    ops = {
        "token_count": lambda: ts.token_count(docs),
        "quality_score": lambda: ts.quality_score(docs),
        "lang_id": lambda: ts.lang_id(docs),
        "fingerprint": lambda: ts.fingerprint(docs),
        "repetition_stats": lambda: wt.repetition_stats(docs),
        "remove_boilerplate": lambda: wt.remove_boilerplate(docs),
        "source_stats": lambda: wt.source_stats(docs),
        "dedup_exact": lambda: dd.exact_dedup(docs),
        "minhash_lsh": lambda: dd.minhash_lsh_pairs(docs),
        "simhash_neardup": lambda: dd.simhash_neardup_pairs(docs),
        "windowed_counts": lambda: ev.windowed_counts(events),
        "sessionize": lambda: ev.sessionize(events),
    }
    out: dict[str, dict] = {}
    for name, build in ops.items():
        t0 = time.time()
        rows = build().count()
        out[name] = {"sec": round(time.time() - t0, 3), "rows": rows}
    print(
        json.dumps(
            {"sf_dir": sf_dir, "replicate": replicate, "n_docs": n_docs,
             "ops": out}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
