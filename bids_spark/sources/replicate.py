"""Deterministic corpus scaling: replicate the driver's documents
table R× with disjoint doc_id ranges, materialized as multi-file
parquet (the realistic input shape — a real crawl lands as many
files; also makes every downstream scan parallel)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def replicated_corpus(
    spark: SparkSession,
    sf_dir: str,
    replicate: int,
    out_root: str,
    files: int = 64,
) -> DataFrame:
    """Materialize (doc_id, text) replicated `replicate`× under
    out_root (idempotent per (sf_dir, replicate)); returns the reader."""
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_x{replicate}"
    path = os.path.join(out_root, f"corpus_{tag}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        big = (
            # left side repartitioned first so the broadcast-NL join
            # (and thus generation) is parallel, not 1 task
            docs.repartition(files)
            .crossJoin(F.broadcast(spark.range(replicate).select(F.col("id").alias("rep"))))
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
                "text",
            )
        )
        big.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
