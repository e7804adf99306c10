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


def drifted_corpus(
    spark: SparkSession,
    sf_dir: str,
    replicate: int,
    out_root: str,
    files: int = 64,
    n_topics: int = 16,
) -> DataFrame:
    """Score-SKEWED scaling corpus: same disjoint-range replication as
    :func:`replicated_corpus`, but every replica appends topic tokens
    for its contiguous topic band g = rep·n_topics // replicate —
    ``t{g}x`` (tf 3), ``t{g}y`` (tf 2), ``t{g}z`` (tf 1) per doc.

    Head terms stay globally uniform while the injected tail
    vocabulary drifts across doc-id ranges — the structure real crawls
    have (topical hosts cluster in crawl order) and the uniform
    replica provably lacks: on it NO sound multi-term block bound can
    prune (BENCH/PLANS.md round-3 analysis).  A query mixing a head
    term with a topic term ("data t3x") concentrates its top-k inside
    one band, so the range-aligned bound (wand.py Phase 3) prunes the
    head term's blocks in every other band; all-head-term queries
    still prune ~nothing — keep uniform replicas as that control."""
    tag = (
        f"{os.path.basename(sf_dir.rstrip('/'))}_x{replicate}"
        f"_drift{n_topics}"
    )
    path = os.path.join(out_root, f"corpus_{tag}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        g = (F.col("rep") * n_topics / F.lit(replicate)).cast("long")
        big = (
            docs.repartition(files)
            .crossJoin(
                F.broadcast(
                    spark.range(replicate).select(F.col("id").alias("rep"))
                )
            )
            .select(
                (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias(
                    "doc_id"
                ),
                F.concat(
                    F.col("text"),
                    F.format_string(
                        " t%dx t%dx t%dx t%dy t%dy t%dz", g, g, g, g, g, g
                    ),
                ).alias("text"),
            )
        )
        big.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
