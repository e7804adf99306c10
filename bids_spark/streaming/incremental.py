r"""Incremental index maintenance via Structured Streaming.

The reference's incremental story is commit-per-1000-docs batches
(/root/reference/bids/index.py:121-143) and the playground's
add/delete/update cycle (playground/example/indexer.py:90-105).  The
Spark-native equivalent: a file-source stream over a landing directory
with exactly-once per-batch appends through a checkpointed
foreachBatch.

Key invariant: partial postings are GLOBALLY correct under append-only
ingest — (term, doc_id) pairs from different batches never collide
(doc_ids are unique), so appended per-batch postings need no merge
step; df / doclens / corpus stats are derived at query time from the
current snapshot (the analogue of tantivy's reader reload before each
search, index.py:146).

Restart/resume: the checkpoint directory makes file discovery
exactly-once; killing and restarting the stream re-processes nothing
(tested).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bids_spark.operators.index_build import postings_with_positions
from bids_spark.plans.planner import SearchEngine

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

#: landing schema when micro-batches also carry the second indexed
#: text field (reference file_path → url; SegmentedStreamIndexer
#: url_field=True)
DOC_SCHEMA_URL = T.StructType(
    DOC_SCHEMA.fields + [T.StructField("url", T.StringType())]
)


class IncrementalIndexer:
    """Maintains {out}/docs and {out}/postings parquet dirs from a
    streaming landing directory of parquet files."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.docs_dir = os.path.join(out_dir, "docs")
        self.postings_dir = os.path.join(out_dir, "postings")
        self.checkpoint = os.path.join(out_dir, "_checkpoint")

    def start(self, spark: SparkSession, landing_dir: str,
              schema: T.StructType = DOC_SCHEMA, available_now: bool = True):
        """Start the ingest stream; availableNow=True drains what's
        there and stops (micro-batch catch-up mode)."""
        stream = spark.readStream.schema(schema).parquet(landing_dir)

        def process(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                batch_df.write.mode("append").parquet(self.docs_dir)
                postings_with_positions(batch_df).write.mode("append").parquet(
                    self.postings_dir
                )
            finally:
                batch_df.unpersist()

        writer = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", self.checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    # ---- query side (reader refresh per search ≙ index.reload, D11) ----

    def current_docs(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.docs_dir)

    def engine(self, spark: SparkSession) -> SearchEngine:
        docs = self.current_docs(spark)
        postings = spark.read.parquet(self.postings_dir)
        # doclens = Σtf per doc, zero-token docs kept via left join
        dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
        doclens = (
            docs.select("doc_id")
            .join(dl, "doc_id", "left")
            .select("doc_id", F.coalesce("dl", F.lit(0)).cast("long").alias("dl"))
        )
        stats = doclens.agg(
            F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        return SearchEngine(postings, doclens, stats, cache=False)


class SegmentedStreamIndexer:
    """Streaming ingest into the COMPRESSED segmented index: each
    micro-batch commit builds one immutable blocked segment
    (operators/segments.py) — the exact Spark analogue of the
    reference's commit-per-batch writer (bids/index.py:137-141, one
    tantivy segment per commit).

    Exactly-once: segments are named by batch_id, so a foreachBatch
    retry reuses the same directory and the segment's build manifest
    turns the re-run into a no-op; the stream checkpoint makes file
    discovery exactly-once.  `engine()` picks up all committed
    segments — the reader-reload-per-search semantics of D11."""

    def __init__(
        self,
        out_dir: str,
        n_partitions: int | None = None,
        auto_compact_segments: int | None = None,
        url_field: bool = False,
        url_col: str = "url",
    ):
        from bids_spark.operators.segments import SegmentedIndex

        # url_field: micro-batch segments also index `url_col` as the
        # second text field (URL_NS namespace).  All-or-nothing per
        # index root — the segmented engine rejects mixed flags — so
        # pick it at indexer construction, not per batch; the landing
        # schema must then include the column (DOC_SCHEMA_URL).
        self.url_field = url_field
        self.url_col = url_col
        self.out_dir = out_dir
        # auto_compact_segments bounds the segment count under
        # continuous ingest (query latency grows with segment count —
        # tools/segment_curve.py): the micro-batch append that crosses
        # the threshold merges inline.  Replays of merged-away batch
        # names no-op via the commit's retired list (exactly-once is
        # preserved across compactions).
        self.seg_index = SegmentedIndex(
            os.path.join(out_dir, "segments"),
            auto_compact_segments=auto_compact_segments,
        )
        self.checkpoint = os.path.join(out_dir, "_checkpoint")
        self.n_partitions = n_partitions

    def start(self, spark: SparkSession, landing_dir: str,
              schema: T.StructType = DOC_SCHEMA, available_now: bool = True,
              max_files_per_trigger: int | None = None):
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(landing_dir)

        def process(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.persist()
            try:
                self.seg_index.add_segment(
                    batch_df,
                    fingerprint=f"batch-{batch_id}",
                    name=f"seg-batch-{batch_id:06d}",
                    n_partitions=self.n_partitions,
                    url_field=self.url_field,
                    url_col=self.url_col,
                )
            finally:
                batch_df.unpersist()

        writer = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", self.checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def engine(self, spark: SparkSession, cache: bool = False):
        return self.seg_index.engine(spark, cache=cache)
