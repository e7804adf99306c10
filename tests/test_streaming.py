"""Structured-Streaming incremental ingest: two micro-batches must
yield a search state identical to batch-building over the union; a
restarted stream (same checkpoint) must re-process nothing."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from bids_spark.plans.planner import SearchEngine
from bids_spark.streaming.incremental import IncrementalIndexer


def _write_batch(spark, landing, name, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(landing, name)
    )


@pytest.fixture(scope="module")
def landing_and_idx(spark, tmp_path_factory):
    landing = str(tmp_path_factory.mktemp("landing"))
    out = str(tmp_path_factory.mktemp("inc_idx"))
    idx = IncrementalIndexer(out)

    _write_batch(spark, landing, "b1", [
        (1, "spark streaming ingest first batch"),
        (2, "merge join sort window"),
    ])
    q = idx.start(spark, os.path.join(landing, "*"))
    q.awaitTermination(120)

    _write_batch(spark, landing, "b2", [
        (3, "second batch arrives with merge and join terms"),
        (4, "streaming state lives in the checkpoint"),
    ])
    q = idx.start(spark, os.path.join(landing, "*"))
    q.awaitTermination(120)
    return landing, idx


def test_all_docs_ingested_once(spark, landing_and_idx):
    _, idx = landing_and_idx
    docs = idx.current_docs(spark)
    assert sorted(r["doc_id"] for r in docs.collect()) == [1, 2, 3, 4]


def test_restart_reprocesses_nothing(spark, landing_and_idx):
    _, idx = landing_and_idx
    q = idx.start(spark, os.path.join(landing_and_idx[0], "*"))
    q.awaitTermination(120)
    docs = idx.current_docs(spark)
    assert docs.count() == 4  # no duplicates after restart


def test_incremental_equals_batch(spark, landing_and_idx):
    _, idx = landing_and_idx
    inc = idx.engine(spark)
    batch = SearchEngine.from_documents(idx.current_docs(spark), cache=False)
    for q in ["merge join", "streaming", "merge AND join", '"merge join"']:
        a = [(r["rank"], r["doc_id"], round(r["score"], 9))
             for r in inc.search(q, 10).collect()]
        b = [(r["rank"], r["doc_id"], round(r["score"], 9))
             for r in batch.search(q, 10).collect()]
        assert a == b, q


# ---- segmented streaming (micro-batch → compressed segment) ----------------


def test_segmented_stream_matches_batch(spark, tmp_path):
    from bids_spark.streaming.incremental import SegmentedStreamIndexer

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    out = str(tmp_path / "segidx")
    rows1 = [(1, "spark streaming ingest first batch"),
             (2, "merge join sort window")]
    rows2 = [(3, "second batch arrives with merge and join terms"),
             (4, "streaming state lives in the checkpoint")]
    _write_batch(spark, landing, "b1", rows1)

    sx = SegmentedStreamIndexer(out, n_partitions=2)
    sx.start(spark, os.path.join(landing, "*")).awaitTermination(120)
    assert len(sx.seg_index.segment_paths()) >= 1

    _write_batch(spark, landing, "b2", rows2)
    sx.start(spark, os.path.join(landing, "*")).awaitTermination(120)
    segs = sx.seg_index.segment_paths()
    assert len(segs) >= 2  # one compressed segment per micro-batch

    # search over segments == batch engine over the union corpus
    union = spark.createDataFrame(
        pd.DataFrame(rows1 + rows2, columns=["doc_id", "text"])
    )
    naive = SearchEngine.from_documents(union, cache=False)
    eng = sx.engine(spark)
    for q in ["merge join", "streaming", '"merge join"', "batch AND streaming"]:
        got = [(r["rank"], r["doc_id"]) for r in eng.search(q, 10).collect()]
        want = [(r["rank"], r["doc_id"]) for r in naive.search(q, 10).collect()]
        assert got == want, q

    # restart with same checkpoint: nothing re-processed, segments stable
    sx.start(spark, os.path.join(landing, "*")).awaitTermination(120)
    assert sx.seg_index.segment_paths() == segs


def test_streaming_auto_compaction(spark, tmp_path):
    """Continuous ingest with auto_compact_segments=2: the micro-batch
    that brings the committed count to 2 merges inline, results stay
    identical to a batch build over the union, and a checkpoint
    restart re-processes nothing (merged batch names are retired, not
    forgotten)."""
    from bids_spark.streaming.incremental import SegmentedStreamIndexer

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    out = str(tmp_path / "segidx_ac")
    rows1 = [(1, "spark streaming ingest first batch"),
             (2, "merge join sort window")]
    rows2 = [(3, "second batch arrives with merge and join terms"),
             (4, "streaming state lives in the checkpoint")]
    sx = SegmentedStreamIndexer(out, n_partitions=2, auto_compact_segments=2)
    _write_batch(spark, landing, "b1", rows1)
    sx.start(spark, os.path.join(landing, "*")).awaitTermination(120)
    assert len(sx.seg_index.segment_paths()) == 1
    _write_batch(spark, landing, "b2", rows2)
    sx.start(spark, os.path.join(landing, "*")).awaitTermination(120)
    segs = sx.seg_index.segment_paths()
    assert len(segs) == 1, "2nd batch must have auto-compacted"
    union = spark.createDataFrame(
        pd.DataFrame(rows1 + rows2, columns=["doc_id", "text"])
    )
    naive = SearchEngine.from_documents(union, cache=False)
    eng = sx.engine(spark)
    for q in ["merge join", "streaming", '"merge join"']:
        got = [(r["rank"], r["doc_id"]) for r in eng.search(q, 10).collect()]
        want = [(r["rank"], r["doc_id"]) for r in naive.search(q, 10).collect()]
        assert got == want, q
    # restart on the same checkpoint: no re-processing, state stable
    sx.start(spark, os.path.join(landing, "*")).awaitTermination(120)
    assert sx.seg_index.segment_paths() == segs
