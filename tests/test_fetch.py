"""Result fetch / shaping operators (operators/fetch.py) — the
distributed twins of the CLI driver-side loop (reference over-fetch +
content-dedup + truncate, bids/index.py:151-181)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bids_spark.operators.fetch import dedup_paged, fetch_docs


@pytest.fixture(scope="module")
def tiny(spark):
    """6 ranked results over 6 docs; docs 11/12 and 14/15 share text."""
    docs = spark.createDataFrame(
        [
            (10, "alpha beta", "s1"),
            (11, "dup one", "s1"),
            (12, "dup one", "s2"),
            (13, "gamma delta", "s1"),
            (14, "dup two", "s3"),
            (15, "dup two", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    results = spark.createDataFrame(
        [(1, 11, 5.0), (2, 12, 4.9), (3, 10, 4.0),
         (4, 14, 3.0), (5, 15, 2.9), (6, 13, 1.0)],
        "rank long, doc_id long, score double",
    )
    return docs, results


def test_fetch_docs_joins_content(tiny):
    docs, results = tiny
    out = fetch_docs(results, docs, prefix_len=3).collect()
    assert [r["doc_id"] for r in out] == [11, 12, 10, 14, 15, 13]
    assert out[0]["content_prefix"] == "dup"
    assert out[2]["content_prefix"] == "alp"
    assert out[0]["source"] == "s1"


def test_fetch_docs_broadcasts_topk_side(tiny):
    docs, results = tiny
    plan = fetch_docs(results, docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_dedup_paged_drops_later_duplicates(tiny):
    docs, results = tiny
    out = dedup_paged(results, docs, limit=10, offset=0, page_size=10).collect()
    # 12 (dup of 11) and 15 (dup of 14) drop; survivors re-ranked 1..4
    assert [(r["position"], r["doc_id"]) for r in out] == [
        (1, 11), (2, 10), (3, 14), (4, 13)
    ]


def test_dedup_paged_offset_slices_after_dedup(tiny):
    docs, results = tiny
    out = dedup_paged(results, docs, limit=2, offset=1, page_size=10).collect()
    assert [(r["position"], r["doc_id"]) for r in out] == [(2, 10), (3, 14)]


def test_dedup_paged_window_quirk_kept(tiny):
    """Reference quirk (bids/index.py:151-181): only the over-fetched
    window is deduped — a duplicate pair straddling the boundary is NOT
    detected.  With fetch_n = 4 the window is ranks 1-4; doc 15 (rank
    5, dup of 14) is outside it and simply never considered."""
    docs, results = tiny
    out = dedup_paged(results, docs, limit=3, offset=0, page_size=1).collect()
    # window = ranks 1..4 → {11, 12, 10, 14}; 12 deduped; 3 survivors
    assert [(r["position"], r["doc_id"]) for r in out] == [
        (1, 11), (2, 10), (3, 14)
    ]


def test_extract_invariant_row_matches_original_text(spark):
    """The driver row's exact computation: wrap → Catalyst extract →
    sha256 equals sha256(original text) per row (input_hint per-row
    invariant), checked here end-to-end on the sf0.001 corpus."""
    from bids_spark.contract import q_extract_invariant
    from tests.conftest import SF_DIR

    got = q_extract_invariant(spark, SF_DIR)
    want = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.sha2("text", 256).alias("text_sha256")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
