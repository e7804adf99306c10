"""Segmented (append-only) index: N independently-built segments must
answer every query shape rank-identically to a single naive engine over
the full corpus — exact global BM25 via dl-mode rescoring + idf
substitution (operators/segments.py)."""

from __future__ import annotations

import math

import pytest

from bids_spark.operators.segments import SegmentedIndex, SegmentedSearchEngine
from bids_spark.plans.planner import SearchEngine

QUERIES = [
    "data",
    "merge join",
    "merge AND join",
    "merge -join",
    "the",
    "data merge join sort window",
    '"merge join"',
    '"merge join" AND data',
    "(merge OR join) AND data",
    "zzzmissing",
]


@pytest.fixture(scope="module")
def seg_index(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("segroot"))
    si = SegmentedIndex(root)
    # three uneven segments, deterministic split
    parts = [
        docs.filter(docs.doc_id % 4 == 0),
        docs.filter(docs.doc_id % 4 == 1),
        docs.filter(docs.doc_id % 4 >= 2),
    ]
    for i, p in enumerate(parts):
        si.add_segment(p, fingerprint=f"seg{i}", n_partitions=4)
    assert len(si.segment_paths()) == 3
    return si


@pytest.fixture(scope="module")
def naive(docs):
    return SearchEngine.from_documents(docs)


@pytest.mark.parametrize("q", QUERIES)
def test_segmented_matches_single_index(spark, seg_index, naive, q):
    eng = seg_index.engine(spark)
    assert isinstance(eng, SegmentedSearchEngine)
    got = [(r["rank"], r["doc_id"], r["score"]) for r in eng.search(q, 10).collect()]
    want = [(r["rank"], r["doc_id"], r["score"]) for r in naive.search(q, 10).collect()]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], q
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9), (q, gs, ws)


def test_append_changes_results(spark, docs, tmp_path):
    """Adding a segment must update global df/N/avgdl — results equal a
    fresh single-corpus engine over the extended corpus."""
    half = docs.filter(docs.doc_id % 2 == 0)
    si = SegmentedIndex(str(tmp_path / "grow"))
    si.add_segment(half, fingerprint="h1", n_partitions=4)
    eng1 = si.engine(spark)
    naive_half = SearchEngine.from_documents(half, cache=False)
    g1 = [(r["rank"], r["doc_id"]) for r in eng1.search("merge join", 10).collect()]
    w1 = [(r["rank"], r["doc_id"]) for r in naive_half.search("merge join", 10).collect()]
    assert g1 == w1
    # append the other half
    si.add_segment(docs.filter(docs.doc_id % 2 == 1), fingerprint="h2",
                   n_partitions=4)
    eng2 = si.engine(spark)
    naive_full = SearchEngine.from_documents(docs, cache=False)
    got = [(r["rank"], r["doc_id"], r["score"])
           for r in eng2.search("merge join", 10).collect()]
    want = [(r["rank"], r["doc_id"], r["score"])
            for r in naive_full.search("merge join", 10).collect()]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9)


def test_single_segment_uses_plain_engine(spark, docs, tmp_path):
    from bids_spark.operators.wand import BlockedSearchEngine

    si = SegmentedIndex(str(tmp_path / "one"))
    si.add_segment(docs, fingerprint="only", n_partitions=4)
    eng = si.engine(spark)
    assert isinstance(eng, BlockedSearchEngine)
    assert not isinstance(eng, SegmentedSearchEngine)


def test_f64_segments_rejected(spark, docs, tmp_path):
    from bids_spark.operators.blocked_index import BlockedIndex

    a = BlockedIndex(str(tmp_path / "seg-0000"))
    a.build(docs, fingerprint="a", score_mode="f64", n_partitions=4)
    b = BlockedIndex(str(tmp_path / "seg-0001"))
    b.build(docs, fingerprint="b", score_mode="f64", n_partitions=4)
    with pytest.raises(ValueError):
        SegmentedSearchEngine(spark, [a, b])


def test_compaction_preserves_results(spark, docs, tmp_path):
    """C5 background merge: compacting N segments into one must not
    change any query result, and the engine afterwards is the plain
    single-index engine."""
    from bids_spark.operators.wand import BlockedSearchEngine

    si = SegmentedIndex(str(tmp_path / "croot"))
    si.add_segment(docs.filter(docs.doc_id % 3 == 0), fingerprint="c0",
                   n_partitions=2)
    si.add_segment(docs.filter(docs.doc_id % 3 == 1), fingerprint="c1",
                   n_partitions=2)
    si.add_segment(docs.filter(docs.doc_id % 3 == 2), fingerprint="c2",
                   n_partitions=2)
    before = {}
    eng = si.engine(spark)
    qs = ["merge join", "merge AND join", '"merge join"', "data -merge"]
    for q in qs:
        before[q] = [(r["rank"], r["doc_id"], round(r["score"], 9))
                     for r in eng.search(q, 10).collect()]

    si.compact(spark, n_partitions=4)
    assert len(si.segment_paths()) == 1
    eng2 = si.engine(spark)
    assert isinstance(eng2, BlockedSearchEngine)
    assert not isinstance(eng2, SegmentedSearchEngine)
    for q in qs:
        after = [(r["rank"], r["doc_id"], round(r["score"], 9))
                 for r in eng2.search(q, 10).collect()]
        assert after == before[q], q
