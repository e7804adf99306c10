"""Batched shared-phrase decode (wand.py _phrases_shared /
BATCH_PHRASE_SHARED): top-level pure-phrase queries in a search_many
batch evaluate through ONE positions decode over the deduplicated
union of their restricted blocks + ONE groupBy(qid, doc_id)
aggregation, instead of one decode scan and one shuffle per phrase.

Identity vs per-qid search() must be BIT-exact (no rounding): the
shared decode is a superset of each phrase's own restricted blocks,
the tf folds the same intersect chain / greedy walk, and the score is
the same bm25 expression on the payload dl with per-qid Σidf / boosts
as CASE literals.  Reference semantics per query are unchanged
(tantivy phrase scorer, reference bids/index.py:155)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine

PHRASE_BATCH = {
    "p2": '"merge join"',            # 2-term exact (head terms)
    "p2b": '"data merge"',           # shares "merge" with p2
    "p1": '"data"',                  # 1-term phrase
    "pdup": '"data merge data"',     # duplicate member
    "pslop": '"data merge"~2',       # sloppy
    "pboost": '"merge join"^2.5',    # boosted phrase
    "pmiss": '"zzz qqq"',            # absent members — no rows
}


@pytest.fixture(scope="module")
def eng(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bphr") / "idx")
    bi = BlockedIndex(root)
    bi.build(docs, fingerprint="bphr", n_partitions=8, with_positions=True)
    return BlockedSearchEngine(spark, bi, cache=True)


def _seq(engine, q, k=10):
    # NO rounding — the shared branch must be bit-identical
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in engine.search(q, k).collect()
    ]


def _batch(engine, queries, k=10):
    rows = engine.search_many(queries, k).collect()
    got: dict[str, list] = {}
    for r in rows:
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    return {qid: sorted(v) for qid, v in got.items()}


def test_shared_branch_is_default_and_engaged(eng):
    assert type(eng).BATCH_PHRASE_SHARED is True
    assert eng._phrase_dl_available() is True


def test_phrase_batch_bit_identical_to_sequential(eng):
    got = _batch(eng, PHRASE_BATCH, 10)
    for qid, q in PHRASE_BATCH.items():
        assert got.get(qid, []) == _seq(eng, q, 10), (qid, q)


def test_phrase_batch_matches_subplan_twin(eng):
    """Shared branch off → each phrase evaluates as its own qid-tagged
    generic subplan; results must be bit-identical either way."""
    a = _batch(eng, PHRASE_BATCH, 10)
    eng.BATCH_PHRASE_SHARED = False
    try:
        b = _batch(eng, PHRASE_BATCH, 10)
    finally:
        eng.BATCH_PHRASE_SHARED = True
    assert a == b


def test_phrase_batch_broadcast_fanout_twin(eng):
    """TINY_LOOKUP_LITERAL off → the (qid, term) fan-out goes through
    the broadcast-join twin instead of the CASE-literal explode."""
    a = _batch(eng, PHRASE_BATCH, 10)
    eng.TINY_LOOKUP_LITERAL = False
    try:
        b = _batch(eng, PHRASE_BATCH, 10)
    finally:
        del eng.TINY_LOOKUP_LITERAL
    assert a == b


@pytest.mark.parametrize("k", [3, 25])
def test_phrase_batch_other_k(eng, k):
    got = _batch(eng, PHRASE_BATCH, k)
    for qid, q in PHRASE_BATCH.items():
        assert got.get(qid, []) == _seq(eng, q, k), (qid, q, k)


def test_mixed_batch_phrases_ride_with_other_shapes(eng):
    """Phrases share their decode while OR/AND/NOT/nested shapes keep
    their own branches — per-qid identity across the whole batch."""
    qs = dict(PHRASE_BATCH)
    qs.update(
        {
            "or2": "merge join",
            "and2": "merge AND join",
            "not1": "merge -join",
            "nested": 'data AND "merge join"',  # phrase under must → generic
        }
    )
    got = _batch(eng, qs, 10)
    for qid, q in qs.items():
        assert got.get(qid, []) == _seq(eng, q, 10), (qid, q)


def test_segmented_with_deletes_bit_identical(spark, docs, tmp_path_factory):
    """Tombstones anti-join inside the shared decode via the
    _decode_positions seam — per-qid identity after deletes."""
    root = str(tmp_path_factory.mktemp("bphrseg") / "segidx")
    si = SegmentedIndex(root)
    si.add_segment(docs.filter(F.col("doc_id") % 2 == 0), fingerprint="ev",
                   n_partitions=4)
    si.add_segment(docs.filter(F.col("doc_id") % 2 != 0), fingerprint="od",
                   n_partitions=4)
    pre = [r["doc_id"]
           for r in si.engine(spark).search('"merge join"', 5).collect()]
    si.delete_docs(spark, pre[:2])
    e = si.engine(spark, cache=True)
    assert e._has_deletes()
    got = _batch(e, PHRASE_BATCH, 10)
    for qid, q in PHRASE_BATCH.items():
        res = got.get(qid, [])
        assert res == _seq(e, q, 10), (qid, q)
        assert all(d not in [x[1] for x in res] for d in pre[:2])


def test_proved_empty_phrase_contributes_no_rows(spark, docs, tmp_path):
    """A phrase whose members provably never co-occur (metadata-proved
    empty) is skipped before any decode; other phrases still serve."""
    a = docs.limit(50).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" qba0 qba0x")).alias("text"),
    )
    b = docs.limit(50).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qbb3 qbb3x")).alias("text"),
    )
    si = SegmentedIndex(str(tmp_path / "bphr_empty"))
    si.add_segment(a, fingerprint="ba", n_partitions=2)
    si.add_segment(b, fingerprint="bb", n_partitions=2)
    e = si.engine(spark)
    e.OM_MIN_BLOCKS = 0
    got = _batch(
        e, {"cross": '"qba0 qbb3"', "same": '"qba0 qba0x"'}, 10
    )
    assert "cross" not in got
    assert got["same"] == _seq(e, '"qba0 qba0x"', 10)


def test_shared_phrases_fewer_jobs(eng):
    """The branch's point: N phrases in one batch schedule fewer jobs
    shared than as N per-qid subplans (one decode scan + one shuffle
    total instead of one of each per phrase)."""
    sc = eng.spark.sparkContext
    qs = {k: PHRASE_BATCH[k] for k in ("p2", "p2b", "pdup", "pslop")}
    eng.search_many(qs, 10).collect()  # warm memos/spans both paths
    eng.BATCH_PHRASE_SHARED = False
    eng.search_many(qs, 10).collect()

    sc.setJobGroup("twin", "twin")
    eng.search_many(qs, 10).collect()
    twin_jobs = len(sc.statusTracker().getJobIdsForGroup("twin"))
    eng.BATCH_PHRASE_SHARED = True
    sc.setJobGroup("shared", "shared")
    eng.search_many(qs, 10).collect()
    shared_jobs = len(sc.statusTracker().getJobIdsForGroup("shared"))
    sc.setJobGroup(None, None)
    assert shared_jobs < twin_jobs, (shared_jobs, twin_jobs)
