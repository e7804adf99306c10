"""Fused phrase evaluation (PHRASE_FUSED / eval_phrase_fused): ONE
decode scan + ONE groupBy(doc_id) aggregation scoring from the block
payload's dl column, vs the join-chain + doclens-join twin
(eval_phrase).  Identity must be BIT-identical — same array_intersect
operands in the same order, same bm25_term_score expression, and the
payload dl is the same exact integer the doclens table holds.
Reference semantics: tantivy's phrase scorer walks all member cursors
in one pass (reference bids/index.py:155)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine


@pytest.fixture(scope="module")
def index_pos(docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fusedp") / "idx")
    bi = BlockedIndex(root)
    bi.build(docs, fingerprint="fused-pos", n_partitions=8,
             with_positions=True)
    return bi


@pytest.fixture(scope="module")
def index_pos_f64(docs, tmp_path_factory):
    """f64-mode positions index: payload stores scores, not dl — the
    fused path must fall back to the doclens-join twin."""
    root = str(tmp_path_factory.mktemp("fusedp64") / "idx")
    bi = BlockedIndex(root)
    bi.build(docs, fingerprint="fused-pos-f64", n_partitions=8,
             with_positions=True, score_mode="f64")
    return bi


@pytest.fixture(scope="module")
def hot(spark, index_pos):
    return BlockedSearchEngine(spark, index_pos, cache=True)


def _exact_top(engine, q, k=10):
    # NO rounding: fused vs twin must be bit-identical
    return [(r["doc_id"], r["score"]) for r in engine.search(q, k).collect()]


PHRASE_SHAPES = [
    '"merge join"',             # 2-term exact
    '"the data set"',           # 3-term exact
    '"data"',                   # 1-term phrase (tf = |positions|)
    '"data merge data"',        # duplicate member
    '"data merge"~2',           # sloppy
    '"merge join"^2.5',         # boosted phrase
    '"merge join" sort',        # phrase + should term (generic bool)
    'data AND "merge join"',    # phrase as a must clause
    '"merge join" -sort',       # phrase with must_not
    '"zzz qqq"',                # no match
]


@pytest.mark.parametrize("q", PHRASE_SHAPES)
def test_fused_bit_identical_to_twin_blocked(hot, q):
    hot.PHRASE_FUSED = True
    a = _exact_top(hot, q)
    hot.PHRASE_FUSED = False
    b = _exact_top(hot, q)
    hot.PHRASE_FUSED = True
    assert a == b


def test_fused_is_the_default_and_dl_available(hot):
    assert type(hot).PHRASE_FUSED is True
    assert hot._phrase_dl_available() is True


def test_f64_mode_falls_back_to_twin(spark, index_pos_f64, hot):
    """f64 payloads carry no dl: the engine must not attempt the fused
    path, and the twin's results must match the dl-mode fused results
    bit-for-bit (dl-mode recompute is bit-identical by codec contract)."""
    e64 = BlockedSearchEngine(spark, index_pos_f64, cache=True)
    assert e64._phrase_dl_available() is False
    for q in ('"merge join"', '"data merge"~2'):
        assert _exact_top(e64, q) == _exact_top(hot, q)


def test_payload_dl_equals_doclens_for_every_posting(spark, index_pos):
    """The fused path's correctness rests on payload dl == doclens dl
    per (term, doc_id) — check EVERY decoded positions row."""
    eng = BlockedSearchEngine(spark, index_pos)
    decoded = eng._decode_positions(eng.blocks)
    dls = index_pos.doclens(spark).select(
        "doc_id", F.col("dl").alias("dl_table")
    )
    bad = (
        decoded.join(dls, "doc_id", "left")
        .filter(
            F.col("dl").isNull()
            | (F.col("dl") != F.col("dl_table"))
        )
        .count()
    )
    assert bad == 0


def test_fused_hot_phrase_saves_jobs(spark, hot):
    """The fusion's point: fewer scheduling round-trips per phrase
    query on a hot engine (no per-ordinal join branches, no doclens
    join)."""
    sc = spark.sparkContext
    q = '"merge join"'
    hot.search(q, 10).collect()  # warm memos on both paths
    hot.PHRASE_FUSED = False
    hot.search(q, 10).collect()

    sc.setJobGroup("twin", "twin")
    hot.search(q, 10).collect()
    twin_jobs = len(sc.statusTracker().getJobIdsForGroup("twin"))
    hot.PHRASE_FUSED = True
    sc.setJobGroup("fused", "fused")
    hot.search(q, 10).collect()
    fused_jobs = len(sc.statusTracker().getJobIdsForGroup("fused"))
    sc.setJobGroup(None, None)
    assert fused_jobs < twin_jobs


@pytest.fixture(scope="module")
def seg_deleted(spark, docs, tmp_path_factory):
    """Two segments + tombstones over docs that match '"merge join"'."""
    root = str(tmp_path_factory.mktemp("fusedseg") / "root")
    si = SegmentedIndex(root)
    si.add_segment(docs.filter(F.col("doc_id") % 2 == 0),
                   fingerprint="ev", n_partitions=4)
    si.add_segment(docs.filter(F.col("doc_id") % 2 != 0),
                   fingerprint="od", n_partitions=4)
    pre = [r["doc_id"]
           for r in si.engine(spark).search('"merge join"', 5).collect()]
    si.delete_docs(spark, pre[:2])
    return si, pre[:2]


@pytest.mark.parametrize(
    "q",
    ['"merge join"', '"data merge"~2', 'data AND "merge join"',
     '"merge join" -sort'],
)
def test_fused_bit_identical_on_segmented_with_deletes(spark, seg_deleted, q):
    si, killed = seg_deleted
    eng = si.engine(spark, cache=True)
    eng.PHRASE_FUSED = True
    a = _exact_top(eng, q)
    eng.PHRASE_FUSED = False
    b = _exact_top(eng, q)
    assert a == b
    assert all(d not in [x[0] for x in a] for d in killed)


def test_segmented_phrase_gets_block_restriction(spark, docs, tmp_path):
    """Routing segmented phrases through the parent's _eval_phrase
    (instead of the old override) engages the member-conjunction
    restriction: a phrase whose members never co-occur across two
    disjoint planted bands is proved empty from metadata alone."""
    a = docs.limit(50).select(
        "doc_id", F.concat(F.col("text"), F.lit(" qband0 qband0x")).alias("text")
    )
    b = docs.limit(50).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qband3 qband3x")).alias("text"),
    )
    si = SegmentedIndex(str(tmp_path / "segr"))
    si.add_segment(a, fingerprint="ba", n_partitions=2)
    si.add_segment(b, fingerprint="bb", n_partitions=2)
    eng = si.engine(spark)
    eng.OM_MIN_BLOCKS = 0
    s = eng.and_pruning_stats('"qband0 qband3"')
    assert s["empty_proved"]
    assert eng.search('"qband0 qband3"', 10).count() == 0
    # and a same-band phrase still matches
    assert eng.search('"qband0 qband0x"', 10).count() > 0
