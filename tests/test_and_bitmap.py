"""AND-path intersection bitmap (wand.py _bool_restriction): the
and-reduction of the must terms' per-chunk presence prunes every query
term's blocks before decode, proves disjoint-band intersections empty
from metadata alone, and never changes results vs the naive engine.
Reference semantics: tantivy's cursor intersection seek-skipping
(reference bids/index.py:155)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.plans.planner import SearchEngine

REPLICATE, TOPICS = 8, 4


@pytest.fixture(scope="module")
def drifted(spark, docs):
    """Same drift scheme as test_aligned_bound: disjoint 10M-stride
    replicas, topic band g = rep·4//8 appends t{g}x/t{g}y/t{g}z."""
    g = (F.col("rep") * TOPICS / F.lit(REPLICATE)).cast("long")
    big = (
        docs.crossJoin(
            F.broadcast(spark.range(REPLICATE).select(F.col("id").alias("rep")))
        )
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
            F.concat(
                F.col("text"),
                F.format_string(
                    " t%dx t%dx t%dx t%dy t%dy t%dz", g, g, g, g, g, g
                ),
            ).alias("text"),
        )
        .cache()
    )
    big.count()
    return big


@pytest.fixture(scope="module")
def index(drifted, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("andbm") / "idx")
    bi = BlockedIndex(root)
    bi.build(drifted, fingerprint="and-bitmap-drift", n_partitions=8)
    return bi


@pytest.fixture(scope="module")
def forced(spark, index):
    """Engine with the auto threshold floored: the bitmap (and the
    aligned OR bound) engage regardless of corpus size."""
    e = BlockedSearchEngine(spark, index)
    e.OM_MIN_BLOCKS = 0
    return e


@pytest.fixture(scope="module")
def naive(drifted):
    return SearchEngine.from_documents(drifted, cache=False)


def _top(engine, q, k=10):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in engine.search(q, k).collect()
    ]


AND_QUERIES = [
    "data AND t1x",            # head AND topic: restriction bites
    "t2x AND t2y",             # same-band topics: non-empty
    "merge AND join",          # all-head control
    "+data +t1x -merge",       # restriction applied to the neg term too
    "t1x AND data AND join",   # 3-way
    "+t1x data merge",         # single must, should terms restricted
]


@pytest.mark.parametrize("q", AND_QUERIES)
def test_and_rank_identity_forced(forced, naive, q):
    assert _top(forced, q) == _top(naive, q)


@pytest.mark.parametrize("q", AND_QUERIES)
def test_bitmap_off_matches_on(spark, index, naive, q):
    off = BlockedSearchEngine(spark, index)
    off.OM_MIN_BLOCKS = 0
    off.AND_BITMAP = False
    assert _top(off, q) == _top(naive, q)


def test_bitmap_prunes_head_blocks_on_drift(forced):
    """'data AND t1x': t1x lives in band 1 only, so data's blocks in
    the other 3 bands must be pruned before decode."""
    s = forced.and_pruning_stats("data AND t1x")
    assert not s["empty_proved"]
    assert 0 < s["bitmap"]["blocks_survive"] < s["blocks_total"]
    assert s["combined"]["blocks_survive"] <= s["bitmap"]["blocks_survive"]
    assert s["combined"]["blocks_survive"] > 0


def test_all_head_control_prunes_nothing_via_bitmap(forced):
    """Head terms are everywhere → the intersection bitmap is all-True
    and adds no filter (honest control; the interval join may still
    restrict)."""
    s = forced.and_pruning_stats("merge AND join")
    assert s["bitmap"]["blocks_survive"] == s["blocks_total"]


def test_disjoint_bands_proved_empty_without_decode(forced, naive):
    """t0x and t3x never co-occur (bands 0 and 3 are 10M-stride doc
    ranges apart): metadata alone must prove the intersection empty,
    and both engines must return zero rows."""
    s = forced.and_pruning_stats("t0x AND t3x")
    assert s["empty_proved"]
    assert s["combined"]["blocks_survive"] == 0
    assert forced.search("t0x AND t3x", 10).count() == 0
    assert naive.search("t0x AND t3x", 10).count() == 0


def test_auto_threshold_keeps_tiny_queries_jobless(spark, index):
    """Below OM_MIN_BLOCKS the bitmap must not run its metadata job:
    the cm memo stays cold on a default hot-serving engine."""
    e = BlockedSearchEngine(spark, index, cache=True)
    e.search("data AND t1x", 10).collect()
    assert e._cm_memo == {}


def test_segmented_and_bitmap_exact(spark, drifted, naive, tmp_path):
    """Two segments split across bands: the intersection bitmap runs
    over the idf-substituted union (rescaled block maxima do not
    change presence: score > 0 iff a block exists) and must stay
    rank- and score-identical to the naive engine; a disjoint-band
    AND is still proved empty across segments."""
    from bids_spark.operators.segments import SegmentedIndex

    si = SegmentedIndex(str(tmp_path / "segroot"))
    si.add_segment(
        drifted.filter(F.col("doc_id") < 40_000_000),
        fingerprint="sa", n_partitions=4,
    )
    si.add_segment(
        drifted.filter(F.col("doc_id") >= 40_000_000),
        fingerprint="sb", n_partitions=4,
    )
    seng = si.engine(spark)
    seng.OM_MIN_BLOCKS = 0
    for q in ("data AND t1x", "t2x AND t2y", "+t3x the data"):
        assert _top(seng, q) == _top(naive, q)
    s = seng.and_pruning_stats("t0x AND t3x")
    assert s["empty_proved"]
    assert seng.search("t0x AND t3x", 10).count() == 0


# -- phrase path: the same restriction applies to _eval_phrase ------------
# (a phrase is a conjunction of its members + adjacency; positions decode
# is the costliest per-posting path, so skipping matters most here)


@pytest.fixture(scope="module")
def index_pos(drifted, tmp_path_factory):
    """Positions-ON twin of `index` for phrase queries."""
    root = str(tmp_path_factory.mktemp("andbm_pos") / "idx")
    bi = BlockedIndex(root)
    bi.build(
        drifted, fingerprint="and-bitmap-drift-pos",
        n_partitions=8, with_positions=True,
    )
    return bi


@pytest.fixture(scope="module")
def forced_pos(spark, index_pos):
    e = BlockedSearchEngine(spark, index_pos)
    e.OM_MIN_BLOCKS = 0
    return e


PHRASE_QUERIES = [
    '"t1x t1y"',       # same-band adjacent topic tokens: matches exist
    '"t2y t2z"',
    '"merge join"',    # all-head control
    '"data t1x"',      # head+topic: restriction bites, likely no match
    '"t0x t3x"',       # disjoint bands: proved empty from metadata
]


@pytest.mark.parametrize("q", PHRASE_QUERIES)
def test_phrase_rank_identity_forced(forced_pos, naive, q):
    assert _top(forced_pos, q) == _top(naive, q)


@pytest.mark.parametrize("q", PHRASE_QUERIES)
def test_phrase_restriction_off_matches_on(spark, index_pos, naive, q):
    off = BlockedSearchEngine(spark, index_pos)
    off.OM_MIN_BLOCKS = 0
    off.AND_BITMAP = False
    assert _top(off, q) == _top(naive, q)


def test_phrase_has_matches_on_drift(forced_pos):
    """Guard: the rank-identity set above is not vacuously empty —
    the same-band phrases really match docs."""
    assert forced_pos.search('"t1x t1y"', 10).count() > 0


def test_phrase_bitmap_prunes_head_blocks_on_drift(forced_pos):
    """'"data t1x"': t1x lives in band 1 only, so data's positions
    blocks in the other 3 bands are pruned before decode."""
    s = forced_pos.and_pruning_stats('"data t1x"')
    assert not s["empty_proved"]
    assert 0 < s["bitmap"]["blocks_survive"] < s["blocks_total"]


def test_phrase_disjoint_bands_proved_empty(forced_pos, naive):
    """'"t0x t3x"': metadata alone proves no doc holds both members —
    zero positions-decode jobs, and both engines return zero rows."""
    s = forced_pos.and_pruning_stats('"t0x t3x"')
    assert s["empty_proved"]
    assert forced_pos.search('"t0x t3x"', 10).count() == 0
    assert naive.search('"t0x t3x"', 10).count() == 0
