"""Build-time chunk-max sidecar (blocked_index "cm" stage +
wand._cm_sidecar): cold queries serve their aligned bounds and
AND-intersection bitmaps from a pruned scan of precomputed per-term
chunk maxima instead of aggregating candidate block metadata — with
wide blocks (span > OM_SLICE_CAP chunks) stored un-exploded and
max-merged driver-side.  Parity with the aggregation path must be
exact (same float64 maxima on both sides)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.wand import BlockedSearchEngine

REPLICATE, TOPICS = 8, 4


@pytest.fixture(scope="module")
def drifted_wide(spark, docs):
    """Drift fixture + a rare term `rwide` present only in the FIRST
    and LAST replicas — its postings span the whole doc domain, so at
    128 postings/block at least one of its blocks spans > OM_SLICE_CAP
    chunks (the wide-block storage path)."""
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
                F.when(
                    F.col("rep").isin(0, REPLICATE - 1), F.lit(" rwide")
                ).otherwise(F.lit("")),
            ).alias("text"),
        )
        .cache()
    )
    big.count()
    return big


@pytest.fixture(scope="module")
def index(drifted_wide, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cmside") / "idx")
    bi = BlockedIndex(root)
    # force the stage: the fixture corpus is below CM_BUILD_MIN_BLOCKS.
    # Build with gap cuts DISABLED: this fixture manufactures its wide
    # block from a cross-replica span that BLOCK_GAP_CUT now splits
    # (round 4 late), but the uncut layout remains a supported serving
    # format (pre-cut indexes, the A/B twin) and the cm_wide read path
    # it exercises is still reachable on cut indexes via sub-threshold
    # gaps over a > OM_SLICE_CAP-chunk span.
    import bids_spark.operators.blocked_index as BI

    old = BI.BLOCK_GAP_CUT
    BI.BLOCK_GAP_CUT = 0
    try:
        bi.build(
            drifted_wide, fingerprint="cm-sidecar", n_partitions=8,
            cm_sidecar=True,
        )
    finally:
        BI.BLOCK_GAP_CUT = old
    return bi


def _engine(spark, index, sidecar: bool) -> BlockedSearchEngine:
    e = BlockedSearchEngine(spark, index)
    e.OM_MIN_BLOCKS = 0
    e.CM_SIDECAR = sidecar
    return e


def test_build_writes_cm_stage(index, spark):
    st = index._manifest()["stages"]["cm"]
    assert st["n_chunks"] >= 1 and st["width"] >= 1
    # the wide term actually produced at least one un-exploded row
    wide = index.io.read(spark, "cm_wide")
    assert wide.filter(F.col("term") == "rwide").count() >= 1


def test_sidecar_grid_matches_engine(spark, index):
    e = _engine(spark, index, sidecar=True)
    st = index._manifest()["stages"]["cm"]
    assert (int(st["lo"]), int(st["width"]), int(st["n_chunks"])) == \
        e._chunk_grid()
    assert e._cm_sidecar() is not None


@pytest.mark.parametrize(
    "terms",
    [["data", "t1x"], ["the", "t3x", "rwide"], ["rwide", "t0x"]],
)
def test_cm_arrays_parity_sidecar_vs_agg(spark, index, terms):
    side = _engine(spark, index, sidecar=True)
    agg = _engine(spark, index, sidecar=False)
    a = side._cm_arrays(side._term_blocks(terms), terms)
    b = agg._cm_arrays(agg._term_blocks(terms), terms)
    for t in terms:
        assert np.array_equal(a[t], b[t]), t


def test_pruning_counters_identical_on_both_paths(spark, index):
    side = _engine(spark, index, sidecar=True)
    agg = _engine(spark, index, sidecar=False)
    for q in ("data t1x", "the t3x"):
        sa = side.pruning_stats(q, 10, "dict", aligned=True)
        sb = agg.pruning_stats(q, 10, "dict", aligned=True)
        assert (sa["blocks_survive"], sa["theta"]) == (
            sb["blocks_survive"], sb["theta"])
    sa = side.and_pruning_stats("data AND t1x")
    sb = agg.and_pruning_stats("data AND t1x")
    assert sa == sb


def test_search_results_identical_on_both_paths(spark, index):
    side = _engine(spark, index, sidecar=True)
    agg = _engine(spark, index, sidecar=False)
    for q in ("data t1x", "rwide AND the", "t0x AND t3x"):
        assert [
            (r["doc_id"], r["score"]) for r in side.search(q, 10).collect()
        ] == [
            (r["doc_id"], r["score"]) for r in agg.search(q, 10).collect()
        ]


def test_pre_sidecar_index_falls_back(spark, index):
    """An index built before the cm stage existed (manifest without
    it) must silently use the aggregation path."""
    man = index._manifest()
    st = man["stages"].pop("cm")
    try:
        e = _engine(spark, index, sidecar=True)
        index._manifest = lambda: man  # type: ignore[method-assign]
        assert e._cm_sidecar() is None
        terms = ["data", "t1x"]
        arrs = e._cm_arrays(e._term_blocks(terms), terms)
        assert all(a.any() for a in arrs.values())
    finally:
        del index._manifest  # restore the class method
        man["stages"]["cm"] = st


def test_auto_skips_stage_on_small_index(spark, drifted_wide, tmp_path):
    """Default build below CM_BUILD_MIN_BLOCKS must not pay for the
    stage (it would be pure cost: no query there can reach the
    engine's engage threshold)."""
    bi = BlockedIndex(str(tmp_path / "idx_auto"))
    man = bi.build(drifted_wide, fingerprint="cm-auto", n_partitions=8)
    assert "cm" not in man["stages"]
    e = _engine(spark, bi, sidecar=True)
    assert e._cm_sidecar() is None  # graceful fallback, no crash


def test_segmented_parent_sidecar_mechanism_off(spark, drifted_wide, tmp_path):
    """The PARENT's single-index sidecar reader must stay hard-off for
    segmented engines: it serves RAW maxima, and an even/odd doc split
    shares the union's domain so it would pass the grid check and
    silently skip the idf rescale.  The segmented engine serves
    per-segment sidecars through its own reader instead (next tests);
    this guards the hazardous path staying closed."""
    from bids_spark.operators.segments import SegmentedIndex, SegmentedSearchEngine

    assert SegmentedSearchEngine.CM_SIDECAR is False
    si = SegmentedIndex(str(tmp_path / "segroot"))
    si.add_segment(
        drifted_wide.filter(F.col("doc_id") % 2 == 0),
        fingerprint="ev", n_partitions=4, cm_sidecar=True,
    )
    si.add_segment(
        drifted_wide.filter(F.col("doc_id") % 2 == 1),
        fingerprint="od", n_partitions=4, cm_sidecar=True,
    )
    seng = si.engine(spark)
    seng.OM_MIN_BLOCKS = 0
    assert seng._cm_sidecar() is None
    # the even/odd split is the aliasing worst case for the per-segment
    # reader too (both segment grids ≈ the union grid): bounds must
    # stay exact through the rescale + projection
    from bids_spark.plans.planner import SearchEngine

    naive = SearchEngine.from_documents(drifted_wide, cache=False)
    for q in ("data t1x", "data AND t1x"):
        a = [(r["doc_id"], round(r["score"], 9))
             for r in seng.search(q, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in naive.search(q, 10).collect()]
        assert a == b


@pytest.fixture(scope="module")
def seg_banded(spark, drifted_wide, tmp_path_factory):
    """Two band-split segments (disjoint doc ranges, like streaming
    ingest), BOTH with cm sidecars, plus the naive oracle engine."""
    from bids_spark.operators.segments import SegmentedIndex
    from bids_spark.plans.planner import SearchEngine

    si = SegmentedIndex(str(tmp_path_factory.mktemp("segcm") / "root"))
    si.add_segment(
        drifted_wide.filter(F.col("doc_id") < 40_000_000),
        fingerprint="lo", n_partitions=4, cm_sidecar=True,
    )
    si.add_segment(
        drifted_wide.filter(F.col("doc_id") >= 40_000_000),
        fingerprint="hi", n_partitions=4, cm_sidecar=True,
    )
    naive = SearchEngine.from_documents(drifted_wide, cache=False)
    return si, naive


def _seg_engine(spark, si, use_sidecars: bool):
    e = si.engine(spark)
    e.OM_MIN_BLOCKS = 0
    if use_sidecars:
        # the measured size dispatch would pick aggregation at test
        # scale — force the sidecar path so it is what gets exercised
        e.SEG_CM_AGG_BELOW = 0
    else:
        # force the fallback aggregation path for every segment
        e._seg_cm_cache = [None] * len(e.segs)
    return e


def test_segmented_cm_arrays_sound_vs_aggregation(spark, seg_banded):
    """Sidecar-served arrays must dominate the aggregation-served ones
    elementwise (the cross-grid projection and the extra ulp guard only
    ever widen an upper bound) while staying within guard tolerance
    where the grids align — never BELOW, which would be an unsound
    bound."""
    si, _ = seg_banded
    side = _seg_engine(spark, si, use_sidecars=True)
    agg = _seg_engine(spark, si, use_sidecars=False)
    terms = ["data", "t1x", "t3x", "rwide"]
    a = side._cm_arrays(side._term_blocks(terms), terms)
    b = agg._cm_arrays(agg._term_blocks(terms), terms)
    for t in terms:
        assert a[t].shape == b[t].shape
        # sound: sidecar ≥ aggregation everywhere (up to fp noise)
        assert (a[t] >= b[t] * (1 - 1e-12)).all(), t
        # tight: a segment chunk is narrower than a union chunk here,
        # so projection reaches at most one neighbouring union chunk —
        # every sidecar value is bounded by the exact max over the
        # chunk and its immediate neighbours (up to the stacked
        # one-sided guards)
        exact = b[t]
        neigh = np.maximum(
            exact,
            np.maximum(
                np.concatenate(([0.0], exact[:-1])),
                np.concatenate((exact[1:], [0.0])),
            ),
        )
        assert (a[t] <= neigh * (1 + 1e-9) + 1e-300).all(), t


def test_segmented_sidecar_rank_identity(spark, seg_banded):
    """Search through the per-segment sidecar path must stay rank- and
    score-identical to the naive oracle engine on the union — OR with
    the aligned bound engaged, AND with the intersection bitmap, and a
    phrase through the restricted positions path."""
    si, naive = seg_banded
    side = _seg_engine(spark, si, use_sidecars=True)
    assert all(st is not None for st in side._seg_cm_meta())
    for q in ("data t1x", "t0x t3y", "the data", "data AND t1x",
              '"data t1x"'):
        a = [(r["doc_id"], round(r["score"], 9))
             for r in side.search(q, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in naive.search(q, 10).collect()]
        assert a == b, q


def test_segmented_mixed_sidecar_and_fresh(spark, drifted_wide, tmp_path):
    """The web-scale serving shape: a compacted bulk segment WITH a
    sidecar plus a fresh micro-batch segment without one.  The reader
    must serve the bulk from its sidecar, aggregate only the fresh
    segment's metadata, and stay exact."""
    from bids_spark.operators.segments import SegmentedIndex
    from bids_spark.plans.planner import SearchEngine

    si = SegmentedIndex(str(tmp_path / "segmix"))
    si.add_segment(
        drifted_wide.filter(F.col("doc_id") < 60_000_000),
        fingerprint="bulk", n_partitions=4, cm_sidecar=True,
    )
    si.add_segment(
        drifted_wide.filter(F.col("doc_id") >= 60_000_000),
        fingerprint="fresh", n_partitions=4,  # auto: below threshold, no cm
    )
    e = si.engine(spark)
    e.OM_MIN_BLOCKS = 0
    e.SEG_CM_AGG_BELOW = 0
    metas = e._seg_cm_meta()
    assert metas[0] is not None and metas[1] is None
    naive = SearchEngine.from_documents(drifted_wide, cache=False)
    for q in ("data t1x", "data AND t3x"):
        a = [(r["doc_id"], round(r["score"], 9))
             for r in e.search(q, 10).collect()]
        b = [(r["doc_id"], round(r["score"], 9))
             for r in naive.search(q, 10).collect()]
        assert a == b, q
    assert e._cm_last_path == "mixed"


def test_segmented_cm_size_dispatch(spark, seg_banded):
    """Below SEG_CM_AGG_BELOW candidate blocks the engine serves cm
    from the aggregation even when every segment carries a sidecar
    (measured at 3M docs the aggregation is faster while its input is
    tiny — BENCH/seg_cm_bench_r4.log); zeroing the threshold routes
    through the sidecars."""
    si, _ = seg_banded
    terms = ["data", "t1x"]
    auto = si.engine(spark)
    auto.OM_MIN_BLOCKS = 0
    auto._cm_arrays(auto._term_blocks(terms), terms)
    assert auto._cm_last_path == "aggregation"
    forced = _seg_engine(spark, si, use_sidecars=True)
    forced._cm_arrays(forced._term_blocks(terms), terms)
    assert forced._cm_last_path == "sidecar"
