"""TINY_LOOKUP_LITERAL parity: per-query tiny dim lookups (gmax /
boosts / batched thresholds / segmented idf substitution) served as
CASE-literal columns must be BIT-identical to the broadcast-join twin.

The literal path exists for latency: materializing even a ≤5-row local
relation as a broadcast is one extra Spark job per query (measured
~0.4 s of the ~0.9 s hot single-query p50 on local[32] —
tools/latency_probe.py, BENCH/BASELINE.md).  Both paths ship the same
Python doubles as JVM literals, so scores must match with NO rounding
tolerance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine, lookup_expr

REPLICATE, TOPICS = 4, 2

QUERIES = [
    "data t1x",                     # OR, drift-skewed
    "data merge join sort window",  # 5-term OR
    "merge^2 join",                 # boost: _bb column + _apply_boosts
    "merge^2 join^0.5 data",        # multi-boost
    "merge AND join",               # AND path
    "merge -join",                  # NOT
    '"merge join"',                 # phrase (positions)
    "data data",                    # duplicate term
]

BATCH = {f"q{i}": q for i, q in enumerate(QUERIES)}


@pytest.fixture(scope="module")
def drifted(spark, docs):
    g = (F.col("rep") * TOPICS / F.lit(REPLICATE)).cast("long")
    big = (
        docs.crossJoin(
            F.broadcast(spark.range(REPLICATE).select(F.col("id").alias("rep")))
        )
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias(
                "doc_id"
            ),
            F.concat(
                F.col("text"), F.format_string(" t%dx t%dx t%dy", g, g, g)
            ).alias("text"),
        )
        .cache()
    )
    big.count()
    return big


@pytest.fixture(scope="module")
def eng(spark, drifted, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tinylk") / "idx")
    bi = BlockedIndex(root)
    bi.build(drifted, fingerprint="tinylk", n_partitions=8,
             with_positions=True)
    return BlockedSearchEngine(spark, bi, cache=True)


@pytest.fixture(scope="module")
def seg_eng(spark, drifted, tmp_path_factory):
    si = SegmentedIndex(str(tmp_path_factory.mktemp("tinylk_seg") / "idx"))
    si.add_segment(
        drifted.filter(F.col("doc_id") < 20_000_000), name="seg-lo",
        n_partitions=4,
    )
    si.add_segment(
        drifted.filter(F.col("doc_id") >= 20_000_000), name="seg-hi",
        n_partitions=4,
    )
    return si.engine(spark)


def _top(engine, q, k=10):
    # exact scores — the two paths must be bit-identical, not close
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in engine.search(q, k).collect()
    ]


def _flip(engine, literal: bool):
    # instance attr shadows the class switch — no cross-test bleed
    engine.TINY_LOOKUP_LITERAL = literal


@pytest.mark.parametrize("q", QUERIES)
def test_literal_vs_join_blocked(eng, q):
    try:
        _flip(eng, True)
        lit = _top(eng, q)
        _flip(eng, False)
        join = _top(eng, q)
    finally:
        del eng.TINY_LOOKUP_LITERAL
    assert lit == join
    assert lit, q  # non-vacuous: every query matches something


@pytest.mark.parametrize("q", ["data t1x", "merge^2 join", "merge AND join"])
def test_literal_vs_join_segmented(seg_eng, q):
    try:
        _flip(seg_eng, True)
        lit = _top(seg_eng, q)
        _flip(seg_eng, False)
        join = _top(seg_eng, q)
    finally:
        del seg_eng.TINY_LOOKUP_LITERAL
    assert lit == join
    assert lit, q


def test_literal_vs_join_batched(eng):
    def batch():
        rows = eng.search_many(BATCH, 10).collect()
        return sorted(
            (r["qid"], r["rank"], r["doc_id"], r["score"]) for r in rows
        )

    try:
        _flip(eng, True)
        lit = batch()
        _flip(eng, False)
        join = batch()
    finally:
        del eng.TINY_LOOKUP_LITERAL
    assert lit == join
    assert lit


def test_aligned_forced_parity(eng):
    """The aligned bound path builds pred before the lookup attaches —
    force it on (index is below OM_MIN_BLOCKS) on both arms."""
    q = ["data", "t1x", "merge"]
    try:
        _flip(eng, True)
        lit = eng._topk_or_pruned(q, 10, aligned=True).collect()
        _flip(eng, False)
        join = eng._topk_or_pruned(q, 10, aligned=True).collect()
    finally:
        del eng.TINY_LOOKUP_LITERAL
    assert [(r["doc_id"], r["score"]) for r in lit] == [
        (r["doc_id"], r["score"]) for r in join
    ]
    assert lit


def test_lookup_expr_semantics(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("zz",)], ["k"]
    )
    # default=None → NULL for unmapped keys; comparisons drop the row
    got = (
        df.withColumn("v", lookup_expr(F.col("k"), {"a": 1.5, "b": -2.0}))
        .filter(F.col("v") >= F.lit(-10.0))
        .collect()
    )
    assert sorted((r["k"], r["v"]) for r in got) == [("a", 1.5), ("b", -2.0)]
    # explicit default keeps unmapped keys
    got2 = df.select(
        "k", lookup_expr(F.col("k"), {"a": 2.0}, 1.0).alias("v")
    ).collect()
    assert sorted((r["k"], r["v"]) for r in got2) == [
        ("a", 2.0), ("b", 1.0), ("zz", 1.0)
    ]
    # -inf thresholds (batched no-θ queries) survive as literals
    got3 = df.select(
        lookup_expr(F.col("k"), {"a": float("-inf")}, 0.0).alias("v")
    ).collect()
    assert min(r["v"] for r in got3) == float("-inf")
    # empty mapping → constant default
    assert df.select(
        lookup_expr(F.col("k"), {}, 3.0).alias("v")
    ).first()["v"] == 3.0


# -- rarest-term restriction: literal span predicate vs join twin ------------
#
# Same scheduling story as the CASE lookups: the broadcast semi-join
# twin materializes the rarest term's block intervals as a broadcast
# EVERY query (1 job on AND shapes, 2 on phrases); the literal path
# collects+merges them once (memoized hot) and restricts via a pure
# column predicate.  Identical survivor sets required — the counters
# prove it, not just the top-k.

RESTRICT_QUERIES = [
    "merge AND join",
    "merge AND join AND data",
    '"merge join"',
    "(merge AND join) OR data",
    "t1x AND data",          # skewed must: rarest term lives in one band
]


@pytest.mark.parametrize("q", RESTRICT_QUERIES)
def test_rarest_literal_vs_join_blocked(eng, q):
    try:
        eng.RANGE_PRED_LITERAL = True
        lit = _top(eng, q)
        eng.RANGE_PRED_LITERAL = False
        join = _top(eng, q)
    finally:
        del eng.RANGE_PRED_LITERAL
    assert lit == join
    assert lit, q


@pytest.mark.parametrize("q", ["merge AND join", "t1x AND data"])
def test_rarest_literal_vs_join_segmented(seg_eng, q):
    try:
        seg_eng.RANGE_PRED_LITERAL = True
        lit = _top(seg_eng, q)
        seg_eng.RANGE_PRED_LITERAL = False
        join = _top(seg_eng, q)
    finally:
        del seg_eng.RANGE_PRED_LITERAL
    assert lit == join
    assert lit, q


def test_rarest_restriction_counters_identical(eng):
    """and_pruning_stats survivor counters — the deterministic pruning
    evidence — must not move between mechanisms."""
    for q in ["merge AND join", "t1x AND data", '"merge join"']:
        try:
            eng.RANGE_PRED_LITERAL = True
            lit = eng.and_pruning_stats(q)
            eng.RANGE_PRED_LITERAL = False
            join = eng.and_pruning_stats(q)
        finally:
            del eng.RANGE_PRED_LITERAL
        assert lit == join, q
        assert lit["blocks_total"] > 0


def test_term_spans_merge(eng):
    """Spans are sorted, disjoint, non-adjacent, and cover exactly the
    term's block intervals (integer-adjacent merging is a no-op over
    integer doc_ids)."""
    los, his = eng._term_spans("data")
    assert los and len(los) == len(his)
    assert all(lo <= hi for lo, hi in zip(los, his))
    assert all(his[i] + 1 < los[i + 1] for i in range(len(los) - 1))
    blocks = (
        eng._term_blocks(["data"]).select("first_doc", "max_doc").collect()
    )
    covered = set()
    for lo, hi in zip(los, his):
        covered.update(range(lo, hi + 1))
    for r in blocks:
        for d in (int(r["first_doc"]), int(r["max_doc"])):
            assert d in covered
    # memoized (cache=True engine): second call returns the same object
    assert eng._term_spans("data") is eng._term_spans("data")


def test_interval_pred_matches_bruteforce(spark):
    """_interval_pred vs per-row any-overlap brute force on a grid of
    block intervals against irregular spans (gaps, singletons, ends)."""
    los, his = [0, 10, 25, 40], [3, 18, 25, 49]
    rows = [
        (a, b)
        for a in range(0, 55, 3)
        for b in (a, a + 2, a + 7, a + 20)
    ]
    df = spark.createDataFrame(rows, "first_doc bigint, max_doc bigint")
    got = {
        (r["first_doc"], r["max_doc"])
        for r in df.filter(
            BlockedSearchEngine._interval_pred(los, his)
        ).collect()
    }
    want = {
        (a, b)
        for a, b in rows
        if any(lo <= b and hi >= a for lo, hi in zip(los, his))
    }
    assert got == want


# -- fused NOT: must_not inside the main aggregation vs anti-join twin -------

NOT_QUERIES = [
    "merge -join",
    "merge join -data",
    "merge AND join -data",       # must + not
    "merge^2 -join",              # boosted positive with exclusion
    "data -zzznotaterm",          # absent neg term: no-op exclusion
    "merge -merge",               # pos == neg: provably empty
]


def _top9(engine, q, k=10):
    # round like the established parity suites: the fused plan may sum
    # partials in a different order (documented envelope)
    return [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in engine.search(q, k).collect()
    ]


@pytest.mark.parametrize("q", NOT_QUERIES)
def test_not_fused_vs_antijoin_blocked(eng, q):
    try:
        eng.NOT_FUSED = True
        fused = _top9(eng, q)
        eng.NOT_FUSED = False
        twin = _top9(eng, q)
    finally:
        del eng.NOT_FUSED
    assert fused == twin
    if q != "merge -merge":
        assert fused, q
    else:
        assert fused == []


@pytest.mark.parametrize("q", ["merge -join", "merge AND join -data"])
def test_not_fused_vs_antijoin_segmented(seg_eng, q):
    try:
        seg_eng.NOT_FUSED = True
        fused = _top9(seg_eng, q)
        seg_eng.NOT_FUSED = False
        twin = _top9(seg_eng, q)
    finally:
        del seg_eng.NOT_FUSED
    assert fused == twin
    assert fused, q


def test_not_fused_excludes_exactly(eng, drifted):
    """Ground truth from the corpus: no result doc contains the
    excluded term; every top-k doc of the unexcluded query that lacks
    it is preserved in order."""
    from pyspark.sql import functions as F2

    with_neg = {
        r["doc_id"]
        for r in drifted.filter(
            F2.col("text").rlike(r"(?i)(^|[^\p{L}\p{N}])join($|[^\p{L}\p{N}])")
        ).select("doc_id").collect()
    }
    got = [r["doc_id"] for r in eng.search("merge -join", 50).collect()]
    assert got and not (set(got) & with_neg)
