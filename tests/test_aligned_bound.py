"""Range-aligned multi-term block-max bounds (wand.py Phase 3,
"aligned"): exactness vs the naive engine on a score-skewed corpus,
strictly-tighter pruning than the loose Σ gmax bound where vocabulary
drifts across doc ranges, and the segmented engine under rescaled
bounds.  Reference semantics: tantivy's BMW per-range alignment
(reference bids/index.py:155)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.plans.planner import SearchEngine

REPLICATE, TOPICS = 8, 4


@pytest.fixture(scope="module")
def drifted(spark, docs, tmp_path_factory):
    """500 base docs × 8 replicas (disjoint 10M-stride ranges), topic
    band g = rep·4//8 — the in-test twin of sources.replicate.
    drifted_corpus (same token scheme, built from the docs fixture)."""
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
def eng(spark, drifted, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("aligned") / "idx")
    bi = BlockedIndex(root)
    bi.build(drifted, fingerprint="aligned-drift", n_partitions=8)
    return BlockedSearchEngine(spark, bi)


@pytest.fixture(scope="module")
def naive(drifted):
    return SearchEngine.from_documents(drifted, cache=False)


def _top(engine, q, k=10):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in engine.search(q, k).collect()
    ]


QUERIES = [
    "data t1x",                 # head + topic: top-k concentrates in band 1
    "t0x t3y",                  # two disjoint-band topics
    "data t2x t2y",
    "the data",                 # all-head control: drift can't help here
    "data merge join sort window",
]


@pytest.mark.parametrize("q", QUERIES)
def test_rank_identity_on_drifted_corpus(eng, naive, q):
    assert _top(eng, q) == _top(naive, q)


@pytest.mark.parametrize("q", QUERIES)
def test_aligned_off_matches_on(eng, q):
    terms = q.split()
    on = eng._topk_or_pruned(terms, 10, aligned=True).collect()
    off = eng._topk_or_pruned(terms, 10, aligned=False).collect()
    assert [(r["doc_id"], r["score"]) for r in on] == [
        (r["doc_id"], r["score"]) for r in off
    ]


def test_aligned_prunes_strictly_more_on_drift(eng):
    """The round-3 gap: multi-term ORs decoded 100% of postings under
    the loose bound.  On a drifted corpus the aligned bound must prune
    blocks the loose bound provably cannot (the head term's blocks in
    bands where the topic term is absent)."""
    on = eng.pruning_stats("data t1x", 10, "dict", aligned=True)
    off = eng.pruning_stats("data t1x", 10, "dict", aligned=False)
    assert on["blocks_total"] == off["blocks_total"] > 0
    assert on["theta"] == off["theta"] > 0
    assert on["blocks_survive"] < off["blocks_survive"]
    # the aligned bound must keep strictly less than everything
    assert on["blocks_survive"] < on["blocks_total"]


def test_search_surface_with_aligned_engaged(spark, eng, naive):
    """search() auto-engages the aligned bound above OM_MIN_BLOCKS —
    force the threshold down on a fresh engine so the full public
    surface (parse → θ → aligned filter → decode → top-k) runs with
    it live, and must stay rank-identical."""
    forced = BlockedSearchEngine(spark, eng.index)
    forced.OM_MIN_BLOCKS = 0
    for q in ("data t1x", "t0x t3y", "the data"):
        assert _top(forced, q) == _top(naive, q)


def test_auto_threshold_skips_on_tiny_corpus(eng):
    """Default path (aligned=None) below OM_MIN_BLOCKS must not run
    the cm job: the auto stats must match aligned=False exactly and
    the memo must stay cold."""
    fresh = BlockedSearchEngine(eng.spark, eng.index, cache=True)
    auto = fresh.pruning_stats("data t1x", 10, "dict")
    off = fresh.pruning_stats("data t1x", 10, "dict", aligned=False)
    assert auto["blocks_survive"] == off["blocks_survive"]
    assert fresh._cm_memo == {}  # cm job never ran


def test_single_term_unaffected(eng):
    on = eng.pruning_stats("data", 10, "dict", aligned=True)
    off = eng.pruning_stats("data", 10, "dict", aligned=False)
    assert (on["blocks_survive"], on["theta"]) == (
        off["blocks_survive"],
        off["theta"],
    )


def test_doc_domain_from_manifest(eng):
    lo, hi = eng._doc_domain()
    assert lo == 0 and hi >= (REPLICATE - 1) * 10_000_000
    # grid invariants: chunks cover the domain
    glo, width, n = eng._chunk_grid()
    assert glo == lo and width * n >= hi - lo + 1
    assert n <= eng.OM_MAX_CHUNKS


def test_domain_fallback_without_manifest(spark, eng):
    """Indexes built before doc_lo/doc_hi existed fall back to one
    metadata agg."""
    man = eng.index._manifest()
    saved = (
        man["stages"]["blocks"].pop("doc_lo"),
        man["stages"]["blocks"].pop("doc_hi"),
    )
    try:
        fresh = BlockedSearchEngine(spark, eng.index)
        fresh.index._manifest = lambda: man  # type: ignore[method-assign]
        assert fresh._doc_domain() == eng._doc_domain()
    finally:
        man["stages"]["blocks"]["doc_lo"] = saved[0]
        man["stages"]["blocks"]["doc_hi"] = saved[1]


def test_segmented_aligned_exact(spark, drifted, naive, tmp_path):
    """Two segments split across bands: the aligned bound runs over
    RESCALED per-segment block maxima (segments.py) and must stay
    rank- and score-identical to the naive engine on the union."""
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
    for q in ("data t1x", "t0x t3y", "the data"):
        assert _top(seng, q) == _top(naive, q)
