"""Regression tests for two review findings:

1. Nested boolean queries on the blocked fast path must be
   rank-identical to the naive engine — "(a AND b) OR c" must NOT be
   flattened into a conjunctive query.
2. Segmented pruning bounds must stay valid when segments have very
   different average document lengths (avgdl drift): decode recomputes
   exact scores with the GLOBAL avgdl, so the per-segment stored
   bounds need an avgdl correction factor, not just the idf ratio.
"""

from __future__ import annotations

import math

import pytest

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.plans.planner import SearchEngine

NESTED_QUERIES = [
    "(alpha AND beta) OR gamma",
    "gamma (alpha AND beta)",
    "+gamma (alpha AND beta)",
    "(alpha AND beta) OR (delta AND eps)",
]


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    # DISJOINT vocabularies so the clauses discriminate: doc 2 matches
    # only "gamma" — a flattener that turns the OR into AND drops it
    rows = [
        (0, "alpha beta filler0 filler1"),
        (1, "alpha filler2 filler3"),          # alpha without beta
        (2, "gamma filler4 filler5"),          # gamma only
        (3, "alpha beta gamma filler6"),
        (4, "delta eps filler7"),
        (5, "delta filler8"),
        (6, "beta filler9"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()
    idx_dir = str(tmp_path_factory.mktemp("nested") / "idx")
    bi = BlockedIndex(idx_dir)
    bi.build(docs.select("doc_id", "text"), fingerprint="nested-test")
    return SearchEngine.from_documents(docs, cache=False), BlockedSearchEngine(
        spark, bi
    )


@pytest.mark.slow
@pytest.mark.parametrize("q", NESTED_QUERIES)
def test_nested_boolean_rank_identical(engines, q):
    naive, blocked = engines
    want = [(r["rank"], r["doc_id"], r["score"]) for r in naive.search(q, 10).collect()]
    got = [(r["rank"], r["doc_id"], r["score"]) for r in blocked.search(q, 10).collect()]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], q
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9), q
    # the OR-of-AND query set must include the gamma-only doc
    if q == "(alpha AND beta) OR gamma":
        assert 2 in [d for _, d, _ in got]


@pytest.mark.slow
def test_segmented_exact_under_avgdl_skew(spark, tmp_path):
    """Segment A: 5-token docs; segment B: ~80-token docs.  The union's
    global avgdl differs ~10x from either segment's own — the regime
    where idf-only bound rescaling over-prunes.  Segmented results must
    equal a single index built over the union, for every query shape."""
    # Planted so the TRUE top docs live in the SHORT segment: "zz"
    # appears once in 15 five-token docs (short segment) and twice in
    # 30 eighty-token docs (long segment).  Under the GLOBAL avgdl
    # (~55) the short docs score ~1.59·idf, but their stored bound
    # (segment avgdl 5) is only ~1.0·idf — an idf-only rescale prunes
    # their blocks below the long segment's overestimated θ and the
    # top-k silently loses its best documents.
    rows = []
    for i in range(15):
        rows.append((i, f"zz s{i}a s{i}b s{i}c s{i}d"))
    for i in range(15, 45):
        filler = " ".join(f"l{i}w{j}" for j in range(78))
        rows.append((i, f"zz zz {filler}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()

    single = BlockedIndex(str(tmp_path / "single"))
    single.build(docs, fingerprint="skew-single", score_mode="dl")
    eng_single = BlockedSearchEngine(spark, single)

    si = SegmentedIndex(str(tmp_path / "segs"))
    si.add_segment(docs.filter("doc_id < 15"), fingerprint="short")
    si.add_segment(docs.filter("doc_id >= 15"), fingerprint="long")
    eng_seg = si.engine(spark)

    for q in ["zz", "zz s0a", "zz AND s1a"]:
        want = [
            (r["rank"], r["doc_id"], r["score"])
            for r in eng_single.search(q, 10).collect()
        ]
        got = [
            (r["rank"], r["doc_id"], r["score"])
            for r in eng_seg.search(q, 10).collect()
        ]
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], q
        for (_, _, gs), (_, _, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), q
