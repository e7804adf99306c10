"""Query-grammar extensions: boost (`term^2`), doc_id ranges
(`doc_id:[lo TO hi]`), and match-all (`*`).

BIDS hands the raw query string to tantivy's QueryParser
(reference bids/index.py:147), whose public grammar accepts boost
suffixes on any clause, range queries on the indexed i64 `doc_id`
fast field (reference bids/index.py:53-55), and a lone `*` AllQuery —
so a reference user can run these today.  Semantics mirrored here:
BoostQuery multiplies the wrapped query's score; RangeQuery/AllQuery
are constant scorers (1.0 × boost); Lucene BooleanQuery combination is
unchanged.

Every query shape is asserted rank-identical and score-close across
the committed brute-force oracle, the naive engine, the blocked
pruned path (prune on AND off), the segmented engine, and
search_many."""

from __future__ import annotations

import math

import pytest

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.oracle import OracleIndex
from bids_spark.plans.parser import (
    All,
    Bool,
    DocIdSet,
    Phrase,
    Range,
    Term,
    TermRange,
    TermSet,
    parse_query,
)
from bids_spark.plans.planner import SearchEngine

# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parse_term_boost():
    b = parse_query("data^2")
    assert b.should == [Term("data", 2.0)]


def test_parse_boost_float():
    b = parse_query("data^0.5 merge")
    assert b.should == [Term("data", 0.5), Term("merge")]


def test_parse_phrase_boost():
    b = parse_query('"merge join"^3')
    assert b.should == [Phrase(("merge", "join"), 3.0)]


def test_parse_group_boost():
    b = parse_query("(merge join)^2 data")
    grp = b.should[0]
    assert isinstance(grp, Bool) and grp.boost == 2.0
    assert grp.should == [Term("merge"), Term("join")]
    assert b.should[1] == Term("data")


def test_parse_boost_composes():
    b = parse_query("(data^2)^3")
    assert b.should == [Term("data", 6.0)]


def test_parse_boost_invalid():
    with pytest.raises(ValueError):
        parse_query("data^abc")
    with pytest.raises(ValueError):
        parse_query("data^-2")
    with pytest.raises(ValueError):
        parse_query("data^0")


def test_parse_range_inclusive():
    b = parse_query("doc_id:[5 TO 40]")
    assert b.should == [Range(5, 40)]


def test_parse_range_exclusive():
    # integer field: exclusive bounds normalize to inclusive ±1
    b = parse_query("doc_id:{5 TO 40}")
    assert b.should == [Range(6, 39)]


def test_parse_range_open():
    assert parse_query("doc_id:[* TO 40]").should == [Range(None, 40)]
    assert parse_query("doc_id:[5 TO *]").should == [Range(5, None)]


def test_parse_range_boost_and_occur():
    b = parse_query("data AND doc_id:[5 TO 40]^2")
    inner = b.should[0] if b.should else b
    assert isinstance(inner, Bool)
    assert Range(5, 40, 2.0) in inner.must


def test_parse_range_bad_field():
    with pytest.raises(ValueError):
        parse_query("title:[a TO b]")


def test_parse_term_range():
    assert parse_query("content:[a TO b]").should == [TermRange("a", "b")]
    assert parse_query("content:{a TO b}").should == [
        TermRange("a", "b", lo_incl=False, hi_incl=False)
    ]
    # an open content start is floored just above the url namespace
    # (URL_NS terms sort below every content token — functions/fields.py)
    assert parse_query("content:[* TO b]").should == [TermRange("\x02", "b")]
    assert parse_query("content:[a TO *]^2").should == [
        TermRange("a", None, boost=2.0)
    ]
    # bounds go through the query tokenizer (lowercase)
    assert parse_query("content:[Merge TO Part]").should == [
        TermRange("merge", "part")
    ]


def test_parse_term_range_bad_bounds():
    with pytest.raises(ValueError):
        parse_query("content:[a.b, TO d]")  # multi-token bound
    with pytest.raises(ValueError):
        parse_query("content:[,. TO d]")  # zero-token bound


def test_parse_range_bad_bounds():
    with pytest.raises(ValueError):
        parse_query("doc_id:[a TO b]")


def test_parse_match_all():
    assert parse_query("*").should == [All()]
    b = parse_query("* -data")
    assert b.should == [All()] and b.must_not == [Term("data")]


def test_parse_all_boost():
    assert parse_query("*^2").should == [All(2.0)]


def test_parse_term_set():
    b = parse_query("content: IN [merge join]")
    assert b.should == [TermSet(("join", "merge"))]
    # bare IN uses the default field
    assert parse_query("IN [merge join]").should == [TermSet(("join", "merge"))]


def test_parse_docid_set():
    assert parse_query("doc_id: IN [3 1 2]").should == [DocIdSet((1, 2, 3))]


def test_parse_set_boost_and_empty():
    assert parse_query("IN [merge]^2").should == [TermSet(("merge",), 2.0)]
    assert parse_query("IN []").should == [TermSet(())]


def test_parse_set_errors():
    with pytest.raises(ValueError):
        parse_query("doc_id: IN [1 x]")
    with pytest.raises(ValueError):
        parse_query("title: IN [a]")
    with pytest.raises(ValueError):
        parse_query("content:IN [a b]")  # glued form: loud error
    with pytest.raises(ValueError):
        parse_query("content: IN [foo.bar]")  # multi-token value


def test_parse_lowercase_in_still_a_term():
    assert parse_query("in data").should == [Term("in"), Term("data")]


def test_parse_plain_queries_unchanged():
    # no boost/range syntax → identical ASTs to before (defaults == 1.0)
    assert parse_query("merge join").should == [Term("merge"), Term("join")]
    assert parse_query('"merge join"').should == [Phrase(("merge", "join"))]


# ---------------------------------------------------------------------------
# engines: oracle / naive / blocked / segmented / search_many identity
# ---------------------------------------------------------------------------

QUERIES = [
    "data^2 merge",                       # boosted term in an OR (pruned path)
    "data^0.5 merge join sort",           # down-boost, 4-term OR
    "the^3 data",                         # boosted head term
    '"merge join"^2 data',                # boosted phrase
    "(merge OR join)^2 AND data",         # boosted group under a must
    "data^2 AND merge",                   # boosted must
    "data^2 AND merge -join",             # boosted must + must_not
    "merge^4",                            # single boosted term (pruned single)
    "data AND doc_id:[100 TO 300]",       # range-restricted scoring
    "doc_id:[100 TO 300]",                # pure range (constant scores)
    "doc_id:{100 TO 300}",                # exclusive bounds
    "doc_id:[* TO 50] data",              # open bound as a should clause
    "data -doc_id:[0 TO 400]",            # range as must_not
    "doc_id:[400 TO 100]",                # empty range (lo > hi)
    "*",                                  # match-all
    "* -data",                            # match-all minus a term
    "*^2 data",                           # boosted all + term
    '"merge join"~2',                     # sloppy phrase (tests/test_phrase_slop.py pins the matcher)
    '"join merge"~2 data',                # transposed sloppy phrase in an OR
    '"the data"~4 AND merge',             # sloppy phrase under a must
    '"merge join"~1^2',                   # slop + boost
    '"merge join sort"~3',                # 3-term sloppy phrase
    "content: IN [merge join]",           # term-set query (constant scorer)
    "IN [dup hash]^2 data",               # bare IN (default field) + boost
    "data AND content: IN [merge join]",  # set under a must
    "doc_id: IN [5 100 333]",             # fast-field set
    "data AND doc_id: IN [100 150 200]",  # must doc_id set (block-skip ctx)
    "* -content: IN [the a]",             # set as must_not
    "content: IN [zzznope]",              # set of absent terms → empty
    "content:[merge TO part]",            # term-dictionary range
    "content:{merge TO part}",            # exclusive string bounds
    "content:[* TO column]",              # open low end
    "content:[q TO s]^2 data",            # boosted range in an OR
    "data AND content:[me TO mz]",        # range under a must
    "* -content:[a TO k]",                # range as must_not
    "content:[zz TO zzz]",                # empty term range
    "content:[m TO p] AND doc_id:[100 TO 400]",  # term range ∧ doc range
]


@pytest.fixture(scope="module")
def oracle(docs_pdf):
    return OracleIndex(dict(zip(docs_pdf.doc_id, docs_pdf.text)))


@pytest.fixture(scope="module")
def naive(docs):
    return SearchEngine.from_documents(docs)


@pytest.fixture(scope="module")
def index(docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("qext") / "idx")
    bi = BlockedIndex(root)
    bi.build(docs, fingerprint="qext", n_partitions=8, with_positions=True)
    return bi


@pytest.fixture(scope="module")
def blocked(spark, index):
    e = BlockedSearchEngine(spark, index, cache=True)
    e.OM_MIN_BLOCKS = 0  # force the aligned bound / bitmap machinery on
    return e


@pytest.fixture(scope="module")
def seg_engine(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("qextseg"))
    si = SegmentedIndex(root)
    si.add_segment(docs.filter(docs.doc_id % 2 == 0), fingerprint="ev",
                   n_partitions=4)
    si.add_segment(docs.filter(docs.doc_id % 2 == 1), fingerprint="od",
                   n_partitions=4)
    return si.engine(spark)


def _rows(df):
    return [(r["rank"], r["doc_id"], round(r["score"], 9))
            for r in df.collect()]


def _assert_close(got, want, q):
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], q
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-6), (q, gs, ws)


@pytest.mark.parametrize("q", QUERIES)
def test_naive_matches_oracle(naive, oracle, q):
    got = _rows(naive.search(q, 10))
    want = oracle.search(q, 10)
    _assert_close(got, want, q)


@pytest.mark.parametrize("q", QUERIES)
def test_blocked_matches_naive(blocked, naive, q):
    got = _rows(blocked.search(q, 10))
    want = _rows(naive.search(q, 10))
    _assert_close(got, want, q)


@pytest.mark.parametrize("q", QUERIES)
def test_blocked_prune_off_identical(blocked, q):
    on = _rows(blocked.search(q, 10, prune=True))
    off = _rows(blocked.search(q, 10, prune=False))
    assert on == off, q


@pytest.mark.parametrize("q", QUERIES)
def test_segmented_matches_naive(seg_engine, naive, q):
    got = _rows(seg_engine.search(q, 10))
    want = _rows(naive.search(q, 10))
    _assert_close(got, want, q)


def test_search_many_parity(blocked):
    batch = {f"q{i}": q for i, q in enumerate(QUERIES)}
    got = {}
    for r in blocked.search_many(batch, 10).collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )
    for qid, q in batch.items():
        want = _rows(blocked.search(q, 10))
        assert got.get(qid, []) == want, q


def test_search_many_parity_segmented(seg_engine):
    batch = {f"q{i}": q for i, q in enumerate(QUERIES)}
    got = {}
    for r in seg_engine.search_many(batch, 10).collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )
    for qid, q in batch.items():
        want = _rows(seg_engine.search(q, 10))
        assert got.get(qid, []) == want, q


# ---------------------------------------------------------------------------
# semantics spot checks
# ---------------------------------------------------------------------------


def test_boost_scales_scores(naive):
    base = {r["doc_id"]: r["score"] for r in naive.search("data", 10).collect()}
    boosted = {
        r["doc_id"]: r["score"] for r in naive.search("data^2", 10).collect()
    }
    assert set(base) == set(boosted)
    for d, s in base.items():
        assert math.isclose(boosted[d], 2.0 * s, rel_tol=1e-12)


def test_range_restricts_and_adds_constant(naive):
    plain = {r["doc_id"]: r["score"]
             for r in naive.search("data", 500).collect()}
    ranged = naive.search("data AND doc_id:[100 TO 300]", 500).collect()
    assert ranged, "range query matched nothing"
    for r in ranged:
        assert 100 <= r["doc_id"] <= 300
        assert math.isclose(
            r["score"], plain[r["doc_id"]] + 1.0, rel_tol=1e-12
        )


def test_pure_range_orders_by_doc_id(naive):
    rows = naive.search("doc_id:[100 TO 300]", 5).collect()
    assert [r["doc_id"] for r in rows] == [100, 101, 102, 103, 104]
    assert all(r["score"] == 1.0 for r in rows)


def test_term_range_matches_member_terms(naive):
    # [merge TO part] over the fixture vocab = {merge, order, part};
    # exclusive bounds leave {order} only
    incl = {r["doc_id"] for r in naive.search("content:[merge TO part]", 500).collect()}
    want = {r["doc_id"] for r in naive.search("content: IN [merge order part]", 500).collect()}
    assert incl == want and incl
    excl = {r["doc_id"] for r in naive.search("content:{merge TO part}", 500).collect()}
    want_x = {r["doc_id"] for r in naive.search("content: IN [order]", 500).collect()}
    assert excl == want_x and excl


def test_term_range_constant_score(naive):
    rows = naive.search("content:[merge TO part]", 5).collect()
    assert rows and all(r["score"] == 1.0 for r in rows)


def test_term_range_excludes_deleted_docs(spark, docs, tmp_path_factory):
    # segmented engine with tombstones: deleted docs leave the range's
    # match set (constant scorers honour live-docs like every node)
    root = str(tmp_path_factory.mktemp("trdel"))
    si = SegmentedIndex(root)
    si.add_segment(docs, fingerprint="all", n_partitions=4)
    eng = si.engine(spark)
    live = {r["doc_id"] for r in eng.search("content:[merge TO part]", 500).collect()}
    victims = sorted(live)[:3]
    si.delete_docs(spark, victims)
    eng2 = si.engine(spark)
    after = {r["doc_id"] for r in eng2.search("content:[merge TO part]", 500).collect()}
    assert after == live - set(victims)


def test_match_all_counts_every_doc(naive, docs):
    assert naive.search("*", 1000).count() == docs.count()


def test_empty_range_matches_nothing(blocked):
    assert blocked.search("doc_id:[400 TO 100]", 10).count() == 0


def test_range_prunes_blocked_decode(spark, index):
    """The blocked generic path skips blocks outside a must-range's
    doc interval: with the restriction a narrow range decodes a strict
    subset of the term's blocks (doc_id IS the block sort key)."""
    eng = BlockedSearchEngine(spark, index)
    all_blocks = eng._term_blocks(["data"]).count()
    restricted = eng._range_restricted_blocks(
        eng._term_blocks(["data"]), (100, 110)
    ).count()
    assert 0 < restricted < all_blocks


def test_range_restrict_on_off_identical(spark, index, naive):
    """RANGE_RESTRICT off decodes every candidate block and lets the
    Range must-join filter rows — results must be identical."""
    on = BlockedSearchEngine(spark, index)
    off = BlockedSearchEngine(spark, index)
    off.RANGE_RESTRICT = False
    for q in (
        "data AND doc_id:[100 TO 300]",
        '"merge join" AND doc_id:[50 TO 150]',
        "doc_id:[* TO 50] data AND doc_id:[10 TO *]",
    ):
        got_on = _rows(on.search(q, 10))
        got_off = _rows(off.search(q, 10))
        assert got_on == got_off, q
        _assert_close(got_on, _rows(naive.search(q, 10)), q)


def test_segmented_all_respects_tombstones(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("qexttomb"))
    si = SegmentedIndex(root)
    si.add_segment(docs, fingerprint="full", n_partitions=4)
    si.delete_docs(spark, [100, 101])
    eng = si.engine(spark)
    hits = {r["doc_id"] for r in eng.search("*", 1000).collect()}
    assert 100 not in hits and 101 not in hits
    assert len(hits) == docs.count() - 2
    ranged = {r["doc_id"]
              for r in eng.search("doc_id:[99 TO 102]", 10).collect()}
    assert ranged == {99, 102}
    # set queries exclude tombstoned docs too: term sets through the
    # decode anti-join, doc_id sets through the _live seam
    idset = {r["doc_id"]
             for r in eng.search("doc_id: IN [99 100 101 102]", 10).collect()}
    assert idset == {99, 102}
    tset = {r["doc_id"]
            for r in eng.search("content: IN [data merge]", 1000).collect()}
    assert tset and 100 not in tset and 101 not in tset
