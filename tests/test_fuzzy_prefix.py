"""Fuzzy (`term~N`) and prefix (`term*`, `"a b"*`) queries — rank/
score identity across every engine vs the brute-force oracle.

The reference reaches both surfaces through tantivy's QueryParser
(/root/reference/bids/index.py:147).  Committed semantics (plans/
parser.py Fuzzy / PhrasePrefix / prefix_term_range docstrings):
- fuzzy: Levenshtein-≤N dictionary expansion (plain edit distance,
  N ≤ 2), constant scorer over the expanded union — tantivy's
  automaton queries score through a ConstScorer;
- prefix: exact term-range desugar [t, t+U+10FFFF), constant scorer;
- phrase-prefix: fixed terms adjacent then ANY term with the last
  prefix, constant scorer, exact expansion (tantivy caps at 50 —
  documented divergence, superset only where the cap truncates).
"""

from __future__ import annotations

import pytest

from bids_spark.functions.fields import url_term
from bids_spark.oracle import OracleIndex, _levenshtein
from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.plans.parser import (
    PREFIX_CEIL,
    Fuzzy,
    PhrasePrefix,
    TermRange,
    parse_query,
)
from bids_spark.plans.planner import SearchEngine

DOCS = {
    1: "merge the data tables now",
    2: "join tables with merge",
    3: "github merge tool for data",
    4: "alpha beta gamma delta",
    5: "data github pages and the web",
    6: "the quick brown fox jumps merges",
    7: "merge merged merging again",
    8: "tables of data on the web",
    9: "",
    10: "zeta eta theta merging joins",
}
URLS = {
    1: "https://github.com/apache/merge",
    2: "https://example.com/sql/join",
    3: "https://gitlab.com/tools/merge-tool",
    4: "https://github.io/alpha/pages",
    5: "http://example.org/data/pages",
    6: "https://news.site.com/fox/story",
    7: "https://github.com/merge/merge",
    8: "ftp://archive.example.net/data",
    9: "https://empty.example.com/only/url",
    10: "",
}

QUERIES = [
    # fuzzy
    "merge~1",
    "merge~2",
    "merg~1",
    "merg~0",            # exact-only constant scorer
    "jion~1",            # 'join' at distance 2, 'joins' at 2 — miss at 1
    "jion~2",
    "xyzzy~2",           # nothing within distance
    "url:tool~1",
    "url:gthub~1",       # github at distance 1
    "merge~1^2.5 data",  # boost composes
    "data AND merge~2",
    "-merge~1 tables",   # fuzzy as must_not
    # prefix
    "mer*",
    "merg* data",
    "t*",                # single-letter prefix, many expansions
    "url:git*",
    "xyz*",
    "mer*^2 join",
    "data AND th*",
    # phrase-prefix
    '"merge jo"*',        # no adjacent match in DOCS
    '"the data"*',
    '"data table"*',
    '"merged mergi"*',    # doc 7 chain
    'url:"github co"*',   # url token stream adjacency
    '"data"*',            # degrades to plain prefix
    '"zzz yyy"*',
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(d, DOCS[d], URLS[d]) for d in sorted(DOCS)]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, url string"
    ).cache()


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(DOCS, URLS)


@pytest.fixture(scope="module")
def naive(corpus):
    return SearchEngine.from_documents(corpus, url_field=True, cache=True)


@pytest.fixture(scope="module")
def blocked(spark, corpus, tmp_path_factory):
    bi = BlockedIndex(str(tmp_path_factory.mktemp("fzidx") / "idx"))
    bi.build(
        corpus, fingerprint="fzpf", n_buckets=4,
        with_positions=True, score_mode="dl", url_field=True,
    )
    return BlockedSearchEngine(spark, bi, cache=True)


@pytest.fixture(scope="module")
def segmented(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fzseg") / "root")
    si = SegmentedIndex(root)
    si.add_segment(corpus.filter("doc_id <= 5"), fingerprint="segA",
                   n_buckets=4, url_field=True)
    si.add_segment(corpus.filter("doc_id > 5"), fingerprint="segB",
                   n_buckets=4, url_field=True)
    return si.engine(spark, cache=True)


def _rows(df):
    return [
        (r["rank"], r["doc_id"], round(r["score"], 9)) for r in df.collect()
    ]


def _want(oracle, q, k=10):
    return [(r, d, round(s, 9)) for r, d, s in oracle.search(q, k)]


# ---------------------------------------------------------------------------
# parser surface
# ---------------------------------------------------------------------------


def test_parser_shapes():
    assert parse_query("merge~1").should == [Fuzzy("merge", 1)]
    assert parse_query("url:tool~2").should == [Fuzzy(url_term("tool"), 2)]
    assert parse_query("mer*").should == [
        TermRange("mer", "mer" + PREFIX_CEIL, hi_incl=False)
    ]
    assert parse_query("url:git*").should == [
        TermRange(url_term("git"), url_term("git") + PREFIX_CEIL,
                  hi_incl=False)
    ]
    assert parse_query('"merge jo"*').should == [
        PhrasePrefix(("merge", "jo"))
    ]
    assert parse_query('url:"github co"*').should == [
        PhrasePrefix((url_term("github"), url_term("co")))
    ]
    # boost composes on all three
    assert parse_query("merge~1^2").should == [Fuzzy("merge", 1, 2.0)]
    assert parse_query("mer*^2").should[0].boost == 2.0
    assert parse_query('"merge jo"*^2').should == [
        PhrasePrefix(("merge", "jo"), 2.0)
    ]


def test_parser_rejections():
    with pytest.raises(ValueError, match="exceeds 2"):
        parse_query("data~3")
    with pytest.raises(ValueError, match="single term"):
        parse_query("foo.bar~1")
    with pytest.raises(ValueError, match="single term"):
        parse_query("foo.bar*")
    with pytest.raises(ValueError, match="unknown field"):
        parse_query("title:data~1")
    with pytest.raises(ValueError, match="unknown field"):
        parse_query("title:da*")


def test_multi_default_field_expansion():
    # one phrase-prefix per default field, should-unioned (and
    # flattened into the top-level Bool like every multi-field atom)
    b = parse_query('"merge jo"*', ("content", "url"))
    assert b.should == [
        PhrasePrefix(("merge", "jo")),
        PhrasePrefix((url_term("merge"), url_term("jo"))),
    ]


# ---------------------------------------------------------------------------
# identity matrix: every engine vs the oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("q", QUERIES)
def test_naive_matches_oracle(naive, oracle, q):
    assert _rows(naive.search(q, 10)) == _want(oracle, q)


@pytest.mark.parametrize("q", QUERIES)
def test_blocked_matches_oracle(blocked, oracle, q):
    assert _rows(blocked.search(q, 10)) == _want(oracle, q)


@pytest.mark.parametrize("q", QUERIES)
def test_segmented_matches_oracle(segmented, oracle, q):
    assert _rows(segmented.search(q, 10)) == _want(oracle, q)


def test_oracle_levenshtein_basics():
    assert _levenshtein("merge", "merge") == 0
    assert _levenshtein("merge", "merg") == 1
    assert _levenshtein("merge", "marge") == 1
    assert _levenshtein("join", "jion") == 2  # plain distance, no
    #                                           transposition discount
    assert _levenshtein("", "ab") == 2


def test_fuzzy_expansion_is_namespace_scoped(blocked):
    """content fuzzy must not expand into url tokens and vice versa:
    'gitlab' exists only as a url token (doc 3's url), 'quick' only as
    a content token (doc 6)."""
    assert _rows(blocked.search("gitlab~0", 10)) == []
    assert _rows(blocked.search("url:gitlab~0", 10)) == [(1, 3, 1.0)]
    assert _rows(blocked.search("url:quick~0", 10)) == []
    assert _rows(blocked.search("quick~0", 10)) == [(1, 6, 1.0)]


def test_phrase_prefix_on_f64_index(spark, corpus, tmp_path):
    """Constant score needs no dl — phrase-prefix serves on f64-mode
    positional indexes (content-only; url+pos+f64 is rejected at
    build)."""
    bi = BlockedIndex(str(tmp_path / "f64idx"))
    bi.build(corpus.select("doc_id", "text"), fingerprint="f64pp",
             n_buckets=4, with_positions=True, score_mode="f64")
    eng = BlockedSearchEngine(spark, bi)
    assert _rows(eng.search('"the data"*', 10)) == [(1, 1, 1.0)]


def test_positive_terms_includes_phrase_prefix_fixed_members():
    from bids_spark.plans.parser import positive_terms

    assert positive_terms(parse_query('"merge jo"* data')) == [
        "merge", "data"
    ]
    # fuzzy expansion is engine-side — contributes nothing at parse time
    assert positive_terms(parse_query("merg~1 data")) == ["data"]


def test_fuzzy_memo_hot_engine(blocked):
    """cache=True engines memoize (term, dist) neighborhoods — the
    second evaluation reads the memo, no dictionary scan."""
    from bids_spark.plans.parser import Fuzzy

    assert blocked._fuzzy_memo is not None
    blocked._fuzzy_memo.clear()
    first = blocked._expand_fuzzy(Fuzzy("merge", 1))
    assert ("merge", 1) in blocked._fuzzy_memo
    # poison the vocabulary seam: a memo hit must not touch it
    orig = blocked._vocabulary
    blocked._vocabulary = lambda: (_ for _ in ()).throw(
        AssertionError("memo miss — vocabulary scanned twice")
    )
    try:
        assert blocked._expand_fuzzy(Fuzzy("merge", 1)) == first
    finally:
        blocked._vocabulary = orig
