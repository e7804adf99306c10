"""Second indexed text field (`url`) — rank/score identity across
every engine and query shape.

The reference indexes file_path alongside content (bids/index.py:49-52;
on-disk proof at playground/bids_index/meta.json:25-44 — positions,
fieldnorms, default tokenizer), and tantivy's parse_query default-field
list does not block explicit field-scoped atoms, so `file_path:foo` is
a reachable query surface today.  This engine maps it to `url:` over
URL_NS-namespaced terms (functions/fields.py) with per-field BM25
length normalization.  The brute-force OracleIndex (bids_spark/
oracle.py) carries the committed semantics.
"""

from __future__ import annotations

import os

import pytest

from bids_spark.functions.fields import URL_NS, url_term
from bids_spark.oracle import OracleIndex
from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.plans.parser import (
    Phrase,
    Term,
    TermRange,
    TermSet,
    parse_query,
    positive_terms,
)
from bids_spark.plans.planner import SearchEngine

DOCS = {
    1: "merge the data tables now",
    2: "join tables with merge",
    3: "github merge tool for data",
    4: "alpha beta gamma delta",
    5: "data github pages and the web",
    6: "the quick brown fox jumps",
    7: "merge merge merge again",
    8: "tables of data on the web",
    9: "",  # empty content, url-only doc
    10: "zeta eta theta",
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
    10: "",  # empty url
}

QUERIES = [
    "url:github",
    "url:merge",                      # same token exists in BOTH fields
    "merge url:merge",                # cross-field same token, one query
    "merge url:github",
    "url:com url:example",
    'url:"github com"',
    'url:"example com"~2',
    "url:github^2.5 data",
    "merge AND url:com",
    "url:com AND url:github",
    "-url:github merge data",
    "+url:example -merge data",
    "url: IN [gitlab example]",
    "url:[gita TO gitz]",
    "url:[* TO *]",
    "content:[* TO z] url:ftp",
    '"merge tool" url:tools',
    "(url:github OR url:gitlab) AND merge",
    "url:pages^0.5 content:data",
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
    bi = BlockedIndex(str(tmp_path_factory.mktemp("urlidx") / "idx"))
    bi.build(
        corpus, fingerprint="urlf", n_buckets=4,
        with_positions=True, score_mode="dl", url_field=True,
    )
    return BlockedSearchEngine(spark, bi, cache=True)


def _rows(df):
    return [
        (r["rank"], r["doc_id"], round(r["score"], 9)) for r in df.collect()
    ]


def _want(oracle, q, k=10):
    return [(r, d, round(s, 9)) for r, d, s in oracle.search(q, k)]


# ---------------------------------------------------------------------------
# parser surface
# ---------------------------------------------------------------------------


def test_parser_scopes_url_atoms():
    ast = parse_query('url:github merge url:"a b" url:[a TO c] url: IN [x]')
    t, m, p, tr, ts = ast.should
    assert isinstance(t, Term) and t.term == url_term("github")
    assert isinstance(m, Term) and m.term == "merge"
    assert isinstance(p, Phrase) and p.terms == (url_term("a"), url_term("b"))
    assert isinstance(tr, TermRange)
    assert tr.lo == url_term("a") and tr.hi == url_term("c")
    assert isinstance(ts, TermSet) and ts.terms == (url_term("x"),)


def test_parser_open_bounds_stay_in_namespace():
    tr = parse_query("url:[* TO *]").should[0]
    assert tr.lo == URL_NS and tr.hi == "\x01u\x02" and not tr.hi_incl
    cr = parse_query("content:[* TO b]").should[0]
    # content open-start floors ABOVE the url namespace
    assert cr.lo == "\x02" and URL_NS < cr.lo < "0"


def test_parser_unknown_field_still_rejected():
    with pytest.raises(ValueError, match="unknown field"):
        parse_query("title:x")


def test_positive_terms_excludes_url_namespace():
    assert positive_terms(parse_query("merge url:github data")) == [
        "merge", "data",
    ]


# ---------------------------------------------------------------------------
# naive + blocked engines vs the oracle (the full shape matrix)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("q", QUERIES)
def test_naive_matches_oracle(naive, oracle, q):
    assert _rows(naive.search(q, 10)) == _want(oracle, q)


@pytest.mark.parametrize("q", QUERIES)
def test_blocked_matches_oracle(blocked, oracle, q):
    assert _rows(blocked.search(q, 10)) == _want(oracle, q)


def test_blocked_prune_off_identical(blocked, oracle):
    for q in ("url:github", "merge url:merge", "url:com url:example"):
        assert _rows(blocked.search(q, 10, prune=False)) == _want(oracle, q)


def test_search_many_batch(blocked, oracle):
    got = blocked.search_many({f"q{i}": q for i, q in enumerate(QUERIES)}, 10)
    per = {}
    for r in got.collect():
        per.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )
    for i, q in enumerate(QUERIES):
        want = _want(oracle, q)
        assert per.get(f"q{i}", []) == want, q


def test_content_results_unchanged_by_url_field(spark, corpus, tmp_path):
    """Adding the url field must not move any content-only query: the
    content postings/doclens/stats are untouched by construction."""
    bi0 = BlockedIndex(str(tmp_path / "plain"))
    bi0.build(corpus, fingerprint="plain", n_buckets=4,
              with_positions=True, score_mode="dl")
    e0 = BlockedSearchEngine(spark, bi0)
    bi1 = BlockedIndex(str(tmp_path / "withurl"))
    bi1.build(corpus, fingerprint="wurl", n_buckets=4,
              with_positions=True, score_mode="dl", url_field=True)
    e1 = BlockedSearchEngine(spark, bi1)
    for q in ("merge data", "merge AND tables", '"merge tool"',
              "content:[data TO merge]", "-github data"):
        assert _rows(e0.search(q, 10)) == _rows(e1.search(q, 10)), q


def test_url_query_on_plain_index_matches_nothing(spark, corpus, tmp_path):
    bi0 = BlockedIndex(str(tmp_path / "plain2"))
    bi0.build(corpus, fingerprint="plain2", n_buckets=4,
              with_positions=True, score_mode="dl")
    e0 = BlockedSearchEngine(spark, bi0)
    assert e0.search("url:github", 10).count() == 0
    assert e0.search('url:"github com"', 10).count() == 0


def test_url_terms_round_trip_dictionary(blocked):
    """ns terms live in the same dictionary with their own df/idf."""
    meta = blocked._term_meta([url_term("github"), "merge"])
    assert set(meta) == {url_term("github"), "merge"}
    # df of url:github = docs 1, 4, 7 = 3
    assert int(meta[url_term("github")]["df"]) == 3


# ---------------------------------------------------------------------------
# segmented engine (append + deletes + compact)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def segmented(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("urlseg") / "root")
    si = SegmentedIndex(root)
    a = corpus.filter("doc_id <= 5")
    b = corpus.filter("doc_id > 5")
    si.add_segment(a, fingerprint="segA", n_buckets=4, url_field=True)
    si.add_segment(b, fingerprint="segB", n_buckets=4, url_field=True)
    return si


@pytest.mark.parametrize("q", QUERIES)
def test_segmented_matches_oracle(spark, segmented, oracle, q):
    eng = segmented.engine(spark)
    got = _rows(eng.search(q, 10))
    want = _want(oracle, q)
    # segment-weighted avgdl differs from the direct average by float
    # rounding only — compare at 9 dp like the rest of the suite
    assert got == want, q


def test_segmented_deletes_and_compact(spark, segmented, oracle):
    si = segmented
    si.delete_docs(spark, [3, 4])
    eng = si.engine(spark)
    got = [d for _, d, _ in _rows(eng.search("url:github merge", 10))]
    assert 3 not in got and 4 not in got
    merged = si.compact(spark, n_buckets=4)
    assert merged.url_field and merged.avgdl_url is not None
    live_docs = {d: t for d, t in DOCS.items() if d not in (3, 4)}
    live_urls = {d: u for d, u in URLS.items() if d not in (3, 4)}
    o2 = OracleIndex(live_docs, live_urls)
    eng2 = si.engine(spark)
    for q in ("url:github merge", 'url:"github com"', "url: IN [example]"):
        assert _rows(eng2.search(q, 10)) == _want(o2, q), q


def test_mixed_url_flag_segments_rejected(spark, corpus, tmp_path):
    root = str(tmp_path / "mixed")
    si = SegmentedIndex(root)
    si.add_segment(corpus.filter("doc_id <= 5"), fingerprint="m1",
                   n_buckets=4, url_field=True)
    si.add_segment(corpus.filter("doc_id > 5"), fingerprint="m2",
                   n_buckets=4, url_field=False)
    with pytest.raises(ValueError, match="url_field"):
        si.engine(spark)


# ---------------------------------------------------------------------------
# CLI surface: url/file_path field indexed by default (--no-url-field opts out)
# ---------------------------------------------------------------------------


def _cli(env, *args):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.run(
        [sys.executable, "-m", "bids_spark.cli", *args],
        capture_output=True, text=True, env=env, cwd=repo,
    )


@pytest.mark.slow
def test_cli_url_field_e2e(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               BIDS_DATASET=str(tmp_path / "ds"),
               BIDS_SPARK_CLI_CORES="4",
               PYTHONPATH=repo)
    assert _cli(env, "--initialise").returncode == 0
    r = _cli(env, "--index-parquet",
             "/root/testdata/sf0.001/documents.parquet")
    assert r.returncode == 0, r.stderr
    # the parquet's `source` column folds into file_path and is indexed
    # as the second text field — both field spellings resolve
    r = _cli(env, "--search", "url:src3", "--results", "2")
    assert r.returncode == 0 and "src3" in r.stdout, r.stdout + r.stderr
    r2 = _cli(env, "--search", "file_path:src3", "--results", "2")
    assert r2.returncode == 0 and r2.stdout.splitlines()[:2] == \
        r.stdout.splitlines()[:2]
    # unknown field still errors loudly (exit 1, parse error surface)
    r3 = _cli(env, "--search", "title:x")
    assert r3.returncode not in (0, 2)


@pytest.mark.slow
def test_cli_no_url_field_opt_out(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               BIDS_DATASET=str(tmp_path / "ds2"),
               BIDS_SPARK_CLI_CORES="4",
               PYTHONPATH=repo)
    assert _cli(env, "--initialise").returncode == 0
    r = _cli(env, "--no-url-field", "--index-parquet",
             "/root/testdata/sf0.001/documents.parquet")
    assert r.returncode == 0, r.stderr
    # no ns postings → url query matches nothing (reference exit 2)
    r = _cli(env, "--search", "url:src3")
    assert r.returncode == 2, r.stdout + r.stderr
    # content search unaffected
    r = _cli(env, "--search", "merge join", "--results", "2")
    assert r.returncode == 0


# ---------------------------------------------------------------------------
# streaming micro-batches with the url field
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_streaming_segments_with_url_field(spark, tmp_path):
    import pandas as pd

    from bids_spark.streaming.incremental import (
        DOC_SCHEMA_URL,
        SegmentedStreamIndexer,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    rows1 = [(d, DOCS[d], URLS[d]) for d in (1, 2, 3, 4, 5)]
    rows2 = [(d, DOCS[d], URLS[d]) for d in (6, 7, 8, 9, 10)]
    cols = ["doc_id", "text", "url"]
    spark.createDataFrame(pd.DataFrame(rows1, columns=cols)).coalesce(
        1
    ).write.parquet(os.path.join(landing, "b1"))

    sx = SegmentedStreamIndexer(
        str(tmp_path / "segidx"), n_partitions=2, url_field=True
    )
    sx.start(
        spark, os.path.join(landing, "*"), schema=DOC_SCHEMA_URL
    ).awaitTermination(120)
    spark.createDataFrame(pd.DataFrame(rows2, columns=cols)).coalesce(
        1
    ).write.parquet(os.path.join(landing, "b2"))
    sx.start(
        spark, os.path.join(landing, "*"), schema=DOC_SCHEMA_URL
    ).awaitTermination(120)
    assert len(sx.seg_index.segment_paths()) >= 2

    oi = OracleIndex(DOCS, URLS)
    eng = sx.engine(spark)
    for q in ("url:github merge", 'url:"github com"', "merge AND url:com",
              "url: IN [gitlab example]"):
        assert _rows(eng.search(q, 10)) == _want(oi, q), q


# ---------------------------------------------------------------------------
# multi-default-field parsing (the reference playground's
# parse_query(q, ["title","content"]) shape — playground/junk/find.py:19)
# ---------------------------------------------------------------------------

BOTH = ("content", "url")
MULTI_QUERIES = [
    "github",               # matches content (docs 3,5) AND urls (1,4,7)
    "merge data",
    "github AND merge",
    "data -github",
    '"github com"',         # phrase exists only in the url stream
    "IN [gitlab alpha]",
    "github^2 tables",
    "pages",                # url-only token in some docs, content in others
]


def test_parser_multi_default_fields():
    from bids_spark.plans.parser import Bool as B

    # a single unqualified atom's expansion becomes the TOP-LEVEL OR
    # (the normalizer unwraps one Bool level) — a flat two-term union,
    # which even keeps the pruned fast path
    q = parse_query("github", BOTH)
    assert [t.term for t in q.should] == ["github", url_term("github")]
    # multiple atoms: each expansion stays a nested should-union
    q2 = parse_query("github data", BOTH)
    assert len(q2.should) == 2 and all(
        isinstance(n, B) and len(n.should) == 2 for n in q2.should
    )
    # single default unchanged — byte-identical AST
    assert parse_query("github").should[0] == Term("github")
    with pytest.raises(ValueError, match="unknown default field"):
        parse_query("x", ("title",))


@pytest.mark.parametrize("q", MULTI_QUERIES)
def test_multi_default_matches_oracle(naive, blocked, oracle, q):
    want = [
        (r, d, round(s, 9))
        for r, d, s in oracle.search(q, 10, default_fields=BOTH)
    ]
    got_n = _rows(naive.search(q, 10, default_fields=BOTH))
    assert got_n == want, ("naive", q)
    got_b = _rows(blocked.search(q, 10, default_fields=BOTH))
    assert got_b == want, ("blocked", q)


def test_multi_default_segmented_and_batch(
    spark, corpus, blocked, oracle, tmp_path
):
    # own fresh segment root (the shared `segmented` fixture is
    # mutated by the delete/compact test, which may or may not have
    # run depending on selection)
    si = SegmentedIndex(str(tmp_path / "mseg"))
    si.add_segment(corpus.filter("doc_id <= 5"), fingerprint="md1",
                   n_buckets=4, url_field=True)
    si.add_segment(corpus.filter("doc_id > 5"), fingerprint="md2",
                   n_buckets=4, url_field=True)
    eng = si.engine(spark)
    qs = ["github", "merge data", '"github com"']
    for q in qs:
        want = [
            (r, d, round(s, 9))
            for r, d, s in oracle.search(q, 10, default_fields=BOTH)
        ]
        assert _rows(eng.search(q, 10, default_fields=BOTH)) == want, q
    # batched serving honours the field list too
    got = blocked.search_many(
        {f"m{i}": q for i, q in enumerate(qs)}, 10, default_fields=BOTH
    )
    per = {}
    for r in got.collect():
        per.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )
    for i, q in enumerate(qs):
        want = [
            (r, d, round(s, 9))
            for r, d, s in oracle.search(q, 10, default_fields=BOTH)
        ]
        assert per.get(f"m{i}", []) == want, q
