"""Property tests on randomized corpora/queries (SURVEY.md §7.3 #1):
the Spark engine (naive AND blocked/pruned paths) must match the
committed oracle rank-identically for arbitrary inputs, including
pathological shapes (empty docs, dup texts, >40-char tokens, head
terms in every doc)."""

from __future__ import annotations

import math
import random

import pytest

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.oracle import OracleIndex
from bids_spark.plans.planner import SearchEngine

VOCAB = ["alpha", "beta", "gamma", "delta", "head", "rare1", "rare2",
         "x" * 41, "MiXeD", "punct.sep"]


def make_corpus(seed: int, n_docs: int = 60):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        if rng.random() < 0.05:
            rows.append((i, ""))
            continue
        words = ["head"] if rng.random() < 0.8 else []  # head term skew
        words += rng.choices(VOCAB, k=rng.randint(1, 30))
        rows.append((i, " ".join(words)))
    # planted exact duplicate
    rows.append((n_docs, rows[0][1]))
    return rows


def make_queries(seed: int):
    rng = random.Random(seed + 1)
    qs = ["head", "alpha beta", "alpha AND beta", "head -alpha",
          '"alpha beta"', "gamma delta rare1"]
    for _ in range(2):
        terms = rng.sample(VOCAB[:7], rng.randint(1, 3))
        qs.append(" ".join(terms))
    return qs


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_engine_matches_oracle_random(spark, seed, tmp_path):
    rows = make_corpus(seed)
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    eng = SearchEngine.from_documents(docs, cache=False)
    oracle = OracleIndex(dict(rows))

    bi = BlockedIndex(str(tmp_path / f"idx{seed}"))
    bi.build(docs, fingerprint=f"prop{seed}", n_partitions=4, with_positions=True)
    beng = BlockedSearchEngine(spark, bi)

    si = SegmentedIndex(str(tmp_path / f"seg{seed}"))
    si.add_segment(docs.filter(docs.doc_id % 3 == 0), fingerprint=f"s0-{seed}",
                   n_partitions=2)
    si.add_segment(docs.filter(docs.doc_id % 3 != 0), fingerprint=f"s1-{seed}",
                   n_partitions=2)
    seng = si.engine(spark)

    for q in make_queries(seed):
        want = oracle.search(q, 10)
        got = [(r["rank"], r["doc_id"], r["score"])
               for r in eng.search(q, 10).collect()]
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], (seed, q)
        for (_, _, gs), (_, _, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-6), (seed, q)
        # blocked path: ALL query shapes (positions-built index)
        bgot = [(r["rank"], r["doc_id"], r["score"])
                for r in beng.search(q, 10).collect()]
        assert [(r, d) for r, d, _ in bgot] == [(r, d) for r, d, _ in want], (
            seed, q, "blocked")
        for (_, _, gs), (_, _, ws) in zip(bgot, want):
            assert math.isclose(gs, ws, rel_tol=1e-6), (seed, q, "blocked")
        # segmented (2 independently-built segments, global scoring)
        sgot = [(r["rank"], r["doc_id"], r["score"])
                for r in seng.search(q, 10).collect()]
        assert [(r, d) for r, d, _ in sgot] == [(r, d) for r, d, _ in want], (
            seed, q, "segmented")
        for (_, _, gs), (_, _, ws) in zip(sgot, want):
            assert math.isclose(gs, ws, rel_tol=1e-6), (seed, q, "segmented")


# ---------------------------------------------------------------------------
# url field fuzz: random url strings + mixed-field random queries
# ---------------------------------------------------------------------------

URL_HOSTS = ["github.com", "example.org", "gitlab.io", "news.site.com", ""]
URL_PATHS = ["alpha/beta", "data", "x" * 50, "a.b.c", "punct..sep//x", ""]


def make_urls(seed: int, n_docs: int):
    rng = random.Random(seed + 7)
    urls = {}
    for i in range(n_docs + 1):
        r = rng.random()
        if r < 0.1:
            urls[i] = ""  # empty url
        elif r < 0.2:
            urls[i] = URL_PATHS[2]  # bare long token (dropped by len cap)
        else:
            urls[i] = (
                f"https://{rng.choice(URL_HOSTS)}/{rng.choice(URL_PATHS)}"
            )
    return urls


def make_url_queries(seed: int):
    rng = random.Random(seed + 9)
    qs = [
        "url:github head",
        "url:com AND head",
        'url:"example org"',
        "head -url:gitlab",
        "url: IN [data github]",
        "url:[e TO h] alpha",
        "url:alpha",          # token present in BOTH fields
        "alpha url:alpha",    # cross-field same token
    ]
    for _ in range(2):
        u = rng.choice(["github", "com", "data", "alpha", "example"])
        t = rng.choice(VOCAB[:5])
        qs.append(rng.choice([f"url:{u} {t}", f"{t} AND url:{u}",
                              f"url:{u}^2 {t}"]))
    return qs


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_url_field_matches_oracle_random(spark, seed, tmp_path):
    rows = make_corpus(seed)
    urls = make_urls(seed, len(rows) - 1)
    docs = spark.createDataFrame(
        [(d, t, urls[d]) for d, t in rows], ["doc_id", "text", "url"]
    )
    oracle = OracleIndex(dict(rows), urls)
    eng = SearchEngine.from_documents(docs, url_field=True, cache=False)

    bi = BlockedIndex(str(tmp_path / f"uidx{seed}"))
    bi.build(docs, fingerprint=f"uprop{seed}", n_partitions=4,
             with_positions=True, url_field=True)
    beng = BlockedSearchEngine(spark, bi)

    si = SegmentedIndex(str(tmp_path / f"useg{seed}"))
    si.add_segment(docs.filter(docs.doc_id % 2 == 0),
                   fingerprint=f"u0-{seed}", n_partitions=2, url_field=True)
    si.add_segment(docs.filter(docs.doc_id % 2 != 0),
                   fingerprint=f"u1-{seed}", n_partitions=2, url_field=True)
    seng = si.engine(spark)

    for q in make_url_queries(seed):
        want = oracle.search(q, 10)
        for name, e in (("naive", eng), ("blocked", beng), ("seg", seng)):
            got = [(r["rank"], r["doc_id"], r["score"])
                   for r in e.search(q, 10).collect()]
            assert [(r, d) for r, d, _ in got] == \
                [(r, d) for r, d, _ in want], (seed, q, name)
            for (_, _, gs), (_, _, ws) in zip(got, want):
                assert math.isclose(gs, ws, rel_tol=1e-6), (seed, q, name)
