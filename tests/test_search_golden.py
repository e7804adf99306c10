"""Golden ranking tests: the Spark engine must be rank-identical and
score-equal (rel 1e-6) to the committed brute-force BM25 oracle
(bids_spark/oracle.py) on the reference query set (FIXTURES.md §5,
mapped onto the sf0.001 documents vocabulary)."""

from __future__ import annotations

import math

import pytest

from bids_spark.oracle import OracleIndex
from bids_spark.plans.planner import SearchEngine

QUERIES = [
    "data",                       # single term (≈ `strcpy`)
    "merge join",                 # default-OR multi-term
    "merge AND join",             # boolean AND  (≈ `libc AND libpng`)
    "merge -join",                # must-not
    '"merge join"',               # phrase
    "data AND (merge OR join) -window",  # nested boolean
    "zzz_not_available",          # no-hit → empty (CLI exit 2 path)
    "the",                        # head term (skew)
]


@pytest.fixture(scope="module")
def engine(docs):
    return SearchEngine.from_documents(docs)


@pytest.fixture(scope="module")
def oracle(docs_pdf):
    return OracleIndex(dict(zip(docs_pdf.doc_id, docs_pdf.text)))


@pytest.mark.parametrize("q", QUERIES)
@pytest.mark.parametrize("k", [1, 10])
def test_rank_identical(engine, oracle, q, k):
    got = [(r["rank"], r["doc_id"], r["score"]) for r in engine.search(q, k).collect()]
    want = oracle.search(q, k)
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], q
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-6), (q, gs, ws)


def test_no_hit_empty(engine):
    assert engine.search("zzz_not_available", 10).count() == 0


def test_limit_respected(engine):
    assert engine.search("data", 3).count() == 3
