"""Blocked (SPIMI, compressed) index: build correctness, resumability,
and rank-identity of the block-max pruned query path vs the naive
SearchEngine — the two-physical-plans/one-semantics contract."""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from bids_spark.operators.blocked_index import BlockedIndex, spimi_partial_postings
from bids_spark.operators.index_build import postings
from bids_spark.operators.wand import BlockedSearchEngine, decode_blocks
from bids_spark.plans.planner import SearchEngine

QUERIES = [
    "data",
    "merge join",
    "merge AND join",
    "merge -join",
    "the",                 # head term
    "data merge join sort window",  # many-term OR
    "zzzmissing",          # no-hit (single token)
    "data data",           # duplicate clause → term scored twice
    "data AND data",       # duplicate must clause
    "merge +merge join",   # same term as must and should
]


def test_phrase_raises_on_blocked(spark, index):
    # index built WITHOUT positions → phrase must fail loudly, not wrong
    eng = BlockedSearchEngine(spark, index)
    with pytest.raises(NotImplementedError):
        eng.search('"merge join"', 10)


@pytest.fixture(scope="module")
def pos_index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("blocked_idx_pos"))
    bi = BlockedIndex(path)
    bi.build(docs, fingerprint="sf0.001-v1", n_partitions=8, with_positions=True)
    assert bi.has_positions
    return bi


@pytest.mark.parametrize(
    "q",
    [
        '"merge join"',                    # pure phrase
        '"merge join" data',              # phrase OR term
        '"merge join" AND data',          # phrase in a must
        '-"merge join" data',             # phrase as must_not
        "(merge OR join) AND data",       # nested boolean, no phrase
    ],
)
def test_positions_index_matches_naive(spark, pos_index, naive, q):
    eng = BlockedSearchEngine(spark, pos_index)
    got = [(r["rank"], r["doc_id"], r["score"]) for r in eng.search(q, 10).collect()]
    want = [(r["rank"], r["doc_id"], r["score"]) for r in naive.search(q, 10).collect()]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], q
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9), (q, gs, ws)


def test_term_scan_pruning_in_plan(spark, index):
    """D2: a term lookup must prune at the directory level (bucket
    PartitionFilters) AND push the term predicate to the parquet scan
    (PushedFilters) — asserted on the physical plan, not assumed."""
    eng = BlockedSearchEngine(spark, index)
    plan = (
        eng._term_blocks(["data"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    # bucket filter must actually reach the partition pruning slot
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "bucket" in pf, pf
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "term" in pushed and ("In(" in pushed or "EqualTo(" in pushed), pushed


def test_term_dictionary_invariants(spark, index, docs):
    # df in the dictionary == docs containing the term (postings count)
    td = index.terms(spark)
    want = postings(docs).groupBy("term").agg(F.count("*").alias("df"))
    joined = td.select("term", "df").join(
        want.withColumnRenamed("df", "want_df"), "term", "full"
    )
    assert joined.filter(
        F.col("df").isNull() | F.col("want_df").isNull()
        | (F.col("df") != F.col("want_df"))
    ).count() == 0
    # gmax == max block_max_score over that term's blocks
    gm = index.blocks(spark).groupBy("term").agg(
        F.max("block_max_score").alias("want_g")
    )
    j2 = td.select("term", "gmax").join(gm, "term")
    assert j2.filter(F.abs(F.col("gmax") - F.col("want_g")) > 1e-12).count() == 0


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("blocked_idx"))
    bi = BlockedIndex(path)
    bi.build(docs, fingerprint="sf0.001-v1", n_partitions=8)
    return bi


@pytest.fixture(scope="module")
def naive(docs):
    return SearchEngine.from_documents(docs)


def test_spimi_equals_naive_postings(spark, docs):
    a = spimi_partial_postings(docs).orderBy("term", "doc_id").collect()
    b = postings(docs).orderBy("term", "doc_id").collect()
    assert [(r["term"], r["doc_id"], r["tf"]) for r in a] == [
        (r["term"], r["doc_id"], r["tf"]) for r in b
    ]


def test_blocks_roundtrip_postings(spark, docs, index):
    dec = (
        decode_blocks(index.blocks(spark), index.avgdl)
        .groupBy()
        .agg(F.count("*").alias("n"), F.countDistinct("term").alias("nt"))
        .first()
    )
    want = postings(docs).agg(
        F.count("*").alias("n"), F.countDistinct("term").alias("nt")
    ).first()
    assert (dec["n"], dec["nt"]) == (want["n"], want["nt"])


def test_block_invariants(spark, index):
    bad = index.blocks(spark).filter(
        (F.col("first_doc") > F.col("max_doc")) | (F.col("n") <= 0)
    )
    assert bad.count() == 0


@pytest.mark.parametrize("q", QUERIES)
def test_rank_identical_to_naive(spark, index, naive, q):
    eng = BlockedSearchEngine(spark, index)
    got = [(r["rank"], r["doc_id"], r["score"]) for r in eng.search(q, 10).collect()]
    want = [(r["rank"], r["doc_id"], r["score"]) for r in naive.search(q, 10).collect()]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], q
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9), (q, gs, ws)


@pytest.mark.parametrize("q", ["data", "merge join", "the"])
def test_pruned_equals_unpruned(spark, index, q):
    eng = BlockedSearchEngine(spark, index)
    a = [(r["rank"], r["doc_id"]) for r in eng.search(q, 10, prune=True).collect()]
    b = [(r["rank"], r["doc_id"]) for r in eng.search(q, 10, prune=False).collect()]
    assert a == b


@pytest.mark.parametrize("q", ["data", "merge join"])
def test_probe_theta_mode_identical(spark, index, q):
    eng = BlockedSearchEngine(spark, index)
    a = [(r["rank"], r["doc_id"]) for r in
         eng.search(q, 10, theta_mode="dict").collect()]
    b = [(r["rank"], r["doc_id"]) for r in
         eng.search(q, 10, theta_mode="probe").collect()]
    assert a == b


def test_large_k_probe_fallback(spark, index, naive):
    # k > 100 → dictionary θ unavailable → probe fallback; still exact
    eng = BlockedSearchEngine(spark, index)
    got = [(r["rank"], r["doc_id"]) for r in eng.search("the", 150).collect()]
    want = [(r["rank"], r["doc_id"]) for r in naive.search("the", 150).collect()]
    assert got == want


def test_resume_skips_done_stages(spark, docs, tmp_path):
    path = str(tmp_path / "idx")
    bi = BlockedIndex(path)
    bi.build(docs, fingerprint="fp1", n_partitions=4)
    man1 = bi._manifest()
    # simulate a crash after 'postings': wipe later stages from manifest
    man1["stages"].pop("blocks")
    with open(bi.manifest_path, "w") as f:
        json.dump(man1, f)
    t_postings_before = os.path.getmtime(os.path.join(path, "postings", "_SUCCESS"))
    man2 = bi.build(docs, fingerprint="fp1", n_partitions=4)
    # postings not rebuilt, blocks rebuilt
    assert os.path.getmtime(os.path.join(path, "postings", "_SUCCESS")) == t_postings_before
    assert man2["stages"]["blocks"]["status"] == "done"
    # changed fingerprint → full rebuild
    man3 = bi.build(docs, fingerprint="fp2", n_partitions=4)
    assert os.path.getmtime(os.path.join(path, "postings", "_SUCCESS")) > t_postings_before
    assert man3["stages"]["postings"]["fingerprint"] == "fp2+pf2"


def test_manifest_metrics(index):
    man = index._manifest()
    b = man["stages"]["blocks"]
    assert b["postings"] > 0 and b["compressed_bytes"] > 0
    assert b["postings_per_sec"] > 0
    assert 0 < b["bytes_per_posting"] < 20


def test_and_path_broadcast_guard(spark, index, naive):
    """When the rarest must term's n_blocks exceeds the broadcast
    budget, the range-restriction broadcast must be skipped (at 10^12
    docs an all-head-term AND would broadcast ~df/128 rows → OOM) —
    and results must stay rank-identical (the matched-count filter is
    exact on its own)."""
    q = "merge AND join"
    eng = BlockedSearchEngine(spark, index)
    want = [(r["rank"], r["doc_id"]) for r in eng.search(q, 10).collect()]

    guarded = BlockedSearchEngine(spark, index)
    guarded.RANGE_BROADCAST_BUDGET = 0  # every term is "too big"
    res = guarded.search(q, 10)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    got = [(r["rank"], r["doc_id"]) for r in res.collect()]
    assert got == want
    ref = [(r["rank"], r["doc_id"]) for r in naive.search(q, 10).collect()]
    assert got == ref


def test_pruning_stats_invariants(spark, index):
    """pruning_stats must report consistent counters: survivors are a
    subset of candidates, probe-θ is at least dict-θ (tighter or
    equal), and a 0-θ query reports zero pruning."""
    eng = BlockedSearchEngine(spark, index)
    d = eng.pruning_stats("merge join", 10, theta_mode="dict")
    p = eng.pruning_stats("merge join", 10, theta_mode="probe")
    for s in (d, p):
        assert 0 <= s["blocks_survive"] <= s["blocks_total"]
        assert 0 <= s["postings_survive"] <= s["postings_total"]
        assert s["blocks_total"] > 0
    assert p["theta"] >= d["theta"] >= 0.0
    assert p["postings_survive"] <= d["postings_survive"]
    miss = eng.pruning_stats("zzzmissing", 10)
    assert miss["blocks_total"] == 0 and miss["blocks_survive"] == 0


def test_term_meta_memo_hot_serving(spark, index, naive):
    # cache=True memoizes term-dictionary rows driver-side: the second
    # lookup must be served without touching Spark, absent terms must be
    # negative-cached, and results must be identical to the cold path.
    hot = BlockedSearchEngine(spark, index, cache=True)
    cold = BlockedSearchEngine(spark, index)
    terms = ["merge", "join", "zzzmissing"]
    first = hot._term_meta(terms)
    assert first == cold._term_meta(terms)
    assert hot._meta_memo["zzzmissing"] is None  # negative cache
    # poison the DataFrame path: a second call must not re-scan
    hot.tdict = None
    assert hot._term_meta(terms) == first
    assert hot._term_meta(["merge"]) == cold._term_meta(["merge"])
    # end-to-end: repeated hot query still rank-identical to naive
    got = [(r["rank"], r["doc_id"]) for r in hot.search("merge join", 10).collect()]
    hot.search("merge join", 10).collect()
    want = [(r["rank"], r["doc_id"]) for r in naive.search("merge join", 10).collect()]
    assert got == want


def test_probe_theta_sees_multi_term_docs(spark, tmp_path):
    # Every doc holds BOTH terms, so the true k-th best total is the
    # SUM of two per-term scores.  The range-aligned probe must find
    # it: θ_probe > any single term's global max score (the value the
    # old per-term-independent probe collapsed to when the terms' top
    # blocks covered disjoint doc ranges).
    rows = [
        (i, "alpha beta " * (1 + i % 5) + f"filler{i} " * (i % 7))
        for i in range(600)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bi = BlockedIndex(str(tmp_path / "probe_idx"))
    bi.build(docs, fingerprint="probe-theta", n_partitions=8)
    eng = BlockedSearchEngine(spark, bi)
    stats = eng.pruning_stats("alpha beta", 10, theta_mode="probe")
    meta = eng._term_meta(["alpha", "beta"])
    max_single = max(float(m["gmax"]) for m in meta.values())
    assert stats["theta"] > max_single
    # probe mode stays rank-identical to dict mode (exactness)
    a = [(r["rank"], r["doc_id"]) for r in
         eng.search("alpha beta", 10, theta_mode="dict").collect()]
    b = [(r["rank"], r["doc_id"]) for r in
         eng.search("alpha beta", 10, theta_mode="probe").collect()]
    assert a == b


def test_and_path_product_budget_guard(spark, index, naive):
    """The range restriction is a broadcast nested-loop join costing
    |ranges| x |blocks| predicate evaluations; when that PRODUCT
    exceeds its budget the restriction must be skipped even though the
    broadcast side alone fits — results stay rank-identical."""
    q = "merge AND join"
    eng = BlockedSearchEngine(spark, index)
    want = [(r["rank"], r["doc_id"]) for r in eng.search(q, 10).collect()]

    guarded = BlockedSearchEngine(spark, index)
    guarded.RANGE_JOIN_PRODUCT_BUDGET = 0  # any product is "too big"
    res = guarded.search(q, 10)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    got = [(r["rank"], r["doc_id"]) for r in res.collect()]
    assert got == want
    ref = [(r["rank"], r["doc_id"]) for r in naive.search(q, 10).collect()]
    assert got == ref
