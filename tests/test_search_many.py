"""Batched multi-query serving (wand.py search_many): one Spark
action for N queries, per-qid rank- and score-identical to search().

Serving at cluster scale is throughput-bound by per-query scheduling
round-trips (bench.py p50 floor); tantivy never pays them because its
searcher is in-process (reference bids/index.py:155) — the distributed
engine batches instead.  Exactness: the shared-decode branch prunes a
block only when EVERY batched query's own loose bound would prune it
(thr(t) = min over queries), and the post-aggregation θ filter keeps
every row with score ≥ θ_q (a lower bound on the k-th best total)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.segments import SegmentedIndex
from bids_spark.operators.wand import BlockedSearchEngine

REPLICATE, TOPICS = 4, 2

QUERIES = {
    "single": "data",
    "or2": "merge join",
    "or5": "data merge join sort window",
    "and2": "merge AND join",
    "not1": "merge -join",
    "phrase": '"merge join"',
    "nested": "(merge AND join) OR data",
    "absent": "zzznotaterm",
    "topic": "data t1x",
    "repeat": "data data",
    "empty": "",
}


@pytest.fixture(scope="module")
def drifted(spark, docs):
    """Base docs × 4 replicas with per-band topic tokens — score
    distributions drift across doc ranges, stressing the batched
    per-term min-threshold (thr differs per query) and the θ filter."""
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
    root = str(tmp_path_factory.mktemp("batch") / "idx")
    bi = BlockedIndex(root)
    bi.build(drifted, fingerprint="batch", n_partitions=8,
             with_positions=True)
    return BlockedSearchEngine(spark, bi, cache=True)


def _two_segments(drifted, root: str) -> SegmentedIndex:
    si = SegmentedIndex(root)
    lo = drifted.filter(F.col("doc_id") < 20_000_000)
    hi = drifted.filter(F.col("doc_id") >= 20_000_000)
    si.add_segment(lo, name="seg-lo", n_partitions=4)
    si.add_segment(hi, name="seg-hi", n_partitions=4)
    return si


@pytest.fixture(scope="module")
def seg_idx(drifted, tmp_path_factory):
    """Two-segment index over a doc_id split of the same corpus."""
    return _two_segments(
        drifted, str(tmp_path_factory.mktemp("batch_seg") / "segidx")
    )


def _seq(engine, q, k=10):
    return [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in engine.search(q, k).collect()
    ]


def _batch(engine, queries, k=10, **kw):
    rows = engine.search_many(queries, k, **kw).collect()
    got: dict[str, list] = {}
    for r in rows:
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )
    return {qid: sorted(v) for qid, v in got.items()}


def test_batch_parity_blocked(eng):
    got = _batch(eng, QUERIES, 10)
    for qid, q in QUERIES.items():
        assert got.get(qid, []) == _seq(eng, q, 10), (qid, q)


def test_batch_parity_prune_off(eng):
    got = _batch(eng, QUERIES, 10, prune=False)
    for qid, q in QUERIES.items():
        assert got.get(qid, []) == _seq(eng, q, 10, ), (qid, q)


@pytest.mark.parametrize("k", [3, 25])
def test_batch_parity_other_k(eng, k):
    qs = {n: QUERIES[n] for n in ("single", "or2", "or5", "topic")}
    got = _batch(eng, qs, k)
    for qid, q in qs.items():
        assert got.get(qid, []) == _seq(eng, q, k), (qid, q, k)


def test_batch_parity_segmented(spark, seg_idx):
    e = seg_idx.engine(spark)
    got = _batch(e, QUERIES, 10)
    for qid, q in QUERIES.items():
        assert got.get(qid, []) == _seq(e, q, 10), (qid, q)


def test_batch_parity_segmented_deleted(spark, drifted, tmp_path_factory):
    """Tombstones invalidate the dictionary θ — the shared branch must
    serve with θ=0 (no pruning) and still match search() per query."""
    si = _two_segments(
        drifted, str(tmp_path_factory.mktemp("batch_del") / "segidx")
    )
    doomed = [
        r["doc_id"]
        for r in drifted.select("doc_id").orderBy("doc_id").limit(40).collect()
    ]
    si.delete_docs(spark, doomed)
    e = si.engine(spark)
    assert e._has_deletes()
    got = _batch(e, QUERIES, 10)
    for qid, q in QUERIES.items():
        assert got.get(qid, []) == _seq(e, q, 10), (qid, q)


def test_batch_rejects_bad_qids(eng):
    with pytest.raises(ValueError, match="non-empty strings"):
        eng.search_many({1: "data"}, 10)
    with pytest.raises(ValueError, match="non-empty strings"):
        eng.search_many({"": "data"}, 10)


def test_batch_empty_inputs(eng):
    df = eng.search_many({}, 10)
    assert df.columns == ["qid", "rank", "doc_id", "score"]
    assert df.count() == 0
    df = eng.search_many({"a": "zzznotaterm", "b": ""}, 10)
    assert df.count() == 0


def test_batch_is_one_action_fewer_jobs(eng):
    """The point of batching: N flat-OR queries collect in ONE action,
    far fewer scheduled jobs than N sequential searches (hot engine:
    meta memoized, so the batch decode is the only distributed work)."""
    sc = eng.spark.sparkContext
    qs = {f"q{i}": q for i, q in enumerate(
        ["data", "merge join", "sort window", "data merge join",
         "t0x t1y", "window"])}
    # warm memos so both measurements exclude cold metadata jobs
    for q in qs.values():
        eng.search(q, 10).collect()
    eng.search_many(qs, 10).collect()

    sc.setJobGroup("seq", "sequential")
    for q in qs.values():
        eng.search(q, 10).collect()
    seq_jobs = len(sc.statusTracker().getJobIdsForGroup("seq"))
    sc.setJobGroup("batch", "batched")
    eng.search_many(qs, 10).collect()
    batch_jobs = len(sc.statusTracker().getJobIdsForGroup("batch"))
    sc.setJobGroup(None, None)
    assert batch_jobs < seq_jobs, (batch_jobs, seq_jobs)
    # one ACTION: under AQE each shuffle-materialization wave surfaces
    # as a job, so the bound is the plan's shuffle depth (a structural
    # constant ~6: scan→groupBy→θ-join→window→collect), NOT O(N
    # queries) — measured 6 vs 18 for these six queries
    assert batch_jobs <= 8, batch_jobs


# ---------------------------------------------------------------------------
# shared decode for the flat bool class (_bools_shared)
# ---------------------------------------------------------------------------

BOOL_QUERIES = {
    "and2": "merge AND join",
    "and3": "data AND merge AND join",
    "not1": "merge -join",
    "not2": "data merge -sort",
    "mixed": "+data merge -window",
    "boosted_and": "merge^2 AND join",
    "boosted_not": "data^3 -join",
    "neg_self": "merge -merge",          # Lucene: matches nothing
    "absent_must": "merge AND zzznotaterm",
}


def test_bools_shared_parity(eng):
    got = _batch(eng, BOOL_QUERIES, 10)
    for qid, q in BOOL_QUERIES.items():
        assert got.get(qid, []) == _seq(eng, q, 10), (qid, q)


def test_bools_shared_ab_toggle(eng):
    """BATCH_BOOL_SHARED off = one _topk_bool subplan per query (the
    executable twin): identical results either way."""
    try:
        eng.BATCH_BOOL_SHARED = False
        off = _batch(eng, BOOL_QUERIES, 10)
    finally:
        del eng.BATCH_BOOL_SHARED  # back to the class default (True)
    assert _batch(eng, BOOL_QUERIES, 10) == off


def test_bools_shared_parity_segmented_deleted(spark, drifted,
                                               tmp_path_factory):
    """Tombstoned segmented engine: the shared bool branch rides the
    same _decode seam (anti-joined tombstones) — per-query parity."""
    si = _two_segments(
        drifted, str(tmp_path_factory.mktemp("segbool") / "root")
    )
    si.delete_docs(spark, [d for d in range(0, 400, 7)])
    e = si.engine(spark)
    got = _batch(e, BOOL_QUERIES, 10)
    for qid, q in BOOL_QUERIES.items():
        assert got.get(qid, []) == _seq(e, q, 10), (qid, q)


def test_mixed_batch_job_count(eng):
    """A mixed 9-shape batch (OR + AND + NOT + phrase) stays one
    action: job count bounded by the plan's shuffle depth across the
    FOUR shared branches (OR-class, bool-class, phrase-class), not by
    the number of queries."""
    sc = eng.spark.sparkContext
    qs = {
        "or2": "merge join", "or5": "data merge join sort window",
        "single": "data",
        "and2": "merge AND join", "not1": "merge -join",
        "mixed": "+data merge -window",
        "ph1": '"merge join"', "ph2": '"data merge"',
        "topic": "data t1x",
    }
    for q in qs.values():
        eng.search(q, 10).collect()      # warm memos
    eng.search_many(qs, 10).collect()
    sc.setJobGroup("mixedbatch", "mixed batched")
    eng.search_many(qs, 10).collect()
    n = len(sc.statusTracker().getJobIdsForGroup("mixedbatch"))
    sc.setJobGroup(None, None)
    # pre-sharing this batch paid a decode+agg subplan per bool query
    # (~3 extra shuffle waves each); shared: OR + bool + phrase
    # branches ≈ 3 decodes feeding one window — measured 8
    assert n <= 12, n


def test_bools_shared_tie_exactness_bit_identical(spark, tmp_path):
    """The 3M-found ULP hazard, pinned at unit scale: on a corpus of
    identical replicas every 3-term AND match ties exactly, so top-k
    membership is decided by doc_id — any FP-sum-order drift between
    the shared-batch plan and the sequential plan flips the selected
    set.  The order-canonical fold (_ordered_sum) makes both plans
    bit-identical: compare RAW scores, no rounding, and the exact
    doc_id sets."""
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.lit("data merge join filler words here").alias("text"),
    )
    bi = BlockedIndex(str(tmp_path / "tieidx"))
    bi.build(docs, fingerprint="ties", n_buckets=4)
    e = BlockedSearchEngine(spark, bi, cache=True)
    q = "data AND merge AND join"
    seq = [(r["rank"], r["doc_id"], r["score"])
           for r in e.search(q, 10).collect()]
    got = [(r["rank"], r["doc_id"], r["score"])
           for r in e.search_many({"a": q}, 10).collect()]
    assert got == seq                      # raw floats, no rounding
    assert [d for _, d, _ in seq] == list(range(10))  # lowest doc_ids win
