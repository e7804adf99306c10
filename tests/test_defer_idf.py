"""idf-defer build path (termidf sidecar + encoder-side scoring).

The default build joins postings with NOTHING: the encoder reads idf
from the tiny sorted termidf sidecar (pyarrow range read per Arrow
batch) and computes scores with bm25_scores_np — the same function
dl-mode decode uses — so decoded postings, dictionary entries, and
search results are identical to the join twin's
(SPARK_GRAFT_BUILD_IDF_JOIN=1).

Block BOUNDARIES may differ between the arms (repartitionByRange
samples its child, and the two children have different row layouts),
so the asserted invariant is decode-level identity per term plus
bound soundness — not byte-identical block slicing.
"""

from __future__ import annotations

import os

import pytest

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.codec import decode_block, decode_block_positions_dl
from bids_spark.operators.wand import BlockedSearchEngine

QUERIES = ["data", "merge join", "merge AND join", '"merge join"',
           "data -join", "content:[merge TO part]", "the^2 data"]


def _build(docs, root, mode_env, **kw):
    os.environ["SPARK_GRAFT_BUILD_IDF_JOIN"] = mode_env
    try:
        bi = BlockedIndex(root)
        bi.build(docs, fingerprint="defer-ab", n_partitions=4, **kw)
        return bi
    finally:
        os.environ.pop("SPARK_GRAFT_BUILD_IDF_JOIN", None)


@pytest.fixture(scope="module")
def pair(spark, docs, tmp_path_factory):
    work = tmp_path_factory.mktemp("deferidf")
    a = _build(docs, str(work / "join"), "1", with_positions=True)
    b = _build(docs, str(work / "defer"), "0", with_positions=True)
    return a, b


def _decoded_postings(spark, bi):
    """term → sorted [(doc_id, tf, dl, positions)] fully decoded."""
    out = {}
    for r in bi.blocks(spark).collect():
        docs, tfs, _scores, pos, dls = decode_block_positions_dl(
            bytes(r["payload"]), r["first_doc"]
        )
        lst = out.setdefault(r["term"], [])
        off = 0
        for i in range(r["n"]):
            p = ()
            if pos is not None:
                p = tuple(pos[off : off + int(tfs[i])])
                off += int(tfs[i])
            lst.append((int(docs[i]), int(tfs[i]),
                        int(dls[i]) if dls is not None else None, p))
    return {t: sorted(v) for t, v in out.items()}


def test_defer_decodes_identical_postings(spark, pair):
    a, b = pair
    da, db = _decoded_postings(spark, a), _decoded_postings(spark, b)
    assert set(da) == set(db)
    for t in da:
        assert da[t] == db[t], t


def test_defer_dictionary_identical(spark, pair):
    a, b = pair
    ta = {r["term"]: r for r in a.terms(spark).collect()}
    tb = {r["term"]: r for r in b.terms(spark).collect()}
    assert set(ta) == set(tb)
    for t in ta:
        # df / idf / gmax exact across arms (gmax = max over the SAME
        # posting scores, just sliced differently); s10/s100 are
        # per-run partial bounds — sound (≤ the exact arm's value
        # computed over any superset run), not equal
        assert ta[t]["df"] == tb[t]["df"]
        assert ta[t]["idf"] == tb[t]["idf"], t
        assert ta[t]["gmax"] == tb[t]["gmax"], t


def test_defer_block_metadata_exact(spark, pair):
    """block_max_score must EQUAL the max of decode-time scores (the
    encoder computes them with the same bm25_scores_np the decode
    uses), and the per-run s10 seed must stay a valid lower bound on
    the term's global 10th-best score."""
    _a, b = pair
    for r in b.blocks(spark).collect():
        _docs, _tfs, scores = decode_block(
            bytes(r["payload"]), r["first_doc"], r["idf"], b.avgdl
        )
        assert float(scores.max()) == r["block_max_score"]


def test_defer_search_identical(spark, pair):
    a, b = pair
    ea = BlockedSearchEngine(spark, a, cache=False)
    eb = BlockedSearchEngine(spark, b, cache=False)
    for q in QUERIES:
        ra = [(r["doc_id"], r["score"]) for r in ea.search(q, 10).collect()]
        rb = [(r["doc_id"], r["score"]) for r in eb.search(q, 10).collect()]
        assert ra == rb, q


def test_defer_f64_mode_identical(spark, docs, tmp_path_factory):
    work = tmp_path_factory.mktemp("deferf64")
    a = _build(docs, str(work / "join"), "1", score_mode="f64")
    b = _build(docs, str(work / "defer"), "0", score_mode="f64")
    ea = BlockedSearchEngine(spark, a, cache=False)
    eb = BlockedSearchEngine(spark, b, cache=False)
    for q in ["data", "merge join"]:
        ra = [(r["doc_id"], r["score"]) for r in ea.search(q, 10).collect()]
        rb = [(r["doc_id"], r["score"]) for r in eb.search(q, 10).collect()]
        assert ra == rb, q


def test_defer_small_arrow_batches(spark, docs, tmp_path_factory):
    """Force many small Arrow batches through the encoder so the idf
    cache's load/evict path (batch floor pruning, carry term kept)
    actually exercises multi-batch runs."""
    work = tmp_path_factory.mktemp("deferbatch")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        b = _build(docs, str(work / "defer"), "0", with_positions=True)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    a = _build(docs, str(work / "join"), "1", with_positions=True)
    da, db = _decoded_postings(spark, a), _decoded_postings(spark, b)
    assert da == db


def test_defer_resume_skips_termidf(spark, docs, tmp_path):
    root = str(tmp_path / "idx")
    bi = _build(docs, root, "0")
    man = bi._manifest()
    assert "termidf" in man["stages"]
    t_before = os.path.getmtime(os.path.join(root, "termidf", "_SUCCESS"))
    bi2 = BlockedIndex(root)
    bi2.build(docs, fingerprint="defer-ab", n_partitions=4)
    t_after = os.path.getmtime(os.path.join(root, "termidf", "_SUCCESS"))
    assert t_before == t_after
