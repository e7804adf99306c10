"""Gap-aware block boundaries (BLOCK_GAP_CUT).

A block's [first_doc, max_doc] interval is what every metadata
consumer reasons over; on banded doc-id spaces one boundary block
straddling an empty gap used to mark the WHOLE gap as term-present
(found by the 3M url-field measurement — BENCH/PLANS.md).  Cutting
term runs at large gaps keeps intervals tight at the cost of one
extra block per gap.  Results must be identical either way — block
boundaries are invisible to decode.
"""

from __future__ import annotations

import pytest

from bids_spark.operators import blocked_index as BI
from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from bids_spark.oracle import OracleIndex
from bids_spark.plans.planner import SearchEngine

BAND = 10_000_000  # replica stride (matches the bench corpora)


def _banded_docs(spark, n_bands=6, docs_per_band=40):
    """Banded corpus: doc ids cluster at band*BAND + i with huge empty
    gaps between bands; 'common' is everywhere, 'rare{b}' only in band
    b, so cross-band queries exercise the interval machinery."""
    rows = []
    for b in range(n_bands):
        for i in range(docs_per_band):
            did = b * BAND + i
            text = f"common filler alpha beta rare{b} token{i % 7} data"
            rows.append((did, text))
    return rows, spark.createDataFrame(rows, "doc_id bigint, text string")


def _build(spark, docs, path, gap_cut, monkeypatch):
    monkeypatch.setattr(BI, "BLOCK_GAP_CUT", gap_cut)
    bi = BlockedIndex(str(path))
    bi.build(docs, fingerprint=f"gapcut-{gap_cut}", n_buckets=4,
             with_positions=True, score_mode="dl")
    return bi


def test_intervals_confined_to_bands(spark, tmp_path, monkeypatch):
    rows, docs = _banded_docs(spark)
    bi = _build(spark, docs, tmp_path / "cut", 1 << 20, monkeypatch)
    # with cuts: NO block interval spans more than one band's width
    spans = [
        (r["term"], int(r["max_doc"]) - int(r["first_doc"]))
        for r in bi.blocks(spark).select(
            "term", "first_doc", "max_doc"
        ).collect()
    ]
    assert spans and all(w < BAND for _, w in spans), sorted(
        spans, key=lambda x: -x[1]
    )[:3]
    # without cuts the head term's run DOES straddle gaps (the defect
    # this feature removes — keep the control honest)
    bi0 = _build(spark, docs, tmp_path / "nocut", 0, monkeypatch)
    spans0 = [
        int(r["max_doc"]) - int(r["first_doc"])
        for r in bi0.blocks(spark)
        .filter("term = 'common'")
        .select("first_doc", "max_doc")
        .collect()
    ]
    assert any(w >= BAND for w in spans0)


def test_rank_identity_cut_on_off_and_vs_oracle(spark, tmp_path, monkeypatch):
    rows, docs = _banded_docs(spark)
    oi = OracleIndex(dict(rows))
    queries = [
        "common rare3", "common AND rare3", "data -rare2",
        '"common filler"', "rare1 rare4", "common AND doc_id:[20000000 TO 30000050]",
    ]
    engines = []
    for tag, cut in (("c", 1 << 20), ("n", 0)):
        bi = _build(spark, docs, tmp_path / f"idx{tag}", cut, monkeypatch)
        eng = BlockedSearchEngine(spark, bi)
        eng.OM_MIN_BLOCKS = 0
        engines.append(eng)
    for q in queries:
        want = [(r, d, round(s, 9)) for r, d, s in oi.search(q, 10)]
        for eng in engines:
            got = [
                (r["rank"], r["doc_id"], round(r["score"], 9))
                for r in eng.search(q, 10).collect()
            ]
            assert got == want, (q, got[:3], want[:3])


def test_cut_improves_and_restriction(spark, tmp_path, monkeypatch):
    rows, docs = _banded_docs(spark)
    res = {}
    for tag, cut in (("c", 1 << 20), ("n", 0)):
        bi = _build(spark, docs, tmp_path / f"p{tag}", cut, monkeypatch)
        eng = BlockedSearchEngine(spark, bi)
        eng.OM_MIN_BLOCKS = 0
        res[tag] = eng.and_pruning_stats("common AND rare3")
    # tight intervals restrict 'common' to rare3's band; the uncut
    # control keeps (nearly) everything
    assert res["c"]["combined"]["postings_survive"] \
        < res["n"]["combined"]["postings_survive"]
    frac = (
        res["c"]["combined"]["postings_survive"]
        / max(res["c"]["postings_total"], 1)
    )
    assert frac < 0.5, res


def test_dense_ids_unchanged(spark, tmp_path, monkeypatch):
    """No gap ≥ threshold → identical block layout (bit-stable format
    on dense corpora; the driver bench's B/posting only moves where
    bands exist)."""
    rows = [(i, f"common word{i % 5} data") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = _build(spark, docs, tmp_path / "d1", 1 << 20, monkeypatch)
    b = _build(spark, docs, tmp_path / "d0", 0, monkeypatch)
    ka = sorted(
        (r["term"], r["first_doc"], r["n"], bytes(r["payload"]))
        for r in a.blocks(spark).collect()
    )
    kb = sorted(
        (r["term"], r["first_doc"], r["n"], bytes(r["payload"]))
        for r in b.blocks(spark).collect()
    )
    assert ka == kb


def test_segmented_and_naive_agree_on_banded(spark, tmp_path, monkeypatch):
    from bids_spark.operators.segments import SegmentedIndex

    rows, docs = _banded_docs(spark)
    monkeypatch.setattr(BI, "BLOCK_GAP_CUT", 1 << 20)
    si = SegmentedIndex(str(tmp_path / "seg"))
    si.add_segment(docs.filter("doc_id < 30000000"), fingerprint="g1",
                   n_buckets=4)
    si.add_segment(docs.filter("doc_id >= 30000000"), fingerprint="g2",
                   n_buckets=4)
    eng = si.engine(spark)
    naive = SearchEngine.from_documents(docs, cache=False)
    for q in ("common rare3", "common AND rare5", '"common filler" -rare0'):
        got = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in eng.search(q, 10).collect()
        ]
        want = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in naive.search(q, 10).collect()
        ]
        assert got == want, q
