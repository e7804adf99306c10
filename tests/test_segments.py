"""Segmented (append-only) index: N independently-built segments must
answer every query shape rank-identically to a single naive engine over
the full corpus — exact global BM25 via dl-mode rescoring + idf
substitution (operators/segments.py)."""

from __future__ import annotations

import math
import os

import pytest

from bids_spark.operators.segments import SegmentedIndex, SegmentedSearchEngine
from bids_spark.plans.planner import SearchEngine

QUERIES = [
    "data",
    "merge join",
    "merge AND join",
    "merge -join",
    "the",
    "data merge join sort window",
    '"merge join"',
    '"merge join" AND data',
    "(merge OR join) AND data",
    "zzzmissing",
]


@pytest.fixture(scope="module")
def seg_index(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("segroot"))
    si = SegmentedIndex(root)
    # three uneven segments, deterministic split
    parts = [
        docs.filter(docs.doc_id % 4 == 0),
        docs.filter(docs.doc_id % 4 == 1),
        docs.filter(docs.doc_id % 4 >= 2),
    ]
    for i, p in enumerate(parts):
        si.add_segment(p, fingerprint=f"seg{i}", n_partitions=4)
    assert len(si.segment_paths()) == 3
    return si


@pytest.fixture(scope="module")
def naive(docs):
    return SearchEngine.from_documents(docs)


@pytest.mark.parametrize("q", QUERIES)
def test_segmented_matches_single_index(spark, seg_index, naive, q):
    eng = seg_index.engine(spark)
    assert isinstance(eng, SegmentedSearchEngine)
    got = [(r["rank"], r["doc_id"], r["score"]) for r in eng.search(q, 10).collect()]
    want = [(r["rank"], r["doc_id"], r["score"]) for r in naive.search(q, 10).collect()]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], q
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9), (q, gs, ws)


def test_append_changes_results(spark, docs, tmp_path):
    """Adding a segment must update global df/N/avgdl — results equal a
    fresh single-corpus engine over the extended corpus."""
    half = docs.filter(docs.doc_id % 2 == 0)
    si = SegmentedIndex(str(tmp_path / "grow"))
    si.add_segment(half, fingerprint="h1", n_partitions=4)
    eng1 = si.engine(spark)
    naive_half = SearchEngine.from_documents(half, cache=False)
    g1 = [(r["rank"], r["doc_id"]) for r in eng1.search("merge join", 10).collect()]
    w1 = [(r["rank"], r["doc_id"]) for r in naive_half.search("merge join", 10).collect()]
    assert g1 == w1
    # append the other half
    si.add_segment(docs.filter(docs.doc_id % 2 == 1), fingerprint="h2",
                   n_partitions=4)
    eng2 = si.engine(spark)
    naive_full = SearchEngine.from_documents(docs, cache=False)
    got = [(r["rank"], r["doc_id"], r["score"])
           for r in eng2.search("merge join", 10).collect()]
    want = [(r["rank"], r["doc_id"], r["score"])
            for r in naive_full.search("merge join", 10).collect()]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9)


def test_single_segment_uses_plain_engine(spark, docs, tmp_path):
    from bids_spark.operators.wand import BlockedSearchEngine

    si = SegmentedIndex(str(tmp_path / "one"))
    si.add_segment(docs, fingerprint="only", n_partitions=4)
    eng = si.engine(spark)
    assert isinstance(eng, BlockedSearchEngine)
    assert not isinstance(eng, SegmentedSearchEngine)


def test_f64_segments_rejected(spark, docs, tmp_path):
    from bids_spark.operators.blocked_index import BlockedIndex

    a = BlockedIndex(str(tmp_path / "seg-0000"))
    a.build(docs, fingerprint="a", score_mode="f64", n_partitions=4)
    b = BlockedIndex(str(tmp_path / "seg-0001"))
    b.build(docs, fingerprint="b", score_mode="f64", n_partitions=4)
    with pytest.raises(ValueError):
        SegmentedSearchEngine(spark, [a, b])


def test_compaction_preserves_results(spark, docs, tmp_path):
    """C5 background merge: compacting N segments into one must not
    change any query result, and the engine afterwards is the plain
    single-index engine."""
    from bids_spark.operators.wand import BlockedSearchEngine

    si = SegmentedIndex(str(tmp_path / "croot"))
    si.add_segment(docs.filter(docs.doc_id % 3 == 0), fingerprint="c0",
                   n_partitions=2)
    si.add_segment(docs.filter(docs.doc_id % 3 == 1), fingerprint="c1",
                   n_partitions=2)
    si.add_segment(docs.filter(docs.doc_id % 3 == 2), fingerprint="c2",
                   n_partitions=2)
    before = {}
    eng = si.engine(spark)
    qs = ["merge join", "merge AND join", '"merge join"', "data -merge"]
    for q in qs:
        before[q] = [(r["rank"], r["doc_id"], round(r["score"], 9))
                     for r in eng.search(q, 10).collect()]

    si.compact(spark, n_partitions=4)
    assert len(si.segment_paths()) == 1
    eng2 = si.engine(spark)
    assert isinstance(eng2, BlockedSearchEngine)
    assert not isinstance(eng2, SegmentedSearchEngine)
    for q in qs:
        after = [(r["rank"], r["doc_id"], round(r["score"], 9))
                 for r in eng2.search(q, 10).collect()]
        assert after == before[q], q


# -- atomic visibility (segments.json commit point) --------------------------


def test_uncommitted_segment_is_invisible(spark, docs, tmp_path):
    """A seg-* directory that never reached the commit point (in-flight
    or crashed build) must not be listed or served — no KeyError on a
    partial manifest, no double-counted docs."""
    import os
    import shutil

    si = SegmentedIndex(str(tmp_path / "segvis"))
    si.add_segment(docs.filter(docs.doc_id % 2 == 0), fingerprint="v0",
                   n_partitions=4)
    committed = si.segment_paths()
    assert len(committed) == 1
    # simulate a concurrent in-flight add: a full segment dir on disk,
    # not yet committed
    shutil.copytree(committed[0], os.path.join(si.root, "seg-inflight"))
    assert si.segment_paths() == committed
    # and a torn one: directory with a partial manifest
    os.makedirs(os.path.join(si.root, "seg-torn"))
    assert si.segment_paths() == committed


def test_legacy_root_without_commit_file(spark, docs, tmp_path):
    """Roots from before the commit file fall back to listing servable
    segments only."""
    import os

    si = SegmentedIndex(str(tmp_path / "seglegacy"))
    si.add_segment(docs.filter(docs.doc_id % 2 == 0), fingerprint="l0",
                   n_partitions=4)
    si.add_segment(docs.filter(docs.doc_id % 2 == 1), fingerprint="l1",
                   n_partitions=4)
    os.remove(si._commit_path)          # simulate pre-upgrade layout
    paths = si.segment_paths()
    assert len(paths) == 2
    os.makedirs(os.path.join(si.root, "seg-halfbuilt"))   # not servable
    assert si.segment_paths() == paths


def test_compact_no_replace_keeps_sources_serving(spark, docs, tmp_path):
    si = SegmentedIndex(str(tmp_path / "segnorep"))
    si.add_segment(docs.filter(docs.doc_id % 2 == 0), fingerprint="n0",
                   n_partitions=4)
    si.add_segment(docs.filter(docs.doc_id % 2 == 1), fingerprint="n1",
                   n_partitions=4)
    before = si.segment_paths()
    si.compact(spark, n_partitions=4, replace=False)
    # merged segment exists on disk but is NOT committed: readers keep
    # serving the sources, nothing is double-counted
    assert si.segment_paths() == before
    eng = si.engine(spark)
    assert eng._stats()[0] == docs.count()


# -- deletes (tombstones) ----------------------------------------------------


@pytest.fixture()
def deletable(spark, docs, tmp_path):
    si = SegmentedIndex(str(tmp_path / "segdel"))
    si.add_segment(docs.filter(docs.doc_id % 2 == 0), fingerprint="d0",
                   n_partitions=4)
    si.add_segment(docs.filter(docs.doc_id % 2 == 1), fingerprint="d1",
                   n_partitions=4)
    return si


def test_delete_then_search(spark, docs, deletable):
    """Reference behaviour (playground/example/indexer.py:90-105):
    a deleted doc stops matching immediately; surviving docs keep
    their EXACT scores (df/N/avgdl count deleted docs until merge,
    like Lucene/tantivy)."""
    si = deletable
    base = si.engine(spark).search("data", 10).collect()
    victim = base[0]["doc_id"]
    si.delete_docs(spark, [victim])
    got = si.engine(spark).search("data", 10).collect()
    ids = [r["doc_id"] for r in got]
    assert victim not in ids
    assert len(got) == 10                     # next-best doc filled in
    rest = [(r["doc_id"], r["score"]) for r in base if r["doc_id"] != victim]
    for (gid, gs), (wid, ws) in zip([(r["doc_id"], r["score"]) for r in got], rest):
        assert gid == wid
        assert math.isclose(gs, ws, rel_tol=1e-9)


def test_delete_applies_to_all_query_shapes(spark, deletable):
    si = deletable
    for q in ["merge join", "merge AND join", '"merge join"']:
        top = si.engine(spark).search(q, 3).collect()
        victim = top[0]["doc_id"]
        si.delete_docs(spark, [victim])
        ids = [r["doc_id"] for r in si.engine(spark).search(q, 10).collect()]
        assert victim not in ids, q


def test_compact_purges_tombstones(spark, docs, deletable):
    si = deletable
    victim = si.engine(spark).search("data", 1).collect()[0]["doc_id"]
    si.delete_docs(spark, [victim])
    si.compact(spark, n_partitions=4)
    assert len(si.segment_paths()) == 1
    assert si._committed()["tombstones"] == []
    eng = si.engine(spark)
    assert victim not in [r["doc_id"] for r in eng.search("data", 10).collect()]
    # merge purges deletions from the stats too (Lucene merge semantics)
    assert eng._stats()[0] == docs.count() - 1


def test_auto_compact_segment_count_policy(spark, docs, tmp_path):
    """With auto_compact_segments=3, the append that brings the
    committed set to 3 segments must merge them into one, and the
    merged index must stay rank/score-identical to a single engine."""
    si = SegmentedIndex(str(tmp_path / "ac"), auto_compact_segments=3)
    si.add_segment(docs.filter(docs.doc_id % 3 == 0), fingerprint="a",
                   n_partitions=4)
    si.add_segment(docs.filter(docs.doc_id % 3 == 1), fingerprint="b",
                   n_partitions=4)
    assert len(si.segment_paths()) == 2  # below threshold: no merge
    si.add_segment(docs.filter(docs.doc_id % 3 == 2), fingerprint="c",
                   n_partitions=4)
    assert len(si.segment_paths()) == 1  # policy fired: one merged segment
    naive = SearchEngine.from_documents(docs)
    got = [
        (r["rank"], r["doc_id"])
        for r in si.engine(spark).search("merge join", 10).collect()
    ]
    want = [
        (r["rank"], r["doc_id"])
        for r in naive.search("merge join", 10).collect()
    ]
    assert got == want


def test_auto_compact_tombstone_frac_policy(spark, docs, tmp_path):
    """With auto_compact_tombstone_frac=0.2, small deletes leave
    tombstones in place; crossing 20% of indexed docs triggers a
    compaction that purges them (tombstone list empties, deleted docs
    gone from the postings themselves)."""
    si = SegmentedIndex(str(tmp_path / "act"), auto_compact_tombstone_frac=0.2)
    si.add_segment(docs.filter(docs.doc_id % 2 == 0), fingerprint="e",
                   n_partitions=4)
    si.add_segment(docs.filter(docs.doc_id % 2 == 1), fingerprint="o",
                   n_partitions=4)
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    n = len(ids)
    few = ids[: max(1, n // 20)]          # 5% — under the threshold
    si.delete_docs(spark, few)
    assert si._committed()["tombstones"], "small delete must NOT compact"
    assert len(si.segment_paths()) == 2
    more = ids[: n // 4]                  # 25% — crosses the threshold
    si.delete_docs(spark, more)
    assert si._committed()["tombstones"] == []  # purged on merge
    assert len(si.segment_paths()) == 1
    hits = {
        r["doc_id"] for r in si.engine(spark).search("the", 500).collect()
    }
    assert hits.isdisjoint(set(more))


def test_replay_of_retired_named_segment_noops(spark, docs, tmp_path):
    """Exactly-once across compactions: a replayed NAMED append (a
    streaming micro-batch retry) whose segment was already merged away
    must no-op — the commit's retired list remembers merged names, so
    the docs are not double-counted and the directory is not rebuilt."""
    si = SegmentedIndex(str(tmp_path / "rr"))
    a = docs.filter(docs.doc_id % 2 == 0)
    b = docs.filter(docs.doc_id % 2 == 1)
    si.add_segment(a, fingerprint="a", name="seg-batch-000000", n_partitions=4)
    si.add_segment(b, fingerprint="b", name="seg-batch-000001", n_partitions=4)
    si.compact(spark)
    assert len(si.segment_paths()) == 1
    before = [
        (r["rank"], r["doc_id"], r["score"])
        for r in si.engine(spark).search("merge join", 10).collect()
    ]
    si.add_segment(b, fingerprint="b", name="seg-batch-000001", n_partitions=4)
    assert len(si.segment_paths()) == 1, "retired name must not resurrect"
    after = [
        (r["rank"], r["doc_id"], r["score"])
        for r in si.engine(spark).search("merge join", 10).collect()
    ]
    assert after == before


def test_default_named_append_after_compact_is_committed(spark, docs, tmp_path):
    """A FRESH default-named append after a compaction must not land on
    a retired number (compaction renames merged dirs to old-*, so the
    directory probe alone re-picks it) — the new segment must be
    committed and its docs searchable."""
    si = SegmentedIndex(str(tmp_path / "dn"))
    si.add_segment(docs.filter(docs.doc_id % 2 == 0), fingerprint="a",
                   n_partitions=4)
    si.add_segment(docs.filter(docs.doc_id % 2 == 1), fingerprint="b",
                   n_partitions=4)
    si.compact(spark)
    retired = set(si._committed()["retired"])
    assert retired == {"seg-0000", "seg-0001"}
    fresh = spark.createDataFrame(
        [(900001, "ocelotword unique content here")],
        "doc_id long, text string",
    )
    si.add_segment(fresh, fingerprint="c", n_partitions=4)
    names = {os.path.basename(p) for p in si.segment_paths()}
    assert len(names) == 2 and names.isdisjoint(retired)
    hits = [r["doc_id"]
            for r in si.engine(spark).search("ocelotword", 10).collect()]
    assert hits == [900001]


def test_retired_trim_horizon(spark, docs, tmp_path):
    """compact(retain_retired=N): replays INSIDE the kept window still
    no-op; a replay at or below the recorded floor is rejected loudly
    instead of silently double-appending (the round-3 unbounded
    retired-list growth, now with a knob tied to checkpoint replay
    depth)."""
    import pytest as _pytest

    si = SegmentedIndex(str(tmp_path / "trim"))
    thirds = [docs.filter(docs.doc_id % 3 == i) for i in range(3)]
    for i, part in enumerate(thirds):
        si.add_segment(part, fingerprint=f"b{i}", name=f"seg-batch-{i:06d}",
                       n_partitions=4, with_positions=False)
    si.compact(spark, n_partitions=4, retain_retired=1)
    c = si._read_commit()
    assert c["retired"] == ["seg-batch-000002"]
    assert c["retired_batch_floor"] == 1
    n_segs = len(c["segments"])
    # inside the window: exactly-once no-op, commit unchanged
    si.add_segment(thirds[2], fingerprint="b2", name="seg-batch-000002",
                   n_partitions=4, with_positions=False)
    assert len(si._read_commit()["segments"]) == n_segs
    # at/below the floor: loud rejection, nothing appended
    with _pytest.raises(ValueError, match="retired-name horizon"):
        si.add_segment(thirds[0], fingerprint="b0", name="seg-batch-000000",
                       n_partitions=4, with_positions=False)
    assert len(si._read_commit()["segments"]) == n_segs
    # genuinely new batches keep flowing
    si.add_segment(thirds[0].limit(5), fingerprint="b3",
                   name="seg-batch-000003", n_partitions=4,
                   with_positions=False)
    assert len(si._read_commit()["segments"]) == n_segs + 1
