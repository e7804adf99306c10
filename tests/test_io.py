"""Storage-seam tests (bids_spark/io.py).

The north-star deployment writes Iceberg tables on an object store
with NO atomic rename — these tests pin the seam's commit semantics
against exactly that adversary: a store whose only atomic primitive is
conditional put (MemoryStore / LocalFsStore fakes), with interposed
concurrent writers and simulated crashes.
"""

from __future__ import annotations

import json
import os

import pytest

from bids_spark.io import (
    ConditionalPutLog,
    IcebergTableIO,
    LocalFsStore,
    MemoryStore,
    ParquetTableIO,
    PosixRenameLog,
    iceberg_catalog,
    table_io_for,
)

# ---------------------------------------------------------------------------
# commit logs on rename-free stores
# ---------------------------------------------------------------------------


def test_conditional_put_log_roundtrip():
    log = ConditionalPutLog(MemoryStore(), prefix="idx/")
    assert log.read() is None
    log.commit({"segments": ["seg-0000"]})
    assert log.read() == {"segments": ["seg-0000"]}
    log.commit({"segments": ["seg-0000", "seg-0001"]})
    assert log.read() == {"segments": ["seg-0000", "seg-0001"]}


def test_conditional_put_log_cas_preserves_concurrent_update():
    """The ADVICE race: two mutators read-modify-write concurrently.
    With CAS, the loser RETRIES on the winner's state — neither update
    is lost (contrast: PosixRenameLog documents single-writer)."""
    store = MemoryStore()
    log = ConditionalPutLog(store, prefix="p/")
    log.commit({"tombstones": []})

    sneak = {"done": False}

    def interpose(key):
        # a concurrent delete lands between writer A's read and put —
        # exactly once, and not reentrantly for the sneaker's own put
        if not sneak["done"]:
            sneak["done"] = True
            ConditionalPutLog(store, prefix="p/").update(
                lambda c: {"tombstones": sorted(set(c["tombstones"]) | {"del-0001"})}
            )

    store.before_put = interpose
    log.update(lambda c: {"tombstones": sorted(set(c["tombstones"]) | {"del-0000"})})
    store.before_put = None
    assert log.read() == {"tombstones": ["del-0000", "del-0001"]}


def test_conditional_put_log_crash_leaves_previous_version_serving():
    """A writer that dies before its put completes leaves the log at
    the previous version — versions are immutable whole objects, so a
    torn read is impossible by construction."""
    store = MemoryStore()
    log = ConditionalPutLog(store, prefix="c/")
    log.commit({"v": 1})

    def crash(key):
        raise RuntimeError("simulated crash before put")

    store.before_put = crash
    with pytest.raises(RuntimeError, match="simulated crash"):
        log.commit({"v": 2})
    store.before_put = None
    assert log.read() == {"v": 1}
    # recovery: the next writer proceeds normally
    log.commit({"v": 3})
    assert log.read() == {"v": 3}


def test_localfs_store_put_if_absent_is_exclusive(tmp_path):
    store = LocalFsStore(str(tmp_path))
    assert store.put_if_absent("a/commit-1.json", b"one")
    assert not store.put_if_absent("a/commit-1.json", b"two")
    assert store.get("a/commit-1.json") == b"one"
    assert store.list("a/commit-") == ["a/commit-1.json"]


def test_conditional_put_log_on_local_fs(tmp_path):
    log = ConditionalPutLog(LocalFsStore(str(tmp_path)), prefix="seg/")
    log.update(lambda c: {"n": 1 if c is None else c["n"] + 1})
    log.update(lambda c: {"n": c["n"] + 1})
    assert log.read() == {"n": 2}


def test_posix_rename_log_reads_pre_seam_files(tmp_path):
    """Backward compat: a segments.json written by the pre-seam code is
    readable through the log, and commits keep the same format."""
    p = tmp_path / "segments.json"
    p.write_text(json.dumps({"segments": ["seg-0000"], "tombstones": []}))
    log = PosixRenameLog(str(p))
    assert log.read()["segments"] == ["seg-0000"]
    log.commit({"segments": ["seg-0000"], "tombstones": ["del-0000"]})
    assert json.loads(p.read_text())["tombstones"] == ["del-0000"]


# ---------------------------------------------------------------------------
# table I/O + backend selection
# ---------------------------------------------------------------------------


def test_parquet_table_io_roundtrip(spark, tmp_path):
    io = ParquetTableIO(str(tmp_path))
    df = spark.range(100).selectExpr("id", "id % 4 as bucket")
    io.write(df, "blocks", partition_by=["bucket"])
    assert io.exists("blocks")
    back = io.read(spark, "blocks")
    assert back.count() == 100
    assert set(back.columns) == {"id", "bucket"}
    lin = io.lineage("blocks")
    assert lin and all("file" in e and e["bytes"] > 0 for e in lin)
    # partition pruning survives the seam (directory-level filter)
    plan = back.filter("bucket = 2")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_backend_selection_defaults_to_parquet(spark, tmp_path):
    assert iceberg_catalog(spark) is None
    io = table_io_for(spark, str(tmp_path))
    assert isinstance(io, ParquetTableIO)


def test_backend_selection_picks_iceberg_catalog(spark, tmp_path):
    """With an Iceberg catalog configured the seam routes to
    DataFrameWriterV2 table identities (the sandbox has no Iceberg
    runtime jar, so selection + identifier shape are what we pin)."""
    spark.conf.set("spark.bids.io.catalog", "ice")
    try:
        io = table_io_for(spark, str(tmp_path / "my-index.v2"))
        assert isinstance(io, IcebergTableIO)
        assert io.ident("blocks") == "ice.bids.my_index_v2_blocks"
    finally:
        spark.conf.unset("spark.bids.io.catalog")
    assert isinstance(table_io_for(spark, str(tmp_path)), ParquetTableIO)


# ---------------------------------------------------------------------------
# the engine writes through the seam
# ---------------------------------------------------------------------------


def _tiny_docs(spark):
    rows = [(i, f"alpha beta doc{i} gamma") for i in range(12)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_blocked_index_builds_on_conditional_put_manifest(spark, tmp_path):
    """Full build with the manifest on a rename-free store: resume
    still works (second build skips all stages) and the index serves."""
    from bids_spark.operators.blocked_index import BlockedIndex
    from bids_spark.operators.wand import BlockedSearchEngine

    store = LocalFsStore(str(tmp_path / "meta"))
    log = ConditionalPutLog(store, prefix="manifest/")
    bi = BlockedIndex(str(tmp_path / "idx"), commit_log=log)
    bi.build(_tiny_docs(spark), fingerprint="t1", with_positions=True)
    assert bi.is_servable()
    secs = {
        s: bi._manifest()["stages"][s]["seconds"]
        for s in ("postings", "doclens", "stats", "blocks")
    }
    # resume: same fingerprint ⇒ no stage re-runs (identical manifests)
    bi2 = BlockedIndex(
        str(tmp_path / "idx"),
        commit_log=ConditionalPutLog(store, prefix="manifest/"),
    )
    bi2.build(_tiny_docs(spark), fingerprint="t1", with_positions=True)
    assert {
        s: bi2._manifest()["stages"][s]["seconds"]
        for s in secs
    } == secs
    hits = BlockedSearchEngine(spark, bi2).search("alpha", 3).collect()
    assert len(hits) == 3


def test_segmented_index_commit_on_conditional_put(spark, tmp_path):
    """SegmentedIndex mutations through the CAS log: append + delete
    survive an interleaved concurrent delete (the documented lost-
    update hazard of the posix backend is DETECTED and retried here)."""
    from bids_spark.operators.segments import SegmentedIndex

    store = MemoryStore()
    root = str(tmp_path / "segroot")
    si = SegmentedIndex(root, commit_log=ConditionalPutLog(store, prefix="s/"))
    si.add_segment(_tiny_docs(spark), fingerprint="segA")
    assert si._committed()["segments"] == ["seg-0000"]

    sneak = {"done": False}

    def interpose(key):
        if not sneak["done"]:
            sneak["done"] = True
            SegmentedIndex(
                root, commit_log=ConditionalPutLog(store, prefix="s/")
            ).delete_docs(spark, [3])

    store.before_put = interpose
    si.delete_docs(spark, [5])
    store.before_put = None
    c = si._committed()
    assert c["segments"] == ["seg-0000"]
    assert len(c["tombstones"]) == 2  # both deletes survived
    tomb_ids = {r["doc_id"] for r in si.tombstones(spark).collect()}
    assert tomb_ids == {3, 5}
