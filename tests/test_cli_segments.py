"""CLI lifecycle test for the segmented append/delete/compact flow."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(env, *args):
    return subprocess.run(
        [sys.executable, "-m", "bids_spark.cli", *args],
        capture_output=True, text=True, env=env, cwd=REPO,
    )


def _hits(stdout: str) -> list[int]:
    return [
        int(ln.split("doc_id=")[1])
        for ln in stdout.splitlines()
        if "doc_id=" in ln
    ]


@pytest.mark.slow
def test_cli_append_delete_compact(tmp_path, spark):
    """--index → --append bootstraps segments and finds new docs;
    --delete-doc removes a hit without disturbing others; --compact
    preserves results in one segment."""
    env = dict(os.environ,
               BIDS_DATASET=str(tmp_path / "ds"),
               BIDS_SPARK_CLI_CORES="4",
               PYTHONPATH=REPO)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old_pq = str(tmp_path / "old.parquet")
    new_pq = str(tmp_path / "new.parquet")
    docs.filter("doc_id < 400").select("doc_id", "text").write.parquet(old_pq)
    # appended docs: fresh ids, one crafted to rank top for the query
    spark.createDataFrame(
        [(100001, "zebraword zebraword zebraword"),
         (100002, "plain filler text entirely unrelated")],
        "doc_id long, text string",
    ).write.parquet(new_pq)

    assert _cli(env, "--initialise").returncode == 0
    r = _cli(env, "--index-parquet", old_pq)
    assert r.returncode == 0, r.stderr
    # term absent before append
    assert _cli(env, "--search", "zebraword").returncode == 2

    r = _cli(env, "--append-parquet", new_pq)
    assert r.returncode == 0, r.stderr
    assert "2 segments" in r.stdout
    r = _cli(env, "--search", "zebraword")
    assert r.returncode == 0, r.stderr
    assert _hits(r.stdout) == [100001]
    # old docs still served (segment 0 bootstrap)
    r = _cli(env, "--search", "merge join", "--results", "5")
    assert r.returncode == 0 and len(_hits(r.stdout)) == 5
    baseline = r.stdout

    # round-5 grammar through the segmented CLI surface: fuzzy hits
    # the planted doc (zebrawort~1 → zebraword), prefix hits it too,
    # and a no-expansion fuzzy exits 2 like any no-hit query
    r = _cli(env, "--search", "zebrawort~1")
    assert r.returncode == 0 and _hits(r.stdout) == [100001], r.stdout
    r = _cli(env, "--search", "zebra*")
    assert r.returncode == 0 and _hits(r.stdout) == [100001], r.stdout
    assert _cli(env, "--search", "qqqqq~1").returncode == 2

    # delete the zebraword doc: stops matching; other results unchanged
    assert _cli(env, "--delete-doc", "100001").returncode == 0
    assert _cli(env, "--search", "zebraword").returncode == 2
    r = _cli(env, "--search", "merge join", "--results", "5")
    assert r.stdout == baseline

    # compact: one segment, tombstones purged, results preserved
    r = _cli(env, "--compact")
    assert r.returncode == 0, r.stderr
    r = _cli(env, "--search", "merge join", "--results", "5")
    assert _hits(r.stdout) == _hits(baseline)
    assert _cli(env, "--search", "zebraword").returncode == 2

    # second lifecycle round on the SAME dataset: segment numbering
    # must not collide with retired directories (post-compaction name
    # reuse) and a second compact must not trip over old-* renames
    new2_pq = str(tmp_path / "new2.parquet")
    spark.createDataFrame(
        [(100003, "gryphonword gryphonword unique")],
        "doc_id long, text string",
    ).write.parquet(new2_pq)
    r = _cli(env, "--append-parquet", new2_pq)
    assert r.returncode == 0, r.stderr
    r = _cli(env, "--search", "gryphonword")
    assert r.returncode == 0 and _hits(r.stdout) == [100003]
    # single-segment dataset + tombstone → compact must purge, and the
    # deleted doc must NOT be resurrected by a later full --index
    assert _cli(env, "--delete-doc", "100003").returncode == 0
    r = _cli(env, "--compact")
    assert r.returncode == 0, r.stderr
    assert _cli(env, "--search", "gryphonword").returncode == 2
    r = _cli(env, "--index-parquet", new_pq)  # full rebuild from store
    assert r.returncode == 0, r.stderr
    assert _cli(env, "--search", "gryphonword").returncode == 2, (
        "deleted doc resurrected by --index rebuild"
    )

    # delete on a non-segmented dataset errors cleanly
    env2 = dict(env, BIDS_DATASET=str(tmp_path / "ds2"))
    _cli(env2, "--initialise")
    _cli(env2, "--index-parquet", old_pq)
    r = _cli(env2, "--delete-doc", "1")
    assert r.returncode == 1 and "segmented" in r.stderr


@pytest.mark.slow
def test_cli_auto_compact(tmp_path, spark):
    """--append --auto-compact N merges when the segment count reaches
    N, through cmd_compact (so the stored-fields docs store is purged
    in the same breath), and search keeps working afterwards."""
    env = dict(os.environ,
               BIDS_DATASET=str(tmp_path / "ds_ac"),
               BIDS_SPARK_CLI_CORES="4",
               PYTHONPATH=REPO)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pq1 = str(tmp_path / "p1.parquet")
    pq2 = str(tmp_path / "p2.parquet")
    docs.filter("doc_id < 250").select("doc_id", "text").write.parquet(pq1)
    docs.filter("doc_id >= 250").select("doc_id", "text").write.parquet(pq2)
    r = _cli(env, "--initialise")
    assert r.returncode == 0, r.stderr
    r = _cli(env, "--append-parquet", pq1, "--auto-compact", "2")
    assert r.returncode == 0, r.stderr
    assert "Auto-compacting" not in r.stdout  # 1 segment: below threshold
    r = _cli(env, "--append-parquet", pq2, "--auto-compact", "2")
    assert r.returncode == 0, r.stderr
    assert "Auto-compacting" in r.stdout and "Compacted" in r.stdout
    r = _cli(env, "--search", "merge join", "--results", "3")
    assert r.returncode == 0 and _hits(r.stdout)
