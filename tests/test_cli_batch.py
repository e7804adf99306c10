"""CLI batched-serving surface (--search-file): one Spark action for a
file of queries, output in file order, per-query agreement with the
single-query engine results (the --search surface additionally does
the reference's content-dedup page shaping, so agreement is checked
against the engine, not against --search output)."""

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


@pytest.mark.slow
def test_cli_search_file(tmp_path, spark):
    env = dict(os.environ,
               BIDS_DATASET=str(tmp_path / "ds"),
               BIDS_SPARK_CLI_CORES="4",
               PYTHONPATH=REPO)
    assert _cli(env, "--initialise").returncode == 0
    r = _cli(env, "--index-parquet",
             "/root/testdata/sf0.001/documents.parquet")
    assert r.returncode == 0, r.stderr

    qfile = tmp_path / "queries.txt"
    qfile.write_text(
        "merge join\n"
        "\n"
        "# a comment line\n"
        "merge AND join\n"
        "zzznotaterm\n"
        '"merge join"\n'
    )
    r = _cli(env, "--search-file", str(qfile), "--results", "3")
    assert r.returncode == 0, r.stderr
    out = r.stdout.splitlines()
    # file order, headers verbatim, comment/blank skipped
    heads = [ln for ln in out if ln.startswith("## ")]
    assert heads == [
        "## merge join", "## merge AND join", "## zzznotaterm",
        '## "merge join"',
    ]
    # the no-hit query reports like the single surface
    i = out.index("## zzznotaterm")
    assert out[i + 1] == "No results found"
    # three ranked rows for the OR query, rank-prefixed, 4-decimal score
    i = out.index("## merge join")
    assert out[i + 1].startswith("1. Score: ")
    assert out[i + 3].startswith("3. Score: ")

    # all-miss file → exit 2 (the single-query no-hit convention)
    miss = tmp_path / "miss.txt"
    miss.write_text("zzznotaterm\nqqqalsonothing\n")
    assert _cli(env, "--search-file", str(miss)).returncode == 2

    # empty file → exit 1 with a message
    empty = tmp_path / "empty.txt"
    empty.write_text("\n# only a comment\n")
    r = _cli(env, "--search-file", str(empty))
    assert r.returncode == 1
    assert "No queries" in r.stderr
