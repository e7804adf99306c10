"""Reference-fidelity tests: index reference-shaped BIDS JSON docs
(whole-JSON-as-text, /root/reference/bids/index.py:112-118) through the
CLI-grade ingest path and run the reference query set (FIXTURES.md §5)
rank-identically vs the committed oracle.  Also: CLI exit codes
(0 ok / 1 error / 2 no-hit — /root/reference/bids/search.py:119,137,139)
and zip export/import round-trip (index.py:190-213)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from bids_spark.cli import ingest_directory
from bids_spark.oracle import OracleIndex
from bids_spark.plans.planner import SearchEngine
from bids_spark.sources.bids_docs import write_fixture_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REFERENCE_QUERIES = [
    "strcpy",               # README.md:320-356
    "libc",                 # test/test_search.py:77-81
    "libc AND libpng",      # README.md:284
    "malloc free",          # default-OR
    "libc -strcpy",         # must-not
    '"globalsymbol"',       # JSON structural term
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bids_docs"))
    write_fixture_corpus(d)
    return d


@pytest.fixture(scope="module")
def ingested(spark, corpus_dir):
    return ingest_directory(spark, corpus_dir).cache()


def test_ingest_filters(spark, ingested, corpus_dir):
    rows = ingested.collect()
    paths = {os.path.basename(r["file_path"]) for r in rows}
    assert "badfile.json" not in paths          # non-BIDS filtered
    assert "hello.c" not in paths               # non-JSON skipped
    assert "bin00.json" in paths and "bin00_copy.json" in paths
    assert len(rows) == 21                      # 20 + duplicate


def test_doc_ids_deterministic(spark, corpus_dir):
    a = {r["file_path"]: r["doc_id"]
         for r in ingest_directory(spark, corpus_dir).collect()}
    b = {r["file_path"]: r["doc_id"]
         for r in ingest_directory(spark, corpus_dir).collect()}
    assert a == b  # vs the reference's salted hash() (index.py:44-45)


@pytest.mark.parametrize("q", REFERENCE_QUERIES)
def test_reference_query_set_rank_identical(ingested, q):
    import math

    eng = SearchEngine.from_documents(ingested, cache=False)
    pdf = ingested.select("doc_id", "text").toPandas()
    oracle = OracleIndex(dict(zip(pdf.doc_id, pdf.text)))
    got = [(r["rank"], r["doc_id"], r["score"]) for r in eng.search(q, 10).collect()]
    want = oracle.search(q, 10)
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want], q
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-6)


def _cli(env, *args):
    return subprocess.run(
        [sys.executable, "-m", "bids_spark.cli", *args],
        capture_output=True, text=True, env=env, cwd=REPO,
    )


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, corpus_dir):
    env = dict(os.environ,
               BIDS_DATASET=str(tmp_path / "ds"),
               BIDS_SPARK_CLI_CORES="4",
               PYTHONPATH=REPO)
    r = _cli(env, "--initialise")
    assert r.returncode == 0, r.stderr
    r = _cli(env, "--index", corpus_dir)
    assert r.returncode == 0, r.stderr
    assert "21 documents" in r.stdout

    r = _cli(env, "--search", "strcpy", "--results", "5")
    assert r.returncode == 0, r.stderr
    assert "1. Score: " in r.stdout and ".json" in r.stdout
    # score format {:.4f} (reference search.py:125)
    first = r.stdout.splitlines()[0]
    score_str = first.split("Score: ")[1].split(" ")[0]
    assert len(score_str.split(".")[1]) == 4

    # pagination: --offset 2 starts numbering (and results) at rank 3
    full = [ln for ln in r.stdout.splitlines() if ". Score: " in ln]
    r = _cli(env, "--search", "strcpy", "--results", "5", "--offset", "2")
    assert r.returncode == 0, r.stderr
    page = [ln for ln in r.stdout.splitlines() if ". Score: " in ln]
    assert page and page[0].startswith("3. ")
    assert page[0] == full[2]                    # same ranking, sliced

    # snippets: a highlight window containing the query term
    r = _cli(env, "--search", "strcpy", "--results", "2", "--snippets")
    assert r.returncode == 0, r.stderr
    snips = [ln for ln in r.stdout.splitlines() if ln.startswith("   … ")]
    assert snips and any("strcpy" in s for s in snips)

    r = _cli(env, "--search", "zzznotavailable")
    assert r.returncode == 2                     # reference exit 2

    # export / import round trip
    zip_path = str(tmp_path / "ds.zip")
    assert _cli(env, "--export", zip_path).returncode == 0
    assert _cli(env, "--import", zip_path).returncode == 0
    r = _cli(env, "--search", "strcpy")
    assert r.returncode == 0

    # invalid archive rejected (reference index.py:190-197)
    bad = tmp_path / "not_a_zip.zip"
    bad.write_text("nope")
    assert _cli(env, "--import", str(bad)).returncode == 1


@pytest.mark.slow
def test_cli_search_falls_back_on_unservable_index(tmp_path, corpus_dir):
    """An interrupted --index (manifest present, blocks/terms stages
    missing or stale-format) must fall back to the naive engine, not
    crash with a raw AnalysisException."""
    import json as _json

    env = dict(os.environ,
               BIDS_DATASET=str(tmp_path / "ds"),
               BIDS_SPARK_CLI_CORES="4",
               PYTHONPATH=REPO)
    assert _cli(env, "--initialise").returncode == 0
    assert _cli(env, "--index", corpus_dir).returncode == 0

    # corrupt the manifest to look like an interrupted build: postings
    # done, blocks/terms never finished
    man_path = tmp_path / "ds" / "index" / "manifest.json"
    man = _json.loads(man_path.read_text())
    man["stages"].pop("blocks", None)
    man["stages"].pop("terms", None)
    man_path.write_text(_json.dumps(man))

    r = _cli(env, "--search", "strcpy", "--results", "3")
    assert r.returncode == 0, r.stderr
    assert "1. Score: " in r.stdout

    # previous on-disk format (fmt tag mismatch) must also fall back
    man = _json.loads(man_path.read_text())
    man["stages"]["blocks"] = {"status": "done", "fingerprint": "x#fmt3-dl"}
    man["stages"]["terms"] = {"status": "done", "fingerprint": "x#fmt3-dl"}
    man_path.write_text(_json.dumps(man))
    r = _cli(env, "--search", "strcpy", "--results", "3")
    assert r.returncode == 0, r.stderr


def test_ingest_pattern_filter(spark, corpus_dir):
    """bids-scan --pattern analogue (scan.py:89-111): the filename glob
    restricts the mass scan before any content sniffing."""
    all_docs = ingest_directory(spark, corpus_dir).count()
    only_bin0x = ingest_directory(spark, corpus_dir, pattern="bin0*.json").count()
    assert 0 < only_bin0x < all_docs
    none = ingest_directory(spark, corpus_dir, pattern="nope-*.json")
    assert none is None


def test_cli_version_flag():
    """-V/--version mirrors the reference (search.py:76): print and
    exit 0, no Spark session."""
    from bids_spark import __version__

    r = _cli(dict(os.environ, PYTHONPATH=REPO), "--version")
    assert r.returncode == 0
    assert __version__ in r.stdout


@pytest.mark.slow
def test_cli_debug_trace(tmp_path, spark):
    """--debug mirrors the reference trace surfaces (index.py:34,
    170-176): dataset location line, per-candidate 'Add element.' /
    'Already found:' dedup decisions."""
    src = str(tmp_path / "dup_docs")
    spark.createDataFrame(
        [(1, "shared duplicate text body"),
         (2, "shared duplicate text body"),
         (3, "unique other body")],
        "doc_id long, text string",
    ).write.parquet(src)
    env = dict(os.environ,
               BIDS_DATASET=str(tmp_path / "ds"),
               BIDS_SPARK_CLI_CORES="4",
               PYTHONPATH=REPO)
    assert _cli(env, "--initialise").returncode == 0
    r = _cli(env, "--index-parquet", src, "--debug")
    assert r.returncode == 0, r.stderr
    assert f"Dataset location: {env['BIDS_DATASET']}" in r.stdout

    r = _cli(env, "--search", "duplicate", "--debug")
    assert r.returncode == 0, r.stderr
    assert "1 Add element." in r.stdout
    assert "Already found: doc_id=" in r.stdout
    # without --debug the trace is silent
    r = _cli(env, "--search", "duplicate")
    assert "Add element." not in r.stdout
