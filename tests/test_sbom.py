"""SBOM transform (operators/sbom.py) vs a Python mirror of the
reference's process_file walk (/root/reference/bids/sbom.py:146-240),
over the reference-shaped fixture corpus (sources/bids_docs.py)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from bids_spark.operators.sbom import (
    PROJECT_NAME,
    sbom_json,
    sbom_packages,
    sbom_relationships,
)
from bids_spark.sources.bids_docs import write_fixture_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _expected(doc_id: int, data: dict):
    """Python mirror of reference process_file: (packages, rels)."""
    b = data["metadata"]["binary"]
    app = (
        doc_id, b["filename"], "application", b.get("version"),
        b["filedate"], b["checksum"][0]["value"], 0,
        len(data["components"].get("localsymbols", [])),
    )
    pkgs = [app]
    rels = [(doc_id, PROJECT_NAME, "DESCRIBES", b["filename"])]
    seen = set()
    for lib in data["components"]["dynamiclibrary"]:
        if lib in seen:
            continue
        seen.add(lib)
        funcs = data["relationships"].get(lib, [])
        pkgs.append((doc_id, lib, "library", None, None, None,
                     len(funcs), 0))
        rels.append((doc_id, b["filename"], "DEPENDS_ON", lib))
    return pkgs, rels


@pytest.fixture(scope="module")
def fixture_docs(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bids_fixture"))
    write_fixture_corpus(d)
    rows = []
    for i, name in enumerate(sorted(os.listdir(d))):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rows.append((i, f.read()))
    return rows, spark.createDataFrame(rows, "doc_id bigint, text string")


def test_packages_match_reference_walk(fixture_docs):
    rows, df = fixture_docs
    want = []
    for doc_id, text in rows:
        data = json.loads(text)
        if data.get("metadata", {}).get("docFormat") != "BIDS":
            continue  # the non-BIDS JSON must be filtered
        want.extend(_expected(doc_id, data)[0])
    got = [
        (r["doc_id"], r["name"], r["ptype"], r["version"],
         r["release_date"], r["sha256"], r["n_functions"],
         r["n_localsymbols"])
        for r in sbom_packages(df).collect()
    ]
    assert sorted(got) == sorted(want)


def test_relationships_match_reference_walk(fixture_docs):
    rows, df = fixture_docs
    want = []
    for doc_id, text in rows:
        data = json.loads(text)
        if data.get("metadata", {}).get("docFormat") != "BIDS":
            continue
        want.extend(_expected(doc_id, data)[1])
    got = [
        (r["doc_id"], r["source"], r["rel_type"], r["target"])
        for r in sbom_relationships(df).collect()
    ]
    assert sorted(got) == sorted(want)


def test_non_bids_json_dropped(spark):
    df = spark.createDataFrame(
        [(1, json.dumps({"bomFormat": "CycloneDX"})),
         (2, "not json at all"),
         (3, json.dumps({"metadata": {"docFormat": "BIDS", "binary": {
             "filename": "x", "filedate": "d",
             "checksum": [{"algorithm": "SHA256", "value": "v"}]}},
             "components": {"dynamiclibrary": [], "localsymbols": []},
             "relationships": {}}))],
        "doc_id bigint, text string",
    )
    got = sbom_packages(df).collect()
    assert [(r["doc_id"], r["name"]) for r in got] == [(3, "x")]


def test_sbom_json_deterministic(fixture_docs):
    _, df = fixture_docs
    a = {r["doc_id"]: r["sbom"] for r in sbom_json(df).collect()}
    b = {r["doc_id"]: r["sbom"] for r in sbom_json(df).collect()}
    assert a == b
    one = json.loads(next(iter(a.values())))
    assert set(one) == {"packages", "relationships"}
    assert one["relationships"][0]["rel_type"] in ("DESCRIBES",
                                                   "DEPENDS_ON")


@pytest.mark.slow
def test_cli_sbom_e2e(tmp_path, spark):
    d = str(tmp_path / "corpus")
    write_fixture_corpus(d)
    env = dict(os.environ, BIDS_DATASET=str(tmp_path / "ds"),
               BIDS_SPARK_CLI_CORES="4", PYTHONPATH=REPO)

    def cli(*args):
        return subprocess.run(
            [sys.executable, "-m", "bids_spark.cli", *args],
            capture_output=True, text=True, env=env, cwd=REPO,
        )

    assert cli("--initialise").returncode == 0
    r = cli("--index", d)
    assert r.returncode == 0, r.stderr
    out = str(tmp_path / "sbom.jsonl")
    r = cli("--sbom", out)
    assert r.returncode == 0, r.stderr
    assert "application" in r.stdout
    lines = [json.loads(ln) for ln in open(out) if ln.strip()]
    # 20 BIDS docs + 1 duplicate-content copy are indexed (dedup is a
    # content policy at search time, not ingest); non-BIDS filtered
    assert len(lines) == 21
    for sb in lines:
        assert sb["packages"][0]["ptype"] in ("application", "library")
