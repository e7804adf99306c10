"""The per-row ingest invariant (BASELINE.json input_hint): extracted
text is byte-identical per url across runs and parallelism levels —
the web-scale analogue of the reference's checksummed reproducible
extraction (/root/reference/bids/util.py:21-36).  The sha256 manifest
is committed (tests/golden/webpages_text_sha256.json)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bids_spark.sources.corpus import (
    extract_text,
    synth_webpages,
    text_sha256,
    with_doc_identity,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "webpages_text_sha256.json")


@pytest.fixture(scope="module")
def webpages(spark):
    return with_doc_identity(synth_webpages(spark, n_rows=500, seed=42)).cache()


def test_text_matches_committed_manifest(webpages):
    with open(GOLDEN) as f:
        manifest = json.load(f)
    got = {r["url"]: text_sha256(r["text"])
           for r in webpages.select("url", "text").collect()}
    assert got == manifest


def test_invariant_across_parallelism(spark, webpages):
    """Same extraction at a different partitioning → identical bytes."""
    wp8 = with_doc_identity(
        synth_webpages(spark, n_rows=500, seed=42).repartition(8)
    )
    a = {r["url"]: text_sha256(r["text"])
         for r in wp8.select("url", "text").collect()}
    b = {r["url"]: text_sha256(r["text"])
         for r in webpages.select("url", "text").collect()}
    assert a == b


def test_url_dedup_keeps_latest(spark, webpages):
    # 505 raw rows (5 duplicate urls) → 500 after dedup, latest crawl kept
    raw = synth_webpages(spark, n_rows=500, seed=42)
    assert raw.count() == 505
    assert webpages.count() == 500
    # the duplicated urls kept the LATER warc_ts
    dup_urls = [f"https://example.org/page/{i:06d}" for i in range(5)]
    kept = {r["url"]: r["warc_ts"]
            for r in webpages.filter(F.col("url").isin(dup_urls)).collect()}
    maxes = (
        raw.filter(F.col("url").isin(dup_urls))
        .groupBy("url").agg(F.max("warc_ts").alias("m")).collect()
    )
    for r in maxes:
        assert kept[r["url"]] == r["m"]


def test_doc_id_is_xxhash64_of_url(webpages):
    row = webpages.select("url", "doc_id").first()
    # deterministic identity, not the reference's salted hash()
    again = webpages.filter(F.col("url") == row["url"]).first()
    assert again["doc_id"] == row["doc_id"]


def test_expr_extractor_equals_python_twin_on_corpus(spark):
    """The vectorized column-expression extractor (the ingest hot
    path) is byte-identical to the Python state-machine twin over the
    whole synth corpus — including the edge-case rows (empty docs,
    >40-char tokens, punctuation-glued tokens, duplicate urls)."""
    from bids_spark.sources.corpus import extract_text_expr, extract_text_udf

    raw = synth_webpages(spark, n_rows=300, seed=7).select("url", "html")
    both = raw.select(
        "url",
        extract_text_expr(F.col("html")).alias("a"),
        extract_text_udf(F.col("html")).alias("b"),
    ).collect()
    assert both and all(r["a"] == r["b"] for r in both)


def test_expr_extractor_equals_python_twin_on_crafted_html(spark):
    """Script/style stripping, attributes in close tags, unclosed
    blocks, unterminated tags, unicode whitespace — the well-formed
    contract surface, both implementations in lockstep."""
    from bids_spark.sources.corpus import extract_text, extract_text_expr

    cases = [
        b"<html><body>plain text</body></html>",
        b"<p>a</p><script>var x='NO';</script><p>b</p>",
        b"<STYLE type='text/css'>.x{}</STYLE>visible",
        b"< script >hidden</ script >after",
        b"<script a='b'>x</script \t>tail",
        b"a<script>never closed",
        b"trailing unterminated <tag",
        b"no tags at all",
        b"",
        "unicode    spaces".encode(),
        b"<b>bold</b> and <i>italic</i> text!",
        b"<script>one</script>mid<style>two</style>end",
    ]
    pdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, html binary"
    )
    got = {
        r["i"]: r["t"]
        for r in pdf.select(
            "i", extract_text_expr(F.col("html")).alias("t")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == extract_text(c), f"case {i}: {c!r}"


def test_extractor_strips_tags_and_scripts():
    html = (b"<html><head><title>T</title>"
            b"<script>var x = 'NOSHOW';</script>"
            b"<style>.c { color: red }</style></head>"
            b"<body>Hello <b>World</b>!</body></html>")
    out = extract_text(html)
    assert "NOSHOW" not in out and "color" not in out
    assert "Hello World !" in out or "Hello World!" in out
    # pure function: byte-identical on repeat
    assert extract_text(html) == out
