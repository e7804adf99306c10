"""Semantic tests for the webtext hygiene operators (planted inputs).

The DuckDB-parity check for these ops runs via tools/check_contract.py
(driver gate); here we pin the *meaning*: planted boilerplate is
removed, repetition scores order as expected, snippets select the
earliest term.
"""

from __future__ import annotations

import hashlib

import pytest

from bids_spark.operators import webtext as wt

BOILER = "alpha beta gamma"  # one derived line (3 tokens)


@pytest.fixture(scope="module")
def planted_docs(spark):
    rows = [
        # 4 docs share the same leading 3-token line (boilerplate),
        # then diverge — doc 4/5 are clean
        (0, f"{BOILER} one two three four five six"),
        (1, f"{BOILER} seven eight nine ten eleven twelve"),
        (2, f"{BOILER} red green blue cyan magenta yellow"),
        (3, f"{BOILER} dog cat bird fish mouse horse"),
        (4, "unique words only here nothing shared at all ok"),
        (5, "spam spam spam spam spam spam"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_boilerplate_dictionary(planted_docs):
    rows = {r["line"]: r for r in wt.boilerplate_lines(planted_docs).collect()}
    assert BOILER in rows
    assert rows[BOILER]["n_docs"] == 4 and rows[BOILER]["n_occurrences"] == 4
    # nothing else crosses the min_docs=3 bar
    assert set(rows) == {BOILER}


def test_remove_boilerplate_strips_and_preserves_order(planted_docs):
    out = {r["doc_id"]: r for r in wt.remove_boilerplate(planted_docs).collect()}
    # doc 0: 9 tokens -> 3 lines, boilerplate line removed -> 2 kept
    assert out[0]["n_lines"] == 3 and out[0]["n_kept"] == 2
    expect = hashlib.sha256(b"one two three four five six").hexdigest()
    assert out[0]["clean_sha"] == expect
    # clean doc untouched (all lines kept, text reflow-joined)
    assert out[4]["n_lines"] == out[4]["n_kept"] == 3
    expect4 = hashlib.sha256(
        b"unique words only here nothing shared at all ok"
    ).hexdigest()
    assert out[4]["clean_sha"] == expect4
    # empty doc: zero lines, sha of empty string
    assert out[6]["n_lines"] == 0
    assert out[6]["clean_sha"] == hashlib.sha256(b"").hexdigest()


def test_repetition_stats_orders_spammy_doc(planted_docs):
    out = {r["doc_id"]: r for r in wt.repetition_stats(planted_docs).collect()}
    # "spam spam ..." -> every bigram identical, both lines identical
    assert out[5]["top_bigram_frac"] == 1.0
    assert out[5]["dup_line_frac"] == 0.5  # 2 lines, 1 distinct
    # clean doc: all bigrams distinct
    assert out[4]["top_bigram_frac"] < 0.2
    assert out[4]["dup_line_frac"] == 0.0
    # empty doc reports zeros, present in output
    assert out[6]["top_bigram_frac"] == 0.0 and out[6]["dup_line_frac"] == 0.0


def test_snippets_earliest_term_and_tie_order(spark):
    docs = spark.createDataFrame(
        [
            (0, "xx join yy merge zz"),  # join first
            (1, "Merge wins here join later"),  # case-insensitive, merge first
            (2, "nothing relevant at all"),  # dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in wt.snippets(docs, ["merge", "join"]).collect()}
    assert set(out) == {0, 1}
    assert out[0]["matched_term"] == "join" and out[0]["pos"] == 4
    assert out[1]["matched_term"] == "merge" and out[1]["pos"] == 1
    # snippet is a window of the ORIGINAL text around the hit
    assert "join" in out[0]["snippet"]


def test_snippets_window_bounds(spark):
    docs = spark.createDataFrame(
        [(0, "a" * 100 + " target " + "b" * 100)], "doc_id long, text string"
    )
    out = wt.snippets(docs, ["target"], width=20, context=5).collect()[0]
    assert out["pos"] == 102
    assert len(out["snippet"]) == 20
    # start = max(102 - 5, 1) = 97 → chars 97..100 are 'a', then " target"
    assert out["snippet"].startswith("aaaa target")


def test_source_stats_shape(spark):
    docs = spark.createDataFrame(
        [
            (0, "one two three", "en", "sA"),
            (1, "four five", "de", "sA"),
            (2, "six", "en", "sB"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["source"]: r for r in wt.source_stats(docs).collect()}
    assert out["sA"]["n_docs"] == 2 and out["sA"]["n_langs"] == 2
    assert out["sA"]["avg_tokens"] == 2.5
    assert out["sB"]["total_chars"] == 3


def test_boilerplate_conservation_on_corpus(spark, docs):
    """Corpus-level invariants on real data: every doc appears exactly
    once in remove_boilerplate; kept+removed line counts reconcile with
    the boilerplate dictionary's occurrence totals."""
    out = wt.remove_boilerplate(docs).collect()
    assert len(out) == docs.count()
    total_lines = sum(r["n_lines"] for r in out)
    total_kept = sum(r["n_kept"] for r in out)
    boiler_occ = sum(
        r["n_occurrences"] for r in wt.boilerplate_lines(docs).collect()
    )
    assert total_lines - total_kept == boiler_occ
    assert all(0 <= r["n_kept"] <= r["n_lines"] for r in out)


def test_filter_decision_semantics(spark):
    docs = spark.createDataFrame(
        [
            (0, "a clean document with plenty of distinct words in it ok"),
            (1, "tiny doc"),                              # too_short
            (2, "spam spam spam spam spam spam spam spam spam spam spam"),
            (3, "!!! ??? ... ;;; ::: --- +++ === ~~~ @@@ ### one two"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in wt.filter_decision(docs).collect()}
    assert out[0]["keep"] and out[0]["reasons"] == ""
    assert not out[1]["keep"] and "too_short" in out[1]["reasons"]
    assert not out[2]["keep"] and "repetitive" in out[2]["reasons"]
    assert "dup_lines" in out[2]["reasons"]  # identical 3-token lines
    assert not out[3]["keep"] and "punct_soup" in out[3]["reasons"]
