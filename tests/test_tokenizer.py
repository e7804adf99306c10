"""Tokenizer contract tests: Spark expression == driver-side Python ==
DuckDB SQL, including the tantivy `default` rules (lowercase, Unicode
non-alphanumeric split, drop >40 chars)."""

from __future__ import annotations

import duckdb
import pytest

from bids_spark.functions.text import tokenize_query, tokenize_text

CASES = [
    "Hello, World!",
    "foo_bar-baz.qux",
    "  leading and trailing  ",
    "",
    "UPPER lower MiXeD",
    "x" * 40,
    "y" * 41,
    "a1b2 3c4d über café 北京",
    'quotes "inside" and (parens) + - AND OR',
    "tab\tsep\nnewline",
]


@pytest.fixture(scope="module")
def spark_tokens(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], ["i", "text"])
    rows = df.select("i", tokenize_text("text").alias("toks")).collect()
    return {r["i"]: list(r["toks"]) for r in rows}


def test_spark_matches_python(spark_tokens):
    for i, s in enumerate(CASES):
        assert spark_tokens[i] == tokenize_query(s), f"case {i}: {s!r}"


def test_duckdb_matches_python():
    con = duckdb.connect()
    for s in CASES:
        got = con.execute(
            r"""
            SELECT list_filter(
              regexp_split_to_array(lower(?), '[^\p{L}\p{N}]+'),
              t -> t <> '' AND length(t) <= 40)
            """,
            [s],
        ).fetchone()[0]
        assert list(got) == tokenize_query(s), repr(s)


def test_rules():
    assert tokenize_query("y" * 41) == []  # >40 dropped
    assert tokenize_query("x" * 40) == ["x" * 40]  # ==40 kept
    assert tokenize_query("Foo_bar") == ["foo", "bar"]  # _ is a separator
    assert tokenize_query("a.b,c;d") == ["a", "b", "c", "d"]
    assert tokenize_query("") == []
