"""Real-BPE token budgeting (functions/bpe.py + textstats.token_count_bpe).

Platform-independent goldens stand in for a SQL oracle (the merge loop
is not reasonably SQL-expressible); the committed merges fixture is
regenerated deterministically by tools/train_bpe.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from bids_spark.functions.bpe import (
    DEFAULT_MERGES,
    bpe_word_tokens,
    count_tokens_str,
    load_merges,
)
from bids_spark.operators.textstats import token_count_bpe

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "bpe_counts_sf0001.json"
)
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_merge_loop_applies_ranks_in_order():
    # lower rank merges first: (l,o) before (lo,w); EOW pair last
    ranks = {("l", "o"): 0, ("lo", "w"): 1, ("low", "</w>"): 2}
    assert bpe_word_tokens("low", ranks) == ["low</w>"]
    # unknown word: only the known prefix merges
    assert bpe_word_tokens("lower", ranks) == ["low", "e", "r", "</w>"]
    # no applicable merges: char-level + EOW
    assert bpe_word_tokens("xyz", {}) == ["x", "y", "z", "</w>"]


def test_count_tokens_str_presplit_and_cache():
    ranks = load_merges(DEFAULT_MERGES)
    cache: dict[str, int] = {}
    n1 = count_tokens_str("merge join merge", ranks, cache)
    assert "merge" in cache and "join" in cache
    # memo hit path returns identical totals
    assert count_tokens_str("merge join merge", ranks, {}) == n1
    # punctuation runs are their own pre-split class
    assert count_tokens_str("a.b", ranks) == count_tokens_str("a", ranks) + \
        count_tokens_str(".", ranks) + count_tokens_str("b", ranks)


def test_fixture_header_and_determinism():
    ranks = load_merges(DEFAULT_MERGES)
    assert len(ranks) == 200
    with open(DEFAULT_MERGES) as f:
        first = f.readline()
    assert first.startswith("#version")


def test_golden_counts(spark):
    with open(GOLDEN) as f:
        want = json.load(f)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 20
    )
    got = {
        str(r["doc_id"]): r["n_bpe_tokens"]
        for r in token_count_bpe(docs).collect()
    }
    assert got == want


def test_invariant_across_parallelism(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {r["doc_id"]: r["n_bpe_tokens"]
         for r in token_count_bpe(docs.repartition(1)).collect()}
    b = {r["doc_id"]: r["n_bpe_tokens"]
         for r in token_count_bpe(docs.repartition(7)).collect()}
    assert a == b and len(a) == docs.count()


def test_merges_only_reduce_counts(spark):
    """With an EMPTY merges table every word costs chars+1 symbols; the
    trained table can only merge — counts are bounded above by the
    unmerged count and below by the pre-split word count."""
    import re

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "text")
    )
    ranks = load_merges(DEFAULT_MERGES)
    presplit = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")
    for r in docs.collect():
        words = presplit.findall(r["text"].lower())
        unmerged = sum(len(w) + 1 for w in words)
        n = count_tokens_str(r["text"], ranks)
        assert len(words) <= n <= unmerged


def test_duckdb_recursive_cte_oracle_parity():
    """The driver gate's BPE oracle (contract.bpe_count_sql — merge
    passes as replace() over \\x02-encoded symbol strings, recursive
    CTE to fixpoint) must agree with the Python merge loop on every
    sf0.001 document AND on adversarial words (repeat runs where the
    non-overlap greedy matters, quotes, unicode)."""
    import duckdb

    from bids_spark.contract import bpe_count_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    ranks = load_merges(DEFAULT_MERGES)
    duck = dict(con.execute(bpe_count_sql()).fetchall())
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pydict()
    assert len(duck) == len(t["doc_id"])
    for d, txt in zip(t["doc_id"], t["text"]):
        assert duck[d] == count_tokens_str(txt, ranks), d

    con2 = duckdb.connect()
    con2.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    advers = [
        (1, "0000000 00 0"),        # (0,0) overlap runs — greedy l-t-r
        (2, "aaaa bbbb merge"),
        (3, "don't \"quote\" it's"),  # quote escaping in literals
        (4, ""),                     # empty text → 0
        (5, "   "),                  # whitespace only → 0
        (6, "the the the merge merge"),
        (7, "x" * 50),               # long run
    ]
    con2.executemany("INSERT INTO documents VALUES (?, ?)", advers)
    duck2 = dict(con2.execute(bpe_count_sql()).fetchall())
    for d, txt in advers:
        assert duck2[d] == count_tokens_str(txt, ranks), (d, txt)
