"""Driver-contract implementations: Spark queries + DuckDB oracle SQL.

Every operator slice exposed in ``__spark_entry__.queries()`` is defined
here next to its DuckDB oracle so the pair stays in sync.  Column names
and types are aliased/cast identically on both sides (the driver's
compare hashes values after sorting columns by name).

Floats: every float output column is rounded to 6 dp on both sides —
Spark and DuckDB evaluate the same expression tree in float64, so the
pre-round values agree to ulps; rounding makes the hash comparison
robust.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bids_spark.functions.text import TOKEN_SPLIT_RE  # noqa: F401 (doc parity)
from bids_spark.operators import index_build as ib
from bids_spark.plans.planner import SearchEngine
from bids_spark.sources.corpus import load_documents

# ---------------------------------------------------------------------------
# shared DuckDB CTE skeleton (tokenizer contract in SQL form)
# ---------------------------------------------------------------------------

_TOK_CTES = r"""
raw AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')) AS term
  FROM documents
),
tok AS (
  SELECT doc_id, term FROM raw WHERE term <> '' AND length(term) <= 40
),
dl AS (
  SELECT r.doc_id, count(t.term) AS dl
  FROM (SELECT DISTINCT doc_id FROM documents) r
  LEFT JOIN tok t USING (doc_id)
  GROUP BY r.doc_id
),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
post AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY term, doc_id
),
tstat AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY term)
"""

_BM25_SCORE_SQL = (
    "ln(1 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5))"
    " * p.tf * 2.2 / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))"
)


def _values(terms: list[str]) -> str:
    inner = ", ".join("('" + t.replace("'", "''") + "')" for t in terms)
    return f"(VALUES {inner})"


def bm25_topk_sql(
    should: list[str] | None = None,
    must: list[str] | None = None,
    must_not: list[str] | None = None,
    k: int = 10,
) -> str:
    """DuckDB SQL mirroring SearchEngine's Bool evaluation for flat
    term queries (no nesting — enough for the committed query set)."""
    should, must, must_not = should or [], must or [], must_not or []
    pos_terms = must + should
    assert pos_terms, "pure-negative query has no SQL oracle (matches nothing)"
    having = ""
    if must:
        # every must term present: count matched must terms == len(set(must))
        having = (
            f"HAVING count(DISTINCT CASE WHEN q.is_must THEN p.term END)"
            f" = {len(set(must))}"
        )
    qvals = ", ".join(
        "('" + t.replace("'", "''") + f"', {str(bool(is_m)).lower()})"
        for t, is_m in [(t, True) for t in must] + [(t, False) for t in should]
    )
    not_clause = ""
    if must_not:
        not_clause = (
            "AND p.doc_id NOT IN "
            f"(SELECT doc_id FROM post WHERE term IN "
            f"({', '.join(chr(39) + t.replace(chr(39), chr(39) * 2) + chr(39) for t in must_not)}))"
        )
    return f"""
WITH {_TOK_CTES},
qterms(term, is_must) AS (VALUES {qvals}),
scored AS (
  SELECT p.doc_id, SUM({_BM25_SCORE_SQL}) AS score
  FROM post p
  JOIN qterms q ON p.term = q.term
  JOIN tstat ts ON p.term = ts.term
  JOIN dl d ON p.doc_id = d.doc_id
  CROSS JOIN stats s
  WHERE true {not_clause}
  GROUP BY p.doc_id
  {having}
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Spark-side query callables (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------


def q_tokenize_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    return ib.postings(docs).select(
        "doc_id", "term", F.col("tf").cast("long").alias("tf")
    )


def q_doclens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    return ib.doclens(docs).select("doc_id", F.col("dl").cast("long").alias("dl"))


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    return ib.corpus_stats(docs).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("avgdl", 6).alias("avgdl"),
    )


def q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    n = docs.count()
    return ib.term_stats(ib.postings(docs), n).select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.round("idf", 6).alias("idf"),
    )


def _search(spark: SparkSession, sf_dir: str, query: str, k: int = 10) -> DataFrame:
    docs = load_documents(spark, sf_dir)
    eng = SearchEngine.from_documents(docs, cache=False)
    return eng.search(query, k).select(
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_bm25_single(spark, sf_dir):
    return _search(spark, sf_dir, "data")


def q_bm25_or(spark, sf_dir):
    return _search(spark, sf_dir, "merge join")


def q_bm25_and(spark, sf_dir):
    return _search(spark, sf_dir, "merge AND join")


def q_bm25_not(spark, sf_dir):
    return _search(spark, sf_dir, "merge -join")


def q_bm25_phrase(spark, sf_dir):
    return _search(spark, sf_dir, '"merge join"')


SQL_TOKENIZE_TF = f"""
WITH {_TOK_CTES}
SELECT doc_id, term, tf FROM post
"""

SQL_DOCLENS = f"""
WITH {_TOK_CTES}
SELECT doc_id, CAST(dl AS BIGINT) AS dl FROM dl
"""

SQL_CORPUS_STATS = f"""
WITH {_TOK_CTES}
SELECT CAST(n_docs AS BIGINT) AS n_docs, round(avgdl, 6) AS avgdl FROM stats
"""

SQL_TERM_STATS = f"""
WITH {_TOK_CTES}
SELECT ts.term, ts.df,
       round(ln(1 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5)), 6) AS idf
FROM tstat ts CROSS JOIN stats s
"""
