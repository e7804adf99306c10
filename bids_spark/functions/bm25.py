"""Exact Okapi BM25 (k1=1.2, b=0.75) as pure column arithmetic.

The reference scores via tantivy's BM25 (invoked at
/root/reference/bids/index.py:155; parameters are the tantivy/Lucene
defaults, observable scores at /root/reference/README.md:335-355).
tantivy quantizes doc length to 1 byte; per the north star we compute
the *exact* formula with exact doc lengths — documented deviation
(SURVEY.md §4 scoring-oracle note).

    idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))
    score(t, d) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

All in float64; both Spark and the DuckDB oracle evaluate the same
expression tree, so scores agree bit-for-bit up to libm ulps (tests
use rel-tol 1e-6 and the driver compare rounds to 6 dp).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bids_spark import B, K1


def idf_expr(df_col: Column, n_docs: Column) -> Column:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — Lucene/tantivy BM25 idf."""
    return F.log1p(
        (n_docs.cast("double") - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def bm25_term_score(
    tf: Column, dl: Column, avgdl: Column, idf: Column, k1: float = K1, b: float = B
) -> Column:
    tf_d = tf.cast("double")
    norm = tf_d + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * dl.cast("double") / avgdl
    )
    return idf * tf_d * F.lit(k1 + 1.0) / norm


# SQL fragments for the DuckDB oracle — same expression tree, textual form.
IDF_SQL = "ln(1 + (CAST({n} AS DOUBLE) - {df} + 0.5) / ({df} + 0.5))"
TERM_SCORE_SQL = (
    "({idf}) * CAST({tf} AS DOUBLE) * 2.2 / "
    "(CAST({tf} AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST({dl} AS DOUBLE) / {avgdl}))"
)
