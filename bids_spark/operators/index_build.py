r"""Inverted-index build — the correctness path (naive, uncompressed).

Reproduces what tantivy's writer does for BIDS
(/root/reference/bids/index.py:121-143 → tantivy SPIMI build; posting
data recorded per playground/bids_index/meta.json:29-31: term freqs +
positions + fieldnorms) as declarative DataFrame dataflow:

    documents --tokenize--> tokens --posexplode/groupBy--> postings(term, doc_id, tf)
                                  \--size()--> doclens(doc_id, dl)
                                  \--agg----> corpus_stats(n_docs, avgdl)
    postings --groupBy(term)--> term_stats(term, df, idf)

Catalyst handles the physics: the parquet scan prunes to (doc_id,
text), tokenization is whole-stage-codegen'd, groupBy does map-side
partial aggregation before the shuffle on (term, doc_id).

The scalable compressed path lives in blocked_index.py; the two must
produce rank-identical query results (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bids_spark.functions.bm25 import bm25_term_score, idf_expr
from bids_spark.functions.fields import URL_NS
from bids_spark.functions.text import tokenize_text


def namespace_url_terms(postings_df: DataFrame) -> DataFrame:
    """Map a url-field postings frame into the shared term space by
    prefixing every term with URL_NS (functions/fields.py) — the whole
    second-field design: url postings become ordinary rows of the SAME
    postings/blocks/dictionary tables, with dl carrying the URL token
    count (the field's own length normalization)."""
    return postings_df.withColumn(
        "term", F.concat(F.lit(URL_NS), F.col("term"))
    )


def tokens(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    with_dl: bool = False,
) -> DataFrame:
    """(doc_id, pos, term) — one row per token occurrence.

    with_dl=True also carries dl = size(tokens) per occurrence row
    (known for free BEFORE the explode): downstream postings then hold
    the exact doc length without ever joining the doclens table — at
    10^12 docs that join is a full shuffle of the postings relation,
    the single largest avoidable exchange in the build (dl ≡ Σtf over
    kept tokens, so the value is identical by construction)."""
    if not with_dl:
        return (
            docs.select(
                id_col, F.posexplode(tokenize_text(text_col)).alias("pos", "term")
            )
            .withColumnRenamed(id_col, "doc_id")
        )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), tokenize_text(text_col).alias("_toks")
        )
        .select(
            "doc_id",
            F.size("_toks").alias("dl"),
            F.posexplode("_toks").alias("pos", "term"),
        )
    )


def doclens(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dl) — exact token count per doc (tantivy fieldnorms,
    meta.json:30,43, but exact instead of 1-byte-quantized).

    NULL text counts as dl=0 (a doc with no value in the field has
    zero tokens in it) — NOT NULL/-1, which F.avg would skip/poison:
    under ansi.enabled=false Spark's legacy sizeOfNull makes
    F.size(NULL) return -1, silently corrupting avgdl."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(tokenize_text(text_col)))
        .alias("dl"),
    )


def corpus_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(n_docs, avgdl) — 1-row stats table. avgdl over ALL docs incl. empty."""
    return doclens(docs, id_col, text_col).agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )


def postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    with_dl: bool = False,
) -> DataFrame:
    """(term, doc_id, tf[, dl]) — the inverted index, uncompressed.
    with_dl carries the exact doc length per posting (see tokens())."""
    aggs = [F.count("*").alias("tf")]
    if with_dl:
        aggs.append(F.first("dl").alias("dl"))
    return (
        tokens(docs, id_col, text_col, with_dl=with_dl)
        .groupBy("term", "doc_id")
        .agg(*aggs)
    )


def postings_with_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    with_dl: bool = False,
) -> DataFrame:
    """(term, doc_id, tf, positions array<int>[, dl]) — phrase-capable
    postings (tantivy record:"position", meta.json:29,42). Positions
    sorted asc; with_dl carries the exact doc length (see tokens())."""
    aggs = [
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    ]
    if with_dl:
        aggs.append(F.first("dl").alias("dl"))
    return (
        tokens(docs, id_col, text_col, with_dl=with_dl)
        .groupBy("term", "doc_id")
        .agg(*aggs)
    )


def term_stats(postings_df: DataFrame, n_docs) -> DataFrame:
    """(term, df, idf). `n_docs` may be a literal int or a Column."""
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    return postings_df.groupBy("term").agg(F.count("*").alias("df")).select(
        "term", "df", idf_expr(F.col("df"), n).alias("idf")
    )


def scored_postings(
    postings_df: DataFrame, doclens_df: DataFrame, stats_df: DataFrame
) -> DataFrame:
    """(term, doc_id, tf, score) — per-posting exact BM25 impact score.

    Precomputing impacts at build time is what makes query-time scoring
    a filter + sum (impact-ordered-index technique); df/idf are global
    so this runs after the full postings exist.

    Plan shape at scale: postings⋈doclens is a shuffle join on doc_id
    (both huge — sort-merge, AQE may pick shuffle-hash); stats (1 row)
    is broadcast; postings⋈term_stats shuffles on term where postings
    are already hash-partitioned from their groupBy, so the exchange is
    reusable — vocab can be too big to broadcast at 10^12 docs.
    """
    n_docs_row = stats_df.select("n_docs").first()
    ts = term_stats(postings_df, int(n_docs_row["n_docs"]))
    return (
        postings_df.join(doclens_df, "doc_id")
        .join(ts, "term")
        .crossJoin(F.broadcast(stats_df.select("avgdl")))
        .select(
            "term",
            "doc_id",
            "tf",
            bm25_term_score(
                F.col("tf"), F.col("dl"), F.col("avgdl"), F.col("idf")
            ).alias("score"),
        )
    )
