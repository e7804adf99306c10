r"""Text-analysis operators for a training-data pipeline.

These have no direct reference counterpart (SURVEY.md §2E) but are the
standard companions of a web-scale index build (quality filtering and
doc fingerprinting before indexing); all are pure column expressions —
whole-stage codegen, no Python on the hot path — and each is DuckDB-
oracle-checkable.

- token_count:   tokenizer tokens + whitespace tokens per doc
- quality_score: length / punctuation-ratio / stopword-ratio /
                 mean-token-length composite (heuristic quality filter)
- lang_id:       stopword-profile argmax over {en, de, fr, es}
                 (char-n-gram scoring would need real multilingual
                 text; the synthetic corpus shares one vocabulary, so
                 the heuristic is the honest testable variant)
- fingerprint:   position-weighted polynomial hash of the token stream
                 mod a prime — order-sensitive, overflow-free in int64,
                 identical arithmetic in Spark and DuckDB
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bids_spark.functions.text import tokenize_text

FP_PRIME = 1_000_000_007

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
}


# BPE-style pre-tokenization classes (letters / digits / punct runs),
# lookahead-free so Java regex (Spark) and RE2 (DuckDB) agree exactly —
# approximates a GPT-2-style byte-pair pre-split for token budgeting
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Per-doc token budgets under three tokenizers: the index
    tokenizer, whitespace, and a BPE-ish pre-split (the count an LLM
    data pipeline budgets against)."""
    toks = tokenize_text(text_col)
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0)
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_RE))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        bpe.cast("long").alias("n_bpe_ish"),
    )


def token_count_bpe(
    docs: DataFrame,
    merges_path: str | None = None,
    id_col="doc_id",
    text_col="text",
) -> DataFrame:
    """Per-doc REAL BPE token budget: merge-loop count against a
    GPT-2-style merges table (functions/bpe.py; committed fixture by
    default, or any published merges file).  Arrow-batched pandas UDF
    with a per-batch word memo — the merges dict is driver-loaded and
    ships in the closure (a few KB).  `n_bpe_ish` in token_count stays
    as the zero-Python column-expr estimate."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from bids_spark.functions.bpe import DEFAULT_MERGES, count_tokens_str, load_merges

    ranks = load_merges(merges_path or DEFAULT_MERGES)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bpe_tokens", T.LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bpe_tokens": [
                        count_tokens_str(t or "", ranks, cache)
                        for t in pdf[text_col]
                    ],
                }
            )

    return docs.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(gen, schema)


def _stopword_ratio(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(words))) / F.greatest(
        F.size(toks), F.lit(1)
    )


def quality_score(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Heuristic quality features + composite score in [0, 1]."""
    toks = tokenize_text(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_alnum = F.length(F.regexp_replace(F.col(text_col), r"[^\p{L}\p{N}]", ""))
    punct_ratio = (n_chars - n_alnum).cast("double") / F.greatest(n_chars, F.lit(1))
    mean_tok_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    sw_ratio = _stopword_ratio(toks, STOPWORDS["en"])
    # composite: long enough, not punctuation soup, plausible word
    # lengths, some function words
    score = (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(2.0), F.lit(1.0))) * F.lit(0.3)
        + F.when((mean_tok_len >= 2.5) & (mean_tok_len <= 8.0), F.lit(0.2)).otherwise(
            F.lit(0.0)
        )
        + F.least(sw_ratio * F.lit(4.0), F.lit(1.0)) * F.lit(0.1)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Stopword-profile language ID: argmax ratio, tie→'und' ordering by
    fixed language order, 'und' (undetermined) when all ratios are 0."""
    toks = tokenize_text(text_col)
    ratios = {
        lang: _stopword_ratio(toks, words) for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*ratios.values())
    pred = F.lit("und")
    # first language (in fixed order) achieving the max wins
    for lang in reversed(list(STOPWORDS)):
        pred = F.when(ratios[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pred.alias("pred_lang"),
        F.round(best, 6).alias("lang_score"),
    )


def fingerprint(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Order-sensitive doc fingerprint:
        fp = Σ_pos (pos+1) · tokval(term)   (mod p)
    with tokval = length(t)·131 + ascii(first char).  Every summand is
    tiny, the int64 sum never overflows at any realistic doc length,
    and the formula is engine-agnostic (no platform hash)."""
    toks = tokenize_text(text_col)
    vals = F.transform(
        toks,
        lambda t, i: (i + F.lit(1)).cast("long")
        * (F.length(t).cast("long") * F.lit(131) + F.ascii(t)),
    )
    fp = F.aggregate(vals, F.lit(0).cast("long"), lambda a, x: a + x) % FP_PRIME
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fp"))
