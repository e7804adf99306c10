r"""Web-corpus cleaning operators for a training-data pipeline.

Standard companions of a web-scale crawl→index pipeline (the reference
indexes whatever the scanner feeds it — `bids/scan.py:89-111` — with no
corpus hygiene; these supply the hygiene layer a webtext corpus needs
before indexing, following the published Gopher/C4 recipes):

- repetition_stats:    per-doc repetitiousness (top-bigram/-trigram
                       fraction, duplicate-line fraction) — the Gopher
                       repetition filters
- boilerplate_lines:   corpus-level duplicated-line dictionary (the
                       C4 "remove lines seen in ≥N documents" pass)
- remove_boilerplate:  per-doc cleaned text after dropping boilerplate
                       lines, order-preserving
- source_stats:        per-source (domain analogue) corpus profile
- filter_decision:     the composite keep/drop gate over the signals
                       above (auditable reason list)

The synthetic corpus has no newlines, so a "line" is derived
deterministically: the token stream reflowed into fixed LINE_TOKENS-
token chunks (space-joined).  The derivation is pure column algebra,
identical in Spark and DuckDB, so every operator here is
oracle-checkable.  On a real crawl, swap `_reflow_lines` for
`F.split(text, '\n')` — everything downstream is unchanged.

Scale notes (100 TB):
- repetition_stats: two explode→groupBy(doc_id, gram) partial-agg
  passes + one join on doc_id; no driver-side state, no UDFs.
- boilerplate: one groupBy(line) (postings-shaped), one anti-join on
  line, one groupBy(doc_id) re-assembly bounded by doc length.  The
  boilerplate dictionary is NOT broadcast (it can be huge on a real
  crawl) — the anti-join shuffles on `line`, which AQE can convert to
  broadcast when it happens to be small.
- dup_line_frac is computed with array_distinct inside the row —
  zero-shuffle, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bids_spark.functions.text import tokenize_text

LINE_TOKENS = 3  # tokens per derived line (see module docstring)
ABSENT = 2**31  # sentinel for "no lines"


def _reflow_lines(text_col: str, n: int = LINE_TOKENS) -> Column:
    """Deterministic line derivation: token stream reflowed into
    n-token space-joined chunks.  `sequence(1, 0)` would count DOWN in
    Spark, so the empty-doc case is guarded explicitly."""
    toks = tokenize_text(text_col)
    n_lines = F.floor((F.size(toks) + (n - 1)) / F.lit(n)).cast("int")
    seq = F.when(F.size(toks) > 0, F.sequence(F.lit(1), n_lines)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        seq,
        lambda p: F.array_join(
            F.slice(toks, (p - F.lit(1)) * F.lit(n) + F.lit(1), n), " "
        ),
    )


def _sliding_grams(toks: Column, n: int) -> Column:
    """Sliding word n-grams as space-joined strings ([] when < n tokens)."""
    cnt = F.size(toks) - F.lit(n - 1)
    seq = F.when(cnt > 0, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(seq, lambda p: F.array_join(F.slice(toks, p, n), " "))


def _top_gram_frac(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """doc_id → (occurrences of the most frequent n-gram) / (total
    n-grams).  Distributed mode-finding: explode → two-stage partial
    agg; never materializes per-doc maps on the driver."""
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_sliding_grams(tokenize_text(text_col), n)).alias("gram"),
    )
    per_gram = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return per_gram.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c")).alias("frac")
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition features per document:

    - top_bigram_frac / top_trigram_frac: share of the doc's word
      2-/3-grams taken by its single most frequent one (high ⇒
      templated/spammy text),
    - dup_line_frac: fraction of the doc's derived lines that are
      repeats of an earlier line in the same doc.

    Docs with no grams/lines report 0.0 (nothing repeats in nothing).
    """
    lines = _reflow_lines(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(
            F.size(lines) > 0,
            (F.size(lines) - F.size(F.array_distinct(lines))).cast("double")
            / F.size(lines),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
    )
    bg = _top_gram_frac(docs, id_col, text_col, 2)
    tg = _top_gram_frac(docs, id_col, text_col, 3)
    return (
        base.join(bg.withColumnRenamed("frac", "bf"), "doc_id", "left")
        .join(tg.withColumnRenamed("frac", "tf_"), "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce(F.col("bf"), F.lit(0.0)), 6).alias("top_bigram_frac"),
            F.round(F.coalesce(F.col("tf_"), F.lit(0.0)), 6).alias(
                "top_trigram_frac"
            ),
            F.round("dup_line_frac", 6).alias("dup_line_frac"),
        )
    )


def _doc_lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, line) — positions keep re-assembly order-exact."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_reflow_lines(text_col)).alias("pos", "line"),
    )


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Corpus-level boilerplate dictionary: every derived line that
    appears in ≥ min_docs distinct documents, with its document
    frequency and total occurrence count.  One postings-shaped
    groupBy(line) — the same shuffle profile as the index build."""
    lines = _doc_lines(docs, id_col, text_col)
    return (
        lines.groupBy("line")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """C4-style cleaning: drop every line that occurs in ≥ min_docs
    distinct docs; re-assemble the survivors in original order.

    Returns (doc_id, n_lines, n_kept, clean_sha) — the sha256 of the
    cleaned text stands in for shipping the text itself through the
    oracle compare.  The boilerplate set is anti-joined (shuffle on
    `line`), never collected or broadcast by hand: at crawl scale it
    is data-sized, and AQE will still broadcast it when it is small.
    """
    lines = _doc_lines(docs, id_col, text_col)
    boiler = boilerplate_lines(docs, id_col, text_col, min_docs).select("line")
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.sha2(F.coalesce("clean_text", F.lit("")), 256).alias("clean_sha"),
        )
    )


def source_stats(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus profile (the per-domain triage table of a web
    crawl): doc count, total/average size, language spread.  Single
    partial-aggregated groupBy — the cheapest possible shape."""
    toks = tokenize_text(text_col)
    return docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        F.round(F.avg(F.size(toks)), 6).alias("avg_tokens"),
        F.countDistinct(lang_col).cast("long").alias("n_langs"),
    )


def snippet_exprs(
    terms: list[str],
    text_col: str = "text",
    width: int = 80,
    context: int = 20,
) -> tuple[Column, Column, Column]:
    """(pos, matched_term, snippet) column expressions — pos==ABSENT
    when no term occurs.  Exposed separately so callers holding an
    expensive DataFrame (e.g. a search result join) can append the
    columns in ONE select instead of re-executing their subtree
    through a snippets() self-join."""
    if not terms:
        raise ValueError("snippet_exprs() needs at least one term")
    low = F.lower(F.col(text_col))
    pos_cols = [
        F.when(F.locate(t.lower(), low) > 0, F.locate(t.lower(), low))
        .otherwise(F.lit(ABSENT))
        for t in terms
    ]
    best = pos_cols[0] if len(terms) == 1 else F.least(*pos_cols)
    matched = F.lit(terms[-1])
    for t, p in reversed(list(zip(terms[:-1], pos_cols[:-1]))):
        matched = F.when(p == best, F.lit(t)).otherwise(matched)
    start = F.greatest(best - F.lit(context), F.lit(1))
    snippet = F.substring(F.col(text_col), start, width)
    return best.cast("long"), matched, snippet


def snippets(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 80,
    context: int = 20,
) -> DataFrame:
    """Deterministic search-result snippet (reference UI highlight,
    `bids/ui/results.py:325-344`, re-expressed as an engine operator):
    the `width`-char window starting `context` chars before the
    EARLIEST occurrence of any query term (case-insensitive; ties →
    first term in query order).  Docs matching no term are dropped.

    Pure column expressions (locate/substring) — codegen end-to-end;
    at scale this runs over the ≤k hit rows joined back to stored
    fields, so cost is negligible."""
    pos, matched, snippet = snippet_exprs(terms, text_col, width, context)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        pos.alias("pos"),
        matched.alias("matched_term"),
        snippet.alias("snippet"),
    ).where(F.col("pos") < ABSENT)


def filter_decision(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.5,
    max_punct_ratio: float = 0.5,
) -> DataFrame:
    """The pipeline's gating step: one keep/drop decision per document
    from the hygiene signals (Gopher-style composite).  Reasons are a
    deterministic comma-joined list in fixed check order, so the
    decision is auditable and the whole op stays oracle-checkable.

    Composition note: reuses repetition_stats (2 shuffles) + the
    row-local token/punct exprs; the join is on doc_id.  At crawl
    scale this is the same cost profile as repetition_stats itself.
    """
    from bids_spark.operators.textstats import quality_score, token_count

    rep = repetition_stats(docs, id_col, text_col)
    tok = token_count(docs, id_col, text_col).select("doc_id", "n_tokens")
    qua = quality_score(docs, id_col, text_col).select("doc_id", "punct_ratio")
    j = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(tok, "doc_id")
        .join(qua, "doc_id")
        .join(rep, "doc_id")
    )
    checks = [
        ("too_short", F.col("n_tokens") < min_tokens),
        ("dup_lines", F.col("dup_line_frac") > max_dup_line_frac),
        ("repetitive", F.col("top_bigram_frac") > max_top_bigram_frac),
        ("punct_soup", F.col("punct_ratio") > max_punct_ratio),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(tag)) for tag, cond in checks]
    )
    keep = ~checks[0][1]
    for _tag, cond in checks[1:]:
        keep = keep & ~cond
    return j.select(
        "doc_id", keep.alias("keep"), reasons.alias("reasons")
    )
