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
    exclude_pred: str | None = None,
    docs_where: str | None = None,
    boosts: dict[str, float] | None = None,
    score_plus: float = 0.0,
    range_pred: str | None = None,
) -> str:
    """DuckDB SQL mirroring SearchEngine's Bool evaluation for flat
    term queries (no nesting — enough for the committed query set).

    exclude_pred: optional SQL predicate over p.doc_id marking DELETED
    docs — they are dropped from the candidate set only, while df /
    n_docs / avgdl still count them (Lucene tombstone semantics before
    a merge; segments.SegmentedIndex.delete_docs).

    docs_where: optional SQL predicate over the documents table that
    restricts the WHOLE corpus — df / n_docs / avgdl are recomputed
    over the survivors (post-compaction semantics: compact() PURGES
    tombstoned rows and recomputes stats, unlike the pre-merge
    exclude_pred view).

    boosts: per-term score multipliers (`term^2`, tantivy BoostQuery).
    score_plus: constant added to every matching doc's score (a
    must-Range/All clause contributes 1.0 × its boost).
    range_pred: SQL predicate over p.doc_id restricting matches to a
    must-range (`doc_id:[lo TO hi]`)."""
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
    if boosts is None:
        qvals = ", ".join(
            "('" + t.replace("'", "''") + f"', {str(bool(is_m)).lower()})"
            for t, is_m in
            [(t, True) for t in must] + [(t, False) for t in should]
        )
    else:
        qvals = ", ".join(
            "('" + t.replace("'", "''")
            + f"', {str(bool(is_m)).lower()}, {float(boosts.get(t, 1.0))!r})"
            for t, is_m in
            [(t, True) for t in must] + [(t, False) for t in should]
        )
    not_clause = ""
    if must_not:
        not_clause = (
            "AND p.doc_id NOT IN "
            f"(SELECT doc_id FROM post WHERE term IN "
            f"({', '.join(chr(39) + t.replace(chr(39), chr(39) * 2) + chr(39) for t in must_not)}))"
        )
    if exclude_pred:
        not_clause += f" AND NOT ({exclude_pred})"
    ctes = _TOK_CTES
    if docs_where:
        # rebase every CTE on the filtered corpus: df/N/avgdl all
        # recompute over the survivors (compaction purge semantics)
        ctes = ctes.replace(
            "FROM documents",
            f"FROM (SELECT * FROM documents WHERE {docs_where}) documents",
        )
    qcols = "term, is_must" if boosts is None else "term, is_must, boost"
    score_expr = (
        f"SUM({_BM25_SCORE_SQL})"
        if boosts is None
        else f"SUM(({_BM25_SCORE_SQL}) * q.boost)"
    )
    if score_plus:
        score_expr = f"{score_expr} + {float(score_plus)!r}"
    if range_pred:
        not_clause += f" AND ({range_pred})"
    return f"""
WITH {ctes},
qterms({qcols}) AS (VALUES {qvals}),
scored AS (
  SELECT p.doc_id, {score_expr} AS score
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


# ---- blocked (compressed, block-max pruned) path against the SAME
# DuckDB oracles — certifies the scale path, not just the naive one.
# The index builds once per sf_dir into a stable temp dir; the build is
# resumable (manifest fingerprint), so repeat driver runs skip it.

_BLOCKED_CACHE: dict[str, object] = {}


def _content_fp(sf_dir: str, table: str = "documents") -> str:
    """Cheap content fingerprint of an input parquet (file names,
    sizes, mtimes) — so a replaced input with the SAME row count still
    invalidates cached index dirs (stale-serve guard)."""
    import hashlib
    import os

    p = os.path.join(sf_dir, f"{table}.parquet")
    parts = []
    if os.path.isdir(p):
        for root, _dirs, files in os.walk(p):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(p):
        st = os.stat(p)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def _blocked_index(spark: SparkSession, sf_dir: str):
    import hashlib
    import os
    import tempfile

    from bids_spark.operators.blocked_index import BlockedIndex

    key = sf_dir.rstrip("/") + "@" + _content_fp(sf_dir)
    bi = _BLOCKED_CACHE.get(key)
    if bi is None:
        d = os.path.join(
            tempfile.gettempdir(),
            "bids_contract_idx_" + hashlib.md5(key.encode()).hexdigest()[:10],
        )
        bi = BlockedIndex(d)
        # url_field: the reference's second indexed text field
        # (file_path → url, bids/index.py:49-52) derived as
        # source '/' lang — a deterministic multi-token url analogue
        # BOTH sides can compute (DuckDB tokenizes the same concat),
        # so url PHRASES sit under the oracle too.  Content rows are
        # unaffected (content postings/doclens/stats untouched by the
        # namespace — regression-tested in tests/test_url_field.py);
        # the url rows below query the same shared index.
        bi.build(
            load_documents(spark, sf_dir).withColumn(
                "_url", F.concat_ws("/", F.col("source"), F.col("lang"))
            ),
            fingerprint=f"contract-{key}",
            with_positions=True,
            url_field=True,
            url_col="_url",
        )
        _BLOCKED_CACHE[key] = bi
    return bi


def _search_blocked(
    spark: SparkSession, sf_dir: str, query: str, k: int = 10,
    theta_mode: str = "dict", force_aligned: bool = False,
) -> DataFrame:
    from bids_spark.operators.wand import BlockedSearchEngine

    eng = BlockedSearchEngine(spark, _blocked_index(spark, sf_dir))
    if force_aligned:
        # the aligned bound auto-engages only above OM_MIN_BLOCKS —
        # force it at oracle scale so the cm metadata job + literal-
        # array filter sit under the DuckDB oracle every round
        eng.OM_MIN_BLOCKS = 0
    return eng.search(query, k, theta_mode=theta_mode).select(
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_bm25_or_blocked(spark, sf_dir):
    return _search_blocked(spark, sf_dir, "merge join")


def q_bm25_or_aligned(spark, sf_dir):
    """Same OR query with the range-aligned other-term bound FORCED on
    (wand.py Phase 3 "aligned"): the chunk-max metadata job and the
    literal-array pruning filter must not change results.  Same oracle
    as bm25_or."""
    return _search_blocked(spark, sf_dir, "merge join", force_aligned=True)


def q_bm25_and_prefilter(spark, sf_dir):
    """Same AND query with the intersection-bitmap restriction FORCED
    on (wand.py _bool_restriction: and-reduced per-chunk presence of
    the must terms prunes every term's blocks before decode).  Same
    oracle as bm25_and: the bitmap + interval-join restriction must
    not change results."""
    return _search_blocked(
        spark, sf_dir, "merge AND join", force_aligned=True
    )


def q_bm25_or_probe(spark, sf_dir):
    """Same OR query with theta_mode="probe": θ comes from decoding
    the top blocks per term instead of the dictionary constants — the
    cluster-scale default (tighter θ, fewer decoded blocks).  Same
    oracle as bm25_or: probe-θ must not change results."""
    return _search_blocked(spark, sf_dir, "merge join", theta_mode="probe")


def q_bm25_boost(spark, sf_dir):
    """Boosted flat OR (`data^2 merge`, tantivy `term^boost` via the
    reference's parse_query, bids/index.py:147) on the blocked pruned
    path with the aligned bound forced — per-term boosts scale every
    bound (gmax/cm UP-guarded, θ DOWN-guarded) and the decoded
    scores."""
    return _search_blocked(spark, sf_dir, "data^2 merge",
                           force_aligned=True)


def q_bm25_range(spark, sf_dir):
    """Range-restricted scoring (`data AND doc_id:[100 TO 300]`):
    tantivy RangeQuery on the indexed i64 doc_id fast field (reference
    bids/index.py:53-55) as a constant-score must clause — the blocked
    engine skips blocks whose doc interval can't overlap the range
    before decode (doc_id is the block sort key)."""
    return _search_blocked(spark, sf_dir, "data AND doc_id:[100 TO 300]")


def q_match_all(spark, sf_dir):
    """`*` (tantivy AllQuery): every live doc at constant score 1.0,
    tie-broken by doc_id — served from the doclens table (one row per
    indexed doc)."""
    return _search_blocked(spark, sf_dir, "*")


def q_bm25_url_or(spark, sf_dir):
    """Mixed-field flat OR (`data url:src3`): the reference schema's
    second indexed text field (file_path, bids/index.py:49-52) mapped
    to the documents table's `source` column — the url term scores
    with the URL field's own df/dl/avgdl (per-field BM25), the content
    term with the corpus stats, summed per doc on the shared pruned
    decode."""
    return _search_blocked(spark, sf_dir, "data url:src3")


def q_bm25_url_and(spark, sf_dir):
    """Cross-field conjunction (`data AND url:src3`): the must
    machinery (matched-count filter, intersection bitmap, rarest-term
    restriction) over terms from BOTH fields in one scan."""
    return _search_blocked(spark, sf_dir, "data AND url:src3")


def q_bm25_url_phrase(spark, sf_dir):
    """url-field PHRASE (`url:"src3 en"`): positional adjacency in the
    url token stream (tantivy records positions for file_path too —
    meta.json:25-31), scored with the url field's (dl, avgdl) via the
    fused dl-payload path.  The DuckDB oracle walks the same two
    per-term position lists derived from the url tokenization."""
    return _search_blocked(spark, sf_dir, 'url:"src3 en"')


def q_url_term_range(spark, sf_dir):
    """`url:[src0 TO src11]` — term-dictionary range on the url field
    (tantivy RangeQuery over the second str field).  Byte-order
    comparison: matches src0, src1, src10, src11 but NOT src2+.
    Constant scorer over live docs."""
    return _search_blocked(spark, sf_dir, "url:[src0 TO src11]")


# url-field tokenization CTEs (the DuckDB twin of the URL_NS postings:
# same tokenizer over the `source` column, per-field dl/avgdl, df per
# url term; idf's N is the corpus — stats.n_docs — like the engine)
_URL_CTES = r"""
usrc AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(source || '/' || lang),
                                      '[^\p{L}\p{N}]+')) AS term
  FROM documents
),
utok AS (
  SELECT doc_id, term FROM usrc WHERE term <> '' AND length(term) <= 40
),
udl AS (
  SELECT r.doc_id, count(t.term) AS dl
  FROM (SELECT DISTINCT doc_id FROM documents) r
  LEFT JOIN utok t USING (doc_id)
  GROUP BY r.doc_id
),
ustats AS (SELECT avg(dl) AS avgdl FROM udl),
upost AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM utok GROUP BY term, doc_id
),
utstat AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM upost GROUP BY term)
"""

_URL_SCORE_SQL = (
    "ln(1 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5))"
    " * p.tf * 2.2 / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / us.avgdl))"
)


def bm25_url_mixed_sql(
    content_terms: list[str],
    url_terms: list[str],
    conjunction: bool = False,
    k: int = 10,
) -> str:
    """DuckDB oracle for a flat mixed-field query: content terms score
    against (post, dl, stats), url terms against (upost, udl, ustats)
    with the SAME n_docs; per-doc sum (OR) or all-terms-present
    conjunction (AND)."""
    n_terms = len(set(content_terms)) + len(set(url_terms))
    having = f"HAVING count(*) = {n_terms}" if conjunction else ""
    cvals = _values(content_terms) if content_terms else None
    uvals = _values(url_terms) if url_terms else None
    parts = []
    if cvals:
        parts.append(f"""
  SELECT p.doc_id, {_BM25_SCORE_SQL} AS s
  FROM post p
  JOIN {cvals} q(term) ON p.term = q.term
  JOIN tstat ts ON p.term = ts.term
  JOIN dl d ON p.doc_id = d.doc_id
  CROSS JOIN stats s""")
    if uvals:
        parts.append(f"""
  SELECT p.doc_id, {_URL_SCORE_SQL} AS s
  FROM upost p
  JOIN {uvals} q(term) ON p.term = q.term
  JOIN utstat ts ON p.term = ts.term
  JOIN udl d ON p.doc_id = d.doc_id
  CROSS JOIN ustats us
  CROSS JOIN stats s""")
    union = " UNION ALL ".join(parts)
    return f"""
WITH {_TOK_CTES},
{_URL_CTES},
scored AS (
  SELECT doc_id, SUM(s) AS score FROM ({union}) u
  GROUP BY doc_id
  {having}
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# url-phrase oracle: same consecutive-position chain pattern as
# bm25_phrase_sql, but over the url token stream (list positions via
# generate_series — DuckDB has no WITH ORDINALITY) and the URL
# field's dl/avgdl
SQL_URL_PHRASE = """
WITH """ + _TOK_CTES + """,
""" + _URL_CTES + r""",
ubase AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(source || '/' || lang),
                                           '[^\p{L}\p{N}]+'),
                     x -> x <> '' AND length(x) <= 40) AS lst
  FROM documents
),
upp AS (SELECT doc_id, unnest(generate_series(1, len(lst))) AS p, lst
        FROM ubase),
ph AS (
  SELECT t0.doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM upp t0
  JOIN upp t1 ON t1.doc_id = t0.doc_id AND t1.p = t0.p + 1
             AND t1.lst[t1.p] = 'en'
  WHERE t0.lst[t0.p] = 'src3'
  GROUP BY t0.doc_id
),
pidf AS (
  SELECT SUM(ln(1 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5))) AS idf
  FROM utstat ts CROSS JOIN stats s
  WHERE ts.term IN ('src3', 'en')
),
scored AS (
  SELECT p.doc_id,
         i.idf * p.tf * 2.2
           / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / us.avgdl)) AS score
  FROM ph p
  JOIN udl d ON p.doc_id = d.doc_id
  CROSS JOIN ustats us
  CROSS JOIN pidf i
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 6) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""


SQL_URL_TERM_RANGE = f"""
WITH {_URL_CTES},
m AS (
  SELECT DISTINCT doc_id FROM utok
  WHERE term >= 'src0' AND term <= 'src11'
)
SELECT CAST(row_number() OVER (ORDER BY doc_id ASC) AS BIGINT) AS rank,
       doc_id, CAST(1.0 AS DOUBLE) AS score
FROM m
ORDER BY doc_id ASC
LIMIT 10
"""


SQL_MATCH_ALL = """
SELECT CAST(row_number() OVER (ORDER BY doc_id ASC) AS BIGINT) AS rank,
       doc_id, CAST(1.0 AS DOUBLE) AS score
FROM documents
ORDER BY doc_id ASC
LIMIT 10
"""


# the batched-serving query set: one Spark action, five query shapes
# (wand.py search_many — the distributed answer to tantivy's
# in-process searcher loop, reference bids/index.py:155)
_BATCH_SPECS: dict[str, dict] = {
    "single": {"should": ["data"]},
    "or2": {"should": ["merge", "join"]},
    "or5": {"should": ["data", "merge", "join", "sort", "window"]},
    "and2": {"must": ["merge", "join"]},
    "not1": {"should": ["merge"], "must_not": ["join"]},
}
# pure-phrase batch members ride the shared positions decode
# (wand.py _phrases_shared / BATCH_PHRASE_SHARED): "merge" serves two
# phrases, so the per-(term, first_doc) dedup of the unioned restricted
# blocks is exercised under the oracle, not just in pytest
_BATCH_PHRASES: dict[str, list[str]] = {
    "ph2": ["merge", "join"],
    "ph2b": ["data", "merge"],
}
_BATCH_QUERY_STRINGS: dict[str, str] = {
    "single": "data",
    "or2": "merge join",
    "or5": "data merge join sort window",
    "and2": "merge AND join",
    "not1": "merge -join",
    "ph2": '"merge join"',
    "ph2b": '"data merge"',
}


def q_bm25_batch(spark, sf_dir):
    """Seven queries served by ONE search_many action over the blocked
    index: the shared-decode OR branch (thr = per-term min threshold,
    broadcast qid fan-out, per-qid θ filter + window rank), the
    shared-phrase branch (one positions decode over the deduplicated
    union of the phrases' restricted blocks + one groupBy(qid, doc_id);
    "merge" serves both phrases, exercising the dedup), and the tagged
    AND/NOT subplans all under the DuckDB oracle at once."""
    from bids_spark.operators.wand import BlockedSearchEngine

    eng = BlockedSearchEngine(spark, _blocked_index(spark, sf_dir))
    return eng.search_many(_BATCH_QUERY_STRINGS, 10).select(
        "qid",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def bm25_batch_sql(specs: dict[str, dict] | None = None, k: int = 10) -> str:
    """UNION ALL of per-query bm25_topk_sql, each tagged with its qid —
    the independent per-query semantics search_many must reproduce."""
    specs = specs or _BATCH_SPECS
    parts = [
        f"SELECT '{qid}' AS qid, * FROM ({bm25_topk_sql(k=k, **kw)})"
        for qid, kw in specs.items()
    ]
    if specs is _BATCH_SPECS:
        parts += [
            f"SELECT '{qid}' AS qid, * FROM ({bm25_phrase_sql(terms, k=k)})"
            for qid, terms in _BATCH_PHRASES.items()
        ]
    return " UNION ALL ".join(parts)


# every doc with doc_id % 7 == 0 is tombstoned in the "deleted"
# segmented variant — a deterministic rule both sides can name (the
# oracle filters candidates with the same predicate while its df/stats
# still count the deleted docs, mirroring pre-merge Lucene semantics)
_SEG_DELETE_PRED = "p.doc_id % 7 = 0"


def _segmented_engine(spark, sf_dir: str, deleted: bool = False):
    """2-segment append-only index over sf_dir (cached per content
    fingerprint).  deleted=True uses a SEPARATE root with every
    doc_id % 7 == 0 tombstoned — certifying the tombstone-filtered
    decode + probe-θ pruning path (wand._has_deletes) under the
    driver's independent oracle, not just pytest."""
    import hashlib
    import os
    import tempfile

    from bids_spark.operators.segments import SegmentedIndex

    tag = "#segdel@" if deleted else "#seg@"
    key = sf_dir.rstrip("/") + tag + _content_fp(sf_dir)
    root = os.path.join(
        tempfile.gettempdir(),
        "bids_contract_seg_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    si = SegmentedIndex(root)
    docs = load_documents(spark, sf_dir)
    if len(si.segment_paths()) < 2:
        si.add_segment(docs.filter(F.col("doc_id") % 2 == 0), fingerprint="even")
        si.add_segment(docs.filter(F.col("doc_id") % 2 == 1), fingerprint="odd")
    if deleted and not si._committed()["tombstones"]:
        ids = [
            r["doc_id"]
            for r in docs.filter(F.col("doc_id") % 7 == 0)
            .select("doc_id").collect()
        ]
        si.delete_docs(spark, ids)
    return si.engine(spark)


def _search_segmented(spark, sf_dir, query, deleted: bool = False):
    eng = _segmented_engine(spark, sf_dir, deleted=deleted)
    return eng.search(query, 10).select(
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_bm25_or_segmented(spark, sf_dir):
    """Same oracle as bm25_or, served from a 2-segment append-only
    index (operators/segments.py) — certifies exact global BM25 over
    independently built segments."""
    return _search_segmented(spark, sf_dir, "merge join")


def q_bm25_and_segmented(spark, sf_dir):
    return _search_segmented(spark, sf_dir, "merge AND join")


def q_bm25_not_segmented(spark, sf_dir):
    return _search_segmented(spark, sf_dir, "merge -join")


def q_bm25_phrase_segmented(spark, sf_dir):
    return _search_segmented(spark, sf_dir, '"merge join"')


def q_bm25_or_segmented_deleted(spark, sf_dir):
    """OR query over the tombstoned segmented index: deleted docs must
    vanish from results while survivors keep their exact pre-delete
    scores (idf/avgdl still count tombstones until compact)."""
    return _search_segmented(spark, sf_dir, "merge join", deleted=True)


def _compacted_engine(spark, sf_dir: str):
    """Segmented index where the %7 tombstone batch crosses the
    auto_compact_tombstone_frac threshold, so delete_docs itself
    triggers compact(): tombstoned rows are PURGED and df/N/avgdl
    recomputed over the survivors.  The oracle rebuilds its stats over
    the filtered corpus (docs_where) — this row certifies the merge
    machinery (segments.compact + the compaction policy) under the
    driver's independent oracle, not just pytest."""
    import hashlib
    import os
    import tempfile

    from bids_spark.operators.segments import SegmentedIndex

    key = sf_dir.rstrip("/") + "#segcompact@" + _content_fp(sf_dir)
    root = os.path.join(
        tempfile.gettempdir(),
        "bids_contract_cmp_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    si = SegmentedIndex(root, auto_compact_tombstone_frac=0.01)
    docs = load_documents(spark, sf_dir)
    if si._read_commit() is None:
        si.add_segment(docs.filter(F.col("doc_id") % 2 == 0), fingerprint="even")
        si.add_segment(docs.filter(F.col("doc_id") % 2 == 1), fingerprint="odd")
    if len(si.segment_paths()) > 1 or si._committed()["tombstones"]:
        ids = [
            r["doc_id"]
            for r in docs.filter(F.col("doc_id") % 7 == 0)
            .select("doc_id").collect()
        ]
        si.delete_docs(spark, ids)  # ~14% ≥ 1% → policy compacts + purges
    assert len(si.segment_paths()) == 1
    assert not si._committed()["tombstones"]
    return si.engine(spark)


def q_bm25_or_compacted(spark, sf_dir):
    """OR query after delete → auto-compaction: purged docs are gone
    AND the surviving docs' scores shift to the recomputed global
    stats (df/N/avgdl exclude the purged docs) — post-merge Lucene
    semantics, the complement of the pre-merge _deleted row."""
    eng = _compacted_engine(spark, sf_dir)
    return eng.search("merge join", 10).select(
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def q_bm25_and_blocked(spark, sf_dir):
    return _search_blocked(spark, sf_dir, "merge AND join")


def q_bm25_phrase_blocked(spark, sf_dir):
    return _search_blocked(spark, sf_dir, '"merge join"')


def q_term_set(spark, sf_dir):
    """`content: IN [a b]` set query (tantivy TermSetQuery, constant
    scorer) through the blocked path — one multi-term pruned scan."""
    return _search_blocked(spark, sf_dir, "content: IN [merge join]")


def q_docid_set(spark, sf_dir):
    """`doc_id: IN [...]` fast-field set query (constant scorer)."""
    return _search_blocked(spark, sf_dir, "doc_id: IN [5 100 333 9999999]")


def q_term_range(spark, sf_dir):
    """`content:[a TO b]` term-dictionary range (tantivy RangeQuery on
    a str field, constant scorer) through the blocked path — the
    member set is a pushed-down range predicate over the blocks
    table, never a term list on the driver."""
    return _search_blocked(spark, sf_dir, "content:[merge TO part]")


TERM_SET_SQL = f"""
WITH {_TOK_CTES},
m AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('merge', 'join'))
SELECT CAST(row_number() OVER (ORDER BY doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(1.0, 6) AS score
FROM m ORDER BY doc_id ASC LIMIT 10
"""

DOCID_SET_SQL = f"""
WITH {_TOK_CTES}
SELECT CAST(row_number() OVER (ORDER BY doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(1.0, 6) AS score
FROM dl WHERE doc_id IN (5, 100, 333, 9999999)
ORDER BY doc_id ASC LIMIT 10
"""

TERM_RANGE_SQL = f"""
WITH {_TOK_CTES},
m AS (SELECT DISTINCT doc_id FROM tok
      WHERE term >= 'merge' AND term <= 'part')
SELECT CAST(row_number() OVER (ORDER BY doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(1.0, 6) AS score
FROM m ORDER BY doc_id ASC LIMIT 10
"""


def q_bm25_phrase_slop(spark, sf_dir):
    """Sloppy phrase (`"a b"~N`) through the blocked scale path: the
    phrase-block restriction, positions decode, and the tantivy greedy
    slop UDF (functions/slop.py) all sit under the independent
    recursive-CTE DuckDB oracle (bm25_phrase_slop_sql)."""
    return _search_blocked(spark, sf_dir, '"merge join"~2')


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


def bm25_phrase_sql(terms: list[str], k: int = 10) -> str:
    """DuckDB oracle for a phrase query: consecutive-position chain
    join; phrase tf = number of completed chains; idf = Σ member-term
    idfs (Lucene phrase scoring); same BM25 length normalization."""
    assert len(terms) >= 2
    esc = [t.replace("'", "''") for t in terms]
    chain_joins = "\n".join(
        f"JOIN pos t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.lst = t0.lst "
        f"AND t{i}.p = t0.p + {i} AND t{i}.lst[t{i}.p] = '{esc[i]}'"
        for i in range(1, len(terms))
    )
    in_list = ", ".join(f"'{e}'" for e in esc)
    return f"""
WITH {_TOK_CTES},
{_LST_CTE.strip().lstrip()},
pos AS (SELECT doc_id, unnest(generate_series(1, len(lst))) AS p, lst FROM base),
ph AS (
  SELECT t0.doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM pos t0
  {chain_joins}
  WHERE t0.lst[t0.p] = '{esc[0]}'
  GROUP BY t0.doc_id
),
phidf AS (
  SELECT sum(ln(1 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5))) AS idf
  FROM tstat ts CROSS JOIN stats s WHERE ts.term IN ({in_list})
),
scored AS (
  SELECT ph.doc_id,
         phidf.idf * ph.tf * 2.2 /
         (ph.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl)) AS score
  FROM ph JOIN dl d ON ph.doc_id = d.doc_id
  CROSS JOIN stats s CROSS JOIN phidf
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def bm25_phrase_slop_sql(terms: list[str], slop: int, k: int = 10) -> str:
    """DuckDB oracle for a sloppy phrase (`"a b"~N`).

    Implements tantivy's greedy sloppy match (functions/slop.py) as a
    chain of recursive-CTE two-pointer walks — genuinely independent
    of the Python matcher: each recursion level consumes exactly one
    right-list element, the "skip too-small lefts" and "there could be
    a better match" advances are list_filter counts over the sorted
    left list, and the matched right values are carried as a list so
    the next term's walk can consume them.  Depth is bounded by the
    longest per-doc position list.  Scoring is identical to
    bm25_phrase_sql (phrase tf, Σ distinct member idfs, BM25).
    """
    assert len(terms) >= 2 and slop >= 0
    esc = [t.replace("'", "''") for t in terms]
    in_list = ", ".join(f"'{e}'" for e in esc)
    walks = []
    prev = "seed"
    for i in range(1, len(terms)):
        walks.append(f"""
w{i} AS (
  SELECT s.doc_id, s.l, r.r, 1 AS li, 1 AS ri,
         CAST([] AS BIGINT[]) AS out
  FROM {prev} s
  JOIN (SELECT doc_id, list(p - {i} ORDER BY p) AS r
        FROM pos WHERE lst[p] = '{esc[i]}' GROUP BY doc_id) r
    USING (doc_id)
  WHERE len(s.l) > 0 AND len(r.r) > 0
  UNION ALL
  SELECT doc_id, l, r,
    CASE WHEN l[li2] <= r[ri] + {slop}
         THEN li2 + len(list_filter(list_slice(l, li2 + 1, len(l)),
                                    x -> x <= r[ri])) + 1
         ELSE li2 END,
    ri + 1,
    CASE WHEN l[li2] <= r[ri] + {slop}
         THEN list_append(out, r[ri]) ELSE out END
  FROM (
    SELECT doc_id, l, r, li, ri, out,
      li + len(list_filter(list_slice(l, li, len(l)),
                           x -> x < r[ri] - {slop})) AS li2
    FROM w{i} WHERE ri <= len(r) AND li <= len(l)
  )
),
f{i} AS (
  SELECT doc_id, out AS l FROM (
    SELECT doc_id, out,
           row_number() OVER (PARTITION BY doc_id ORDER BY ri DESC) AS rn
    FROM w{i}
  ) WHERE rn = 1 AND len(out) > 0
)""")
        prev = f"f{i}"
    walk_sql = ",".join(walks)
    return f"""
WITH RECURSIVE {_TOK_CTES.strip()},
{_LST_CTE.strip()},
pos AS (SELECT doc_id, unnest(generate_series(1, len(lst))) AS p, lst FROM base),
seed AS (
  SELECT doc_id, list(p ORDER BY p) AS l
  FROM pos WHERE lst[p] = '{esc[0]}' GROUP BY doc_id
),{walk_sql},
ph AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS tf FROM {prev}),
phidf AS (
  SELECT sum(ln(1 + (s.n_docs - ts.df + 0.5) / (ts.df + 0.5))) AS idf
  FROM tstat ts CROSS JOIN stats s WHERE ts.term IN ({in_list})
),
scored AS (
  SELECT ph.doc_id,
         phidf.idf * ph.tf * 2.2 /
         (ph.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl)) AS score
  FROM ph JOIN dl d ON ph.doc_id = d.doc_id
  CROSS JOIN stats s CROSS JOIN phidf
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


# ---------------------------------------------------------------------------
# training-pipeline operators (dedup / similarity / text stats / multimodal)
# ---------------------------------------------------------------------------

from bids_spark.operators import dedup as dd  # noqa: E402
from bids_spark.operators import multimodal as mm  # noqa: E402
from bids_spark.operators import similarity as sim  # noqa: E402
from bids_spark.operators import textstats as ts  # noqa: E402
from bids_spark.operators import events as ev  # noqa: E402
from bids_spark.operators import webtext as wt  # noqa: E402
from bids_spark.sources.corpus import load_embeddings  # noqa: E402

# list CTE shared by token-position oracles
_LST_CTE = r"""
base AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
                     x -> x <> '' AND length(x) <= 40) AS lst
  FROM documents
)
"""

_EN = "'the','a','of','and','to','in','is'"
_DE = "'der','die','das','und','ist','ein'"
_FR = "'le','la','les','et','est','un'"
_ES = "'el','la','los','y','es','un'"


def q_token_count(spark, sf_dir):
    return ts.token_count(load_documents(spark, sf_dir))


def q_token_count_bpe(spark, sf_dir):
    """Real merges-table BPE token budget (functions/bpe.py).  The
    merge loop is not SQL-expressible, so this row is rows-only in the
    driver gate; exactness is pinned by the committed golden fixture
    (tests/golden/bpe_counts_sf0001.json, tests/test_bpe.py)."""
    return ts.token_count_bpe(load_documents(spark, sf_dir))


SQL_TOKEN_COUNT = f"""
WITH {_LST_CTE},
ws AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_ws,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS n_bpe
  FROM documents
)
SELECT b.doc_id, CAST(len(b.lst) AS BIGINT) AS n_tokens,
       CAST(ws.n_ws AS BIGINT) AS n_ws_tokens,
       CAST(ws.n_bpe AS BIGINT) AS n_bpe_ish
FROM base b JOIN ws USING (doc_id)
"""


def q_quality_score(spark, sf_dir):
    return ts.quality_score(load_documents(spark, sf_dir))


SQL_QUALITY = rf"""
WITH {_LST_CTE},
feat AS (
  SELECT d.doc_id,
    (length(d.text) - length(regexp_replace(d.text, '[^\p{{L}}\p{{N}}]', '', 'g')))
        / greatest(length(d.text), 1) AS punct_ratio,
    CASE WHEN len(b.lst) > 0
         THEN CAST(list_reduce(list_prepend(0, list_transform(b.lst, t -> length(t))),
                               (x, y) -> x + y) AS DOUBLE) / len(b.lst)
         ELSE 0.0 END AS mean_tok_len,
    len(list_filter(b.lst, t -> t IN ({_EN}))) / greatest(len(b.lst), 1) AS sw_ratio,
    len(b.lst) AS n_tok
  FROM documents d JOIN base b USING (doc_id)
)
SELECT doc_id,
  round(punct_ratio, 6) AS punct_ratio,
  round(mean_tok_len, 6) AS mean_tok_len,
  round(sw_ratio, 6) AS stopword_ratio,
  round(
    least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * 0.4
    + (1.0 - least(punct_ratio * 2.0, 1.0)) * 0.3
    + CASE WHEN mean_tok_len >= 2.5 AND mean_tok_len <= 8.0 THEN 0.2 ELSE 0.0 END
    + least(sw_ratio * 4.0, 1.0) * 0.1, 6) AS quality
FROM feat
"""


def q_lang_id(spark, sf_dir):
    return ts.lang_id(load_documents(spark, sf_dir))


SQL_LANG_ID = f"""
WITH {_LST_CTE},
r AS (
  SELECT doc_id,
    len(list_filter(lst, t -> t IN ({_EN}))) / greatest(len(lst), 1) AS r_en,
    len(list_filter(lst, t -> t IN ({_DE}))) / greatest(len(lst), 1) AS r_de,
    len(list_filter(lst, t -> t IN ({_FR}))) / greatest(len(lst), 1) AS r_fr,
    len(list_filter(lst, t -> t IN ({_ES}))) / greatest(len(lst), 1) AS r_es
  FROM base
)
SELECT doc_id,
  CASE WHEN greatest(r_en, r_de, r_fr, r_es) > 0 THEN
    CASE WHEN r_en = greatest(r_en, r_de, r_fr, r_es) THEN 'en'
         WHEN r_de = greatest(r_en, r_de, r_fr, r_es) THEN 'de'
         WHEN r_fr = greatest(r_en, r_de, r_fr, r_es) THEN 'fr'
         ELSE 'es' END
  ELSE 'und' END AS pred_lang,
  round(greatest(r_en, r_de, r_fr, r_es), 6) AS lang_score
FROM r
"""


def q_fingerprint(spark, sf_dir):
    return ts.fingerprint(load_documents(spark, sf_dir))


SQL_FINGERPRINT = f"""
WITH {_LST_CTE},
pos AS (SELECT doc_id, unnest(generate_series(1, len(lst))) AS p, lst FROM base)
SELECT b.doc_id,
       CAST(coalesce(sum(p * (length(lst[p]) * 131 + ascii(lst[p]))) % 1000000007, 0)
            AS BIGINT) AS fp
FROM base b LEFT JOIN pos USING (doc_id, lst)
GROUP BY b.doc_id
"""


def q_dedup_exact(spark, sf_dir):
    return dd.exact_dedup(load_documents(spark, sf_dir))


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY sha256(text)
"""


def q_ngram_jaccard(spark, sf_dir):
    return dd.ngram_jaccard_pairs(load_documents(spark, sf_dir), n=3, threshold=0.05)


SQL_NGRAM_JACCARD = f"""
WITH {_LST_CTE},
spos AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(lst) - 2, 0))) AS p, lst
  FROM base
),
sh AS (
  SELECT DISTINCT doc_id, lst[p] || ' ' || lst[p+1] || ' ' || lst[p+2] AS sh
  FROM spos
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.05
"""

_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)


def q_cosine_topk(spark, sf_dir):
    emb = load_embeddings(spark, sf_dir)
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    return sim.cosine_topk(emb, qv, 10)


SQL_COSINE_TOPK = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id,
         {_DOT.format(a='e.embedding', b='q.qe')} /
         (sqrt({_DOT.format(a='e.embedding', b='e.embedding')})
          * sqrt({_DOT.format(a='q.qe', b='q.qe')})) AS cos
  FROM embeddings e, q
)
SELECT CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS rank,
       vec_id, round(cos, 6) AS cos
FROM s ORDER BY cos DESC, vec_id ASC LIMIT 10
"""


def q_media_metadata(spark, sf_dir):
    return mm.media_metadata(mm.attach_media(load_documents(spark, sf_dir)))


SQL_MEDIA_METADATA = """
WITH m AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS media_len,
         lower(substring(hex(encode(text)), 1, 8)) AS magic_hex
  FROM documents
)
SELECT doc_id, media_len, magic_hex,
       CASE WHEN starts_with(magic_hex, '89504e47') THEN 'png'
            WHEN starts_with(magic_hex, 'ffd8ff') THEN 'jpeg'
            WHEN starts_with(magic_hex, '47494638') THEN 'gif'
            WHEN starts_with(magic_hex, '3c68746d') THEN 'html'
            ELSE 'unknown' END AS kind
FROM m
"""


# --- rows-only entries (no SQL oracle: platform hash / approximate) ---


def q_minhash_lsh(spark, sf_dir):
    return dd.minhash_lsh_pairs(load_documents(spark, sf_dir), threshold=0.3)


def q_simhash_neardup(spark, sf_dir):
    return dd.simhash_neardup_pairs(load_documents(spark, sf_dir), max_hamming=8)


def q_lsh_ann_topk(spark, sf_dir):
    emb = load_embeddings(spark, sf_dir)
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    return sim.lsh_ann_topk(emb, qv, 10)


def q_lsh_ann_indexed(spark, sf_dir):
    """Pre-bucketed LSH ANN (the documented scale path for
    lsh_ann_topk): candidate lookup is a pruned scan of the query's
    `bands` partition buckets, never a full signature pass.  Rows-only
    like the ad-hoc twin (approximate by design; recall and
    indexed-equals-ad-hoc parity are property-tested in pytest)."""
    import hashlib
    import os
    import tempfile

    emb = load_embeddings(spark, sf_dir)
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    key = sf_dir.rstrip("/") + "#lshann@" + _content_fp(sf_dir, "embeddings")
    d = os.path.join(
        tempfile.gettempdir(),
        "bids_contract_lsh_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    idx = sim.LshAnnIndex(d)
    if idx.dim is None:
        idx.build(emb)
    return idx.topk(spark, qv, 10)


def q_ivf_ann_topk(spark, sf_dir):
    """IVF coarse-quantizer ANN (rows-only: approximate by design;
    recall property-tested against cosine_topk in pytest)."""
    import hashlib
    import os
    import tempfile

    emb = load_embeddings(spark, sf_dir)
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    key = sf_dir.rstrip("/") + "#ivf@" + _content_fp(sf_dir, "embeddings")
    d = os.path.join(
        tempfile.gettempdir(),
        "bids_contract_ivf_" + hashlib.md5(key.encode()).hexdigest()[:10],
    )
    idx = sim.IvfAnnIndex(d, n_cells=8, nprobe=3)
    if idx.centroids is None:
        idx.build(emb)
    return idx.topk(spark, qv, 10)


def q_embedding_neardup(spark, sf_dir):
    # synthetic embeddings are near-orthogonal (max pair cos ≈ 0.51);
    # 0.4 is the planted-near-dup regime for this data
    return sim.embedding_neardup_pairs(
        load_embeddings(spark, sf_dir), threshold=0.4
    )


def q_embedding_neardup_exact(spark, sf_dir):
    """Exact all-pairs twin of embedding_neardup — O(n²) but fully
    DuckDB-oracle-able (the banded variant is legitimately approximate
    in its candidate recall, so it stays rows-only)."""
    return sim.embedding_allpairs_exact(
        load_embeddings(spark, sf_dir), threshold=0.4
    )


SQL_EMB_NEARDUP_EXACT = f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_DOT.format(a='a.embedding', b='b.embedding')}
               / (a.nrm * b.nrm), 6) AS cos
  FROM n a JOIN n b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos FROM p WHERE cos >= 0.4
"""


def q_decode_features(spark, sf_dir):
    feats = mm.decode_features(mm.attach_media(load_documents(spark, sf_dir)))
    return feats.select(
        "doc_id",
        *[F.round(f"f{i}", 6).alias(f"f{i}") for i in range(mm.N_FEATURES)],
    )


# The fake decoder is an 8-bin byte histogram (L1-normalized) over the
# utf-8 bytes of text — bin = byte // 32.  Expressible in DuckDB by
# hexing each byte of encode(text) and mapping hex digits back to ints
# (no blob→int builtin), so the Arrow decode path gets a real oracle.
_HEXV = (
    "((strpos('0123456789abcdef', substring({h}, 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substring({h}, 2, 1)) - 1)"
)

SQL_DECODE_FEATURES = (
    """
WITH enc AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
),
pos AS (
  SELECT doc_id, hx, n, unnest(generate_series(1, CAST(n AS INT))) AS i
  FROM enc WHERE n > 0
),
v AS (
  SELECT doc_id, n,
         """
    + _HEXV.format(h="substring(hx, 2 * i - 1, 2)")
    + """ // 32 AS bin
  FROM pos
),
h AS (
  SELECT doc_id, any_value(n) AS n,
"""
    + ",\n".join(
        f"         sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END) AS c{i}"
        for i in range(8)
    )
    + """
  FROM v GROUP BY doc_id
)
SELECT d.doc_id,
"""
    + ",\n".join(
        f"       coalesce(round(CAST(h.c{i} AS DOUBLE) / h.n, 6), 0.0) AS f{i}"
        for i in range(8)
    )
    + """
FROM documents d LEFT JOIN h USING (doc_id)
"""
)


# ---------------------------------------------------------------------------
# webtext hygiene operators (operators/webtext.py) — Gopher/C4 recipes
# ---------------------------------------------------------------------------

# derived-lines CTE: token stream reflowed into LINE_TOKENS-token
# chunks (the corpus has no newlines; see webtext.py docstring).
_LINES_CTE = f"""
{_LST_CTE},
dl AS (
  SELECT doc_id, p,
         array_to_string(lst[(p-1)*3+1 : p*3], ' ') AS line
  FROM base,
       unnest(generate_series(1, CAST(ceil(len(lst)/3.0) AS BIGINT))) AS t(p)
)
"""


def q_repetition_stats(spark, sf_dir):
    return wt.repetition_stats(load_documents(spark, sf_dir))


def _gram_cte(n: int, tag: str) -> str:
    return f"""
g{tag} AS (
  SELECT doc_id, array_to_string(lst[p : p+{n - 1}], ' ') AS gram
  FROM base, unnest(generate_series(1, len(lst) - {n - 1})) AS t(p)
),
c{tag} AS (SELECT doc_id, gram, count(*) AS c FROM g{tag} GROUP BY 1, 2),
t{tag} AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS frac
           FROM c{tag} GROUP BY doc_id)
"""


SQL_REPETITION_STATS = f"""
WITH {_LST_CTE},
lines AS (
  SELECT doc_id,
         CASE WHEN len(lst) > 0 THEN
           list_transform(
             generate_series(1, CAST(ceil(len(lst)/3.0) AS BIGINT)),
             p -> array_to_string(lst[(p-1)*3+1 : p*3], ' '))
         ELSE [] END AS ls
  FROM base
),
dup AS (
  SELECT doc_id,
         CASE WHEN len(ls) > 0
              THEN CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls)
              ELSE 0.0 END AS dlf
  FROM lines
),
{_gram_cte(2, '2').strip().rstrip(',')},
{_gram_cte(3, '3').strip().rstrip(',')}
SELECT d.doc_id,
       round(coalesce(t2.frac, 0.0), 6) AS top_bigram_frac,
       round(coalesce(t3.frac, 0.0), 6) AS top_trigram_frac,
       round(dup.dlf, 6) AS dup_line_frac
FROM documents d
LEFT JOIN t2 USING (doc_id)
LEFT JOIN t3 USING (doc_id)
JOIN dup USING (doc_id)
"""


def q_boilerplate_lines(spark, sf_dir):
    return wt.boilerplate_lines(load_documents(spark, sf_dir), min_docs=3)


SQL_BOILERPLATE_LINES = f"""
WITH {_LINES_CTE.strip()}
SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM dl GROUP BY line HAVING count(DISTINCT doc_id) >= 3
"""


def q_remove_boilerplate(spark, sf_dir):
    return wt.remove_boilerplate(load_documents(spark, sf_dir), min_docs=3)


SQL_REMOVE_BOILERPLATE = f"""
WITH {_LINES_CTE.strip()},
boiler AS (
  SELECT line FROM dl GROUP BY line HAVING count(DISTINCT doc_id) >= 3
),
kept AS (SELECT * FROM dl WHERE line NOT IN (SELECT line FROM boiler)),
reb AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, ' ' ORDER BY p) AS ct
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_lines FROM dl GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(tot.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
       sha256(coalesce(reb.ct, '')) AS clean_sha
FROM documents d
LEFT JOIN tot USING (doc_id)
LEFT JOIN reb USING (doc_id)
"""


def q_source_stats(spark, sf_dir):
    return wt.source_stats(load_documents(spark, sf_dir))


SQL_SOURCE_STATS = f"""
WITH {_LST_CTE}
SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(d.text)) AS BIGINT) AS total_chars,
       round(avg(len(b.lst)), 6) AS avg_tokens,
       CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs
FROM documents d JOIN base b USING (doc_id)
GROUP BY d.source
"""

def q_filter_decision(spark, sf_dir):
    return wt.filter_decision(load_documents(spark, sf_dir))


SQL_FILTER_DECISION = f"""
WITH {_LST_CTE},
lines AS (
  SELECT doc_id,
         CASE WHEN len(lst) > 0 THEN
           list_transform(
             generate_series(1, CAST(ceil(len(lst)/3.0) AS BIGINT)),
             p -> array_to_string(lst[(p-1)*3+1 : p*3], ' '))
         ELSE [] END AS ls
  FROM base
),
dup AS (
  SELECT doc_id,
         round(CASE WHEN len(ls) > 0
              THEN CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls)
              ELSE 0.0 END, 6) AS dlf
  FROM lines
),
{_gram_cte(2, '2').strip().rstrip(',')},
sig AS (
  SELECT d.doc_id,
    len(b.lst) AS n_tokens,
    round((length(d.text) - length(regexp_replace(d.text, '[^\\p{{L}}\\p{{N}}]', '', 'g')))
        / greatest(length(d.text), 1), 6) AS punct_ratio,
    round(coalesce(t2.frac, 0.0), 6) AS bigram_frac,
    dup.dlf
  FROM documents d
  JOIN base b USING (doc_id)
  LEFT JOIN t2 USING (doc_id)
  JOIN dup USING (doc_id)
)
SELECT doc_id,
  (NOT (n_tokens < 10) AND NOT (dlf > 0.3)
   AND NOT (bigram_frac > 0.5) AND NOT (punct_ratio > 0.5)) AS keep,
  concat_ws(',',
    CASE WHEN n_tokens < 10 THEN 'too_short' END,
    CASE WHEN dlf > 0.3 THEN 'dup_lines' END,
    CASE WHEN bigram_frac > 0.5 THEN 'repetitive' END,
    CASE WHEN punct_ratio > 0.5 THEN 'punct_soup' END) AS reasons
FROM sig
"""

_SNIPPET_TERMS = ["merge", "join"]


def q_snippet(spark, sf_dir):
    return wt.snippets(
        load_documents(spark, sf_dir), _SNIPPET_TERMS, width=80, context=20
    )


def snippet_sql(terms: list[str], width: int = 80, context: int = 20) -> str:
    sent = wt.ABSENT
    pcols = ",\n    ".join(
        f"CASE WHEN strpos(lower(text), '{t}') > 0"
        f" THEN strpos(lower(text), '{t}') ELSE {sent} END AS p{i}"
        for i, t in enumerate(terms)
    )
    least = "least(" + ", ".join(f"p{i}" for i in range(len(terms))) + ")"
    match = " ".join(
        f"WHEN p{i} = {least} THEN '{t}'" for i, t in enumerate(terms[:-1])
    )
    return f"""
WITH p AS (
  SELECT doc_id, text,
    {pcols}
  FROM documents
)
SELECT doc_id, CAST({least} AS BIGINT) AS pos,
       CASE {match} ELSE '{terms[-1]}' END AS matched_term,
       substring(text, greatest({least} - {context}, 1), {width}) AS snippet
FROM p WHERE {least} < {sent}
"""


# ---------------------------------------------------------------------------
# event-stream operators (operators/events.py)
# ---------------------------------------------------------------------------


def _load_events(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def q_windowed_counts(spark, sf_dir):
    return ev.windowed_counts(_load_events(spark, sf_dir), "1 hour")


# window start re-derived as integer floor arithmetic on epoch micros —
# identical to Spark's epoch-aligned tumbling window, and free of
# DuckDB time_bucket origin subtleties.
SQL_WINDOWED_COUNTS = """
SELECT CAST(epoch_us(ts) // 3600000000 * 3600 AS BIGINT) AS win_start,
       event_type, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sessionize(spark, sf_dir):
    return ev.sessionize(_load_events(spark, sf_dir), gap_minutes=30)


SQL_SESSIONIZE = """
WITH t AS (
  SELECT user_id, event_id, epoch_us(ts) AS ev_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
m AS (
  SELECT user_id, ev_us,
         sum(CASE WHEN prev_us IS NULL OR ev_us - prev_us > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ev_us, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_no
  FROM t
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       min(ev_us) AS sess_start_us, max(ev_us) AS sess_end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM m GROUP BY user_id, session_no
"""


def q_frame_sample(spark, sf_dir):
    frames = mm.sample_frames(mm.attach_media(load_documents(spark, sf_dir)))
    return frames.select(
        "doc_id", "frame_no", F.lower(F.hex("frame")).alias("frame_hex")
    )


# Deterministic byte-window slicing — DuckDB blob substring is the
# oracle (hex-encoded on both sides so the compared cells are strings).
SQL_FRAME_SAMPLE = """
WITH enc AS (
  SELECT doc_id, lower(hex(encode(text))) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents
),
f AS (SELECT doc_id, hx, n, unnest([0, 1, 2, 3]) AS frame_no FROM enc)
SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
       substring(hx, CAST(frame_no * (n // 4) * 2 + 1 AS BIGINT),
                 CAST(greatest(n // 4, 1) * 2 AS BIGINT)) AS frame_hex
FROM f
"""


# ---------------------------------------------------------------------------
# result fetch / shaping (operators/fetch.py — D9/D10/C7 under the oracle)
# and the A4 ingest invariant (sources/corpus.py extract_text_expr)
# ---------------------------------------------------------------------------


def q_search_fetch(spark, sf_dir):
    """D10 doc fetch + C7 stored fields: blocked-path top-10 joined
    back to the documents table (broadcast top-k probe, fetch.py).
    The oracle recomputes BM25 AND the join — result content must
    match the docstore row byte-for-byte (prefix)."""
    from bids_spark.operators.fetch import fetch_docs

    docs = load_documents(spark, sf_dir)
    res = _search_blocked(spark, sf_dir, "merge join", 10)
    return fetch_docs(res, docs, prefix_len=80)


def bm25_fetch_sql(should: list[str], k: int = 10, prefix_len: int = 80) -> str:
    topk = bm25_topk_sql(should=should, k=k)
    return f"""
SELECT s.rank, s.doc_id, s.score, d.source,
       substr(d.text, 1, {prefix_len}) AS content_prefix
FROM ({topk}) s JOIN documents d USING (doc_id)
ORDER BY s.rank
"""


# duplicate-content corpus rule for the dedup row: every even doc_id is
# "re-crawled" under doc_id + 1e8 with identical text — deterministic,
# nameable in SQL, and guaranteed to place duplicate pairs inside the
# over-fetch window (identical text → identical score → adjacent ranks,
# original first by the doc_id ASC tiebreak).
_DEDUP_DUP_MOD = 2
_DEDUP_DUP_ADD = 100_000_000
_DEDUP_LIMIT, _DEDUP_OFFSET, _DEDUP_PAGE = 5, 2, 10


def q_search_dedup_paged(spark, sf_dir):
    """D9 over-fetch + content-dedup + pagination as a distributed plan
    (fetch.py dedup_paged; reference quirk bids/index.py:151-181): BM25
    over the duplicate-augmented corpus, fetch offset+limit+PAGE rows,
    drop later results with identical text, re-rank, slice the page."""
    from bids_spark.operators.fetch import dedup_paged

    docs = load_documents(spark, sf_dir)
    dup = docs.where(F.col("doc_id") % _DEDUP_DUP_MOD == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(_DEDUP_DUP_ADD)
    )
    corpus = docs.unionByName(dup)
    eng = SearchEngine.from_documents(corpus, cache=False)
    fetch_n = _DEDUP_OFFSET + _DEDUP_LIMIT + _DEDUP_PAGE
    res = eng.search("merge join", fetch_n)
    out = dedup_paged(
        res, corpus, limit=_DEDUP_LIMIT, offset=_DEDUP_OFFSET,
        page_size=_DEDUP_PAGE,
    )
    return out.select(
        F.col("position").cast("long").alias("position"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def bm25_dedup_page_sql(
    should: list[str],
    limit: int,
    offset: int = 0,
    page_size: int = 10,
    dup_mod: int = _DEDUP_DUP_MOD,
    dup_add: int = _DEDUP_DUP_ADD,
) -> str:
    fetch_n = offset + limit + page_size
    qvals = ", ".join("('" + t.replace("'", "''") + "')" for t in should)
    ctes = _TOK_CTES.replace("FROM documents", "FROM docs2")
    return f"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {dup_add} AS doc_id, text FROM documents
  WHERE doc_id % {dup_mod} = 0
),
{ctes},
qterms(term) AS (VALUES {qvals}),
scored AS (
  SELECT p.doc_id, SUM({_BM25_SCORE_SQL}) AS score
  FROM post p
  JOIN qterms q ON p.term = q.term
  JOIN tstat ts ON p.term = ts.term
  JOIN dl d ON p.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY p.doc_id
),
topn AS (
  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT)
           AS rank,
         doc_id, score
  FROM scored ORDER BY score DESC, doc_id ASC
  LIMIT {fetch_n}
),
j AS (
  SELECT t.rank, t.doc_id, t.score, d.text
  FROM topn t JOIN docs2 d USING (doc_id)
),
dd AS (
  SELECT rank, doc_id, score,
         row_number() OVER (PARTITION BY text ORDER BY rank) AS rn
  FROM j
),
kept AS (SELECT rank, doc_id, score FROM dd WHERE rn = 1),
paged AS (
  SELECT CAST(row_number() OVER (ORDER BY rank) AS BIGINT) AS position,
         doc_id, round(score, 6) AS score
  FROM kept
)
SELECT position, doc_id, score FROM paged
WHERE position > {offset} AND position <= {offset + limit}
ORDER BY position
"""


# A4 ingest invariant under the oracle: wrap each document's text in a
# deterministic HTML shell (script + style + comment + tags, NO visible
# text of its own), run the vectorized Catalyst extractor, and hash.
# The oracle hashes the ORIGINAL text — byte-identical extraction per
# row is exactly the input_hint invariant, certified per round by the
# independent engine.  (The corpus is single-spaced trimmed text, so
# the extractor's whitespace collapse is the identity on it; the
# collapse semantics themselves are pinned by the committed sha256
# manifest tests, tests/test_ingest_invariant.py.)
_EXTRACT_WRAP_PRE = (
    '<html><head><script type="text/javascript">var greet = "hello";\n'
    "if (page) { track(page); }</script>"
    "<style>.main { color: #333; margin: 0 auto; }</style>"
    '</head><body><p class="content">'
)
_EXTRACT_WRAP_POST = "</p><!-- footer comment --></body></html>"


def q_extract_invariant(spark, sf_dir):
    from bids_spark.sources.corpus import extract_text_expr

    docs = load_documents(spark, sf_dir)
    html = F.concat(
        F.lit(_EXTRACT_WRAP_PRE), F.col("text"), F.lit(_EXTRACT_WRAP_POST)
    )
    extracted = extract_text_expr(F.encode(html, "UTF-8"))
    return docs.select(
        "doc_id", F.sha2(extracted, 256).alias("text_sha256")
    )


SQL_EXTRACT_INVARIANT = """
SELECT doc_id, sha256(text) AS text_sha256 FROM documents
"""


# ---------------------------------------------------------------------------
# consolidated variant suites (round 5)
#
# The driver records at most 50 CORRECTNESS rows per round; round 4's
# registry had grown to 62 and the 12-entry pipeline/ANN tail fell off
# the record.  Redundant engine-path variants of the SAME logical query
# therefore fold into ONE registry row each: a union of the per-path
# results tagged with a `variant` column, oracled by the same SQL
# repeated per tag.  Each previously-separate path keeps its own green
# signal — the value hash is per-row and `variant` disambiguates.
# ---------------------------------------------------------------------------


def _tagged_union(pairs: list) -> DataFrame:
    out = None
    for tag, df in pairs:
        d = df.withColumn("variant", F.lit(tag))
        out = d if out is None else out.unionByName(d)
    return out


def variants_sql(pairs: list) -> str:
    """UNION ALL of per-variant oracle SQL, each tagged to match the
    Spark-side `variant` column (DuckDB allows WITH inside a derived
    table, so existing oracle strings embed unchanged)."""
    return "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS variant, q.* FROM ({sql.strip().rstrip(';')}) q"
        for tag, sql in pairs
    )


def q_bm25_or_pruned(spark, sf_dir):
    """bm25_or on every pruned serving path: plain blocked, aligned
    chunk-max bound forced, probe-θ (the cluster default) — one row,
    three certified paths."""
    return _tagged_union([
        ("blocked", q_bm25_or_blocked(spark, sf_dir)),
        ("aligned", q_bm25_or_aligned(spark, sf_dir)),
        ("probe", q_bm25_or_probe(spark, sf_dir)),
    ])


def q_bm25_and_pruned(spark, sf_dir):
    return _tagged_union([
        ("blocked", q_bm25_and_blocked(spark, sf_dir)),
        ("prefilter", q_bm25_and_prefilter(spark, sf_dir)),
    ])


def q_bm25_segmented_suite(spark, sf_dir):
    """The four boolean shapes on the multi-segment reader (global
    df/N/avgdl rescore across segments) — one row, four paths."""
    return _tagged_union([
        ("or", q_bm25_or_segmented(spark, sf_dir)),
        ("and", q_bm25_and_segmented(spark, sf_dir)),
        ("not", q_bm25_not_segmented(spark, sf_dir)),
        ("phrase", q_bm25_phrase_segmented(spark, sf_dir)),
    ])


def q_grammar_const_suite(spark, sf_dir):
    """The constant-scorer grammar atoms: term set, doc_id set, term
    range, match-all."""
    return _tagged_union([
        ("term_set", q_term_set(spark, sf_dir)),
        ("docid_set", q_docid_set(spark, sf_dir)),
        ("term_range", q_term_range(spark, sf_dir)),
        ("match_all", q_match_all(spark, sf_dir)),
    ])


def q_url_field_suite(spark, sf_dir):
    """The second indexed text field's query shapes: mixed-field OR /
    AND, url phrase, url term range."""
    return _tagged_union([
        ("or", q_bm25_url_or(spark, sf_dir)),
        ("and", q_bm25_url_and(spark, sf_dir)),
        ("phrase", q_bm25_url_phrase(spark, sf_dir)),
        ("range", q_url_term_range(spark, sf_dir)),
    ])


def q_ann_suite(spark, sf_dir):
    """The three ANN serving paths (ad-hoc LSH, pre-bucketed LSH index,
    IVF index) — approximate by design, rows-only; recall and
    indexed≡ad-hoc parity are property-tested in pytest."""
    return _tagged_union([
        ("lsh", q_lsh_ann_topk(spark, sf_dir)),
        ("lsh_indexed", q_lsh_ann_indexed(spark, sf_dir)),
        ("ivf", q_ivf_ann_topk(spark, sf_dir)),
    ])


def q_textstats_suite(spark, sf_dir):
    """quality_score ⋈ lang_id ⋈ fingerprint on doc_id — three per-doc
    column-algebra operators certified in one wide row."""
    return (
        q_quality_score(spark, sf_dir)
        .join(q_lang_id(spark, sf_dir), "doc_id")
        .join(q_fingerprint(spark, sf_dir), "doc_id")
    )


SQL_TEXTSTATS_SUITE = f"""
SELECT q.*, l.pred_lang, l.lang_score, f.fp
FROM ({SQL_QUALITY.strip()}) q
JOIN ({SQL_LANG_ID.strip()}) l USING (doc_id)
JOIN ({SQL_FINGERPRINT.strip()}) f USING (doc_id)
"""


def q_webtext_doc_suite(spark, sf_dir):
    """repetition_stats ⋈ filter_decision on doc_id — the per-doc
    hygiene signals and the keep/drop gate they feed."""
    return q_repetition_stats(spark, sf_dir).join(
        q_filter_decision(spark, sf_dir), "doc_id"
    )


SQL_WEBTEXT_DOC_SUITE = f"""
SELECT r.*, f.keep, f.reasons
FROM ({SQL_REPETITION_STATS.strip()}) r
JOIN ({SQL_FILTER_DECISION.strip()}) f USING (doc_id)
"""


# ---------------------------------------------------------------------------
# fuzzy (`term~N`) and prefix (`term*` / `"a b"*`) rows — the last
# reference-reachable QueryParser surfaces (tantivy FuzzyTermQuery /
# PhrasePrefixQuery; committed semantics in plans/parser.py).
# Constant scorers, so the oracles rank by doc_id like TERM_SET_SQL.
# ---------------------------------------------------------------------------


def q_bm25_fuzzy(spark, sf_dir):
    """Fuzzy term on both fields: `part~2` expands over the content
    dictionary ({part, fast, sort} at this corpus), `url:src3~1` over
    the url namespace ({src0..src9, src13, src3})."""
    return _tagged_union([
        ("content", _search_blocked(spark, sf_dir, "part~2")),
        ("url", _search_blocked(spark, sf_dir, "url:src3~1")),
    ])


def fuzzy_topk_sql(q: str, dist: int, k: int = 10, url: bool = False) -> str:
    """Constant scorer over docs containing ANY dictionary term within
    plain Levenshtein ≤ dist (DuckDB levenshtein == Spark's), same
    field namespace."""
    esc = q.replace("'", "''")
    ctes, tokrel = (_URL_CTES, "utok") if url else (_TOK_CTES, "tok")
    return f"""
WITH {ctes},
exp AS (
  SELECT DISTINCT term FROM {tokrel}
  WHERE levenshtein(term, '{esc}') <= {int(dist)}
),
m AS (SELECT DISTINCT doc_id FROM {tokrel}
      WHERE term IN (SELECT term FROM exp))
SELECT CAST(row_number() OVER (ORDER BY doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(1.0, 6) AS score
FROM m ORDER BY doc_id ASC LIMIT {k}
"""


def q_bm25_prefix(spark, sf_dir):
    """Prefix queries on every surface: bare term prefix (`s*` —
    constant scorer over the [s, s+U+10FFFF) term range), phrase-prefix
    (`"merge jo"*` — fixed term adjacency then any jo* term), and a
    url-field prefix (`url:src1*`)."""
    return _tagged_union([
        ("term", _search_blocked(spark, sf_dir, "s*")),
        ("phrase", _search_blocked(spark, sf_dir, '"merge jo"*')),
        ("url", _search_blocked(spark, sf_dir, "url:src1*")),
    ])


def prefix_topk_sql(pfx: str, k: int = 10, url: bool = False) -> str:
    esc = pfx.replace("'", "''")
    ctes, tokrel = (_URL_CTES, "utok") if url else (_TOK_CTES, "tok")
    return f"""
WITH {ctes},
m AS (SELECT DISTINCT doc_id FROM {tokrel}
      WHERE starts_with(term, '{esc}'))
SELECT CAST(row_number() OVER (ORDER BY doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(1.0, 6) AS score
FROM m ORDER BY doc_id ASC LIMIT {k}
"""


def phrase_prefix_topk_sql(fixed: list[str], pfx: str, k: int = 10) -> str:
    """Constant scorer: fixed terms consecutive, then ANY term with
    the prefix at the next position (content field)."""
    esc = [t.replace("'", "''") for t in fixed]
    pesc = pfx.replace("'", "''")
    chain_joins = "\n".join(
        f"JOIN pos t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.lst = t0.lst "
        f"AND t{i}.p = t0.p + {i} AND t{i}.lst[t{i}.p] = '{esc[i]}'"
        for i in range(1, len(fixed))
    )
    n = len(fixed)
    return f"""
WITH {_TOK_CTES},
{_LST_CTE.strip().lstrip()},
pos AS (SELECT doc_id, unnest(generate_series(1, len(lst))) AS p, lst FROM base),
m AS (
  SELECT DISTINCT t0.doc_id
  FROM pos t0
  {chain_joins}
  JOIN pos tp ON tp.doc_id = t0.doc_id AND tp.lst = t0.lst
             AND tp.p = t0.p + {n}
             AND starts_with(tp.lst[tp.p], '{pesc}')
  WHERE t0.lst[t0.p] = '{esc[0]}'
)
SELECT CAST(row_number() OVER (ORDER BY doc_id ASC) AS BIGINT) AS rank,
       doc_id, round(1.0, 6) AS score
FROM m ORDER BY doc_id ASC LIMIT {k}
"""


SQL_BM25_FUZZY = variants_sql([
    ("content", fuzzy_topk_sql("part", 2)),
    ("url", fuzzy_topk_sql("src3", 1, url=True)),
])

SQL_BM25_PREFIX = variants_sql([
    ("term", prefix_topk_sql("s")),
    ("phrase", phrase_prefix_topk_sql(["merge"], "jo")),
    ("url", prefix_topk_sql("src1", url=True)),
])


# ---------------------------------------------------------------------------
# DuckDB oracle for the real-BPE token budget (the gate's last
# no_oracle row).  The merge loop IS SQL-expressible after two
# observations:
#   1. "merge all non-overlapping occurrences of the best pair,
#      left-to-right" is exactly ONE replace() call when the word's
#      symbols are encoded as a \x02-delimited string
#      (\x02a\x02\x02b\x02 → \x02ab\x02): stdlib replace scans
#      left-to-right and never rescans replaced text — the same walk
#      bpe_word_tokens does over the symbol list;
#   2. ranks are unique per pair type, so "first pair with the minimal
#      rank" (the Python scan's tiebreak) is just the pair type at the
#      argmin — a map lookup over adjacent pairs, no sequential scan.
# A recursive CTE iterates word-states to fixpoint (no rankable pair
# left); recursion is over DISTINCT words (the UDF's memo, in SQL),
# then counts join back to the doc→word multiset.  Same technique
# class as bm25_phrase_slop_sql's recursive greedy walk.
# ---------------------------------------------------------------------------


def bpe_count_sql(merges_path: str | None = None) -> str:
    from bids_spark.functions.bpe import DEFAULT_MERGES, load_merges

    ranks = load_merges(merges_path or DEFAULT_MERGES)

    def esc(s: str) -> str:
        return s.replace("'", "''")

    keys = ", ".join(
        f"'{esc(a)}' || chr(1) || '{esc(b)}'" for (a, b) in ranks
    )
    vals = ", ".join(str(r) for r in ranks.values())
    presplit = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
    return f"""
WITH RECURSIVE
mm AS (SELECT map([{keys}], [{vals}]) AS m),
w AS (
  SELECT DISTINCT
         unnest(regexp_extract_all(lower(text), '{presplit}')) AS word
  FROM documents
),
init AS (
  SELECT word,
         chr(2) || array_to_string(
           list_append(
             list_transform(generate_series(1, length(word)),
                            i -> substr(word, i, 1)),
             '</w>'),
           chr(2) || chr(2)) || chr(2) AS s
  FROM w
),
r AS (
  SELECT word, s, 0 AS it FROM init
  UNION ALL
  SELECT word,
         replace(s, chr(2) || a || chr(2) || chr(2) || b || chr(2),
                 chr(2) || a || b || chr(2)) AS s,
         it + 1
  FROM (
    SELECT word, s, it, syms[idx] AS a, syms[idx + 1] AS b
    FROM (
      SELECT word, s, it, syms,
             list_position(
               pr, list_min(list_filter(pr, x -> x IS NOT NULL))
             ) AS idx
      FROM (
        SELECT word, s, it, syms,
               list_transform(
                 generate_series(1, len(syms) - 1),
                 i -> list_extract(
                   map_extract(m, syms[i] || chr(1) || syms[i + 1]), 1)
               ) AS pr
        FROM (SELECT word, s, it,
                     string_split(s[2:length(s) - 1], chr(2) || chr(2))
                       AS syms
              FROM r), mm
      )
    ) WHERE idx IS NOT NULL AND idx > 0
  )
),
fin AS (
  SELECT word, s FROM (
    SELECT word, s,
           row_number() OVER (PARTITION BY word ORDER BY it DESC) AS rn
    FROM r
  ) WHERE rn = 1
),
cnt AS (
  SELECT word,
         len(string_split(s[2:length(s) - 1], chr(2) || chr(2))) AS n
  FROM fin
),
dw AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{presplit}')) AS word
  FROM documents
)
SELECT d.doc_id, CAST(coalesce(sum(c.n), 0) AS BIGINT) AS n_bpe_tokens
FROM documents d
LEFT JOIN dw USING (doc_id)
LEFT JOIN cnt c USING (word)
GROUP BY d.doc_id
"""


SQL_TOKEN_COUNT_BPE = bpe_count_sql()


# ---------------------------------------------------------------------------
# SBOM transform row (reference sbom.py:146-240 process_file as
# Catalyst — operators/sbom.py).  The sf documents are not BIDS JSON,
# so the row SYNTHESIZES a BIDS doc per row from (doc_id, source,
# lang, text) with to_json — exercising the real parse(from_json) →
# explode → project path end-to-end — while the DuckDB oracle computes
# the expected packages⋈relationships directly from the same base
# columns (same certification pattern as extract_invariant).
# ---------------------------------------------------------------------------


def q_sbom(spark, sf_dir):
    from bids_spark.operators.sbom import sbom_packages, sbom_relationships

    docs = load_documents(spark, sf_dir)
    lib1 = F.concat(F.lit("lib"), F.col("source"), F.lit(".so"))
    lib2 = F.concat(F.lit("lib"), F.col("lang"), F.lit(".so"))
    bids_json = F.to_json(F.struct(
        F.struct(
            F.lit("BIDS").alias("docFormat"),
            F.struct(
                F.lit("ELF").alias("class"),
                F.lit("x86-64").alias("architecture"),
                F.lit(64).cast("long").alias("bits"),
                F.lit("linux").alias("os"),
                F.concat(F.lit("bin"), F.col("doc_id")).alias("filename"),
                F.lit("2025-01-01T00:00:00Z").alias("filedate"),
                F.col("lang").alias("version"),
                F.array(F.struct(
                    F.lit("SHA256").alias("algorithm"),
                    F.sha2(F.col("text"), 256).alias("value"),
                )).alias("checksum"),
            ).alias("binary"),
        ).alias("metadata"),
        F.struct(
            F.array(lib1, lib2).alias("dynamiclibrary"),
            F.array(F.col("source"), F.col("lang")).alias("localsymbols"),
        ).alias("components"),
        F.create_map(
            lib1, F.array(F.col("lang")),
            lib2, F.array(F.col("source"), F.col("lang")),
        ).alias("relationships"),
    ))
    synth = docs.select("doc_id", bids_json.alias("text"))
    pk = sbom_packages(synth)
    rl = sbom_relationships(synth).withColumnRenamed("doc_id", "rdoc")
    return pk.join(
        rl,
        (pk["doc_id"] == rl["rdoc"]) & (pk["name"] == rl["target"]),
    ).select(
        "doc_id", "name", "ptype", "version", "release_date", "sha256",
        "n_functions", "n_localsymbols",
        F.col("source").alias("rel_source"), "rel_type",
    )


SQL_SBOM = """
WITH app AS (
  SELECT doc_id, 'bin' || doc_id AS name, 'application' AS ptype,
         lang AS version, '2025-01-01T00:00:00Z' AS release_date,
         sha256(text) AS sha256, CAST(0 AS BIGINT) AS n_functions,
         CAST(2 AS BIGINT) AS n_localsymbols,
         'Bids_Application' AS rel_source, 'DESCRIBES' AS rel_type
  FROM documents
),
libs AS (
  SELECT doc_id, 'lib' || source || '.so' AS name, 'library' AS ptype,
         CAST(NULL AS VARCHAR) AS version,
         CAST(NULL AS VARCHAR) AS release_date,
         CAST(NULL AS VARCHAR) AS sha256,
         CAST(1 AS BIGINT) AS n_functions,
         CAST(0 AS BIGINT) AS n_localsymbols,
         'bin' || doc_id AS rel_source, 'DEPENDS_ON' AS rel_type
  FROM documents
  UNION ALL
  SELECT doc_id, 'lib' || lang || '.so', 'library',
         NULL, NULL, NULL, CAST(2 AS BIGINT), CAST(0 AS BIGINT),
         'bin' || doc_id, 'DEPENDS_ON'
  FROM documents
)
SELECT * FROM app UNION ALL SELECT * FROM libs
"""
