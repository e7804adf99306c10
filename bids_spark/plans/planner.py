"""AST → DataFrame plan composer + SearchEngine facade.

Evaluation semantics = Lucene/tantivy BooleanQuery (what
`searcher.search` executes for BIDS at /root/reference/bids/index.py:155):

    - a doc matches iff: every `must` child matches, no `must_not`
      child matches, and (if there is no `must`) at least one `should`
      child matches;
    - score = Σ BM25 of every matching must/should child
      (should clauses add score even when musts drive matching);
    - top-k = score desc, doc_id asc (deterministic tie-break).

Each AST node becomes a DataFrame of (doc_id, score):

    Term    → filter on the scored-postings table (predicate pushdown:
              at scale the postings table is laid out by term bucket,
              so this is a pruned scan, not a full pass — D2)
    Phrase  → positional adjacency via array intersect of shifted
              position lists (no UDF)                          — D6
    Bool    → joins/unions: must = inner joins (D4), should = union +
              groupBy-sum (D3), must_not = left_anti (D5)

Top-k is `ORDER BY score DESC, doc_id ASC LIMIT k` which Spark plans
as TakeOrderedAndProject — per-partition heaps, no global sort (D8).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bids_spark.functions.bm25 import bm25_term_score, idf_expr
from bids_spark.operators.index_build import (
    corpus_stats,
    doclens,
    postings_with_positions,
    scored_postings,
    term_stats,
)
from bids_spark.plans.parser import (
    All,
    Bool,
    DocIdSet,
    Fuzzy,
    Phrase,
    PhrasePrefix,
    PREFIX_CEIL,
    Range,
    Term,
    TermRange,
    TermSet,
    parse_query,
)


def term_range_pred(col: Column, tr: TermRange) -> Column:
    """Column predicate for a TermRange over a string term column —
    shared by every engine so the bound/exclusivity algebra can't
    drift (Spark compares strings by UTF-8 bytes, same order as the
    oracle's encode() compare)."""
    pred = F.lit(True)
    if tr.lo is not None:
        op = col >= F.lit(tr.lo) if tr.lo_incl else col > F.lit(tr.lo)
        pred = pred & op
    if tr.hi is not None:
        op = col <= F.lit(tr.hi) if tr.hi_incl else col < F.lit(tr.hi)
        pred = pred & op
    return pred


def _slop_tf_udf(slop: int):
    """Arrow-batched pandas UDF computing the tantivy greedy
    sloppy-match count per doc over one ordinal-ordered
    array<array<int>> column (functions/slop.py).  One packed column —
    pandas_udf's type-hint inference rejects variadic signatures, and
    packing keeps the UDF arity fixed for any phrase length."""
    from bids_spark.functions.slop import phrase_tf_slop

    @F.pandas_udf("long")
    def _tf(plists: pd.Series) -> pd.Series:
        return pd.Series(
            [phrase_tf_slop(row, slop) for row in plists],
            dtype="int64",
        )

    return _tf


def _phrase_tf_slop_df(postings_pos: DataFrame, p: Phrase) -> DataFrame:
    """(doc_id, tf) for a sloppy phrase (p.slop > 0).

    Per-ordinal position arrays are inner-joined on doc_id (a doc
    lacking any member can't match — same join shape as the exact
    chain), then one Arrow-batched pandas UDF computes the tantivy
    greedy sloppy-match count per doc (functions/slop.py).  Integer
    arithmetic only, so the tf is exact; scoring shares the BM25
    expression with the slop=0 path.
    """
    n = len(p.terms)
    _tf = _slop_tf_udf(int(p.slop))
    cur = postings_pos.filter(F.col("term") == p.terms[0]).select(
        "doc_id", F.col("positions").alias("p0")
    )
    for i, t in enumerate(p.terms[1:], start=1):
        nxt = postings_pos.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"p{i}")
        )
        cur = cur.join(nxt, "doc_id")
    return cur.select(
        "doc_id",
        _tf(F.array(*[F.col(f"p{i}") for i in range(n)])).alias("tf"),
    ).filter(F.col("tf") > 0)


def eval_phrase(
    postings_pos: DataFrame,
    doclens_df: DataFrame,
    n_docs: int,
    avgdl: float,
    p: Phrase,
    idf_sum: float | None = None,
) -> DataFrame:
    """(doc_id, score) for docs where p.terms occur consecutively.

    `postings_pos` needs columns (term, doc_id, positions array<int>)
    and must contain at least every posting of the phrase's terms (a
    superset is fine — filters are applied here).  Shared by the naive
    engine and the blocked engine (which feeds decoded blocks), so both
    paths evaluate the *same* Catalyst expression tree → bit-identical
    scores.

    Chain of array intersections: carry the set of positions where the
    prefix ends; phrase tf = |final set|.  Scored like a pseudo-term:
    idf = Σ member-term idfs (Lucene phrase scoring), tf = phrase
    frequency, same length normalization.

    Slop (`"a b"~N`, p.slop > 0): the tf becomes tantivy's greedy
    sloppy match count (functions/slop.py — an inherently sequential
    per-doc two-pointer walk Catalyst arrays can't express), computed
    by an Arrow-batched pandas UDF over the same per-ordinal position
    arrays the exact chain would intersect.  Everything around the tf
    (member join plumbing, idf, BM25) is shared with slop=0, and at
    slop=0 the walk IS sorted-set intersection, so the two paths are
    property-tested identical.
    """
    if p.slop > 0:
        phrase_tf = _phrase_tf_slop_df(postings_pos, p)
    else:
        first, rest = p.terms[0], p.terms[1:]
        cur = (
            postings_pos.filter(F.col("term") == first)
            .select("doc_id", F.col("positions").alias("ends"))
        )
        for i, t in enumerate(rest):
            nxt = postings_pos.filter(F.col("term") == t).select(
                "doc_id", F.col("positions").alias(f"p{i}")
            )
            cur = (
                cur.join(nxt, "doc_id")
                .select(
                    "doc_id",
                    F.array_intersect(
                        F.transform("ends", lambda x: x + 1), F.col(f"p{i}")
                    ).alias("ends"),
                )
                .filter(F.size("ends") > 0)
            )
        phrase_tf = cur.select("doc_id", F.size("ends").alias("tf"))
    # idf of the phrase = sum of DISTINCT member-term idfs (Lucene
    # phrase scoring).  A caller with a term dictionary (blocked/
    # segmented engines) passes the precomputed sum via `idf_sum`,
    # skipping the df sub-aggregation.
    if idf_sum is not None:
        idf_col = F.lit(float(idf_sum))
        scored = phrase_tf.join(doclens_df, "doc_id")
    else:
        dfs = (
            postings_pos.filter(F.col("term").isin(list(p.terms)))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
            .select(idf_expr(F.col("df"), F.lit(n_docs)).alias("idf"))
            .agg(F.sum("idf").alias("idf"))
        )
        idf_col = F.col("idf")
        scored = phrase_tf.join(doclens_df, "doc_id").crossJoin(F.broadcast(dfs))
    return scored.select(
        "doc_id",
        bm25_term_score(
            F.col("tf"), F.col("dl"), F.lit(avgdl), idf_col
        ).alias("score"),
    )


def eval_phrase_fused(
    postings_pos: DataFrame,
    avgdl: float,
    p: Phrase,
    idf_sum: float,
) -> DataFrame:
    """(doc_id, score) for a phrase — ONE aggregation, no doclens join.

    The twin of `eval_phrase` for engines whose positions decode also
    carries the exact doc length (`dl` column — dl-mode blocks store
    it per posting, the same value the doclens table holds).  Instead
    of one join per phrase ordinal plus a doclens join (each a
    shuffle/scan at any scale), all member postings ride ONE decode
    scan into ONE groupBy(doc_id):

      * collect the per-term position arrays as a term→positions map
        (exactly one row per (term, doc_id) — a posting lives in one
        block, a doc in one segment — so no duplicate keys and no
        order sensitivity);
      * a doc is a candidate iff ALL member terms are present
        (map size == |unique terms|) — Lucene conjunction semantics,
        same as the inner-join chain;
      * tf: slop=0 folds the SAME array_intersect(transform(+1))
        chain `eval_phrase` iterates, via F.aggregate over the
        ordinal-ordered arrays (identical operands in identical order
        → identical tf); slop>0 feeds the same packed column to the
        same greedy-walk UDF (_slop_tf_udf);
      * score: the shared bm25_term_score expression on (tf, payload
        dl, avgdl, Σ member idfs) — same expression tree as the twin,
        so scores are bit-identical.

    Exactly-one-shuffle evaluation is tantivy's phrase shape re-expressed
    for Spark: its phrase scorer walks all member cursors in one pass
    (bids/index.py:155 → tantivy PhraseScorer); the fused aggregation
    is that one pass, distributed.
    """
    n = len(p.terms)
    uniq = list(dict.fromkeys(p.terms))
    per_doc = (
        postings_pos.filter(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("pmap"),
            # every posting row of a doc carries the same dl
            F.max("dl").alias("dl"),
        )
        .filter(F.size(F.col("pmap")) == len(uniq))
    )
    # ordinal-ordered member arrays (duplicate members reuse the same
    # per-term array, like the twin's repeated filter-join on the term)
    arrs = F.array(*[F.col("pmap")[F.lit(t)] for t in p.terms])
    if p.slop > 0:
        tf = _slop_tf_udf(int(p.slop))(arrs)
    elif n == 1:
        tf = F.size(F.element_at(arrs, 1))
    else:
        ends = F.aggregate(
            F.slice(arrs, 2, n - 1),
            F.element_at(arrs, 1),
            lambda acc, x: F.array_intersect(
                F.transform(acc, lambda e: e + F.lit(1)), x
            ),
        )
        tf = F.size(ends)
    return (
        per_doc.select("doc_id", "dl", tf.alias("tf"))
        .filter(F.col("tf") > 0)
        .select(
            "doc_id",
            bm25_term_score(
                F.col("tf"), F.col("dl"), F.lit(avgdl), F.lit(float(idf_sum))
            ).alias("score"),
        )
    )


def eval_phrase_prefix(postings_pos: DataFrame, pp: PhrasePrefix) -> DataFrame:
    """(doc_id, 1.0) for docs where pp.terms[:-1] occur consecutively,
    immediately followed by ANY term starting with pp.terms[-1]
    (tantivy PhrasePrefixQuery, constant scorer — see the dataclass).

    ONE aggregation over the member+prefix postings slice (the fused
    phrase shape, eval_phrase_fused): per doc, collect the fixed
    terms' position arrays as a map and the UNION of prefix-matching
    terms' positions, chain the fixed arrays with the same
    array_intersect(transform(+1)) algebra as eval_phrase, and keep
    docs where some chain end is immediately followed by a prefix
    position.  `postings_pos` needs (term, doc_id, positions) and must
    contain at least every posting of the fixed and prefix-matching
    terms (a superset is fine — filters apply here); shared by the
    naive engine (raw postings) and the blocked one (decoded blocks).
    Constant score ⇒ no dl/doclens dependency, so the blocked path
    works on f64-mode indexes too."""
    fixed = list(pp.terms[:-1])
    uniq = list(dict.fromkeys(fixed))
    pfx = pp.terms[-1]
    tr = TermRange(pfx, pfx + PREFIX_CEIL, hi_incl=False)
    pred_fixed = F.col("term").isin(uniq)
    pred_pref = term_range_pred(F.col("term"), tr)
    per_doc = (
        postings_pos.filter(pred_fixed | pred_pref)
        .select(
            "doc_id",
            # a term can play BOTH roles ("jo jo"*): two whens emit
            # each role independently; collect_list skips the NULLs
            F.when(pred_fixed, F.struct("term", "positions")).alias("fx"),
            F.when(pred_pref, F.col("positions")).alias("pf"),
        )
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(F.collect_list("fx")).alias("pmap"),
            F.flatten(F.collect_list("pf")).alias("ppos"),
        )
        .filter(F.size(F.col("pmap")) == len(uniq))
        .filter(F.size("ppos") > 0)
    )
    arrs = F.array(*[F.col("pmap")[F.lit(t)] for t in fixed])
    n = len(fixed)
    if n == 1:
        ends = F.element_at(arrs, 1)
    else:
        ends = F.aggregate(
            F.slice(arrs, 2, n - 1),
            F.element_at(arrs, 1),
            lambda acc, x: F.array_intersect(
                F.transform(acc, lambda e: e + F.lit(1)), x
            ),
        )
    hit = (
        F.size(
            F.array_intersect(
                F.transform(ends, lambda e: e + F.lit(1)), F.col("ppos")
            )
        )
        > 0
    )
    return per_doc.filter(hit).select("doc_id", F.lit(1.0).alias("score"))


class BooleanEvaluator:
    """AST → (doc_id, score) DataFrame, Lucene BooleanQuery semantics.

    Subclasses provide `_eval_term`, `_eval_phrase`, `_empty_scores`;
    Bool combination (must = inner joins D4, should = union +
    groupBy-sum D3, must_not = left_anti D5) is shared so the naive and
    blocked engines can't drift apart.
    """

    def _eval_term(self, t: Term) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def _eval_phrase(self, p: Phrase) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def _doc_universe(self) -> DataFrame:  # pragma: no cover
        """(doc_id) of every live indexed doc — the match set of
        All/Range constant scorers."""
        raise NotImplementedError

    def _empty_scores(self) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def _eval_range(self, r: Range) -> DataFrame:
        """Constant scorer: 1.0 per doc in [lo, hi] (boost applied
        centrally in _eval, like every node)."""
        df = self._doc_universe()
        if r.lo is not None:
            df = df.filter(F.col("doc_id") >= F.lit(int(r.lo)))
        if r.hi is not None:
            df = df.filter(F.col("doc_id") <= F.lit(int(r.hi)))
        return df.select("doc_id", F.lit(1.0).alias("score"))

    def _eval_all(self, a: All) -> DataFrame:
        return self._doc_universe().select(
            "doc_id", F.lit(1.0).alias("score")
        )

    def _eval_termset(self, ts: TermSet) -> DataFrame:
        """Constant scorer: 1.0 per live doc containing ANY member
        term (tantivy TermSetQuery).  Default path reuses _eval_term —
        every engine's block pruning / decode / tombstone machinery
        applies for free; the blocked engine overrides with a single
        multi-term scan."""
        if not ts.terms:
            return self._empty_scores()
        out = self._eval_term(Term(ts.terms[0])).select("doc_id")
        for t in ts.terms[1:]:
            out = out.unionByName(self._eval_term(Term(t)).select("doc_id"))
        return out.distinct().select("doc_id", F.lit(1.0).alias("score"))

    def _eval_termrange(self, tr: TermRange) -> DataFrame:
        """Constant scorer: 1.0 per live doc containing ANY term
        within the bounds (tantivy RangeQuery over a str field).
        Needs a vocabulary to enumerate — no generic path; each engine
        implements over its own postings/dictionary representation."""
        raise NotImplementedError  # pragma: no cover

    def _vocabulary(self) -> DataFrame:  # pragma: no cover
        """(term) — the engine's term dictionary (duplicates allowed),
        the Fuzzy expansion's scan target."""
        raise NotImplementedError

    def _expand_fuzzy(self, fz: Fuzzy) -> list[str]:
        """Dictionary terms within Levenshtein ≤ dist of the query
        term, same field namespace.  The scan is one dictionary-
        relation pass narrowed by a namespace prefix (parquet
        row-group pruning on the sorted term column) and a length band
        (|len(t)−len(q)| ≤ dist is a Levenshtein lower bound) with the
        edit distance itself evaluated JVM-side (F.levenshtein).
        tantivy walks an FST with a Levenshtein automaton instead —
        sublinear in vocabulary where this is linear, but the scan is
        embarrassingly parallel and happens once per query.  The
        collect is the expanded term set: the ≤2-edit neighborhood of
        one term, metadata-sized by construction.  Hot-serving engines
        expose a `_fuzzy_memo` dict (immutable vocabulary ⇒ immutable
        neighborhoods) so repeat fuzzy terms skip the scan."""
        from bids_spark.functions.fields import (
            URL_NS,
            is_url_term,
            url_term_col,
        )

        memo = getattr(self, "_fuzzy_memo", None)
        key = (fz.term, int(fz.dist))
        if memo is not None and key in memo:
            return memo[key]
        voc = self._vocabulary()
        if is_url_term(fz.term):
            q = fz.term[len(URL_NS):]
            voc = voc.filter(url_term_col(F.col("term"))).select(
                "term",
                F.col("term").substr(len(URL_NS) + 1, 1_000_000).alias("bare"),
            )
        else:
            q = fz.term
            voc = voc.filter(~url_term_col(F.col("term"))).select(
                "term", F.col("term").alias("bare")
            )
        d = int(fz.dist)
        cand = voc.filter(
            (F.length("bare") >= F.lit(len(q) - d))
            & (F.length("bare") <= F.lit(len(q) + d))
            & (F.levenshtein(F.col("bare"), F.lit(q)) <= F.lit(d))
        )
        out = sorted({r["term"] for r in cand.select("term").collect()})
        if memo is not None:
            memo[key] = out
        return out

    def _eval_fuzzy(self, fz: Fuzzy) -> DataFrame:
        """Fuzzy term (tantivy FuzzyTermQuery): constant scorer over
        the union of the expanded terms' postings — evaluated as a
        TermSet so every engine's set machinery (single multi-term
        pruned scan on the blocked path, tombstone anti-join on the
        segmented one) applies unchanged."""
        terms = self._expand_fuzzy(fz)
        if not terms:
            return self._empty_scores()
        return self._eval_termset(TermSet(tuple(terms)))

    def _eval_phrase_prefix(self, pp: PhrasePrefix):  # pragma: no cover
        raise NotImplementedError

    def _eval_docidset(self, s: DocIdSet) -> DataFrame:
        """Constant scorer over the doc_id fast field, like Range."""
        if not s.ids:
            return self._empty_scores()
        return (
            self._doc_universe()
            .filter(F.col("doc_id").isin([int(i) for i in s.ids]))
            .select("doc_id", F.lit(1.0).alias("score"))
        )

    def _eval(self, node) -> DataFrame:
        if isinstance(node, Term):
            df = self._eval_term(node)
        elif isinstance(node, Phrase):
            df = self._eval_phrase(node)
        elif isinstance(node, Range):
            df = self._eval_range(node)
        elif isinstance(node, All):
            df = self._eval_all(node)
        elif isinstance(node, TermSet):
            df = self._eval_termset(node)
        elif isinstance(node, TermRange):
            df = self._eval_termrange(node)
        elif isinstance(node, DocIdSet):
            df = self._eval_docidset(node)
        elif isinstance(node, Fuzzy):
            df = self._eval_fuzzy(node)
        elif isinstance(node, PhrasePrefix):
            df = self._eval_phrase_prefix(node)
        elif isinstance(node, Bool):
            df = self._eval_bool(node)
        else:
            raise TypeError(f"unknown AST node {node!r}")
        # boost applied HERE for every node kind (hooks return unboosted
        # scores): per-row multiply then sum ≡ Lucene BoostQuery
        b = float(getattr(node, "boost", 1.0))
        if b != 1.0:
            df = df.select(
                "doc_id", (F.col("score") * F.lit(b)).alias("score")
            )
        return df

    def _union_sum(self, dfs: list[DataFrame]) -> DataFrame:
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out.groupBy("doc_id").agg(F.sum("score").alias("score"))

    def _eval_bool(self, b: Bool) -> DataFrame:
        if not b.must and not b.should:
            # pure-negative query matches nothing (Lucene semantics)
            return self._empty_scores()
        if b.must:
            base = None
            for i, m in enumerate(b.must):
                ev = self._eval(m).withColumnRenamed("score", f"s{i}")
                base = ev if base is None else base.join(ev, "doc_id")
            score = sum(F.col(f"s{i}") for i in range(len(b.must)))
            base = base.select("doc_id", score.alias("score"))
            if b.should:
                opt = self._union_sum([self._eval(s) for s in b.should])
                base = (
                    base.join(
                        opt.withColumnRenamed("score", "opt_score"), "doc_id", "left"
                    )
                    .select(
                        "doc_id",
                        (
                            F.col("score") + F.coalesce(F.col("opt_score"), F.lit(0.0))
                        ).alias("score"),
                    )
                )
        else:
            base = self._union_sum([self._eval(s) for s in b.should])
        for n in b.must_not:
            base = base.join(
                self._eval(n).select("doc_id"), "doc_id", "left_anti"
            )
        return base


class SearchEngine(BooleanEvaluator):
    """Naive (uncompressed, exact) search path over index DataFrames.

    `from_documents` builds the index lazily from a corpus DataFrame;
    index DataFrames are cached because interactive search re-reads
    them per query (the analogue of tantivy keeping segments open,
    /root/reference/bids/index.py:146 reload-per-search).
    """

    def __init__(
        self,
        postings_pos: DataFrame,
        doclens_df: DataFrame,
        stats_df: DataFrame,
        cache: bool = True,
        url_doclens_df: DataFrame | None = None,
        url_stats_df: DataFrame | None = None,
    ):
        """url_doclens_df/url_stats_df: present iff `postings_pos` also
        holds URL_NS-namespaced url-field postings (from_documents
        url_field=True) — per-field BM25 length normalization needs the
        url field's own (dl, avgdl); url_stats_df carries the SAME
        n_docs as stats_df (idf's N is the corpus, tantivy semantics)
        with the url field's avgdl."""
        from bids_spark.functions.fields import url_term_col

        self.postings_pos = postings_pos
        self.doclens = doclens_df
        self.stats = stats_df
        self.url_doclens = url_doclens_df
        row = stats_df.select("n_docs", "avgdl").first()
        self.n_docs = int(row["n_docs"])
        self.avgdl = float(row["avgdl"]) if row["avgdl"] is not None else 0.0
        self.avgdl_url: float | None = None
        if url_stats_df is not None:
            urow = url_stats_df.select("avgdl").first()
            self.avgdl_url = (
                float(urow["avgdl"]) if urow["avgdl"] is not None else 0.0
            )
            # per-field impact scores: each field's postings score
            # against its OWN (doclens, avgdl); df/idf stay per term
            # (namespacing keeps the two vocabularies disjoint)
            ns = url_term_col(F.col("term"))
            self.scored = scored_postings(
                postings_pos.filter(~ns).select("term", "doc_id", "tf"),
                doclens_df, stats_df,
            ).unionByName(
                scored_postings(
                    postings_pos.filter(ns).select("term", "doc_id", "tf"),
                    url_doclens_df, url_stats_df,
                )
            )
        else:
            self.scored = scored_postings(
                postings_pos.select("term", "doc_id", "tf"),
                doclens_df, stats_df,
            )
        if cache:
            self.scored = self.scored.cache()
            self.postings_pos = self.postings_pos.cache()

    @classmethod
    def from_documents(
        cls,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        cache: bool = True,
        url_field: bool = False,
        url_col: str = "url",
    ) -> "SearchEngine":
        """url_field=True also indexes `url_col` as a second text field
        (the reference indexes file_path alongside content with the
        same analyzer, bids/index.py:49-52) — its tokens live under the
        URL_NS namespace with their own positions stream and per-field
        dl/avgdl."""
        pp = postings_with_positions(docs, id_col, text_col)
        if not url_field:
            return cls(
                pp,
                doclens(docs, id_col, text_col),
                corpus_stats(docs, id_col, text_col),
                cache=cache,
            )
        from bids_spark.operators.index_build import namespace_url_terms

        upp = namespace_url_terms(
            postings_with_positions(docs, id_col, url_col)
        )
        # doclens counts a NULL url as dl=0, so avgdl_url averages over
        # ALL docs — the blocked engine's (and the DuckDB oracle's)
        # sum(dl)/n_docs convention on corpora with missing urls.
        return cls(
            pp.unionByName(upp),
            doclens(docs, id_col, text_col),
            corpus_stats(docs, id_col, text_col),
            cache=cache,
            url_doclens_df=doclens(docs, id_col, url_col),
            url_stats_df=corpus_stats(docs, id_col, url_col),
        )

    # ---- node evaluation -------------------------------------------------

    def _eval_term(self, t: Term) -> DataFrame:
        return self.scored.filter(F.col("term") == t.term).select("doc_id", "score")

    def _eval_phrase(self, p: Phrase) -> DataFrame:
        from bids_spark.functions.fields import is_url_term

        if is_url_term(p.terms[0]):
            # url phrases normalize by the url field's (dl, avgdl); the
            # parser scopes a phrase to ONE field, so terms[0] decides
            if self.url_doclens is None:
                # engine built without the url field: no ns postings
                # exist, the phrase matches nothing
                return self._empty_scores()
            return eval_phrase(
                self.postings_pos, self.url_doclens, self.n_docs,
                self.avgdl_url, p,
            )
        return eval_phrase(
            self.postings_pos, self.doclens, self.n_docs, self.avgdl, p
        )

    def _doc_universe(self) -> DataFrame:
        # one row per indexed doc (dl may be 0 — an empty doc still
        # matches All/Range, as in tantivy)
        return self.doclens.select("doc_id")

    def _vocabulary(self) -> DataFrame:
        return self.postings_pos.select("term")

    def _eval_phrase_prefix(self, pp: PhrasePrefix) -> DataFrame:
        return eval_phrase_prefix(self.postings_pos, pp)

    def _eval_termrange(self, tr: TermRange) -> DataFrame:
        return (
            self.scored.filter(term_range_pred(F.col("term"), tr))
            .select("doc_id")
            .distinct()
            .select("doc_id", F.lit(1.0).alias("score"))
        )

    def _empty_scores(self) -> DataFrame:
        return self.scored.select("doc_id", "score").limit(0)

    # ---- public API --------------------------------------------------------

    def plan(
        self, query: str, default_fields: tuple[str, ...] = ("content",)
    ) -> DataFrame:
        """(doc_id, score) for every matching doc — unranked.
        `default_fields`: tantivy parse_query's field list for
        unqualified atoms (see plans.parser.parse_query)."""
        return self._eval(parse_query(query, default_fields))

    def search(
        self,
        query: str,
        limit: int = 10,
        default_fields: tuple[str, ...] = ("content",),
    ) -> DataFrame:
        """(rank, doc_id, score) top-k — TakeOrderedAndProject."""
        matches = self.plan(query, default_fields).orderBy(
            F.desc("score"), F.asc("doc_id")
        ).limit(limit)
        # rank assignment happens on ≤k rows — cheap single partition
        from pyspark.sql import Window

        # single-partition window by design: the input is the already-
        # limited ≤k rows (a constant partition key would be folded
        # away anyway; WindowExec's advisory about it is silenced in
        # session.get_spark)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return matches.select(
            F.row_number().over(w).alias("rank"), "doc_id", "score"
        )
