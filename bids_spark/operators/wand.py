r"""Block-max pruned top-k over the blocked index (distributed BMW).

Classic block-max WAND is a sequential cursor algorithm; per-cursor
state doesn't distribute.  This is the exact distributed reformulation
(north-star "block-max WAND over per-block max-score metadata"):

  Phase 0  scan only blocks of the query terms — directory-level
           partition pruning on `bucket` (computed driver-side with a
           Spark-compatible xxHash64, functions/hashing.py — no Spark
           job) then parquet row-group pruning on the sorted `term`
           column (PushedFilters: In(term, [...])).
  Phase 1  per-term gmax (global max block score) from the TERM
           DICTIONARY table (tantivy's .term files, D2) — a pruned
           scan of one tiny row per term, not an aggregate over blocks.
  Phase 2  θ (a lower bound on the k-th best total score): decode just
           the highest-`block_max_score` blocks per term (enough to
           cover ≥k postings) and take the k-th best partial score.
  Phase 3  prune: drop block b of term t iff
               block_max_score(b) + OTH(t, b)  <  θ ,
           where OTH(t, b) upper-bounds Σ_{t'≠t} s_{t'}(d) for every
           doc d in b.  Two bounds are AND-ed, loosest first:
             (loose)   OTH = Σ_{t'≠t} gmax(t')   — per-term global max,
                       from the term dictionary, no extra work;
             (aligned) OTH = max_{c ∈ chunks(b)} Σ_{t'≠t} cm(t', c),
                       where the doc-id domain is cut into ≤
                       OM_MAX_CHUNKS equal chunks and cm(t', c) is the
                       max block_max_score of t' over blocks
                       overlapping chunk c (tantivy BMW gets the same
                       per-range alignment from its cursor seeks,
                       reference bids/index.py:155).  cm is one
                       metadata-only aggregation (explode of each
                       block's chunk range is ≤ n_blocks + n_chunks
                       rows per term, because a term's blocks are
                       DISJOINT doc intervals), collected as tiny
                       per-term dense arrays — O(terms × n_chunks)
                       driver bytes, independent of corpus size.
                       Indexes built with the "cm" sidecar stage
                       (blocked_index.py) serve these arrays from a
                       pruned scan of precomputed rows instead of the
                       aggregation (tantivy likewise precomputes its
                       block-max metadata at index time) — and
                       applied as a pure column expression (literal
                       array + slice/array_max), so candidate payloads
                       are never shuffled or joined at any scale.
           EXACTNESS ARGUMENT: for any doc d appearing in a pruned
           block b of term t,
               total(d) = s_t(d) + Σ_{t'≠t} s_{t'}(d)
                        ≤ bm(b)  + OTH(t, b)  <  θ ≤ k-th best
           (for the aligned bound: d lies in some chunk c ∈ chunks(b),
           and d's block in each t' overlaps c, so s_{t'}(d) ≤
           cm(t', c) and the inner Σ is bounded at the SAME c before
           the max), so d cannot be in the top-k; and every true
           top-k doc appears in NO pruned block, hence its decoded
           score is complete.  Partial scores of excluded docs are
           < θ and cannot displace true top-k members.  Top-k is
           therefore rank- and score-identical to full evaluation
           (property-tested against the naive engine).  The aligned
           bound is uniformly ≤ the loose one, strictly tighter when
           term score distributions drift across doc ranges — on a
           range-uniform corpus (e.g. the replicated bench fixture)
           the two coincide and no sound bound can do better
           (BENCH/PLANS.md round-3 analysis).
  Phase 4  decode surviving blocks (mapInPandas, numpy) →
           groupBy(doc_id).sum(score) → TakeOrderedAndProject.

θ-pruning applies to pure-OR term queries (the default tantivy shape).
Flat must/must_not queries restrict instead by WHERE the intersection
can live: the and-reduction of the must terms' per-chunk presence
(cm > 0, same chunk grid and metadata job as the aligned bound) is one
bitmap that prunes every query term's blocks before decode — pure
column expression, no join — with the rarest-must-term interval
semi-join kept as the exact second pass when its broadcast/product
budgets allow, and a zero-decode empty fast path when the bitmap comes
back all-False (the must terms provably never co-occur).  tantivy's
cursor intersection gets the same skipping from its seek-to-candidate
loop (reference bids/index.py:155).  Nested boolean and phrase queries evaluate
through the shared BooleanEvaluator (plans/planner.py); phrases decode
the positions section of the payloads (requires an index built with
with_positions=True) and reuse the exact same Catalyst expression tree
as the naive engine (plans.planner.eval_phrase) for bit-identical
scores.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bids_spark.functions.fields import URL_NS, avgdl_for, is_url_term
from bids_spark.functions.hashing import term_bucket
from bids_spark.operators import chunkgrid
from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.codec import decode_block, decode_block_positions_dl
from bids_spark.plans.parser import (
    All,
    Bool,
    DocIdSet,
    Phrase,
    PhrasePrefix,
    PREFIX_CEIL,
    Range,
    Term,
    TermRange,
    parse_query,
)
from bids_spark.functions.bm25 import bm25_term_score
from bids_spark.plans.planner import (
    BooleanEvaluator,
    _slop_tf_udf,
    eval_phrase,
    eval_phrase_fused,
    eval_phrase_prefix,
    term_range_pred,
)

_DECODED = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)

_DECODED_POS = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
        # exact doc length from the block payload (dl-mode blocks; NULL
        # on f64-mode blocks) — lets the fused phrase path skip the
        # doclens-table join entirely
        T.StructField("dl", T.LongType()),
    ]
)


def _decode_udf(avgdl: float | None, avgdl_url: float | None = None):
    """Decoder closure: f64 blocks read stored scores; dl-mode blocks
    recompute them from (tf, dl, idf column, avgdl) — bit-identical
    (codec.bm25_scores_np).  `avgdl_url` selects the url field's
    average length for URL_NS-namespaced terms (per-field BM25
    normalization; None on single-field indexes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            terms, docs, scores = [], [], []
            for term, first_doc, payload, idf in zip(
                pdf["term"], pdf["first_doc"], pdf["payload"], pdf["idf"]
            ):
                a = (
                    avgdl_url
                    if avgdl_url is not None and term.startswith(URL_NS)
                    else avgdl
                )
                d, _tf, s = decode_block(
                    bytes(payload), int(first_doc), idf=idf, avgdl=a
                )
                docs.append(d)
                scores.append(s)
                terms.append(np.full(len(d), term, dtype=object))
            yield pd.DataFrame(
                {
                    "term": np.concatenate(terms),
                    "doc_id": np.concatenate(docs),
                    "score": np.concatenate(scores),
                }
            )

    return gen


def _decode_pos_udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if pdf.empty:
            continue
        terms, docs, plists, dl_parts = [], [], [], []
        for term, first_doc, payload in zip(
            pdf["term"], pdf["first_doc"], pdf["payload"]
        ):
            d, tfs, _s, flat, dls = decode_block_positions_dl(
                bytes(payload), int(first_doc)
            )
            if flat is None:
                raise ValueError(
                    "block has no positions section — rebuild the index "
                    "with with_positions=True to run phrase queries"
                )
            bounds = np.cumsum(tfs)[:-1]
            plists.extend(
                [p.astype(np.int32) for p in np.split(flat, bounds)]
            )
            docs.append(d)
            terms.append(np.full(len(d), term, dtype=object))
            dl_parts.append(
                dls
                if dls is not None
                # f64-mode block: no dl in the payload → NULL column
                else np.full(len(d), None, dtype=object)
            )
        yield pd.DataFrame(
            {
                "term": np.concatenate(terms),
                "doc_id": np.concatenate(docs),
                "positions": pd.Series(plists, dtype=object),
                "dl": pd.Series(
                    np.concatenate(
                        [np.asarray(p, dtype=object) for p in dl_parts]
                    ),
                    dtype=object,
                ),
            }
        )


def decode_blocks(
    blocks: DataFrame,
    avgdl: float | None = None,
    avgdl_url: float | None = None,
) -> DataFrame:
    """blocks(term, first_doc, payload, idf, ...) → (term, doc_id,
    score).  `avgdl` is required for dl-mode blocks; `avgdl_url` for
    dl-mode url-field blocks (URL_NS terms)."""
    return blocks.select("term", "first_doc", "payload", "idf").mapInPandas(
        _decode_udf(avgdl, avgdl_url), _DECODED
    )


def decode_blocks_positions(blocks: DataFrame) -> DataFrame:
    """blocks → (term, doc_id, positions array<int>) from the payload
    positions section (tantivy `.pos` analogue)."""
    return blocks.select("term", "first_doc", "payload").mapInPandas(
        _decode_pos_udf, _DECODED_POS
    )


def lookup_expr(
    key, mapping: dict, default: float | None = None
):
    """O(|mapping|) CASE chain standing in for a per-query tiny
    broadcast-dim join.  Materializing even a ≤5-row local relation as
    a broadcast costs one extra Spark job per query (the exchange is
    its own scheduling round-trip) — measured ~0.4 s of the ~0.9 s hot
    single-query p50 on local[32]; at cluster scale it is one fewer
    driver→executor broadcast per query.  The CASE is |terms| literal
    nodes — NOT the array-literal hazard class (cf. the json-literal
    note in _or_pruned_survivors).  `default=None` yields NULL for
    unmapped keys; callers reproduce an inner join's drop of unmapped
    rows with an `isin` filter (or let the NULL propagate through a
    comparison, which also drops the row)."""
    expr = None
    for m, v in mapping.items():
        w = key == F.lit(m)
        expr = F.when(w, F.lit(v)) if expr is None else expr.when(w, F.lit(v))
    if expr is None:
        return F.lit(default)
    return expr if default is None else expr.otherwise(F.lit(default))


def _ordered_sum(entry: Column) -> Column:
    """Order-canonical float sum for a per-doc score aggregation:
    collect (term, score) structs, array_sort (term is unique per doc
    — one posting row per (term, doc)), fold left.  F.sum's value is
    arrival-order-dependent (partial-agg merge order follows the
    physical plan), and two PLANS for the same query can differ by an
    ULP — measured at 3M docs: the batched fan-out join reordered a
    3-term AND's partials, and among a ~600-way replica tie a 1-ULP
    drift flipped which docs made top-k vs the sequential plan.  A
    canonical fold is bit-identical across plans, partitionings, and
    runs.  `entry` may be a WHEN(...)-guarded struct: NULLs are
    skipped by collect_list (the F.sum(NULL-skip) twin semantics)."""
    return F.aggregate(
        F.array_sort(F.collect_list(entry)),
        F.lit(0.0),
        lambda acc, x: acc + x["score"],
    )


class BlockedSearchEngine(BooleanEvaluator):
    """Query engine over a built BlockedIndex.

    terms/AND/OR/NOT on flat queries use single-scan fast paths with
    block-max pruning; nested booleans and phrases (positions-built
    index) evaluate through the shared BooleanEvaluator."""

    def __init__(self, spark: SparkSession, index: BlockedIndex, cache: bool = False):
        self.spark = spark
        self.index = index
        self.blocks = index.blocks(spark)
        self.tdict = index.terms(spark)
        man = index._manifest()
        self.n_buckets = int(
            man["stages"].get("blocks", {}).get("n_buckets", 0) or 0
        )
        self._stats_cache: tuple[int, float] | None = None
        self._doclens_cache: DataFrame | None = None
        # driver-side term-dictionary memo (hot-serving only): a built
        # BlockedIndex is immutable, so a term's dictionary row never
        # changes — memoizing it removes the per-query metadata job for
        # repeated terms (tantivy keeps the .term FST memory-mapped for
        # the same reason).  None sentinel = term absent from the index.
        self._meta_memo: dict[str, dict | None] | None = {} if cache else None
        # per-term chunk-max arrays for the range-aligned bound: the
        # chunk grid is fixed per engine (doc domain is index-static),
        # so a term's cm array never changes — memoized like the
        # dictionary rows in hot-serving mode
        self._cm_memo: dict[str, np.ndarray] | None = {} if cache else None
        # merged doc-interval spans per term (for the rarest-term
        # restriction predicate): index-static like the dictionary rows
        self._ranges_memo: dict[str, tuple[list[int], list[int]]] | None = (
            {} if cache else None
        )
        # fuzzy-expansion memo (hot-serving only): a built index's
        # vocabulary is immutable, so a (term, dist) neighborhood
        # never changes — memoizing removes the per-query dictionary
        # scan for repeated fuzzy terms (consumed by the shared
        # BooleanEvaluator._expand_fuzzy via getattr)
        self._fuzzy_memo: dict[tuple[str, int], list[str]] | None = (
            {} if cache else None
        )
        self._domain_cache: tuple[int, int] | None = None
        # active must-range restriction for the generic path (set by
        # _eval_bool while evaluating a Bool whose musts include a
        # Range): term/phrase block scans skip blocks whose doc
        # interval can't overlap it
        self._range_ctx: tuple[int | None, int | None] | None = None
        try:
            self.avgdl: float | None = index.avgdl  # manifest — no job
        except KeyError:
            self.avgdl = None  # pre-fmt3 index: f64 blocks need no avgdl
        # url field's avgdl (manifest; None without the field) — the
        # per-field BM25 normalization for URL_NS-namespaced terms
        self.avgdl_url: float | None = index.avgdl_url
        if cache:
            # hot-serving mode: in-memory columnar blocks; term filters
            # still prune via InMemoryTableScan batch stats
            self.blocks = self.blocks.cache()
            self.tdict = self.tdict.cache()

    # -- helpers -----------------------------------------------------------

    def _buckets(self, terms: list[str]) -> list[int]:
        """Bucket ids computed driver-side (hashing.term_bucket is
        bit-identical to Spark's xxhash64 — tested) → zero Spark jobs."""
        return sorted({term_bucket(t, self.n_buckets) for t in terms})

    def _bucket_filter(self, df: DataFrame, terms: list[str]) -> DataFrame:
        if self.n_buckets:
            # directory-level partition pruning first, then row-group stats
            df = df.filter(F.col("bucket").isin(self._buckets(terms)))
        return df

    def _term_blocks(self, terms: list[str]) -> DataFrame:
        return self._bucket_filter(self.blocks, terms).filter(
            F.col("term").isin(terms)
        )

    def _term_meta(self, terms: list[str]) -> dict[str, dict]:
        """term → {df, gmax, idf, n_blocks} from the term dictionary
        (one tiny pruned scan; memoized per term in hot-serving mode —
        repeat-term queries then skip the metadata job entirely)."""
        uniq = sorted(set(terms))
        if self._meta_memo is None:
            rows = (
                self._bucket_filter(self.tdict, uniq)
                .filter(F.col("term").isin(uniq))
                .collect()
            )
            return {r["term"]: r.asDict() for r in rows}
        missing = [t for t in uniq if t not in self._meta_memo]
        if missing:
            rows = (
                self._bucket_filter(self.tdict, missing)
                .filter(F.col("term").isin(missing))
                .collect()
            )
            found = {r["term"]: r.asDict() for r in rows}
            for t in missing:
                self._meta_memo[t] = found.get(t)
        return {
            t: m for t in uniq if (m := self._meta_memo[t]) is not None
        }

    def _doclens(self) -> DataFrame:
        if self._doclens_cache is None:
            self._doclens_cache = self.index.doclens(self.spark)
            if self._meta_memo is not None:  # hot-serving mode
                self._doclens_cache = self._doclens_cache.cache()
        return self._doclens_cache

    def _stats(self) -> tuple[int, float]:
        if self._stats_cache is None:
            self._stats_cache = self.index.stats(self.spark)
        return self._stats_cache

    # -- BooleanEvaluator hooks (generic/nested path) ------------------------

    def _decode(self, blocks: DataFrame) -> DataFrame:
        return decode_blocks(blocks, self.avgdl, self.avgdl_url)

    def _avgdl_of(self, term: str) -> float:
        """Field-correct avgdl for a (possibly url-namespaced) term."""
        return avgdl_for(term, self.avgdl, self.avgdl_url)

    def _live(self, df: DataFrame) -> DataFrame:
        """Tombstone seam for constant scorers (All/Range): identity
        here, anti-joined in the segmented engine."""
        return df

    def _doc_universe(self) -> DataFrame:
        return self._live(self._doclens().select("doc_id"))

    @staticmethod
    def _range_restricted_blocks(
        blocks: DataFrame, rng: tuple[int | None, int | None] | None
    ) -> DataFrame:
        """Skip blocks whose [first_doc, max_doc] interval can't
        overlap an active must-range.  SOUND: a doc satisfying the
        range lives only in overlapping blocks, so every posting of a
        possible match survives; non-overlapping blocks hold only docs
        the range must-clause excludes anyway.  doc_id is the block
        sort key, so this is metadata-level skipping — the RangeQuery
        analogue of tantivy's fast-field-driven seek."""
        if not rng:
            return blocks
        lo, hi = rng
        if lo is not None:
            blocks = blocks.filter(F.col("max_doc") >= F.lit(int(lo)))
        if hi is not None:
            blocks = blocks.filter(F.col("first_doc") <= F.lit(int(hi)))
        return blocks

    def _eval_bool(self, b: Bool) -> DataFrame:
        rngs = [m for m in b.must if isinstance(m, Range)]
        # a must doc_id-set implies the range [min(ids), max(ids)] —
        # a sound superset, so the same block skipping applies (the
        # set filter itself still runs in _eval_docidset)
        rngs += [
            Range(min(m.ids), max(m.ids))
            for m in b.must
            if isinstance(m, DocIdSet) and m.ids
        ]
        if not rngs:
            return super()._eval_bool(b)
        # intersect this Bool's must-ranges with any enclosing context;
        # every child evaluated under it (must, should, must_not) may
        # skip non-overlapping blocks — the final match set must
        # satisfy the range regardless of which child a posting feeds
        lo = max((r.lo for r in rngs if r.lo is not None), default=None)
        hi = min((r.hi for r in rngs if r.hi is not None), default=None)
        prev = self._range_ctx
        if prev is not None:
            plo, phi = prev
            lo = plo if lo is None else (lo if plo is None else max(lo, plo))
            hi = phi if hi is None else (hi if phi is None else min(hi, phi))
        self._range_ctx = (lo, hi)
        try:
            return super()._eval_bool(b)
        finally:
            self._range_ctx = prev

    def _apply_boosts(self, df: DataFrame, boosts: dict[str, float]) -> DataFrame:
        """Multiply decoded per-posting scores by their term's boost
        (tiny broadcast dim; left join so unmapped terms keep 1.0)."""
        if not any(b != 1.0 for b in boosts.values()):
            return df
        bmap = {t: float(b) for t, b in boosts.items()}
        if self.TINY_LOOKUP_LITERAL:
            # CASE literal == the left join's coalesce(_b, 1.0): same
            # doubles, no broadcast materialization on a per-posting df
            return df.withColumn(
                "score",
                F.col("score") * lookup_expr(F.col("term"), bmap, 1.0),
            )
        bdf = F.broadcast(
            self.spark.createDataFrame(
                list(bmap.items()), "term string, _b double"
            )
        )
        return (
            df.join(bdf, "term", "left")
            .withColumn(
                "score", F.col("score") * F.coalesce(F.col("_b"), F.lit(1.0))
            )
            .drop("_b")
        )

    # Master switch for the must-range block restriction (A/B-able,
    # like OM_ALIGNED / AND_BITMAP): off = decode every candidate
    # block and let the Range must-join filter rows — same results.
    RANGE_RESTRICT = True

    def _apply_range_ctx(self, blocks: DataFrame) -> DataFrame:
        if not self.RANGE_RESTRICT:
            return blocks
        return self._range_restricted_blocks(blocks, self._range_ctx)

    def _eval_term(self, t: Term) -> DataFrame:
        blocks = self._apply_range_ctx(self._term_blocks([t.term]))
        return self._decode(blocks).select("doc_id", "score")

    def _has_positions(self) -> bool:
        """Positions-availability seam (ALL segments must carry them in
        the segmented override)."""
        return self.index.has_positions

    def _eval_phrase(self, p: Phrase) -> DataFrame:
        if not self._has_positions():
            raise NotImplementedError(
                "this blocked index stores no positions; rebuild with "
                "with_positions=True (or use the naive SearchEngine) "
                "for phrase queries"
            )
        uniq = list(dict.fromkeys(p.terms))
        meta = self._term_meta(uniq)
        blocks = self._term_blocks(uniq)
        if len(uniq) > 1:
            # A phrase is a conjunction of its member terms plus an
            # adjacency test, so the flat AND path's metadata
            # restriction applies verbatim: blocks whose chunk span
            # provably holds no doc containing ALL members can't hold
            # a phrase match, and every posting of a matching doc
            # survives (the _and_bitmap soundness argument), so the
            # superset contract of eval_phrase is kept and scores are
            # exact.  Positions decode is the costliest per-posting
            # path in the engine — this is where skipping matters
            # most.  Reference semantics: tantivy evaluates phrases as
            # an intersection cursor before position verification
            # (bids/index.py:155).
            empty, bitmap_pred, rarest_ranges = self._bool_restriction(
                sorted(uniq), sorted(uniq), meta=meta
            )
            if empty:
                # a member term with zero postings, or an all-False
                # intersection bitmap → no doc holds all members; the
                # phrase provably matches nothing, zero decode jobs
                return self._empty()
            blocks = self._restrict_blocks(blocks, bitmap_pred, rarest_ranges)
        # an enclosing must-range skips non-overlapping blocks before
        # the positions decode (same soundness as _eval_term)
        blocks = self._apply_range_ctx(blocks)
        decoded = self._decode_positions(blocks)
        n_docs, avgdl = self._stats()
        if is_url_term(p.terms[0]):
            # url phrase (parser scopes a phrase to one field): length-
            # normalize by the url field's stats.  No ns postings exist
            # on an index built without the field — provably empty.
            if self.avgdl_url is None:
                return self._empty()
            avgdl = self.avgdl_url
            if not self._phrase_dl_available():
                # the non-fused twin joins the CONTENT doclens table for
                # dl — wrong field.  dl-mode payloads carry the url dl
                # per posting, so the fused path is the only exact one.
                raise NotImplementedError(
                    "url-field phrases need a dl-mode index (payload "
                    "carries the url field's doc length); rebuild with "
                    "score_mode='dl'"
                )
            idf_sum = sum(float(m["idf"]) for m in meta.values())
            return eval_phrase_fused(decoded, avgdl, p, idf_sum=idf_sum)
        # phrase idf = Σ distinct member idfs — from the term dictionary
        idf_sum = sum(float(m["idf"]) for m in meta.values())
        if self.PHRASE_FUSED and self._phrase_dl_available():
            # dl-mode payloads carry the exact doc length per posting:
            # ONE decode scan + ONE aggregation, no doclens join (twin
            # kept below — f64-mode indexes and the A/B switch)
            return eval_phrase_fused(decoded, avgdl, p, idf_sum=idf_sum)
        return eval_phrase(
            decoded, self._doclens(), n_docs, avgdl, p, idf_sum=idf_sum
        )

    def _decode_positions(self, blocks: DataFrame) -> DataFrame:
        """Positions-decode seam (tombstones anti-joined in the
        segmented override, like _decode)."""
        return decode_blocks_positions(blocks)

    def _phrase_dl_available(self) -> bool:
        """True iff every positions payload this engine decodes carries
        dl (score_mode=='dl') — the fused phrase path's requirement."""
        return self.index.score_mode == "dl"

    def _eval_termset(self, ts) -> DataFrame:
        """Set query (TermSetQuery): ONE bucket+term-pruned scan over
        all member terms (the generic hook would issue a scan per
        term), decode → distinct doc ids → constant 1.0.  Catalyst
        prunes the unused score expression from the decode; the
        segmented engine's _decode override anti-joins tombstones; an
        enclosing must-range skips non-overlapping blocks first."""
        if not ts.terms:
            return self._empty()
        blocks = self._apply_range_ctx(self._term_blocks(list(ts.terms)))
        return (
            self._decode(blocks)
            .select("doc_id")
            .distinct()
            .select("doc_id", F.lit(1.0).alias("score"))
        )

    def _termrange_blocks(self, tr) -> DataFrame:
        """All blocks whose term falls in the range — a dictionary-wide
        metadata scan by construction (hash buckets don't prune a
        LEXICOGRAPHIC range), but rows inside each bucket partition are
        sorted by term (the build's range shuffle order survives the
        write), so parquet row-group min/max stats keep the scan
        proportional to matching blocks.  Segmented override unions
        segments."""
        return self.blocks.filter(term_range_pred(F.col("term"), tr))

    def _eval_termrange(self, tr) -> DataFrame:
        """Term-dictionary range (tantivy RangeQuery on a str field):
        constant scorer, 1.0 per live doc holding ANY in-range term.
        Same shape as _eval_termset — decode → distinct doc ids —
        with the member set expressed as a pushed-down range predicate
        instead of an IN list (the range can match unboundedly many
        terms; no term list ever reaches the driver).  Catalyst prunes
        the score expression from the decode; the segmented _decode
        override anti-joins tombstones; an enclosing must-range skips
        non-overlapping blocks first."""
        blocks = self._apply_range_ctx(self._termrange_blocks(tr))
        return (
            self._decode(blocks)
            .select("doc_id")
            .distinct()
            .select("doc_id", F.lit(1.0).alias("score"))
        )

    def _empty_scores(self) -> DataFrame:
        return self._empty()

    def _vocabulary(self) -> DataFrame:
        """Fuzzy-expansion scan target: the term dictionary relation
        (one row per term — O(vocabulary), not O(postings))."""
        return self.tdict.select("term")

    def _eval_phrase_prefix(self, pp: PhrasePrefix) -> DataFrame:
        """Phrase-prefix on the blocked path: the fixed members'
        blocks (bucket-pruned) unioned with the prefix's term-RANGE
        blocks (lexicographic row-group pruning, no term list on the
        driver), restricted by the fixed-member conjunction bitmap —
        sound because every match holds ALL fixed terms (same argument
        as _eval_phrase) — then ONE positions decode feeding the
        shared constant-score adjacency aggregation
        (planner.eval_phrase_prefix).  Works on f64-mode indexes:
        constant score needs no dl."""
        if not self._has_positions():
            raise NotImplementedError(
                "this blocked index stores no positions; rebuild with "
                "with_positions=True (or use the naive SearchEngine) "
                "for phrase-prefix queries"
            )
        fixed = list(dict.fromkeys(pp.terms[:-1]))
        meta = self._term_meta(fixed)
        pfx = pp.terms[-1]
        tr = TermRange(pfx, pfx + PREFIX_CEIL, hi_incl=False)
        blocks = self._term_blocks(fixed).unionByName(
            self._termrange_blocks(tr)
        )
        empty, bitmap_pred, rarest_ranges = self._bool_restriction(
            sorted(fixed), sorted(fixed), meta=meta
        )
        if empty:
            return self._empty()
        blocks = self._restrict_blocks(blocks, bitmap_pred, rarest_ranges)
        blocks = self._apply_range_ctx(blocks)
        return eval_phrase_prefix(self._decode_positions(blocks), pp)

    def _has_deletes(self) -> bool:
        """Overridden by the segmented engine when tombstones exist.
        With deletes, the term-dictionary θ (s10/s100) is computed over
        ALL docs including deleted ones — it could exceed the true k-th
        best among LIVE docs and over-prune, so the pruned-OR path must
        take θ from a probe over tombstone-filtered decodes instead."""
        return False

    # -- range-aligned other-term bounds (aligned BMW) -------------------------

    # Grid geometry constants shared with the build-time cm sidecar
    # stage (operators/chunkgrid.py — rationale documented there).
    OM_MAX_CHUNKS = chunkgrid.OM_MAX_CHUNKS
    OM_MIN_CHUNK_DOCS = chunkgrid.OM_MIN_CHUNK_DOCS
    OM_SLICE_CAP = chunkgrid.OM_SLICE_CAP
    # Master switch for serving cm arrays from the index's build-time
    # sidecar tables (cm / cm_wide) instead of aggregating candidate
    # block metadata per cold query (A/B-able; auto-falls-back when
    # the index predates the stage or its grid differs).
    CM_SIDECAR = True
    # Master switch for the aligned bound (A/B-able per call).
    OM_ALIGNED = True
    # Master switch for the AND-path intersection bitmap (A/B-able):
    # a chunk can contain a doc of the must-intersection only if EVERY
    # must term has a block overlapping it, so the and-reduction of the
    # must terms' per-chunk presence (cm > 0) is one bitmap that prunes
    # the blocks of ALL query terms before decode — a pure column
    # expression over block metadata, no join, O(1) driver bytes in
    # corpus size.  Subsumes the rarest-term interval join as the
    # always-cheap first pass (the join stays as the exact second pass
    # when its budgets allow).  Auto-engages above OM_MIN_BLOCKS like
    # the aligned OR bound.
    AND_BITMAP = True
    # Master switch (A/B-able) for per-query tiny dim lookups: True
    # ships |terms|-row lookups (gmax, boosts, batched per-term
    # thresholds, per-qid θ) as CASE-literal columns (lookup_expr),
    # False keeps the broadcast-join twin as the executable spec.
    # Identical values either way (same Python doubles become Literals
    # either route); the literal path saves one broadcast-materialize
    # job per query — the dominant term of the hot-query p50 floor
    # (tools/latency_probe.py; BENCH/BASELINE.md "hot-query latency").
    TINY_LOOKUP_LITERAL = True
    # Auto-engage threshold: the aligned bound exists to skip decode
    # I/O, and costs one extra metadata collect per cold multi-term
    # query — below this many candidate blocks (~512k postings) the
    # scheduling round-trip outweighs anything it could save, so the
    # default path (aligned=None) skips it.  Known driver-side from
    # the dictionary rows (n_blocks), zero extra jobs to decide.
    # Explicit aligned=True forces it regardless (tests, evidence).
    OM_MIN_BLOCKS = 4096
    # One-sided guard on the driver-side float sums inside the aligned
    # bound, mirroring segments._UP: rounding must never push a bound
    # BELOW the true real-number sum (over-pruning would break rank
    # identity; overshooting by ~1e-12 relative only keeps an extra
    # block in razor-thin ties).  Sized for queries of any realistic
    # term count (error ≤ T·ulp per nonneg-sum of T terms).
    _OM_UP = 1.0 + 1e-12

    def _doc_domain(self) -> tuple[int, int]:
        """[min first_doc, max max_doc] over all index blocks — from
        the build manifest (no job); one-time metadata agg fallback for
        indexes built before the field existed."""
        if self._domain_cache is None:
            try:
                self._domain_cache = self.index.doc_domain
            except KeyError:
                r = self.blocks.agg(
                    F.min("first_doc").alias("lo"),
                    F.max("max_doc").alias("hi"),
                ).first()
                self._domain_cache = (
                    (int(r["lo"]), int(r["hi"]))
                    if r["lo"] is not None
                    else (0, 0)
                )
        return self._domain_cache

    def _chunk_grid(self) -> tuple[int, int, int]:
        """(lo, chunk_width, n_chunks) — fixed per engine."""
        lo, hi = self._doc_domain()
        return chunkgrid.chunk_grid(
            lo, hi, self.OM_MAX_CHUNKS, self.OM_MIN_CHUNK_DOCS
        )

    def _cm_sidecar(self) -> tuple[DataFrame, DataFrame | None] | None:
        """(cm, cm_wide-or-None) readers when the index carries the
        build-time chunk-max stage AND its grid matches this engine's —
        else None (engine falls back to the per-query metadata
        aggregation).  Segmented engines hard-disable the sidecar
        (class override: their bounds need idf-RESCALED maxima over the
        segment union, and a same-domain segment would pass the grid
        check)."""
        if not self.CM_SIDECAR:
            return None
        idx = getattr(self, "index", None)
        if idx is None:
            return None
        try:
            st = idx._manifest()["stages"]["cm"]
        except (KeyError, FileNotFoundError):
            return None
        if "wide_rows" not in st:
            # sidecar from an incompatible (pre-wide_rows) build:
            # soundness requires knowing whether wide blocks exist
            return None
        if (int(st["lo"]), int(st["width"]), int(st["n_chunks"])) != \
                self._chunk_grid():
            return None
        wide = (
            idx.io.read(self.spark, "cm_wide")
            if int(st["wide_rows"] or 0)
            else None
        )
        return idx.io.read(self.spark, "cm"), wide

    def _chunk_expr(self, col, lo: int, width: int):
        # doc ids ≤ 2^53 stay exact through the double division
        return F.floor((col - F.lit(lo)) / F.lit(width)).cast("int")

    def _cm_arrays(self, tb: DataFrame, terms: list[str]) -> dict[str, np.ndarray]:
        """term → dense array cm with cm[c] = max block_max_score of
        the term over blocks overlapping chunk c (0 where the term has
        no block — BM25 scores are strictly positive, so cm[c] > 0 is
        an exact per-chunk presence test).

        cm comes from ONE metadata-only aggregation over the query
        terms' block stats (payload column pruned at the scan); the
        disjoint-interval structure of a term's blocks bounds the
        explode at n_blocks + n_chunks rows per term, so the job and
        the driver arrays are O(metadata), never O(postings).
        Memoized per term in hot-serving mode (grid is engine-fixed)."""
        lo, width, n = self._chunk_grid()
        missing = (
            terms
            if self._cm_memo is None
            else [t for t in terms if t not in self._cm_memo]
        )
        built: dict[str, np.ndarray] = {}
        if missing:
            for t in missing:
                built[t] = np.zeros(n)
            side = self._cm_sidecar()
            if side is not None:
                # serve from the build-time sidecar: two pruned scans
                # (bucket directory + term row-group stats) of ≤
                # n_chunks rows/term — no aggregation job per cold term
                cm_df, wide_df = side
                for r in (
                    self._bucket_filter(cm_df, missing)
                    .filter(F.col("term").isin(missing))
                    .select("term", "c", "m")
                    .collect()
                ):
                    built[r["term"]][r["c"]] = r["m"]
                if wide_df is not None:
                    for r in (
                        self._bucket_filter(wide_df, missing)
                        .filter(F.col("term").isin(missing))
                        .select("term", "c1", "c2", "m")
                        .collect()
                    ):
                        a = built[r["term"]]
                        s = slice(int(r["c1"]), int(r["c2"]) + 1)
                        np.maximum(a[s], r["m"], out=a[s])
            else:
                rows = (
                    tb.filter(F.col("term").isin(missing))
                    .select(
                        "term",
                        "block_max_score",
                        F.explode(
                            F.sequence(
                                self._chunk_expr(F.col("first_doc"), lo, width),
                                self._chunk_expr(F.col("max_doc"), lo, width),
                            )
                        ).alias("c"),
                    )
                    .groupBy("term", "c")
                    .agg(F.max("block_max_score").alias("m"))
                    .collect()
                )
                for r in rows:
                    built[r["term"]][r["c"]] = r["m"]
            if self._cm_memo is not None:
                self._cm_memo.update(built)
        return {
            t: (built[t] if t in built else self._cm_memo[t]) for t in terms
        }

    def _oth_arrays(
        self,
        tb: DataFrame,
        terms: list[str],
        boosts: dict[str, float] | None = None,
    ) -> dict[str, list]:
        """term → dense array A with A[c] ≥ Σ_{t'≠t} cm(t', c) ·
        boost(t'): the per-chunk other-term score bound of the module
        docstring.  cm arrays stay unboosted in the memo; boosts scale
        here (the _OM_UP guard also covers that multiply)."""
        cm = self._cm_arrays(tb, terms)
        n = self._chunk_grid()[2]
        # sum-of-OTHERS computed directly per term (never total − own:
        # cancellation there can under-bound by ~eps·total absolute
        # when one term dominates a chunk)
        out: dict[str, list] = {}
        for t in terms:
            others = [
                a * boosts[t2] if boosts else a
                for t2, a in cm.items()
                if t2 != t
            ]
            oth = np.sum(others, axis=0) if others else np.zeros(n)
            out[t] = (oth * self._OM_UP).tolist()
        return out

    # -- scoring fast paths ---------------------------------------------------

    # Max blocks decoded per term by the θ probe (64 × 128-posting
    # blocks = ≤8,192 postings/term) — keeps the probe O(terms·k)-ish
    # even when a wide-range block drags the overlap filter open.
    PROBE_BLOCK_BUDGET = 64

    def _probe_theta(
        self,
        tb: DataFrame,
        k: int,
        boosts: dict[str, float] | None = None,
    ) -> float:
        """θ by probing: decode the highest-impact blocks per term
        (covering ≥k postings each) PLUS every query-term block whose
        doc range overlaps one of those probe blocks, sum per doc —
        each per-doc partial sum is a valid lower bound on that doc's
        total, so the k-th best across DISTINCT docs lower-bounds the
        k-th best total.  The range alignment matters for multi-term
        queries: without it, each term's top blocks can cover disjoint
        doc ranges and the per-doc sums never see a multi-term doc, so
        θ collapses to the best SINGLE-term score (measured: 0.49 vs
        the true ~0.99 k-th total for `merge join` at 3M docs,
        BENCH/PLANS.md pruning table).  Costs one tiny metadata collect
        (≤ |terms|·⌈k/block⌉ rows) + one decode job over
        ≤ |probe blocks|·|terms| blocks."""
        w = Window.partitionBy("term").orderBy(
            F.desc("block_max_score"), F.asc("first_doc")
        )
        seed_meta = (
            tb.withColumn("cum_n", F.sum("n").over(w))
            .filter(F.col("cum_n") - F.col("n") < k)
            .select("first_doc", "max_doc")
            .collect()
        )
        if not seed_meta:
            return 0.0
        # merge the seed doc ranges driver-side (tiny), then decode all
        # query-term blocks overlapping any of them — per-doc sums then
        # include every term's contribution over the probed ranges
        spans = sorted((r["first_doc"], r["max_doc"]) for r in seed_meta)
        merged: list[tuple[int, int]] = [spans[0]]
        for lo, hi in spans[1:]:
            if lo <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        overlap = None
        for lo, hi in merged:
            cond = (F.col("first_doc") <= F.lit(hi)) & (
                F.col("max_doc") >= F.lit(lo)
            )
            overlap = cond if overlap is None else (overlap | cond)
        # bound the decode: a RARE term's single block can span the
        # whole doc space, making the overlap filter select every block
        # of every term — cap blocks per term (highest-impact first; θ
        # stays a valid lower bound whichever blocks are decoded)
        w_cap = Window.partitionBy("term").orderBy(
            F.desc("block_max_score"), F.asc("first_doc")
        )
        probe = (
            tb.filter(overlap)
            .withColumn("_rn", F.row_number().over(w_cap))
            .filter(F.col("_rn") <= self.PROBE_BLOCK_BUDGET)
            .select("term", "first_doc", "payload", "idf")
        )
        decoded = self._decode(probe)
        if boosts:
            # boosted partial sums stay valid lower bounds per doc; a
            # DOWN relief below covers the extra multiply's rounding
            decoded = self._apply_boosts(decoded, boosts)
        probe_topk = (
            decoded
            .groupBy("doc_id")
            .agg(F.sum("score").alias("s"))
            .orderBy(F.desc("s"))
            .limit(k)
            .collect()
        )
        if len(probe_topk) < k:
            return 0.0
        theta = float(probe_topk[-1]["s"])
        return theta * (2.0 - self._OM_UP) if boosts else theta

    def _or_pruned_survivors(
        self,
        terms: list[str],
        k: int,
        theta_mode: str = "dict",
        aligned: bool | None = None,
        boosts: dict[str, float] | None = None,
    ) -> tuple[DataFrame, DataFrame, float] | None:
        """(candidate blocks, surviving blocks, θ) for a flat OR query —
        the shared core of _topk_or_pruned and pruning_stats.  None when
        no query term exists in the index.  `aligned` (default:
        OM_ALIGNED) adds the range-aligned other-term bound on top of
        the loose Σ gmax filter (module docstring Phase 3).

        `boosts` (term → positive factor, tantivy `term^2`): every
        per-term quantity in the bound scales linearly — gmax/cm by the
        term's boost with an UP guard (a bound rounding low would
        over-prune), θ (s10·boost) with a DOWN guard (θ must stay a
        lower bound on the k-th best boosted total), and the block's
        own bm(b) by a boost column from the same broadcast dim.  With
        no boosts the unboosted plan is byte-identical to before."""
        tb = self._term_blocks(terms)
        meta = self._term_meta(terms)  # one pruned scan of tiny rows
        if not meta:
            return None
        bst = {t: float((boosts or {}).get(t, 1.0)) for t in meta}
        has_boost = any(b != 1.0 for b in bst.values())
        if len(set(terms)) == 1:
            # single term: prune condition is bm(b)·boost ≥ θ directly
            gmax, gsum = {terms[0]: 0.0}, 0.0
        else:
            gmax = {
                t: float(m["gmax"]) * bst[t] for t, m in meta.items()
            }
            if has_boost:
                # UP guard: the boosted other-term bound must never
                # round below its real value
                gmax = {t: g * self._OM_UP for t, g in gmax.items()}
            gsum = float(sum(gmax.values()))

        # θ from the term dictionary — zero extra jobs: s_k(t) is (a
        # lower bound on) the k-th best single-term score of t; every
        # one of those ≥k docs has total ≥ its t-score, so the k-th best
        # TOTAL ≥ max_t s_k(t).  With deletes the dictionary values may
        # count tombstoned docs (no longer lower bounds on LIVE totals)
        # — probe-θ over filtered decodes is the valid substitute.
        theta = 0.0
        pboosts = bst if has_boost else None
        if self._has_deletes():
            theta = self._probe_theta(tb, k, boosts=pboosts)
        else:
            if k <= 10:
                theta = max(
                    float(m["s10"] or 0.0) * bst[t]
                    for t, m in meta.items()
                )
            elif k <= 100:
                theta = max(
                    float(m["s100"] or 0.0) * bst[t]
                    for t, m in meta.items()
                )
            if has_boost and theta > 0.0:
                # DOWN guard on the boost multiply (θ is a lower bound)
                theta *= 2.0 - self._OM_UP
            if theta_mode == "probe" or (theta == 0.0 and k > 100):
                theta = max(theta, self._probe_theta(tb, k, boosts=pboosts))

        # prune: drop block b iff  bm(b)·b(t) + (gsum − gmax(term(b)))
        # < θ  (boost column only present when a boost ≠ 1).  The
        # (term → gmax[, _bb]) lookup is ≤|terms| rows: the literal
        # path attaches it as CASE columns (lookup_expr — one fewer
        # job per query), the join twin as a broadcast dim; both feed
        # the identical `pred`.
        bm_eff = (
            F.col("block_max_score") * F.col("_bb")
            if has_boost
            else F.col("block_max_score")
        )
        pred = bm_eff + (F.lit(gsum) - F.col("gmax")) >= F.lit(theta)
        if aligned is None:
            aligned = self.OM_ALIGNED and (
                sum(int(m.get("n_blocks") or 0) for m in meta.values())
                >= self.OM_MIN_BLOCKS
            )
        if aligned and theta > 0.0 and len(gmax) > 1:
            # range-aligned bound: bm(b) + max_{c∈chunks(b)} OTH_t[c]
            # ≥ θ, with OTH arrays embedded as per-term literal arrays
            # (ONE Literal node each — never element-wise expression
            # trees, and never a join that would copy a wide array
            # onto every candidate block row)
            oth = self._oth_arrays(tb, sorted(gmax), boosts=pboosts)
            lo, width, _n = self._chunk_grid()
            c1 = self._chunk_expr(F.col("first_doc"), lo, width)
            c2 = self._chunk_expr(F.col("max_doc"), lo, width)
            length = c2 - c1 + F.lit(1)
            om = None
            for t, arr in oth.items():
                # ship each array as ONE json STRING literal and let
                # ConstantFolding evaluate from_json into the array
                # literal JVM-side: F.lit(list) crosses py4j element by
                # element — measured 8 s per 16384-double literal, 40 s
                # of pure driver time on a 5-term query (the round-4
                # scaling draw caught it); the json form is ~0.1 s.
                # json round-trips doubles exactly (shortest repr).
                arr_col = F.from_json(F.lit(json.dumps(arr)), "array<double>")
                rng = F.array_max(F.slice(arr_col, c1 + F.lit(1), length))
                om = (
                    F.when(F.col("term") == t, rng)
                    if om is None
                    else om.when(F.col("term") == t, rng)
                )
            # unmatched terms (shouldn't occur: tb ⊆ dictionary terms)
            # fall back to the always-sound loose bound
            om = om.otherwise(F.lit(gsum))
            # wide-range blocks (rare, low-df) skip the O(span) slice
            # and keep the loose bound — dropping a tight bound is
            # always sound
            pred = pred & (
                (length > F.lit(self.OM_SLICE_CAP))
                | (bm_eff + om >= F.lit(theta))
            )
        if self.TINY_LOOKUP_LITERAL:
            # isin reproduces the inner join's drop of any block row
            # whose term lacks a dictionary row (shouldn't occur)
            lk = tb.filter(F.col("term").isin(list(gmax))).withColumn(
                "gmax",
                lookup_expr(F.col("term"), {t: float(g) for t, g in gmax.items()}),
            )
            if has_boost:
                lk = lk.withColumn(
                    "_bb",
                    lookup_expr(
                        F.col("term"),
                        {t: bst[t] * self._OM_UP for t in gmax},
                    ),
                )
            survivors = lk.filter(pred)
        else:
            if has_boost:
                gmax_df = F.broadcast(
                    self.spark.createDataFrame(
                        [
                            (t, float(g), bst[t] * self._OM_UP)
                            for t, g in gmax.items()
                        ],
                        ["term", "gmax", "_bb"],
                    )
                )
            else:
                gmax_df = F.broadcast(
                    self.spark.createDataFrame(
                        [(t, float(g)) for t, g in gmax.items()],
                        ["term", "gmax"],
                    )
                )
            survivors = tb.join(gmax_df, "term").filter(pred)
        return tb, survivors, theta

    def _topk_or_pruned(
        self,
        terms: list[str],
        k: int,
        theta_mode: str = "dict",
        aligned: bool | None = None,
        boosts: dict[str, float] | None = None,
    ) -> DataFrame:
        parts = self._or_pruned_survivors(
            terms, k, theta_mode, aligned, boosts=boosts
        )
        if parts is None:
            return self._empty()
        _tb, survivors, _theta = parts
        decoded = self._decode(survivors)
        if boosts:
            decoded = self._apply_boosts(decoded, boosts)
        return (
            decoded
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def _and_bitmap(self, must_set: list[str]) -> np.ndarray | None:
        """And-reduced per-chunk presence of the must terms: a boolean
        array I with I[c] = every must term has ≥1 block overlapping
        chunk c.  SOUNDNESS: a doc d matching ALL must terms lies in
        chunk c(d), and each must term's block containing d overlaps
        c(d), so I[c(d)] is True — any block whose chunk span holds no
        True chunk contains no intersection doc and may be skipped for
        every query term (including must_not: a neg block with no
        intersection doc removes nothing).  Strictly tighter than
        testing each term's presence separately (∃c ∀t vs ∀t ∃c).
        None = bitmap is all-True (no pruning possible; skip the
        filter).  All-False = the intersection is provably empty."""
        if len(must_set) < 1:
            return None
        cm = self._cm_arrays(self._term_blocks(must_set), must_set)
        inter = None
        for t in must_set:
            p = cm[t] > 0.0
            inter = p if inter is None else (inter & p)
        return None if bool(inter.all()) else inter

    def _bitmap_pred(self, inter: np.ndarray):
        """Column predicate: block survives iff its chunk span touches
        a True chunk (wide-range blocks escape the O(span) slice and
        are kept — dropping a pruning opportunity is always sound)."""
        lo, width, _n = self._chunk_grid()
        c1 = self._chunk_expr(F.col("first_doc"), lo, width)
        c2 = self._chunk_expr(F.col("max_doc"), lo, width)
        length = c2 - c1 + F.lit(1)
        # one json STRING literal per query, constant-folded JVM-side
        # (never F.lit(list): py4j crosses element-wise — see the OR
        # path note at _or_pruned_survivors)
        arr = F.from_json(
            F.lit(json.dumps(inter.astype(int).tolist())), "array<int>"
        )
        return (length > F.lit(self.OM_SLICE_CAP)) | (
            F.array_max(F.slice(arr, c1 + F.lit(1), length)) == F.lit(1)
        )

    # Max rarest-term block-interval rows we are willing to broadcast
    # for the AND-path range restriction.  When every must term is a
    # head term ("the AND of"), the rarest still has df/128 blocks — at
    # 10^12 docs that's ~10^10 rows, which would OOM the driver.  Above
    # the budget the restriction is skipped: the matched-count filter
    # alone is still exact, we only lose a pruning heuristic.
    RANGE_BROADCAST_BUDGET = 65536
    # The range restriction is a broadcast NESTED-LOOP join: its cost
    # is |ranges| × |candidate blocks| predicate evaluations.  Bounding
    # only the broadcast side lets two mid-frequency terms multiply
    # into O(10^8+) comparisons that outweigh the decode they save
    # (measured: q_and 5.5–9.9 s at 3M docs where plain decode+filter
    # is ~2 s) — so the PRODUCT is budgeted too.
    RANGE_JOIN_PRODUCT_BUDGET = 1 << 26
    # Master switch (A/B-able): serve the rarest-term restriction as a
    # pure column predicate over json-literal span arrays instead of a
    # broadcast nested-loop semi-join.  Spans are the rarest term's
    # block doc-intervals collected driver-side (one tiny metadata job,
    # memoized per term in hot mode — the broadcast twin pays its
    # materialize job EVERY query) and merged (disjoint + sorted per
    # term; integer-adjacent merge is exact over integer doc_ids) —
    # contiguous head-term blocks collapse to ~1 span.  The predicate
    # is O(|spans|) per block row via a sorted-interval trick (the only
    # span that can overlap [a, b] from the left is the LAST one with
    # lo ≤ b — earlier spans overlapping would force that one to as
    # well), same work class as the nested-loop join under the same
    # PRODUCT budget.  Falls back to the join twin above
    # RANGE_PRED_MAX_SPANS (json-literal size + per-row cost ceiling).
    RANGE_PRED_LITERAL = True
    RANGE_PRED_MAX_SPANS = 4096
    # Master switch (A/B-able): evaluate must_not inside the main
    # decode aggregation (one scan, one shuffle) instead of a second
    # decode + doc_id anti-join.  See the fused-NOT note in _topk_bool.
    NOT_FUSED = True
    # Master switch (A/B-able): evaluate phrases as ONE decode scan +
    # ONE groupBy(doc_id) aggregation scoring from the payload's dl
    # column (dl-mode indexes only), instead of one join per phrase
    # ordinal plus a doclens-table join.  See eval_phrase_fused.
    PHRASE_FUSED = True
    # Batched twin of PHRASE_FUSED: top-level pure-phrase queries in a
    # search_many batch share ONE positions decode over the
    # deduplicated union of their restricted blocks + ONE
    # groupBy(qid, doc_id) aggregation, instead of one decode scan and
    # one shuffle per phrase.  Off → each phrase evaluates as its own
    # qid-tagged subplan (the generic-path twin).  See _phrases_shared.
    BATCH_PHRASE_SHARED = True
    # Batched shared decode for the flat must/should/must_not class
    # (AND / NOT / prune-off shapes): one pruned scan over the OR of
    # the per-query restriction predicates + one groupBy(qid, doc_id)
    # evaluating _topk_bool's fused aggregation per qid.  Off → one
    # _topk_bool subplan per query (the executable twin).  See
    # _bools_shared.
    BATCH_BOOL_SHARED = True
    # Shared-vs-subplans crossover: share only while the df-weighted
    # term duplication across the batch (Σ_q Σ_{t∈q} df / df of the
    # union) stays at or below this — beyond it the fan-out rows cost
    # more than the saved scan (3M measurement in _bools_shared).
    BATCH_BOOL_FANOUT_MAX = 2.5

    def _term_spans(self, term: str) -> tuple[list[int], list[int]]:
        """Merged (sorted, disjoint, integer-adjacent-collapsed) doc
        intervals of a term's blocks: ([lo...], [hi...]).  One tiny
        metadata collect, memoized per term in hot mode."""
        if self._ranges_memo is not None and term in self._ranges_memo:
            return self._ranges_memo[term]
        rows = (
            self._term_blocks([term])
            .select("first_doc", "max_doc")
            .collect()
        )
        spans = sorted((int(r["first_doc"]), int(r["max_doc"])) for r in rows)
        los: list[int] = []
        his: list[int] = []
        for lo, hi in spans:
            if his and lo <= his[-1] + 1:
                his[-1] = max(his[-1], hi)
            else:
                los.append(lo)
                his.append(hi)
        if self._ranges_memo is not None:
            self._ranges_memo[term] = (los, his)
        return los, his

    @staticmethod
    def _interval_pred(los: list[int], his: list[int]):
        """Column predicate: block [first_doc, max_doc] overlaps some
        span.  Spans sorted + disjoint ⇒ overlap iff the last span
        with lo ≤ max_doc exists and its hi ≥ first_doc (any earlier
        overlapping span implies this one overlaps too)."""
        lo_arr = F.from_json(F.lit(json.dumps(los)), "array<bigint>")
        hi_arr = F.from_json(F.lit(json.dumps(his)), "array<bigint>")
        n_le = F.size(F.filter(lo_arr, lambda x: x <= F.col("max_doc")))
        return F.when(
            n_le > F.lit(0),
            F.element_at(hi_arr, n_le) >= F.col("first_doc"),
        ).otherwise(F.lit(False))

    def _bool_restriction(
        self,
        must_set: list[str],
        all_terms: list[str],
        meta: dict[str, dict] | None = None,
    ) -> tuple[bool, object | None, DataFrame | Column | None]:
        """(empty, bitmap_pred, rarest_ranges) for the flat must path.
        empty=True → the intersection is provably empty from metadata
        alone (zero-postings must term, or all-False intersection
        bitmap) — skip every decode job.  `meta` lets a caller that
        already fetched the dictionary rows (the phrase path, for
        idf_sum) avoid a second cold-mode lookup."""
        # one scan fetches meta for every query term: the must checks
        # need must_set, the product budget needs them all
        if meta is None:
            meta = self._term_meta(all_terms)
        if len([t for t in must_set if t in meta]) < len(must_set):
            # a must term with zero postings → the intersection is
            # empty (Lucene semantics); skip all decode work
            return True, None, None
        n_total = sum(int(m.get("n_blocks") or 0) for m in meta.values())
        bitmap_pred = None
        # a single-must-term bitmap still restricts the OTHER query
        # terms' blocks to where the must term lives; only a query
        # that IS one bare must term has nothing to prune
        useful = len(must_set) > 1 or len(all_terms) > len(must_set)
        if self.AND_BITMAP and useful and n_total >= self.OM_MIN_BLOCKS \
                and min(float(meta[t]["gmax"]) for t in must_set) > 0.0:
            inter = self._and_bitmap(must_set)
            if inter is not None:
                if not bool(inter.any()):
                    return True, None, None
                bitmap_pred = self._bitmap_pred(inter)
        # every candidate doc appears in the rarest must term's
        # postings, so every relevant block of ANY term overlaps one
        # of that term's (doc-ordered) block intervals — restrict
        # all scans to those intervals (broadcast nested-loop
        # semi-join on range overlap).  A doc d in the intersection
        # sits in some rarest-block [lo,hi] and in each of its other
        # term blocks [a,b] with a≤d≤b → the intervals overlap at d,
        # so no contributing block is pruned: scores are exact.
        rarest_ranges = None
        rarest = min(must_set, key=lambda t: meta[t]["df"])
        n_rarest = int(meta[rarest].get("n_blocks") or 0)
        if n_rarest <= self.RANGE_BROADCAST_BUDGET:
            if self.RANGE_PRED_LITERAL:
                # speculative collect (one tiny metadata job, memoized
                # hot): merging re-prices the restriction — a
                # band-local rarest term collapses to a handful of
                # spans, so the PRODUCT budget evaluated on the MERGED
                # count engages restriction where the raw block count
                # would blow it (e.g. 1.5k one-band blocks × 55k
                # candidates fails pre-merge, but is 1 span × 55k
                # post-merge).  Strictly more pruning coverage than
                # the join twin; exactness unchanged (the restriction
                # is sound at any coverage).
                los, his = self._term_spans(rarest)
                if (
                    len(los) <= self.RANGE_PRED_MAX_SPANS
                    and len(los) * n_total
                    <= self.RANGE_JOIN_PRODUCT_BUDGET
                ):
                    return False, bitmap_pred, self._interval_pred(los, his)
                # fell through: merged spans still too many — the join
                # twin below may still fit its own (pre-merge) budgets
            if n_rarest * n_total <= self.RANGE_JOIN_PRODUCT_BUDGET:
                rarest_ranges = F.broadcast(
                    self._term_blocks([rarest])
                    .select(
                        F.col("first_doc").alias("r_lo"),
                        F.col("max_doc").alias("r_hi"),
                    )
                )
        return False, bitmap_pred, rarest_ranges

    @staticmethod
    def _restrict_blocks(
        blocks: DataFrame, bitmap_pred, rarest_ranges: DataFrame | Column | None
    ) -> DataFrame:
        """Apply a _bool_restriction result to candidate blocks: the
        intersection-bitmap column filter, then the rarest-term
        interval restriction — a literal-span Column predicate
        (RANGE_PRED_LITERAL) or the broadcast semi-join twin (both
        optional; both exact — see _and_bitmap / _bool_restriction
        soundness notes)."""
        if bitmap_pred is not None:
            blocks = blocks.filter(bitmap_pred)
        if rarest_ranges is None:
            return blocks
        if isinstance(rarest_ranges, Column):
            return blocks.filter(rarest_ranges)
        return blocks.join(
            rarest_ranges,
            (F.col("first_doc") <= F.col("r_hi"))
            & (F.col("max_doc") >= F.col("r_lo")),
            "left_semi",
        )

    def _topk_bool(self, must: list[str], should: list[str],
                   must_not: list[str], k: int,
                   boosts: dict[str, float] | None = None) -> DataFrame:
        must_set = sorted(set(must))
        bitmap_pred, rarest_ranges = None, None
        if must:
            all_terms = sorted(set(must) | set(should) | set(must_not))
            empty, bitmap_pred, rarest_ranges = self._bool_restriction(
                must_set, all_terms
            )
            if empty:
                return self._empty()

        def restrict(blocks: DataFrame) -> DataFrame:
            return self._restrict_blocks(blocks, bitmap_pred, rarest_ranges)

        pos_terms = list(dict.fromkeys(must + should))
        neg_set = sorted(set(must_not))
        # Fused NOT: decode positive AND negative terms in ONE pruned
        # scan and exclude flagged docs in the SAME aggregation,
        # instead of a second decode + doc_id anti-join (one fewer
        # scan and one fewer shuffle at any scale).  Exactness: the
        # score sums only positive rows (the WHEN yields NULL for neg
        # rows, which collect_list skips), and a doc is dropped iff it
        # has ANY neg posting — exactly the anti-join's semantics; the
        # block restriction was already soundly applied to the neg
        # scan (a candidate doc's neg block overlaps the doc itself,
        # hence the must intervals/chunks at it).
        fuse_neg = bool(neg_set) and self.NOT_FUSED
        scan_terms = (
            pos_terms + [t for t in neg_set if t not in pos_terms]
            if fuse_neg
            else pos_terms
        )
        scored = self._decode(restrict(self._term_blocks(scan_terms)))
        if boosts:
            # per-posting boost multiply; the term column survives for
            # the matched-must count below
            scored = self._apply_boosts(scored, boosts)
        entry = F.struct(F.col("term"), F.col("score"))
        if fuse_neg:
            entry = F.when(F.col("term").isin(pos_terms), entry)
        aggs = [
            _ordered_sum(entry).alias("score"),
            F.count_distinct(
                F.when(F.col("term").isin(must_set), F.col("term"))
            ).alias("_nm"),
        ]
        if fuse_neg:
            aggs.append(
                F.max(
                    F.when(F.col("term").isin(neg_set), F.lit(1))
                ).alias("_neg")
            )
        agg = scored.groupBy("doc_id").agg(*aggs)
        if must:
            agg = agg.filter(F.col("_nm") == len(must_set))
        if fuse_neg:
            agg = agg.filter(F.col("_neg").isNull())
        agg = agg.select("doc_id", "score")
        if must_not and not fuse_neg:
            neg = self._decode(
                restrict(self._term_blocks(neg_set))
            ).select("doc_id").distinct()
            agg = agg.join(neg, "doc_id", "left_anti")
        return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "doc_id bigint, score double"
        )

    def _bools_shared(
        self,
        bool_class: dict,
        limit: int,
    ) -> tuple[DataFrame | None, dict]:
        """Shared decode for a batch of flat must/should/must_not
        queries — the bool-shape twin of the pure-OR batch branch:
        ONE pruned block scan + decode + groupBy(qid, doc_id) instead
        of a subplan per query.

        Per query the same machinery as _topk_bool applies: its
        _bool_restriction (intersection bitmap + rarest-term interval)
        is computed per qid, and the shared scan keeps a block iff ANY
        query's restricted candidate set keeps it (per-query predicates
        OR-ed over one scan).  Exactness per qid: a restriction is
        sound — every posting of every doc matching q survives q's own
        predicate, hence the union — and extra decoded rows can only
        belong to docs that fail q's matched-must count (or land below
        its top-k), never change a matching doc's sum: each posting
        lives in exactly one block so the one-pass union decodes it
        once.  Fan-out to queries is a broadcast (qid, term,
        is_pos/is_must/is_neg[, qb]) dim; the aggregation evaluates
        _topk_bool's fused-NOT shape per (qid, doc_id) — positive-row
        sum, matched-must count, any-neg flag — with the per-qid
        must-count as a CASE literal.

        Returns (shared branch or None, leftover queries to run as
        per-query subplans): a query falls out when its restriction
        only materialized as the broadcast-join twin (not a Column
        predicate) or when NOT_FUSED is off and it has must_not terms
        (the toggle keeps the two-scan twin as the executable spec).
        """
        all_batch_terms = sorted(
            {
                t
                for (m, s, n, _) in bool_class.values()
                for t in (m + s + n)
            }
        )
        meta = self._term_meta(all_batch_terms)
        specs: dict[str, dict] = {}
        leftover: dict = {}
        for qid, (must, should, must_not, bmap) in bool_class.items():
            if must_not and not self.NOT_FUSED:
                leftover[qid] = (must, should, must_not, bmap)
                continue
            must_set = sorted(set(must))
            bitmap_pred = rarest = None
            if must:
                all_terms = sorted(set(must) | set(should) | set(must_not))
                empty, bitmap_pred, rarest = self._bool_restriction(
                    must_set,
                    all_terms,
                    meta={t: meta[t] for t in all_terms if t in meta},
                )
                if empty:
                    continue  # provably no rows for this qid
                if rarest is not None and not isinstance(rarest, Column):
                    leftover[qid] = (must, should, must_not, bmap)
                    continue
            pos = list(dict.fromkeys(must + should))
            neg = sorted(set(must_not))
            scan = pos + [t for t in neg if t not in pos]
            present = [t for t in scan if t in meta]
            if not present:
                continue  # none of the terms exist — no rows
            specs[qid] = {
                "pos": set(pos),
                "must": set(must_set),
                "neg": set(neg),
                "scan": present,
                "bmap": bmap or {},
                "bitmap": bitmap_pred,
                "rarest": rarest,
            }
        if not specs:
            return None, leftover

        # Fan-out guard (measured at 3M, BENCH/bool_batch_ab_r5.log):
        # the shared aggregation's input is decoded rows × the qids
        # sharing each term, so a batch whose queries reuse the same
        # heavy terms pays more in fan-out shuffle volume than the one
        # scan saves — a 9-bool batch with merge/data in 4-5 queries
        # ran 1.48× SLOWER shared (31.9 vs 21.5 s) while a mixed batch
        # at duplication 2.0 ran 1.52× FASTER (17.9 vs 27.3 s).  The
        # df-weighted duplication factor prices it from the metadata
        # already in hand (zero extra jobs); above the threshold every
        # query runs as its own subplan in the same action (the twin).
        union_terms = sorted({t for sp in specs.values() for t in sp["scan"]})
        union_df = sum(float(meta[t]["df"]) for t in union_terms)
        total_df = sum(
            float(meta[t]["df"])
            for sp in specs.values()
            for t in sp["scan"]
        )
        if union_df > 0 and total_df / union_df > self.BATCH_BOOL_FANOUT_MAX:
            leftover.update(
                {qid: bool_class[qid] for qid in specs}
            )
            return None, leftover
        preds = []
        for sp in specs.values():
            p = F.col("term").isin(sp["scan"])
            if sp["bitmap"] is not None:
                p = p & sp["bitmap"]
            if sp["rarest"] is not None:
                p = p & sp["rarest"]
            preds.append(p)
        shared_pred = preds[0]
        for p in preds[1:]:
            shared_pred = shared_pred | p
        blocks = self._term_blocks(union_terms).filter(shared_pred)

        boosted = any(
            sp["bmap"].get(t, 1.0) != 1.0
            for sp in specs.values()
            for t in sp["scan"]
        )
        rows = []
        need_nm: dict[str, int] = {}
        for qid, sp in specs.items():
            need_nm[qid] = len(sp["must"] & set(sp["scan"]))
            for t in sp["scan"]:
                r = [
                    qid, t,
                    t in sp["pos"], t in sp["must"], t in sp["neg"],
                ]
                if boosted:
                    r.append(float(sp["bmap"].get(t, 1.0)))
                rows.append(tuple(r))
        qmap = F.broadcast(
            self.spark.createDataFrame(
                rows,
                "qid string, term string, is_pos boolean, "
                "is_must boolean, is_neg boolean"
                + (", _qb double" if boosted else ""),
            )
        )
        scored = self._decode(blocks).join(qmap, "term")
        sc = F.col("score") * F.col("_qb") if boosted else F.col("score")
        # order-canonical sum (module helper): bit-identical to the
        # per-query _topk_bool plan on massive ties — see _ordered_sum
        pos_score = F.when(
            F.col("is_pos"), F.struct(F.col("term"), sc.alias("score"))
        )
        agg = scored.groupBy("qid", "doc_id").agg(
            _ordered_sum(pos_score).alias("score"),
            F.count_distinct(
                F.when(F.col("is_must"), F.col("term"))
            ).alias("_nm"),
            F.max(F.when(F.col("is_neg"), F.lit(1))).alias("_neg"),
        )
        out = (
            agg.filter(
                F.col("_nm") == lookup_expr(F.col("qid"), need_nm)
            )
            .filter(F.col("_neg").isNull())
            .select("qid", "doc_id", "score")
        )
        return out, leftover

    # -- public ---------------------------------------------------------------

    def pruning_stats(
        self,
        query: str,
        k: int = 10,
        theta_mode: str = "dict",
        aligned: bool | None = None,
    ) -> dict:
        """Block-max pruning evidence for a flat OR query: how many
        candidate blocks/postings the query terms own vs how many
        survive the θ filter (the fraction actually decoded).  These
        are the counters that show the BMW design pruning — sub-second
        small-corpus latencies are scheduling-bound and never do
        (tools/pruning_evidence.py records them at 3M docs for
        BENCH/PLANS.md)."""
        ast = parse_query(query)
        terms = [t.term for t in ast.should if isinstance(t, Term)]
        assert (
            terms
            and not ast.must
            and not ast.must_not
            and len(terms) == len(ast.should)
        ), "pruning_stats covers flat pure-OR queries (the θ-pruned path)"
        out = {
            "query": query, "k": k, "theta_mode": theta_mode,
            "aligned": "auto" if aligned is None else aligned,
            "blocks_total": 0, "postings_total": 0,
            "blocks_survive": 0, "postings_survive": 0, "theta": 0.0,
        }
        parts = self._or_pruned_survivors(terms, k, theta_mode, aligned)
        if parts is None:
            return out
        tb, survivors, theta = parts
        tot = tb.agg(
            F.count("*").alias("b"), F.sum("n").alias("p")
        ).first()
        sur = survivors.agg(
            F.count("*").alias("b"), F.sum("n").alias("p")
        ).first()
        out.update(
            theta=float(theta),
            blocks_total=int(tot["b"] or 0),
            postings_total=int(tot["p"] or 0),
            blocks_survive=int(sur["b"] or 0),
            postings_survive=int(sur["p"] or 0),
        )
        return out

    def and_pruning_stats(self, query: str, k: int = 10) -> dict:
        """Restriction evidence for a flat must query: candidate
        blocks/postings of ALL query terms vs what survives (a) the
        intersection bitmap alone and (b) bitmap + rarest-term interval
        join — i.e. what _topk_bool would actually decode.  Counters
        are deterministic (noise-free evidence, like pruning_stats).
        `empty_proved` means metadata alone proved the intersection
        empty (zero decode jobs).  A single top-level phrase query is
        accepted too: the phrase path (_eval_phrase) applies the same
        restriction with the phrase's member terms as the must set."""
        ast = parse_query(query)
        nodes = ast.must + ast.should
        if (
            len(nodes) == 1
            and not ast.must_not
            and isinstance(nodes[0], Phrase)
        ):
            must = list(dict.fromkeys(nodes[0].terms))
            must_set = all_terms = sorted(set(must))
        else:
            must = [t.term for t in ast.must if isinstance(t, Term)]
            assert (
                must
                and len(must) == len(ast.must)
                and all(isinstance(s, Term) for s in ast.should)
                and all(isinstance(n, Term) for n in ast.must_not)
            ), ("and_pruning_stats covers flat must queries (the "
                "_topk_bool path) and single phrase queries (the "
                "_eval_phrase path)")
            must_set = sorted(set(must))
            all_terms = sorted(
                {*must}
                | {s.term for s in ast.should}
                | {n.term for n in ast.must_not}
            )
        out = {
            "query": query, "k": k, "empty_proved": False,
            "blocks_total": 0, "postings_total": 0,
            "bitmap": None, "combined": None,
        }
        tb = self._term_blocks(all_terms)
        tot = tb.agg(F.count("*").alias("b"), F.sum("n").alias("p")).first()
        out.update(
            blocks_total=int(tot["b"] or 0),
            postings_total=int(tot["p"] or 0),
        )
        empty, bitmap_pred, rarest_ranges = self._bool_restriction(
            must_set, all_terms
        )
        if empty:
            out["empty_proved"] = True
            out["bitmap"] = out["combined"] = {
                "blocks_survive": 0, "postings_survive": 0
            }
            return out

        def count(df: DataFrame) -> dict:
            r = df.agg(F.count("*").alias("b"), F.sum("n").alias("p")).first()
            return {
                "blocks_survive": int(r["b"] or 0),
                "postings_survive": int(r["p"] or 0),
            }

        bm = tb.filter(bitmap_pred) if bitmap_pred is not None else tb
        out["bitmap"] = count(bm)
        if rarest_ranges is not None:
            if isinstance(rarest_ranges, Column):
                bm = bm.filter(rarest_ranges)
            else:
                bm = bm.join(
                    rarest_ranges,
                    (F.col("first_doc") <= F.col("r_hi"))
                    & (F.col("max_doc") >= F.col("r_lo")),
                    "left_semi",
                )
        out["combined"] = count(bm)
        return out

    @staticmethod
    def _classify(
        ast,
    ) -> tuple[bool, list[str], list[str], list[str], dict[str, float]]:
        """(flat, must, should, must_not, boosts) for a parsed query.

        flat=True iff every clause is a bare Term and no clause term
        repeats — the queries the single-scan fast paths serve; shared
        by search() and search_many() so the two can't route the same
        query differently.  Boosted bare terms stay flat (the pruned
        paths scale their bounds per term); a term appearing with TWO
        different boosts needs clause-wise scoring → generic path,
        like any repeated term.  Range/All clauses are non-flat (they
        evaluate as constant scorers via the shared evaluator)."""
        must, should, must_not = [], [], []
        boosts: dict[str, float] = {}
        flat = True
        for node, bucket in (
            *[(m, must) for m in ast.must],
            *[(s, should) for s in ast.should],
            *[(n, must_not) for n in ast.must_not],
        ):
            if isinstance(node, Term):
                bucket.append(node.term)
                b = float(node.boost)
                if node.term in boosts and boosts[node.term] != b:
                    flat = False
                boosts[node.term] = b
            else:
                # Any nested node (Bool, Phrase, Range, All) → generic
                # evaluator.
                # NOTE a top-level "a AND b" parses to Bool(must=[a,b])
                # DIRECTLY (never wrapped in should), so there is no
                # flat case lost here; lifting a nested must-Bool out
                # of should would turn "(a AND b) OR c" into a
                # conjunction — wrong results, silently.
                flat = False
        # Lucene/tantivy score PER CLAUSE: "data data" sums the term's
        # score twice.  The flat fast paths dedup terms (isin), so a
        # repeated term must take the clause-wise generic path.
        if len(must) + len(should) != len(set(must) | set(should)) or \
                len(must_not) != len(set(must_not)):
            flat = False
        # the top-level Bool's own boost (`(a b)^2` without nesting is
        # normalized into it) scales every score uniformly — fold it
        # into the per-term boosts so the flat paths stay available
        if flat and ast.boost != 1.0:
            boosts = {t: b * float(ast.boost) for t, b in boosts.items()}
        return flat, must, should, must_not, boosts

    def search(
        self,
        query: str,
        limit: int = 10,
        prune: bool = True,
        theta_mode: str = "dict",
        default_fields: tuple[str, ...] = ("content",),
    ) -> DataFrame:
        """(rank, doc_id, score) top-k; rank-identical to SearchEngine.

        theta_mode: "dict" (default) takes θ from the term dictionary —
        no probe job, 2 Spark jobs per query; "probe" additionally
        decodes the top blocks per term for a tighter θ (fewer survivor
        blocks) — right at cluster scale where decode I/O outweighs a
        scheduling round-trip.

        default_fields: tantivy parse_query's unqualified-atom field
        list (plans.parser.parse_query).  Multi-field defaults expand
        to nested should-unions and evaluate on the generic path; the
        reference-default ("content",) keeps every pruned fast path."""
        ast = parse_query(query, default_fields)
        flat, must, should, must_not, boosts = self._classify(ast)
        bmap = (
            boosts if any(b != 1.0 for b in boosts.values()) else None
        )
        if flat:
            if not must and not should:
                matches = self._empty()
            elif not must and not must_not and prune:
                matches = self._topk_or_pruned(
                    should, limit, theta_mode, boosts=bmap
                )
            else:
                matches = self._topk_bool(
                    must, should, must_not, limit, boosts=bmap
                )
        else:
            # nested boolean / phrase / range / all → shared evaluator
            # over decoded blocks (_eval applies the top-level boost)
            matches = self._eval(ast).orderBy(
                F.desc("score"), F.asc("doc_id")
            ).limit(limit)
        # single-partition window over the already-limited ≤k rows —
        # intended (see planner.py rank note; advisory silenced in
        # session.get_spark)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return matches.select(
            F.row_number().over(w).alias("rank"), "doc_id", "score"
        )

    # One-sided relief on the batched post-aggregation θ filter: a
    # float64 sum of T nonnegative term scores sits within T·ulp of the
    # real sum, so relaxing θ by 1e-12 relative (≈4000 ulp) guarantees
    # no true top-k row is filtered; the only cost is a handful of
    # extra sub-θ rows that the rank window cuts anyway.
    _BATCH_THETA_RELIEF = 1.0 - 1e-12

    def _phrases_shared(
        self, phrases: dict[str, tuple[Phrase, float]]
    ) -> DataFrame | None:
        """(qid, doc_id, score) for a batch of top-level pure-phrase
        queries in ONE positions decode + ONE aggregation.

        Positions decode is the engine's costliest per-posting path; a
        batch of N phrases as per-qid subplans pays N decode scans and
        N shuffles even inside one action, and phrases drawn from real
        query streams share head words, so shared blocks decode N
        times.  Here: each phrase's blocks are restricted exactly as
        in _eval_phrase (member-conjunction bitmap + rarest-term
        spans; a metadata-proved-empty phrase contributes no rows),
        the union is deduplicated per (term, first_doc) iff any term
        serves ≥2 phrases (the dedup shuffles compressed payloads at
        ~5.5 B/posting — far cheaper than decoding shared blocks per
        phrase), decoded ONCE, fanned out to phrases by term (CASE
        literal + explode, or the broadcast-join twin), and evaluated
        per (qid, doc_id) with the same machinery as the single-query
        fused path.

        Bit-identity to ``search(q)`` per qid: the decoded set is a
        SUPERSET of each phrase's own restricted blocks (union only
        adds blocks another phrase needed; restriction soundness means
        every fully-matching doc's member postings are already in the
        phrase's own set, so extras can only add docs the member-count
        filter drops or docs whose postings are all present anyway);
        tf folds the same array_intersect(transform(+1)) chain in the
        same operand order (sloppy members ride the same greedy-walk
        UDF); the score is the same bm25_term_score on the payload dl
        with the per-qid Σidf as a CASE literal (same float64 per
        row); boosts multiply in search()'s order — Phrase.boost then
        the top-level Bool's — and ×1.0 is bit-exact, so unconditional
        multiplies keep unboosted scores identical.
        """
        n_docs, avgdl = self._stats()
        all_terms = sorted({t for p, _ in phrases.values() for t in p.terms})
        meta_all = self._term_meta(all_terms)  # one pruned scan, memoized
        blocks_parts: list[DataFrame] = []
        qattrs: dict[str, dict] = {}
        for qid, (p, ab) in sorted(phrases.items()):
            uniq = list(dict.fromkeys(p.terms))
            meta = {t: meta_all[t] for t in uniq if t in meta_all}
            blocks = self._term_blocks(uniq)
            if len(uniq) > 1:
                empty, bp, rr = self._bool_restriction(
                    sorted(uniq), sorted(uniq), meta=meta
                )
                if empty:
                    continue  # provably no match — no rows for this qid
                blocks = self._restrict_blocks(blocks, bp, rr)
            elif not meta:
                continue  # single member term with zero postings
            if is_url_term(p.terms[0]) and self.avgdl_url is None:
                continue  # no ns postings on a single-field index
            blocks_parts.append(blocks)
            qattrs[qid] = {
                "terms": list(p.terms),
                "n": len(uniq),
                "idf": sum(float(m["idf"]) for m in meta.values()),
                "slop": int(p.slop),
                "pb": float(p.boost),
                "ab": float(ab),
                # per-field length normalization (url phrases score
                # against avgdl_url; members share one field)
                "avgdl": self._avgdl_of(p.terms[0]),
            }
        if not qattrs:
            return None
        blocks_u = blocks_parts[0]
        for b in blocks_parts[1:]:
            blocks_u = blocks_u.unionByName(b)
        seen: set[str] = set()
        overlap = False
        for a in qattrs.values():
            s = set(a["terms"])
            overlap = overlap or bool(seen & s)
            seen |= s
        if overlap and len(blocks_parts) > 1:
            blocks_u = blocks_u.dropDuplicates(["term", "first_doc"])
        decoded = self._decode_positions(self._apply_range_ctx(blocks_u))
        # fan decoded rows out to the phrases that want their term
        t2q: dict[str, list[str]] = {}
        for qid, a in qattrs.items():
            for t in set(a["terms"]):
                t2q.setdefault(t, []).append(qid)
        if self.TINY_LOOKUP_LITERAL:
            qarr = None
            for t in sorted(t2q):
                w = F.col("term") == F.lit(t)
                arr = F.array(*[F.lit(q) for q in sorted(t2q[t])])
                qarr = F.when(w, arr) if qarr is None else qarr.when(w, arr)
            fanned = decoded.withColumn("qid", F.explode(qarr))
        else:
            pairs = sorted((q, t) for t, qs in t2q.items() for q in qs)
            qmap = F.broadcast(
                self.spark.createDataFrame(pairs, "qid string, term string")
            )
            fanned = decoded.join(qmap, "term")
        per_doc = (
            fanned.groupBy("qid", "doc_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("term", "positions"))
                ).alias("pmap"),
                F.max("dl").alias("dl"),
            )
            .filter(
                F.size("pmap")
                == lookup_expr(
                    F.col("qid"), {q: a["n"] for q, a in qattrs.items()}
                )
            )
        )
        # per-qid tf, selected by a CASE on qid: the exact chain is
        # row-lazy (Catalyst CASE), the slop UDFs are Arrow projections
        # evaluated eagerly for every row — other qids' rows hold NULL
        # map entries, so those get an empty same-typed array instead
        # (tf 0, greedy walk's documented empty behavior)
        tf_expr = None
        for qid, a in qattrs.items():
            arr = [F.col("pmap")[F.lit(t)] for t in a["terms"]]
            if a["slop"] == 0:
                acc = arr[0]
                for x in arr[1:]:
                    acc = F.array_intersect(
                        F.transform(acc, lambda e: e + F.lit(1)), x
                    )
                tfq = F.size(acc)
            else:
                packed = F.array(*arr)
                w0 = F.col("qid") == F.lit(qid)
                tfq = _slop_tf_udf(a["slop"])(
                    F.when(w0, packed).otherwise(F.slice(packed, 1, 0))
                )
            w = F.col("qid") == F.lit(qid)
            tf_expr = (
                F.when(w, tfq) if tf_expr is None else tf_expr.when(w, tfq)
            )
        idf_case = lookup_expr(
            F.col("qid"), {q: a["idf"] for q, a in qattrs.items()}
        )
        pb = lookup_expr(
            F.col("qid"), {q: a["pb"] for q, a in qattrs.items()}
        )
        abq = lookup_expr(
            F.col("qid"), {q: a["ab"] for q, a in qattrs.items()}
        )
        # per-qid avgdl: a plain literal when every batched phrase is
        # content-field (the single-field plan stays byte-identical),
        # a qid CASE when url phrases mix in
        avgdls = {a["avgdl"] for a in qattrs.values()}
        avgdl_expr = (
            F.lit(avgdls.pop())
            if len(avgdls) == 1
            else lookup_expr(
                F.col("qid"), {q: a["avgdl"] for q, a in qattrs.items()}
            )
        )
        return (
            per_doc.select("qid", "doc_id", "dl", tf_expr.alias("tf"))
            .filter(F.col("tf") > 0)
            .select(
                "qid",
                "doc_id",
                (
                    bm25_term_score(
                        F.col("tf"), F.col("dl"), avgdl_expr, idf_case
                    )
                    * pb
                    * abq
                ).alias("score"),
            )
        )

    def search_many(
        self,
        queries: dict[str, str],
        limit: int = 10,
        prune: bool = True,
        default_fields: tuple[str, ...] = ("content",),
    ) -> DataFrame:
        """(qid, rank, doc_id, score) for a BATCH of queries in ONE
        Spark action — per qid rank- and score-identical to
        ``search(q, limit)`` (parity property-tested on both engines).

        Serving throughput at cluster scale is bound by per-query
        driver↔cluster scheduling round-trips, not by decode work
        (bench.py: the per-query p50 floor is job scheduling).  tantivy
        amortizes nothing here because its searcher is in-process; a
        distributed engine must batch instead (reference semantics per
        query are unchanged: bids/index.py:155).

        Flat pure-OR queries (the tantivy default shape, SURVEY §4.3)
        share ONE decode:

          * the union of their terms' blocks is scanned once, pruned by
            a per-term threshold  thr(t) = min_{q ∋ t} (θ_q − gsum_q +
            gmax(t))  — the loose Σ gmax bound of _or_pruned_survivors
            rearranged per term and min-ed across the batch, shipped as
            a tiny broadcast dim (term, thr).  A block dropped by thr
            is dropped by EVERY batched query's own bound, so each
            query's exactness argument (module docstring) applies
            verbatim; a block kept for one query is decoded for all —
            extra completeness, never missing contributions.  The
            min() and the θ−gsum+gmax rearrangement are driver-side
            float ops, so thr takes a one-sided 1e-12 down-guard
            (keeping a razor-tie block is sound, dropping one is not).
          * decoded postings fan out to their queries via a broadcast
            (qid, term) map, then ONE groupBy(qid, doc_id) sum;
          * rows with score < θ_q (broadcast per-qid dim, with
            _BATCH_THETA_RELIEF) are dropped before ranking — θ_q
            lower-bounds the k-th best total, so the per-qid window
            sorts the near-top set, not every matching doc: at crawl
            scale the window input is O(queries × near-top docs), not
            O(queries × matches).

        Other shapes (AND / NOT / nested / phrase) join the same action
        as per-query subplans tagged with their qid — their stages
        overlap inside the one job instead of paying a round-trip each.
        With tombstones (segmented engine after deletes) the dictionary
        θ is invalid (it counts deleted docs), so the shared branch
        serves with θ=0 — no pruning, still exact, still one action.

        Queries that match nothing simply contribute no rows for their
        qid (same as search() returning an empty frame)."""
        out_schema = "qid string, rank int, doc_id bigint, score double"
        if not queries:
            return self.spark.createDataFrame([], out_schema)
        bad = [k for k in queries if not isinstance(k, str) or not k]
        if bad:
            raise ValueError(
                f"search_many qids must be non-empty strings, got {bad!r}"
            )
        or_class: dict[str, tuple[list[str], dict[str, float]]] = {}
        bool_class: dict[
            str, tuple[list[str], list[str], list[str], dict[str, float] | None]
        ] = {}
        phrase_class: dict[str, tuple[Phrase, float]] = {}
        ast_class: dict[str, Bool] = {}
        for qid, q in queries.items():
            ast = parse_query(q, default_fields)
            flat, must, should, must_not, boosts = self._classify(ast)
            bmap = (
                boosts if any(b != 1.0 for b in boosts.values()) else None
            )
            if flat:
                if not must and not should:
                    continue  # matches nothing — no rows for this qid
                if not must and not must_not and prune:
                    or_class[qid] = (should, boosts)
                else:
                    bool_class[qid] = (must, should, must_not, bmap)
            elif (
                self.BATCH_PHRASE_SHARED
                and not ast.must
                and not ast.must_not
                and len(ast.should) == 1
                and isinstance(ast.should[0], Phrase)
                and self._has_positions()
                and self.PHRASE_FUSED
                and self._phrase_dl_available()
            ):
                # top-level pure phrase → the shared-decode branch
                # (falls back to the generic per-qid subplan when any
                # switch/index capability rules the fused path out)
                phrase_class[qid] = (ast.should[0], float(ast.boost))
            else:
                ast_class[qid] = ast

        branches: list[DataFrame] = []
        if or_class:
            all_terms = sorted(
                {t for ts, _ in or_class.values() for t in ts}
            )
            meta = self._term_meta(all_terms)  # one pruned scan, memoized
            deletes = self._has_deletes()
            batch_boosted = any(
                b != 1.0
                for _, bst in or_class.values()
                for b in bst.values()
            )
            mapping: list[tuple] = []
            qtheta: list[tuple[str, float]] = []
            thr: dict[str, float] = {}
            for qid, (terms, bst) in or_class.items():
                present = sorted({t for t in terms if t in meta})
                if not present:
                    continue
                bq = {t: float(bst.get(t, 1.0)) for t in present}
                if batch_boosted:
                    mapping.extend((qid, t, bq[t]) for t in present)
                else:
                    mapping.extend((qid, t) for t in present)
                theta = 0.0
                if not deletes:
                    if limit <= 10:
                        theta = max(
                            float(meta[t]["s10"] or 0.0) * bq[t]
                            for t in present
                        )
                    elif limit <= 100:
                        theta = max(
                            float(meta[t]["s100"] or 0.0) * bq[t]
                            for t in present
                        )
                    if theta > 0.0 and any(b != 1.0 for b in bq.values()):
                        # DOWN guard on the boost multiply (θ is a
                        # lower bound on the boosted k-th best total)
                        theta *= self._BATCH_THETA_RELIEF
                qtheta.append((qid, theta))
                gsum = sum(float(meta[t]["gmax"]) * bq[t] for t in present)
                for t in present:
                    if theta > 0.0:
                        # single-present-term queries reduce to bm ≥ θ
                        # (gsum == gmax(t)) — same formula, no special
                        # case needed.  With a boost the per-term raw-bm
                        # threshold divides through by it:
                        #   bm·b + (gsum − gmax·b) ≥ θ
                        #   ⇔ bm ≥ (θ − gsum + gmax·b)/b
                        cand = (
                            theta - gsum + float(meta[t]["gmax"]) * bq[t]
                        ) / bq[t]
                        cand *= (
                            self._BATCH_THETA_RELIEF
                            if cand >= 0.0
                            else 2.0 - self._BATCH_THETA_RELIEF
                        )
                    else:
                        cand = float("-inf")
                    thr[t] = min(thr.get(t, cand), cand)
            if mapping:
                if self.TINY_LOOKUP_LITERAL:
                    # per-term min threshold over the batch as a CASE
                    # literal (≤|batch terms| rows; NULL for an
                    # unmapped term drops the row like the inner join)
                    survivors = self._term_blocks(sorted(thr)).filter(
                        F.col("block_max_score")
                        >= lookup_expr(F.col("term"), thr)
                    )
                else:
                    thr_df = F.broadcast(
                        self.spark.createDataFrame(
                            list(thr.items()), "term string, _thr double"
                        )
                    )
                    survivors = (
                        self._term_blocks(sorted(thr))
                        .join(thr_df, "term")
                        .filter(F.col("block_max_score") >= F.col("_thr"))
                        .drop("_thr")
                    )
                qmap = F.broadcast(
                    self.spark.createDataFrame(
                        mapping,
                        "qid string, term string"
                        + (", _qb double" if batch_boosted else ""),
                    )
                )
                scored = self._decode(survivors).join(qmap, "term")
                if batch_boosted:
                    # per-(qid, term) boost multiply after the fan-out:
                    # the shared decode stays unboosted, each query
                    # sees its own scaling
                    scored = scored.withColumn(
                        "score", F.col("score") * F.col("_qb")
                    ).drop("_qb")
                agg = scored.groupBy("qid", "doc_id").agg(
                    F.sum("score").alias("score")
                )
                if self.TINY_LOOKUP_LITERAL:
                    # per-qid θ as a CASE literal; an unmapped qid
                    # yields NULL ≥-comparison → dropped, exactly the
                    # inner join's behavior
                    scored = agg.filter(
                        F.col("score")
                        >= lookup_expr(F.col("qid"), dict(qtheta))
                        * F.lit(self._BATCH_THETA_RELIEF)
                    ).select("qid", "doc_id", "score")
                else:
                    tdf = F.broadcast(
                        self.spark.createDataFrame(
                            qtheta, "qid string, _theta double"
                        )
                    )
                    scored = (
                        agg.join(tdf, "qid")
                        .filter(
                            F.col("score")
                            >= F.col("_theta")
                            * F.lit(self._BATCH_THETA_RELIEF)
                        )
                        .select("qid", "doc_id", "score")
                    )
                branches.append(scored)

        if bool_class:
            if self.BATCH_BOOL_SHARED:
                shared_b, bool_left = self._bools_shared(bool_class, limit)
            else:
                shared_b, bool_left = None, bool_class
            if shared_b is not None:
                branches.append(shared_b)
            for qid, (must, should, must_not, bmap) in bool_left.items():
                if not must and not should:
                    continue
                m = self._topk_bool(
                    must, should, must_not, limit, boosts=bmap
                )
                branches.append(
                    m.select(F.lit(qid).alias("qid"), "doc_id", "score")
                )
        if phrase_class:
            shared = self._phrases_shared(phrase_class)
            if shared is not None:
                branches.append(shared)
        for qid, ast in ast_class.items():
            m = (
                self._eval(ast)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(limit)
            )
            branches.append(
                m.select(F.lit(qid).alias("qid"), "doc_id", "score")
            )

        if not branches:
            return self.spark.createDataFrame([], out_schema)
        allm = branches[0]
        for b in branches[1:]:
            allm = allm.unionByName(b)
        w = Window.partitionBy("qid").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            allm.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= limit)
            .select("qid", "rank", "doc_id", "score")
        )
