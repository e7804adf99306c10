r"""Block-max pruned top-k over the blocked index (distributed BMW).

Classic block-max WAND is a sequential cursor algorithm; per-cursor
state doesn't distribute.  This is the exact distributed reformulation
(north-star "block-max WAND over per-block max-score metadata"):

  Phase 0  scan only blocks of the query terms — parquet row-group
           pruning on the sorted `term` column makes this a sliver of
           the table (PushedFilters: In(term, [...])).
  Phase 1  θ (a lower bound on the k-th best total score): decode just
           the highest-`block_max_score` blocks per term (enough to
           cover ≥k postings) and take the k-th best *single-term*
           exact score.  Valid because total(d) ≥ any single-term
           contribution of d.
  Phase 2  prune: drop block b of term t iff
               block_max_score(b) + Σ_{t'≠t} gmax(t')  <  θ .
           EXACTNESS ARGUMENT: for any doc d appearing in a pruned
           block b of term t,
               total(d) = s_t(d) + Σ_{t'≠t} s_{t'}(d)
                        ≤ bm(b)  + Σ_{t'≠t} gmax(t')  <  θ ≤ k-th best,
           so d cannot be in the top-k; and every true top-k doc
           appears in NO pruned block, hence its decoded score is
           complete.  Partial scores of excluded docs are < θ and
           cannot displace true top-k members.  Top-k is therefore
           rank- and score-identical to full evaluation (property-
           tested against the naive engine).
  Phase 3  decode surviving blocks (mapInPandas, numpy) →
           groupBy(doc_id).sum(score) → TakeOrderedAndProject.

Pruning applies to pure-OR term queries (the default tantivy shape).
must/must_not queries evaluate via full decode of their terms' blocks
— still term-pruned scans, just no θ-pruning (the intersection itself
is selective).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.codec import decode_block
from bids_spark.plans.parser import Bool, Phrase, Term, parse_query

_DECODED = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _decode_udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if pdf.empty:
            continue
        terms, docs, scores = [], [], []
        for term, first_doc, payload in zip(
            pdf["term"], pdf["first_doc"], pdf["payload"]
        ):
            d, _tf, s = decode_block(bytes(payload), int(first_doc))
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


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """blocks(term, first_doc, payload, ...) → (term, doc_id, score)."""
    return blocks.select("term", "first_doc", "payload").mapInPandas(
        _decode_udf, _DECODED
    )


class BlockedSearchEngine:
    """Query engine over a built BlockedIndex (terms/AND/OR/NOT; phrases
    need positions → handled by the naive SearchEngine, documented)."""

    def __init__(self, spark: SparkSession, index: BlockedIndex, cache: bool = False):
        self.spark = spark
        self.index = index
        self.blocks = index.blocks(spark)
        man = index._manifest()
        self.n_buckets = int(
            man["stages"].get("blocks", {}).get("n_buckets", 0) or 0
        )
        if cache:
            # hot-serving mode: in-memory columnar blocks; term filters
            # still prune via InMemoryTableScan batch stats
            self.blocks = self.blocks.cache()

    # -- helpers -----------------------------------------------------------

    def _term_buckets(self, terms: list[str]) -> list[int]:
        """bucket ids for query terms (tiny local-relation job — must
        use Spark's xxhash64 to match the write-side bucketing)."""
        rows = (
            self.spark.createDataFrame([(t,) for t in terms], ["t"])
            .select(
                F.pmod(F.xxhash64("t"), F.lit(self.n_buckets)).cast("int").alias("b")
            )
            .distinct()
            .collect()
        )
        return [r["b"] for r in rows]

    def _term_blocks(self, terms: list[str]) -> DataFrame:
        out = self.blocks
        if self.n_buckets:
            # directory-level partition pruning first, then row-group stats
            out = out.filter(F.col("bucket").isin(self._term_buckets(terms)))
        return out.filter(F.col("term").isin(terms))

    def _flat(self, node, bucket):
        """Extract flat term lists; returns None if non-flat (nested/phrase)."""
        if isinstance(node, Term):
            bucket.append(node.term)
            return True
        return False

    # -- scoring paths -------------------------------------------------------

    def _topk_or_pruned(self, terms: list[str], k: int) -> DataFrame:
        tb = self._term_blocks(terms)
        if len(set(terms)) == 1:
            # single term: prune condition is bm(b) ≥ θ directly — the
            # per-term gmax aggregate job is unnecessary
            gmax, gsum = {terms[0]: 0.0}, 0.0
        else:
            gmax_rows = (
                tb.groupBy("term").agg(F.max("block_max_score").alias("g")).collect()
            )
            if not gmax_rows:
                return self._empty()
            gmax = {r["term"]: r["g"] for r in gmax_rows}
            gsum = float(sum(gmax.values()))

        # θ: decode only the highest-impact blocks per term (covering ≥k
        # postings each), sum per doc — each per-doc partial sum is a
        # valid lower bound on that doc's total, so the k-th best across
        # DISTINCT docs lower-bounds the k-th best total.
        w = Window.partitionBy("term").orderBy(
            F.desc("block_max_score"), F.asc("first_doc")
        )
        probe = (
            tb.withColumn("cum_n", F.sum("n").over(w))
            .filter(F.col("cum_n") - F.col("n") < k)
            .select("term", "first_doc", "payload")
        )
        probe_topk = (
            decode_blocks(probe)
            .groupBy("doc_id")
            .agg(F.sum("score").alias("s"))
            .orderBy(F.desc("s"))
            .limit(k)
            .collect()
        )
        theta = float(probe_topk[-1]["s"]) if len(probe_topk) >= k else 0.0

        # prune: drop block b iff  bm(b) + (gsum − gmax(term(b))) < θ
        gmax_df = F.broadcast(
            self.spark.createDataFrame(
                [(t, float(g)) for t, g in gmax.items()], ["term", "gmax"]
            )
        )
        survivors = tb.join(gmax_df, "term").filter(
            F.col("block_max_score") + (F.lit(gsum) - F.col("gmax")) >= F.lit(theta)
        )
        return (
            decode_blocks(survivors)
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def _topk_bool(self, must: list[str], should: list[str],
                   must_not: list[str], k: int) -> DataFrame:
        pos_terms = list(dict.fromkeys(must + should))
        scored = decode_blocks(self._term_blocks(pos_terms))
        must_set = sorted(set(must))
        agg = scored.groupBy("doc_id").agg(
            F.sum("score").alias("score"),
            F.count_distinct(
                F.when(F.col("term").isin(must_set), F.col("term"))
            ).alias("_nm"),
        )
        if must:
            agg = agg.filter(F.col("_nm") == len(must_set))
        agg = agg.select("doc_id", "score")
        if must_not:
            neg = decode_blocks(self._term_blocks(list(set(must_not)))).select(
                "doc_id"
            ).distinct()
            agg = agg.join(neg, "doc_id", "left_anti")
        return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "doc_id bigint, score double"
        )

    # -- public ---------------------------------------------------------------

    def search(self, query: str, limit: int = 10, prune: bool = True) -> DataFrame:
        """(rank, doc_id, score) top-k; rank-identical to SearchEngine."""
        ast = parse_query(query)
        must, should, must_not = [], [], []
        flat = True
        for node, bucket in (
            *[(m, must) for m in ast.must],
            *[(s, should) for s in ast.should],
            *[(n, must_not) for n in ast.must_not],
        ):
            if isinstance(node, Term):
                bucket.append(node.term)
            elif isinstance(node, Bool) and not node.should and not node.must_not \
                    and all(isinstance(m, Term) for m in node.must) and bucket is should:
                # "a AND b" at top level parses as Bool(must=[a,b]) in should
                must.extend(m.term for m in node.must)
            else:
                flat = False
        if not flat:
            raise NotImplementedError(
                "blocked index stores no positions; nested/phrase queries "
                "run on the naive SearchEngine (positions path)"
            )
        if not must and not should:
            matches = self._empty()
        elif not must and not must_not and prune:
            matches = self._topk_or_pruned(should, limit)
        else:
            matches = self._topk_bool(must, should, must_not, limit)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return matches.select(
            F.row_number().over(w).alias("rank"), "doc_id", "score"
        )
