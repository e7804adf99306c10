r"""SPIMI blocked-compressed index build — the 100 TB path.

What tantivy's writer+merge does for BIDS in one process
(/root/reference/bids/index.py:121-143: 30 MB in-RAM segments, commit
per 1000 docs, background sort-merge of segments) becomes a staged,
resumable Spark dataflow:

  stage "postings"  documents → mapInPandas SPIMI tokenize/count →
                    (term, doc_id, tf, dl)  [map-side combine, shuffle
                    on (term,doc_id) via groupBy; dl rides every row —
                    known free at tokenize time, +pf2 format]
  stage "doclens"   groupBy(doc_id).first(dl)  — NO second corpus
                    tokenize: dl ≡ Σtf over kept tokens
  stage "stats"     1-row (n_docs, avgdl)  [n_docs from the corpus,
                    so zero-token docs count toward avgdl]
  stage "termidf"   term → idf (JVM idf_expr over groupBy-df),
                    range-partitioned + sorted by term — a
                    VOCABULARY-sized shuffle, never postings-sized
  stage "blocks"    postings (joined with NOTHING) →
                    repartitionByRange(bucket, term, doc_id) +
                    sortWithinPartitions → streaming mapInPandas block
                    encoder (codec.py): idf range-read per sorted Arrow
                    batch from the termidf sidecar (pyarrow row-group
                    slice — a manual range-co-partitioned lookup),
                    scores via bm25_scores_np (the decode-time twin →
                    bit-identical payloads/metadata) → parquet sorted
                    by term.  The postings relation shuffles exactly
                    ONCE in the whole build — the mandatory range
                    partition.  (with_positions=True also packs token
                    positions — tantivy record:"position" — enabling
                    phrase queries on this path.  Join twins behind
                    SPARK_GRAFT_BUILD_IDF_JOIN / _DL_CARRY; non-parquet
                    TableIO backends fall back to the join path.)
  stage "terms"     term dictionary (bucket, term → df, gmax, idf,
                    n_blocks) — tantivy's .term files (SURVEY §2 D2);
                    query-time gmax/idf lookups become a pruned scan
                    of one tiny row per term

Scale properties:
  * head-term skew: the RANGE partitioner on (term, doc_id) splits a
    hot term ("the" ≈ every doc) across many partitions by doc-id
    range — no giant groupBy group ever materializes, blocks stay
    globally doc-ordered, and no manual salting is needed in the
    merge (SURVEY.md §7.3 #2 solved structurally).
  * term lookup: blocks parquet is written sorted by term, so
    `term = 'x'` prunes row-groups via parquet min/max stats
    (predicate pushdown visible in .explain as PushedFilters).
  * memory: the encoder is an iterator over Arrow batches; it carries
    at most one partial term-run between batches — O(batch) memory.

Resumability (north rule): each stage writes to its own parquet dir +
a manifest entry {stage, input_fingerprint, rows, seconds, bytes,
status}; re-running `build()` skips stages whose manifest entry is
`done` with a matching fingerprint (kill-and-resume test in
tests/test_blocked_index.py).  Metrics (docs/sec, postings/sec,
compressed bytes) land in the manifest — the BENCH harness reads them.
"""

from __future__ import annotations

import os
import re
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bids_spark import B, K1, MAX_TOKEN_LEN
from bids_spark.functions.fields import URL_NS as _URL_NS
from bids_spark.functions.fields import avgdl_col, url_term_col
from bids_spark.io import CommitLog, ParquetTableIO, PosixRenameLog, TableIO
from bids_spark.operators.chunkgrid import (
    CM_BUILD_MIN_BLOCKS,
    OM_SLICE_CAP,
    chunk_grid,
)
from bids_spark.operators.codec import BLOCK_SIZE, bm25_scores_np, encode_block

_SPLIT = re.compile(r"[\W_]+", flags=re.UNICODE)

#: Cut a term's posting run into a new block when consecutive doc ids
#: jump by more than this, IN ADDITION to the fixed BLOCK_SIZE cuts.
#: Why: a block's [first_doc, max_doc] interval is the unit every
#: metadata consumer reasons over (range-aligned bounds, AND bitmaps,
#: rarest-term spans, must-range skipping).  On banded doc-id spaces —
#: sharded crawls with per-shard id prefixes, periodic host recrawls,
#: any replica/partition scheme — ONE 128-posting block straddling the
#: empty gap between two bands inherits an interval covering the whole
#: gap and marks every chunk in it as term-present, poisoning the
#: bounds for every OTHER band that lives inside the gap (measured at
#: 3M docs: a 10-band url host term's 10 boundary blocks marked 15,756
#: of 16,384 chunks present and the AND bitmap pruned 4% where the
#: band structure allows 98% — BENCH/PLANS.md "url-field evidence").
#: Cutting at gaps adds at most one block per >threshold gap per term
#: (metadata rows only; payload bytes unchanged per posting) and keeps
#: intervals tight.  Dense id spaces never hit the threshold.
#: Env override SPARK_GRAFT_BLOCK_GAP_CUT; 0 disables (the A/B twin).
BLOCK_GAP_CUT = int(
    os.environ.get("SPARK_GRAFT_BLOCK_GAP_CUT", str(1 << 20))
)

PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.LongType()),
    ]
)

PARTIAL_SCHEMA_DL = T.StructType(
    PARTIAL_SCHEMA.fields + [T.StructField("dl", T.LongType())]
)

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("max_doc", T.LongType()),
        T.StructField("block_max_score", T.DoubleType()),
        T.StructField("idf", T.DoubleType()),
        # k-th largest single-term score over the whole term run — a
        # build-time θ lower bound for top-k pruning (wand.py): any doc
        # holding one of the k best scores of term t has total ≥ that
        # score, so the k-th best total ≥ kth_score.  Repeated on every
        # block of the run; the terms stage lifts it into the dictionary.
        T.StructField("top10_score", T.DoubleType()),
        T.StructField("top100_score", T.DoubleType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def spimi_partial_postings(
    docs: DataFrame, id_col="doc_id", text_col="text", with_dl: bool = False
) -> DataFrame:
    """mapInPandas SPIMI: per-Arrow-batch tokenize + local (doc,term)
    tf counts — the in-RAM inversion step of C4, vectorized.

    with_dl=True also emits dl per posting (Σtf of the doc's kept
    tokens — exact because a document row lives entirely in one Arrow
    batch), matching the builtin tokenizer's with_dl contract so the
    blocks stage never joins doclens."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf[text_col].fillna("").str.lower().str.split(_SPLIT)
            lens = toks.map(len)
            flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in toks]) \
                if len(toks) else np.empty(0, dtype=object)
            flat_docs = np.repeat(pdf[id_col].to_numpy(), lens.to_numpy()) \
                if len(toks) else np.empty(0, dtype=np.int64)
            if len(flat_terms):
                tl = pd.Series(flat_terms).str.len()
                keep = (tl > 0) & (tl <= MAX_TOKEN_LEN)
                out = (
                    pd.DataFrame({"term": flat_terms[keep.to_numpy()],
                                  "doc_id": flat_docs[keep.to_numpy()]})
                    .groupby(["term", "doc_id"], sort=False)
                    .size()
                    .reset_index(name="tf")
                )
            else:
                out = pd.DataFrame({"term": [], "doc_id": [], "tf": []})
            out["doc_id"] = out["doc_id"].astype("int64")
            out["tf"] = out["tf"].astype("int64")
            if with_dl:
                out["dl"] = (
                    out.groupby("doc_id")["tf"].transform("sum").astype("int64")
                    if len(out) else pd.Series([], dtype="int64")
                )
                yield out[["term", "doc_id", "tf", "dl"]]
            else:
                yield out[["term", "doc_id", "tf"]]

    aggs = [F.sum("tf").alias("tf")]
    if with_dl:
        aggs.append(F.first("dl").alias("dl"))
    return (
        docs.select(F.col(id_col).alias(id_col), F.col(text_col).alias(text_col))
        .mapInPandas(gen, PARTIAL_SCHEMA_DL if with_dl else PARTIAL_SCHEMA)
        .groupBy("term", "doc_id")
        .agg(*aggs)
    )


def _block_encoder(
    with_positions: bool = False,
    store_dl: bool = False,
    idf_dir: str | None = None,
    avgdl: float | None = None,
    avgdl_url: float | None = None,
):
    """Streaming block encoder over (term, doc_id, tf [, idf, score]
    [, dl] [, positions]) batches sorted by (term, doc_id) within the
    partition.  Carries the trailing partial term-run between Arrow
    batches (O(batch) memory).

    Two scoring sources:

    - idf_dir=None (join twin): idf and score arrive as columns,
      computed JVM-side behind a postings ⋈ term_df join — at 10^12
      docs a vocabulary too large to broadcast makes that join the
      build's SECOND full shuffle of the postings relation.
    - idf_dir set (default): the batch carries only (tf, dl); idf
      comes from the tiny sorted ``termidf`` sidecar, range-read per
      Arrow batch with pyarrow (terms arrive sorted, so each read is
      one row-group-pruned slice — a manual range co-partitioned
      lookup Catalyst cannot express), and scores are computed here
      via ``bm25_scores_np`` — the SAME function dl-mode decode uses
      to recompute them, so payloads and block metadata are
      bit-identical to the join twin's (asserted in tests and by the
      A/B tool's rank+bytes identity checks)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        idf_cache: dict[str, float] = {}

        def ensure_idfs(terms: "pd.Series") -> None:
            # drop cache entries below this batch's floor — earlier
            # runs are finished (sorted input), keeps the cache
            # O(batch vocab).  The floor is the BATCH min (which
            # includes any carried term), never the min of the missing
            # set — that could evict a still-pending carry term.
            floor = terms.min()
            for t in [t for t in idf_cache if t < floor]:
                del idf_cache[t]
            need = set(terms) - idf_cache.keys()
            if not need:
                return
            import pyarrow.dataset as pds

            lo, hi = min(need), max(need)
            tbl = (
                pds.dataset(idf_dir, format="parquet")
                .to_table(
                    columns=["term", "idf"],
                    filter=(pds.field("term") >= lo)
                    & (pds.field("term") <= hi),
                )
            )
            idf_cache.update(
                zip(tbl.column("term").to_pylist(),
                    tbl.column("idf").to_pylist())
            )

        def kth_largest(scores: np.ndarray, k: int) -> float:
            # 0.0 (no bound) when the run holds fewer than k postings —
            # the global k-th best may then come from other terms/runs
            if len(scores) < k:
                return 0.0
            return float(np.partition(scores, len(scores) - k)[len(scores) - k])

        def encode_term_run(run: pd.DataFrame) -> pd.DataFrame:
            docs = run["doc_id"].to_numpy()
            tfs = run["tf"].to_numpy()
            term = run["term"].iloc[0]
            if idf_dir is None:
                scores = run["score"].to_numpy()
                idf = float(run["idf"].iloc[0])
            else:
                idf = idf_cache[term]
                # per-field length normalization: a url-namespaced
                # term's dl is the URL token count, scored against the
                # url field's avgdl (functions/fields.py design note)
                a = (
                    avgdl_url
                    if avgdl_url is not None and term.startswith(_URL_NS)
                    else avgdl
                )
                scores = bm25_scores_np(
                    tfs, run["dl"].to_numpy(), idf, a
                )
            dls = run["dl"].to_numpy() if store_dl else None
            pos_cells = run["positions"] if with_positions else None
            rows = []
            s10 = kth_largest(scores, 10)
            s100 = kth_largest(scores, 100)
            # block boundaries: every BLOCK_SIZE postings AND at every
            # doc-id gap above BLOCK_GAP_CUT (tight intervals on banded
            # id spaces — see the constant's rationale).  The BLOCK_SIZE
            # grid restarts after each gap cut; O(#gaps + #blocks) work,
            # never per-posting Python.
            if BLOCK_GAP_CUT > 0 and len(docs) > 1:
                seg_edges = (
                    np.nonzero(np.diff(docs) > BLOCK_GAP_CUT)[0] + 1
                ).tolist()
            else:
                seg_edges = []
            starts: list[int] = []
            for seg_s, seg_e in zip(
                [0] + seg_edges, seg_edges + [len(docs)]
            ):
                starts.extend(range(seg_s, seg_e, BLOCK_SIZE))
            for j, s in enumerate(starts):
                e = starts[j + 1] if j + 1 < len(starts) else len(docs)
                flat = None
                if pos_cells is not None:
                    cells = [
                        np.asarray(c, dtype=np.int64)
                        for c in pos_cells.iloc[s:e]
                    ]
                    flat = (
                        np.concatenate(cells) if cells else np.empty(0, np.int64)
                    )
                rows.append(
                    (
                        term,
                        e - s,
                        int(docs[s]),
                        int(docs[e - 1]),
                        float(scores[s:e].max()),
                        idf,
                        s10,
                        s100,
                        encode_block(
                            docs[s:e], tfs[s:e], scores[s:e], flat,
                            dls[s:e] if dls is not None else None,
                        ),
                    )
                )
            return pd.DataFrame(
                rows,
                columns=[
                    "term", "n", "first_doc", "max_doc",
                    "block_max_score", "idf", "top10_score", "top100_score",
                    "payload",
                ],
            )

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            if idf_dir is not None:
                ensure_idfs(pdf["term"])
            last_term = pdf["term"].iloc[-1]
            head = pdf[pdf["term"] != last_term]
            carry = pdf[pdf["term"] == last_term].copy()
            if not head.empty:
                outs = [encode_term_run(g) for _, g in head.groupby("term", sort=False)]
                yield pd.concat(outs, ignore_index=True)
        if carry is not None and not carry.empty:
            yield encode_term_run(carry)

    return gen


#: On-disk block/terms format tag.  Bump on any codec or schema change:
#: stale blocks/terms stages rebuild while postings/doclens/stats stay
#: resumable (their fingerprints don't carry the tag).
FMT_TAG = "#fmt4"


class BlockedIndex:
    """On-disk layout: {path}/postings, doclens, stats, blocks,
    manifest.json.

    Storage seam (bids_spark/io.py): every table write/read goes
    through ``io`` (ParquetTableIO by default — byte-identical to the
    historical layout — or IcebergTableIO when the session has an
    Iceberg catalog: ``BlockedIndex(p, io=table_io_for(spark, p))``),
    and the manifest goes through ``commit_log`` (PosixRenameLog by
    default, ConditionalPutLog on rename-free object stores)."""

    def __init__(
        self,
        path: str,
        io: TableIO | None = None,
        commit_log: CommitLog | None = None,
    ):
        self.path = path
        self.manifest_path = os.path.join(path, "manifest.json")
        self.io = io or ParquetTableIO(path)
        self.log = commit_log or PosixRenameLog(self.manifest_path)

    def is_servable(self) -> bool:
        """True iff a reader can serve queries from this directory:
        the manifest records the blocks AND terms stages as done with
        the CURRENT on-disk format tag.  An interrupted build (postings
        marked, blocks never written) or an index left by a previous
        format must not be served — callers fall back to the naive
        engine instead of crashing on a missing/stale stage."""
        man = self._manifest()
        blk = man["stages"].get("blocks")
        trm = man["stages"].get("terms")
        return bool(
            blk and blk.get("status") == "done"
            and FMT_TAG in str(blk.get("fingerprint", ""))
            and trm and trm.get("status") == "done"
            and trm.get("fingerprint") == blk.get("fingerprint")
            and self.io.exists("blocks")
            and self.io.exists("terms")
        )

    # ---- manifest / resumability ---------------------------------------

    def _manifest(self) -> dict:
        return self.log.read() or {"stages": {}}

    def _lineage(self, stage: str) -> list[dict]:
        """Per-partition lineage: one entry per output part-file (a
        part-file is exactly one task/partition's output; Iceberg
        backends report lineage from snapshot metadata instead)."""
        return self.io.lineage(stage)

    def _mark(self, manifest: dict, stage: str, fingerprint: str, **metrics):
        manifest["stages"][stage] = {
            "status": "done",
            "fingerprint": fingerprint,
            "partitions": self._lineage(stage),
            **metrics,
        }
        self.log.commit(manifest)

    def _stage_done(self, manifest: dict, stage: str, fingerprint: str) -> bool:
        st = manifest["stages"].get(stage)
        return bool(st and st["status"] == "done" and st["fingerprint"] == fingerprint)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.path, stage)

    # ---- build -----------------------------------------------------------

    def build(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        fingerprint: str = "",
        n_partitions: int | None = None,
        tokenizer: str = "builtin",
        n_buckets: int = 8,
        with_positions: bool = False,
        score_mode: str = "dl",
        cm_sidecar: bool | None = None,
        url_field: bool = False,
        url_col: str = "url",
    ) -> dict:
        """Build all stages (resumable). Returns the manifest.

        tokenizer="builtin" (default) tokenizes with Catalyst column
        expressions — whole-stage codegen, no Python workers, measured
        ~3× faster than the pandas path at 32 local cores (Python
        workers oversubscribe local-mode CPUs; on a real cluster the
        gap narrows but JVM still wins).  tokenizer="spimi" uses the
        Arrow/pandas SPIMI path (operators tested equal).

        n_buckets: blocks are written partitionBy(bucket) with
        bucket = pmod(xxhash64(term), n_buckets) — a term lookup
        prunes to ONE directory (PartitionFilters) before row-group
        stats even apply.  At 10^12 docs set this to thousands; the
        bucket leads the range-partition key so each write task
        touches few directories.

        with_positions: also record token positions per posting
        (tantivy record:"position", meta.json:29) so phrase queries
        run on the blocked path; forces the builtin tokenizer and
        costs ~1 extra byte/occurrence in the payloads.

        cm_sidecar: precompute the per-term chunk-max tables the
        engine's range-aligned bounds and AND-intersection bitmaps
        read (wand.py Phase 3) — cold multi-term queries then skip
        their metadata aggregation.  None (default) auto-builds it
        only above CM_BUILD_MIN_BLOCKS total blocks (below that no
        query engages those bounds and the stage is pure cost).

        score_mode: "dl" (default) stores the doc length per posting
        (1-2 B) and recomputes the exact float64 BM25 at decode —
        ~3.5 B/posting; "f64" stores the precomputed impact score
        (8 B/posting) for read-only decode.  Rank/score-identical
        either way (codec.bm25_scores_np mirrors the Catalyst
        expression operand-for-operand).

        url_field: also index `url_col` as a second text field — the
        reference indexes file_path alongside content with the same
        analyzer (bids/index.py:49-52; meta.json:25-44).  url tokens
        land in the SAME postings/blocks/terms/cm tables under the
        URL_NS term namespace (functions/fields.py), each posting's dl
        carrying the URL token count, so every downstream stage and
        serving path is field-agnostic; the only new state is one
        manifest scalar (avgdl_url) for the per-field BM25 length
        normalization.  Forces the builtin tokenizer.
        """
        if url_field and with_positions and score_mode != "dl":
            # f64 payloads don't carry dl, so a url-field phrase can't
            # length-normalize by the url field at decode — the engine
            # would raise NotImplementedError the first time a user
            # runs url:"a b".  Surface the incompatibility at build
            # time, not query time.
            raise ValueError(
                "url_field=True with with_positions=True requires "
                "score_mode='dl' (url-field phrases need the per-"
                "posting url doc length; f64 impact payloads drop it)"
            )
        spark = docs.sparkSession
        man = self._manifest()
        n_part = n_partitions or spark.sparkContext.defaultParallelism
        # +pf2: postings carry dl per posting (computed free at tokenize
        # time) — indexes whose postings stage predates the column
        # rebuild it on resume instead of crashing the blocks stage
        fingerprint = (
            fingerprint + "+pf2" + ("+pos" if with_positions else "")
            + ("+uf" if url_field else "")
        )

        if not self._stage_done(man, "postings", fingerprint):
            t0 = time.time()
            if with_positions:
                from bids_spark.operators.index_build import (
                    postings_with_positions as _builtin_pos,
                )
                part = _builtin_pos(docs, id_col, text_col, with_dl=True)
            elif tokenizer == "spimi" and not url_field:
                part = spimi_partial_postings(docs, id_col, text_col, with_dl=True)
            else:
                from bids_spark.operators.index_build import postings as _builtin
                part = _builtin(docs, id_col, text_col, with_dl=True)
            if url_field:
                from bids_spark.operators.index_build import (
                    namespace_url_terms,
                    postings as _builtin_plain,
                    postings_with_positions as _builtin_pos2,
                )

                ubuild = _builtin_pos2 if with_positions else _builtin_plain
                part = part.unionByName(
                    namespace_url_terms(
                        ubuild(docs, id_col, url_col, with_dl=True)
                    )
                )
            self.io.write(part, "postings")
            self._mark(man, "postings", fingerprint, seconds=time.time() - t0)
        postings = self.io.read(spark, "postings")

        if not self._stage_done(man, "doclens", fingerprint):
            t0 = time.time()
            # dl rides every posting row (+pf2), so the doclens table is
            # a first() per doc, not a sum; zero-token docs via left join.
            # url-namespaced postings carry the URL field's dl — the
            # doclens table is the CONTENT field's lengths only.
            dl_src = (
                postings.filter(~url_term_col(F.col("term")))
                if url_field
                else postings
            )
            doclens = dl_src.groupBy("doc_id").agg(F.first("dl").alias("dl"))
            all_ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
            doclens = (
                all_ids.join(doclens, "doc_id", "left")
                .select("doc_id", F.coalesce("dl", F.lit(0)).cast("long").alias("dl"))
            )
            # range-partition + sort by doc_id: parquet row-group
            # min/max stats then prune `doc_id:[lo TO hi]` constant-
            # scorer scans (_eval_range) to the overlapping groups —
            # without this a narrow range reads the WHOLE doclens
            # relation (TB-scale at 10^12 docs).  Delta-friendly layout
            # also compresses better; one extra (doc_id, dl) shuffle at
            # build, query side unchanged for every other consumer.
            doclens = doclens.repartitionByRange(
                n_part, "doc_id"
            ).sortWithinPartitions("doc_id")
            self.io.write(doclens, "doclens")
            self._mark(man, "doclens", fingerprint, seconds=time.time() - t0)
        doclens = self.io.read(spark, "doclens")

        if not self._stage_done(man, "stats", fingerprint):
            t0 = time.time()
            stats = doclens.agg(
                F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
            )
            self.io.write(stats, "stats")
            self._mark(man, "stats", fingerprint, rows=1, seconds=time.time() - t0)
        stats = self.io.read(spark, "stats")

        # blocks/terms carry a format tag so indexes written before a
        # codec/schema change rebuild those stages (postings/doclens/
        # stats are format-stable and stay resumable)
        # idf-defer mode (default): the encoder reads idf from the tiny
        # sorted termidf sidecar and scores with bm25_scores_np (the
        # function dl-mode decode already uses — bit-identical to the
        # JVM expression), so the postings relation is joined with
        # NOTHING and shuffles exactly ONCE (the mandatory range
        # partition), with rows 16 B/posting narrower (no idf/score
        # columns).  The join twin stays runnable for A/B and serves
        # as the fallback when postings lack the carried dl column
        # (SPARK_GRAFT_BUILD_DL_CARRY=0) or the storage backend gives
        # the Python workers no directly readable path (Iceberg).
        defer_idf = (
            os.environ.get("SPARK_GRAFT_BUILD_IDF_JOIN", "0") != "1"
            and os.environ.get("SPARK_GRAFT_BUILD_DL_CARRY", "1") != "0"
            and isinstance(self.io, ParquetTableIO)
        )
        # gap-cut setting folds into the stage fingerprint: block
        # boundaries depend on it, so an A/B flip must rebuild the
        # blocks/terms/cm stages rather than silently serve the old
        # layout (postings/doclens/stats stay resumable)
        blk_fp = fingerprint + f"{FMT_TAG}-{score_mode}-g{BLOCK_GAP_CUT}"
        if (
            defer_idf
            and not self._stage_done(man, "blocks", blk_fp)
            and not self._stage_done(man, "termidf", fingerprint)
        ):
            t0 = time.time()
            srow = stats.first()
            n_docs = int(srow["n_docs"])
            idf = F.log1p(
                (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            )
            # range-partitioned + sorted by term: each encoder batch
            # range-reads one row-group-pruned slice.  The groupBy
            # map-side combines to ~vocab×partitions rows — at any
            # scale this shuffle moves the VOCABULARY, not postings.
            term_idf = (
                postings.groupBy("term").agg(F.count("*").alias("df"))
                .select("term", idf.alias("idf"))
                .repartitionByRange(max(n_part // 8, 1), "term")
                .sortWithinPartitions("term")
            )
            self.io.write(term_idf, "termidf")
            self._mark(man, "termidf", fingerprint, seconds=time.time() - t0)

        if not self._stage_done(man, "blocks", blk_fp):
            t0 = time.time()
            srow = stats.first()
            n_docs, avgdl = int(srow["n_docs"]), float(srow["avgdl"])
            avgdl_url: float | None = None
            if url_field:
                # the url field's average length: Σ per-doc url dl over
                # ALL corpus docs (docs with no url tokens contribute
                # 0, same avg convention as the content stats) — one
                # 2-column aggregation of the ns postings slice
                tot = (
                    postings.filter(url_term_col(F.col("term")))
                    .groupBy("doc_id")
                    .agg(F.first("dl").alias("dl"))
                    .agg(F.sum("dl").alias("t"))
                    .first()
                )
                avgdl_url = float(tot["t"] or 0) / max(n_docs, 1)
            bucket_col = F.pmod(
                F.xxhash64("term"), F.lit(n_buckets)
            ).cast("int")
            if defer_idf:
                cols = ["term", "doc_id", "tf", "dl"]
                if with_positions:
                    cols.append("positions")
                # no persist: the child of the range shuffle is a pure
                # column-pruned postings scan, so the boundary-sampling
                # job re-reads 3 narrow columns instead of pinning the
                # full (positions-carrying) relation in executor memory
                enriched = postings.select(*cols).withColumn(
                    "bucket", bucket_col
                )
                encoder = _block_encoder(
                    with_positions, score_mode == "dl",
                    idf_dir=self.io.path("termidf"), avgdl=avgdl,
                    avgdl_url=avgdl_url,
                )
            else:
                term_df = postings.groupBy("term").agg(
                    F.count("*").alias("df")
                )
                idf = F.log1p(
                    (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                # join twin: exact per-posting BM25 computed JVM-side
                # (codegen) BEFORE the range shuffle — the Python
                # encoder only packs bytes
                tf_d = F.col("tf").cast("double")
                # per-field avgdl dispatch: collapses to F.lit(avgdl)
                # when url_field is off — plans byte-identical to before
                a_col = avgdl_col(F.col("term"), avgdl, avgdl_url)
                score = (
                    F.col("idf")
                    * tf_d
                    * F.lit(K1 + 1.0)
                    / (
                        tf_d
                        + F.lit(K1)
                        * (
                            F.lit(1.0 - B)
                            + F.lit(B)
                            * F.col("dl").cast("double") / a_col
                        )
                    )
                )
                cols = ["term", "doc_id", "tf", "idf", score.alias("score")]
                if score_mode == "dl":
                    cols.append(F.col("dl"))
                if with_positions:
                    cols.append(F.col("positions"))
                # dl comes from the postings rows themselves (+pf2) —
                # no doclens join; SPARK_GRAFT_BUILD_DL_CARRY=0 keeps
                # the doclens-join twin runnable for interleaved A/B
                # (tools/build_bench.py) — output identical either way
                # (dl ≡ the doclens value by construction, tested).
                if os.environ.get("SPARK_GRAFT_BUILD_DL_CARRY", "1") == "0":
                    src = postings.drop("dl").join(doclens, "doc_id")
                else:
                    src = postings
                enriched = (
                    src
                    .join(term_df.select("term", idf.alias("idf")), "term")
                    .select(*cols)
                    .withColumn("bucket", bucket_col)
                )
                # repartitionByRange SAMPLES its child to pick
                # boundaries, which would execute the joins twice —
                # persist so sampling and the real shuffle share one
                # materialization
                enriched = enriched.persist()
                encoder = _block_encoder(with_positions, score_mode == "dl")
            blocks = (
                enriched.repartitionByRange(n_part, "bucket", "term", "doc_id")
                .sortWithinPartitions("bucket", "term", "doc_id")
                .mapInPandas(encoder, BLOCK_SCHEMA)
                .withColumn("bucket", bucket_col)
            )
            self.io.write(
                blocks, "blocks", partition_by=["bucket"],
                options={"parquet.block.size": 8 * 1024 * 1024},
            )
            if not defer_idf:
                enriched.unpersist()
            dt = time.time() - t0
            # build metrics (postings/bytes/doc domain) are filled from
            # the TERMS table after the terms stage — the dictionary
            # aggregation is the one post-write scan of the blocks
            # relation, and global metrics are sums over its tiny
            # output, so the old dedicated metrics scan (a second full
            # read of the payload bytes just written) is gone
            self._mark(
                man, "blocks", blk_fp,
                seconds=dt,
                n_docs=n_docs, n_buckets=n_buckets,
                with_positions=with_positions,
                score_mode=score_mode,
                avgdl=avgdl,
                url_field=url_field,
                avgdl_url=avgdl_url,
                gap_cut=BLOCK_GAP_CUT,
            )

        if not self._stage_done(man, "terms", blk_fp):
            # term dictionary (tantivy's .term files, SURVEY §2 D2):
            # one row per (bucket, term) with df, global max block score
            # and idf — lets a query resolve gmax/idf with a pruned scan
            # of a tiny table instead of aggregating over the blocks
            t0 = time.time()
            tdict = (
                self.io.read(spark, "blocks")
                .groupBy("bucket", "term")
                .agg(
                    F.sum("n").cast("long").alias("df"),
                    F.max("block_max_score").alias("gmax"),
                    F.first("idf").alias("idf"),
                    F.count("*").cast("int").alias("n_blocks"),
                    # max of per-run partial k-th-largest scores: each is
                    # ≤ the term's true s_k (range-split runs see subsets),
                    # so the max is a valid θ lower bound — and the
                    # tightest one available without a probe job
                    F.max("top10_score").alias("s10"),
                    F.max("top100_score").alias("s100"),
                    # per-term rollups that make global build metrics a
                    # sum over THIS tiny table instead of a second full
                    # blocks scan (payload bytes are the bulk of the
                    # table — at web scale reading them twice post-write
                    # doubles the build's read volume)
                    F.sum(F.length("payload")).cast("long").alias("bytes"),
                    F.min("first_doc").alias("first_doc_min"),
                    F.max("max_doc").alias("max_doc_max"),
                )
            )
            self.io.write(
                tdict.repartition("bucket").sortWithinPartitions("term"),
                "terms", partition_by=["bucket"],
            )
            self._mark(man, "terms", blk_fp, seconds=time.time() - t0)

        if "postings" not in man["stages"]["blocks"]:
            # fill blocks metrics from the terms table (tiny; also runs
            # on a resume that crashed between the two commits above)
            m = (
                self.io.read(spark, "terms")
                .agg(
                    F.sum("n_blocks").alias("n_blocks"),
                    F.sum("df").alias("postings"),
                    F.sum("bytes").alias("bytes"),
                    # doc-id domain: fixes the chunk grid the query-time
                    # range-aligned block bounds use (wand.py) without a
                    # metadata scan per serving process
                    F.min("first_doc_min").alias("doc_lo"),
                    F.max("max_doc_max").alias("doc_hi"),
                )
                .first()
            )
            n_postings = int(m["postings"] or 0)
            comp_bytes = int(m["bytes"] or 0)
            be = man["stages"]["blocks"]
            build_total = be["seconds"] + sum(
                man["stages"][s]["seconds"]
                for s in ("postings", "doclens", "stats")
                if s in man["stages"]
            )
            n_docs_m = int(be["n_docs"])
            be.update(
                rows=int(m["n_blocks"] or 0),
                postings=n_postings,
                compressed_bytes=comp_bytes,
                doc_lo=(None if m["doc_lo"] is None else int(m["doc_lo"])),
                doc_hi=(None if m["doc_hi"] is None else int(m["doc_hi"])),
                docs_per_sec=n_docs_m / max(build_total, 1e-9),
                postings_per_sec=n_postings / max(build_total, 1e-9),
                bytes_per_posting=comp_bytes / max(n_postings, 1),
            )
            self.log.commit(man)

        if cm_sidecar is None:
            # auto: skip on indexes too small for any query to reach
            # the engine's aligned/bitmap engage threshold — the stage
            # would be pure build cost there (chunkgrid.py rationale)
            cm_sidecar = (
                int(man["stages"]["blocks"].get("rows") or 0)
                >= CM_BUILD_MIN_BLOCKS
            )
        if cm_sidecar and not self._stage_done(man, "cm", blk_fp):
            # chunk-max sidecar (tantivy precomputes its block-max
            # metadata at index time for the same reason): per-term
            # per-chunk max block score over the shared grid
            # (operators/chunkgrid.py), so cold multi-term queries
            # serve their range-aligned bounds and AND-intersection
            # bitmaps from a pruned scan of ≤ n_chunks rows/term
            # instead of aggregating candidate block metadata.  Narrow
            # blocks (span ≤ OM_SLICE_CAP chunks) explode — bounded at
            # n_blocks + n_chunks rows/term by interval disjointness;
            # wide blocks (the tail vocabulary's single whole-domain
            # blocks, which would explode to n_chunks rows EACH) are
            # stored un-exploded as (c1, c2, m) ranges and max-merged
            # into the dense array driver-side (wand._cm_arrays).
            t0 = time.time()
            st = man["stages"]["blocks"]
            lo_d, hi_d = st.get("doc_lo"), st.get("doc_hi")
            lo, width, n_chunks = chunk_grid(
                int(lo_d or 0), int(hi_d or 0)
            )
            bl = self.io.read(spark, "blocks")
            c1 = F.floor(
                (F.col("first_doc") - F.lit(lo)) / F.lit(width)
            ).cast("int")
            c2 = F.floor(
                (F.col("max_doc") - F.lit(lo)) / F.lit(width)
            ).cast("int")
            span = c2 - c1 + F.lit(1)
            base = bl.select(
                "bucket", "term", "block_max_score",
                c1.alias("c1"), c2.alias("c2"), span.alias("span"),
            )
            narrow = (
                base.filter(F.col("span") <= F.lit(OM_SLICE_CAP))
                .select(
                    "bucket", "term", "block_max_score",
                    F.explode(F.sequence("c1", "c2")).alias("c"),
                )
                .groupBy("bucket", "term", "c")
                .agg(F.max("block_max_score").alias("m"))
            )
            wide = (
                base.filter(F.col("span") > F.lit(OM_SLICE_CAP))
                .groupBy("bucket", "term", "c1", "c2")
                .agg(F.max("block_max_score").alias("m"))
            )
            self.io.write(
                narrow.repartition("bucket").sortWithinPartitions("term", "c"),
                "cm", partition_by=["bucket"],
            )
            # an empty partitioned write leaves an unreadable dir (no
            # schema) — write cm_wide only when wide blocks exist and
            # record the count so readers know whether to scan it
            wide_rows = wide.count()
            if wide_rows:
                self.io.write(
                    wide.repartition("bucket").sortWithinPartitions("term"),
                    "cm_wide", partition_by=["bucket"],
                )
            self._mark(
                man, "cm", blk_fp, seconds=time.time() - t0,
                lo=lo, width=width, n_chunks=n_chunks,
                wide_rows=wide_rows,
            )
        return self._manifest()

    # ---- read side --------------------------------------------------------

    def blocks(self, spark: SparkSession) -> DataFrame:
        return self.io.read(spark, "blocks")

    def terms(self, spark: SparkSession) -> DataFrame:
        """Term dictionary: (term, df, gmax, idf, n_blocks, bucket)."""
        return self.io.read(spark, "terms")

    def doclens(self, spark: SparkSession) -> DataFrame:
        return self.io.read(spark, "doclens")

    @property
    def has_positions(self) -> bool:
        st = self._manifest()["stages"].get("blocks", {})
        return bool(st.get("with_positions"))

    @property
    def score_mode(self) -> str:
        st = self._manifest()["stages"].get("blocks", {})
        return st.get("score_mode", "f64")

    @property
    def avgdl(self) -> float:
        """Corpus avgdl recorded at build — no Spark job needed."""
        st = self._manifest()["stages"].get("blocks", {})
        if "avgdl" in st:
            return float(st["avgdl"])
        raise KeyError("manifest has no avgdl (pre-fmt3 index)")

    @property
    def url_field(self) -> bool:
        """True iff this index also holds URL_NS-namespaced url-field
        postings (build url_field=True)."""
        st = self._manifest()["stages"].get("blocks", {})
        return bool(st.get("url_field"))

    @property
    def avgdl_url(self) -> float | None:
        """The url field's avgdl (manifest scalar) — None on indexes
        built without the field (no ns terms exist there, so no
        consumer ever needs it)."""
        st = self._manifest()["stages"].get("blocks", {})
        v = st.get("avgdl_url")
        return None if v is None else float(v)

    @property
    def doc_domain(self) -> tuple[int, int]:
        """[min first_doc, max max_doc] over all blocks, recorded at
        build — no Spark job.  KeyError on indexes built before the
        field existed (the engine falls back to a metadata agg)."""
        st = self._manifest()["stages"].get("blocks", {})
        if st.get("doc_lo") is None or st.get("doc_hi") is None:
            raise KeyError("manifest has no doc domain (older index)")
        return int(st["doc_lo"]), int(st["doc_hi"])

    def stats(self, spark: SparkSession) -> tuple[int, float]:
        r = self.io.read(spark, "stats").first()
        return int(r["n_docs"]), float(r["avgdl"])
