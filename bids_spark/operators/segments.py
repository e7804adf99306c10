r"""Segmented (append-only, incremental) blocked index — exact global BM25.

The reference's index is segment-per-commit (tantivy: 3 segments × 2
docs visible at /root/reference/playground/bids_index/meta.json:5-22;
commits at bids/index.py:137-141), with background merges unifying
segments.  This module is the Spark-native segment model: each append
builds an independent BlockedIndex under ``root/seg-*`` and queries
evaluate over the UNION of segments — no rebuild, no merge required
for correctness.

Why this is exact (and why it needs score_mode="dl"): BM25 has one
corpus-dependent factor per term — idf(df, N) — plus avgdl.  Blocks in
"dl" mode store only (tf, dl); scores are recomputed at decode from an
idf column and avgdl scalar.  So the segmented engine:

  * aggregates per-term df and per-segment (n_docs, Σdl) into GLOBAL
    df/N/avgdl (term dictionaries are tiny, pruned scans);
  * computes global idf with the same Catalyst ``log1p`` expression the
    naive engine uses (a ≤|terms|-row local DataFrame — bit-identical
    floats, no libm drift);
  * substitutes the global idf into each segment's blocks before decode
    → decoded scores are exactly the single-index scores;
  * rescales each segment's pruning metadata by r = idf_g/idf_s (scores
    are LINEAR in idf, so that part scales exactly) TIMES an avgdl
    correction: stored bounds were computed with the segment's own
    avgdl while decode uses the global one, and the per-doc ratio of
    the dl-normalisation lies strictly between 1 and
    avgdl_g/avgdl_seg — so upper bounds multiply by
    max(1, avgdl_g/avgdl_seg) and θ candidates by
    min(1, avgdl_g/avgdl_seg).  Both factors are then nudged by the
    one-sided ulp guards below so the bounds stay conservative under
    the rescale's rounding steps.

Deletes (round 2): tombstone sets anti-joined at decode — docs stop
matching immediately, survivors keep exact scores; ``compact()``
purges tombstoned rows and recomputes stats (Lucene pre-merge
semantics).  The streaming module's landing-dir ingest feeds
``add_segment`` per micro-batch.
"""

from __future__ import annotations

import os
import re

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bids_spark.functions.fields import is_url_term
from bids_spark.io import CommitLog, ParquetTableIO, PosixRenameLog, TableIO
from bids_spark.operators import chunkgrid
from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.wand import BlockedSearchEngine, lookup_expr

# One-sided guards for rescaled bounds.  The rescale chain (two
# 3-rounding score evaluations, the idf_g/idf_s division, the multiply)
# can accumulate ~8 ulp (~8.9e-16) of error in adversarial cases, so a
# 4e-16 guard could under-cover; 2e-15 (~16 ulp) is a safely derived
# bound.  The bounds only steer pruning — looser guards cost at most a
# few extra survivor blocks, never correctness.
_UP = 1.0 + 2e-15
_DOWN = 1.0 - 2e-15

# the streaming writer's monotonic segment-name scheme
# (streaming/incremental.py names micro-batch segments
# seg-batch-{batch_id:06d}) — the only unbounded producer of retired
# names, and therefore the only scheme the retired-list trim horizon
# is defined for
_BATCH_SEG = re.compile(r"^seg-batch-(\d+)$")


class SegmentedIndex:
    """Directory of independent BlockedIndex segments: root/seg-NNNN.

    Visibility is gated by an atomically written commit file
    ``root/segments.json`` (the analogue of tantivy's meta.json): a
    segment is served only once it is listed there, so readers never
    see an in-flight ``add_segment`` build or an under-construction
    compaction, and a crash mid-compaction can never double-count
    (sources stay committed until the merged segment commits).
    Roots written before the commit file existed fall back to listing
    servable seg-* directories.

    Concurrency contract: any number of READERS may serve concurrently
    with one MUTATOR (each mutation is a single atomic rename, so a
    reader sees the old or the new commit, never a torn one), but
    mutations themselves (add_segment / delete_docs / compact) assume a
    SINGLE writer — they read-modify-write segments.json without a
    lock, so two concurrent mutators can drop each other's committed
    entries.  This mirrors tantivy's single-IndexWriter rule
    (reference: one writer process owns the index,
    bids/index.py:121-143).  On an object store, io.ConditionalPutLog
    upgrades the commit to a compare-and-swap that DETECTS lost races
    instead of silently losing them (see bids_spark/io.py)."""

    def __init__(
        self,
        root: str,
        commit_log: CommitLog | None = None,
        io: TableIO | None = None,
        auto_compact_segments: int | None = None,
        auto_compact_tombstone_frac: float | None = None,
    ):
        # Compaction policy (tantivy's background merge analogue,
        # playground/junk/create.py:34 — tantivy merges in a thread
        # pool; here the single writer compacts inline at the end of
        # the mutation that crossed a threshold):
        #   auto_compact_segments: compact when the committed segment
        #     count reaches this (query latency is linear in segment
        #     count — every term touches one dictionary scan + one
        #     blocks scan per segment);
        #   auto_compact_tombstone_frac: compact when tombstoned docs
        #     exceed this fraction of indexed docs (deleted docs still
        #     cost decode + anti-join until purged).
        # None (default) = explicit compact() only.
        self.auto_compact_segments = auto_compact_segments
        self.auto_compact_tombstone_frac = auto_compact_tombstone_frac
        self.root = root
        # storage seam (bids_spark/io.py): segments.json goes through
        # the commit log (PosixRenameLog keeps today's file format;
        # ConditionalPutLog gives CAS commits on rename-free object
        # stores), tombstone sets through the table seam
        self.log = commit_log or PosixRenameLog(
            os.path.join(root, "segments.json")
        )
        self.io = io or ParquetTableIO(root)

    # -- atomic segment-set commit -----------------------------------------

    @property
    def _commit_path(self) -> str:
        return os.path.join(self.root, "segments.json")

    def _read_commit(self) -> dict | None:
        c = self.log.read()
        if c is None:
            return None
        c.setdefault("segments", [])
        c.setdefault("tombstones", [])
        # names compacted AWAY — kept so an exactly-once writer
        # replaying an already-merged named segment (streaming
        # micro-batch retry after a compaction) no-ops instead of
        # re-appending docs the merged segment already contains.
        # The list grows with compacted-away segment names (bytes per
        # name, metadata only); it cannot be pruned without a horizon
        # on how late a replay may arrive — in the streaming setup that
        # horizon is the checkpoint's replay depth, so a deployment
        # that trims it must coordinate with checkpoint retention —
        # compact(retain_retired=...) is that knob: it trims the oldest
        # seg-batch-* names and records the highest trimmed batch id
        # here, below which a replayed append is REJECTED loudly
        # (a no-op can no longer be proven safe once the name is gone).
        c.setdefault("retired", [])
        c.setdefault("retired_batch_floor", -1)
        return c

    def _write_commit(
        self,
        segments: list[str],
        tombstones: list[str],
        retired: list[str] | None = None,
        retired_batch_floor: int = -1,
    ) -> None:
        """Atomic single commit point (rename or conditional put,
        backend-dependent)."""
        self.log.commit(
            {
                "segments": sorted(segments),
                "tombstones": sorted(tombstones),
                "retired": sorted(retired or []),
                "retired_batch_floor": retired_batch_floor,
            }
        )

    def _committed(self) -> dict:
        """Current commit, synthesized from servable dirs for legacy
        roots (pre-commit-file layout)."""
        c = self._read_commit()
        if c is not None:
            return c
        names = []
        if os.path.isdir(self.root):
            names = sorted(
                d for d in os.listdir(self.root)
                if d.startswith("seg-")
                and BlockedIndex(os.path.join(self.root, d)).is_servable()
            )
        return {"segments": names, "tombstones": [], "retired": [],
                "retired_batch_floor": -1}

    def segment_paths(self) -> list[str]:
        return [
            os.path.join(self.root, n)
            for n in self._committed()["segments"]
            if os.path.isdir(os.path.join(self.root, n))
        ]

    def segments(self) -> list[BlockedIndex]:
        return [BlockedIndex(p) for p in self.segment_paths()]

    def url_field_flag(self) -> bool | None:
        """Committed segments' url_field consensus: None when the store
        is empty, the shared flag when all agree.  Raises on
        disagreement — the same condition SegmentedSearchEngine rejects
        at construction, surfaced here so a writer can fail BEFORE
        committing yet another mismatched segment."""
        flags = [
            bool(s._manifest()["stages"]["blocks"].get("url_field"))
            for s in self.segments()
        ]
        if not flags:
            return None
        if len(set(flags)) > 1:
            raise ValueError(
                "segments disagree on url_field — rebuild or compact "
                "before appending more"
            )
        return flags[0]

    def _reject_below_horizon(self, name: str, commit: dict) -> None:
        """Loudly reject a batch-named append at or below the trimmed
        retired horizon: once compact(retain_retired=...) drops a
        name, a replay of it can no longer be distinguished from a new
        append — silently re-appending would double-count the merged
        docs, so this must be an error, never a guess."""
        floor = int(commit.get("retired_batch_floor", -1))
        m = _BATCH_SEG.match(name)
        if m and int(m.group(1)) <= floor:
            raise ValueError(
                f"segment name {name!r} is at or below the retired-name "
                f"horizon (retired_batch_floor={floor}): compaction "
                "trimmed its exactly-once record, so this replay cannot "
                "be proven already-applied. Raise retain_retired to cover "
                "the streaming checkpoint's replay depth, or clear the "
                "checkpoint before re-running."
            )

    def add_segment(
        self,
        docs: DataFrame,
        fingerprint: str = "",
        name: str | None = None,
        **build_kwargs,
    ) -> BlockedIndex:
        """Append a new immutable segment built from `docs` (the
        analogue of a tantivy commit).  score_mode is forced to "dl"
        (global rescoring needs tf+dl, not baked impacts).

        `name`: explicit segment name (e.g. "seg-batch-7") for
        idempotent writers — a retried streaming micro-batch reuses the
        same directory and the build manifest makes the re-run a no-op
        (exactly-once)."""
        build_kwargs["score_mode"] = "dl"
        build_kwargs.setdefault("with_positions", True)
        c = self._committed()
        if name is not None and (
            name in c["segments"] or name in c.get("retired", [])
        ):
            # exactly-once replay: the named segment is already served
            # (committed) or its docs already live inside a merged
            # segment (retired by a compaction) — re-appending would
            # double-count, and for a retired name the directory was
            # renamed away, so a rebuild would also waste a full build
            return BlockedIndex(os.path.join(self.root, name))
        if name is not None:
            self._reject_below_horizon(name, c)
        if name is None:
            # collision-free default: count-based start, but never reuse
            # an EXISTING directory (a crashed build may have left a
            # partial dir whose stale manifest must not be resumed under
            # a different doc set), a committed name, or a RETIRED name
            # — compaction renames merged-away dirs to old-* so the
            # directory probe alone would happily re-pick a retired
            # number, and the commit-time retired guard would then
            # treat this fresh segment as a replay and drop it
            taken = set(c["segments"]) | set(c.get("retired", []))
            i = len(c["segments"])
            while (
                f"seg-{i:04d}" in taken
                or os.path.exists(os.path.join(self.root, f"seg-{i:04d}"))
            ):
                i += 1
            name = f"seg-{i:04d}"
        assert name.startswith("seg-")
        seg_dir = os.path.join(self.root, name)
        bi = BlockedIndex(seg_dir)
        bi.build(docs, fingerprint=fingerprint or seg_dir, **build_kwargs)
        # commit AFTER the build completes — readers never list the
        # in-flight directory (idempotent for streaming retries: a
        # name already committed is not re-appended).  The read must
        # come from the commit LOG: the legacy-fallback synthesis
        # would already list the just-built directory and skip the
        # write, leaving the root uncommitted.  Routed through
        # log.update so a CAS-capable backend retries on a concurrent
        # mutator instead of dropping its entries.
        def _append(cur: dict | None) -> dict:
            if cur is None:
                # first commit of a legacy root: adopt its servable
                # segments, then add the new one
                cur = self._committed()
                cur["segments"] = [n for n in cur["segments"] if n != name]
            floor = int(cur.get("retired_batch_floor", -1))
            if name in set(cur.get("retired", [])):
                # a compaction retired this name between our build and
                # this commit (CAS retry path): its docs are already in
                # the merged segment — do not resurrect it
                return {
                    "segments": sorted(cur.get("segments", [])),
                    "tombstones": sorted(cur.get("tombstones", [])),
                    "retired": sorted(cur.get("retired", [])),
                    "retired_batch_floor": floor,
                }
            # CAS-race twin of the entry check: a compaction may have
            # trimmed past this name while the build ran
            self._reject_below_horizon(name, cur)
            segs = set(cur.get("segments", [])) | {name}
            return {
                "segments": sorted(segs),
                "tombstones": sorted(cur.get("tombstones", [])),
                "retired": sorted(cur.get("retired", [])),
                "retired_batch_floor": floor,
            }

        self.log.update(_append)
        self._maybe_auto_compact(docs.sparkSession)
        return bi

    def _maybe_auto_compact(self, spark: SparkSession):
        """Run compact() if the configured policy thresholds are
        crossed.  Returns the merged BlockedIndex, or None if no
        policy fired.  Called by the single writer at the end of
        add_segment/delete_docs — the commit it just made is already
        visible, so a crash inside the compaction loses nothing."""
        n_seg = len(self.segment_paths())
        c = self._committed()
        fire = (
            self.auto_compact_segments is not None
            and n_seg >= self.auto_compact_segments
        )
        if (
            not fire
            and self.auto_compact_tombstone_frac is not None
            and c["tombstones"]
        ):
            total = 0
            for p in self.segment_paths():
                man = BlockedIndex(p)._manifest()
                total += int(man["stages"].get("blocks", {}).get("n_docs", 0))
            tomb = self.tombstones(spark)
            if total and tomb is not None:
                fire = tomb.count() / total >= self.auto_compact_tombstone_frac
        if not fire or not (n_seg >= 2 or c["tombstones"]):
            return None
        return self.compact(spark)

    # -- deletes (segment tombstones) ---------------------------------------

    def delete_docs(self, spark: SparkSession, doc_ids: list[int]) -> None:
        """Tombstone documents (reference analogue: tantivy
        delete_documents + commit, playground/example/indexer.py:90-105).

        Lucene/tantivy semantics: deleted docs stop matching queries
        immediately, but df/N/avgdl still count them until a merge —
        surviving docs' scores are UNCHANGED.  compact() purges
        tombstoned rows and recomputes stats."""
        if not doc_ids:
            return
        c = self._committed()
        # collision-free name: max(existing committed OR on-disk number)+1
        # (mirrors add_segment's scan).  Deriving it from the committed
        # COUNT would reuse e.g. del-0001 after a compact() purged
        # del-0000 while a concurrent delete landed as del-0001 — the
        # overwrite would silently resurrect those concurrently-deleted
        # docs.
        tomb_root = os.path.join(self.root, "tombstones")
        existing = set(c["tombstones"])
        if os.path.isdir(tomb_root):
            existing.update(os.listdir(tomb_root))
        nums = [
            int(n[4:]) for n in existing
            if n.startswith("del-") and n[4:].isdigit()
        ]
        name = f"del-{(max(nums) + 1 if nums else 0):04d}"
        self.io.write(
            spark.createDataFrame(
                [(int(d),) for d in doc_ids], "doc_id bigint"
            ).coalesce(1),
            f"tombstones/{name}",
        )

        def _add_tomb(cur: dict | None) -> dict:
            cur = cur if cur is not None else self._committed()
            return {
                "segments": sorted(cur.get("segments", [])),
                "tombstones": sorted(set(cur.get("tombstones", [])) | {name}),
                "retired": sorted(cur.get("retired", [])),
                "retired_batch_floor": int(
                    cur.get("retired_batch_floor", -1)
                ),
            }

        self.log.update(_add_tomb)
        self._maybe_auto_compact(spark)

    def tombstones(self, spark: SparkSession) -> DataFrame | None:
        names = self._committed()["tombstones"]
        if not names:
            return None
        dfs = [self.io.read(spark, f"tombstones/{n}") for n in names]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out.select("doc_id").distinct()

    def engine(self, spark: SparkSession, cache: bool = False):
        segs = self.segments()
        if not segs:
            raise ValueError(
                "no committed segments to serve — the index is empty "
                "(append a segment or wait for the first micro-batch "
                "commit before searching)"
            )
        tomb = self.tombstones(spark)
        if len(segs) == 1 and tomb is None:
            return BlockedSearchEngine(spark, segs[0], cache=cache)
        return SegmentedSearchEngine(spark, segs, cache=cache, tombstones=tomb)

    def compact(
        self,
        spark: SparkSession,
        n_partitions: int | None = None,
        n_buckets: int = 8,
        replace: bool = True,
        retain_retired: int | None = None,
    ) -> BlockedIndex:
        """Merge all segments into one (tantivy's background segment
        merge, SURVEY §2 C5) WITHOUT re-tokenizing: the new segment's
        postings/doclens stages are the unions of the sources' staged
        parquet, stats are recomputed, and only the blocks + terms
        stages run (sort-merge by (term, doc_id) range shuffle + block
        encode with fresh global idf).  Doc ids are globally unique, so
        the union needs no conflict resolution.

        Tombstoned docs are PURGED here (their postings/doclens rows are
        dropped and stats recomputed) and the tombstone set is cleared
        on commit — the Lucene/tantivy merge semantics for deletes.

        replace=True atomically commits the merged segment as the only
        visible one (then renames sources to old-*, kept on disk);
        replace=False builds the merged segment WITHOUT committing it —
        readers keep serving the sources.

        retain_retired: optional horizon on the exactly-once `retired`
        list, which otherwise grows forever under streaming compaction
        cycles (one name per merged-away segment).  Keeps only the
        newest N seg-batch-* names and records the highest trimmed
        batch id as `retired_batch_floor`; replays INSIDE the kept
        window still no-op, replays at or below the floor are rejected
        loudly (see _reject_below_horizon).  Size it to AT LEAST the
        streaming checkpoint's replay depth (a restart can only replay
        batches the checkpoint still holds); non-batch names are never
        trimmed."""
        # establish the commit file first (no-op if present): the
        # under-construction merged dir must never become visible via
        # the legacy directory-listing fallback
        pre = self._committed()
        if self._read_commit() is None:
            self._write_commit(
                pre["segments"], pre["tombstones"], pre.get("retired", []),
                int(pre.get("retired_batch_floor", -1)),
            )
        seg_paths = self.segment_paths()
        # a single segment is compactable when tombstones need purging
        assert seg_paths and (
            len(seg_paths) >= 2 or pre["tombstones"]
        ), "nothing to compact"
        segs = [BlockedIndex(p) for p in seg_paths]
        mans = [s._manifest()["stages"]["blocks"] for s in segs]
        with_pos = all(bool(m.get("with_positions")) for m in mans)
        # url field carries through a merge iff every source indexed it
        # (the engine enforces all-or-nothing; a mixed set surfaces as
        # a content-only merged segment rather than a half-indexed url
        # vocabulary).  The merged build recomputes avgdl_url from the
        # unioned, tombstone-purged postings.
        url_f = all(bool(m.get("url_field")) for m in mans)
        # dl rides every posting row (+pf2 format) — the merged postings
        # must carry it so the blocks stage scores without a doclens join
        cols = (
            ["term", "doc_id", "tf"]
            + (["positions"] if with_pos else [])
            + ["dl"]
        )
        tomb = self.tombstones(spark)

        name = f"seg-merged-{len(seg_paths):04d}-{os.path.basename(seg_paths[-1])}"
        base_fp_probe = "compact:" + ",".join(
            os.path.basename(p) for p in seg_paths
        )
        if pre["tombstones"]:
            base_fp_probe += "-" + ",".join(pre["tombstones"])
        # resume a crashed run of THIS compaction (same source set →
        # same fingerprint on its staged manifest); never build into a
        # directory from a different compaction (repeated cycles can
        # regenerate the same name once merged segments feed merges)
        i = 1
        while os.path.exists(os.path.join(self.root, name)):
            cand = BlockedIndex(os.path.join(self.root, name))
            man_c = cand._manifest()
            fp_c = (man_c.get("stages", {}).get("postings") or {}).get(
                "fingerprint", ""
            )
            if fp_c in (
                base_fp_probe + "+pf2",
                base_fp_probe + "+pf2+pos",
                base_fp_probe + "+pf2+uf",
                base_fp_probe + "+pf2+pos+uf",
            ):
                break  # same compaction, crashed mid-way: resume it
            i += 1
            name = (
                f"seg-merged-{len(seg_paths):04d}-"
                f"{os.path.basename(seg_paths[-1])}-{i}"
            )
        dst = BlockedIndex(os.path.join(self.root, name))
        # base_fp feeds dst.build below, which appends "+pf2"/"+pos"
        # itself — fp here must mirror that so the staged unions are
        # recognized
        base_fp = base_fp_probe
        fp = (
            base_fp + "+pf2" + ("+pos" if with_pos else "")
            + ("+uf" if url_f else "")
        )

        def union_stage(stage: str, select_cols: list[str] | None):
            dfs = [s.io.read(spark, stage) for s in segs]
            if select_cols:
                dfs = [d.select(*select_cols) for d in dfs]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            if tomb is not None:
                out = out.join(tomb, "doc_id", "left_anti")
            return out

        man = dst._manifest()
        if not dst._stage_done(man, "postings", fp):
            dst.io.write(union_stage("postings", cols), "postings")
            dst._mark(man, "postings", fp, merged_from=len(segs), seconds=0.0)
        if not dst._stage_done(man, "doclens", fp):
            dst.io.write(union_stage("doclens", ["doc_id", "dl"]), "doclens")
            dst._mark(man, "doclens", fp, seconds=0.0)
        if not dst._stage_done(man, "stats", fp):
            dst.io.write(
                dst.io.read(spark, "doclens").agg(
                    F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
                ),
                "stats",
            )
            dst._mark(man, "stats", fp, seconds=0.0)
        # blocks + terms run through the normal build (stages above are
        # marked done, so docs is only consulted for its SparkSession)
        dst.build(
            spark.range(0).withColumnRenamed("id", "doc_id"),
            fingerprint=base_fp,
            n_partitions=n_partitions,
            n_buckets=n_buckets,
            with_positions=with_pos,
            score_mode="dl",
            url_field=url_f,
        )
        if replace:
            # single atomic commit point: the merged segment becomes
            # visible and the sources + tombstones invisible in ONE
            # rename; a crash before this line leaves the sources
            # serving, a crash after leaves the merged one serving —
            # never both, never double-counted
            # merge with the CURRENT commit, not the entry snapshot: a
            # concurrent append (streaming micro-batch) or delete that
            # landed while the merge ran must survive — only the merged
            # sources disappear and only the PURGED tombstones clear
            src = {os.path.basename(p) for p in seg_paths}
            purged = set(pre["tombstones"])

            def _swap(cur: dict | None) -> dict:
                cur = cur or pre
                live = [name] + [
                    s for s in cur.get("segments", []) if s not in src
                ]
                remaining = [
                    t for t in cur.get("tombstones", []) if t not in purged
                ]
                retired = set(cur.get("retired", [])) | src
                floor = int(cur.get("retired_batch_floor", -1))
                if retain_retired is not None:
                    batch = sorted(
                        (int(m.group(1)), n)
                        for n in retired
                        if (m := _BATCH_SEG.match(n))
                    )
                    drop = (
                        batch[: -retain_retired]
                        if retain_retired > 0
                        else batch
                    )
                    if drop:
                        floor = max(floor, drop[-1][0])
                        retired -= {n for _, n in drop}
                return {
                    "segments": sorted(live),
                    "tombstones": sorted(remaining),
                    # merged-away names stay on record so a replayed
                    # exactly-once append of one of them no-ops
                    # (trimmed per retain_retired, floor recorded)
                    "retired": sorted(retired),
                    "retired_batch_floor": floor,
                }

            self.log.update(_swap)
            for p in seg_paths:
                # unique retired name: a segment number can be reused
                # across compaction cycles, so "old-<name>" may exist
                base = os.path.join(
                    os.path.dirname(p), "old-" + os.path.basename(p)
                )
                retired, k = base, 1
                while os.path.exists(retired):
                    k += 1
                    retired = f"{base}-{k}"
                os.rename(p, retired)
        return dst


class SegmentedSearchEngine(BlockedSearchEngine):
    """BlockedSearchEngine over N segments with exact global scoring.

    Reuses every query path of the parent (pruned OR, AND range
    pruning, nested booleans, phrases) by overriding the three
    primitives they consume: `_term_blocks` (idf-substituted union),
    `_term_meta` (globally aggregated + rescaled), `_doclens`/`_stats`
    (global)."""

    def __init__(
        self,
        spark: SparkSession,
        segments: list[BlockedIndex],
        cache: bool = False,
        tombstones: DataFrame | None = None,
    ):
        assert segments, "need at least one segment"
        self.spark = spark
        self.segs = segments
        self._tomb = tombstones
        mans = [s._manifest()["stages"]["blocks"] for s in segments]
        for m in mans:
            if m.get("score_mode") != "dl":
                raise ValueError(
                    "segmented search requires score_mode='dl' segments "
                    "(global idf substitution needs tf+dl payloads)"
                )
        self.n_buckets = int(mans[0]["n_buckets"])
        if not all(int(m["n_buckets"]) == self.n_buckets for m in mans):
            raise ValueError("segments disagree on n_buckets")
        self._seg_has_pos = all(bool(m.get("with_positions")) for m in mans)
        self.n_docs = int(sum(m["n_docs"] for m in mans))
        self.avgdl = float(
            sum(m["avgdl"] * m["n_docs"] for m in mans) / self.n_docs
        )
        # per-segment avgdl: the stored pruning bounds were computed
        # under these, while decode uses the global self.avgdl — the
        # bound rescale needs the ratio (see module docstring)
        self._seg_avgdl = [float(m["avgdl"]) for m in mans]
        # url field: all-or-nothing across segments — a mixed set would
        # make global url df/avgdl semantically different from a single
        # index over the same docs (some urls never indexed), so it is
        # rejected like a positions mismatch rather than guessed around
        url_flags = [bool(m.get("url_field")) for m in mans]
        if any(url_flags) and not all(url_flags):
            raise ValueError(
                "segments disagree on url_field — rebuild or compact "
                "so every segment indexes the same fields"
            )
        self._url_field = all(url_flags)
        if self._url_field:
            # global url avgdl: Σ seg totals / N (each seg total is
            # avgdl_url_seg × n_docs_seg — exact as a real number,
            # same weighted form as the content avgdl above)
            self.avgdl_url: float | None = float(
                sum(float(m["avgdl_url"] or 0.0) * m["n_docs"] for m in mans)
                / self.n_docs
            )
            self._seg_avgdl_url = [float(m["avgdl_url"] or 0.0) for m in mans]
        else:
            self.avgdl_url = None
            self._seg_avgdl_url = [0.0] * len(mans)
        self._seg_blocks = [s.blocks(spark) for s in segments]
        self._seg_tdicts = [s.terms(spark) for s in segments]
        self._stats_cache = (self.n_docs, self.avgdl)
        self._doclens_cache = None
        self._meta_cache: dict[tuple, dict] = {}
        # parent-contract attribute: _term_meta/_doclens are overridden
        # here, but any parent method touching the hot-serving memo must
        # find it initialised (BlockedSearchEngine.__init__ is not called)
        self._meta_memo: dict[str, dict | None] | None = {} if cache else None
        # aligned-bound state (wand.py): cm arrays are safe to memoize
        # here too — a term's rescaled block bounds depend only on its
        # own global idf and the fixed segment set
        self._cm_memo = {} if cache else None
        self._ranges_memo = {} if cache else None
        # fuzzy neighborhoods: the committed segment set is fixed for
        # this engine, so the union vocabulary is immutable too
        self._fuzzy_memo = {} if cache else None
        self._domain_cache: tuple[int, int] | None = None
        self._range_ctx: tuple[int | None, int | None] | None = None
        # per-(term, segment) dictionary idf, stashed by _term_meta —
        # the cm-sidecar rescale factors need it (same ratio as
        # _term_blocks applies to block_max_score)
        self._seg_idf: dict[tuple[str, int], float] = {}
        self._seg_cm_cache: list[dict | None] | None = None
        self._cm_last_path: str | None = None
        if cache:
            self._seg_blocks = [b.cache() for b in self._seg_blocks]
            self._seg_tdicts = [t.cache() for t in self._seg_tdicts]
        # parent attributes not used directly by overridden paths
        self.index = segments[0]
        self.blocks = None
        self.tdict = None

    # The PARENT's sidecar mechanism stays hard OFF: it reads ONE
    # index's cm tables raw, and a segment sharing the union's doc
    # domain (e.g. an even/odd doc split) would pass its grid check and
    # silently serve one segment's unrescaled arrays.  The segmented
    # engine instead serves per-segment sidecars through its own
    # reader (_cm_arrays override below): each segment's raw maxima
    # are rescaled by the same per-(term, segment) factor
    # _term_blocks applies and conservatively projected from the
    # segment's grid onto the union grid.
    CM_SIDECAR = False

    # -- global metadata ------------------------------------------------------

    def _term_meta(self, terms: list[str]) -> dict[str, dict]:
        """Global (df, idf, gmax, s10, s100) per term.

        Per-segment dictionary rows are tiny pruned scans; global idf is
        evaluated with the same Catalyst log1p expression as the naive
        engine; per-segment bounds rescale by idf_g/idf_s (linear), with
        one-sided ulp guards so they stay valid bounds."""
        key = tuple(sorted(set(terms)))
        if key in self._meta_cache:
            return self._meta_cache[key]
        # ONE job for all segments' dictionary rows (a per-segment
        # sequential collect would cost a driver round-trip per
        # segment — linear query latency in segment count)
        parts = []
        for i, td in enumerate(self._seg_tdicts):
            parts.append(
                self._bucket_filter(td, list(key))
                .filter(F.col("term").isin(list(key)))
                .withColumn("_seg", F.lit(i))
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        per_seg: list[dict[str, dict]] = [{} for _ in self._seg_tdicts]
        for r in u.collect():
            d = r.asDict()
            per_seg[d.pop("_seg")][d["term"]] = d
        df_g: dict[str, int] = {}
        for seg in per_seg:
            for t, m in seg.items():
                df_g[t] = df_g.get(t, 0) + int(m["df"])
        if not df_g:
            self._meta_cache[key] = {}
            return {}
        # global idf via the Catalyst expression (bit-identical to the
        # naive engine's idf_expr) — a ≤|terms|-row local job
        from bids_spark.functions.bm25 import idf_expr

        idf_rows = (
            self.spark.createDataFrame(
                [(t, d) for t, d in df_g.items()], ["term", "df"]
            )
            .select(
                "term", idf_expr(F.col("df"), F.lit(self.n_docs)).alias("idf")
            )
            .collect()
        )
        idf_g = {r["term"]: float(r["idf"]) for r in idf_rows}
        out: dict[str, dict] = {}
        for t in df_g:
            gmax = s10 = s100 = 0.0
            n_blocks = 0
            for i, seg in enumerate(per_seg):
                m = seg.get(t)
                if not m:
                    continue
                self._seg_idf[(t, i)] = float(m["idf"])
                r = idf_g[t] / float(m["idf"]) if m["idf"] else 0.0
                # avgdl correction: per-doc global/segment score ratio
                # lies strictly in (min(1,a), max(1,a)), a = avgdl_g/
                # avgdl_s — of the TERM'S FIELD (url terms rescale by
                # the url field's averages)
                a = self._a_ratio(t, i)
                up, down = max(1.0, a), min(1.0, a)
                gmax = max(gmax, float(m["gmax"]) * r * up * _UP)
                s10 = max(s10, float(m["s10"] or 0.0) * r * down * _DOWN)
                s100 = max(s100, float(m["s100"] or 0.0) * r * down * _DOWN)
                n_blocks += int(m.get("n_blocks") or 0)
            out[t] = {
                "term": t, "df": df_g[t], "idf": idf_g[t],
                "gmax": gmax, "s10": s10, "s100": s100,
                "n_blocks": n_blocks,
            }
        self._meta_cache[key] = out
        return out

    # -- blocks view with global idf / rescaled bounds ------------------------

    def _a_ratio(self, term: str, i: int) -> float:
        """avgdl_g(field)/avgdl_seg(field) for the term's field in
        segment i.  A segment whose url avgdl is 0 holds no url
        postings — no dictionary/cm row of an ns term can come from
        it, so the 1.0 fallback is never consumed."""
        if is_url_term(term):
            s = self._seg_avgdl_url[i]
            return (self.avgdl_url / s) if s and self.avgdl_url else 1.0
        return self.avgdl / self._seg_avgdl[i]

    def _term_blocks(self, terms: list[str]) -> DataFrame:
        return self._union_term_blocks(terms, range(len(self._seg_blocks)))

    def _vocabulary(self) -> DataFrame:
        """Fuzzy expansion scans the union of the segments' term
        dictionaries (duplicates fine — the expansion set-dedups)."""
        out = self._seg_tdicts[0].select("term")
        for td in self._seg_tdicts[1:]:
            out = out.unionByName(td.select("term"))
        return out

    def _termrange_blocks(self, tr) -> DataFrame:
        """Union of every segment's in-range blocks.  No idf
        substitution / bound rescaling: a TermRange is a constant
        scorer, so only doc_ids are consumed downstream (and its
        _eval_termrange consumer never reads score bounds)."""
        from bids_spark.plans.planner import term_range_pred

        parts = [
            sb.filter(term_range_pred(F.col("term"), tr))
            for sb in self._seg_blocks
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _union_term_blocks(self, terms: list[str], idxs) -> DataFrame:
        """Rescaled blocks view over a SUBSET of segments — the full
        union for queries, the sidecar-less subset for _cm_arrays'
        fallback aggregation."""
        meta = self._term_meta(terms)
        idxs = list(idxs)
        if not meta or not idxs:
            # empty but schema-correct frame
            base = self._seg_blocks[0]
            return base.filter(F.lit(False))
        # global-idf substitution source: a ≤|terms|-row lookup — CASE
        # literal by default (one per-query broadcast-materialize job
        # saved, and it multiplies here: the join twin plants one
        # broadcast node under EVERY segment branch of the union),
        # broadcast-dim twin as the executable spec.
        idf_vals = {t: float(m["idf"]) for t, m in meta.items()}
        if self.TINY_LOOKUP_LITERAL:
            idf_map = None
            idf_g_col = lookup_expr(F.col("term"), idf_vals)
        else:
            idf_map = F.broadcast(
                self.spark.createDataFrame(
                    list(idf_vals.items()), ["term", "idf_g"]
                )
            )
        parts = []
        for i in idxs:
            blocks = self._seg_blocks[i]
            tb = self._bucket_filter(blocks, terms).filter(
                F.col("term").isin(terms)
            )
            # substitute global idf; rescale the pruning bound by the
            # linear idf ratio TIMES the avgdl upper correction
            # (+ulp guard).  Decode then recomputes scores with idf_g
            # and the global avgdl → exactly the single-index scores.
            # With the url field the correction is per-FIELD (a term's
            # bounds were computed under its own field's segment
            # avgdl), so the literal becomes a namespace CASE.
            a_up = max(1.0, self.avgdl / self._seg_avgdl[i])
            if self._url_field:
                from bids_spark.functions.fields import url_term_col

                su = self._seg_avgdl_url[i]
                a_up_u = max(
                    1.0,
                    (self.avgdl_url / su) if su and self.avgdl_url else 1.0,
                )
                a_up_col = F.when(
                    url_term_col(F.col("term")), F.lit(a_up_u * _UP)
                ).otherwise(F.lit(a_up * _UP))
            else:
                a_up_col = F.lit(a_up * _UP)
            if idf_map is None:
                # isin(meta) reproduces the inner join's drop of any
                # block term lacking a dictionary row (shouldn't occur)
                tb = tb.filter(F.col("term").isin(list(idf_vals))).withColumn(
                    "_idf_g", idf_g_col
                )
            else:
                tb = tb.join(idf_map, "term").withColumnRenamed(
                    "idf_g", "_idf_g"
                )
            tb = (
                tb.withColumn(
                    "block_max_score",
                    F.col("block_max_score")
                    * (F.col("_idf_g") / F.col("idf"))
                    * a_up_col,
                )
                .drop("idf")
                .withColumnRenamed("_idf_g", "idf")
            )
            parts.append(tb)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- overridden plumbing ---------------------------------------------------

    def _doc_domain(self) -> tuple[int, int]:
        """Union of the per-segment doc domains (each from its build
        manifest — no job); metadata-agg fallback when any segment
        predates the manifest field."""
        if self._domain_cache is None:
            try:
                doms = [s.doc_domain for s in self.segs]
                self._domain_cache = (
                    min(d[0] for d in doms), max(d[1] for d in doms)
                )
            except KeyError:
                u = self._seg_blocks[0].select("first_doc", "max_doc")
                for b in self._seg_blocks[1:]:
                    u = u.unionByName(b.select("first_doc", "max_doc"))
                r = u.agg(
                    F.min("first_doc").alias("lo"),
                    F.max("max_doc").alias("hi"),
                ).first()
                self._domain_cache = (
                    (int(r["lo"]), int(r["hi"]))
                    if r["lo"] is not None
                    else (0, 0)
                )
        return self._domain_cache

    def _has_deletes(self) -> bool:
        return self._tomb is not None

    def _live(self, df):
        """Constant scorers (All/Range) must not resurrect tombstoned
        docs — same anti-join the decode override applies."""
        if self._tomb is not None:
            return df.join(self._tomb, "doc_id", "left_anti")
        return df

    # -- per-segment chunk-max sidecars ---------------------------------------

    def _seg_cm_meta(self) -> list[dict | None]:
        """Per-segment cm-stage manifest entries (grid + wide_rows),
        None where a segment lacks a compatible sidecar.  Cached — the
        segment set is fixed per engine instance."""
        if self._seg_cm_cache is None:
            out: list[dict | None] = []
            for s in self.segs:
                try:
                    st = s._manifest()["stages"]["cm"]
                    out.append(st if "wide_rows" in st else None)
                except (KeyError, FileNotFoundError):
                    out.append(None)
            self._seg_cm_cache = out
        return self._seg_cm_cache

    def _cm_factor(self, t: str, i: int,
                   meta: dict[str, dict]) -> float | None:
        """Rescale factor for segment i's raw chunk maxima of term t —
        the same idf ratio × avgdl upper correction _term_blocks
        applies to block_max_score, with one extra one-sided ulp guard
        covering the association difference (here the factor is formed
        BEFORE multiplying the stored maximum; Spark multiplies the
        ratio in first).  None when the term is absent from the
        segment (no dictionary row → no cm rows either)."""
        idf_s = self._seg_idf.get((t, i))
        m = meta.get(t)
        if not idf_s or m is None:
            return None
        a_up = max(1.0, self._a_ratio(t, i))
        return float(m["idf"]) / idf_s * a_up * _UP * _UP

    # Below this many candidate blocks (Σ n_blocks over the query
    # terms, global across segments) the rescaled-union aggregation
    # serves the cm arrays even when sidecars exist: measured at 3M
    # docs (BENCH/seg_cm_bench_r4.log) the aggregation is marginally
    # faster while its input is small — the sidecar read pays fixed
    # per-stage scan setup across segments.  Above it the aggregation
    # input keeps growing with the corpus while the sidecar read stays
    # ≤ n_chunks rows/term/segment regardless of scale.
    SEG_CM_AGG_BELOW = 1 << 17

    def _cm_arrays(self, tb: DataFrame, terms: list[str]) -> dict[str, np.ndarray]:
        """Per-term chunk-max arrays on the UNION grid under GLOBAL
        idf (consumed by the aligned OR bound and the AND/phrase
        intersection bitmaps — wand.py Phase 3).

        Segments carrying a build-time cm sidecar serve from ONE
        unioned bucket+term-pruned scan of ≤ n_chunks rows/term each —
        CONSTANT in corpus size — with each raw maximum rescaled by
        the per-(term, segment) factor above and conservatively
        projected from the segment's own grid onto the union grid
        (chunkgrid.fill_max: projection only ever widens an upper
        bound / presence test, so pruning stays exact).  Segments
        without a sidecar (fresh micro-batches below
        CM_BUILD_MIN_BLOCKS) fall back to the parent-style metadata
        aggregation over THEIR rescaled blocks only — small by
        construction.  At web scale the compacted bulk (which
        compact()'s build() gives sidecars automatically) serves O(1)
        rows per term and only the fresh tail pays an aggregation
        whose input is one micro-batch's metadata."""
        lo, width, n = self._chunk_grid()
        missing = (
            terms
            if self._cm_memo is None
            else [t for t in terms if t not in self._cm_memo]
        )
        built: dict[str, np.ndarray] = {}
        if missing:
            meta = self._term_meta(missing)  # also stashes _seg_idf
            built = {t: np.zeros(n) for t in missing}
            cm_meta = self._seg_cm_meta()
            n_cand = sum(
                int(meta.get(t, {}).get("n_blocks") or 0) for t in missing
            )
            if n_cand < self.SEG_CM_AGG_BELOW:
                # small candidate set: the aggregation's input is still
                # tiny — skip the sidecar scans (measured dispatch, see
                # SEG_CM_AGG_BELOW)
                cm_meta = [None] * len(cm_meta)
            side_idx = [i for i, st in enumerate(cm_meta) if st is not None]
            agg_idx = [i for i, st in enumerate(cm_meta) if st is None]
            self._cm_last_path = (
                "aggregation" if not side_idx
                else ("sidecar" if not agg_idx else "mixed")
            )

            def read(stage: str, cols: list[str], idxs: list[int]):
                parts = []
                for i in idxs:
                    parts.append(
                        self._bucket_filter(
                            self.segs[i].io.read(self.spark, stage), missing
                        )
                        .filter(F.col("term").isin(missing))
                        .select(*cols)
                        .withColumn("_seg", F.lit(i))
                    )
                u = parts[0]
                for p in parts[1:]:
                    u = u.unionByName(p)
                return u.collect()

            if side_idx:
                for r in read("cm", ["term", "c", "m"], side_idx):
                    i = r["_seg"]
                    f = self._cm_factor(r["term"], i, meta)
                    if f is None:
                        continue
                    st = cm_meta[i]
                    s_lo, s_w = int(st["lo"]), int(st["width"])
                    d_lo = s_lo + int(r["c"]) * s_w
                    chunkgrid.fill_max(
                        built[r["term"]], lo, width,
                        d_lo, d_lo + s_w - 1, float(r["m"]) * f,
                    )
                wide_idx = [
                    i for i in side_idx
                    if int(cm_meta[i].get("wide_rows") or 0)
                ]
                if wide_idx:
                    for r in read(
                        "cm_wide", ["term", "c1", "c2", "m"], wide_idx
                    ):
                        i = r["_seg"]
                        f = self._cm_factor(r["term"], i, meta)
                        if f is None:
                            continue
                        st = cm_meta[i]
                        s_lo, s_w = int(st["lo"]), int(st["width"])
                        chunkgrid.fill_max(
                            built[r["term"]], lo, width,
                            s_lo + int(r["c1"]) * s_w,
                            s_lo + (int(r["c2"]) + 1) * s_w - 1,
                            float(r["m"]) * f,
                        )
            if agg_idx:
                tb2 = self._union_term_blocks(missing, agg_idx)
                rows = (
                    tb2.select(
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
                    a = built[r["term"]]
                    c = int(r["c"])
                    a[c] = max(a[c], float(r["m"]))
            if self._cm_memo is not None:
                self._cm_memo.update(built)
        return {
            t: (built[t] if t in built else self._cm_memo[t]) for t in terms
        }

    def _decode(self, blocks: DataFrame) -> DataFrame:
        """Tombstoned docs are dropped right after decode (before any
        aggregation/top-k) — Lucene live-doc skipping.  Scores of the
        surviving docs are untouched: df/N/avgdl keep counting deleted
        docs until compact() purges them, exactly like a Lucene/tantivy
        index before merge."""
        out = super()._decode(blocks)
        if self._tomb is not None:
            # no broadcast hint: the tombstone relation is a parquet
            # scan with file-size stats, so Catalyst auto-broadcasts
            # while it is small and falls back to a shuffle join when a
            # mass delete outgrows the broadcast threshold
            out = out.join(self._tomb, "doc_id", "left_anti")
        return out

    def _doclens(self) -> DataFrame:
        if self._doclens_cache is None:
            dfs = [s.doclens(self.spark) for s in self.segs]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            self._doclens_cache = out
        return self._doclens_cache

    def _stats(self) -> tuple[int, float]:
        return self._stats_cache

    def _has_positions(self) -> bool:
        """Parent seam: phrases need positions in EVERY segment."""
        return self._seg_has_pos

    def _decode_positions(self, blocks):
        """Parent seam: tombstoned docs dropped right after the
        positions decode, like _decode.  Routing phrases through the
        parent's _eval_phrase (instead of the pre-round-4 override)
        also gives segmented phrases the member-conjunction block
        restriction (bitmap + rarest-term spans) and the fused
        single-aggregation evaluation — segments are always dl-mode
        (enforced in __init__), so the payload dl is always there."""
        out = super()._decode_positions(blocks)
        if self._tomb is not None:
            out = out.join(self._tomb, "doc_id", "left_anti")
        return out
