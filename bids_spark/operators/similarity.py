r"""Similarity search over an embedding column (array<float>).

- cosine_topk:        exact brute-force top-k vs a query vector —
                      `zip_with` dot product + norm column math, all
                      JVM (no UDF); the correctness baseline.
- lsh_ann_topk:       random-hyperplane LSH: 32-bit sign signature →
                      Hamming-banded candidate buckets → exact cosine
                      re-rank of candidates.  The scale path: candidate
                      generation touches only co-bucketed vectors.
- embedding_neardup:  all pairs with cosine ≥ τ via the same banding
                      (dedup by embedding).
- LshAnnIndex:        pre-bucketed banded signatures (partition-pruned
                      candidate lookup).
- IvfAnnIndex:        inverted-file coarse quantizer — deterministic
                      seeded centroids + one Lloyd step, vectors
                      parquet-partitioned by cell, nprobe-pruned query.

Determinism: hyperplanes are seeded; recall is property-tested against
brute force in pytest (approximate ≠ oracle-matchable).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _arr_lit(vals):
    """Constant-folded array<double> literal from one json STRING
    literal.  `F.array(*[F.lit(x) ...])` crosses py4j once PER ELEMENT
    (~0.5 ms each of pure driver time — the hazard the aligned bound
    hit at 16k doubles, wand.py Phase 3 note), so a dim-4096 query
    vector would cost ~2 s per query before any Spark work; the json
    form ships one string and ConstantFolding evaluates it JVM-side.
    json round-trips float64 exactly (shortest repr)."""
    return F.from_json(
        F.lit(json.dumps([float(x) for x in vals])), "array<double>"
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """(rank, vec_id, cos) exact top-k by cosine vs a literal query."""
    q = _arr_lit(query_vec)
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    scored = emb.select(F.col(id_col).alias("vec_id"), cos.alias("cos"))
    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    # single-partition window over ≤k rows — intended (see planner.py
    # rank note; WindowExec advisory silenced in session.get_spark)
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "vec_id",
        F.round("cos", 6).alias("cos"),
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


# Above this many bits×dim literal nodes lsh_signatures dispatches to
# the Arrow-batched matmul path.  Default 0 = matmul always: measured
# (tools/sig_bench.py, BENCH/BASELINE.md "LSH signature paths") the
# column path loses at EVERY size — it pays 1.3–2 s of plan
# construction/compile per query even at 256 literal nodes, and its
# per-row cost is ~10× the matmul's (32 Catalyst expression evals per
# row vs one BLAS call per Arrow batch: ~9.2 vs ~0.9 µs/row at dim
# 64).  At transformer dims (24,576 nodes at 32×768) the column path
# is additionally a Catalyst plan-size hazard — the same
# expression-size class as the IVF when-chain bug
# (IvfAnnIndex._nearest_cell docstring).  The column twin stays as the
# JVM-pure executable spec, bit-for-bit parity-tested; raise this knob
# to force it (tests/bench do).
VECTORIZE_SIG_NODES_ABOVE = 0


def _lsh_signatures_vectorized(
    emb: DataFrame, planes: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    """Signature via one (batch × dim) @ (dim × bits) matrix multiply
    per Arrow batch; sign-bit rule (strict > 0) and bit packing match
    the column path (parity-tested at low dim).  The plane matrix
    ships in the closure — bits × dim float64, ~1 MB at 32 × 4096."""
    bits = planes.shape[0]
    weights = (1 << np.arange(bits, dtype=np.int64))
    pt = np.ascontiguousarray(planes.T)

    @F.pandas_udf("long")
    def sig(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int64")
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        return pd.Series(((m @ pt) > 0) @ weights)

    return emb.select(
        F.col(id_col).alias("vec_id"), sig(F.col(vec_col)).alias("sig")
    )


def _lsh_signatures_column(
    emb: DataFrame, planes: np.ndarray, id_col: str, vec_col: str
) -> DataFrame:
    """The JVM-pure column-math twin: one dot product per bit as
    Catalyst expressions over per-coefficient literals.  Kept as the
    executable spec of the sign/bit-pack rule (bit-for-bit parity with
    the matmul path is tested) — measured slower at every size, see
    VECTORIZE_SIG_NODES_ABOVE."""
    bits = planes.shape[0]
    sig = F.lit(0).cast("long")
    for i in range(bits):
        plane = _arr_lit(planes[i])
        sig = sig + F.when(
            _dot(F.col(vec_col), plane) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return emb.select(F.col(id_col).alias("vec_id"), sig.alias("sig"))


def lsh_signatures(
    emb: DataFrame, dim: int, bits: int = 32, seed: int = 42,
    id_col="vec_id", vec_col="embedding",
) -> DataFrame:
    """(vec_id, sig bigint) — sign bits vs seeded random hyperplanes.
    Arrow-batched matmul by default (one (batch×dim)@(dim×bits) BLAS
    call per batch); the JVM column-math twin serves when bits×dim ≤
    VECTORIZE_SIG_NODES_ABOVE (0 by default — see the measured
    rationale at that knob)."""
    planes = _hyperplanes(dim, bits, seed)
    if bits * dim > VECTORIZE_SIG_NODES_ABOVE:
        return _lsh_signatures_vectorized(emb, planes, id_col, vec_col)
    return _lsh_signatures_column(emb, planes, id_col, vec_col)


def lsh_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 32,
    bands: int = 8,
    seed: int = 42,
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """ANN top-k: candidates = vectors sharing ≥1 signature band with
    the query, re-ranked by exact cosine.  Recall vs brute force is
    property-tested; at scale the bucket join replaces the full scan."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    qbits = (planes @ np.asarray(query_vec)) > 0
    qsig = int(sum(1 << i for i, b in enumerate(qbits) if b))
    width = bits // bands
    sigs = lsh_signatures(emb, dim, bits, seed, id_col, vec_col)
    cond = None
    for i in range(bands):
        qband = (qsig >> (i * width)) & ((1 << width) - 1)
        c = (
            F.shiftrightunsigned(F.col("sig"), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            )
            == F.lit(qband)
        )
        cond = c if cond is None else (cond | c)
    cand_ids = sigs.filter(cond).select("vec_id")
    cands = emb.join(
        cand_ids, emb[id_col] == cand_ids["vec_id"], "left_semi"
    )
    return cosine_topk(cands, query_vec, k, id_col, vec_col)


def _banded_keys(sigs: DataFrame, bits: int, bands: int) -> DataFrame:
    """(vec_id, band, key) — signature split into band-wise sub-keys."""
    width = bits // bands
    return sigs.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("sig"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.key")


class LshAnnIndex:
    """Pre-bucketed ANN: banded signatures materialized as parquet
    partitioned by `band` with `key` sorted within each partition.

    The ad-hoc ``lsh_ann_topk`` recomputes every signature and scans
    the whole relation with an OR-of-bands predicate — fine for one
    shot, a full pass per query at 10^12 vectors.  Here candidate
    lookup is a pruned scan (directory-level PartitionFilters on band,
    key pushed to parquet row-group stats — the same layout as the
    term-bucket design of the blocked index, SURVEY §2 D2), touching
    only the query's `bands` buckets.
    """

    def __init__(self, path: str, bits: int = 32, bands: int = 8, seed: int = 42,
                 io=None, meta_log=None):
        import os

        from bids_spark.io import ParquetTableIO, PosixRenameLog

        self.path = path
        self.io = io or ParquetTableIO(path)
        self.meta_log = meta_log or PosixRenameLog(
            os.path.join(path, "ann_meta.json")
        )
        m = self.meta_log.read()
        if m is not None:
            bits, bands, seed = m["bits"], m["bands"], m["seed"]
            self.dim = m["dim"]
        else:
            self.dim = None
        self.bits, self.bands, self.seed = bits, bands, seed

    def build(
        self, emb: DataFrame, id_col="vec_id", vec_col="embedding"
    ) -> "LshAnnIndex":
        dim = len(emb.select(vec_col).first()[vec_col])
        sigs = lsh_signatures(emb, dim, self.bits, self.seed, id_col, vec_col)
        banded = _banded_keys(sigs, self.bits, self.bands)
        self.io.write(
            banded.repartition("band").sortWithinPartitions("key"),
            "buckets", partition_by=["band"],
        )
        self.io.write(
            emb.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
            ),
            "vectors",
        )
        self.dim = dim
        # meta commits LAST — readers never see buckets without meta
        self.meta_log.commit(
            {"bits": self.bits, "bands": self.bands, "seed": self.seed,
             "dim": dim}
        )
        return self

    def candidates(self, spark, query_vec: list[float]) -> DataFrame:
        """Distinct vec_ids sharing ≥1 band key with the query — a
        pruned scan of exactly `bands` (band, key) buckets."""
        assert self.dim is not None, "index not built"
        planes = _hyperplanes(self.dim, self.bits, self.seed)
        qbits = (planes @ np.asarray(query_vec, dtype=np.float64)) > 0
        qsig = int(sum(1 << i for i, b in enumerate(qbits) if b))
        width = self.bits // self.bands
        buckets = self.io.read(spark, "buckets")
        cond = None
        for i in range(self.bands):
            qband = (qsig >> (i * width)) & ((1 << width) - 1)
            c = (F.col("band") == i) & (F.col("key") == qband)
            cond = c if cond is None else (cond | c)
        return buckets.filter(cond).select("vec_id").distinct()

    def topk(self, spark, query_vec: list[float], k: int = 10) -> DataFrame:
        cands = self.candidates(spark, query_vec)
        vecs = self.io.read(spark, "vectors")
        return cosine_topk(vecs.join(cands, "vec_id", "left_semi"), query_vec, k)


class IvfAnnIndex:
    """IVF (inverted-file) ANN: coarse quantizer + partition-pruned
    probe — the classic scale path next to the LSH one (`LshAnnIndex`).

    Training is deterministic and fully distributed:
    - seeds: the `n_cells` vectors with the smallest xxhash64(vec_id)
      (a deterministic corpus sample — one TakeOrdered, no RNG),
    - one Lloyd refinement: every vector is assigned to its nearest
      seed by cosine — JVM column math (n_cells literal dot products,
      no UDF, no cross join) up to VECTORIZE_CELLS_ABOVE cells, one
      Arrow-batched matrix multiply per batch beyond that (the CASE
      chain hits Catalyst expression-size limits at the thousands of
      cells a 10^12 corpus needs) — then cells are re-centred by the
      element-wise mean (posexplode → groupBy(cell, idx) partial agg).

    The index materializes vectors as parquet PARTITIONED BY cell; a
    query ranks the n_cells centroids driver-side (numpy over a
    kilobyte of metadata), reads only its `nprobe` cell directories
    (directory-level PartitionFilters), and exact-cosine re-ranks the
    probed subset.  At 10^12 vectors a query touches nprobe/n_cells of
    the data instead of all of it; recall is property-tested against
    brute force (approximate ⇒ no SQL oracle, same policy as LSH-ANN).
    """

    def __init__(self, path: str, n_cells: int = 16, nprobe: int = 4,
                 io=None, meta_log=None):
        import os

        from bids_spark.io import ParquetTableIO, PosixRenameLog

        self.path = path
        self.io = io or ParquetTableIO(path)
        self.meta_log = meta_log or PosixRenameLog(
            os.path.join(path, "ivf_meta.json")
        )
        self.centroids: np.ndarray | None = None
        m = self.meta_log.read()
        if m is not None:
            n_cells, nprobe = m["n_cells"], m["nprobe"]
            self.centroids = np.asarray(m["centroids"], dtype=np.float64)
        self.n_cells, self.nprobe = n_cells, nprobe

    # Above this cell count the when-chain assignment (one nested CASE
    # per cell) hits Catalyst expression-tree and codegen limits long
    # before data does — switch to one Arrow-batched matrix multiply.
    # A 10^12-vector corpus wants thousands of cells (~√n ideally);
    # the matmul path is the one that survives that.
    VECTORIZE_CELLS_ABOVE = 64

    @staticmethod
    def _nearest_cell(vec_col, centroids: np.ndarray):
        """argmax-by-cosine over literal centroids as pure column math
        (ties → lowest cell id).  Centroids are L2-normalized first so
        cosine reduces to one dot product per cell.

        Shape matters: one flat array of the n_cells dot products +
        array_position(·, array_max(·)) — expression size O(cells·dim).
        The earlier fold (when(better, …).otherwise(prev)) embedded the
        running best TWICE per step, i.e. an exponentially-sized tree:
        at 16 cells Catalyst analysis alone ran for minutes (caught by
        tools/ivf_bench.py hanging; the parity tests used fewer cells
        and never tripped it)."""
        normed = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        cos_arr = F.array(
            *[
                _dot(vec_col, _arr_lit(normed[ci]))
                for ci in range(normed.shape[0])
            ]
        )
        # array_position finds the FIRST occurrence (1-based) of the
        # max — the max is an element of the same array, so the double
        # equality is exact, and ties resolve to the lowest cell id
        # (np.argmax's rule — the vectorized twin matches)
        return (
            F.array_position(cos_arr, F.array_max(cos_arr)) - F.lit(1)
        ).cast("int")

    @staticmethod
    def _nearest_cell_vectorized(vec_col, centroids: np.ndarray):
        """Same argmax-by-cosine as an Arrow-batched pandas UDF: one
        (batch × dim) @ (dim × n_cells) matrix multiply per Arrow batch
        instead of n_cells CASE expressions per row.  np.argmax takes
        the FIRST maximum, matching the when-chain's strict-> tie rule
        (ties → lowest cell id); parity is property-tested.  The normed
        centroid matrix (n_cells × dim float64) ships in the closure —
        a few MB even at thousands of cells × transformer dims."""
        normed = np.ascontiguousarray(
            centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        )

        @F.pandas_udf("int")
        def assign(vs: pd.Series) -> pd.Series:
            if len(vs) == 0:
                return pd.Series([], dtype="int32")
            m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
            return pd.Series(np.argmax(m @ normed.T, axis=1).astype("int32"))

        return assign(vec_col)

    @classmethod
    def _assign_cell(cls, vec_col, centroids: np.ndarray):
        """Dispatch: column math while the CASE chain stays small,
        vectorized matmul above VECTORIZE_CELLS_ABOVE cells."""
        if centroids.shape[0] > cls.VECTORIZE_CELLS_ABOVE:
            return cls._nearest_cell_vectorized(vec_col, centroids)
        return cls._nearest_cell(vec_col, centroids)

    def build(
        self, emb: DataFrame, id_col="vec_id", vec_col="embedding"
    ) -> "IvfAnnIndex":
        seeds_rows = (
            emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("e"))
            .orderBy(F.xxhash64(F.col("vid")))
            .limit(self.n_cells)
            .collect()
        )
        seeds = np.asarray([r["e"] for r in seeds_rows], dtype=np.float64)
        assigned = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            self._assign_cell(F.col(vec_col), seeds).alias("cell"),
        )
        # one Lloyd step: element-wise mean per cell, n_cells·dim rows
        # of metadata to the driver (kilobytes at any corpus size)
        means = (
            assigned.select(
                "cell", F.posexplode("embedding").alias("idx", "v")
            )
            .groupBy("cell", "idx")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        cents = seeds.copy()
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["idx"]] = r["m"]
        for ci, comps in by_cell.items():
            cents[ci] = [comps[i] for i in range(len(comps))]
        final = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
            self._assign_cell(F.col(vec_col), cents).alias("cell"),
        )
        self.io.write(
            final.repartition("cell"), "cells", partition_by=["cell"]
        )
        self.centroids = cents
        # meta commits LAST — a crash mid-build leaves no readable index
        self.meta_log.commit(
            {"n_cells": self.n_cells, "nprobe": self.nprobe,
             "centroids": cents.tolist()}
        )
        return self

    def topk(self, spark, query_vec: list[float], k: int = 10) -> DataFrame:
        assert self.centroids is not None, "index not built"
        q = np.asarray(query_vec, dtype=np.float64)
        cn = self.centroids / np.linalg.norm(self.centroids, axis=1, keepdims=True)
        order = np.argsort(-(cn @ q), kind="stable")
        probe = [int(c) for c in order[: self.nprobe]]
        cells = self.io.read(spark, "cells")
        probed = cells.filter(F.col("cell").isin(probe))
        return cosine_topk(probed, query_vec, k)


def embedding_allpairs_exact(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """(vec_a, vec_b, cos) — EXACT all-pairs cosine ≥ threshold via a
    self-join (no banding): O(n²) work, the small-n oracle/verification
    twin of embedding_neardup_pairs.  Norms are precomputed per vector
    so the pair stage does one dot product, not three."""
    normed = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("e"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    a = normed.select(
        F.col("vid").alias("vec_a"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = normed.select(
        F.col("vid").alias("vec_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    bits: int = 32,
    bands: int = 8,
    seed: int = 42,
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """(vec_a, vec_b, cos) pairs with cosine ≥ threshold; candidates
    from shared signature bands, exact-cosine verified."""
    first = emb.select(vec_col).first()
    dim = len(first[vec_col])
    sigs = lsh_signatures(emb, dim, bits, seed, id_col, vec_col)
    banded = _banded_keys(sigs, bits, bands)
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b")
        )
        .distinct()
    )
    # norms precomputed once per vector (not per candidate pair), same
    # as the exact twin above: the verify stage does one dot product
    a = emb.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("ea"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("eb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
