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

Determinism: hyperplanes are seeded; recall is property-tested against
brute force in pytest (approximate ≠ oracle-matchable).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    scored = emb.select(F.col(id_col).alias("vec_id"), cos.alias("cos"))
    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "vec_id",
        F.round("cos", 6).alias("cos"),
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def lsh_signatures(
    emb: DataFrame, dim: int, bits: int = 32, seed: int = 42,
    id_col="vec_id", vec_col="embedding",
) -> DataFrame:
    """(vec_id, sig bigint) — sign bits vs seeded random hyperplanes,
    computed as column math (one dot product per bit, JVM-side)."""
    planes = _hyperplanes(dim, bits, seed)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        sig = sig + F.when(
            _dot(F.col(vec_col), plane) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return emb.select(F.col(id_col).alias("vec_id"), sig.alias("sig"))


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
    width = bits // bands
    banded = sigs.select(
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
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b")
        )
        .distinct()
    )
    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"))
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
