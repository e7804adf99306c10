r"""Deduplication operators — exact and near-dup, at pipeline scale.

The reference dedups at query time by full-content equality with
over-fetch (/root/reference/bids/index.py:151-181).  At 10^12 docs
dedup must happen at build time and must include *near*-duplicates;
these are the standard ladder:

- exact_dedup        sha256(text) groupBy — one shuffle, keep min doc_id
- ngram_jaccard      shingle inverted join → pair Jaccard (exact; the
                     verification step of every candidate generator)
- minhash_lsh        shingle → 64 minhash perms → band buckets →
                     candidate pairs → exact-Jaccard verify.  Banded
                     candidate generation is the 100 TB path: cost is
                     O(near-dup pairs), not O(n²).
- simhash            64-bit sign-of-weighted-sum fingerprint + banded
                     Hamming candidate join
- embedding_neardup  cosine ≥ τ pairs via exact pair join (small) —
                     the LSH-bucketed scale path lives in similarity.py

All candidate generation is pure DataFrame (explode / groupBy / join);
hashes are Spark's xxhash64 (JVM).  minhash/simhash have no DuckDB
oracle (platform hash) → property-tested in pytest with planted
near-duplicates instead; the exact ops are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bids_spark.functions.text import tokenize_text

# Universal-hash universe for minhash: the 31-bit Mersenne prime.
# With h, a < 2^31-1 the product h*a is < 2^62 — safely inside int64
# even under spark.sql.ansi.enabled (a 61-bit universe overflows:
# h*a can reach 2^122).  64 perms over a 2^31 universe keep the
# min-collision bias < 1e-6 per perm — far below the LSH band noise.
MERSENNE31 = (1 << 31) - 1


def exact_dedup(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """(keep_id, n_copies) — survivor per identical text (min doc_id)."""
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def _shingles(text_col: str, n: int):
    """Distinct token n-grams as array<string> (set semantics).
    Docs with fewer than n tokens yield an empty array (guard:
    sequence(0, -1) would otherwise produce a DESCENDING sequence)."""
    toks = tokenize_text(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def shingle_sets(docs: DataFrame, n=3, id_col="doc_id", text_col="text") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), _shingles(text_col, n).alias("shingles")
    ).filter(F.size("shingles") > 0)


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int = 1000,
    id_col="doc_id",
    text_col="text",
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle.

    Scale levers: ultra-common shingles are dropped before the pair
    join (max_shingle_df — boilerplate n-grams otherwise create
    quadratic pair blowup); the join is shingle-partitioned so only
    co-bucketed docs ever meet.
    """
    ss = shingle_sets(docs, n, id_col, text_col)
    sizes = ss.select("doc_id", F.size("shingles").alias("sz"))
    inv = ss.select("doc_id", F.explode("shingles").alias("sh"))
    rare = (
        inv.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_shingle_df))
    )
    # The df-cap semi-join MUST sit below the self-join: a boilerplate
    # shingle with df=10^6 would otherwise materialize 10^12 join rows
    # before the filter could drop it.  Filtering inv first bounds the
    # per-shingle pair fan-out to max_shingle_df^2.
    inv_rare = inv.join(rare.select("sh"), "sh", "left_semi")
    pairs = (
        inv_rare.alias("a")
        .join(inv_rare.alias("b"), "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("sz", "sz_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("sz", "sz_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) for h_i(x) = (a·x + b) mod 2^31-1."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    docs: DataFrame, n=3, num_perm=64, seed=42, id_col="doc_id", text_col="text"
) -> DataFrame:
    """(doc_id, sig array<long>) — min over shingle hashes per perm.

    One explode + one groupBy with num_perm min() aggregates — all
    JVM-side; the shingle universe never materializes per-perm.
    """
    inv = shingle_sets(docs, n, id_col, text_col).select(
        "doc_id", F.explode("shingles").alias("sh")
    )
    # non-negative 31-bit base hash (see MERSENNE31 note: keeps h*a
    # inside int64 under ANSI mode)
    h = F.pmod(F.xxhash64("sh"), F.lit(MERSENNE31))
    aggs = [
        F.min(F.pmod(h * F.lit(a) + F.lit(b), F.lit(MERSENNE31))).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_params(num_perm, seed))
    ]
    sig = inv.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    id_col="doc_id",
    text_col="text",
) -> DataFrame:
    """Candidate pairs from banded minhash, verified with exact Jaccard.

    rows/band = num_perm/bands; a pair collides in ≥1 band with
    probability 1-(1-j^r)^b — the (b, r) S-curve.  Verification reuses
    ngram_jaccard semantics on just the candidates.
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    sig = minhash_signatures(docs, n, num_perm, seed, id_col, text_col)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[
                                F.element_at("sig", i * r + j + 1).cast("string")
                                for j in range(r)
                            ])
                        ).alias("bh"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bh")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact-Jaccard verify of candidates only
    ss = shingle_sets(docs, n, id_col, text_col)
    a = ss.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = ss.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """(doc_id, simhash bigint) — 64-bit sign-of-sum over token hashes
    weighted by tf.  Pure DataFrame: explode → per-bit ±tf sums via
    bit arithmetic → sign bits reassembled."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokenize_text(text_col)).alias("t")
    )
    tf = toks.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    h = F.xxhash64("t")
    # for each bit: +tf if bit set else -tf (getbit avoids the 1<<63
    # int64-literal overflow)
    bit_cols = [
        F.sum(
            F.when(F.getbit(h, F.lit(i)) == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_cols)
    fp = F.lit(0).cast("long")
    for i in range(63):
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    # top bit kept clear to stay in positive int64 (63-bit simhash)
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col="doc_id", text_col="text"
) -> DataFrame:
    """Banded Hamming join: split 64 bits into (max_hamming+1) bands —
    any pair within max_hamming must agree exactly on ≥1 band
    (pigeonhole) → equi-join per band, then exact popcount verify."""
    sh = simhash(docs, id_col, text_col)
    nb = max_hamming + 1
    width = 64 // nb
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col("simhash"), i * width
                        ).bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
                    )
                    for i in range(nb)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.key")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
