"""Driver-side xxHash64 identical to Spark's `xxhash64()` expression.

The blocked index is laid out `partitionBy(bucket)` with
`bucket = pmod(xxhash64(term), n_buckets)` (operators/blocked_index.py).
At query time we need the bucket ids of a handful of query terms; a
Spark job for that (createDataFrame → collect) costs a full local-mode
scheduling round-trip per query.  XXH64 is a public, stable algorithm
(Spark's `XXH64.hashUnsafeBytes` implements the reference spec with
seed 42 over the UTF-8 bytes), so we compute it on the driver in plain
Python and keep write-side (JVM) and read-side (driver) bucketing
provably in sync via tests/test_hashing.py (cross-checked against the
Spark expression on ASCII, Unicode, empty, and long strings).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42  # Spark's default seed for xxhash64() (Catalyst XxHash64)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Reference XXH64 over bytes → unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (
            _rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23)
            * _P2
            + _P3
        ) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def spark_xxhash64(s: str, seed: int = SPARK_SEED) -> int:
    """Signed-64 result identical to `F.xxhash64(lit(s))`."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket(term: str, n_buckets: int) -> int:
    """Identical to `F.pmod(F.xxhash64(term), lit(n_buckets))`."""
    return spark_xxhash64(term) % n_buckets
