"""Driver-side xxHash64 must agree bit-for-bit with Spark's
`xxhash64()` expression — that equality is what keeps query-time
bucket pruning (functions/hashing.py) in sync with the write-side
layout (operators/blocked_index.py partitionBy(bucket))."""

from __future__ import annotations

from pyspark.sql import functions as F

from bids_spark.functions.hashing import spark_xxhash64, term_bucket

CASES = [
    "",
    "a",
    "abc",
    "merge",
    "join",
    "the",
    "0123456",          # 7 B  (byte tail)
    "01234567",         # 8 B  (exact word)
    "012345678901",     # 12 B (word + int tail)
    "0123456789012345678901234567890",   # 31 B
    "01234567890123456789012345678901",  # 32 B (stripe boundary)
    "x" * 100,
    "naïve café — цена 価格 😀",
    "\x00weird\x01bytes",
]


def test_matches_spark_expression(spark):
    df = spark.createDataFrame([(s,) for s in CASES], ["s"])
    got = {
        r["s"]: (r["h"], r["b"])
        for r in df.select(
            "s",
            F.xxhash64("s").alias("h"),
            F.pmod(F.xxhash64("s"), F.lit(8)).cast("int").alias("b"),
        ).collect()
    }
    for s in CASES:
        assert spark_xxhash64(s) == got[s][0], repr(s)
        assert term_bucket(s, 8) == got[s][1], repr(s)
