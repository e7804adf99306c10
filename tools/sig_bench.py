"""LSH signature bench: column-math vs Arrow matmul across dims.

The column path builds bits*dim literal nodes per plan — fine at the
fixture's dim 64 (2,048 nodes at 32 bits), a Catalyst plan-size hazard
at transformer dims (24,576 nodes at dim 768).  The dispatch in
lsh_signatures routes above VECTORIZE_SIG_NODES_ABOVE to an
Arrow-batched (batch x dim) @ (dim x bits) matmul.  This bench times
BOTH paths at dim 64 and dim 768 on the same synthetic vectors so the
BENCH/BASELINE.md row shows the crossover, not just the parity test.

Usage: python tools/sig_bench.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bids_spark.operators import similarity as S  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402


def _synth(spark, n: int, dim: int):
    """Deterministic (vec_id, embedding array<float>) — no external data."""
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.sin(F.col("id") * F.lit(0.7) + i * F.lit(1.3))
            ).cast("float"),
        ).alias("embedding"),
    )
    return df.repartition(32).cache()


def _time_path(emb, dim: int, bits: int, force: str) -> float:
    """Wall for one full signature pass (plan + execute, agg to 1 row)."""
    old = S.VECTORIZE_SIG_NODES_ABOVE
    S.VECTORIZE_SIG_NODES_ABOVE = 0 if force == "matmul" else 1 << 30
    try:
        t0 = time.time()
        S.lsh_signatures(emb, dim, bits).agg(
            F.sum(F.col("sig")).alias("s")
        ).collect()
        return round(time.time() - t0, 3)
    finally:
        S.VECTORIZE_SIG_NODES_ABOVE = old


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    bits = 32
    spark = get_spark(app_name="sig-bench")
    rows = []
    for dim in (64, 768):
        emb = _synth(spark, n, dim)
        emb.count()  # materialize cache
        cold = {}
        for force in ("column", "matmul"):
            _time_path(emb, dim, bits, force)  # warm JVM/Arrow once
            cold[force] = min(
                _time_path(emb, dim, bits, force) for _ in range(3)
            )
        rows.append(
            {
                "dim": dim,
                "bits": bits,
                "n": n,
                "literal_nodes_column_path": bits * dim,
                "column_sec": cold["column"],
                "matmul_sec": cold["matmul"],
                "default_path": (
                    "matmul"
                    if bits * dim > S.VECTORIZE_SIG_NODES_ABOVE
                    else "column"
                ),
            }
        )
        emb.unpersist()
        print("ROW " + json.dumps(rows[-1]), flush=True)
    print("RESULT " + json.dumps({"rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
