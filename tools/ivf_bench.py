"""IVF build/query bench across cell counts (BENCH/BASELINE.md).

Times IvfAnnIndex build + probe at n_cells=16 (column-math CASE-chain
assignment) and n_cells=256 (Arrow-batched matmul assignment — the
path that survives the thousands of cells a 10^12-vector corpus
needs), on the sf0.1 embeddings replicated to ~128k vectors.

Usage: python tools/ivf_bench.py [sf_dir] [replicate] [workdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bids_spark.operators.similarity import IvfAnnIndex  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    workdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ivf_bench"
    spark = get_spark(app_name="ivf-bench")
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .crossJoin(
            F.broadcast(spark.range(replicate).select(F.col("id").alias("rep")))
        )
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias("vec_id"),
            "embedding",
        )
        .repartition(32)
        .cache()
    )
    n = emb.count()
    qv = [float(x) for x in emb.first()["embedding"]]
    rows = []
    for n_cells, nprobe in [(16, 4), (256, 16)]:
        path = os.path.join(workdir, f"ivf_{n_cells}")
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.time()
        idx = IvfAnnIndex(path, n_cells=n_cells, nprobe=nprobe).build(emb)
        build_s = time.time() - t0
        idx.topk(spark, qv, 10).collect()  # warm
        xs = []
        for _ in range(3):
            t0 = time.time()
            idx.topk(spark, qv, 10).collect()
            xs.append(time.time() - t0)
        rows.append({
            "n_cells": n_cells,
            "nprobe": nprobe,
            "assignment_path": (
                "matmul-udf"
                if n_cells > IvfAnnIndex.VECTORIZE_CELLS_ABOVE
                else "case-chain"
            ),
            "build_sec": round(build_s, 1),
            "vectors_per_sec": round(n / build_s, 1),
            "query_median_sec": round(sorted(xs)[1], 3),
        })
        print("ROW " + json.dumps(rows[-1]), flush=True)
    print("RESULT " + json.dumps({
        "n_vectors": n, "dim": len(qv), "rows": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
