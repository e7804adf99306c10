"""Scaling-efficiency evidence (BASELINE.json north rule):
run the SAME build+query job at two parallelism levels (local[N] and
local[4N]) on the SAME input; report throughput at both and
efficiency = (T_N / T_4N) / 4 on build wall time.

Each level runs in a fresh subprocess (a JVM's local[] core count is
fixed at context creation).  Usage:

    python tools/scaling_bench.py [N] [sf_dir] [replicate]

Writes JSON to stdout; BENCH/BASELINE.md records the results.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, %(repo)r)
from bids_spark.session import get_spark
from bids_spark.operators.blocked_index import BlockedIndex
from bids_spark.operators.wand import BlockedSearchEngine
from pyspark.sql import functions as F

from bids_spark.sources.replicate import replicated_corpus
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; replicate = int(sys.argv[3]); corpus_dir = sys.argv[4]
with_pos = os.environ.get("SCALING_WITH_POSITIONS", "0") == "1"
spark = get_spark(app_name=f"scaling-{cpus}", cores=cpus, shuffle_partitions=cpus)
base_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
big = replicated_corpus(spark, sf_dir, replicate, corpus_dir, files=64)
big.count()  # warm page cache / file listing identically at both levels
work = tempfile.mkdtemp(prefix=f"scale{cpus}_")
t0 = time.time()
bi = BlockedIndex(os.path.join(work, "idx"))
man = bi.build(big, fingerprint=f"scale-{cpus}", n_partitions=cpus,
               with_positions=with_pos)
build_s = time.time() - t0
eng = BlockedSearchEngine(spark, bi, cache=True)
eng.search("data", 10).collect()  # warm
qs = {}
for name, q in [("q_single","data"),("q_or2","merge join"),("q_and","merge AND join"),
                ("q_head","the"),("q_or5","data merge join sort window")]:
    lat = []
    for _ in range(3):
        t0 = time.time(); eng.search(q, 10).collect(); lat.append(time.time()-t0)
    qs[name] = sorted(lat)[1]  # median of 3
shutil.rmtree(work, ignore_errors=True)
n_docs = base_n * replicate
print("RESULT " + json.dumps({
    "cpus": cpus, "build_sec": round(build_s, 3), "with_positions": with_pos,
    "docs_per_sec": round(n_docs / build_s, 1),
    "postings_per_sec": round(man["stages"]["blocks"]["postings_per_sec"], 1),
    "query_median_sec": qs, "n_docs": n_docs}))
spark.stop()
"""


def run_level(cpus: int, sf_dir: str, replicate: int, corpus_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _WORKER % {"repo": REPO},
         str(cpus), sf_dir, str(replicate), corpus_dir],
        capture_output=True, text=True, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    # surface the worker's own traceback (CalledProcessError hides it)
    raise RuntimeError(
        f"worker cpus={cpus} exit={out.returncode}, no RESULT line:\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    import tempfile

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    corpus_dir = tempfile.mkdtemp(prefix="scaling_corpus_")
    # this box shows large transient noise (same build: 41 s vs 118 s
    # minutes apart) — run each level `repeats`× INTERLEAVED and take
    # the best per level, so drift hits both levels symmetrically
    lows, highs = [], []
    for _ in range(repeats):
        lows.append(run_level(n, sf_dir, replicate, corpus_dir))
        highs.append(run_level(4 * n, sf_dir, replicate, corpus_dir))
    lo = min(lows, key=lambda r: r["build_sec"])
    hi = min(highs, key=lambda r: r["build_sec"])
    import shutil

    shutil.rmtree(corpus_dir, ignore_errors=True)
    eff = (lo["build_sec"] / hi["build_sec"]) / 4.0
    print(json.dumps({
        "N": n, "4N": 4 * n, "sf_dir": sf_dir, "repeats": repeats,
        "low": lo, "high": hi,
        "build_sec_all": {"low": [r["build_sec"] for r in lows],
                          "high": [r["build_sec"] for r in highs]},
        "scaling_efficiency_build": round(eff, 3),
        "target": 0.8,
    }, indent=2))


if __name__ == "__main__":
    main()
