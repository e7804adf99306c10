"""Hardware scaling ceiling calibration for the sandbox.

The north-rule criterion — throughput scaling efficiency ≥0.8 from N to
4N — is defined for CLUSTER sizes: 4N executors bring 4N memory buses,
caches, and disks.  This sandbox has ONE node, so "4N" only multiplies
CPU threads while every other resource stays fixed.  This script
measures what the box itself can do: P INDEPENDENT processes (zero
coordination, zero shuffle — an upper bound on any engine) each run an
identical fixed CPU+memory workload shaped like the index build
(string tokenize + hashing + numpy sort/aggregate).  On perfectly
scalable hardware the per-process wall time would be flat in P; the
measured ratio wall(N)/wall(4N) is the hardware ceiling H ≤ 1 for the
N→4N pairing.

Engine-relative scaling efficiency = absolute efficiency / H.
BENCH/BASELINE.md records both.

Usage: python tools/hw_ceiling.py [N]   (default 4 → measures 4 vs 16)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def work(_):
    rng = np.random.default_rng(0)
    text = "merge join data sort window shuffle spark index " * 2000
    total = 0
    for _i in range(60):
        toks = text.lower().split()
        total += len({hash(t) for t in toks})
        a = rng.random(2_000_000)
        total += int(np.sort(a)[::128].sum())
    return total


def run(p: int) -> float:
    t0 = time.time()
    with mp.Pool(p) as pool:
        pool.map(work, range(p))
    return time.time() - t0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    # interleave and keep best-of-2 per level (same noise discipline as
    # tools/scaling_bench.py)
    lo = min(run(n) for _ in range(2))
    hi = min(run(4 * n) for _ in range(2))
    print(
        json.dumps(
            {
                "N": n,
                "4N": 4 * n,
                "wall_N": round(lo, 2),
                "wall_4N": round(hi, 2),
                "hardware_ceiling": round(lo / hi, 3),
                "note": "per-process wall of independent identical work; "
                "ceiling = wall_N / wall_4N (1.0 = perfectly scalable box)",
            }
        )
    )


if __name__ == "__main__":
    main()
