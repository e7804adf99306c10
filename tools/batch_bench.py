"""Batched-serving evidence at corpus scale (wand.py search_many):
sequential per-query search vs one batched action over a large index
(default: the 3M-doc drifted positions-ON index the pruning-evidence
tool builds — reused if present, built if not).

The sf0.1 bench shows 1.75× at 100k docs where scheduling dominates;
this measures the same comparison where decode work is real, so the
amortization claim isn't extrapolated from toy scale.  Rank identity
between the two paths is asserted on every run (the evidence tools
never report a number a correctness check didn't ride along with).

Usage: python tools/batch_bench.py [sf_dir] [replicate] [workdir] [iters]
Writes one JSON line; BENCH/BASELINE.md records the results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bids_spark.operators.blocked_index import BlockedIndex  # noqa: E402
from bids_spark.operators.wand import BlockedSearchEngine  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402
from bids_spark.sources.replicate import drifted_corpus  # noqa: E402

# the bench.py query-set shapes plus drift-aware multi-term ORs —
# OR-heavy (the shared-decode class) with AND/NOT/phrase riders
BATCH_QUERIES = {
    "q_single": "data",
    "q_or2": "merge join",
    "q_and": "merge AND join",
    "q_not": "merge -join",
    "q_head": "the",
    "q_or5": "data merge join sort window",
    "q_topic": "data t3x",
    "q_topic2": "t1x t9y",
    "q_phrase": '"merge join"',
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    workdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/pruning_evidence"
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = get_spark(app_name="batch-bench")

    idx_dir = os.path.join(workdir, f"idx_drift_pos_x{replicate}")
    bi = BlockedIndex(idx_dir)
    if not os.path.exists(os.path.join(idx_dir, "manifest.json")):
        big = drifted_corpus(spark, sf_dir, replicate, workdir, files=64)
        bi.build(
            big,
            fingerprint=f"prune-evidence-drift_pos-{sf_dir}-x{replicate}",
            with_positions=True,
        )
    eng = BlockedSearchEngine(spark, bi, cache=True)
    eng.search("data", 10).collect()  # warm: listing + footers + plans
    eng.search_many(BATCH_QUERIES, 10).collect()

    # rank identity first — a speedup number without it is worthless
    got: dict[str, list] = {}
    for r in eng.search_many(BATCH_QUERIES, 10).collect():
        got.setdefault(r["qid"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9))
        )
    for qid, q in BATCH_QUERIES.items():
        seq = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in eng.search(q, 10).collect()
        ]
        assert sorted(got.get(qid, [])) == seq, f"parity broke: {qid}"

    def median(fn) -> float:
        xs = []
        for _ in range(iters):
            t0 = time.time()
            fn()
            xs.append(time.time() - t0)
        return sorted(xs)[len(xs) // 2]

    per_q = {
        qid: round(median(lambda q=q: eng.search(q, 10).collect()), 3)
        for qid, q in BATCH_QUERIES.items()
    }
    seq_sum = round(sum(per_q.values()), 3)
    batch = round(
        median(lambda: eng.search_many(BATCH_QUERIES, 10).collect()), 3
    )
    n_docs = 5000 * replicate if sf_dir.endswith("0.1") else None
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_queries": len(BATCH_QUERIES),
                "iters": iters,
                "sequential": per_q,
                "sequential_sum": seq_sum,
                "batch_wall": batch,
                "speedup": round(seq_sum / batch, 2),
                "batch_queries_per_sec": round(
                    len(BATCH_QUERIES) / batch, 2
                ),
                "parity": "rank+score identical per qid (asserted)",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
