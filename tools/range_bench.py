"""Must-range block-skipping evidence at corpus scale (BENCH/PLANS.md).

A `doc_id:[lo TO hi]` must clause (tantivy RangeQuery on the indexed
i64 fast field, reference bids/index.py:53-55) lets the blocked engine
skip every block whose [first_doc, max_doc] interval can't overlap the
range BEFORE decode — doc_id is the block sort key, so a narrow range
over a 3M-doc corpus should decode a tiny fraction of the candidate
blocks.  This records the deterministic counters (candidate vs
overlap-surviving blocks/postings per query term) plus indicative wall
latencies with the restriction ON vs OFF (RANGE_RESTRICT), asserting
rank+score identity between the two before timing.

Reuses the cached drifted positions-ON index from
tools/pruning_evidence.py (same workdir layout).

Usage:
    python tools/range_bench.py [sf_dir] [replicate] [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bids_spark.operators.blocked_index import BlockedIndex  # noqa: E402
from bids_spark.operators.wand import BlockedSearchEngine  # noqa: E402
from bids_spark.plans.parser import parse_query  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402
from bids_spark.sources.replicate import drifted_corpus  # noqa: E402

# one replica band = doc_ids [rep·10M, rep·10M + base_n) — a narrow
# range over the 600-replica domain; plus a 10-band window and a
# phrase under a range (positions decode is the costliest path)
QUERIES = [
    "data AND doc_id:[3000000000 TO 3000005000]",      # head ∧ 1 band
    "the AND doc_id:[3000000000 TO 3000005000]",       # worst head term
    "data AND doc_id:[3000000000 TO 3090005000]",      # 10-band window
    '"merge join" AND doc_id:[3000000000 TO 3000005000]',  # phrase ∧ band
    "doc_id:[3000000000 TO 3000005000]",               # pure range
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    workdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/pruning_evidence"
    spark = get_spark(app_name="range-bench")
    big = drifted_corpus(spark, sf_dir, replicate, workdir, files=64)
    n_docs = big.count()
    idx_dir = os.path.join(workdir, f"idx_drift_pos_x{replicate}")
    bi = BlockedIndex(idx_dir)
    bi.build(
        big,
        fingerprint=f"prune-evidence-drift_pos-{sf_dir}-x{replicate}",
        with_positions=True,
    )
    on = BlockedSearchEngine(spark, bi)
    off = BlockedSearchEngine(spark, bi)
    off.RANGE_RESTRICT = False
    on.search("data", 10).collect()  # warm plans/footers

    def lat(fn, n=3):
        xs = []
        for _ in range(n):
            t = time.time()
            fn()
            xs.append(time.time() - t)
        return round(sorted(xs)[n // 2], 3)

    print(json.dumps({"n_docs": n_docs, "replicate": replicate}))
    for q in QUERIES:
        got_on = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in on.search(q, 10).collect()
        ]
        got_off = [
            (r["rank"], r["doc_id"], round(r["score"], 9))
            for r in off.search(q, 10).collect()
        ]
        assert got_on == got_off, f"rank identity violated: {q}"
        # deterministic counters: candidate blocks/postings of the
        # query's terms vs what overlaps the must-range
        ast = parse_query(q)
        from bids_spark.plans.parser import Range, Term

        inner = ast
        if not ast.must and len(ast.should) == 1:
            inner = ast.should[0]
        if isinstance(inner, Range):  # pure-range query
            musts, rngs = [], [inner]
        else:
            musts, rngs = inner.must, [
                m for m in inner.must if isinstance(m, Range)
            ]
        terms = sorted(
            {m.term for m in musts if isinstance(m, Term)}
            | {t for m in musts if hasattr(m, "terms") for t in m.terms}
        )
        lo = max(r.lo for r in rngs)
        hi = min(r.hi for r in rngs)
        row = {"query": q, "lo": lo, "hi": hi, "hits": len(got_on)}
        if terms:
            from pyspark.sql import functions as F

            tb = on._term_blocks(terms)
            tot = tb.agg(
                F.count("*").alias("b"), F.sum("n").alias("p")
            ).first()
            sur = on._range_restricted_blocks(tb, (lo, hi)).agg(
                F.count("*").alias("b"), F.sum("n").alias("p")
            ).first()
            row.update(
                blocks_total=int(tot["b"] or 0),
                postings_total=int(tot["p"] or 0),
                blocks_survive=int(sur["b"] or 0),
                postings_survive=int(sur["p"] or 0),
            )
        row["wall_on"] = lat(lambda: on.search(q, 10).collect())
        row["wall_off"] = lat(lambda: off.search(q, 10).collect())
        print(json.dumps(row))


if __name__ == "__main__":
    main()
