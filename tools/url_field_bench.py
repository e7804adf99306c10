"""url-field evidence at 3M docs: build-cost delta, pruning counters,
and latency for field-scoped queries — with in-tool rank identity.

Corpus: the drifted 3M corpus (sf0.1 × 600) with a DERIVED url column
``https://host{rep%64}.example.com/doc/{doc_id}`` — host tokens are
replica-banded (each host's ns postings live in ONE doc-id range),
the structure real crawls have (a host's pages cluster in crawl
order).  A query anchoring on a host term should therefore restrict
every other term's decode to that band via the existing rarest-term
span machinery — url terms bought the same pruning the drifted topic
tokens did, for free, because namespaced terms ARE terms.

Usage: python tools/url_field_bench.py [sf_dir] [replicate] [out]
Writes one JSON line per measurement to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bids_spark.operators.blocked_index import BlockedIndex  # noqa: E402
from bids_spark.operators.wand import BlockedSearchEngine  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402
from bids_spark.sources.replicate import drifted_corpus  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    out_root = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bids_bench_corpus"
    spark = get_spark(app_name="url-field-bench", cores=32,
                      shuffle_partitions=32)
    docs = drifted_corpus(spark, sf_dir, replicate, out_root)
    # deterministic banded url: host index = doc-id range / 10M (the
    # replica stride), 64 hosts cycling
    host = F.pmod(F.floor(F.col("doc_id") / F.lit(10_000_000)), F.lit(64))
    docs = docs.select(
        "doc_id", "text",
        F.concat(
            F.lit("https://host"), host.cast("string"),
            F.lit(".example.com/doc/"), F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    n_docs = docs.count()

    results: dict = {"n_docs": n_docs, "replicate": replicate}

    for tag, uf in (("url_off", False), ("url_on", True)):
        d = os.path.join(out_root, f"urlbench_{tag}_{replicate}")
        bi = BlockedIndex(d)
        t0 = time.time()
        man = bi.build(
            docs, fingerprint=f"urlbench-{tag}-{replicate}",
            n_buckets=8, with_positions=True, score_mode="dl",
            url_field=uf,
        )
        wall = time.time() - t0
        st = man["stages"]["blocks"]
        rec = {
            "build": tag, "wall_s": round(wall, 2),
            "postings": st.get("postings"),
            "bytes_per_posting": round(st.get("bytes_per_posting", 0), 3),
        }
        print(json.dumps(rec), flush=True)
        results[tag] = rec

    eng = BlockedSearchEngine(
        spark, BlockedIndex(os.path.join(out_root, f"urlbench_url_on_{replicate}")),
        cache=False,
    )
    eng.OM_MIN_BLOCKS = 0

    queries = [
        ("mixed_or", "data url:host7"),
        ("host_and", "data AND url:host7"),
        ("url_phrase", 'url:"host7 example"'),
        ("url_range", "url:[host10 TO host19] AND data"),
    ]
    for name, q in queries:
        # rank identity: pruned/restricted vs prune-off, asserted here
        a = [(r["rank"], r["doc_id"], round(r["score"], 9))
             for r in eng.search(q, 10).collect()]
        b = [(r["rank"], r["doc_id"], round(r["score"], 9))
             for r in eng.search(q, 10, prune=False).collect()]
        assert a == b, (name, a[:3], b[:3])
        walls = []
        for _ in range(3):
            t0 = time.time()
            eng.search(q, 10).collect()
            walls.append(time.time() - t0)
        walls.sort()
        rec = {"query": name, "q": q, "p50_s": round(walls[1], 3)}
        if name == "host_and":
            rec["counters"] = eng.and_pruning_stats(q)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"done": results}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
