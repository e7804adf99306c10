"""Interleaved A/B of the build's dl-carry path vs the doclens-join twin.

Round-4 change under test: postings carry dl per row (+pf2 format, free
at tokenize time), so the blocks stage scores without joining the
doclens table — removing a full shuffle of the postings relation on
doc_id — and build metrics come from the terms-dictionary scan instead
of a second full read of the just-written payload bytes.

Both arms run the SAME code with only SPARK_GRAFT_BUILD_DL_CARRY
flipped (blocks-stage join vs carried column; postings table identical),
alternating A/B/B/A to cancel machine drift, fresh corpus + index dir
per run.  Reports per-arm build wall, per-stage seconds, and scheduled
job counts, plus a rank-identity assertion between indexes built by the
two arms.

Usage: python tools/build_bench.py [reps=2] [replicate=20]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bids_spark.operators.blocked_index import BlockedIndex  # noqa: E402
from bids_spark.operators.wand import BlockedSearchEngine  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402
from bids_spark.sources.replicate import replicated_corpus  # noqa: E402

QUERIES = ["data", "merge join", "merge AND join", '"merge join"']


def run_arm(spark, big, work, arm: str, rep: int) -> dict:
    os.environ["SPARK_GRAFT_BUILD_DL_CARRY"] = "1" if arm == "carry" else "0"
    sc = spark.sparkContext
    jobs_before = len(sc.statusTracker().getJobIdsForGroup(None))
    idx = os.path.join(work, f"idx-{arm}-{rep}")
    t0 = time.time()
    bi = BlockedIndex(idx)
    man = bi.build(
        big, fingerprint=f"ab-{arm}-{rep}", n_partitions=32,
        with_positions=True,
    )
    wall = time.time() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(None)) - jobs_before
    return {
        "arm": arm,
        "wall": round(wall, 2),
        "jobs": jobs,
        "stages": {
            s: round(e.get("seconds", 0.0), 2) for s, e in man["stages"].items()
        },
        "bytes_per_posting": round(
            man["stages"]["blocks"]["bytes_per_posting"], 3
        ),
        "idx": idx,
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="build-ab", cores=32, shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="bids_buildab_")
    runs = []
    try:
        big = replicated_corpus(
            spark, "/root/testdata/sf0.1", replicate, work, files=128
        )
        # alternate A/B/B/A per rep pair to cancel monotone drift
        # one discarded warmup build: the freshly-written replicated
        # corpus is cold on first read (measured ~50 s extra at 300k
        # docs on this box) — without this the first timed arm eats the
        # page-cache fill and the A/B/B/A alternation can't cancel it
        warm = run_arm(spark, big, work, "carry", 99)
        shutil.rmtree(warm["idx"], ignore_errors=True)
        print(json.dumps({"warmup_wall": warm["wall"]}), flush=True)
        order = []
        for r in range(reps):
            order += (
                [("carry", r), ("join", r)] if r % 2 == 0
                else [("join", r), ("carry", r)]
            )
        for arm, r in order:
            res = run_arm(spark, big, work, arm, r)
            print(json.dumps({k: v for k, v in res.items() if k != "idx"}),
                  flush=True)
            runs.append(res)

        # rank identity between the two arms' indexes (first rep)
        a = next(r for r in runs if r["arm"] == "carry")
        b = next(r for r in runs if r["arm"] == "join")
        ea = BlockedSearchEngine(spark, BlockedIndex(a["idx"]), cache=False)
        eb = BlockedSearchEngine(spark, BlockedIndex(b["idx"]), cache=False)
        for q in QUERIES:
            ra = [(x["doc_id"], round(x["score"], 9))
                  for x in ea.search(q, 10).collect()]
            rb = [(x["doc_id"], round(x["score"], 9))
                  for x in eb.search(q, 10).collect()]
            assert ra == rb, f"rank mismatch on {q!r}: {ra} vs {rb}"
        print("rank identity: OK on", len(QUERIES), "queries", flush=True)

        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        summary = {
            arm: {
                "wall_med": med([r["wall"] for r in runs if r["arm"] == arm]),
                "jobs": [r["jobs"] for r in runs if r["arm"] == arm],
            }
            for arm in ("carry", "join")
        }
        summary["speedup_med"] = round(
            summary["join"]["wall_med"] / summary["carry"]["wall_med"], 3
        )
        print(json.dumps(summary), flush=True)
    finally:
        os.environ.pop("SPARK_GRAFT_BUILD_DL_CARRY", None)
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
