"""Interleaved A/B/C of the build's join-elimination ladder.

Arms (same code, two env switches):

- defer   (default path): postings carry dl (+pf2) AND idf comes from
          the sorted termidf sidecar read inside the encoder — the
          postings relation joins with NOTHING and shuffles exactly
          once (the mandatory range partition), 16 B/posting narrower.
- idfjoin (SPARK_GRAFT_BUILD_IDF_JOIN=1): dl carried, idf via the
          postings ⋈ term_df join (JVM-side scoring, enriched persist).
- join    (SPARK_GRAFT_BUILD_DL_CARRY=0): both joins — the round-3
          shape (postings ⋈ doclens ⋈ term_df).

Locally AQE broadcasts both small sides, so arm gaps here bound the
*overhead* of each mechanism, not the cluster-scale win (a vocabulary
or doclens table too large to broadcast turns each join into a full
shuffle of the postings relation — the thing the defer path removes by
construction).  Arms alternate in a drift-cancelling order with a
discarded warmup build (cold corpus read measured ~50 s at 300k docs);
rank identity + bytes/posting equality asserted across all arms.

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

ARM_ENV = {
    "defer": {"SPARK_GRAFT_BUILD_DL_CARRY": "1", "SPARK_GRAFT_BUILD_IDF_JOIN": "0"},
    "idfjoin": {"SPARK_GRAFT_BUILD_DL_CARRY": "1", "SPARK_GRAFT_BUILD_IDF_JOIN": "1"},
    # idfjoin with broadcast joins disabled: what the join path DOES at
    # the target scale, where a 10^8-term × ~20 B vocabulary (and the
    # doclens relation) exceed any broadcast threshold and Catalyst
    # must sort-merge — i.e. fully shuffle the postings relation a
    # second time.  The defer arm's lead over THIS arm is the
    # designed-for win; its lead over plain idfjoin is only overhead.
    "idfjoin_smj": {"SPARK_GRAFT_BUILD_DL_CARRY": "1", "SPARK_GRAFT_BUILD_IDF_JOIN": "1"},
    "join": {"SPARK_GRAFT_BUILD_DL_CARRY": "0", "SPARK_GRAFT_BUILD_IDF_JOIN": "1"},
}

_BCAST_CONFS = (
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
)


def run_arm(spark, big, work, arm: str, rep: int) -> dict:
    os.environ.update(ARM_ENV[arm])
    for c in _BCAST_CONFS:
        spark.conf.set(c, "-1" if arm == "idfjoin_smj" else "10485760")
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
        warm = run_arm(spark, big, work, "defer", 99)
        shutil.rmtree(warm["idx"], ignore_errors=True)
        print(json.dumps({"warmup_wall": warm["wall"]}), flush=True)
        arms = list(ARM_ENV)
        order = []
        for r in range(reps):
            seq = arms if r % 2 == 0 else arms[::-1]
            order += [(a, r) for a in seq]
        for arm, r in order:
            res = run_arm(spark, big, work, arm, r)
            print(json.dumps({k: v for k, v in res.items() if k != "idx"}),
                  flush=True)
            runs.append(res)

        # rank identity + bytes/posting across all arms (first rep each)
        firsts = {a: next(r for r in runs if r["arm"] == a) for a in arms}
        assert len({r["bytes_per_posting"] for r in firsts.values()}) == 1
        engines = {
            a: BlockedSearchEngine(spark, BlockedIndex(r["idx"]), cache=False)
            for a, r in firsts.items()
        }
        for q in QUERIES:
            res_by_arm = {
                a: [(x["doc_id"], round(x["score"], 9))
                    for x in e.search(q, 10).collect()]
                for a, e in engines.items()
            }
            vals = list(res_by_arm.values())
            assert all(v == vals[0] for v in vals), (
                f"rank mismatch on {q!r}: {res_by_arm}"
            )
        print("rank identity: OK on", len(QUERIES), "queries ×",
              len(arms), "arms", flush=True)

        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        summary = {
            arm: {
                "wall_med": med([r["wall"] for r in runs if r["arm"] == arm]),
                "jobs": [r["jobs"] for r in runs if r["arm"] == arm],
            }
            for arm in arms
        }
        summary["defer_vs_idfjoin"] = round(
            summary["idfjoin"]["wall_med"] / summary["defer"]["wall_med"], 3
        )
        summary["defer_vs_join"] = round(
            summary["join"]["wall_med"] / summary["defer"]["wall_med"], 3
        )
        summary["defer_vs_smj"] = round(
            summary["idfjoin_smj"]["wall_med"] / summary["defer"]["wall_med"], 3
        )
        print(json.dumps(summary), flush=True)
    finally:
        os.environ.pop("SPARK_GRAFT_BUILD_DL_CARRY", None)
        os.environ.pop("SPARK_GRAFT_BUILD_IDF_JOIN", None)
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
