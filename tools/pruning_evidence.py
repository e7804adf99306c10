"""Block-max pruning evidence at corpus scale (BENCH/PLANS.md).

Small-corpus bench latencies are Spark-job-scheduling-bound, so they
never demonstrate the BMW design actually pruning.  This script builds
a large corpus (default sf0.1 × 600 = 3M docs), then for each bench
query records the DETERMINISTIC counters from
`BlockedSearchEngine.pruning_stats`: candidate blocks/postings of the
query's terms vs the blocks/postings that survive the θ filter (what
actually gets decoded), for θ from the term dictionary ("dict") and
from the probe ("probe"), each with the range-aligned other-term
bound ON and OFF (wand.py Phase 3).  Counts are noise-free — the
right evidence on a machine whose wall-clock swings 3×
(BENCH/BASELINE.md).

Two corpus shapes:
  uniform — disjoint-range replication (round-1 fixture).  Score
            distributions are identical across ranges BY CONSTRUCTION,
            so no sound multi-term bound can prune there (round-3
            analysis) — kept as the worst-case control.
  drift   — sources.replicate.drifted_corpus: head terms global, an
            injected topic vocabulary per contiguous doc-range band —
            the structure real crawls have, where the aligned bound
            can bite.

Wall latencies (median of 3) for pruned/unpruned are reported too, but
read them as indicative only.

Usage:
    python tools/pruning_evidence.py [sf_dir] [replicate] [workdir] \
        [uniform|drift] [and_only]

The index build is resumable (staged manifest): re-runs reuse it.
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
from bids_spark.session import get_spark  # noqa: E402
from bids_spark.sources.replicate import (  # noqa: E402
    drifted_corpus,
    replicated_corpus,
)

QUERIES = [
    "data",
    "merge join",
    "the",
    "the data",
    "data merge join sort window",
]

# drift-only additions: head+topic and topic+topic shapes (topic bands
# exist only on the drifted corpus; band ids assume n_topics=16)
DRIFT_QUERIES = [
    "data t3x",
    "the t3x",
    "t1x t9y",
    "data t2x t2y",
]

# AND-path restriction evidence (wand._bool_restriction: intersection
# bitmap + rarest-term interval join).  Uniform control: head AND head
# — every chunk holds both terms, the bitmap honestly prunes nothing.
AND_QUERIES = [
    "merge AND join",
]
# drift: rare-band AND head is the shape the bitmap exists for; two
# disjoint bands must be PROVED empty from metadata (zero decode).
DRIFT_AND_QUERIES = [
    "the AND t3x",
    "data AND t2x AND t2y",
    "t1x AND t9y",
    "+t3x the data",
]

# Phrase-path restriction evidence (wand._eval_phrase applies the same
# _bool_restriction before the POSITIONS decode — the costliest
# per-posting path).  Needs a positions-ON index (mode "phrase_only").
# Topic tokens are adjacent at each drifted doc's tail
# ("t3x t3x t3x t3y t3y t3z"), so same-band phrases really match.
PHRASE_QUERIES = [
    '"merge join"',   # all-head control: bitmap honestly prunes ~nothing
    '"t3x t3y"',      # topic-topic, matches exist: decode confined to band 3
    '"data t3x"',     # head+topic: data's positions blocks pruned to band 3
    '"t1x t9y"',      # disjoint bands: proved empty, ZERO positions decode
    # sloppy variants ("a b"~N, functions/slop.py): the restriction is
    # member-based so it prunes identically; what these rows add is the
    # slop UDF's cost on the restricted decode at 3M docs, and that a
    # disjoint-band phrase is STILL proved empty regardless of slop
    '"merge join"~2',
    '"data t3x"~2',
    '"t1x t9y"~4',
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    workdir = (
        sys.argv[3] if len(sys.argv) > 3 else "/tmp/pruning_evidence"
    )
    shape = sys.argv[4] if len(sys.argv) > 4 else "uniform"
    mode = sys.argv[5] if len(sys.argv) > 5 else ""
    phrase_only = mode == "phrase_only"
    spark = get_spark(app_name="pruning-evidence")
    if shape == "drift":
        big = drifted_corpus(spark, sf_dir, replicate, workdir, files=64)
        queries = QUERIES + DRIFT_QUERIES
        pos_tag = "_pos" if phrase_only else ""
        idx_dir = os.path.join(workdir, f"idx_drift{pos_tag}_x{replicate}")
        fp = f"prune-evidence-drift{pos_tag}-{sf_dir}-x{replicate}"
    else:
        assert not phrase_only, "phrase evidence needs the drift corpus"
        big = replicated_corpus(spark, sf_dir, replicate, workdir, files=64)
        queries = QUERIES
        idx_dir = os.path.join(workdir, f"idx_x{replicate}")
        fp = f"prune-evidence-{sf_dir}-x{replicate}"
    n_docs = big.count()
    bi = BlockedIndex(idx_dir)
    t0 = time.time()
    bi.build(big, fingerprint=fp, with_positions=phrase_only)
    build_s = time.time() - t0
    eng = BlockedSearchEngine(spark, bi)
    eng.search("data", 10).collect()  # warm plans

    def lat(fn, n=3):
        xs = []
        for _ in range(n):
            t = time.time()
            fn()
            xs.append(time.time() - t)
        return round(sorted(xs)[n // 2], 3)

    def counters(q, mode, aligned):
        s = eng.pruning_stats(q, 10, mode, aligned=aligned)
        return {
            "theta": round(s["theta"], 4),
            "blocks_survive": s["blocks_survive"],
            "postings_survive": s["postings_survive"],
        }, s

    and_only = mode == "and_only"
    rows = []
    for q in queries if not (and_only or phrase_only) else []:
        d_on, d_full = counters(q, "dict", True)
        d_off, _ = counters(q, "dict", False)
        p_on, _ = counters(q, "probe", True)
        p_off, _ = counters(q, "probe", False)
        # exactness at corpus scale: the θ+aligned-pruned top-k must be
        # rank- AND score-identical to the unpruned evaluation
        key = lambda rs: [(r["doc_id"], round(r["score"], 9)) for r in rs]  # noqa: E731
        assert key(eng.search(q, 10, theta_mode="dict").collect()) == key(
            eng.search(q, 10, prune=False).collect()
        ), f"pruned/unpruned rank divergence on {q!r}"
        rows.append(
            {
                "query": q,
                "rank_identical": True,
                "blocks_total": d_full["blocks_total"],
                "postings_total": d_full["postings_total"],
                "dict": d_on,
                "dict_loose": d_off,
                "probe": p_on,
                "probe_loose": p_off,
                "latency_sec": {
                    "pruned_dict": lat(
                        lambda: eng.search(q, 10, theta_mode="dict").collect()
                    ),
                    "pruned_probe": lat(
                        lambda: eng.search(q, 10, theta_mode="probe").collect()
                    ),
                    "unpruned": lat(
                        lambda: eng.search(q, 10, prune=False).collect()
                    ),
                },
            }
        )
        print("ROW " + json.dumps(rows[-1]), flush=True)
    # AND-path restriction counters: forced engine (bitmap always on)
    # vs a bitmap-off engine — results must agree; counters show what
    # the restriction removes before decode
    and_rows = []
    forced = BlockedSearchEngine(spark, bi)
    forced.OM_MIN_BLOCKS = 0
    off = BlockedSearchEngine(spark, bi)
    off.OM_MIN_BLOCKS = 0
    off.AND_BITMAP = False
    if phrase_only:
        and_qs = PHRASE_QUERIES
    else:
        and_qs = AND_QUERIES + (
            DRIFT_AND_QUERIES if shape == "drift" else []
        )
    for q in and_qs:
        s = forced.and_pruning_stats(q, 10)
        key = lambda rs: [(r["doc_id"], round(r["score"], 9)) for r in rs]  # noqa: E731
        assert key(forced.search(q, 10).collect()) == key(
            off.search(q, 10).collect()
        ), f"bitmap on/off rank divergence on {q!r}"
        s["rank_identical"] = True
        s["latency_sec"] = {
            "restricted": lat(lambda: forced.search(q, 10).collect()),
            "bitmap_off": lat(lambda: off.search(q, 10).collect()),
        }
        and_rows.append(s)
        print("ANDROW " + json.dumps(s), flush=True)
    print(
        "RESULT "
        + json.dumps(
            {
                "sf_dir": sf_dir,
                "replicate": replicate,
                "shape": shape,
                "mode": mode or "full",
                "with_positions": phrase_only,
                "n_docs": n_docs,
                "build_sec": round(build_s, 1),
                "k": 10,
                "rows": rows,
                "and_rows": and_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
