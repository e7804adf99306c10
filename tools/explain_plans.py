"""Dump formatted physical plans of the engine's key dataflows to
BENCH/PLANS.md — evidence that the plans are the ones we want:

  * term lookup: bucket PartitionFilters + term PushedFilters at the
    parquet scan (D2) — no full-index pass;
  * naive scoring: whole-stage codegen spans around the BM25 column
    math — no Python in the hot path;
  * postings build: map-side partial aggregation (partial_count) before
    the shuffle;
  * top-k: TakeOrderedAndProject, not a global sort.

Usage: python tools/explain_plans.py  (writes BENCH/PLANS.md)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bids_spark.operators.blocked_index import BlockedIndex  # noqa: E402
from bids_spark.operators.index_build import postings, scored_postings  # noqa: E402
from bids_spark.operators.index_build import corpus_stats, doclens  # noqa: E402
from bids_spark.operators.wand import BlockedSearchEngine  # noqa: E402
from bids_spark.plans.planner import SearchEngine  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK = "<!-- hand-recorded evidence below: preserved by explain_plans.py -->"


def fmt(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    spark = get_spark(app_name="plans", cores=8, shuffle_partitions=8)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    work = tempfile.mkdtemp(prefix="plans_")
    bi = BlockedIndex(os.path.join(work, "idx"))
    bi.build(docs, fingerprint="plans")
    eng = BlockedSearchEngine(spark, bi)

    sections = [
        (
            "Term lookup (D2): blocks scan for one term",
            "Expect: PartitionFilters on `bucket`, PushedFilters In(term…).",
            eng._term_blocks(["data"]),
        ),
        (
            "Pruned OR top-k (D3/D8): survivors plan",
            "Expect: pruned scan → mapInPandas decode → HashAggregate "
            "(partial + final) → TakeOrderedAndProject.",
            eng._topk_or_pruned(["merge", "join"], 10),
        ),
        (
            "Range-ALIGNED pruned OR (round 4): survivors plan",
            "Expect: identical scan shape (PartitionFilters + "
            "In(term…)), ONE broadcast gmax join, the aligned filter "
            "as constant-folded array literals — no extra scan, no "
            "join of the cm arrays onto block rows, no payload "
            "shuffle.",
            eng._topk_or_pruned(["merge", "join"], 10, aligned=True),
        ),
        (
            "Flat AND top-k: matched-count plan",
            "Expect: pruned scan → decode → HashAggregate with "
            "count(DISTINCT term-if-must) + sum(score), Filter on the "
            "matched count, TakeOrderedAndProject.  When the "
            "intersection bitmap engages (≥ OM_MIN_BLOCKS candidate "
            "blocks, or forced), it folds into the scan's codegen "
            "Filter as one constant-folded array literal — see the "
            "hand-recorded 3M-doc audit below (\"AND-restriction plan "
            "audit\").",
            eng._topk_bool(["merge", "join"], [], [], 10),
        ),
        (
            "Batched serving (search_many): one action, three shapes",
            "Expect: ONE blocks scan for the union of the OR-class "
            "queries' terms (PartitionFilters on bucket + "
            "In(term…)), the per-term threshold dim and the "
            "(qid, term) fan-out as BroadcastHashJoins (never "
            "shuffles of the decoded postings), one HashAggregate "
            "pair (partial+final) on (qid, doc_id), the per-qid θ "
            "filter BEFORE the rank window, and qid-tagged subplans "
            "for the non-OR shapes unioned under the same window — "
            "a single collect schedules everything.  Bonus Spark "
            "gives for free: WindowGroupLimit BELOW the qid exchange "
            "— per-partition partial top-k, so the rank window never "
            "fully sorts a qid's matches even before the θ filter.",
            eng.search_many(
                {"a": "merge join", "b": "data", "c": "merge AND join"},
                10,
            ),
        ),
        (
            "Naive postings build (C2): tokenize → explode → groupBy",
            "Expect: WholeStageCodegen around generate/aggregate, "
            "partial_count before the exchange (map-side combine).",
            postings(docs),
        ),
        (
            "Naive scored postings (D7): BM25 column math",
            "Expect: broadcast joins for stats, WholeStageCodegen around "
            "the score projection — no Python UDF anywhere.",
            scored_postings(postings(docs), doclens(docs), corpus_stats(docs)),
        ),
        (
            "Naive top-k (D8)",
            "Expect: TakeOrderedAndProject (per-partition heaps), "
            "not a global Sort.",
            SearchEngine.from_documents(docs, cache=False)
            .plan("merge join")
            .orderBy("score", ascending=False)
            .limit(10),
        ),
    ]

    # round-4 result shaping (operators/fetch.py)
    from bids_spark.operators.fetch import dedup_paged, fetch_docs

    sections += [
        (
            "Result fetch (D10/C7): top-k joined back to documents",
            "Expect: BroadcastHashJoin with the TOP-K side broadcast — "
            "the documents scan column-pruned to (doc_id, source, "
            "text-prefix), never shuffled.",
            fetch_docs(eng.search("merge join", 10), docs),
        ),
        (
            "Over-fetch dedup pagination (D9)",
            "Expect: the same broadcast probe of documents, then the "
            "dedup/re-rank windows — both operate on ≤ over-fetch-"
            "window rows (tens), so the single-partition window is "
            "O(page), not O(corpus).",
            dedup_paged(eng.search("merge join", 17), docs, limit=5, offset=2),
        ),
    ]

    # round-2 operators
    from bids_spark.operators.events import sessionize, windowed_counts
    from bids_spark.operators.webtext import remove_boilerplate, repetition_stats

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sections += [
        (
            "Webtext repetition stats (Gopher filters)",
            "Expect: two explode→HashAggregate(partial before exchange) "
            "passes, zero Python, dup_line_frac computed row-local "
            "(no extra shuffle).",
            repetition_stats(docs),
        ),
        (
            "Boilerplate removal (C4 line dedup)",
            "Expect: the ≥min_docs HAVING filter applied BELOW the "
            "anti-join (boilerplate dictionary built first, then "
            "left_anti on line) — the df-cap-before-join property.",
            remove_boilerplate(docs),
        ),
        (
            "Windowed event counts",
            "Expect: single HashAggregate pair (partial+final) on "
            "(window, event_type) — map-side combine, no Python.",
            windowed_counts(events),
        ),
        (
            "Sessionization (gap windows)",
            "Expect: ONE Exchange hashpartitioning(user_id) feeding "
            "both window functions and the final aggregate — the "
            "per-user sort is reused, not re-shuffled.",
            sessionize(events),
        ),
    ]

    out = [
        "# Physical plans of the key dataflows",
        "",
        "Generated by `tools/explain_plans.py` (sf0.001, local[8]).",
        "Each section states what the plan MUST show and then shows it.",
        "",
    ]
    for title, expect, df in sections:
        out += [f"## {title}", "", expect, "", "```", fmt(df).rstrip(), "```", ""]
    path = os.path.join(REPO, "BENCH", "PLANS.md")
    # everything below the marker is HAND-RECORDED evidence (pruning
    # tables, scale measurements) — regeneration must never wipe it
    preserved = MARK + "\n"
    if os.path.exists(path):
        cur = open(path).read()
        if MARK in cur:
            preserved = cur[cur.index(MARK):]
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n" + preserved)
    print(path)
    spark.stop()


if __name__ == "__main__":
    main()
