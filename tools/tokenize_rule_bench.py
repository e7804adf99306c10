"""Measure InferFiltersFromGenerate's cost on the postings stage.

Catalyst's InferFiltersFromGenerate infers `size(e) > 0 AND
isnotnull(e)` below the posexplode Generate, where e is the whole
tokenizer expression (split+lower+filter over the text column) — so
the most expensive scalar expression in the build runs THREE times
per row (once in the filter twice, once in the project feeding the
Generate).  posexplode with outer=false already emits nothing for
empty/null arrays, so the inferred filter changes no results — it is
a pure pessimization when the generator input is expensive (the same
hazard class as SPARK-36715, where the rule was stopped from firing
on UDFs; plain expensive expressions still get it).

A/B: identical postings_with_positions(with_dl=True) count() with the
rule active vs excluded via spark.sql.optimizer.excludedRules
(runtime-settable SQL conf), alternating arms, same session.

Usage: python tools/tokenize_rule_bench.py [reps=3] [replicate=20]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bids_spark.operators.index_build import postings_with_positions  # noqa: E402
from bids_spark.session import get_spark  # noqa: E402
from bids_spark.sources.replicate import replicated_corpus  # noqa: E402

RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="tok-rule-ab", cores=32, shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="bids_tokab_")
    try:
        big = replicated_corpus(
            spark, "/root/testdata/sf0.1", replicate, work, files=128
        )
        walls: dict[str, list[float]] = {"rule_on": [], "rule_off": []}
        counts = set()
        order = []
        for r in range(reps):
            order += (
                ["rule_on", "rule_off"] if r % 2 == 0
                else ["rule_off", "rule_on"]
            )
        # write parquet, not count(): count() lets Catalyst PRUNE the
        # positions/dl aggregates and with them most of the work — the
        # write is what the build actually executes
        for i, arm in enumerate(order):
            spark.conf.set(
                "spark.sql.optimizer.excludedRules",
                RULE if arm == "rule_off" else "",
            )
            out = os.path.join(work, f"postings-{i}")
            t0 = time.time()
            postings_with_positions(big, with_dl=True).write.parquet(out)
            walls[arm].append(round(time.time() - t0, 2))
            n = spark.read.parquet(out).count()
            counts.add(n)
            shutil.rmtree(out, ignore_errors=True)
        assert len(counts) == 1, f"row counts diverged: {counts}"
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        print(json.dumps({
            "postings_rows": counts.pop(),
            "rule_on": walls["rule_on"],
            "rule_off": walls["rule_off"],
            "med_on": med(walls["rule_on"]),
            "med_off": med(walls["rule_off"]),
            "speedup_med": round(med(walls["rule_on"]) / med(walls["rule_off"]), 3),
        }), flush=True)
    finally:
        spark.conf.set("spark.sql.optimizer.excludedRules", "")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
