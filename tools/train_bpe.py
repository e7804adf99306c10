"""Train the committed BPE merges fixture (deterministic).

Classic BPE (the public GPT-2-style merges.txt format: one
space-separated symbol pair per line, rank = line order, '#version'
header) trained on the seeded synthetic web corpus — no external data.
Ties break lexicographically so the fixture is bit-reproducible.

Regenerate with:  python tools/train_bpe.py > bids_spark/functions/bpe_merges.txt
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_MERGES = 200
EOW = "</w>"
# same pre-split the column-expr estimate uses (textstats.BPE_ISH_RE)
PRESPLIT = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")


def corpus_words() -> Counter:
    """Training corpus: the seeded synthetic webpages PLUS the sf0.001
    test documents, so the merges cover both vocabularies (a merges
    table trained off-domain degenerates to near-char-level counts)."""
    from bids_spark.session import get_spark
    from bids_spark.sources.corpus import synth_webpages

    spark = get_spark(app_name="train-bpe", cores=8, shuffle_partitions=8)
    rows = synth_webpages(spark, n_rows=500, seed=42).select("text").collect()
    tdir = "/root/testdata/sf0.001/documents.parquet"
    if os.path.exists(tdir):
        rows += spark.read.parquet(tdir).select("text").collect()
    words: Counter = Counter()
    for r in rows:
        words.update(PRESPLIT.findall(r["text"].lower()))
    return words


def train(words: Counter, n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    seqs: dict[str, list[str]] = {
        w: list(w) + [EOW] for w in words
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, f in words.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        # deterministic: highest count, then lexicographically smallest
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for w, s in seqs.items():
            i, out = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == best[0] and s[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def main() -> None:
    merges = train(corpus_words())
    print("#version: 0.2 (bids_spark deterministic fixture)")
    for a, b in merges:
        print(f"{a} {b}")


if __name__ == "__main__":
    main()
