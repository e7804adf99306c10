"""Real BPE token counting against a merges table.

`n_bpe_ish` (textstats.token_count) is a cheap column-expression
ESTIMATE — it counts pre-split classes, not merged tokens.  This
module is the real thing: load a GPT-2-style merges.txt (public
format: '#version' header, one space-separated symbol pair per line,
rank = line order), apply the merge loop per word, count resulting
tokens.  An LLM data pipeline budgets corpus size against a real
tokenizer; this gives that number for any merges file (drop in a
published one, or the committed deterministic fixture
``bpe_merges.txt`` trained by tools/train_bpe.py on the seeded
synthetic corpus).

Execution shape: the merges table is driver-loaded into a rank dict
(a few KB) captured by an Arrow-batched pandas UDF closure — no
per-row Python round-trips, one Python call per Arrow batch, with a
per-word memo (web text repeats words heavily: the memo turns the
merge loop into a dict hit for all but the first occurrence).
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

EOW = "</w>"
DEFAULT_MERGES = os.path.join(os.path.dirname(__file__), "bpe_merges.txt")
# pre-split identical to textstats.BPE_ISH_RE (and tools/train_bpe.py)
_PRESPLIT = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")


@lru_cache(maxsize=8)
def load_merges(path: str = DEFAULT_MERGES) -> dict[tuple[str, str], int]:
    """merges.txt → {(a, b): rank} (lower rank = earlier merge)."""
    if path == DEFAULT_MERGES and not os.path.exists(path):
        # package loaded from the --py-files zip: __file__ points inside
        # the archive, so read the committed fixture through the import
        # system (zipimport-backed) instead of the filesystem
        from importlib.resources import files

        text = files("bids_spark.functions").joinpath(
            "bpe_merges.txt"
        ).read_text()
    else:
        with open(path) as f:
            text = f.read()
    ranks: dict[tuple[str, str], int] = {}
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        a, _, b = line.partition(" ")
        ranks[(a, b)] = len(ranks)
    return ranks


def bpe_word_tokens(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Apply the merge loop to one pre-split word (chars + EOW)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        merged = best_pair[0] + best_pair[1]
        i, out = 0, []
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == best_pair[0]
                and syms[i + 1] == best_pair[1]
            ):
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def count_tokens_str(
    text: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, int] | None = None,
) -> int:
    """BPE token count of one document (lowercased, pre-split, merged)."""
    if cache is None:
        cache = {}
    n = 0
    for w in _PRESPLIT.findall(text.lower()):
        c = cache.get(w)
        if c is None:
            c = len(bpe_word_tokens(w, ranks))
            cache[w] = c
        n += c
    return n
