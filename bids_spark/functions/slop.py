"""Sloppy-phrase position matching (tantivy `"a b"~N` semantics).

Re-expresses the greedy matcher tantivy's PhraseScorer applies to
phrase queries with slop — the engine BIDS hands every query string to
(`index.parse_query` at /root/reference/bids/index.py:147; tantivy's
query grammar accepts `"a b"~N`, and its phrase scorer implements slop
in `intersection_count_with_slop`, src/query/phrase_query/
phrase_scorer.rs — public code, re-expressed here, not copied):

  - the i-th phrase term's positions are relativized by its ordinal
    (`position - i`), so an exact occurrence makes all terms' adjusted
    positions equal;
  - terms are folded left-to-right.  The carried array starts as term
    0's adjusted positions; against each next term's adjusted array it
    is matched by a monotone two-pointer walk: carried value l matches
    right value r iff |l - r| <= slop, each side is consumed at most
    once, and on a match the left pointer FIRST advances to the
    largest left value <= r ("there could be a better match" — this
    makes the count greedy, NOT a maximum matching: left [0,4] vs
    right [4,8] at slop 4 yields ONE match, the 4-4 pair, because 0 is
    skipped in favour of the closer 4).  The matched carried value
    becomes r;
  - phrase tf = carried size after the last term.  Adjacent
    transposed terms differ by 2 after relativization (+1 vs -1), so
    `"a b"~2` matches "b a" but `"a b"~1` does not — tantivy's
    documented transposition cost.

Scoring is unchanged from the exact phrase (pseudo-term: tf = slop
match count, idf = sum of distinct member idfs, same BM25 length
normalization) — tantivy scores sloppy phrases with the same
phrase-frequency scorer as exact ones.

At slop=0 the walk degenerates to sorted-set intersection, identical
to the pure-Catalyst `array_intersect` chain in plans/planner.py
`eval_phrase` — property-tested there.  The walk itself is an
inherently sequential per-doc two-pointer loop over per-doc-sized
position lists, which Catalyst array expressions cannot express, so
the DataFrame path wraps it in an Arrow-batched pandas UDF (positions
decode is already the engine's costliest per-posting path; slop=0 —
the common case — never leaves the JVM).
"""

from __future__ import annotations

from collections.abc import Sequence


def match_with_slop(
    left: Sequence[int], right: Sequence[int], slop: int
) -> list[int]:
    """One fold step: monotone greedy match of two sorted int arrays.

    Returns the matched right-values (the new carried array, sorted).
    Semantics pinned by the golden cases in tests/test_phrase_slop.py.
    """
    out: list[int] = []
    li = ri = 0
    ll, rl = len(left), len(right)
    while li < ll and ri < rl:
        lv, rv = left[li], right[ri]
        if abs(lv - rv) <= slop:
            # a later left value <= rv is a better (closer) match
            while li + 1 < ll and left[li + 1] <= rv:
                li += 1
            out.append(rv)
            li += 1
            ri += 1
        elif lv < rv:
            li += 1
        else:
            ri += 1
    return out


def phrase_tf_slop(position_lists: Sequence[Sequence[int]], slop: int) -> int:
    """tf of a sloppy phrase within one document.

    `position_lists[i]` = sorted positions of the phrase's i-th term in
    the doc (the decoded per-term positions arrays).  Any empty list →
    0 (the phrase is a conjunction of its members).
    """
    # len()-based guards: `position_lists` may arrive as a numpy array
    # of arrays from the Arrow batch, where bare truthiness is ambiguous
    if len(position_lists) == 0 or any(len(p) == 0 for p in position_lists):
        return 0
    left = [int(x) for x in position_lists[0]]
    for i, plist in enumerate(position_lists[1:], start=1):
        right = [int(x) - i for x in plist]
        left = match_with_slop(left, right, slop)
        if not left:
            return 0
    return len(left)
