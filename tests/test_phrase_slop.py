"""Sloppy phrases: `"a b"~N` grammar + tantivy greedy match semantics.

BIDS hands every query string to tantivy's QueryParser (reference
bids/index.py:147), whose grammar accepts a `~N` slop suffix on quoted
phrases; tantivy's PhraseScorer implements slop as a greedy monotone
two-pointer match over ordinal-relativized positions
(src/query/phrase_query/phrase_scorer.rs `intersection_count_with_slop`
— re-expressed, with semantics pinned by the golden cases below, in
bids_spark/functions/slop.py).

Engine-parity coverage (oracle / naive / blocked prune-on+off /
segmented / search_many) lives in tests/test_query_extensions.py, whose
QUERIES matrix includes five sloppy shapes; this module pins the
matcher itself and the parser surface.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bids_spark.functions.slop import match_with_slop, phrase_tf_slop
from bids_spark.plans.parser import Phrase, Term, parse_query

# ---------------------------------------------------------------------------
# matcher golden cases (the semantics contract)
# ---------------------------------------------------------------------------


def test_greedy_is_not_maximum_matching():
    # tantivy's "there could be a better match" advance: left 0 is
    # skipped in favour of the closer 4, losing the 0-4 / 4-8 pairing
    # a maximum matching would take.  This pins GREEDY semantics.
    assert match_with_slop([0, 4], [4, 8], 4) == [4]


def test_match_carries_right_values():
    # the carried array after a step holds the matched RIGHT values
    assert match_with_slop([0, 10], [8, 11], 10) == [8, 11]


def test_exact_adjacency_slop0():
    # doc "a b": a=[0], b=[1] → adjusted b=[0]
    assert phrase_tf_slop([[0], [1]], 0) == 1


def test_gap_needs_slop():
    # doc "a x b": a=[0], b=[2] → adjusted b=[1]
    assert phrase_tf_slop([[0], [2]], 0) == 0
    assert phrase_tf_slop([[0], [2]], 1) == 1


def test_transposition_costs_two():
    # doc "b a": a=[1], b=[0] → adjusted b=[-1]; |1-(-1)| = 2
    assert phrase_tf_slop([[1], [0]], 1) == 0
    assert phrase_tf_slop([[1], [0]], 2) == 1


def test_three_terms_chain():
    # doc "a b x c": a=[0], b=[1], c=[3] → adjusted b=[0], c=[1]
    assert phrase_tf_slop([[0], [1], [3]], 0) == 0
    assert phrase_tf_slop([[0], [1], [3]], 1) == 1


def test_multiplicity_counts():
    # doc "a b a b": two exact occurrences
    assert phrase_tf_slop([[0, 2], [1, 3]], 0) == 2


def test_empty_member_is_zero():
    assert phrase_tf_slop([[0, 2], []], 5) == 0
    assert phrase_tf_slop([], 5) == 0


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 60), min_size=1, max_size=8, unique=True),
        min_size=2,
        max_size=4,
    )
)
def test_slop0_is_set_intersection(lists):
    """At slop=0 the greedy walk degenerates to sorted-set
    intersection of the ordinal-adjusted positions — the same quantity
    the pure-Catalyst array_intersect chain computes."""
    lists = [sorted(xs) for xs in lists]
    adjusted = [set(x - i for x in xs) for i, xs in enumerate(lists)]
    want = len(set.intersection(*adjusted))
    assert phrase_tf_slop(lists, 0) == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 60), min_size=0, max_size=10, unique=True),
    st.lists(st.integers(0, 60), min_size=0, max_size=10, unique=True),
    st.integers(0, 8),
)
def test_match_output_sorted_and_bounded(left, right, slop):
    out = match_with_slop(sorted(left), sorted(right), slop)
    assert out == sorted(out)
    assert len(out) <= min(len(left), len(right))
    assert all(v in right for v in out)  # carried values come from right


# ---------------------------------------------------------------------------
# parser surface
# ---------------------------------------------------------------------------


def test_parse_phrase_slop():
    assert parse_query('"merge join"~2').should == [
        Phrase(("merge", "join"), slop=2)
    ]


def test_parse_slop_zero_is_exact():
    assert parse_query('"merge join"~0').should == [Phrase(("merge", "join"))]


def test_parse_slop_then_boost():
    # Lucene/tantivy order: slop binds before boost
    assert parse_query('"merge join"~2^3').should == [
        Phrase(("merge", "join"), 3.0, 2)
    ]


def test_parse_slop_on_single_token_quoted_dropped():
    # a quoted string that degrades to one term: slop is meaningless
    # and dropped (boost still applies)
    assert parse_query('"data"~3').should == [Term("data")]
    assert parse_query('"data"~3^2').should == [Term("data", 2.0)]


def test_parse_slop_invalid():
    with pytest.raises(ValueError):
        parse_query('"merge join"~x')
    with pytest.raises(ValueError):
        parse_query('"merge join"~')
    with pytest.raises(ValueError):
        parse_query('"merge join"~1.5')


def test_parse_fuzzy_term_served():
    # tantivy fuzzy-term syntax is SERVED since round 5 (FuzzyTermQuery
    # semantics — plans/parser.py Fuzzy); distance >2 still rejects
    # (the Levenshtein-automata ceiling)
    from bids_spark.plans.parser import Fuzzy

    assert parse_query("data~2").should == [Fuzzy("data", 2)]
    assert parse_query("data~1^3").should == [Fuzzy("data", 1, 3.0)]
    with pytest.raises(ValueError, match="exceeds 2"):
        parse_query("data~3")
    # a lone ~N (no term prefix) keeps tokenizing as before
    assert parse_query("~2").should == [Term("2")]


def test_parse_plain_phrase_unchanged():
    assert parse_query('"merge join"').should == [Phrase(("merge", "join"))]


def test_parse_prefix_syntax_served():
    # prefix syntax is SERVED since round 5: data* desugars to the
    # exact term range [data, data+U+10FFFF) and "a b"* parses as a
    # PhrasePrefix (tantivy PhrasePrefixQuery semantics)
    from bids_spark.plans.parser import PREFIX_CEIL, PhrasePrefix, TermRange

    assert parse_query('"merge join"*').should == [
        PhrasePrefix(("merge", "join"))
    ]
    assert parse_query("data*").should == [
        TermRange("data", "data" + PREFIX_CEIL, hi_incl=False)
    ]
    # a single-token quoted prefix degrades to a plain prefix range
    assert parse_query('"data"*').should == [
        TermRange("data", "data" + PREFIX_CEIL, hi_incl=False)
    ]
    # bare * (match-all) and boosted *^2 are unchanged
    assert parse_query("*").should
    assert parse_query("*^2").should[0].boost == 2.0
    # a SPACED '"a b" *' is two atoms: phrase OR match-all (unchanged)
    b = parse_query('"merge join" *')
    assert len(b.should) == 2
