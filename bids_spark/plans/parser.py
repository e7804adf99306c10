"""Query-string → AST parser.

Re-implements the subset of tantivy's QueryParser grammar that BIDS
exposes (`index.parse_query(q, ["content"])` at
/root/reference/bids/index.py:147; boolean usage documented at
/root/reference/README.md:284 "libc AND libpng"):

    - bare terms                → should clauses (default OR)
    - `a AND b` / `a OR b`      → boolean operators (AND binds tighter)
    - `+term` / `-term`         → must / must-not
    - `"a b c"`                 → phrase (positions)
    - `"a b"~2`                 → phrase with slop (tantivy sloppy
      phrase; matching semantics in functions/slop.py — greedy
      monotone matching on ordinal-relativized positions, transposed
      adjacent terms cost 2).  Slop must be a non-negative integer;
      `~N` composes with boost as `"a b"~2^3` (slop first, like
      Lucene/tantivy).  On a quoted string that degrades to a single
      term (or nothing) the slop is accepted and dropped — slop is
      meaningless without at least two positions to relate.
    - `term~N` (bare word)      → fuzzy term (tantivy FuzzyTermQuery):
      Levenshtein-≤N dictionary expansion, constant scorer, N ≤ 2
      (the Levenshtein-automata ceiling).  Field-scoped `url:tok~1`
      expands within the url namespace.  See the Fuzzy dataclass.
    - `( ... )`                 → grouping
    - `atom^2.5`                → boost: the wrapped query's score is
      multiplied (tantivy BoostQuery; works on terms, phrases, groups,
      ranges, `*`).  Boosts compose: `(a^2)^3` ≡ `a^6`.  Non-numeric
      or non-positive boosts are parse errors.
    - `doc_id:[5 TO 10]`        → range query on the indexed i64
      doc_id fast field (declared at reference bids/index.py:53-55).
      `{`/`}` are exclusive bounds (normalized to inclusive ±1 — exact
      for an integer field), `*` an open end.  Constant scorer: every
      matching doc scores 1.0 × boost (Lucene/tantivy ConstScorer).
    - `content:[a TO b]`        → term-dictionary range on the text
      field (tantivy RangeQuery over a str field): constant scorer,
      1.0 × boost per live doc containing ANY term lexicographically
      within the bounds.  `{`/`}` exclusive bounds stay exclusive
      (no ±1 normalization — strings have no successor), `*` an open
      end.  Bounds run through the same query tokenizer as terms
      (pinned decision: the reference stack isn't runnable here to
      observe whether tantivy analyzes range bounds; tokenizing keeps
      `content:[B TO D]` from silently matching nothing against the
      all-lowercase dictionary).  A bound that tokenizes to zero or
      multiple tokens is a loud parse error.  Comparison order is
      UTF-8 byte order — what both Spark's UTF8String and DuckDB use.
    - `*`                       → match-all (tantivy AllQuery), 1.0 ×
      boost per doc.
    - `content: IN [a b c]` / bare `IN [a b c]` → set query (tantivy's
      IN grammar → TermSetQuery): constant scorer, 1.0 × boost per
      live doc containing ANY of the single-token values (multi-token
      values are parse errors; empty set matches nothing).
      `doc_id: IN [1 2 3]` is the fast-field variant, like Range.
      The spaced form is required (`field: IN [...]` — tantivy's own
      spelling); glued `field:IN [...]` is a loud parse error.
    - `term*` / `url:tok*`      → prefix query: constant scorer over
      docs holding ANY term starting with the prefix, desugared to the
      term-range machinery ([tok, tok+U+10FFFF) — exact, see
      prefix_term_range).  `"a b c"*` → phrase-prefix (tantivy
      PhrasePrefixQuery): the fixed terms adjacent, then ANY term with
      the last prefix; constant scorer, exact expansion (no
      max_expansions cap — documented divergence, superset only where
      tantivy truncates).  A single-token `"a"*` degrades to `a*`.
    - `content:term` / `content:"a b"` → field-scoped query.  The
      schema declares TWO indexed text fields (`file_path` — our
      `url` — and `content`, bids/index.py:49-52; both confirmed
      indexed with positions on disk at playground/bids_index/
      meta.json:25-44).  `parse_query(q, ["content"])` at
      bids/index.py:147 only sets the DEFAULT field for unqualified
      atoms; explicit `file_path:foo` still resolves against the
      schema, so this parser accepts `url:term`, `url:"a b"` (phrase
      over the url token stream), `url:[a TO b]` and `url: IN [...]`
      alongside the content forms.  url atoms map to namespaced terms
      (functions/fields.py URL_NS) so every engine stays field-
      agnostic downstream.  Any OTHER field name raises ValueError —
      tantivy's QueryParser errors on undeclared fields, and silently
      treating `title:x` as a phrase (the pre-round-3 behaviour) was
      wrong semantics.

Terms are run through the same tokenizer as documents
(functions.text.tokenize_query); a quoted string whose tokenization
yields one token degrades to a plain term, zero tokens → dropped.

~150 LoC of plain Python on the driver — query parsing is not data-
plane work (SURVEY.md §2D D1).
"""

from __future__ import annotations

import dataclasses
import math
import re
from dataclasses import dataclass, field

from bids_spark.functions.fields import (
    CONTENT_RANGE_FLOOR,
    URL_NS,
    URL_RANGE_CEIL,
    url_term,
)
from bids_spark.functions.text import tokenize_query

# Declared text fields (the reference schema's two indexed text
# fields, bids/index.py:49-52: file_path → url, content); scoping to
# `content` is the identity, `url` namespaces tokens (URL_NS), any
# other field is a parse error.  `file_path` is accepted as an alias
# of `url` — the reference spelling, so a query a BIDS user runs
# today (`file_path:indexer`) parses here unchanged.
URL_FIELDS = frozenset({"url", "file_path"})
FIELDS = frozenset({"content"}) | URL_FIELDS


@dataclass(frozen=True)
class Term:
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase:
    terms: tuple[str, ...]
    boost: float = 1.0
    # `"a b"~N` slop (tantivy sloppy phrase; 0 = exact adjacency).
    # Matching semantics: functions/slop.py.
    slop: int = 0


@dataclass(frozen=True)
class Range:
    """doc_id range, inclusive bounds after normalization; None = open.
    Constant scorer (1.0 × boost) like Lucene's RangeQuery."""

    lo: int | None
    hi: int | None
    boost: float = 1.0


@dataclass(frozen=True)
class TermRange:
    """`content:[a TO b]` — term-dictionary range on the text field
    (tantivy RangeQuery over a str field).  Constant scorer: 1.0 ×
    boost per live doc containing ANY term within the bounds.  None =
    open end; exclusivity kept as flags (strings have no ±1)."""

    lo: str | None
    hi: str | None
    lo_incl: bool = True
    hi_incl: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class All:
    """Match-all (tantivy AllQuery) — 1.0 × boost per doc."""

    boost: float = 1.0


@dataclass(frozen=True)
class TermSet:
    """`content: IN [a b c]` / bare `IN [a b c]` (tantivy's set-query
    grammar → TermSetQuery).  Constant scorer: 1.0 × boost per live
    doc containing ANY of the terms.  Empty set matches nothing."""

    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy:
    """`term~N` (tantivy fuzzy-term syntax → FuzzyTermQuery):
    Levenshtein-distance-≤N term expansion over the dictionary,
    constant scorer (1.0 × boost) per live doc containing ANY expanded
    term — tantivy's automaton queries score through a ConstScorer.
    N ≤ 2 (the Levenshtein-automata ceiling tantivy inherits from the
    levenshtein_automata crate); plain edit distance (no transposition
    discount), matching both Spark's and DuckDB's levenshtein() so the
    expansion sits under the oracle.  `term` may be URL_NS-namespaced
    (`url:tok~1`); expansion stays within the term's field namespace."""

    term: str
    dist: int
    boost: float = 1.0


@dataclass(frozen=True)
class PhrasePrefix:
    """`"a b c"*` (tantivy PhrasePrefixQuery): terms[:-1] occur
    consecutively, immediately followed by ANY dictionary term
    starting with terms[-1].  Constant scorer (1.0 × boost).
    Divergence, documented: tantivy caps the expansion at
    max_expansions=50 dictionary-order terms; this engine expands
    exactly (the prefix is a pushed-down term-range predicate, no term
    list materializes), so the match set is a superset only where
    tantivy's cap truncates — and exactness keeps the op under the
    DuckDB oracle.  Terms are namespaced for url-field phrases."""

    terms: tuple[str, ...]
    boost: float = 1.0


#: Exclusive upper bound for a prefix expansion: tokens are
#: [\p{L}\p{N}]+ so none contains U+10FFFF, making
#: [tok, tok+U+10FFFF) exactly the set of tokens with prefix `tok`
#: in UTF-8 byte order (= codepoint order).
PREFIX_CEIL = "\U0010ffff"


def prefix_term_range(tok: str, fld: str = "content") -> TermRange:
    """`tok*` desugared to a TermRange — the shipped lexicographic
    block-selection machinery (parquet row-group min/max inside sorted
    bucket partitions) serves prefixes with zero new engine code."""
    if fld in URL_FIELDS:
        return TermRange(
            url_term(tok), url_term(tok) + PREFIX_CEIL, hi_incl=False
        )
    return TermRange(tok, tok + PREFIX_CEIL, hi_incl=False)


@dataclass(frozen=True)
class DocIdSet:
    """`doc_id: IN [1 2 3]` — set query on the indexed i64 doc_id
    fast field.  Constant scorer, like Range."""

    ids: tuple[int, ...]
    boost: float = 1.0


@dataclass
class Bool:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    boost: float = 1.0


_LEXER = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<and>\bAND\b) | (?P<or>\bOR\b) |
    (?P<plus>\+) | (?P<minus>-) |
    (?P<phrase>"[^"]*"\*?) |
    (?P<range>[A-Za-z_][A-Za-z0-9_]*:[\[{][^\]}]*[\]}]) |
    (?P<inset>\bIN\s*\[[^\]]*\]) |
    (?P<word>[^\s()+\-"]+)
    """,
    re.VERBOSE,
)


def _parse_boost(s: str) -> float:
    try:
        b = float(s)
    except ValueError:
        raise ValueError(f"invalid boost {s!r}") from None
    if not (b > 0.0) or math.isinf(b) or math.isnan(b):
        raise ValueError(f"boost must be a positive finite number: {s!r}")
    return b


def _parse_slop(s: str) -> int:
    try:
        n = int(s)
    except ValueError:
        raise ValueError(f"invalid slop {s!r} (expected \"a b\"~N, "
                         "N a non-negative integer)") from None
    if n < 0:
        raise ValueError(f"slop must be non-negative: {s!r}")
    return n


def _boost(node, b: float):
    """Multiply a node's boost (tantivy BoostQuery wraps; we fold)."""
    if node is None or b == 1.0:
        return node
    if isinstance(node, Bool):
        node.boost *= b
        return node
    return dataclasses.replace(node, boost=node.boost * b)


def _lex(q: str) -> list[tuple[str, str]]:
    return [(m.lastgroup, m.group()) for m in _LEXER.finditer(q)]


class _Parser:
    def __init__(
        self,
        toks: list[tuple[str, str]],
        default_fields: tuple[str, ...] = ("content",),
    ):
        self.toks = toks
        self.i = 0
        self.default_fields = default_fields

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # query := sequence of (occur? atom | atom AND atom | atom OR atom)
    def parse(self) -> Bool:
        node = self._or_expr()
        if isinstance(node, Bool):
            return node
        return Bool(should=[node]) if node is not None else Bool()

    def _or_expr(self):
        left = self._and_expr()
        parts = [left] if left is not None else []
        while True:
            kind, _ = self.peek()
            if kind == "or":
                self.next()
                right = self._and_expr()
                if right is not None:
                    parts.append(right)
            elif kind in ("lparen", "phrase", "word", "range", "inset",
                          "plus", "minus"):
                # implicit adjacency → should (tantivy default)
                nxt = self._and_expr()
                if nxt is not None:
                    parts.append(nxt)
            else:
                break
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        out = Bool()
        for p in parts:
            if isinstance(p, tuple):  # (occur, node) from +/- prefixes
                occ, n = p
                (out.must if occ == "+" else out.must_not).append(n)
            else:
                out.should.append(p)
        return out

    def _and_expr(self):
        left = self._clause()
        if left is None:
            return None
        musts = [left]
        while self.peek()[0] == "and":
            self.next()
            right = self._clause()
            if right is not None:
                musts.append(right)
        if len(musts) == 1:
            return left
        out = Bool()
        for m in musts:
            if isinstance(m, tuple):
                occ, n = m
                (out.must if occ == "+" else out.must_not).append(n)
            else:
                out.must.append(m)
        return out

    def _clause(self):
        kind, val = self.peek()
        if kind == "plus":
            self.next()
            atom = self._atom()
            return ("+", atom) if atom is not None else None
        if kind == "minus":
            self.next()
            atom = self._atom()
            return ("-", atom) if atom is not None else None
        return self._atom()

    @staticmethod
    def _tokens_atom(text: str, fld: str = "content"):
        terms = tokenize_query(text)
        if fld in URL_FIELDS:
            # url-field atoms become namespaced terms; a multi-token
            # url atom is a phrase over the url token stream (tantivy
            # tokenizes file_path with the same default analyzer)
            terms = [url_term(t) for t in terms]
        if not terms:
            return None
        if len(terms) == 1:
            return Term(terms[0])
        return Phrase(tuple(terms))

    @staticmethod
    def _split_field(core: str, orig: str) -> tuple[str, str]:
        """`url:da` → ("url", "da"); unqualified → ("content", core).
        Shared by the prefix/fuzzy word-atom forms, which strip their
        suffix before field resolution.  Raises on undeclared fields
        (same policy as _word_atom's plain-term path)."""
        if ":" in core:
            fld, _, rest = core.partition(":")
            if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", fld):
                if fld.lower() not in FIELDS:
                    raise ValueError(
                        f"unknown field '{fld}' in query {orig!r} "
                        f"(declared fields: {', '.join(sorted(FIELDS))})"
                    )
                return fld.lower(), rest
        return "content", core

    @staticmethod
    def _phrase_prefix_atom(raw: str, fld: str = "content"):
        """`"a b c"*` → PhrasePrefix (≥2 tokens), a plain prefix range
        (1 token), or None (0 tokens) — mirroring how a quoted phrase
        degrades to Term/None."""
        toks = tokenize_query(raw.rstrip("*").strip('"'))
        if not toks:
            return None
        if len(toks) == 1:
            return prefix_term_range(toks[0], fld)
        if fld in URL_FIELDS:
            toks = [url_term(t) for t in toks]
        return PhrasePrefix(tuple(toks))

    def _default_atom(self, text: str):
        """Unqualified atom against the DEFAULT field list — tantivy's
        QueryParser semantics for `parse_query(q, fields)`: one
        sub-query per default field, unioned as should clauses (a doc
        matching in several fields sums their scores).  The reference
        CLI passes ["content"] (bids/index.py:147) — the single-field
        case stays a bare Term/Phrase, byte-identical ASTs — while the
        reference repo's own playground drives ["title","content"]
        (playground/junk/find.py:19), the multi-field shape."""
        nodes = [
            a
            for f in self.default_fields
            if (a := self._tokens_atom(text, f)) is not None
        ]
        if not nodes:
            return None
        if len(nodes) == 1:
            return nodes[0]
        return Bool(should=nodes)

    def _maybe_slop(self, node):
        """Attach a trailing `~N` token after a quoted phrase (the
        lexer emits it as a separate word; a fused `~N^B` boost suffix
        is split here — slop binds before boost, Lucene/tantivy
        order).  A multi-default-field expansion (Bool of per-field
        phrases) gets the slop applied to EACH member phrase."""
        if isinstance(node, Bool):
            kind, val = self.peek()
            if kind == "word" and val.startswith("~"):
                self.next()
                suf = val[1:]
                boost = None
                if "^" in suf:
                    suf, _, b = suf.partition("^")
                    boost = _parse_boost(b)
                slop = _parse_slop(suf)
                if slop:
                    node.should = [
                        dataclasses.replace(c, slop=slop)
                        if isinstance(c, Phrase)
                        else c
                        for c in node.should
                    ]
                if boost is not None:
                    node = _boost(node, boost)
            return node
        kind, val = self.peek()
        if kind == "word" and val.startswith("~"):
            self.next()
            suf = val[1:]
            boost = None
            if "^" in suf:
                suf, _, b = suf.partition("^")
                boost = _parse_boost(b)
            slop = _parse_slop(suf)
            if isinstance(node, Phrase) and slop:
                node = dataclasses.replace(node, slop=slop)
            # single-token (or empty) quoted strings degraded to
            # Term/None: slop accepted and dropped
            if boost is not None:
                node = _boost(node, boost)
        return node

    def _maybe_boost(self, node):
        """Attach a trailing `^N` token (boost after a phrase, group,
        or range: the lexer emits it as a separate word)."""
        kind, val = self.peek()
        if kind == "word" and val.startswith("^"):
            self.next()
            return _boost(node, _parse_boost(val[1:]))
        return node

    @staticmethod
    def _parse_inset(fld: str, val: str):
        """`field: IN [v1 v2 ...]` → TermSet (content) or DocIdSet
        (doc_id).  Values are whitespace-separated; content values run
        through the query tokenizer and must stay single tokens
        (multi-token values would silently change the query shape —
        rejected, same policy as the fuzzy mis-parse).  An empty set
        matches nothing (tantivy TermSetQuery with no terms)."""
        body = val.strip()[2:].strip()  # drop leading IN
        assert body.startswith("[") and body.endswith("]"), val
        raw = body[1:-1].split()
        fld = fld.lower()
        if fld == "doc_id":
            try:
                ids = tuple(sorted({int(v) for v in raw}))
            except ValueError:
                raise ValueError(
                    f"doc_id IN values must be integers: {val!r}"
                ) from None
            return DocIdSet(ids)
        if fld not in FIELDS:
            raise ValueError(
                f"unknown field '{fld}' in set query "
                f"(declared fields: {', '.join(sorted(FIELDS))}, doc_id)"
            )
        terms = []
        for v in raw:
            toks = tokenize_query(v)
            if len(toks) > 1:
                raise ValueError(
                    f"set-query value {v!r} tokenizes to multiple terms "
                    f"({toks}) — use single-token values"
                )
            if toks:
                terms.append(
                    url_term(toks[0]) if fld in URL_FIELDS else toks[0]
                )
        return TermSet(tuple(sorted(set(terms))))

    @staticmethod
    def _parse_range(val: str) -> Range:
        m = re.fullmatch(
            r"([A-Za-z_][A-Za-z0-9_]*):([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])",
            val,
        )
        if not m:
            raise ValueError(
                f"malformed range query {val!r} "
                "(expected field:[lo TO hi], * for an open end)"
            )
        fld, lb, lo_s, hi_s, rb = m.groups()
        if fld.lower() == "content" or fld.lower() in URL_FIELDS:
            return _Parser._parse_term_range(lb, lo_s, hi_s, rb, fld.lower())
        if fld.lower() != "doc_id":
            raise ValueError(
                "range queries are supported on the doc_id fast field "
                "and the content/url term dictionaries only (reference "
                f"bids/index.py:49-55), got {fld!r}"
            )

        def bound(s: str, excl_adj: int) -> int | None:
            if s == "*":
                return None
            try:
                return int(s) + excl_adj
            except ValueError:
                raise ValueError(
                    f"range bound must be an integer or *, got {s!r}"
                ) from None

        # exclusive {}/inclusive [] bounds — exact ±1 on an int field
        return Range(
            bound(lo_s, 1 if lb == "{" else 0),
            bound(hi_s, -1 if rb == "}" else 0),
        )

    @staticmethod
    def _parse_term_range(
        lb: str, lo_s: str, hi_s: str, rb: str, fld: str = "content"
    ) -> TermRange:
        def bound(s: str) -> str | None:
            if s == "*":
                return None
            toks = tokenize_query(s)
            if len(toks) != 1:
                raise ValueError(
                    f"term-range bound {s!r} must tokenize to exactly "
                    f"one term (got {toks}) — bounds go through the "
                    "same tokenizer as query terms"
                )
            return toks[0]

        lo, hi = bound(lo_s), bound(hi_s)
        lo_incl, hi_incl = (lb == "["), (rb == "]")
        if fld in URL_FIELDS:
            # map into the URL_NS slice of term space: open ends become
            # the namespace's own floor/ceiling so the range can never
            # leak into content terms (engines stay field-agnostic)
            lo = url_term(lo) if lo is not None else URL_NS
            if hi is not None:
                hi = url_term(hi)
            else:
                hi, hi_incl = URL_RANGE_CEIL, False
        elif lo is None:
            # content range with an open start: floor it ABOVE the url
            # namespace (all ns terms < "\x02" < every content token) —
            # a no-op on single-field indexes
            lo = CONTENT_RANGE_FLOOR
        return TermRange(lo, hi, lo_incl=lo_incl, hi_incl=hi_incl)

    def _atom(self):
        kind, val = self.next()
        if kind == "lparen":
            inner = self._or_expr()
            if self.peek()[0] == "rparen":
                self.next()
            return self._maybe_boost(inner)
        if kind == "phrase":
            if val.endswith("*"):
                # tantivy PhrasePrefixQuery syntax ("a b"*): one
                # phrase-prefix per default field, should-unioned like
                # _default_atom.  (A spaced `"a b" *` still means
                # phrase-OR-all — two atoms, tantivy reads it the same.)
                nodes = [
                    a
                    for f in self.default_fields
                    if (a := self._phrase_prefix_atom(val, f)) is not None
                ]
                if not nodes:
                    return None
                node = nodes[0] if len(nodes) == 1 else Bool(should=nodes)
                return self._maybe_boost(node)
            node = self._maybe_slop(self._default_atom(val.strip('"')))
            return self._maybe_boost(node)
        if kind == "range":
            return self._maybe_boost(self._parse_range(val))
        if kind == "inset":
            # bare `IN [a b c]` — tantivy's QueryParser default-field
            # behaviour: one TermSet per default field, should-unioned
            sets = [
                self._parse_inset(f, val) for f in self.default_fields
            ]
            node = sets[0] if len(sets) == 1 else Bool(should=sets)
            return self._maybe_boost(node)
        if kind == "word":
            boost = None
            if "^" in val:
                base, _, suf = val.rpartition("^")
                if not base:
                    raise ValueError(f"dangling boost {val!r}")
                boost = _parse_boost(suf)
                val = base
            if val == "*":
                node = All()
            else:
                node = self._word_atom(val)
            if boost is not None:
                node = _boost(node, boost)
            return self._maybe_boost(node)
        return None

    def _word_atom(self, val: str):
        if val.endswith("*") and val != "*":
            # prefix-term syntax (data* / url:da*), tantivy prefix
            # semantics: constant scorer over docs holding ANY term
            # starting with the prefix — desugared to the term-range
            # machinery (prefix_term_range).
            fld, core = self._split_field(val[:-1], val)
            toks = tokenize_query(core)
            if len(toks) != 1:
                raise ValueError(
                    f"prefix query {val!r} must be a single term "
                    f"(tokenized to {toks}) — quote multi-token "
                    'prefixes as a phrase-prefix: "a b"*'
                )
            return prefix_term_range(toks[0], fld)
        if (m := re.search(r"~(\d+)$", val)) and not val.startswith("~"):
            # tantivy fuzzy-term syntax (term~N → FuzzyTermQuery):
            # Levenshtein ≤N dictionary expansion, constant scorer.
            dist = int(m.group(1))
            if dist > 2:
                raise ValueError(
                    f"fuzzy distance {dist} in {val!r} exceeds 2 — "
                    "Levenshtein automata (tantivy's and ours) stop "
                    "at edit distance 2"
                )
            fld, core = self._split_field(val[: m.start()], val)
            toks = tokenize_query(core)
            if len(toks) != 1:
                raise ValueError(
                    f"fuzzy query {val!r} must be a single term "
                    f"(tokenized to {toks}); ~N on quoted phrases is "
                    'slop ("a b"~2)'
                )
            t = url_term(toks[0]) if fld in URL_FIELDS else toks[0]
            return Fuzzy(t, dist)
        if ":" in val:
            fld, _, rest = val.partition(":")
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", fld):
                # NON-identifier prefixes ("12:30") tokenize as
                # plain terms.  An identifier-shaped prefix is
                # ALWAYS field syntax — so "http://example.com"
                # raises ValueError('unknown field http'), exactly
                # like tantivy's QueryParser on an undeclared field
                # (users must quote URLs: "\"http://example.com\"")
                return self._tokens_atom(val)
            if not rest and self.peek()[0] == "inset":
                # `field: IN [v1 v2 ...]` — the colon ended the word
                # token; _parse_inset validates the field itself
                _, ival = self.next()
                return self._parse_inset(fld, ival)
            if rest == "IN" and self.peek()[0] == "word" and \
                    self.peek()[1].startswith("["):
                raise ValueError(
                    f"malformed set query near {val!r} — write it "
                    f"spaced: '{fld}: IN [a b c]'"
                )
            if fld.lower() not in FIELDS:
                raise ValueError(
                    f"unknown field '{fld}' in query "
                    f"(declared fields: {', '.join(sorted(FIELDS))})"
                )
            if not rest:
                # `content:"a b"` / `url:"a b"` — the quote ended the
                # word token; a trailing * is a field-scoped
                # phrase-prefix (url:"a b"*)
                if self.peek()[0] == "phrase":
                    _, qval = self.next()
                    if qval.endswith("*"):
                        return self._phrase_prefix_atom(qval, fld.lower())
                    return self._tokens_atom(qval.strip('"'), fld.lower())
                return None
            return self._tokens_atom(rest, fld.lower())
        # multi-token words (e.g. "foo.bar") degrade to a phrase
        return self._default_atom(val)


def _normalize(node):
    """Flatten (occur, node) tuples that leaked to the top level."""
    if isinstance(node, tuple):
        occ, n = node
        b = Bool()
        (b.must if occ == "+" else b.must_not).append(n)
        return b
    return node


def parse_query(
    q: str, default_fields: tuple[str, ...] = ("content",)
) -> Bool:
    """Parse a query string into a Bool AST (top level is always Bool).

    default_fields: the field list unqualified atoms search — the
    second argument of tantivy's ``index.parse_query(q, fields)``.
    The reference CLI uses ("content",) (bids/index.py:147); pass
    ("content", "url") for the multi-field behaviour its playground
    drives (playground/junk/find.py:19): each unqualified term/phrase/
    bare-IN expands to a should-union of per-field sub-queries (a doc
    matching in several fields sums their scores).  Unknown names
    raise, like any undeclared field."""
    for f in default_fields:
        if f not in FIELDS:
            raise ValueError(
                f"unknown default field '{f}' "
                f"(declared fields: {', '.join(sorted(FIELDS))})"
            )
    node = _normalize(_Parser(_lex(q), tuple(default_fields)).parse())
    if isinstance(node, (Term, Phrase)):
        return Bool(should=[node])
    # normalize any tuple children (keep the top-level boost)
    fixed = Bool(boost=node.boost)
    for bucket, target in (
        (node.must, "must"),
        (node.should, "should"),
        (node.must_not, "must_not"),
    ):
        for c in bucket:
            if isinstance(c, tuple):
                occ, n = c
                getattr(fixed, "must" if occ == "+" else "must_not").append(n)
            else:
                getattr(fixed, target).append(c)
    return fixed


def positive_terms(node) -> list[str]:
    """Every term that can MATCH (must + should, recursively), in
    first-appearance order, deduped — the highlightable term set for
    snippet generation (must_not terms never appear in a hit).
    url-namespaced terms are excluded: snippets highlight CONTENT text
    and a url token never occurs there under its namespaced form."""
    out: list[str] = []

    def walk(n):
        if isinstance(n, Term):
            out.append(n.term)
        elif isinstance(n, Phrase):
            out.extend(n.terms)
        elif isinstance(n, PhrasePrefix):
            # the fixed members are exact content matches; the prefix
            # slot's expansion is engine-side, unknowable here (same
            # reason Fuzzy contributes nothing)
            out.extend(n.terms[:-1])
        elif isinstance(n, Bool):
            for c in n.must + n.should:
                walk(c)

    walk(node)
    seen: set[str] = set()
    return [
        t for t in out
        if not t.startswith(URL_NS) and not (t in seen or seen.add(t))
    ]
