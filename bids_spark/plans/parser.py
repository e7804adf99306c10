"""Query-string → AST parser.

Re-implements the subset of tantivy's QueryParser grammar that BIDS
exposes (`index.parse_query(q, ["content"])` at
/root/reference/bids/index.py:147; boolean usage documented at
/root/reference/README.md:284 "libc AND libpng"):

    - bare terms                → should clauses (default OR)
    - `a AND b` / `a OR b`      → boolean operators (AND binds tighter)
    - `+term` / `-term`         → must / must-not
    - `"a b c"`                 → phrase (positions)
    - `( ... )`                 → grouping
    - `content:term` / `content:"a b"` → field-scoped query.  The
      schema declares exactly one text field (`content`, the parse
      default at bids/index.py:147), so scoping to it is the identity;
      any OTHER field name raises ValueError — tantivy's QueryParser
      errors on undeclared fields, and silently treating `title:x` as
      a phrase (the previous behaviour) was wrong semantics.

Terms are run through the same tokenizer as documents
(functions.text.tokenize_query); a quoted string whose tokenization
yields one token degrades to a plain term, zero tokens → dropped.

~150 LoC of plain Python on the driver — query parsing is not data-
plane work (SURVEY.md §2D D1).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from bids_spark.functions.text import tokenize_query

# Declared text fields (the reference schema's only queryable text
# field is `content`, bids/index.py:49-52); `field:term` scoping to it
# is the identity, any other field is a parse error.
FIELDS = frozenset({"content"})


@dataclass(frozen=True)
class Term:
    term: str


@dataclass(frozen=True)
class Phrase:
    terms: tuple[str, ...]


@dataclass
class Bool:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)


_LEXER = re.compile(
    r"""
    (?P<lparen>\() | (?P<rparen>\)) |
    (?P<and>\bAND\b) | (?P<or>\bOR\b) |
    (?P<plus>\+) | (?P<minus>-) |
    (?P<phrase>"[^"]*") |
    (?P<word>[^\s()+\-"]+)
    """,
    re.VERBOSE,
)


def _lex(q: str) -> list[tuple[str, str]]:
    return [(m.lastgroup, m.group()) for m in _LEXER.finditer(q)]


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

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
            elif kind in ("lparen", "phrase", "word", "plus", "minus"):
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
    def _tokens_atom(text: str):
        terms = tokenize_query(text)
        if not terms:
            return None
        if len(terms) == 1:
            return Term(terms[0])
        return Phrase(tuple(terms))

    def _atom(self):
        kind, val = self.next()
        if kind == "lparen":
            inner = self._or_expr()
            if self.peek()[0] == "rparen":
                self.next()
            return inner
        if kind == "phrase":
            return self._tokens_atom(val.strip('"'))
        if kind == "word":
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
                if fld.lower() not in FIELDS:
                    raise ValueError(
                        f"unknown field '{fld}' in query "
                        f"(declared fields: {', '.join(sorted(FIELDS))})"
                    )
                if not rest:
                    # `content:"a b"` — the quote ended the word token
                    if self.peek()[0] == "phrase":
                        _, qval = self.next()
                        return self._tokens_atom(qval.strip('"'))
                    return None
                val = rest
            # multi-token words (e.g. "foo.bar") degrade to a phrase
            return self._tokens_atom(val)
        return None


def _normalize(node):
    """Flatten (occur, node) tuples that leaked to the top level."""
    if isinstance(node, tuple):
        occ, n = node
        b = Bool()
        (b.must if occ == "+" else b.must_not).append(n)
        return b
    return node


def parse_query(q: str) -> Bool:
    """Parse a query string into a Bool AST (top level is always Bool)."""
    node = _normalize(_Parser(_lex(q)).parse())
    if isinstance(node, (Term, Phrase)):
        return Bool(should=[node])
    # normalize any tuple children
    fixed = Bool()
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
    snippet generation (must_not terms never appear in a hit)."""
    out: list[str] = []

    def walk(n):
        if isinstance(n, Term):
            out.append(n.term)
        elif isinstance(n, Phrase):
            out.extend(n.terms)
        elif isinstance(n, Bool):
            for c in n.must + n.should:
                walk(c)

    walk(node)
    seen: set[str] = set()
    return [t for t in out if not (t in seen or seen.add(t))]
