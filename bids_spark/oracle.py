"""Brute-force exact-BM25 oracle — the committed reference semantics.

tantivy is not installable in this sandbox, so this deliberately
simple (<150 LoC, no vectorization) implementation IS the semantic
oracle for the engine (SURVEY.md §4 scoring-oracle note): tantivy's
`default` tokenizer, Okapi BM25 k1=1.2 b=0.75 with exact doc lengths,
Lucene BooleanQuery match/score rules, tie-break (score desc, doc_id
asc).  Golden tests assert the Spark engine is rank-identical and
score-equal (rel 1e-6) to this.
"""

from __future__ import annotations

import math
from collections import Counter

from bids_spark import B, K1
from bids_spark.functions.fields import is_url_term, url_term
from bids_spark.functions.text import tokenize_query
from bids_spark.plans.parser import (
    All,
    Bool,
    DocIdSet,
    Fuzzy,
    Phrase,
    PhrasePrefix,
    Range,
    Term,
    TermRange,
    TermSet,
    parse_query,
)


def _levenshtein(a: str, b: str) -> int:
    """Plain edit distance (insert/delete/substitute, no transposition
    discount) — the semantics Spark's and DuckDB's levenshtein() share."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[-1]


def tokenize(text: str) -> list[str]:
    return tokenize_query(text)


class OracleIndex:
    def __init__(self, docs: dict[int, str], urls: dict[int, str] | None = None):
        """docs: doc_id -> text.  urls: doc_id -> url (optional second
        indexed text field — tantivy indexes file_path with the same
        default analyzer, bids/index.py:49-52 + meta.json:25-31; its
        tokens live under the URL_NS term namespace with their OWN
        per-field dl/avgdl, exactly like the engines)."""
        self.tokens = {d: tokenize(t) for d, t in docs.items()}
        url_tokens = {
            d: [url_term(t) for t in tokenize(urls.get(d, ""))]
            for d in docs
        } if urls is not None else {d: [] for d in docs}
        self.tf = {
            d: Counter(toks) + Counter(url_tokens[d])
            for d, toks in self.tokens.items()
        }
        self.positions = {}
        for d in docs:
            pos: dict[str, list[int]] = {}
            # each field has its OWN position stream (a url phrase
            # never spans into content positions)
            for i, t in enumerate(self.tokens[d]):
                pos.setdefault(t, []).append(i)
            for i, t in enumerate(url_tokens[d]):
                pos.setdefault(t, []).append(i)
            self.positions[d] = pos
        self.dl = {d: len(toks) for d, toks in self.tokens.items()}
        self.url_dl = {d: len(toks) for d, toks in url_tokens.items()}
        self.n_docs = len(docs)
        self.avgdl = (
            sum(self.dl.values()) / self.n_docs if self.n_docs else 0.0
        )
        self.avgdl_url = (
            sum(self.url_dl.values()) / self.n_docs if self.n_docs else 0.0
        )
        self.df = Counter()
        for c in self.tf.values():
            for term in c:
                self.df[term] += 1

    def idf(self, term_df: int) -> float:
        return math.log(1.0 + (self.n_docs - term_df + 0.5) / (term_df + 0.5))

    def term_score(
        self, tf: int, dl: int, idf: float, avgdl: float | None = None
    ) -> float:
        a = self.avgdl if avgdl is None else avgdl
        return idf * tf * (K1 + 1.0) / (tf + K1 * (1 - B + B * dl / a))

    def _field_dl(self, term: str, d: int) -> tuple[int, float]:
        """(dl, avgdl) of the term's field for doc d — BM25 length
        normalization is per-field (tantivy fieldnorms per field)."""
        if is_url_term(term):
            return self.url_dl[d], self.avgdl_url
        return self.dl[d], self.avgdl

    def _eval_term(self, t: str) -> dict[int, float]:
        idf = self.idf(self.df[t])
        out = {}
        for d, c in self.tf.items():
            if t in c:
                dl, a = self._field_dl(t, d)
                out[d] = self.term_score(c[t], dl, idf, a)
        return out

    def _eval_phrase(
        self, terms: tuple[str, ...], slop: int = 0
    ) -> dict[int, float]:
        # idf over DISTINCT member terms (matches the planner)
        idf = sum(self.idf(self.df[t]) for t in set(terms) if t in self.df)
        out = {}
        for d, pos in self.positions.items():
            if any(t not in pos for t in terms):
                continue
            # members of one phrase share one field (parser invariant:
            # a phrase atom is scoped to a single field), so the length
            # normalization is that field's
            dl, a = self._field_dl(terms[0], d)
            if slop > 0:
                # tantivy sloppy-phrase count (functions/slop.py); the
                # slop=0 exact chain below stays independent of it
                from bids_spark.functions.slop import phrase_tf_slop

                tf = phrase_tf_slop([pos[t] for t in terms], slop)
                if tf:
                    out[d] = self.term_score(tf, dl, idf, a)
                continue
            ends = pos[terms[0]]
            for t in terms[1:]:
                nxt = set(pos[t])
                ends = [p + 1 for p in ends if p + 1 in nxt]
            if ends:
                out[d] = self.term_score(len(ends), dl, idf, a)
        return out

    def _eval(self, node) -> dict[int, float]:
        scores = self._eval_raw(node)
        # boost multiplies the wrapped query's scores (BoostQuery)
        b = getattr(node, "boost", 1.0)
        if b != 1.0:
            scores = {d: s * b for d, s in scores.items()}
        return scores

    def _eval_raw(self, node) -> dict[int, float]:
        if isinstance(node, Term):
            return self._eval_term(node.term)
        if isinstance(node, Phrase):
            return self._eval_phrase(node.terms, node.slop)
        if isinstance(node, Range):
            # constant scorer over the doc_id fast field
            return {
                d: 1.0
                for d in self.dl
                if (node.lo is None or d >= node.lo)
                and (node.hi is None or d <= node.hi)
            }
        if isinstance(node, All):
            return {d: 1.0 for d in self.dl}
        if isinstance(node, TermSet):
            # constant scorer: any member term present
            return {
                d: 1.0
                for d, c in self.tf.items()
                if any(t in c for t in node.terms)
            }
        if isinstance(node, DocIdSet):
            ids = set(node.ids)
            return {d: 1.0 for d in self.dl if d in ids}
        if isinstance(node, Fuzzy):
            # constant scorer: any dictionary term within Levenshtein
            # ≤ dist, same field namespace (FuzzyTermQuery)
            ns = is_url_term(node.term)
            q = node.term[len(url_term("")):] if ns else node.term
            exp = {
                t for t in self.df
                if is_url_term(t) == ns
                and _levenshtein(
                    t[len(url_term("")):] if ns else t, q
                ) <= node.dist
            }
            return {
                d: 1.0
                for d, c in self.tf.items()
                if any(t in c for t in exp)
            }
        if isinstance(node, PhrasePrefix):
            # constant scorer: fixed terms adjacent then ANY term with
            # the last prefix at the next position (PhrasePrefixQuery)
            fixed, pfx = node.terms[:-1], node.terms[-1]
            out = {}
            for d, pos in self.positions.items():
                if any(t not in pos for t in fixed):
                    continue
                ends = pos[fixed[0]]
                for t in fixed[1:]:
                    nxt = set(pos[t])
                    ends = [p + 1 for p in ends if p + 1 in nxt]
                ppos = {
                    p
                    for t, ps in pos.items()
                    if t.startswith(pfx)
                    for p in ps
                }
                if any(p + 1 in ppos for p in ends):
                    out[d] = 1.0
            return out
        if isinstance(node, TermRange):
            # constant scorer: any term lexicographically within the
            # bounds (UTF-8 byte order, like Spark/DuckDB strings)
            def in_range(t: str) -> bool:
                bt = t.encode()
                if node.lo is not None:
                    blo = node.lo.encode()
                    if bt < blo or (bt == blo and not node.lo_incl):
                        return False
                if node.hi is not None:
                    bhi = node.hi.encode()
                    if bt > bhi or (bt == bhi and not node.hi_incl):
                        return False
                return True

            return {
                d: 1.0
                for d, c in self.tf.items()
                if any(in_range(t) for t in c)
            }
        assert isinstance(node, Bool)
        if not node.must and not node.should:
            return {}
        if node.must:
            parts = [self._eval(m) for m in node.must]
            docs = set(parts[0])
            for p in parts[1:]:
                docs &= set(p)
            scores = {d: sum(p[d] for p in parts) for d in docs}
            for s in node.should:
                for d, sc in self._eval(s).items():
                    if d in scores:
                        scores[d] += sc
        else:
            scores: dict[int, float] = {}
            for s in node.should:
                for d, sc in self._eval(s).items():
                    scores[d] = scores.get(d, 0.0) + sc
        for n in node.must_not:
            for d in self._eval(n):
                scores.pop(d, None)
        return scores

    def search(
        self,
        query: str,
        limit: int = 10,
        default_fields: tuple[str, ...] = ("content",),
    ) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, score)] — score desc, doc_id asc."""
        scores = self._eval(parse_query(query, default_fields))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:limit]
        return [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
