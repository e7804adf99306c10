"""Second indexed text field (`url`) via term namespacing.

The reference schema declares TWO indexed text fields — `file_path`
and `content`, both tokenizer "default", record "position", fieldnorms
on (/root/reference/bids/index.py:49-52; on-disk confirmation at
playground/bids_index/meta.json:25-44) — so a reference user can run
`file_path:indexer` today: tantivy's `parse_query(q, ["content"])`
only sets the DEFAULT field list, explicit field-scoped atoms still
resolve against the schema.  In this engine's web-text analogue the
second field is `url` (SURVEY §2 maps file_path → url).

Design: url-field tokens are stored as NAMESPACED terms
(``URL_NS + token``) in the SAME postings/blocks/dictionary/cm tables
as content terms.  That keeps the entire index format and every
serving path — bucket hashing, block-max pruning, aligned bounds, AND
bitmaps, phrase machinery, segment idf substitution — untouched: a
url term is just another term with its own postings, df, idf, gmax
and positions (positions index into the url's own token stream).
What DOES differ per field is BM25's length normalization: the doc
length is the FIELD's token count and avgdl the FIELD's average
(tantivy scores per-field fieldnorms the same way), so every scoring
site picks (dl, avgdl) by the term's namespace — dl already rides
per posting (the +pf2 dl-carry, which for url postings carries the
url token count), and avgdl_url is one extra manifest scalar.

Namespace byte choice: tokens are ``[\\p{L}\\p{N}]+`` so no content
term can start with ``\\x01`` — collisions are impossible — and
``\\x01...`` sorts below every content term in UTF-8 byte order, so
content term-ranges exclude url terms via a lower floor (``\\x02``)
and url term-ranges map to ``[URL_NS+a, URL_NS+b]`` with the prefix
ceiling ``\\x01u\\x02`` for open ends (parser does both — engines and
the oracle stay namespace-agnostic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Namespace prefix for url-field terms.  \x01 < "0" (the smallest
#: tokenizer-producible first byte), so ns terms sort before all
#: content terms.
URL_NS = "\x01u\x01"

#: Lower floor for content term-ranges with an open start: sorts above
#: every URL_NS term and below every content term ("0" is 0x30).
CONTENT_RANGE_FLOOR = "\x02"

#: Exclusive upper bound covering exactly the URL_NS prefix (next byte
#: after the final \x01).
URL_RANGE_CEIL = "\x01u\x02"


def url_term(token: str) -> str:
    """Namespace a url-field token into term space."""
    return URL_NS + token


def is_url_term(term: str) -> bool:
    return term.startswith(URL_NS)


def field_of(term: str) -> str:
    return "url" if is_url_term(term) else "content"


def display_term(term: str) -> str:
    """Pretty form for messages/UX: url terms render as url:token."""
    return f"url:{term[len(URL_NS):]}" if is_url_term(term) else term


def url_term_col(term_col: Column) -> Column:
    """Column predicate: term is in the url namespace (translates to
    StringStartsWith — parquet-pushdown-friendly)."""
    return term_col.startswith(F.lit(URL_NS))


def avgdl_for(term: str, avgdl: float, avgdl_url: float | None) -> float:
    """The field-correct avgdl for scoring a term's postings.  Indexes
    without the url field never see ns terms, so avgdl_url=None only
    has to be right for content terms."""
    if is_url_term(term):
        if avgdl_url is None:
            raise ValueError(
                "url-namespaced term on an index built without "
                "url_field=True (no avgdl_url recorded)"
            )
        return float(avgdl_url)
    return float(avgdl)


def avgdl_col(
    term_col: Column, avgdl: float, avgdl_url: float | None
) -> Column:
    """Per-row avgdl as a column expression — the field dispatch for
    JVM-side score expressions.  Collapses to a plain literal when the
    index has no url field (unchanged plans for single-field indexes)."""
    if avgdl_url is None:
        return F.lit(float(avgdl))
    return F.when(
        url_term_col(term_col), F.lit(float(avgdl_url))
    ).otherwise(F.lit(float(avgdl)))
