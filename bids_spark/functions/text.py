"""Tokenizer — the per-row contract of the engine.

Reproduces the reference's analyzer (tantivy `default` tokenizer, the
one BIDS declares per field at /root/reference/bids/index.py:49-52 and
that is visible on disk at playground/bids_index/meta.json:31,44):

    1. lowercase (Unicode)
    2. split on runs of non-alphanumeric characters (Unicode classes)
    3. drop empty tokens and tokens longer than 40 characters

Expressed as built-in column functions (`lower` + `split` + `filter`)
so the whole thing stays inside whole-stage codegen — no Python on the
tokenize hot path. The same regex (`[^\\p{L}\\p{N}]+`) is valid in Java
regex (Spark) and RE2 (DuckDB), which is what makes the DuckDB oracle
able to re-derive identical tokens.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from bids_spark import MAX_TOKEN_LEN

TOKEN_SPLIT_RE = r"[^\p{L}\p{N}]+"
# Python \w == letters + digits + underscore; excluding `_` gives [\p{L}\p{N}]
_PY_SPLIT = re.compile(r"[\W_]+", flags=re.UNICODE)


def tokenize_text(text: Column | str) -> Column:
    """array<string> of tokens for a text column (JVM-side, codegen)."""
    col = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(col), TOKEN_SPLIT_RE)
    return F.filter(
        toks, lambda t: (F.length(t) > 0) & (F.length(t) <= MAX_TOKEN_LEN)
    )


def tokenize_query(text: str) -> list[str]:
    """Driver-side tokenizer for query strings — must agree with
    :func:`tokenize_text`.  Uses an explicit non-alphanumeric split
    (underscore is a separator, matching `[^\\p{L}\\p{N}]+`)."""
    return [
        tok
        for tok in _PY_SPLIT.split(text.lower())
        if tok and len(tok) <= MAX_TOKEN_LEN
    ]
