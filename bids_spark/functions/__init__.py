from bids_spark.functions.text import (  # noqa: F401
    TOKEN_SPLIT_RE,
    tokenize_text,
    tokenize_query,
)
from bids_spark.functions.bm25 import bm25_term_score, idf_expr  # noqa: F401
