from bids_spark.operators.index_build import (  # noqa: F401
    tokens,
    doclens,
    corpus_stats,
    postings,
    postings_with_positions,
    term_stats,
    scored_postings,
)
