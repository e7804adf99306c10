"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``bids_spark.contract``; this file is only
the registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bids_spark import contract as C  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 for the default-OR query "merge join"
    over /root/testdata/sf0.001/documents.parquet, served from the
    blocked compressed positional index (the scale path; build is
    cached/resumable across invocations)."""
    return C._search_blocked(spark, "/root/testdata/sf0.001", "merge join", 10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tokenize_tf": C.q_tokenize_tf,
        "doclens": C.q_doclens,
        "corpus_stats": C.q_corpus_stats,
        "term_stats": C.q_term_stats,
        "bm25_single": C.q_bm25_single,
        "bm25_or": C.q_bm25_or,
        "bm25_and": C.q_bm25_and,
        "bm25_not": C.q_bm25_not,
        "bm25_phrase": C.q_bm25_phrase,
        # same queries on the blocked/compressed (scale) path — same oracles
        "bm25_or_blocked": C.q_bm25_or_blocked,
        "bm25_or_aligned": C.q_bm25_or_aligned,
        "bm25_and_blocked": C.q_bm25_and_blocked,
        "bm25_and_prefilter": C.q_bm25_and_prefilter,
        "bm25_phrase_blocked": C.q_bm25_phrase_blocked,
        "bm25_phrase_slop": C.q_bm25_phrase_slop,
        "term_set": C.q_term_set,
        "docid_set": C.q_docid_set,
        "term_range": C.q_term_range,
        "bm25_or_segmented": C.q_bm25_or_segmented,
        "bm25_and_segmented": C.q_bm25_and_segmented,
        "bm25_not_segmented": C.q_bm25_not_segmented,
        "bm25_phrase_segmented": C.q_bm25_phrase_segmented,
        "bm25_or_segmented_deleted": C.q_bm25_or_segmented_deleted,
        # delete → auto-compaction (policy-triggered merge: purge +
        # global stats recompute) — post-merge Lucene semantics
        "bm25_or_compacted": C.q_bm25_or_compacted,
        # probe-θ pruning mode (the cluster-scale default) — same oracle
        "bm25_or_probe": C.q_bm25_or_probe,
        # query-grammar extensions the reference accepts through
        # tantivy's QueryParser: boost, doc_id range, match-all
        "bm25_boost": C.q_bm25_boost,
        "bm25_range": C.q_bm25_range,
        "match_all": C.q_match_all,
        # second indexed text field (reference file_path → url, here
        # the documents `source` column): mixed-field OR/AND scoring
        # with per-field BM25 normalization, and a url term range
        "bm25_url_or": C.q_bm25_url_or,
        "bm25_url_and": C.q_bm25_url_and,
        "bm25_url_phrase": C.q_bm25_url_phrase,
        "url_term_range": C.q_url_term_range,
        # batched serving: five query shapes in ONE Spark action
        "bm25_batch": C.q_bm25_batch,
        # training-pipeline operators
        "token_count": C.q_token_count,
        "token_count_bpe": C.q_token_count_bpe,
        "quality_score": C.q_quality_score,
        "lang_id": C.q_lang_id,
        "fingerprint": C.q_fingerprint,
        "dedup_exact": C.q_dedup_exact,
        # webtext hygiene (Gopher/C4 recipes over derived lines)
        "repetition_stats": C.q_repetition_stats,
        "boilerplate_lines": C.q_boilerplate_lines,
        "remove_boilerplate": C.q_remove_boilerplate,
        "source_stats": C.q_source_stats,
        "snippet": C.q_snippet,
        "filter_decision": C.q_filter_decision,
        # result fetch / shaping (D9/D10/C7) + the A4 ingest invariant
        "search_fetch": C.q_search_fetch,
        "search_dedup_paged": C.q_search_dedup_paged,
        "extract_invariant": C.q_extract_invariant,
        # event-stream operators (batch twins of streaming/windows.py)
        "windowed_counts": C.q_windowed_counts,
        "sessionize": C.q_sessionize,
        "ngram_jaccard": C.q_ngram_jaccard,
        "cosine_topk": C.q_cosine_topk,
        "media_metadata": C.q_media_metadata,
        # approximate / platform-hash ops — rows-only driver check,
        # property-tested against exact counterparts in tests/
        "minhash_lsh": C.q_minhash_lsh,
        "simhash_neardup": C.q_simhash_neardup,
        "lsh_ann_topk": C.q_lsh_ann_topk,
        "lsh_ann_indexed": C.q_lsh_ann_indexed,
        "ivf_ann_topk": C.q_ivf_ann_topk,
        "embedding_neardup": C.q_embedding_neardup,
        "embedding_neardup_exact": C.q_embedding_neardup_exact,
        "decode_features": C.q_decode_features,
        "frame_sample": C.q_frame_sample,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tokenize_tf": C.SQL_TOKENIZE_TF,
        "doclens": C.SQL_DOCLENS,
        "corpus_stats": C.SQL_CORPUS_STATS,
        "term_stats": C.SQL_TERM_STATS,
        "bm25_single": C.bm25_topk_sql(should=["data"]),
        "bm25_or": C.bm25_topk_sql(should=["merge", "join"]),
        "bm25_and": C.bm25_topk_sql(must=["merge", "join"]),
        "bm25_not": C.bm25_topk_sql(should=["merge"], must_not=["join"]),
        "bm25_phrase": C.bm25_phrase_sql(["merge", "join"]),
        "bm25_or_blocked": C.bm25_topk_sql(should=["merge", "join"]),
        "bm25_or_aligned": C.bm25_topk_sql(should=["merge", "join"]),
        "bm25_and_blocked": C.bm25_topk_sql(must=["merge", "join"]),
        "bm25_and_prefilter": C.bm25_topk_sql(must=["merge", "join"]),
        "bm25_phrase_blocked": C.bm25_phrase_sql(["merge", "join"]),
        "bm25_phrase_slop": C.bm25_phrase_slop_sql(["merge", "join"], 2),
        "term_set": C.TERM_SET_SQL,
        "docid_set": C.DOCID_SET_SQL,
        "term_range": C.TERM_RANGE_SQL,
        "bm25_or_segmented": C.bm25_topk_sql(should=["merge", "join"]),
        "bm25_and_segmented": C.bm25_topk_sql(must=["merge", "join"]),
        "bm25_not_segmented": C.bm25_topk_sql(
            should=["merge"], must_not=["join"]
        ),
        "bm25_phrase_segmented": C.bm25_phrase_sql(["merge", "join"]),
        # deleted docs drop out of the candidates; df/N/avgdl still
        # count them (pre-merge Lucene semantics)
        "bm25_or_segmented_deleted": C.bm25_topk_sql(
            should=["merge", "join"], exclude_pred=C._SEG_DELETE_PRED
        ),
        # after compaction the purged docs leave the corpus entirely:
        # the oracle recomputes df/N/avgdl over the survivors
        "bm25_or_compacted": C.bm25_topk_sql(
            should=["merge", "join"], docs_where="NOT (doc_id % 7 = 0)"
        ),
        "bm25_or_probe": C.bm25_topk_sql(should=["merge", "join"]),
        "bm25_boost": C.bm25_topk_sql(
            should=["data", "merge"], boosts={"data": 2.0}
        ),
        "bm25_range": C.bm25_topk_sql(
            must=["data"],
            score_plus=1.0,
            range_pred="p.doc_id BETWEEN 100 AND 300",
        ),
        "match_all": C.SQL_MATCH_ALL,
        "bm25_url_or": C.bm25_url_mixed_sql(["data"], ["src3"]),
        "bm25_url_and": C.bm25_url_mixed_sql(
            ["data"], ["src3"], conjunction=True
        ),
        "bm25_url_phrase": C.SQL_URL_PHRASE,
        "url_term_range": C.SQL_URL_TERM_RANGE,
        "bm25_batch": C.bm25_batch_sql(),
        # token_count_bpe: no oracle — the BPE merge loop is not
        # SQL-expressible; golden-pinned in tests/test_bpe.py
        "token_count": C.SQL_TOKEN_COUNT,
        "quality_score": C.SQL_QUALITY,
        "lang_id": C.SQL_LANG_ID,
        "fingerprint": C.SQL_FINGERPRINT,
        "dedup_exact": C.SQL_DEDUP_EXACT,
        "repetition_stats": C.SQL_REPETITION_STATS,
        "boilerplate_lines": C.SQL_BOILERPLATE_LINES,
        "remove_boilerplate": C.SQL_REMOVE_BOILERPLATE,
        "source_stats": C.SQL_SOURCE_STATS,
        "snippet": C.snippet_sql(C._SNIPPET_TERMS, width=80, context=20),
        "filter_decision": C.SQL_FILTER_DECISION,
        "search_fetch": C.bm25_fetch_sql(should=["merge", "join"]),
        "search_dedup_paged": C.bm25_dedup_page_sql(
            should=["merge", "join"], limit=5, offset=2
        ),
        "extract_invariant": C.SQL_EXTRACT_INVARIANT,
        "windowed_counts": C.SQL_WINDOWED_COUNTS,
        "sessionize": C.SQL_SESSIONIZE,
        "ngram_jaccard": C.SQL_NGRAM_JACCARD,
        "cosine_topk": C.SQL_COSINE_TOPK,
        "media_metadata": C.SQL_MEDIA_METADATA,
        "decode_features": C.SQL_DECODE_FEATURES,
        "frame_sample": C.SQL_FRAME_SAMPLE,
        "embedding_neardup_exact": C.SQL_EMB_NEARDUP_EXACT,
    }
