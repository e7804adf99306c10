"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The driver records at most 50 rows per round, so redundant engine-path
variants of the same logical query are folded into single rows (see
contract.py "consolidated variant suites") — the registry stays under
the cap with every operator, including the pipeline/ANN tail,
certified every round.

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
        # index-build foundations
        "tokenize_tf": C.q_tokenize_tf,
        "doclens": C.q_doclens,
        "corpus_stats": C.q_corpus_stats,
        "term_stats": C.q_term_stats,
        # naive (DataFrame-algebra) engine, one row per boolean shape
        "bm25_single": C.q_bm25_single,
        "bm25_or": C.q_bm25_or,
        "bm25_and": C.q_bm25_and,
        "bm25_not": C.q_bm25_not,
        "bm25_phrase": C.q_bm25_phrase,
        # blocked/compressed scale path — pruning-mode variants folded
        # per shape (blocked/aligned/probe; blocked/prefilter)
        "bm25_or_pruned": C.q_bm25_or_pruned,
        "bm25_and_pruned": C.q_bm25_and_pruned,
        "bm25_phrase_blocked": C.q_bm25_phrase_blocked,
        "bm25_phrase_slop": C.q_bm25_phrase_slop,
        # multi-segment reader: or/and/not/phrase folded; the delete
        # and compaction lifecycles keep their own oracles
        "bm25_segmented": C.q_bm25_segmented_suite,
        "bm25_or_segmented_deleted": C.q_bm25_or_segmented_deleted,
        "bm25_or_compacted": C.q_bm25_or_compacted,
        # query-grammar extensions the reference accepts through
        # tantivy's QueryParser
        "grammar_const": C.q_grammar_const_suite,
        "bm25_boost": C.q_bm25_boost,
        "bm25_range": C.q_bm25_range,
        # fuzzy term~N and prefix term*/"a b"* (tantivy FuzzyTermQuery
        # / PhrasePrefixQuery — the last QueryParser surfaces)
        "bm25_fuzzy": C.q_bm25_fuzzy,
        "bm25_prefix": C.q_bm25_prefix,
        # second indexed text field (reference file_path → url):
        # or/and/phrase/range folded
        "url_field": C.q_url_field_suite,
        # batched serving: five query shapes in ONE Spark action
        "bm25_batch": C.q_bm25_batch,
        # result fetch / shaping (D9/D10/C7) + the A4 ingest invariant
        "search_fetch": C.q_search_fetch,
        "search_dedup_paged": C.q_search_dedup_paged,
        "extract_invariant": C.q_extract_invariant,
        # training-pipeline text operators
        "token_count": C.q_token_count,
        "token_count_bpe": C.q_token_count_bpe,
        "textstats": C.q_textstats_suite,
        "dedup_exact": C.q_dedup_exact,
        # webtext hygiene (Gopher/C4 recipes over derived lines)
        "webtext_doc": C.q_webtext_doc_suite,
        "boilerplate_lines": C.q_boilerplate_lines,
        "remove_boilerplate": C.q_remove_boilerplate,
        "source_stats": C.q_source_stats,
        "snippet": C.q_snippet,
        # event-stream operators (batch twins of streaming/windows.py)
        "windowed_counts": C.q_windowed_counts,
        "sessionize": C.q_sessionize,
        # dedup / similarity pipeline
        "ngram_jaccard": C.q_ngram_jaccard,
        "cosine_topk": C.q_cosine_topk,
        "media_metadata": C.q_media_metadata,
        # approximate / platform-hash ops — rows-only driver check,
        # property-tested against exact counterparts in tests/
        "minhash_lsh": C.q_minhash_lsh,
        "simhash_neardup": C.q_simhash_neardup,
        "ann_suite": C.q_ann_suite,
        "embedding_neardup": C.q_embedding_neardup,
        "embedding_neardup_exact": C.q_embedding_neardup_exact,
        "decode_features": C.q_decode_features,
        "frame_sample": C.q_frame_sample,
        # SBOM transform (reference sbom.py process_file as Catalyst)
        "sbom": C.q_sbom,
    }


def oracle_sql() -> dict[str, str]:
    _or = C.bm25_topk_sql(should=["merge", "join"])
    _and = C.bm25_topk_sql(must=["merge", "join"])
    return {
        "tokenize_tf": C.SQL_TOKENIZE_TF,
        "doclens": C.SQL_DOCLENS,
        "corpus_stats": C.SQL_CORPUS_STATS,
        "term_stats": C.SQL_TERM_STATS,
        "bm25_single": C.bm25_topk_sql(should=["data"]),
        "bm25_or": _or,
        "bm25_and": _and,
        "bm25_not": C.bm25_topk_sql(should=["merge"], must_not=["join"]),
        "bm25_phrase": C.bm25_phrase_sql(["merge", "join"]),
        "bm25_or_pruned": C.variants_sql(
            [("blocked", _or), ("aligned", _or), ("probe", _or)]
        ),
        "bm25_and_pruned": C.variants_sql(
            [("blocked", _and), ("prefilter", _and)]
        ),
        "bm25_phrase_blocked": C.bm25_phrase_sql(["merge", "join"]),
        "bm25_phrase_slop": C.bm25_phrase_slop_sql(["merge", "join"], 2),
        "bm25_segmented": C.variants_sql([
            ("or", _or),
            ("and", _and),
            ("not", C.bm25_topk_sql(should=["merge"], must_not=["join"])),
            ("phrase", C.bm25_phrase_sql(["merge", "join"])),
        ]),
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
        "grammar_const": C.variants_sql([
            ("term_set", C.TERM_SET_SQL),
            ("docid_set", C.DOCID_SET_SQL),
            ("term_range", C.TERM_RANGE_SQL),
            ("match_all", C.SQL_MATCH_ALL),
        ]),
        "bm25_boost": C.bm25_topk_sql(
            should=["data", "merge"], boosts={"data": 2.0}
        ),
        "bm25_range": C.bm25_topk_sql(
            must=["data"],
            score_plus=1.0,
            range_pred="p.doc_id BETWEEN 100 AND 300",
        ),
        "bm25_fuzzy": C.SQL_BM25_FUZZY,
        "bm25_prefix": C.SQL_BM25_PREFIX,
        "url_field": C.variants_sql([
            ("or", C.bm25_url_mixed_sql(["data"], ["src3"])),
            ("and", C.bm25_url_mixed_sql(["data"], ["src3"],
                                         conjunction=True)),
            ("phrase", C.SQL_URL_PHRASE),
            ("range", C.SQL_URL_TERM_RANGE),
        ]),
        "bm25_batch": C.bm25_batch_sql(),
        "search_fetch": C.bm25_fetch_sql(should=["merge", "join"]),
        "search_dedup_paged": C.bm25_dedup_page_sql(
            should=["merge", "join"], limit=5, offset=2
        ),
        "extract_invariant": C.SQL_EXTRACT_INVARIANT,
        "token_count": C.SQL_TOKEN_COUNT,
        # the BPE merge loop as a recursive CTE: one replace() per
        # merge pass over \x02-encoded symbol strings (contract.py
        # bpe_count_sql) — the gate's last no_oracle row, now oracled
        "token_count_bpe": C.SQL_TOKEN_COUNT_BPE,
        "textstats": C.SQL_TEXTSTATS_SUITE,
        "dedup_exact": C.SQL_DEDUP_EXACT,
        "webtext_doc": C.SQL_WEBTEXT_DOC_SUITE,
        "boilerplate_lines": C.SQL_BOILERPLATE_LINES,
        "remove_boilerplate": C.SQL_REMOVE_BOILERPLATE,
        "source_stats": C.SQL_SOURCE_STATS,
        "snippet": C.snippet_sql(C._SNIPPET_TERMS, width=80, context=20),
        "windowed_counts": C.SQL_WINDOWED_COUNTS,
        "sessionize": C.SQL_SESSIONIZE,
        "ngram_jaccard": C.SQL_NGRAM_JACCARD,
        "cosine_topk": C.SQL_COSINE_TOPK,
        "media_metadata": C.SQL_MEDIA_METADATA,
        "decode_features": C.SQL_DECODE_FEATURES,
        "frame_sample": C.SQL_FRAME_SAMPLE,
        "embedding_neardup_exact": C.SQL_EMB_NEARDUP_EXACT,
        "sbom": C.SQL_SBOM,
    }
