"""bids_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Re-expresses the query/data-processing capabilities of the APH10/BIDS
reference (tantivy-backed full-text search over JSON feature documents,
/root/reference/bids/index.py) as idiomatic Spark DataFrame dataflow:

- tokenize → postings / doclens / corpus stats   (operators.index_build)
- SPIMI blocked, delta+varint-compressed index    (operators.blocked_index)
- boolean query language (term/AND/OR/NOT/phrase) (plans.parser / plans.planner)
- exact Okapi BM25 (k1=1.2, b=0.75) top-k         (operators.topk)
- training-pipeline ops: dedup, similarity search,
  text quality / language-id, multimodal plumbing (operators.*)

Everything is DataFrame-first; Python never touches rows one at a time —
the only Python on the hot path is Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
MAX_TOKEN_LEN = 40  # tantivy `default` tokenizer drops tokens >40 chars
