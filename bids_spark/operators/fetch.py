"""Result fetch / shaping operators — distributed twins of the CLI's
driver-side result loop (``bids_spark/cli.py:346-380``; reference
semantics: BIDS over-fetch + content-dedup + truncate,
``bids/index.py:151-181``).

The CLI faithfully mirrors the reference by collecting at most
``offset + limit + PAGE_SIZE`` rows and deduplicating in the driver (the
reference's own in-process loop).  These operators express the SAME
semantics as DataFrame plans so the shaping runs distributed and can sit
under the DuckDB oracle gate:

* :func:`fetch_docs` — D10 doc fetch + C7 stored-field retrieval: join
  the ranked ids back to the documents table.  The ranked side is ≤ k
  rows at any corpus scale, so it is broadcast — the documents scan
  stays a pruned probe, never a shuffle of the corpus.
* :func:`dedup_paged` — D9 over-fetch + content dedup + pagination:
  within the over-fetched window, drop every result whose text equals a
  higher-ranked result's text, re-rank the survivors, slice the page.
  All inputs are ≤ offset+limit+page_size rows — the window functions
  here never see corpus-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fetch_docs(
    results: DataFrame,
    docs: DataFrame,
    prefix_len: int = 80,
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Join ranked search results ``(rank, doc_id, score)`` back to the
    documents table (reference: result content comes from tantivy's
    docstore, ``bids/index.py:159-166``; here the documents table IS the
    docstore, SURVEY §1.3).

    Returns ``(rank, doc_id, score, <extra_cols...>, content_prefix)``.
    ``results`` is broadcast: it is top-k-sized by construction, so the
    join is a map-side probe of the (column-pruned) documents scan.
    """
    cols = [c for c in extra_cols if c in docs.columns]
    side = docs.select(
        "doc_id",
        *cols,
        F.substring("text", 1, prefix_len).alias("content_prefix"),
    )
    return (
        side.join(F.broadcast(results), "doc_id")
        .select("rank", "doc_id", "score", *cols, "content_prefix")
        .orderBy("rank")
    )


def dedup_paged(
    results: DataFrame,
    docs: DataFrame,
    limit: int,
    offset: int = 0,
    page_size: int = 10,
) -> DataFrame:
    """Reference over-fetch + content-dedup + pagination as a plan
    (quirk kept verbatim from ``bids/index.py:151-181``: fetch
    ``offset+limit+page_size`` results, drop any whose CONTENT equals an
    earlier/higher-ranked result's, then slice the page).

    ``results`` must be ranked ``(rank, doc_id, score)``; only the
    over-fetch window (rank ≤ offset+limit+page_size) is considered —
    exactly like the reference, a duplicate pair straddling the window
    boundary is NOT detected.  Output: ``(position, doc_id, score)``
    re-ranked 1..limit over the surviving rows, offset applied.

    Scale note: the window functions below run on ≤ window-size rows
    (tens), not the corpus; the only corpus-sized input is the
    broadcast-probed documents join, same shape as :func:`fetch_docs`.
    """
    fetch_n = offset + limit + page_size
    window_rows = results.where(F.col("rank") <= fetch_n)
    joined = docs.select("doc_id", "text").join(
        F.broadcast(window_rows), "doc_id"
    )
    # keep the best (lowest) rank per distinct text — ties impossible,
    # rank is unique
    by_text = Window.partitionBy("text").orderBy("rank")
    deduped = (
        joined.withColumn("_rn", F.row_number().over(by_text))
        .where(F.col("_rn") == 1)
        .drop("_rn", "text")
    )
    # re-rank the survivors; the frame is ≤ fetch_n rows so the
    # single-partition global window is O(page), not O(corpus)
    by_rank = Window.orderBy("rank")
    return (
        deduped.withColumn(
            "position", F.row_number().over(by_rank).cast("long")
        )
        .where(
            (F.col("position") > offset) & (F.col("position") <= offset + limit)
        )
        .select("position", "doc_id", "score")
        .orderBy("position")
    )
