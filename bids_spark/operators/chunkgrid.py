"""Shared chunk-grid geometry for the range-aligned block bounds.

The doc-id domain is cut into ≤ OM_MAX_CHUNKS equal chunks; per-term
chunk-max score arrays (cm) over this grid power both the aligned OR
bound and the AND-path intersection bitmap (operators/wand.py Phase 3).
Build time (blocked_index "cm" stage) and query time (engine fallback
aggregation) must derive the SAME grid from the same doc domain, so the
geometry lives here, imported by both sides.
"""

from __future__ import annotations

# Grid cap: the filter expression embeds one OM_MAX_CHUNKS-entry
# literal array per term (~128 KB each in the task binary) — O(1) in
# corpus size.  Finer grids align the bound to finer vocabulary drift;
# 16384 chunks resolve per-host/topic drift far below the block count
# of any head term.
OM_MAX_CHUNKS = 16384
# Never cut chunks finer than ~half a typical 128-posting block span —
# below that the grid buys no extra tightness.
OM_MIN_CHUNK_DOCS = 64
# Blocks spanning more than this many chunks take the loose Σ gmax
# bound instead of an O(span) array slice when TESTED; when they
# CONTRIBUTE to other terms' bounds they are stored un-exploded
# (cm_wide) so the build never materializes O(n_chunks) rows per
# wide block — the tail vocabulary is full of single-block terms
# whose postings span the whole domain.
OM_SLICE_CAP = 1024
# Build-side auto threshold for the cm sidecar stage: below this many
# total blocks NO query can reach the engine's per-query engage
# threshold (OM_MIN_BLOCKS candidate blocks, wand.py), so the stage
# would be pure build cost (measured 1.9 s on a 23 s 100k-doc build).
# 8× the engine threshold keeps a margin for many-term queries.
CM_BUILD_MIN_BLOCKS = 32768


def chunk_grid(lo: int, hi: int,
               max_chunks: int = OM_MAX_CHUNKS,
               min_chunk_docs: int = OM_MIN_CHUNK_DOCS) -> tuple[int, int, int]:
    """(lo, chunk_width, n_chunks) for doc domain [lo, hi]."""
    span = max(1, hi - lo + 1)
    n = min(max_chunks, max(1, span // min_chunk_docs))
    width = -(-span // n)  # ceil
    return lo, width, -(-span // width)
