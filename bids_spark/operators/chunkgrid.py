"""Shared chunk-grid geometry for the range-aligned block bounds.

The doc-id domain is cut into ≤ OM_MAX_CHUNKS equal chunks; per-term
chunk-max score arrays (cm) over this grid power both the aligned OR
bound and the AND-path intersection bitmap (operators/wand.py Phase 3).
Build time (blocked_index "cm" stage) and query time (engine fallback
aggregation) must derive the SAME grid from the same doc domain, so the
geometry lives here, imported by both sides.
"""

from __future__ import annotations

import numpy as np

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


def fill_max(out: np.ndarray, dst_lo: int, dst_width: int,
             d_lo: int, d_hi: int, v: float) -> None:
    """Max-merge value ``v`` into every chunk of ``out`` (a dense
    per-chunk array on grid ``(dst_lo, dst_width)``) whose doc interval
    overlaps ``[d_lo, d_hi]``, clamped to the grid.

    This is the conservative cross-grid projection used when a
    segment's per-term chunk-max sidecar (built on the SEGMENT's grid)
    is served under a segmented engine's UNION grid: a value lands in
    every destination chunk its source interval touches, so a
    projected array is ≥ the exact one elementwise — sound for upper
    bounds and for the cm>0 presence test (it can only widen them)."""
    n = len(out)
    if n == 0 or d_hi < d_lo:
        return
    a = max(0, min(n - 1, (d_lo - dst_lo) // dst_width))
    b = max(0, min(n - 1, (d_hi - dst_lo) // dst_width))
    if a > b:
        return
    s = slice(a, b + 1)
    np.maximum(out[s], v, out=out[s])
