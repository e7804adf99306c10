"""Posting-block codec: docID-delta + frame-of-reference byte packing.

Re-provides what tantivy's `.idx` segment format gives BIDS (docID
deltas in bitpacked blocks of 128 + per-block skip data — public
tantivy 0.25 format; files visible at
/root/reference/playground/bids_index/) as a numpy-vectorized codec
over parquet `binary` cells.

Format per block (little-endian):

    [u16 n] [u8 width_delta] [u8 width_tf] [u8 width_pos_first]
    [u8 width_pos_delta] [u8 width_dl]
    [ (n-1) * width_delta bytes : doc-id gaps, gap-1 encoded ]
    [ n     * width_tf    bytes : term frequencies, tf-1 encoded ]
    width_dl == 0 ("f64" score mode):
      [ n * 8 bytes             : exact float64 per-posting BM25 score ]
    width_dl > 0 ("dl" score mode):
      [ n * width_dl bytes      : doc lengths, dl-1 encoded ]
    iff width_pos_first > 0 (positions recorded):
      [ n * width_pos_first bytes        : first position per posting ]
      [ (Σtf−n) * width_pos_delta bytes  : remaining within-posting
                                           deltas, posting order ]

    First-occurrence positions and within-posting deltas get separate
    widths: at web-scale doc lengths the first position needs 2 bytes
    (absolute token offset, up to dl) while subsequent gaps are almost
    always <256 → 1 byte, saving ~1 byte per repeat occurrence over a
    single uniform width.

Score modes: "f64" stores the precomputed per-posting impact (8 B) so
decode is a pure read; "dl" stores the doc length instead (1-2 B
typical) and decode recomputes score = idf·tf·(k1+1)/(tf+k1·(1−b+
b·dl/avgdl)) in vectorized float64 with the SAME operand order as the
build/naive Catalyst expression (functions/bm25.py) — IEEE-754
elementwise ops are correctly rounded in both runtimes, so scores stay
bit-identical while the index drops ~6.5 B/posting (the dominant cost
at 10^12 docs).  idf rides on the sibling `idf` block column; avgdl is
a corpus scalar from the build manifest.

The positions section is optional (width_pos == 0 ⇒ absent) and
mirrors tantivy's `.pos` files (record:"position",
playground/bids_index/meta.json:29): per posting there are exactly tf
positions, stored as within-posting deltas (first absolute), which is
what makes phrase queries (D6) possible on the compressed path.

Carrying the exact per-posting impact score (computed once at build
with global df/avgdl) lets query-time scoring skip the doclens join
entirely — decode + groupBy(doc_id).sum(score) — while staying
bit-identical to the naive path: build (numpy) and naive (JVM)
evaluate the same IEEE-754 float64 expression tree.

The first doc id of the block lives in a sibling bigint column
(`first_doc`), so gaps start from index 1; gaps are ≥1 (doc ids are
unique per term) and stored minus 1.  Widths are the minimal uniform
byte width in {1,2,4,8} — frame-of-reference without patching (the
byte-aligned member of the PFor family; chosen over per-value varint
because both encode AND decode stay fully numpy-vectorized — no
per-posting Python, which is the actual constraint at 10^12 docs).

Block metadata columns (`first_doc`, `max_doc`, `block_max_score`,
`n`) give query-time block skipping via ordinary parquet predicate
pushdown + block-max pruning (operators/wand.py).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_WIDTHS = (1, 2, 4, 8)
_DTYPES = {1: "<u1", 2: "<u2", 4: "<u4", 8: "<u8"}


def _width_for(max_val: int) -> int:
    if max_val < (1 << 8):
        return 1
    if max_val < (1 << 16):
        return 2
    if max_val < (1 << 32):
        return 4
    return 8


def bm25_scores_np(
    tfs: np.ndarray, dls: np.ndarray, idf: float, avgdl: float,
    k1: float = 1.2, b: float = 0.75,
) -> np.ndarray:
    """Vectorized float64 BM25 with the SAME operand order as the
    Catalyst expression in functions/bm25.py — bit-identical results."""
    tf_d = tfs.astype(np.float64)
    dl_d = dls.astype(np.float64)
    norm = tf_d + k1 * ((1.0 - b) + (b * dl_d) / avgdl)
    return (idf * tf_d) * (k1 + 1.0) / norm


def encode_block(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    scores: np.ndarray,
    positions: np.ndarray | None = None,
    dls: np.ndarray | None = None,
) -> bytes:
    """doc_ids: sorted unique int64 (ascending), tfs: int64 ≥1,
    scores: float64 exact per-posting BM25; positions (optional): flat
    int array of length Σtf — the ascending token positions of posting
    i occupy positions[Σtf[:i] : Σtf[:i+1]]; dls (optional): int64 doc
    lengths ≥1 — when given, the block stores dl instead of the 8-byte
    scores ("dl" score mode; decode recomputes them exactly).

    All gap math is done in uint64 (two's-complement reinterpretation),
    so negative xxhash64 doc ids and full-range gaps are safe.
    """
    n = len(doc_ids)
    assert 0 < n <= 0xFFFF
    u = doc_ids.astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        gaps = (np.diff(u) - np.uint64(1)) if n > 1 else np.empty(0, np.uint64)
    wd = _width_for(int(gaps.max()) if n > 1 else 0)
    wt = _width_for(int(tfs.max()) - 1)
    pos_bytes = b""
    wpf = wpd = 0
    if positions is not None:
        flat = np.asarray(positions, dtype=np.int64)
        assert len(flat) == int(tfs.sum())
        starts = np.concatenate(
            ([0], np.cumsum(tfs.astype(np.int64))[:-1])
        ).astype(np.int64)
        firsts = flat[starts]
        # within-posting deltas for non-first occurrences
        deltas = flat[1:] - flat[:-1]
        mask = np.ones(len(flat), dtype=bool)
        mask[starts] = False
        rest = deltas[mask[1:]] if len(flat) > 1 else np.empty(0, np.int64)
        wpf = _width_for(int(firsts.max()) if len(firsts) else 0)
        wpd = _width_for(int(rest.max()) if len(rest) else 0)
        pos_bytes = (
            firsts.astype(_DTYPES[wpf]).tobytes()
            + rest.astype(_DTYPES[wpd]).tobytes()
        )
    if dls is None:
        wl = 0
        score_bytes = scores.astype("<f8").tobytes()
    else:
        wl = _width_for(int(dls.max()) - 1)
        score_bytes = (
            (dls.astype(np.uint64) - np.uint64(1)).astype(_DTYPES[wl]).tobytes()
        )
    head = np.array([n], dtype="<u2").tobytes() + bytes([wd, wt, wpf, wpd, wl])
    return (
        head
        + gaps.astype(_DTYPES[wd]).tobytes()
        + (tfs.astype(np.uint64) - np.uint64(1)).astype(_DTYPES[wt]).tobytes()
        + score_bytes
        + pos_bytes
    )


def decode_block(
    payload: bytes,
    first_doc: int,
    idf: float | None = None,
    avgdl: float | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (doc_ids int64 ascending, tfs int64, scores float64).

    For "dl"-mode blocks, `idf` and `avgdl` are required to recompute
    the scores (exactly); f64-mode blocks ignore them."""
    d, t, s, _p, dls = _decode(payload, first_doc, want_positions=False)
    if s is None:
        if idf is None or avgdl is None:
            raise ValueError(
                "dl-mode block: pass idf and avgdl to decode_block to "
                "recompute scores"
            )
        s = bm25_scores_np(t, dls, float(idf), float(avgdl))
    return d, t, s


def decode_block_positions(
    payload: bytes, first_doc: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None, np.ndarray | None]:
    """→ (doc_ids, tfs, scores-or-None [dl-mode], flat positions or
    None if not stored)."""
    d, t, s, p, _dls = _decode(payload, first_doc, want_positions=True)
    return d, t, s, p


def decode_block_positions_dl(
    payload: bytes, first_doc: int
) -> tuple[
    np.ndarray,
    np.ndarray,
    np.ndarray | None,
    np.ndarray | None,
    np.ndarray | None,
]:
    """→ (doc_ids, tfs, scores-or-None [dl-mode], flat positions or
    None, dls-or-None [f64-mode]).  The dl column lets the fused
    phrase path (plans.planner.eval_phrase_fused) score straight from
    the block payload instead of joining the doclens table — dl-mode
    blocks store the exact doc length per posting, the same value the
    doclens table holds."""
    return _decode(payload, first_doc, want_positions=True)


def _decode(payload: bytes, first_doc: int, want_positions: bool):
    n = int(np.frombuffer(payload[:2], dtype="<u2")[0])
    wd, wt, wpf, wpd, wl = (
        payload[2], payload[3], payload[4], payload[5], payload[6],
    )
    off = 7
    gaps = np.frombuffer(payload[off : off + (n - 1) * wd], dtype=_DTYPES[wd]).astype(
        np.uint64
    )
    off += (n - 1) * wd
    tfs = (
        np.frombuffer(payload[off : off + n * wt], dtype=_DTYPES[wt]).astype(np.int64)
        + 1
    )
    off += n * wt
    scores = None
    dls = None
    if wl == 0:
        scores = np.frombuffer(payload[off : off + n * 8], dtype="<f8").copy()
        off += n * 8
    else:
        dls = (
            np.frombuffer(payload[off : off + n * wl], dtype=_DTYPES[wl]).astype(
                np.int64
            )
            + 1
        )
        off += n * wl
    docs_u = np.empty(n, dtype=np.uint64)
    docs_u[0] = np.int64(first_doc).astype(np.uint64)
    if n > 1:
        with np.errstate(over="ignore"):
            docs_u[1:] = docs_u[0] + np.cumsum(gaps + np.uint64(1))
    positions = None
    if want_positions and wpf:
        total = int(tfs.sum())
        starts = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
        firsts = np.frombuffer(
            payload[off : off + n * wpf], dtype=_DTYPES[wpf]
        ).astype(np.int64)
        off += n * wpf
        rest = np.frombuffer(
            payload[off : off + (total - n) * wpd], dtype=_DTYPES[wpd]
        ).astype(np.int64) if total > n else np.empty(0, np.int64)
        deltas = np.empty(total, dtype=np.int64)
        mask = np.ones(total, dtype=bool)
        mask[starts] = False
        deltas[starts] = firsts
        deltas[mask] = rest
        # invert the per-posting delta: cumsum, then rebase each posting
        c = np.cumsum(deltas)
        seg_base = c[starts] - deltas[starts]
        positions = c - np.repeat(seg_base, tfs)
    return docs_u.view(np.int64).copy(), tfs, scores, positions, dls
