"""Property tests for the posting-block codec: decode(encode(x)) == x
across widths, negative (xxhash64-style) doc ids, and extreme gaps."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bids_spark.operators.codec import (
    decode_block,
    decode_block_positions,
    encode_block,
)


def roundtrip(docs, tfs, scores):
    docs = np.asarray(docs, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    scores = np.asarray(scores, dtype=np.float64)
    payload = encode_block(docs, tfs, scores)
    d, t, s = decode_block(payload, int(docs[0]))
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    assert s.tolist() == scores.tolist()  # bit-exact float64
    return payload


def test_single_posting():
    roundtrip([42], [1], [0.5])


def test_small_block():
    roundtrip([1, 2, 3, 100, 10_000], [1, 2, 3, 255, 256], [0.1] * 5)


def test_negative_doc_ids():
    roundtrip([-(2**62), -5, 0, 7, 2**62], [1, 1, 1, 1, 1], [1.0] * 5)


def test_extreme_gap():
    roundtrip([-(2**63), 2**63 - 1], [1, 70000], [0.0, 1e300])


def test_width_boundaries():
    for gap in (254, 255, 256, 65534, 65535, 65536, 2**32 - 2, 2**32 - 1, 2**32):
        roundtrip([0, gap + 1], [1, 1], [0.0, 0.0])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=300,
        unique=True,
    ),
    st.data(),
)
def test_roundtrip_property(doc_ids, data):
    doc_ids = sorted(doc_ids)
    n = len(doc_ids)
    tfs = data.draw(
        st.lists(st.integers(min_value=1, max_value=2**32), min_size=n, max_size=n)
    )
    scores = data.draw(
        st.lists(
            st.floats(min_value=0, max_value=1e6, allow_nan=False),
            min_size=n,
            max_size=n,
        )
    )
    roundtrip(doc_ids, tfs, scores)


def test_compression_ratio_dense():
    # dense consecutive ids + tf=1 → ~2 B/posting + 8 B score (+7 B header)
    docs = np.arange(10_000, 10_128, dtype=np.int64)
    tfs = np.ones(128, dtype=np.int64)
    payload = encode_block(docs, tfs, np.zeros(128))
    assert len(payload) <= 7 + 127 * 1 + 128 * 1 + 128 * 8


def test_dl_mode_roundtrip_and_size():
    # dl mode: no 8-byte scores; decode recomputes them bit-exactly
    from bids_spark.operators.codec import bm25_scores_np

    docs = np.arange(0, 128, dtype=np.int64)
    tfs = (np.arange(128, dtype=np.int64) % 5) + 1
    dls = tfs + 40
    idf, avgdl = 1.7350011354094463, 56.25
    exact = bm25_scores_np(tfs, dls, idf, avgdl)
    payload = encode_block(docs, tfs, exact, dls=dls)
    # ~3 B/posting instead of ~10
    assert len(payload) <= 7 + 127 * 1 + 128 * 1 + 128 * 1
    d, t, s = decode_block(payload, 0, idf=idf, avgdl=avgdl)
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    assert s.tolist() == exact.tolist()  # bit-exact float64


def test_dl_mode_requires_stats():
    docs = np.array([1], dtype=np.int64)
    payload = encode_block(docs, np.array([1]), np.zeros(1), dls=np.array([7]))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_block(payload, 1)


def test_dl_mode_with_positions():
    docs = np.array([5, 9], dtype=np.int64)
    tfs = np.array([2, 1], dtype=np.int64)
    dls = np.array([10, 3], dtype=np.int64)
    flat = np.array([0, 4, 2], dtype=np.int64)
    payload = encode_block(docs, tfs, np.zeros(2), positions=flat, dls=dls)
    d, t, s, p = decode_block_positions(payload, 5)
    assert s is None  # dl-mode: caller scores via eval path
    assert p.tolist() == flat.tolist()
    assert d.tolist() == [5, 9] and t.tolist() == [2, 1]


def roundtrip_pos(docs, tfs, scores, positions):
    docs = np.asarray(docs, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    scores = np.asarray(scores, dtype=np.float64)
    flat = np.asarray(positions, dtype=np.int64)
    payload = encode_block(docs, tfs, scores, flat)
    d, t, s, p = decode_block_positions(payload, int(docs[0]))
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    assert s.tolist() == scores.tolist()
    assert p.tolist() == flat.tolist()
    # plain decode ignores positions but still reads the same block
    d2, t2, s2 = decode_block(payload, int(docs[0]))
    assert d2.tolist() == docs.tolist() and t2.tolist() == tfs.tolist()


def test_positions_roundtrip_simple():
    # two postings: tf=3 (positions 0,5,6) and tf=1 (position 2)
    roundtrip_pos([10, 20], [3, 1], [0.5, 0.25], [0, 5, 6, 2])


def test_positions_roundtrip_wide():
    # position > 65535 forces 4-byte deltas
    roundtrip_pos([1], [2], [1.0], [7, 100_000])


def test_positions_absent():
    payload = encode_block(
        np.array([1, 2], dtype=np.int64),
        np.array([1, 1], dtype=np.int64),
        np.zeros(2),
    )
    _, _, _, p = decode_block_positions(payload, 1)
    assert p is None


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    st.data(),
)
def test_positions_roundtrip_property(doc_ids, data):
    doc_ids = sorted(doc_ids)
    n = len(doc_ids)
    tfs = data.draw(
        st.lists(st.integers(min_value=1, max_value=6), min_size=n, max_size=n)
    )
    flat = []
    for tf in tfs:
        ps = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=10_000),
                min_size=tf, max_size=tf, unique=True,
            )
        )
        flat.extend(sorted(ps))
    roundtrip_pos(doc_ids, tfs, [0.0] * n, flat)
