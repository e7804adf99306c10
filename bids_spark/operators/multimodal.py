r"""Multimodal column plumbing: opaque `binary` media + typed metadata.

The real decode libraries (PIL/ffmpeg/librosa) are not in this
container; per the round contract the Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested,
while the codec call is stubbed behind a deterministic fake (or raises
NotImplementedError when `strict=True`).

- attach_media:        derive a media binary column + metadata struct
                       (here: utf-8 bytes of text standing in for an
                       image payload; at ingest this is the `html`
                       column of the webpages table)
- media_metadata:      magic-prefix sniff + byte length — pure column
                       functions, oracle-checkable
- decode_features:     mapInPandas over Arrow batches → fixed-width
                       feature vector per row (byte-histogram fake; a
                       real image decoder drops in with the same
                       signature and batch shape)
- sample_frames:       frame-sampling layout for video-ish payloads:
                       byte-range slicing into N evenly spaced windows
                       (the partitioning/shape contract of a real
                       frame sampler)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURES = 8

_MAGIC = {
    "89504e47": "png",
    "ffd8ff": "jpeg",
    "47494638": "gif",
    "3c68746d": "html",  # "<htm"
}


def attach_media(docs: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """(doc_id, media binary, media_len) — the opaque-media shape."""
    media = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        media.alias("media"),
        F.length(media).cast("long").alias("media_len"),
    )


def media_metadata(media_df: DataFrame) -> DataFrame:
    """(doc_id, media_len, magic_hex, kind) — sniff without decoding."""
    magic = F.lower(F.hex(F.substring(F.col("media"), 1, 4)))
    kind = F.lit("unknown")
    for prefix, name in _MAGIC.items():
        kind = F.when(magic.startswith(prefix), F.lit(name)).otherwise(kind)
    return media_df.select(
        "doc_id",
        "media_len",
        magic.alias("magic_hex"),
        kind.alias("kind"),
    )


def _fake_decode(buf: bytes) -> np.ndarray:
    """Deterministic stand-in for image decode + feature extraction:
    8-bin byte histogram, L1-normalized.  Replace with e.g.
    PIL.Image.open + model features — same signature."""
    if not buf:
        return np.zeros(N_FEATURES, dtype=np.float64)
    arr = np.frombuffer(buf, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=N_FEATURES, range=(0, 256))
    return hist / max(len(arr), 1)


def decode_features(media_df: DataFrame, strict: bool = False) -> DataFrame:
    """(doc_id, f0..f7 double) via Arrow-batched mapInPandas.

    Fixed scalar feature columns (not array<double>): a flat schema is
    what a downstream trainer joins on, and it keeps every column
    independently prunable/sortable (the driver's canonicalizer also
    requires hashable cells).

    strict=True raises NotImplementedError where a real codec would be
    required — marking exactly the seam a production image/audio
    library plugs into.
    """
    fcols = [f"f{i}" for i in range(N_FEATURES)]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType())]
        + [T.StructField(c, T.DoubleType()) for c in fcols]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real media codec not available in this environment; "
                    "plug a decoder into _fake_decode's seam"
                )
            feats = np.vstack(
                [_fake_decode(bytes(b)) for b in pdf["media"]]
            ) if len(pdf) else np.zeros((0, N_FEATURES))
            out = {"doc_id": pdf["doc_id"]}
            for i, c in enumerate(fcols):
                out[c] = feats[:, i]
            yield pd.DataFrame(out)

    return media_df.select("doc_id", "media").mapInPandas(gen, schema)


def sample_frames(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """(doc_id, frame_no, frame binary) — N evenly spaced byte windows
    (the row-explosion/partitioning shape of real frame sampling)."""
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    win = (F.col("media_len") / n_frames).cast("long")
    frames = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("frame_no"),
            F.substring(
                F.col("media"), (i * win + 1).cast("int"),
                F.greatest(win, F.lit(1)).cast("int")
            ).alias("frame"),
        ),
    )
    return media_df.select(
        "doc_id", F.explode(frames).alias("f")
    ).select("doc_id", "f.frame_no", "f.frame")
