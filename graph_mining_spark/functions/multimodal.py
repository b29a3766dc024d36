"""Multimodal column plumbing: opaque binary media + typed metadata.

The container has no image/audio libraries, so the decode kernels are
STUBBED (clearly-marked NotImplementedError or a deterministic fake) —
but the Spark-side plumbing is real and tested: schema, Arrow batch
shape, mapInPandas signatures, partitioning.  Swapping the stub body
for PIL/ffmpeg calls is a local change inside one pandas function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, media binary, format string, n_bytes long"
FEATURE_SCHEMA = "media_id long, n_bytes long, magic string, checksum string, feature_dim int"


def documents_as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media: utf-8 bytes of the text as an opaque
    binary column with typed metadata — the shape a real pipeline
    would read from an object store manifest."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("fake/raw").alias("format"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


def extract_media_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Vectorized feature extraction over Arrow batches (mapInPandas).

    Real work per batch is NumPy/pandas over the raw bytes — here:
    byte length, magic prefix, a cheap checksum, and a stub feature
    dim.  This is the pattern a real image-resize / frame-sample /
    audio-feature kernel plugs into.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = pdf["media"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "magic": blobs.map(lambda b: bytes(b[:4]).hex()),
                    "checksum": blobs.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "feature_dim": 0,
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """STUB: real decode requires PIL/libjpeg, absent in this
    container.  The plumbing contract: mapInPandas over MEDIA_SCHEMA →
    (media_id, width, height, pixels binary)."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this environment; "
        "plug a PIL/cv2 kernel into extract_media_features-style mapInPandas"
    )


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling requires ffmpeg, absent here.  Same
    mapInPandas contract as decode_image."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg, not present in this environment"
    )
