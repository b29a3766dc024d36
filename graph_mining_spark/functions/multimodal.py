"""Multimodal column plumbing: opaque binary media + typed metadata.

The container has no image/audio libraries, so the COMPRESSED decode
paths (JPEG/PNG, video) remain clearly-marked NotImplementedError —
but decode_image has REAL pure-NumPy decoders for BMP (uncompressed
BI_RGB) and binary PPM (P6), round-trip-tested through the
mapInPandas kernel, and the rest of the Spark-side plumbing is real
and tested: schema, Arrow batch shape, mapInPandas signatures,
partitioning.  Swapping in PIL/ffmpeg is a local change inside one
pandas function.
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


DECODED_SCHEMA = "media_id long, width int, height int, channels int, pixels binary"


def encode_bmp(arr) -> bytes:
    """Serialize an (H, W, 3) uint8 RGB array as an uncompressed
    24-bit bottom-up BI_RGB .bmp — the test-side twin of the decoder
    (pure NumPy, no imaging library)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    data = body.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def _decode_bmp(b: bytes):
    """Uncompressed 24/32-bit BI_RGB windows bitmap → (H, W, 3) RGB."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"only uncompressed 24/32-bit BI_RGB supported (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off).reshape(h, stride)
    px = raw[:, : w * nch].reshape(h, w, nch)[:, :, :3][:, :, ::-1]  # BGR(A) -> RGB
    if bottom_up:
        px = px[::-1]
    return np.ascontiguousarray(px)


def _decode_ppm(b: bytes):
    """Binary P6 netpbm (maxval ≤ 255) → (H, W, 3) RGB."""
    import numpy as np

    # tokenizer: whitespace-separated header fields, '#' comments
    pos = 0
    fields = []
    while len(fields) < 4:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(b[start:pos])
    pos += 1  # single whitespace after maxval
    if fields[0] != b"P6":
        raise ValueError("not a P6 ppm")
    w, h, maxval = int(fields[1]), int(fields[2]), int(fields[3])
    if maxval > 255:
        raise NotImplementedError("16-bit ppm not supported")
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)
    return np.ascontiguousarray(px)


def decode_image(media: DataFrame) -> DataFrame:
    """Decode opaque image blobs to raw RGB pixel buffers.

    REAL pure-NumPy decode paths (no imaging library needed): BMP
    (uncompressed 24/32-bit BI_RGB, top-down or bottom-up) and binary
    PPM (P6).  Compressed formats (JPEG/PNG/WebP) still raise
    NotImplementedError inside the kernel — libjpeg/PIL are absent in
    this environment; plugging them in is a local change inside this
    one pandas function.

    Output rows: (media_id, width, height, channels=3, pixels binary)
    with pixels = row-major top-down RGB bytes.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                b = bytes(blob)
                if b[:2] == b"BM":
                    px = _decode_bmp(b)
                elif b[:2] == b"P6":
                    px = _decode_ppm(b)
                else:
                    raise NotImplementedError(
                        f"unsupported image magic {b[:4]!r}: only BMP/PPM decode "
                        "in this environment (JPEG/PNG need libjpeg/PIL)"
                    )
                h, w, _ = px.shape
                rows.append((int(mid), w, h, 3, px.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "pixels"]
            )

    return media.mapInPandas(kernel, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB: video frame sampling requires ffmpeg, absent here.  Same
    mapInPandas contract as decode_image."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg, not present in this environment"
    )
