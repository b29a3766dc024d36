"""Multimodal column plumbing: opaque binary media + typed metadata.

decode_image has REAL pure-NumPy decoders for BMP (uncompressed
BI_RGB), binary PPM (P6), PNG (stdlib zlib inflate + per-scanline
unfiltering; 8-bit gray/RGB/RGBA, non-interlaced), and baseline JPEG
(ITU-T.81 sequential Huffman DCT — ``functions/jpeg.py``);
sample_frames has a REAL pure-NumPy path for uncompressed YUV4MPEG2
video (C420/Cmono, header-walk frame sampling that never reads a
skipped frame's pixels); decode_audio has a
REAL pure-NumPy RIFF/WAVE parser (integer PCM 8/16/24/32-bit, IEEE
float32/64, WAVE_FORMAT_EXTENSIBLE) with audio_features (duration /
RMS / peak / zero-crossing rate) on top — each round-trip-tested
through the mapInPandas kernel against an in-repo encoder twin.  The
container has no image/audio libraries, so the remaining compressed
paths (WebP, progressive JPEG, MP4/MKV codec video, MP3/AAC/OGG/FLAC
audio) are clearly-marked NotImplementedError — the Spark-side
plumbing (schema, Arrow batch shape, mapInPandas signatures,
partitioning, error channel) is real and tested, and swapping in
PIL/ffmpeg is a local change inside one pandas function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, media binary, format string, n_bytes long"


def _safe_media_id(v):
    """Coerce a media_id cell to int or None: Arrow hands a nullable
    long column to pandas as floats-with-NaN (or objects with None),
    and the error-channel except handlers must not themselves raise on
    the id while reporting a bad row.  Only ``on_error="null"`` paths
    use this — raise mode converts strictly so a null/garbage id fails
    the job like any other invalid cell."""
    try:
        return int(v)
    except (TypeError, ValueError):
        return None


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


def encode_png(arr, filter_type=0) -> bytes:
    """Serialize a (H, W), (H, W, 3), or (H, W, 4) uint8 array as a
    non-interlaced 8-bit PNG — the test-side twin of the decoder (pure
    stdlib zlib + NumPy, no imaging library).  ``filter_type`` is the
    per-scanline filter: an int applied to every row or a length-H
    sequence, values 0-4 (None/Sub/Up/Average/Paeth) — used by the
    round-trip tests to exercise every unfilter branch."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    ch = 1 if a.ndim == 2 else a.shape[2]
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    body = a.reshape(h, w * ch).astype(np.int16)
    ftypes = [int(filter_type)] * h if np.isscalar(filter_type) else [int(f) for f in filter_type]
    prev = np.zeros(w * ch, dtype=np.int16)
    stream = bytearray()
    for y in range(h):
        cur, f = body[y], ftypes[y]
        if f == 0:
            filt = cur
        elif f == 1:  # Sub: subtract the pixel bpp bytes to the left
            left = np.zeros_like(cur)
            left[ch:] = cur[:-ch]
            filt = cur - left
        elif f == 2:  # Up
            filt = cur - prev
        elif f == 3:  # Average
            left = np.zeros_like(cur)
            left[ch:] = cur[:-ch]
            filt = cur - ((left + prev) >> 1)
        elif f == 4:  # Paeth
            left = np.zeros_like(cur)
            left[ch:] = cur[:-ch]
            upleft = np.zeros_like(prev)
            upleft[ch:] = prev[:-ch]
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            filt = cur - pred
        else:
            raise ValueError(f"bad filter {f}")
        stream.append(f)
        stream.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(stream)))
        + chunk(b"IEND", b"")
    )


def _decode_png(b: bytes):
    """Non-interlaced 8-bit PNG (gray / RGB / RGBA) → (H, W) or
    (H, W, C) uint8.  Stdlib ``zlib`` inflates the IDAT stream; the
    five scanline filters unapply with NumPy per row (Sub is a
    channel-strided cumsum; Average/Paeth walk pixels within the row —
    fine for the Arrow-batch image sizes this kernel sees)."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = hdr
    if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
        raise NotImplementedError(
            f"only non-interlaced 8-bit gray/RGB/RGBA PNG supported "
            f"(depth={depth}, color_type={ctype}, interlace={interlace})"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(raw[y, 0])
        cur = raw[y, 1:]
        if f == 0:
            rec = cur.copy()
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp] ⇒ strided cumsum
            rec = (
                (np.cumsum(cur.reshape(w, ch).astype(np.int64), axis=0) % 256)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 2:  # Up (uint8 addition wraps mod 256)
            rec = cur + prev
        elif f == 3:  # Average
            r2 = np.zeros((w, ch), dtype=np.uint8)
            c2 = cur.reshape(w, ch).astype(np.uint16)
            p2 = prev.reshape(w, ch).astype(np.uint16)
            left = np.zeros(ch, dtype=np.uint16)
            for x in range(w):
                r2[x] = (c2[x] + ((left + p2[x]) >> 1)) & 0xFF
                left = r2[x].astype(np.uint16)
            rec = r2.reshape(stride)
        elif f == 4:  # Paeth
            r2 = np.zeros((w, ch), dtype=np.uint8)
            c2 = cur.reshape(w, ch).astype(np.int32)
            p2 = prev.reshape(w, ch).astype(np.int32)
            left = np.zeros(ch, dtype=np.int32)
            upleft = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                up = p2[x]
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
                r2[x] = (c2[x] + pred) & 0xFF
                left = r2[x].astype(np.int32)
                upleft = up
            rec = r2.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
        prev = rec
    return np.ascontiguousarray(out.reshape(h, w, ch) if ch > 1 else out.reshape(h, w))


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


DECODED_ERR_SCHEMA = DECODED_SCHEMA + ", error string"


def decode_image(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Decode opaque image blobs to raw pixel buffers.

    REAL pure-NumPy decode paths (no imaging library needed): BMP
    (uncompressed 24/32-bit BI_RGB, top-down or bottom-up), binary PPM
    (P6), PNG (non-interlaced 8-bit gray/RGB/RGBA via stdlib zlib),
    and baseline JPEG (SOF0 Huffman sequential — see
    ``functions/jpeg.py``).  WebP and progressive JPEG still raise
    NotImplementedError inside the kernel.

    ``on_error``: ``"raise"`` (default — one unsupported/corrupt blob
    fails the job, strictness intended for validated inputs) or
    ``"null"`` — emit the row with null pixels, zero dims, and the
    exception text in an extra ``error`` column, so one bad blob
    cannot kill a 100-TB decode job.

    Output rows: (media_id, width, height, channels, pixels binary)
    with pixels = row-major top-down bytes (channels 1/3/4 as decoded),
    plus ``error`` when ``on_error="null"``.
    """
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")
    null_mode = on_error == "null"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                mid = _safe_media_id(mid) if null_mode else int(mid)
                try:
                    b = bytes(blob)
                    if b[:2] == b"BM":
                        px = _decode_bmp(b)
                    elif b[:2] == b"P6":
                        px = _decode_ppm(b)
                    elif b[:8] == b"\x89PNG\r\n\x1a\n":
                        px = _decode_png(b)
                    elif b[:2] == b"\xff\xd8":
                        from graph_mining_spark.functions.jpeg import decode_jpeg

                        px = decode_jpeg(b)
                    else:
                        raise NotImplementedError(
                            f"unsupported image magic {b[:4]!r}: only BMP/PPM/PNG/"
                            "baseline-JPEG decode in this environment"
                        )
                except Exception as exc:  # noqa: BLE001 — error-channel mode
                    if not null_mode:
                        raise
                    rows.append((mid, 0, 0, 0, None, f"{type(exc).__name__}: {exc}"))
                    continue
                h, w = px.shape[:2]
                ch = 1 if px.ndim == 2 else px.shape[2]
                row = (mid, w, h, ch, px.tobytes())
                rows.append(row + (None,) if null_mode else row)
            cols = ["media_id", "width", "height", "channels", "pixels"]
            if null_mode:
                cols.append("error")
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(kernel, schema=DECODED_ERR_SCHEMA if null_mode else DECODED_SCHEMA)


def encode_y4m(frames, fps=(30, 1), colorspace: str = "C420") -> bytes:
    """Serialize frames as an uncompressed YUV4MPEG2 (.y4m) stream —
    the test-side twin of ``sample_frames`` (pure NumPy, no ffmpeg).

    ``frames``: for ``colorspace="Cmono"`` a (T, H, W) uint8 array of
    luma planes; for ``"C420"`` a sequence of (Y, U, V) plane tuples
    with Y = (H, W) and U/V = (H//2, W//2) uint8 arrays.
    """
    import numpy as np

    if colorspace not in ("C420", "Cmono"):
        raise ValueError("colorspace must be 'C420' or 'Cmono'")
    first_y = np.asarray(frames[0][0] if colorspace == "C420" else frames[0], np.uint8)
    h, w = first_y.shape
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n".encode()
    )
    for fr in frames:
        out += b"FRAME\n"
        if colorspace == "C420":
            y, u, v = (np.asarray(p, np.uint8) for p in fr)
            if y.shape != (h, w) or u.shape != (h // 2, w // 2) or v.shape != (h // 2, w // 2):
                raise ValueError("C420 plane shape mismatch")
            out += y.tobytes() + u.tobytes() + v.tobytes()
        else:
            out += np.asarray(fr, np.uint8).tobytes()
    return bytes(out)


def _parse_y4m(b: bytes):
    """YUV4MPEG2 stream → (width, height, fps_num, fps_den, colorspace,
    frame_size_bytes, first_frame_offset).  Each frame is a variable
    ``FRAME[ params]\\n`` header (YUV4MPEG2 allows optional per-frame
    parameters) followed by exactly frame_size_bytes of uncompressed
    planar YUV — the sampler walks headers but never reads skipped
    frames' pixels."""
    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = b.index(b"\n")
    w = h = None
    fn, fd, cs = 30, 1, "C420"
    for tok in b[10:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            fn, fd = (int(x) for x in val.split(b":"))
        elif tag == b"C":
            cs = tok.decode()
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    if cs == "C420" or cs.startswith("C420"):  # C420jpeg/C420paldv share geometry
        frame_size = w * h + 2 * ((h // 2) * (w // 2))
        cs = "C420"
    elif cs == "Cmono":
        frame_size = w * h
    else:
        raise NotImplementedError(f"y4m colorspace {cs} not supported (C420/Cmono only)")
    return w, h, fn, fd, cs, frame_size, nl + 1


SAMPLED_SCHEMA = (
    "media_id long, frame_index long, width int, height int, "
    "colorspace string, pixels binary"
)
SAMPLED_ERR_SCHEMA = SAMPLED_SCHEMA + ", error string"


def sample_frames(
    media: DataFrame, every_n: int = 30, on_error: str = "raise"
) -> DataFrame:
    """Sample every ``every_n``-th frame from video blobs.

    REAL pure-NumPy path for uncompressed YUV4MPEG2 (.y4m, C420 and
    Cmono) — the kernel walks the per-frame headers (YUV4MPEG2 allows
    optional per-frame parameters after ``FRAME``, so headers are
    variable-length) but only ever slices the sampled frames' pixel
    bytes; skipped frames cost one newline search each, never a pixel
    read.  Compressed containers (MP4/MKV/AVI codecs) raise
    NotImplementedError inside the kernel — ffmpeg is absent in this
    environment; plugging it in is a local change inside this one
    pandas function, the Spark-side contract (schema, Arrow batching,
    error channel) is identical.

    ``on_error`` mirrors decode_image: ``"raise"`` (default) or
    ``"null"`` (emit one row with null pixels + ``error`` text per
    failed blob).

    Output rows: (media_id, frame_index, width, height, colorspace,
    pixels) with pixels = the frame's planar YUV (C420: Y then U then
    V) or luma (Cmono) bytes.
    """
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    null_mode = on_error == "null"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                mid = _safe_media_id(mid) if null_mode else int(mid)
                # buffer per blob: a blob that fails mid-stream must
                # contribute ONE error row, not partial frames + error
                blob_rows = []
                try:
                    b = bytes(blob)
                    if not b.startswith(b"YUV4MPEG2"):
                        raise NotImplementedError(
                            f"unsupported video magic {b[:8]!r}: only uncompressed "
                            "YUV4MPEG2 samples in this environment (codecs need ffmpeg)"
                        )
                    w, h, _fn, _fd, cs, fsz, off = _parse_y4m(b)
                    pos, i = off, 0
                    while pos < len(b):
                        if b[pos : pos + 5] != b"FRAME":
                            raise ValueError(f"bad FRAME marker at frame {i}")
                        # optional per-frame parameters end at the newline
                        start = b.index(b"\n", pos) + 1
                        px = b[start : start + fsz]
                        if len(px) < fsz:
                            raise ValueError(f"truncated frame {i}")
                        if i % every_n == 0:
                            row = (mid, i, w, h, cs, px)
                            blob_rows.append(row + (None,) if null_mode else row)
                        pos = start + fsz
                        i += 1
                except Exception as exc:  # noqa: BLE001 — error-channel mode
                    if not null_mode:
                        raise
                    rows.append(
                        (mid, -1, 0, 0, None, None, f"{type(exc).__name__}: {exc}")
                    )
                    continue
                rows.extend(blob_rows)
            cols = ["media_id", "frame_index", "width", "height", "colorspace", "pixels"]
            if null_mode:
                cols.append("error")
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(
        kernel, schema=SAMPLED_ERR_SCHEMA if null_mode else SAMPLED_SCHEMA
    )


# ---------------------------------------------------------------------------
# Audio: RIFF/WAVE PCM + IEEE-float decode (pure NumPy, no audio library)
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = "media_id long, sample_rate int, channels int, n_samples long, samples binary"
AUDIO_ERR_SCHEMA = AUDIO_SCHEMA + ", error string"
AUDIO_FEATURE_SCHEMA = (
    "media_id long, duration_s double, rms double, peak double, zero_crossing_rate double"
)


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Serialize samples as a RIFF/WAVE blob — the test-side twin of
    ``decode_audio`` (pure NumPy, no audio library).

    ``samples``: (n,) or (n, channels).  dtype picks the container
    format: uint8 → PCM8, int16 → PCM16, int32 → PCM32,
    float32/float64 → IEEE-float WAV (format code 3, float32).
    """
    import struct

    import numpy as np

    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    if a.dtype == np.uint8:
        fmt_code, width, payload = 1, 1, a.astype("<u1").tobytes()
    elif a.dtype == np.int16:
        fmt_code, width, payload = 1, 2, a.astype("<i2").tobytes()
    elif a.dtype == np.int32:
        fmt_code, width, payload = 1, 4, a.astype("<i4").tobytes()
    elif a.dtype in (np.float32, np.float64):
        fmt_code, width, payload = 3, 4, a.astype("<f4").tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {a.dtype}")
    n, ch = a.shape
    fmt = struct.pack(
        "<HHIIHH", fmt_code, ch, sample_rate, sample_rate * ch * width, ch * width, width * 8
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav(b: bytes):
    """RIFF/WAVE blob → (float32 samples (n, channels) in [-1, 1],
    sample_rate).  Chunk-walking parser: handles PCM 8/16/24/32-bit
    (format 1), IEEE float32/64 (format 3), and WAVE_FORMAT_EXTENSIBLE
    (0xFFFE, resolved through the SubFormat GUID's leading code).
    Unknown chunks (LIST, fact, cue...) are skipped by size, as the
    RIFF contract requires; chunks are word-aligned (odd sizes pad)."""
    import struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, end = 12, min(len(b), 8 + struct.unpack("<I", b[4:8])[0])
    fmt_code = channels = rate = bits = None
    data = None
    while pos + 8 <= end:
        tag = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt_code, channels, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_code == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
                if size < 40:
                    raise ValueError("extensible fmt chunk too short")
                (fmt_code,) = struct.unpack("<H", body[24:26])
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt_code is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if channels < 1:
        raise ValueError("invalid channel count")
    if fmt_code == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(data, "<u1").astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3).astype(np.int32)
            v = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM bit depth {bits} not supported")
    elif fmt_code == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, "<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(data, "<f8").astype(np.float32)
        else:
            raise NotImplementedError(f"float bit depth {bits} not supported")
    else:
        raise NotImplementedError(
            f"WAV format code {fmt_code} not supported (PCM and IEEE float only; "
            "compressed codecs need an audio library absent in this environment)"
        )
    n = len(x) // channels
    return x[: n * channels].reshape(n, channels), int(rate)


def decode_audio(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Decode opaque audio blobs to normalized float32 sample buffers.

    REAL pure-NumPy decode path for RIFF/WAVE: integer PCM at
    8/16/24/32 bits, IEEE float32/64, and WAVE_FORMAT_EXTENSIBLE
    headers.  Compressed codecs (MP3/AAC/OGG/FLAC) raise
    NotImplementedError inside the kernel — no audio library in this
    environment; plugging one in is a local change inside this one
    pandas function, the Spark-side contract is identical.

    ``on_error`` mirrors decode_image: ``"raise"`` (default) or
    ``"null"`` (null samples + ``error`` text per failed blob).

    Output rows: (media_id, sample_rate, channels, n_samples, samples)
    with samples = interleaved little-endian float32 in [-1, 1].
    """
    if on_error not in ("raise", "null"):
        raise ValueError("on_error must be 'raise' or 'null'")
    null_mode = on_error == "null"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                mid = _safe_media_id(mid) if null_mode else int(mid)
                try:
                    b = bytes(blob)
                    if b[:4] != b"RIFF":
                        raise NotImplementedError(
                            f"unsupported audio magic {b[:4]!r}: only RIFF/WAVE "
                            "decode in this environment (codecs need an audio library)"
                        )
                    x, rate = _decode_wav(b)
                except Exception as exc:  # noqa: BLE001 — error-channel mode
                    if not null_mode:
                        raise
                    rows.append((mid, 0, 0, 0, None, f"{type(exc).__name__}: {exc}"))
                    continue
                row = (mid, rate, x.shape[1], x.shape[0], x.astype("<f4").tobytes())
                rows.append(row + (None,) if null_mode else row)
            cols = ["media_id", "sample_rate", "channels", "n_samples", "samples"]
            if null_mode:
                cols.append("error")
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(kernel, schema=AUDIO_ERR_SCHEMA if null_mode else AUDIO_SCHEMA)


def audio_features(decoded: DataFrame) -> DataFrame:
    """Per-clip scalar features over ``decode_audio`` output: duration,
    RMS energy, peak amplitude, and zero-crossing rate — each a
    vectorized NumPy pass over the channel-averaged waveform inside one
    Arrow batch (no per-sample Python).  Rows whose decode failed
    (null ``samples`` from the error channel) are passed through with
    null features rather than dropped."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["samples"] is None or r["n_samples"] == 0:
                    rows.append((_safe_media_id(r["media_id"]), None, None, None, None))
                    continue
                x = np.frombuffer(r["samples"], "<f4").reshape(-1, int(r["channels"]))
                mono = x.mean(axis=1, dtype=np.float64)
                dur = float(len(mono)) / float(r["sample_rate"])
                rms = float(np.sqrt(np.mean(mono * mono))) if len(mono) else 0.0
                peak = float(np.max(np.abs(mono))) if len(mono) else 0.0
                zcr = (
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if len(mono) > 1
                    else 0.0
                )
                rows.append((_safe_media_id(r["media_id"]), dur, rms, peak, zcr))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "duration_s", "rms", "peak", "zero_crossing_rate"],
            )

    return decoded.mapInPandas(kernel, schema=AUDIO_FEATURE_SCHEMA)
