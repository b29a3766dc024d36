"""Baseline JPEG (ITU-T.81 sequential DCT, Huffman) codec in pure
NumPy + stdlib — no libjpeg/PIL.

Decoder: SOI/APPn/DQT/DHT/SOF0/DRI/SOS marker parse, byte-unstuffed
Huffman entropy decode (DC diff + AC run/size with ZRL/EOB),
dequantize, dezigzag, orthonormal 8x8 IDCT as two matrix products,
chroma upsample (sampling factors 4:4:4 / 4:2:0 / 4:2:2), JFIF
full-range YCbCr→RGB.  Supported: 8-bit baseline, 1 or 3 components,
restart intervals.  Progressive (SOF2) and arithmetic coding raise
NotImplementedError.

Encoder twin (tests only): forward DCT, quantize, zigzag, standard
Annex-K Huffman tables, byte stuffing — emits 4:4:4 or 4:2:0.  Entropy
coding is lossless, so the round-trip gate is EXACT at the quantized-
coefficient level (``decode_jpeg_coefficients``); pixel round-trips
assert a small bounded error from the float DCT/quantize cycle.

The compression mathematics is from the public JPEG specification
(ITU-T.81) — the reference repo has no media codecs; this exists so
decode_image's multimodal plumbing covers the dominant training-data
image format without an imaging library in the sandbox.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i holds the (row*8+col) position of the
# i-th coefficient in scan order (ITU-T.81 Figure 5)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# standard luminance/chrominance quantization tables (Annex K.1), in
# natural (row-major) order
STD_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
STD_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# standard Huffman tables (Annex K.3): (bits[1..16], huffval)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: row k, col n — forward is C @ block @ C.T,
# inverse is C.T @ coeff @ C
_n = np.arange(8)
_DCT = np.cos((2 * _n[None, :] + 1) * _n[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_DCT[0] /= np.sqrt(2)


# ---------------------------------------------------------------- huffman


def _build_decode_table(bits, huffval):
    """Canonical Huffman decode table: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits, huffval):
    """Canonical Huffman encode table: {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes with 0xFF00
    unstuffing; RSTn markers are consumed by ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker reached — per T.81 the decoder pads with 1s
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self):
        """Byte-align and consume one RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1
        m = self.data[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RST marker, got 0xFF{m:02X}")
        self.pos += 2

    def decode_huff(self, table) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.2.2.1): map the t-bit magnitude v to its signed
    value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------- decoder


def decode_jpeg_coefficients(b: bytes):
    """Entropy-decode a baseline JPEG to its quantized DCT coefficient
    blocks (the EXACT lossless layer — used by the round-trip test
    gate).  Returns (header, {comp_id: int32 array
    (blocks_v, blocks_h, 8, 8) in natural order, quantized})."""
    hdr = _parse_jpeg(b)
    return hdr, _entropy_decode(b, hdr)


def _parse_jpeg(b: bytes):
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    scan = None
    restart_interval = 0
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack_from(">H", b, pos)
        seg = b[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                # stored as read: ZIGZAG scan order (the wire format)
                quant[tq] = np.frombuffer(seg, np.uint8, 64, sp).astype(np.int32)
                sp += 64
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                bits = list(seg[sp : sp + 16])
                sp += 16
                n = sum(bits)
                vals = list(seg[sp : sp + n])
                sp += n
                tbl = _build_decode_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0) supported, got SOF marker 0xFF{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                sel.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            scan = {"sel": sel, "data_pos": pos + seg_len}
            pos += seg_len
            break
        pos += seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    return {
        "frame": frame,
        "scan": scan,
        "quant": quant,
        "huff_dc": huff_dc,
        "huff_ac": huff_ac,
        "restart_interval": restart_interval,
    }


def _entropy_decode(b: bytes, hdr):
    frame, scan = hdr["frame"], hdr["scan"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    sel_by_id = {s["id"]: s for s in scan["sel"]}

    out = {}
    for c in comps:
        bx = mcus_x * c["h"]
        by = mcus_y * c["v"]
        out[c["id"]] = np.zeros((by, bx, 64), dtype=np.int32)

    reader = _BitReader(b, scan["data_pos"])
    pred = {c["id"]: 0 for c in comps}
    ri = hdr["restart_interval"]
    for m in range(mcus_y * mcus_x):
        if ri and m and m % ri == 0:
            reader.restart()
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcus_x)
        for c in comps:
            s = sel_by_id[c["id"]]
            dc_tbl = hdr["huff_dc"][s["dc"]]
            ac_tbl = hdr["huff_ac"][s["ac"]]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    blk = np.zeros(64, dtype=np.int32)
                    t = reader.decode_huff(dc_tbl)
                    diff = _extend(reader.receive(t), t)
                    pred[c["id"]] += diff
                    blk[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huff(ac_tbl)
                        r, sz = rs >> 4, rs & 0xF
                        if sz == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflows block")
                        blk[k] = _extend(reader.receive(sz), sz)
                        k += 1
                    out[c["id"]][my * c["v"] + v, mx * c["h"] + hh] = blk
    # dezigzag into natural-order 8x8 blocks
    nat = {}
    for cid, arr in out.items():
        nat[cid] = arr[:, :, UNZIGZAG].reshape(arr.shape[0], arr.shape[1], 8, 8)
    return nat


def decode_jpeg(b: bytes):
    """Baseline JPEG → (H, W) gray or (H, W, 3) RGB uint8."""
    hdr, coeffs = decode_jpeg_coefficients(b)
    frame = hdr["frame"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)

    planes = {}
    for c in comps:
        q = hdr["quant"][c["tq"]].astype(np.float64)[UNZIGZAG].reshape(8, 8)
        blocks = coeffs[c["id"]].astype(np.float64) * q  # dequantize
        by, bx = blocks.shape[:2]
        # IDCT all blocks at once: C.T @ B @ C via einsum
        spat = np.einsum("ij,yxjk,kl->yxil", _DCT.T, blocks, _DCT)
        plane = spat.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # upsample by sampling-factor ratio (nearest)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes[c["id"]] = plane[: frame["h"], : frame["w"]]

    if len(comps) == 1:
        out = planes[comps[0]["id"]]
        return np.clip(np.round(out), 0, 255).astype(np.uint8)
    y = planes[comps[0]["id"]]
    cb = planes[comps[1]["id"]] - 128.0
    cr = planes[comps[2]["id"]] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base quant table (public libjpeg
    convention)."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tbl * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def encode_jpeg(arr, quality: int = 90, subsample: bool = False) -> bytes:
    """Serialize a (H, W) gray or (H, W, 3) RGB uint8 array as a
    baseline JFIF JPEG (standard Annex-K Huffman tables; ``subsample``
    emits 4:2:0 chroma, else 4:4:4).  Test-side twin of decode_jpeg."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]

    ql = _quality_scale(STD_QUANT_LUMA, quality)
    qc = _quality_scale(STD_QUANT_CHROMA, quality)

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": a.astype(np.float64) - 128.0}]
    else:
        rgbf = a.astype(np.float64)
        r, g, bl = rgbf[..., 0], rgbf[..., 1], rgbf[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        if subsample:
            # pad to even then 2x2 mean
            pe = lambda p: np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            cb2 = pe(cb).reshape(-1, 2, pe(cb).shape[1] // 2, 2).mean(axis=(1, 3))
            cr2 = pe(cr).reshape(-1, 2, pe(cr).shape[1] // 2, 2).mean(axis=(1, 3))
            comps = [
                {"id": 1, "h": 2, "v": 2, "tq": 0, "plane": y - 128.0},
                {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb2 - 128.0},
                {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr2 - 128.0},
            ]
        else:
            comps = [
                {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": y - 128.0},
                {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb - 128.0},
                {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr - 128.0},
            ]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # forward DCT + quantize all blocks per component
    qtbl = {0: ql, 1: qc}
    for c in comps:
        bx, by = mcus_x * c["h"], mcus_y * c["v"]
        p = c["plane"]
        pp = np.zeros((by * 8, bx * 8))
        pp[: p.shape[0], : p.shape[1]] = p
        # edge-replicate padding avoids ringing DC jumps
        if p.shape[0] < by * 8:
            pp[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        if p.shape[1] < bx * 8:
            pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
        blocks = pp.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        co = np.einsum("ij,yxjk,kl->yxil", _DCT, blocks, _DCT.T)
        q = qtbl[c["tq"]].astype(np.float64).reshape(8, 8)  # natural order
        c["coef"] = np.round(co / q).astype(np.int32)

    dc_enc = {0: _build_encode_table(*STD_DC_LUMA), 1: _build_encode_table(*STD_DC_CHROMA)}
    ac_enc = {0: _build_encode_table(*STD_AC_LUMA), 1: _build_encode_table(*STD_AC_CHROMA)}

    def csize(v: int) -> int:
        return 0 if v == 0 else int(abs(v)).bit_length()

    wtr = _BitWriter()
    pred = {c["id"]: 0 for c in comps}
    for m in range(mcus_y * mcus_x):
        my, mx = divmod(m, mcus_x)
        for c in comps:
            t = 0 if c["tq"] == 0 else 1
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    blk = c["coef"][my * c["v"] + v, mx * c["h"] + hh]
                    zz = blk.reshape(64)[ZIGZAG]
                    diff = int(zz[0]) - pred[c["id"]]
                    pred[c["id"]] = int(zz[0])
                    sz = csize(diff)
                    code, ln = dc_enc[t][sz]
                    wtr.write(code, ln)
                    if sz:
                        wtr.write(diff if diff > 0 else diff + (1 << sz) - 1, sz)
                    run = 0
                    last_nz = np.nonzero(zz[1:])[0]
                    last = last_nz[-1] + 1 if last_nz.size else 0
                    for k in range(1, last + 1):
                        v2 = int(zz[k])
                        if v2 == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_enc[t][0xF0]
                            wtr.write(code, ln)
                            run -= 16
                        sz = csize(v2)
                        code, ln = ac_enc[t][(run << 4) | sz]
                        wtr.write(code, ln)
                        wtr.write(v2 if v2 > 0 else v2 + (1 << sz) - 1, sz)
                        run = 0
                    if last < 63:
                        code, ln = ac_enc[t][0x00]  # EOB
                        wtr.write(code, ln)
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT payloads are written in ZIGZAG scan order (the wire format)
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in ql[ZIGZAG]))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(int(x) for x in qc[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += struct.pack(">BBB", c["id"], (c["h"] << 4) | c["v"], c["tq"])
    out += seg(0xC0, sof)
    for tc, tbls in ((0, (STD_DC_LUMA, STD_DC_CHROMA)), (1, (STD_AC_LUMA, STD_AC_CHROMA))):
        for th in range(2 if not gray else 1):
            bits, vals = tbls[th]
            out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytes([len(comps)])
    for c in comps:
        t = 0 if c["tq"] == 0 else 1
        sos += bytes([c["id"], (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
