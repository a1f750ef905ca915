"""Baseline JPEG (ITU T.81) codec from scratch — stdlib + numpy only.

Closes the last multimodal codec seam (r3 verdict item 6): PNG decode
was already real (sources/png.py); JPEG is the format a web crawl
actually contains.  The reference reaches image IO through PIL
(/root/reference/SpaView.py:50); here the container is implemented
directly so `multimodal.decode_image(fake=False)` handles both
signatures with no native dependency.

Scope (documented boundaries, same style as png.py/geotiff.py):

* Encoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr
  with 4:4:4 or 4:2:0 chroma subsampling, standard Annex K
  quantization + Huffman tables (IJG quality scaling), optional
  restart intervals.  DCT/quantization are whole-image vectorized;
  only the entropy coding walks blocks in Python.
* Decoder: baseline (SOF0) and extended-sequential (SOF1) Huffman
  scans, 1- or 3-component, any sampling factors up to 2×2 (covers
  4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), 8-bit quant tables (16-bit
  accepted), DRI/RSTn restart markers, 0xFF00 byte unstuffing.
  Entropy decode is a Python bit-walk per MCU; dequant + IDCT +
  upsample + color convert are batched numpy over all blocks.
* Progressive (SOF2, Huffman): full multi-scan decode — spectral
  selection, successive approximation (DC and AC refinement bits,
  T.81 G.1.2), EOB runs, interleaved DC / non-interleaved AC scans,
  restart markers — plus a progressive encoder (scan scripting over
  the same quantized coefficients as the baseline encoder, so
  progressive and baseline decodes of the same image are bit-equal;
  tests assert exactly that).
* 12-bit precision (T.81 extended sequential): encoder takes uint16
  samples < 4096, writes SOF1 with 16-bit (Pq=1) quant tables and
  flat canonical Huffman tables covering DC categories to 15 / AC
  sizes to 14 (beyond Annex K's 8-bit range); decoder returns uint16.
* Arithmetic coding and hierarchical modes raise NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constants — ITU T.81 Annex K (public domain tables)
# ---------------------------------------------------------------------------

_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# (bits[1..16], values) — standard DC/AC Huffman tables, Annex K.3
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """Flat (64,) index array: position k of the zigzag scan → raster
    index, derived by the diagonal walk (even diagonals run up-right,
    odd run down-left) rather than hardcoded."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for i in (rng if s % 2 else reversed(rng)):
            out.append(i * 8 + (s - i))
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()          # zigzag pos -> raster index
_UNZIGZAG = np.argsort(_ZIGZAG)    # raster index -> zigzag pos

# DCT-II orthonormal basis: block_dct = C @ block @ C.T
_C = np.array([
    [(np.sqrt(1 / 8) if u == 0 else 0.5)
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (libjpeg's public
    jpeg_quality_scaling formula)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QT_LUMA, _QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# Huffman table machinery (canonical codes)
# ---------------------------------------------------------------------------


def _canonical_codes(bits, values):
    """symbol -> (code, length) with canonical assignment (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return table


class _HuffDecoder:
    """Canonical Huffman decoder: per-length (min_code, max_code,
    value_offset) arrays — O(length) per symbol, no tree allocation."""

    def __init__(self, bits, values):
        self.values = values
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += n
                k += n
                self.max_code[ln] = code - 1
            else:
                self.max_code[ln] = -1
            code <<= 1

    def decode(self, reader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.max_code[ln] >= code >= self.min_code[ln]:
                return self.values[self.val_ptr[ln] + code - self.min_code[ln]]
        raise ValueError("invalid Huffman code")


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
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


class _BitReader:
    """Reads the entropy-coded segment with 0xFF00 unstuffing; stops at
    any other marker (leaves the cursor ON the 0xFF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy segment")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise ValueError("marker inside entropy segment")
            else:
                self.pos += 1
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self):
        """Drop partial byte; cursor must then sit on an RSTn marker."""
        self.nbits = 0


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def _bit_length(v: int) -> int:
    return int(v).bit_length()


# ---------------------------------------------------------------------------
# Color transforms (JFIF / BT.601 full-range)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray, prec: int = 8) -> np.ndarray:
    center = float(1 << (prec - 1))
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + center
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + center
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray, prec: int = 8) -> np.ndarray:
    center = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    y = ycc[..., 0]
    cb = ycc[..., 1] - center
    cr = ycc[..., 2] - center
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, maxv).astype(
        np.uint8 if prec == 8 else np.uint16
    )


# ---------------------------------------------------------------------------
# Block helpers (whole-image vectorized)
# ---------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (nby, nbx, 8, 8), H/W already multiples of 8."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _from_blocks(blocks: np.ndarray) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.pad(plane, ((0, h - plane.shape[0]), (0, w - plane.shape[1])),
                  mode="edge")


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _quantize_components(arr, quality, subsampling, precision=8):
    """Shared encoder front half: level shift, (optional) chroma
    subsample, pad, DCT, quantize, zigzag.  Returns
    (comp_blocks, sub, h, w, gray, qt_l, qt_c) — baseline and
    progressive encoders both start from these identical coefficients,
    which is what makes the cross-mode bit-equality test possible."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    want_dt = np.uint8 if precision == 8 else np.uint16
    if arr.dtype != want_dt or arr.shape[2] not in (1, 3):
        raise ValueError(
            f"need {np.dtype(want_dt).name} (H,W[,1|3]) for "
            f"{precision}-bit"
        )
    if precision == 12 and int(arr.max(initial=0)) > 4095:
        raise ValueError("12-bit samples must be < 4096")
    h, w = arr.shape[:2]
    gray = arr.shape[2] == 1
    if subsampling not in ("4:4:4", "4:2:0"):
        raise NotImplementedError(f"subsampling {subsampling!r}")
    sub = (1, 1) if gray or subsampling == "4:4:4" else (2, 2)
    qt_l, qt_c = _quality_tables(quality)
    if precision == 12:
        # the conventional 8→12-bit table scaling (libjpeg: the same
        # example tables apply, coefficients are 16x larger)
        qt_l = np.clip(qt_l.astype(np.int64) * 16, 1, 65535).astype(
            np.int32
        )
        qt_c = np.clip(qt_c.astype(np.int64) * 16, 1, 65535).astype(
            np.int32
        )

    # --- component planes, level-shifted, padded to the MCU grid
    shift = float(1 << (precision - 1))
    if gray:
        planes = [arr[:, :, 0].astype(np.float64) - shift]
    else:
        ycc = _rgb_to_ycbcr(arr, precision)
        yp = ycc[..., 0]
        if sub == (2, 2):
            he, we = h + (h % 2), w + (w % 2)
            cc = np.pad(ycc[..., 1:], ((0, he - h), (0, we - w), (0, 0)),
                        mode="edge")
            cc = cc.reshape(he // 2, 2, we // 2, 2, 2).mean(axis=(1, 3))
            planes = [yp, cc[..., 0], cc[..., 1]]
        else:
            planes = [yp, ycc[..., 1], ycc[..., 2]]
        planes = [p - shift for p in planes]

    mcu_h, mcu_w = 8 * sub[0], 8 * sub[1]
    hh = -(-h // mcu_h) * mcu_h
    ww = -(-w // mcu_w) * mcu_w
    comp_blocks = []
    for ci, p in enumerate(planes):
        if ci == 0:
            ph, pw = hh, ww
        else:
            ph, pw = hh // sub[0], ww // sub[1]
        blk = _to_blocks(_pad_to(p, ph, pw))
        coef = np.einsum("ux,ijxy,vy->ijuv", _C, blk, _C)
        q = qt_l if ci == 0 else qt_c
        qc = np.round(coef / q).astype(np.int32)
        comp_blocks.append(qc.reshape(-1, 64)[:, _ZIGZAG]
                           .reshape(qc.shape[0], qc.shape[1], 64))
    return comp_blocks, sub, h, w, gray, qt_l, qt_c


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    precision: int = 8,
) -> bytes:
    """Encode (H, W), (H, W, 1) or (H, W, 3) uint8 → baseline JFIF.

    ``precision=12`` takes uint16 samples < 4096 and writes extended
    sequential (SOF1) with 16-bit quant tables and flat Huffman tables
    covering the wider DC/AC categories (T.81 §4.11 scope)."""
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    comp_blocks, sub, h, w, gray, qt_l, qt_c = _quantize_components(
        arr, quality, subsampling, precision
    )

    # --- Huffman tables
    if precision == 8:
        dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
        ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
        dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
        ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
        huff_segments = (
            (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
            (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        )
    else:
        dc_l = dc_c = _canonical_codes(_DC12_BITS, _DC12_VALS)
        ac_l = ac_c = _canonical_codes(_AC12_BITS, _AC12_VALS)
        huff_segments = (
            (0, 0, _DC12_BITS, _DC12_VALS),
            (1, 0, _AC12_BITS, _AC12_VALS),
            (0, 1, _DC12_BITS, _DC12_VALS),
            (1, 1, _AC12_BITS, _AC12_VALS),
        )

    def emit_block(bw, zz, pred, dc_t, ac_t):
        diff = int(zz[0]) - pred
        t = _bit_length(abs(diff))
        code, ln = dc_t[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_t[0xF0]
                bw.write(code, ln)
                run -= 16
            t = _bit_length(abs(v))
            code, ln = ac_t[(run << 4) | t]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << t) - 1, t)
            run = 0
        if last < 63:
            code, ln = ac_t[0x00]
            bw.write(code, ln)
        return int(zz[0])

    # --- entropy-coded segment, MCU-interleaved
    bw = _BitWriter()
    ncomp = 1 if gray else 3
    preds = [0] * ncomp
    n_mcu_y = comp_blocks[0].shape[0] // sub[0]
    n_mcu_x = comp_blocks[0].shape[1] // sub[1]
    mcu_idx = 0
    rst = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                dc_t, ac_t = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                if ci == 0:
                    for by in range(sub[0]):
                        for bx in range(sub[1]):
                            zz = comp_blocks[0][my * sub[0] + by,
                                                mx * sub[1] + bx]
                            preds[0] = emit_block(bw, zz, preds[0], dc_t, ac_t)
                else:
                    zz = comp_blocks[ci][my, mx]
                    preds[ci] = emit_block(bw, zz, preds[ci], dc_t, ac_t)
            mcu_idx += 1
    bw.flush()

    # --- headers
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt_body(tid, qt):
        zz = qt.reshape(-1)[_ZIGZAG]
        if int(zz.max()) > 255:  # Pq=1: 16-bit entries
            return bytes([0x10 | tid]) + zz.astype(">u2").tobytes()
        return bytes([tid]) + bytes(zz.tolist())

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, dqt_body(0, qt_l))
    if not gray:
        out += seg(0xDB, dqt_body(1, qt_c))
    comps = b""
    for ci in range(ncomp):
        samp = (sub[1] << 4) | sub[0] if ci == 0 else 0x11
        comps += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    sof_marker = 0xC0 if precision == 8 else 0xC1
    out += seg(sof_marker,
               struct.pack(">BHHB", precision, h, w, ncomp) + comps)
    for cls, tid, bits, vals in huff_segments:
        if gray and tid == 1:
            continue
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    scomp = b"".join(
        bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in range(ncomp)
    )
    out += seg(0xDA, bytes([ncomp]) + scomp + b"\x00\x3f\x00")
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2) — scan scripting over the SAME quantized
# coefficients as the baseline path, so cross-mode decodes are bit-equal.
# ---------------------------------------------------------------------------

# The Annex K AC tables have no EOBn (0x10..0xE0) symbols — those exist
# only in progressive mode — so progressive scans carry their own flat
# canonical tables: every symbol at one code length (incomplete prefix
# code, no all-ones code, T.81-legal).
_P_DC_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_P_DC_VALS = list(range(16))

# 12-bit sequential: DC categories reach 15 and AC sizes 14, beyond the
# Annex K tables' 11/10 — flat canonical tables (one code length,
# incomplete prefix code, no all-ones codeword) cover the full range;
# simpler than per-image optimization and T.81-legal
_DC12_BITS = [0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC12_VALS = list(range(16))
_AC12_VALS = ([0x00, 0xF0]
              + [(r << 4) | v for r in range(16) for v in range(1, 15)])
_AC12_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC12_VALS), 0, 0, 0, 0, 0, 0,
              0, 0]
_P_AC_VALS = (
    [r << 4 for r in range(15)]                     # EOB0..EOB14
    + [0xF0]                                        # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 15)]
)
_P_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_P_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def default_progressive_scans(ncomp: int):
    """libjpeg-style script: DC first at Al=1, per-component spectral
    bands at Al=2, then two successive-approximation refinement sweeps
    and the DC refinement."""
    comps = list(range(ncomp))
    script = [(comps, 0, 0, 0, 1)]
    for ci in comps:
        script += [([ci], 1, 5, 0, 2), ([ci], 6, 63, 0, 2)]
    for ci in comps:
        script.append(([ci], 1, 63, 2, 1))
    script.append((comps, 0, 0, 1, 0))
    for ci in comps:
        script.append(([ci], 1, 63, 1, 0))
    return script


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    scans=None,
) -> bytes:
    """Encode uint8 (H,W[,1|3]) → progressive JFIF (SOF2, Huffman).

    `scans` is a list of (component_indexes, Ss, Se, Ah, Al); the
    default script exercises spectral selection, EOB runs and both DC
    and AC successive-approximation refinement.
    """
    comp_blocks, sub, h, w, gray, qt_l, qt_c = _quantize_components(
        arr, quality, subsampling
    )
    ncomp = 1 if gray else 3
    if scans is None:
        scans = default_progressive_scans(ncomp)

    # frame metadata mirrors what the decoder reconstructs from SOF2
    comps_meta = []
    for ci in range(ncomp):
        hv = sub if ci == 0 else (1, 1)
        comps_meta.append(dict(id=ci + 1, h=hv[1], v=hv[0],
                               tq=0 if ci == 0 else 1))
    frame = dict(h=h, w=w, comps=comps_meta)
    hmax = max(c["h"] for c in comps_meta)
    vmax = max(c["v"] for c in comps_meta)
    n_mcu_x = -(-w // (8 * hmax))
    n_mcu_y = -(-h // (8 * vmax))

    dc_tab = _canonical_codes(_P_DC_BITS, _P_DC_VALS)
    ac_tab = _canonical_codes(_P_AC_BITS, _P_AC_VALS)

    def encode_scan(comp_idx, ss, se, ah, al):
        bw = _BitWriter()
        rst = 0

        def restart(units_done):
            nonlocal rst
            if restart_interval and units_done and (
                units_done % restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                return True
            return False

        # DC scans: a single-component (Ns=1) scan is decoded over the
        # component's TRUE ceil block grid (T.81 A.2.2 — see
        # _decode_scan_progressive), which for subsampled components can
        # be smaller than the MCU-padded allocation.  Walk the same
        # grid the decoder walks.
        def dc_units():
            if len(comp_idx) == 1:
                ci = comp_idx[0]
                c = comps_meta[ci]
                gh, gw = _comp_block_grid(frame, c)
                for by in range(gh):
                    for bx in range(gw):
                        yield [(ci, by, bx)]
            else:
                for my in range(n_mcu_y):
                    for mx in range(n_mcu_x):
                        blocks = []
                        for ci in comp_idx:
                            c = comps_meta[ci]
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    blocks.append((ci, my * c["v"] + by,
                                                   mx * c["h"] + bx))
                        yield blocks

        if ss == 0 and ah == 0:         # ---- DC first
            preds = [0] * ncomp
            for ui, blocks in enumerate(dc_units()):
                if restart(ui):
                    preds = [0] * ncomp
                for ci, by, bx in blocks:
                    zz = comp_blocks[ci][by, bx]
                    v = int(zz[0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    t = _bit_length(abs(diff))
                    code, ln = dc_tab[t]
                    bw.write(code, ln)
                    if t:
                        bw.write(diff if diff >= 0
                                 else diff + (1 << t) - 1, t)
        elif ss == 0:                   # ---- DC refinement: raw bits
            for ui, blocks in enumerate(dc_units()):
                restart(ui)
                for ci, by, bx in blocks:
                    zz = comp_blocks[ci][by, bx]
                    bw.write((int(zz[0]) >> al) & 1, 1)
        else:                           # ---- AC scans: one component
            (ci,) = comp_idx
            c = comps_meta[ci]
            bh, bwid = _comp_block_grid(frame, c)
            state = {"eobrun": 0, "be": []}

            def emit_eobrun():
                n = state["eobrun"]
                if n > 0:
                    r = n.bit_length() - 1
                    code, ln = ac_tab[r << 4]
                    bw.write(code, ln)
                    if r:
                        bw.write(n - (1 << r), r)
                    state["eobrun"] = 0
                for b in state["be"]:
                    bw.write(b, 1)
                state["be"] = []

            bi = 0
            for by in range(bh):
                for bx in range(bwid):
                    if restart_interval and bi and (
                        bi % restart_interval == 0
                    ):
                        emit_eobrun()
                        bw.flush()
                        bw.out += bytes([0xFF, 0xD0 + rst % 8])
                        rst += 1
                    bi += 1
                    zz = comp_blocks[ci][by, bx]
                    if ah == 0:         # first scan for this band
                        vals = []
                        for k in range(ss, se + 1):
                            cv = int(zz[k])
                            mag = abs(cv) >> al
                            vals.append(mag if cv >= 0 else -mag)
                        nz = [i for i, v in enumerate(vals) if v]
                        if not nz:
                            state["eobrun"] += 1
                            if state["eobrun"] == 0x7FFF:
                                emit_eobrun()
                            continue
                        r = 0
                        for i in range(nz[-1] + 1):
                            v = vals[i]
                            if v == 0:
                                r += 1
                                continue
                            emit_eobrun()
                            while r > 15:
                                code, ln = ac_tab[0xF0]
                                bw.write(code, ln)
                                r -= 16
                            t = _bit_length(abs(v))
                            code, ln = ac_tab[(r << 4) | t]
                            bw.write(code, ln)
                            bw.write(v if v >= 0 else v + (1 << t) - 1, t)
                            r = 0
                        if nz[-1] < se - ss:
                            state["eobrun"] += 1
                            if state["eobrun"] == 0x7FFF:
                                emit_eobrun()
                    else:               # refinement (G.1.2.3 encoder)
                        mags = [abs(int(zz[k])) >> al
                                for k in range(ss, se + 1)]
                        eob_i = -1
                        for i, m in enumerate(mags):
                            if m == 1:
                                eob_i = i
                        r = 0
                        br = []
                        for i, m in enumerate(mags):
                            if m == 0:
                                r += 1
                                continue
                            while r > 15 and i <= eob_i:
                                emit_eobrun()
                                code, ln = ac_tab[0xF0]
                                bw.write(code, ln)
                                r -= 16
                                for b in br:
                                    bw.write(b, 1)
                                br = []
                            if m > 1:
                                br.append(m & 1)
                                continue
                            emit_eobrun()
                            code, ln = ac_tab[(r << 4) | 1]
                            bw.write(code, ln)
                            bw.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
                            for b in br:
                                bw.write(b, 1)
                            br = []
                            r = 0
                        if r > 0 or br:
                            state["eobrun"] += 1
                            state["be"].extend(br)
                            if state["eobrun"] == 0x7FFF or (
                                len(state["be"]) > 900
                            ):
                                emit_eobrun()
            emit_eobrun()
        bw.flush()
        return bw.out

    # --- headers
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt_body(tid, qt):
        zz = qt.reshape(-1)[_ZIGZAG]
        if int(zz.max()) > 255:  # Pq=1: 16-bit entries
            return bytes([0x10 | tid]) + zz.astype(">u2").tobytes()
        return bytes([tid]) + bytes(zz.tolist())

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, dqt_body(0, qt_l))
    if not gray:
        out += seg(0xDB, dqt_body(1, qt_c))
    fcomps = b""
    for c in comps_meta:
        fcomps += bytes([c["id"], (c["h"] << 4) | c["v"],
                         0 if gray or c["id"] == 1 else 1])
    out += seg(0xC2, struct.pack(">BHHB", 8, h, w, ncomp) + fcomps)
    out += seg(0xC4, bytes([0x00]) + bytes(_P_DC_BITS) + bytes(_P_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(_P_AC_BITS) + bytes(_P_AC_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for comp_idx, ss, se, ah, al in scans:
        scomp = b"".join(bytes([comps_meta[ci]["id"], 0x00])
                         for ci in comp_idx)
        out += seg(0xDA, bytes([len(comp_idx)]) + scomp
                   + bytes([ss, se, (ah << 4) | al]))
        out += encode_scan(comp_idx, ss, se, ah, al)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline/extended-sequential/progressive JPEG →
    (H, W, C), uint8 for 8-bit frames, uint16 for 12-bit
    (C = 1 grayscale, 3 RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    progressive = False
    coefs = None                # progressive: accumulated across scans

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:      # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue            # standalone
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:      # DQT (possibly several tables)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                off += 1
                if pq == 0:
                    zz = np.frombuffer(body, np.uint8, 64, off)
                    off += 64
                else:
                    zz = np.frombuffer(body, ">u2", 64, off)
                    off += 128
                t = np.zeros(64, np.int32)
                t[_ZIGZAG] = zz
                qts[tq] = t.reshape(8, 8)
        elif marker == 0xC4:    # DHT (possibly several tables)
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                vals = list(body[off + 17:off + 17 + n])
                huff[(cls, tid)] = _HuffDecoder(bits, vals)
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit precision")
            if prec == 12 and marker == 0xC0:
                raise ValueError("12-bit requires SOF1/SOF2, not SOF0")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append(dict(id=cid, h=samp >> 4, v=samp & 0xF, tq=tq))
            frame = dict(h=fh, w=fw, comps=comps, prec=prec)
        elif marker in (0xC3, *range(0xC5, 0xC8),
                        *range(0xC9, 0xCC), *range(0xCD, 0xD0)):
            raise NotImplementedError(
                f"JPEG mode SOF{marker - 0xC0} (only baseline/extended"
                " sequential/progressive Huffman supported)"
            )
        elif marker == 0xDD:    # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:    # SOS — entropy data follows
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if not progressive:
                return _decode_scan(data, pos, frame, scan, qts, huff,
                                    restart_interval)
            if coefs is None:
                coefs = _alloc_coefs(frame)
            pos = _decode_scan_progressive(
                data, pos, frame, scan, qts, huff, restart_interval,
                coefs, ss, se, ahal >> 4, ahal & 0xF,
            )
    if progressive and coefs is not None:
        return _reconstruct(frame, coefs, qts)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, scan, qts, huff, restart_interval):
    if frame is None:
        raise ValueError("SOS before SOF")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    n_mcu_x = -(-w // mcu_w)
    n_mcu_y = -(-h // mcu_h)
    by_id = {c["id"]: c for c in comps}
    order = []  # (comp, dc_table, ac_table) per scan spec
    for cs, td, ta in scan:
        c = by_id[cs]
        order.append((c, huff[(0, td)], huff[(1, ta)]))
    if len(order) != len(comps):
        raise NotImplementedError("non-interleaved scans")

    coefs = {
        c["id"]: np.zeros(
            (n_mcu_y * c["v"], n_mcu_x * c["h"], 64), np.int32
        )
        for c in comps
    }
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_idx = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if (restart_interval and mcu_idx
                    and mcu_idx % restart_interval == 0):
                reader.align_to_marker()
                if data[reader.pos] != 0xFF or not (
                    0xD0 <= data[reader.pos + 1] <= 0xD7
                ):
                    raise ValueError("expected RST marker")
                reader.pos += 2
                preds = {c["id"]: 0 for c in comps}
            for c, dc_t, ac_t in order:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        t = dc_t.decode(reader)
                        diff = _extend(reader.receive(t), t) if t else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(reader)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coefs[c["id"]][my * c["v"] + by,
                                       mx * c["h"] + bx] = zz
            mcu_idx += 1

    return _reconstruct(frame, coefs, qts)


def _alloc_coefs(frame):
    """Per-component zigzag coefficient store at MCU-padded size."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    n_mcu_x = -(-frame["w"] // (8 * hmax))
    n_mcu_y = -(-frame["h"] // (8 * vmax))
    return {
        c["id"]: np.zeros((n_mcu_y * c["v"], n_mcu_x * c["h"], 64), np.int32)
        for c in comps
    }


def _comp_block_grid(frame, c):
    """(blocks_y, blocks_x) a NON-interleaved scan covers for component
    `c`: ceil of the component's true sample dims (T.81 A.2.2), which
    is ≤ the MCU-padded allocation."""
    hmax = max(k["h"] for k in frame["comps"])
    vmax = max(k["v"] for k in frame["comps"])
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _expect_rst(reader, data):
    reader.align_to_marker()
    if data[reader.pos] != 0xFF or not (
        0xD0 <= data[reader.pos + 1] <= 0xD7
    ):
        raise ValueError("expected RST marker")
    reader.pos += 2


def _decode_scan_progressive(data, pos, frame, scan, qts, huff,
                             restart_interval, coefs, ss, se, ah, al):
    """One progressive scan (T.81 G.1.2): DC first/refine (interleaved
    or single-component), AC first/refine with EOB runs.  Mutates
    `coefs` in place; returns the stream offset of the next marker."""
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    reader = _BitReader(data, pos)

    if ss == 0:                       # ---- DC scan
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        order = [(by_id[cs], huff.get((0, td))) for cs, td, _ in scan]
        preds = {c["id"]: 0 for c, _ in order}
        if len(order) > 1:
            # interleaved MCU walk (the usual progressive DC scan)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            n_mcu_x = -(-frame["w"] // (8 * hmax))
            n_mcu_y = -(-frame["h"] // (8 * vmax))
            units = []
            for my in range(n_mcu_y):
                for mx in range(n_mcu_x):
                    blocks = []
                    for c, dc_t in order:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blocks.append((c, dc_t,
                                               my * c["v"] + by,
                                               mx * c["h"] + bx))
                    units.append(blocks)
        else:
            c, dc_t = order[0]
            bh, bw = _comp_block_grid(frame, c)
            units = [[(c, dc_t, by, bx)]
                     for by in range(bh) for bx in range(bw)]
        for ui, blocks in enumerate(units):
            if restart_interval and ui and ui % restart_interval == 0:
                _expect_rst(reader, data)
                preds = {k: 0 for k in preds}
            for c, dc_t, by, bx in blocks:
                zz = coefs[c["id"]][by, bx]
                if ah == 0:           # first scan
                    t = dc_t.decode(reader)
                    diff = _extend(reader.receive(t), t) if t else 0
                    preds[c["id"]] += diff
                    zz[0] = preds[c["id"]] << al
                else:                 # refinement: one bit, OR'd in
                    if reader.read_bit():
                        zz[0] |= 1 << al
    else:                             # ---- AC scan: single component
        if len(scan) != 1:
            raise ValueError("interleaved AC scan in progressive mode")
        cs, _, ta = scan[0]
        c = by_id[cs]
        ac_t = huff[(1, ta)]
        bh, bw = _comp_block_grid(frame, c)
        eobrun = 0
        p1, m1 = 1 << al, -(1 << al)
        bi = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and bi and bi % restart_interval == 0:
                    _expect_rst(reader, data)
                    eobrun = 0
                bi += 1
                zz = coefs[c["id"]][by, bx]
                if ah == 0:           # ---- first scan for this band
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = ac_t.decode(reader)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += reader.receive(r)
                                break
                            k += 16   # ZRL
                        else:
                            k += r
                            if k > se:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.receive(s), s) << al
                            k += 1
                else:                 # ---- refinement (G.1.2.3)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = ac_t.decode(reader)
                            r, s = rs >> 4, rs & 0xF
                            sval = 0
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.receive(r)
                                    break
                                # r == 15: run of 16 zero-history coefs
                            else:
                                sval = p1 if reader.read_bit() else m1
                            while k <= se:
                                if zz[k] != 0:
                                    if reader.read_bit() and not (
                                        zz[k] & p1
                                    ):
                                        zz[k] += p1 if zz[k] >= 0 else m1
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if sval and k <= se:
                                zz[k] = sval
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if zz[k] != 0:
                                if reader.read_bit() and not (zz[k] & p1):
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            k += 1
                        eobrun -= 1

    # Skip to the next true marker (tolerate pad bits / stray RSTs).
    p = reader.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return p


def _reconstruct(frame, coefs, qts):
    """Batched dequant + IDCT + reassembly per component (shared by
    the sequential and progressive paths)."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    prec = frame.get("prec", 8)
    shift = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    out_dt = np.uint8 if prec == 8 else np.uint16
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qts[c["tq"]]
        zz = coefs[c["id"]]
        raster = np.zeros_like(zz)
        raster[:, :, _ZIGZAG] = zz
        blocks = raster.reshape(*zz.shape[:2], 8, 8).astype(np.float64)
        blocks *= q
        pix = np.einsum("xu,ijuv,yv->ijxy", _C.T, blocks, _C.T)
        plane = _from_blocks(pix) + shift
        # upsample to full resolution (sample replication)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return (np.clip(np.round(planes[0]), 0, maxv)
                .astype(out_dt)[:, :, None])
    if len(planes) == 3:
        return _ycbcr_to_rgb(np.stack(planes, axis=-1), prec)
    raise NotImplementedError(f"{len(planes)}-component scan")
