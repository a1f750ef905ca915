"""From-scratch Windows BMP codec — same pattern as sources/png.py:
stdlib struct + numpy, no PIL.

Scope: BITMAPFILEHEADER + BITMAPINFOHEADER (or the larger V4/V5
headers, which only append fields), uncompressed BI_RGB pixels at
8-bit (paletted), 24-bit BGR, and 32-bit BGRA depths; bottom-up and
top-down row order; 4-byte row padding.  RLE compression raises — a
crawl's BMPs are overwhelmingly BI_RGB.

The reference delegates all image IO to PIL (SpaView.py:50); this
exists for the multimodal decode dispatch in operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

_BI_RGB = 0


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes → (H, W, 3|4) uint8 (RGB, or RGBA for 32-bit)."""
    if payload[:2] != b"BM":
        raise ValueError(f"not a BMP payload ({payload[:2]!r})")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_sz,) = struct.unpack_from("<I", payload, 14)
    if hdr_sz < 40:
        raise NotImplementedError(f"BMP core header size {hdr_sz}")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (comp,) = struct.unpack_from("<I", payload, 30)
    (clr_used,) = struct.unpack_from("<I", payload, 46)
    if comp != _BI_RGB:
        raise NotImplementedError(f"BMP compression {comp}")
    top_down = h_raw < 0
    h = abs(h_raw)
    if bpp == 8:
        n_pal = clr_used or 256
        pal = np.frombuffer(
            payload, np.uint8, n_pal * 4, 14 + hdr_sz
        ).reshape(n_pal, 4)[:, [2, 1, 0]]  # BGRX → RGB
        stride = (w + 3) & ~3
        rows = np.frombuffer(payload, np.uint8, stride * h, data_off)
        idx = rows.reshape(h, stride)[:, :w]
        img = pal[idx]
    elif bpp in (24, 32):
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        rows = np.frombuffer(payload, np.uint8, stride * h, data_off)
        px = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
        img = px[:, :, [2, 1, 0, 3] if nb == 4 else [2, 1, 0]]
    else:
        raise NotImplementedError(f"BMP bit depth {bpp}")
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP bytes."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3), got {a.shape}")
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = a[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    data = rows.tobytes()
    off = 14 + 40
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, _BI_RGB,
                       len(data), 2835, 2835, 0, 0)
    return head + info + data
