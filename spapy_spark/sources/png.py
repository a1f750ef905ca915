"""From-scratch PNG codec (stdlib ``zlib`` + numpy — no PIL).

Fills the real-codec seam in operators/multimodal.py (the reference
delegates raster/image IO to GDAL/PIL; this engine reads its own
formats — same spirit as sources/geotiff.py).

Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette — PLTE
+ optional tRNS, decoded to RGB/RGBA), 6 (RGBA); all five filter
types (None/Sub/Up/Average/Paeth) are decoded, and the encoder can
apply any fixed filter per row (used by tests to exercise every
reverse-filter path).  Adam7 interlacing is supported in BOTH
directions: each of the 7 passes is an independently-filtered
sub-image (per the spec the filter "prior" row resets at every pass
boundary), so interlaced and sequential encodes of one image decode
bit-equal — tests assert exactly that.  16-bit depth is supported for
gray/RGB/RGBA (PNG filters are byte-wise regardless of depth, so the
same defilter kernels run with a 2-byte-per-sample pixel width; the
decoder returns uint16, big-endian per spec).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}

# Adam7 pass lattice: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=up-left)."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _filter_rows(rows: np.ndarray, c: int, filter_type: int) -> bytes:
    """Apply one fixed filter to every row of a (h, w*c) uint8 image
    (a whole image, or one Adam7 pass — the prior row starts at zero
    either way, per spec)."""
    h, stride = rows.shape
    prior = np.zeros(stride, dtype=np.uint8)
    out_rows = []
    for y in range(h):
        raw = rows[y]
        if filter_type == 0:
            f = raw
        elif filter_type == 1:  # Sub
            left = np.zeros_like(raw)
            left[c:] = raw[:-c]
            f = raw - left
        elif filter_type == 2:  # Up
            f = raw - prior
        elif filter_type == 3:  # Average
            left = np.zeros_like(raw)
            left[c:] = raw[:-c]
            f = raw - (
                (left.astype(np.uint16) + prior.astype(np.uint16)) // 2
            ).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            left = np.zeros_like(raw)
            left[c:] = raw[:-c]
            ul = np.zeros_like(raw)
            ul[c:] = prior[:-c]
            f = raw - _paeth(left, prior, ul)
        else:
            raise ValueError(f"bad filter type {filter_type}")
        out_rows.append(bytes([filter_type]) + f.tobytes())
        prior = raw
    return b"".join(out_rows)


def _defilter_rows(
    raw: bytes, off: int, h: int, w: int, c: int
) -> tuple[np.ndarray, int]:
    """Reverse-filter ``h`` rows of width ``w`` starting at byte
    ``off`` of the decompressed stream; returns ((h, w*c) array, next
    offset).  One call per image — or per Adam7 pass, since each pass
    filters independently."""
    stride = w * c
    need = h * (stride + 1)
    if off + need > len(raw):
        raise ValueError("IDAT size mismatch")
    buf = np.frombuffer(raw, dtype=np.uint8, count=need, offset=off)
    buf = buf.reshape(h, stride + 1)
    ftypes = buf[:, 0]
    rows = buf[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = ftypes[y]
        raw_r = rows[y]
        if ft == 0:
            rec = raw_r.copy()
        elif ft == 1:  # Sub: per-channel prefix sum mod 256
            rec = raw_r.reshape(w, c).cumsum(axis=0, dtype=np.int64)
            rec = (rec & 0xFF).astype(np.uint8).reshape(stride)
        elif ft == 2:  # Up
            rec = raw_r + prior
        elif ft == 3:  # Average (left-sequential per pixel)
            rec = np.empty(stride, dtype=np.uint8)
            rec[:c] = raw_r[:c] + (prior[:c] // 2)
            for x in range(c, stride, c):
                rec[x : x + c] = raw_r[x : x + c] + (
                    (
                        rec[x - c : x].astype(np.uint16)
                        + prior[x : x + c].astype(np.uint16)
                    )
                    // 2
                ).astype(np.uint8)
        elif ft == 4:  # Paeth (left-sequential per pixel)
            rec = np.empty(stride, dtype=np.uint8)
            zero = np.zeros(c, dtype=np.uint8)
            rec[:c] = raw_r[:c] + _paeth(zero, prior[:c], zero)
            for x in range(c, stride, c):
                rec[x : x + c] = raw_r[x : x + c] + _paeth(
                    rec[x - c : x], prior[x : x + c], prior[x - c : x]
                )
        else:
            raise ValueError(f"bad filter type {ft}")
        out[y] = rec
        prior = rec
    return out, off + need


def _pass_dims(w: int, h: int) -> list[tuple[int, int, int, int, int, int]]:
    """Non-empty Adam7 passes as (x0, y0, dx, dy, pass_w, pass_h)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            out.append((x0, y0, dx, dy, pw, ph))
    return out


def encode_png(
    arr: np.ndarray, filter_type: int = 0, interlace: bool = False
) -> bytes:
    """uint8 or uint16 (H,W) / (H,W,1) / (H,W,3) / (H,W,4) → PNG
    bytes (uint16 input writes 16-bit depth, big-endian samples).

    ``filter_type`` applies one fixed filter to every row (0..4);
    type 0 is the fast default, the others exist so decoders can be
    tested against real filtered streams.  ``interlace=True`` writes
    Adam7: seven independently-filtered passes over the same pixels."""
    a = np.asarray(arr)
    depth = 16 if a.dtype == np.uint16 else 8
    a = a.astype(">u2" if depth == 16 else np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in (1, 3, 4):
        raise ValueError(f"unsupported channel count {c}")
    bpp = c * (depth // 8)  # PNG filters act on bytes
    color = _COLOR_TYPE[c]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, int(interlace))
    if not interlace:
        rows = np.ascontiguousarray(a).view(np.uint8).reshape(h, w * bpp)
        body = _filter_rows(rows, bpp, filter_type)
    else:
        parts = []
        for x0, y0, dx, dy, pw, ph in _pass_dims(w, h):
            sub = np.ascontiguousarray(a[y0::dy, x0::dx, :])
            parts.append(
                _filter_rows(
                    sub.view(np.uint8).reshape(ph, pw * bpp), bpp,
                    filter_type,
                )
            )
        body = b"".join(parts)
    idat = zlib.compress(body, 6)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    trns: np.ndarray | None = None,
    filter_type: int = 0,
) -> bytes:
    """(H, W) uint8 palette indices + (n, 3) uint8 palette (+ optional
    (n,) alpha) → color-type-3 PNG.  Exists so the paletted decode
    path is tested against real PLTE/tRNS streams."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("indices must be (H, W), palette (n, 3)")
    if idx.max(initial=0) >= len(pal):
        raise ValueError("index out of palette range")
    h, w = idx.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    body = _filter_rows(idx.reshape(h, w), 1, filter_type)
    chunks = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        chunks += _chunk(b"tRNS", np.asarray(trns, np.uint8).tobytes())
    chunks += _chunk(b"IDAT", zlib.compress(body, 6)) + _chunk(b"IEND", b"")
    return chunks


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 (H, W, C) array (C ∈ {1, 3, 4}); paletted
    images come back expanded to RGB (or RGBA when tRNS is present)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    plte = None
    trns = None
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth not in (8, 16) or comp != 0 or filt != 0:
        raise NotImplementedError(f"depth={depth} comp={comp} filt={filt}")
    if interlace not in (0, 1):
        raise ValueError(f"bad interlace method {interlace}")
    if color == 3:
        if depth != 8:
            raise NotImplementedError("16-bit palette is not valid PNG")
        if plte is None:
            raise ValueError("paletted PNG without PLTE")
        c = 1  # filtering operates on the index plane
    else:
        c = _CHANNELS.get(color)
        if c is None:
            raise NotImplementedError(f"color type {color}")
    bpp = c * (depth // 8)  # filters are byte-wise at any depth
    raw = zlib.decompress(b"".join(idat))
    if interlace == 0:
        out, off = _defilter_rows(raw, 0, h, w, bpp)
        if off != len(raw):
            raise ValueError("IDAT size mismatch")
        img = out.reshape(h, w, bpp)
    else:
        # Adam7: each pass defilters independently, then scatters onto
        # the output lattice
        img = np.empty((h, w, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy, pw, ph in _pass_dims(w, h):
            rows, off = _defilter_rows(raw, off, ph, pw, bpp)
            img[y0::dy, x0::dx, :] = rows.reshape(ph, pw, bpp)
        if off != len(raw):
            raise ValueError("IDAT size mismatch")
    if depth == 16:
        return (
            np.frombuffer(np.ascontiguousarray(img).tobytes(), dtype=">u2")
            .reshape(h, w, c)
            .astype(np.uint16)
        )
    if color != 3:
        return img
    idx = img[:, :, 0]
    if idx.max(initial=0) >= len(plte):
        raise ValueError("palette index out of range")
    rgb = plte[idx]
    if trns is None:
        return rgb
    # spec: tRNS may be shorter than PLTE; missing entries are opaque
    alpha = np.full(len(plte), 255, dtype=np.uint8)
    alpha[: len(trns)] = trns
    return np.dstack([rgb, alpha[idx]])
