"""From-scratch GIF87a/GIF89a decoder — stdlib + numpy, no PIL.

Scope: global and local color tables, full LZW decompression with
table resets and 12-bit code growth, interlaced images, multi-frame
animations with Graphic Control Extension handling (transparency
index; disposal methods 1 "leave" and 2 "restore to background"),
and an encoder (single frame, 8-bit palette built by exact color
dedup, no dithering) for test fixtures.

GIF is the one legacy container a web crawl still carries in volume;
this closes the ``GIF8`` branch of the multimodal decode dispatch
(operators/multimodal.py).  The reference delegates image IO to PIL
(SpaView.py:50).
"""

from __future__ import annotations

import struct

import numpy as np


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos → (data, new_pos)."""
    out = []
    while True:
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(out), pos
        out.append(payload[pos : pos + n])
        pos += n


def _lzw_decode(data: bytes, min_code_size: int) -> np.ndarray:
    """GIF-variant LZW → uint8 index stream."""
    clear = 1 << min_code_size
    end = clear + 1
    # bit reader: little-endian, LSB-first within the byte stream
    bits = np.unpackbits(
        np.frombuffer(data, np.uint8)[:, None], axis=1, bitorder="little"
    ).ravel()
    nbits = len(bits)
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = []
    prev: bytes | None = None
    pos = 0
    while pos + code_size <= nbits:
        code = int(bits[pos : pos + code_size] @ (1 << np.arange(code_size)))
        pos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"bad LZW code {code} (table {len(table)})")
        out.append(entry)
        prev = entry
        if len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
    return np.frombuffer(b"".join(out), np.uint8)


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    rows = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])
    out[rows] = idx
    return out


def decode_gif(payload: bytes, limit: int | None = None):
    """GIF bytes → (params, [frame, …]) where each frame is the fully
    composed (H, W, 3) uint8 RGB canvas after that image is drawn.
    params: width, height, n_frames."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError(f"not a GIF payload ({payload[:6]!r})")
    w, h, packed, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    background = canvas.copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    n_frames = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # Graphic Control
                flags = data[0]
                disposal = (flags >> 2) & 0x7
                transparent = data[3] if flags & 0x1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x} at {pos - 1}")
        left, top, fw, fh, ipack = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if ipack & 0x80:
            n = 2 << (ipack & 0x07)
            pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image with no color table")
        mcs = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        n_frames += 1
        if limit is not None and len(frames) >= limit:
            continue  # keep counting frames, skip the pixel work
        idx = _lzw_decode(data, mcs)[: fw * fh].reshape(fh, fw)
        if ipack & 0x40:
            idx = _deinterlace(idx)
        region = canvas[top : top + fh, left : left + fw]
        px = pal[idx]
        if transparent is not None:
            keep = idx == transparent
            px = np.where(keep[:, :, None], region, px)
        before = region.copy()
        canvas[top : top + fh, left : left + fw] = px
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background
            canvas[top : top + fh, left : left + fw] = background[
                top : top + fh, left : left + fw]
        elif disposal == 3:  # restore to previous
            canvas[top : top + fh, left : left + fw] = before
        transparent = None
        disposal = 0
    return {"width": w, "height": h, "n_frames": n_frames}, frames


def _lzw_encode(idx: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    outbits: list[tuple[int, int]] = [(clear, code_size)]
    buf = b""
    for b in idx.tobytes():
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        outbits.append((table[buf], code_size))
        table[cand] = next_code
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        next_code += 1
        if next_code > 4096:
            outbits.append((clear, code_size))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        buf = bytes([b])
    if buf:
        outbits.append((table[buf], code_size))
    outbits.append((end, code_size))
    acc = val = 0
    out = bytearray()
    for code, sz in outbits:
        val |= code << acc
        acc += sz
        while acc >= 8:
            out.append(val & 0xFF)
            val >>= 8
            acc -= 8
    if acc:
        out.append(val & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 with ≤256 distinct colors → single-frame GIF89a."""
    a = np.asarray(img, dtype=np.uint8)
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"{len(pal)} colors > 256 (no quantizer by design)")
    depth = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    n = 1 << depth
    table = np.zeros((n, 3), np.uint8)
    table[: len(pal)] = pal
    idx = inv.astype(np.uint8).reshape(h, w)
    mcs = max(2, depth)
    lzw = _lzw_encode(idx.ravel(), mcs)
    blocks = b"".join(
        bytes([min(255, len(lzw) - i)]) + lzw[i : i + 255]
        for i in range(0, len(lzw), 255)
    )
    return (b"GIF89a"
            + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
            + table.tobytes()
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
            + bytes([mcs]) + blocks + b"\x00" + b"\x3b")
