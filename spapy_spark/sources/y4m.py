"""From-scratch YUV4MPEG2 (.y4m) video container codec — the video
half of the multimodal mandate.  Y4M is the uncompressed planar-YUV
interchange format every ffmpeg/mjpegtools pipeline speaks; it is a
pure stdlib parse (an ASCII header line, then ``FRAME\\n`` markers
each followed by raw Y, U, V planes), which makes it the honest
from-scratch choice where a compressed codec (H.264 …) would need a
real decoder stack.

Scope: C420 (and its jpeg/mpeg2/paldv siting variants — byte layout
is identical), C422, C444, and Cmono color modes; any size/framerate;
per-frame parameter strings tolerated.  Frames decode to
``(y, u, v)`` uint8 planes (u/v ``None`` for mono).

The reference has no video path (SpaPy is geospatial); this serves
the driver's multimodal-pipeline mandate — frame_sample in
operators/multimodal.py dispatches on the ``YUV4MPEG2`` magic.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def _plane_dims(colorspace: str, w: int, h: int):
    c = colorspace or "420jpeg"
    if c.startswith("420"):
        return (w // 2, h // 2)
    if c.startswith("422"):
        return (w // 2, h)
    if c.startswith("444"):
        return (w, h)
    if c.startswith("mono"):
        return (0, 0)
    raise NotImplementedError(f"Y4M colorspace C{c}")


def parse_header(payload: bytes) -> tuple[dict, int]:
    """Parse the stream header line → (params, offset past newline).
    Params: width, height, fps (float), colorspace (str)."""
    if payload[: len(_MAGIC)] != _MAGIC:
        raise ValueError(f"not a Y4M payload ({payload[:9]!r})")
    nl = payload.index(b"\n")
    params: dict = {"colorspace": "420jpeg", "fps": 0.0}
    for tok in payload[len(_MAGIC):nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            params["width"] = int(val)
        elif tag == "H":
            params["height"] = int(val)
        elif tag == "F":
            num, den = val.split(":")
            params["fps"] = float(num) / float(den)
        elif tag == "C":
            params["colorspace"] = val
    if "width" not in params or "height" not in params:
        raise ValueError("Y4M header missing W/H")
    return params, nl + 1


def decode_y4m(payload: bytes, every_n: int = 1, limit: int | None = None):
    """Y4M bytes → (params, [(y, u, v), …]) keeping every ``every_n``-th
    frame (u/v are ``None`` for mono).  Skipped frames are seeked over
    by size, not decoded — sampling a 1000-frame payload at every_n=100
    touches 10 frames' bytes."""
    params, pos = parse_header(payload)
    w, h = params["width"], params["height"]
    cw, ch = _plane_dims(params["colorspace"], w, h)
    ysz, csz = w * h, cw * ch
    fsz = ysz + 2 * csz
    frames = []
    idx = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        nl = payload.index(b"\n", pos)
        pos = nl + 1
        if idx % every_n == 0 and (limit is None or len(frames) < limit):
            y = np.frombuffer(payload, np.uint8, ysz, pos).reshape(h, w)
            if csz:
                u = np.frombuffer(
                    payload, np.uint8, csz, pos + ysz).reshape(ch, cw)
                v = np.frombuffer(
                    payload, np.uint8, csz, pos + ysz + csz).reshape(ch, cw)
            else:
                u = v = None
            frames.append((y, u, v))
        pos += fsz
        idx += 1
    params["n_frames"] = idx
    return params, frames


def encode_y4m(frames, fps: float = 25.0, colorspace: str = "420jpeg") -> bytes:
    """[(y, u, v), …] uint8 planes → Y4M bytes (inverse of decode)."""
    if not frames:
        raise ValueError("no frames")
    y0 = frames[0][0]
    h, w = y0.shape
    cw, ch = _plane_dims(colorspace, w, h)
    num = int(round(fps * 1000))
    head = (f"YUV4MPEG2 W{w} H{h} F{num}:1000 Ip A1:1 "
            f"C{colorspace}\n").encode("ascii")
    out = [head]
    for y, u, v in frames:
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(y, dtype=np.uint8).tobytes())
        if cw:
            for p in (u, v):
                a = np.ascontiguousarray(p, dtype=np.uint8)
                if a.shape != (ch, cw):
                    raise ValueError(
                        f"chroma plane {a.shape} != {(ch, cw)}")
                out.append(a.tobytes())
    return b"".join(out)


def yuv_to_rgb(y: np.ndarray, u: np.ndarray | None,
               v: np.ndarray | None) -> np.ndarray:
    """BT.601 full-range YUV → (H, W, 3) uint8 (chroma upsampled by
    nearest — matches the JPEG codec's convention in sources/jpeg.py).
    Mono → gray replicated."""
    h, w = y.shape
    yf = y.astype(np.float32)
    if u is None:
        return np.repeat(yf.astype(np.uint8)[:, :, None], 3, axis=2)
    ry = h // u.shape[0]
    rx = w // u.shape[1]
    uf = np.repeat(np.repeat(u, ry, 0), rx, 1)[:h, :w].astype(np.float32)
    vf = np.repeat(np.repeat(v, ry, 0), rx, 1)[:h, :w].astype(np.float32)
    cb, cr = uf - 128.0, vf - 128.0
    r = yf + 1.402 * cr
    g = yf - 0.344136 * cb - 0.714136 * cr
    b = yf + 1.772 * cb
    return np.clip(np.stack([r, g, b], 2), 0, 255).astype(np.uint8)
