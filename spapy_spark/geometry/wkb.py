"""Minimal WKB (well-known binary) codec, numpy-backed.

Geometry model is GeoJSON-shaped with numpy leaf arrays:

- ``("Point", (2,) float64)``            — stored as dict {"type","coordinates"}
- ``("LineString", (N,2))``
- ``("Polygon", [ring0 (N,2), hole1 …])`` — ring0 exterior, CCW not enforced
- ``("MultiPoint", (N,2))``
- ``("MultiLineString", [(N,2), …])``
- ``("MultiPolygon", [[rings], …])``

Covers the reference's layer types (/root/reference/SpaVectors.py:9-12,
285-312) including its Polygon→MultiPolygon promotion rule, exposed here
as :func:`promote_multi` (/root/reference/SpaVectors.py:308-309,659-663).

WKB is always emitted little-endian (byte order 1); both byte orders are
accepted on read.  Coordinate payloads are decoded with
``np.frombuffer`` — one numpy call per ring, no per-coordinate Python.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}
_CODES = {v: k for k, v in _TYPES.items()}


def _coords(arr) -> np.ndarray:
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 1:
        a = a.reshape(1, 2)
    return a


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _enc_ring(a: np.ndarray) -> bytes:
    a = _coords(a)
    return struct.pack("<I", a.shape[0]) + a.astype("<f8").tobytes()


def dumps(geom: dict) -> bytes:
    """GeoJSON-shaped dict → WKB bytes (little-endian)."""
    t = geom["type"]
    c = geom["coordinates"]
    head = struct.pack("<bI", 1, _CODES[t])
    if t == "Point":
        a = np.asarray(c, dtype=np.float64).reshape(2)
        return head + a.astype("<f8").tobytes()
    if t in ("LineString", "MultiPoint"):
        return head + _enc_ring(c)
    if t == "Polygon":
        body = struct.pack("<I", len(c)) + b"".join(_enc_ring(r) for r in c)
        return head + body
    if t == "MultiLineString":
        parts = [dumps({"type": "LineString", "coordinates": r}) for r in c]
        return head + struct.pack("<I", len(parts)) + b"".join(parts)
    if t == "MultiPolygon":
        parts = [dumps({"type": "Polygon", "coordinates": p}) for p in c]
        return head + struct.pack("<I", len(parts)) + b"".join(parts)
    if t == "GeometryCollection":
        parts = [dumps(g) for g in c]
        return head + struct.pack("<I", len(parts)) + b"".join(parts)
    raise ValueError(f"unsupported geometry type {t!r}")


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def _rd_u32(buf: bytes, off: int, bo: str) -> tuple[int, int]:
    return struct.unpack_from(bo + "I", buf, off)[0], off + 4


def _rd_ring(buf: bytes, off: int, bo: str) -> tuple[np.ndarray, int]:
    n, off = _rd_u32(buf, off, bo)
    dt = "<f8" if bo == "<" else ">f8"
    a = np.frombuffer(buf, dtype=dt, count=2 * n, offset=off).reshape(n, 2)
    return a.astype(np.float64, copy=False), off + 16 * n


def _loads_at(buf: bytes, off: int) -> tuple[dict, int]:
    byte_order = buf[off]
    bo = "<" if byte_order == 1 else ">"
    code, off = _rd_u32(buf, off + 1, bo)
    code = code & 0xFF  # strip any SRID/dimension flag bits (2D only)
    t = _TYPES[code]
    if t == "Point":
        dt = "<f8" if bo == "<" else ">f8"
        a = np.frombuffer(buf, dtype=dt, count=2, offset=off)
        return {"type": t, "coordinates": a.astype(np.float64, copy=False)}, off + 16
    if t in ("LineString", "MultiPoint"):
        a, off = _rd_ring(buf, off, bo)
        return {"type": t, "coordinates": a}, off
    if t == "Polygon":
        nr, off = _rd_u32(buf, off, bo)
        rings = []
        for _ in range(nr):
            r, off = _rd_ring(buf, off, bo)
            rings.append(r)
        return {"type": t, "coordinates": rings}, off
    if t in ("MultiLineString", "MultiPolygon", "GeometryCollection"):
        np_, off = _rd_u32(buf, off, bo)
        parts = []
        for _ in range(np_):
            g, off = _loads_at(buf, off)
            parts.append(g)
        if t == "MultiLineString":
            return {"type": t, "coordinates": [g["coordinates"] for g in parts]}, off
        if t == "MultiPolygon":
            return {"type": t, "coordinates": [g["coordinates"] for g in parts]}, off
        return {"type": t, "coordinates": parts}, off
    raise ValueError(f"unsupported WKB code {code}")


def loads(buf: bytes) -> dict:
    """WKB bytes → GeoJSON-shaped dict with numpy leaf arrays."""
    g, _ = _loads_at(bytes(buf), 0)
    return g


# ---------------------------------------------------------------------------
# Convenience constructors / reference semantics
# ---------------------------------------------------------------------------


def point(x: float, y: float) -> dict:
    return {"type": "Point", "coordinates": np.array([x, y], dtype=np.float64)}


def polygon(exterior, holes=()) -> dict:
    rings = [_close_ring(_coords(exterior))] + [_close_ring(_coords(h)) for h in holes]
    return {"type": "Polygon", "coordinates": rings}


def box(minx: float, miny: float, maxx: float, maxy: float) -> dict:
    return polygon(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
    )


_BOX_WKB_HDR = np.frombuffer(
    bytes([1, 3, 0, 0, 0, 1, 0, 0, 0, 5, 0, 0, 0]), dtype=np.uint8
)


def dumps_boxes(b: np.ndarray) -> list[bytes]:
    """Batch twin of ``dumps(box(...))`` for (n, 4) [minx, miny, maxx,
    maxy] rows — byte-identical output, one header stamp + one coord
    view instead of n per-ring encodes (fixture/bbox layers are built
    by the hundred-thousand)."""
    b = np.asarray(b, dtype=np.float64)
    m = len(b)
    out = np.empty((m, 13 + 80), dtype=np.uint8)
    out[:, :13] = _BOX_WKB_HDR
    ring = np.empty((m, 5, 2), dtype="<f8")
    ring[:, 0, 0] = b[:, 0]; ring[:, 0, 1] = b[:, 1]
    ring[:, 1, 0] = b[:, 2]; ring[:, 1, 1] = b[:, 1]
    ring[:, 2, 0] = b[:, 2]; ring[:, 2, 1] = b[:, 3]
    ring[:, 3, 0] = b[:, 0]; ring[:, 3, 1] = b[:, 3]
    ring[:, 4, 0] = b[:, 0]; ring[:, 4, 1] = b[:, 1]
    out[:, 13:] = ring.reshape(m, -1).view(np.uint8)
    return [r.tobytes() for r in out]


def _close_ring(a: np.ndarray) -> np.ndarray:
    if not np.array_equal(a[0], a[-1]):
        a = np.vstack([a, a[:1]])
    return a


def promote_multi(geom: dict) -> dict:
    """Reference type-promotion: Polygon→MultiPolygon, LineString→
    MultiLineString (/root/reference/SpaVectors.py:308-309,659-663)."""
    t = geom["type"]
    if t == "Polygon":
        return {"type": "MultiPolygon", "coordinates": [geom["coordinates"]]}
    if t == "LineString":
        return {"type": "MultiLineString", "coordinates": [geom["coordinates"]]}
    return geom


def polygons_of(geom: dict):
    """Iterate the polygon parts (each a list of rings) of a (Multi)Polygon."""
    if geom["type"] == "Polygon":
        yield geom["coordinates"]
    elif geom["type"] == "MultiPolygon":
        yield from geom["coordinates"]
    else:
        raise ValueError(f"not a polygonal geometry: {geom['type']}")


__all__ = [
    "dumps",
    "loads",
    "point",
    "polygon",
    "box",
    "promote_multi",
    "polygons_of",
]
