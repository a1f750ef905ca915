"""From-scratch ESRI Shapefile reader (.shp geometry + .dbf attributes).

The reference loads vectors with Fiona/GDAL (/root/reference/
SpaVectors.py:195-222); neither is available here, and the engine's
canonical storage is parquet — so this reader exists to ingest legacy
shapefiles into feature tables (`to_spark` → WKB geometry column +
native-typed attribute columns, mirroring SpaPy's inferred schema
semantics, SpaVectors.py:209-210 and the int/float/str attribute model
SpaVectors.py:400-423).

Format notes (ESRI whitepaper, public spec):
- .shp: 100-byte header (big-endian file code 9994, little-endian
  shape type + bbox), then records of (BE recnum, BE length-in-words)
  + LE content.  Shape types handled: 0 null, 1/11/21 point,
  3/13/23 polyline, 5/15/25 polygon, 8/18/28 multipoint (Z/M payloads
  skipped — 2D engine).
- polygon ring grouping: clockwise ring = exterior, counter-clockwise
  = hole, assigned to the exterior containing its first vertex
  (GDAL's organizePolygons "first containing" heuristic).
- .dbf: 32-byte field descriptors (name, type C/N/F/L/D, length,
  decimals); N with decimals>0 and F → float, N else → int, others →
  str.  cp1252 text.

Driver-side parse (reference shapefiles are small); the scale path for
huge shapefiles is .shx-offset partitioning + mapInPandas — but at
engine scale the answer is "convert to parquet once", which this
module is for.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from ..geometry import kernels, wkb

_POINT = {1, 11, 21}
_POLYLINE = {3, 13, 23}
_POLYGON = {5, 15, 25}
_MULTIPOINT = {8, 18, 28}


def _read_shp(path: str) -> list[dict | None]:
    with open(path, "rb") as f:
        buf = f.read()
    (code,) = struct.unpack_from(">i", buf, 0)
    if code != 9994:
        raise ValueError(f"{path}: not a shapefile (code {code})")
    (file_words,) = struct.unpack_from(">i", buf, 24)
    end = file_words * 2
    geoms: list[dict | None] = []
    off = 100
    while off < end:
        _recno, words = struct.unpack_from(">ii", buf, off)
        off += 8
        content = off
        (stype,) = struct.unpack_from("<i", buf, content)
        if stype == 0:
            geoms.append(None)
        elif stype in _POINT:
            x, y = struct.unpack_from("<dd", buf, content + 4)
            geoms.append(wkb.point(x, y))
        elif stype in _MULTIPOINT:
            (npts,) = struct.unpack_from("<i", buf, content + 36)
            pts = np.frombuffer(buf, "<f8", 2 * npts, content + 40).reshape(
                npts, 2
            )
            geoms.append({"type": "MultiPoint",
                          "coordinates": pts.astype(np.float64)})
        elif stype in _POLYLINE or stype in _POLYGON:
            nparts, npts = struct.unpack_from("<ii", buf, content + 36)
            parts = np.frombuffer(buf, "<i4", nparts, content + 44)
            pts = np.frombuffer(
                buf, "<f8", 2 * npts, content + 44 + 4 * nparts
            ).reshape(npts, 2).astype(np.float64)
            bounds = np.append(parts, npts)
            rings = [pts[bounds[i]:bounds[i + 1]] for i in range(nparts)]
            if stype in _POLYLINE:
                if len(rings) == 1:
                    geoms.append({"type": "LineString", "coordinates": rings[0]})
                else:
                    geoms.append({"type": "MultiLineString",
                                  "coordinates": rings})
            else:
                geoms.append(_organize_polygon(rings))
        else:
            geoms.append(None)  # unsupported exotic type
        off = content + words * 2
    return geoms


def _organize_polygon(rings: list[np.ndarray]) -> dict:
    """CW exteriors + CCW holes → Polygon / MultiPolygon."""
    exts: list[list[np.ndarray]] = []
    holes: list[np.ndarray] = []
    for r in rings:
        if kernels.ring_signed_area(r) <= 0:  # CW in shapefile = exterior
            exts.append([r])
        else:
            holes.append(r)
    if not exts:  # degenerate: treat all as exteriors
        exts = [[r] for r in holes]
        holes = []
    for h in holes:
        placed = False
        for e in exts:
            if kernels.points_in_ring(h[:1, 0], h[:1, 1], e[0])[0]:
                e.append(h)
                placed = True
                break
        if not placed:
            exts[0].append(h)
    if len(exts) == 1:
        return {"type": "Polygon", "coordinates": exts[0]}
    return {"type": "MultiPolygon", "coordinates": exts}


def _read_dbf(path: str) -> pd.DataFrame:
    with open(path, "rb") as f:
        buf = f.read()
    nrec, hsize, rsize = struct.unpack_from("<iHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off:off + 11].split(b"\x00")[0].decode("ascii",
                                                          errors="replace")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fdec = buf[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    cols: dict[str, list] = {n: [] for n, *_ in fields}
    off = hsize
    for _ in range(nrec):
        if off + rsize > len(buf):
            break
        rec = buf[off:off + rsize]
        off += rsize
        if rec[:1] == b"*":  # deleted row
            continue
        p = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[p:p + flen]
            p += flen
            s = raw.decode("cp1252", errors="replace").strip()
            if ftype in ("N", "F"):
                if s in ("", "*" * len(s)):
                    v = None
                elif ftype == "F" or fdec > 0 or "." in s:
                    try:
                        v = float(s)
                    except ValueError:
                        v = None
                else:
                    try:
                        v = int(s)
                    except ValueError:
                        v = None
            elif ftype == "L":
                v = s.upper() in ("T", "Y")
            else:
                v = s
            cols[name].append(v)
    return pd.DataFrame(cols)


def read_pdf(path: str) -> pd.DataFrame:
    """Shapefile → pandas DataFrame (attrs + geometry WKB bytes).

    ``path`` is the .shp; the sibling .dbf is read when present.  Null
    geometries are kept as None (reference keeps them in memory,
    SpaVectors.py:214-218).
    """
    base = path[:-4] if path.lower().endswith(".shp") else path
    geoms = _read_shp(base + ".shp")
    try:
        pdf = _read_dbf(base + ".dbf")
    except FileNotFoundError:
        pdf = pd.DataFrame(index=range(len(geoms)))
    pdf = pdf.iloc[: len(geoms)].copy()
    pdf["geometry"] = [wkb.dumps(g) if g is not None else None for g in geoms]
    return pdf


def read_spark(spark, path: str):
    """Shapefile → Spark feature table (driver parse, distributed use)."""
    pdf = read_pdf(path)
    return spark.createDataFrame(pdf)
