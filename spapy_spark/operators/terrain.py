"""Terrain operators over the tile table — hillshade, slope, aspect,
TRI, TPI, roughness (reference: /root/reference/SpaTopo.py:51-182,
which shells out to numpy.gradient / gdal.DEMProcessing on a whole
in-memory raster).

The distributed hard part is the **1-pixel halo**: every 3×3 kernel at
a tile edge needs its neighbors' border pixels.  We exchange halos with
one shuffle: each tile emits ≤9 messages — itself plus 1-px strips to
each neighbor — keyed by the *receiving* tile; a grouped assembly pads
each tile to (h+2, w+2) and the numpy kernel runs interior-only.

Raster-boundary pixels use **linear extrapolation** for the missing
halo ring: with pad ``z[-1] = 2·z[0] − z[1]`` a central difference
reduces exactly to numpy.gradient's one-sided boundary difference, so
the tiled result is bit-identical to the whole-array oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StructField,
    StructType,
)

from .raster import _buf


# ---------------------------------------------------------------------------
# numpy kernels on a padded (h+2, w+2) array → (h, w) output
# ---------------------------------------------------------------------------


def _gradient(p: np.ndarray, xres: float = 1.0, yres: float = 1.0):
    """Central differences on the padded array (== np.gradient of the
    full raster thanks to the linear-extrapolated boundary halo)."""
    dy = (p[2:, 1:-1] - p[:-2, 1:-1]) / (2.0 * yres)
    dx = (p[1:-1, 2:] - p[1:-1, :-2]) / (2.0 * xres)
    return dy, dx


def hillshade_kernel(
    p: np.ndarray, azimuth: float = 315.0, altitude: float = 45.0
) -> np.ndarray:
    """numpy.gradient → slope/aspect → illumination, scaled 0-255
    (mirrors /root/reference/SpaTopo.py:51-80's formula family)."""
    gy, gx = _gradient(p)
    slope = np.pi / 2.0 - np.arctan(np.sqrt(gx * gx + gy * gy))
    aspect = np.arctan2(-gx, gy)
    az = np.radians(360.0 - azimuth + 90.0)
    alt = np.radians(altitude)
    shaded = np.sin(alt) * np.sin(slope) + np.cos(alt) * np.cos(
        slope
    ) * np.cos(az - aspect)
    return (255.0 * (shaded + 1.0) / 2.0).astype("<f4")


def slope_kernel(p: np.ndarray, degrees: bool = True) -> np.ndarray:
    """Horn 3×3 slope (gdaldem slope semantics,
    /root/reference/SpaTopo.py:147-182 via gdal.DEMProcessing)."""
    a, b, c = p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:]
    d, f = p[1:-1, :-2], p[1:-1, 2:]
    g, h, i = p[2:, :-2], p[2:, 1:-1], p[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / 8.0
    s = np.arctan(np.sqrt(dzdx**2 + dzdy**2))
    return (np.degrees(s) if degrees else s).astype("<f4")


def aspect_kernel(p: np.ndarray) -> np.ndarray:
    a, b, c = p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:]
    d, f = p[1:-1, :-2], p[1:-1, 2:]
    g, h, i = p[2:, :-2], p[2:, 1:-1], p[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / 8.0
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / 8.0
    asp = np.degrees(np.arctan2(dzdy, -dzdx))
    asp = np.where(asp < 0, 90.0 - asp,
                   np.where(asp > 90.0, 360.0 - asp + 90.0, 90.0 - asp))
    return asp.astype("<f4")


def tri_kernel(p: np.ndarray) -> np.ndarray:
    """Terrain Ruggedness Index: mean |center − neighbor| over the 8
    neighbors (Wilson et al., gdaldem TRI default)."""
    c = p[1:-1, 1:-1]
    acc = np.zeros_like(c)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc += np.abs(p[1 + dy : p.shape[0] - 1 + dy,
                            1 + dx : p.shape[1] - 1 + dx] - c)
    return (acc / 8.0).astype("<f4")


def tpi_kernel(p: np.ndarray) -> np.ndarray:
    """Topographic Position Index: center − mean(8 neighbors)."""
    c = p[1:-1, 1:-1]
    acc = np.zeros_like(c)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            acc += p[1 + dy : p.shape[0] - 1 + dy,
                     1 + dx : p.shape[1] - 1 + dx]
    return (c - acc / 8.0).astype("<f4")


def roughness_kernel(p: np.ndarray) -> np.ndarray:
    """max − min of each 3×3 window."""
    mx = np.full(p[1:-1, 1:-1].shape, -np.inf)
    mn = np.full(p[1:-1, 1:-1].shape, np.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w = p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
            mx = np.maximum(mx, w)
            mn = np.minimum(mn, w)
    return (mx - mn).astype("<f4")


_KERNELS = {
    "hillshade": hillshade_kernel,
    "slope": slope_kernel,
    "aspect": aspect_kernel,
    "tri": tri_kernel,
    "tpi": tpi_kernel,
    "roughness": roughness_kernel,
}


def pad_oracle(arr: np.ndarray) -> np.ndarray:
    """Linear-extrapolated 1-px pad of a whole raster (test oracle —
    identical boundary semantics to the distributed path)."""
    p = np.empty((arr.shape[0] + 2, arr.shape[1] + 2), dtype=np.float64)
    p[1:-1, 1:-1] = arr
    p[0, 1:-1] = 2 * arr[0] - arr[1]
    p[-1, 1:-1] = 2 * arr[-1] - arr[-2]
    p[:, 0] = 2 * p[:, 1] - p[:, 2]
    p[:, -1] = 2 * p[:, -2] - p[:, -3]
    return p


# ---------------------------------------------------------------------------
# Distributed halo exchange
# ---------------------------------------------------------------------------


def _halo_exchange(tiles: DataFrame, grid: int, grid_x: int | None = None) -> DataFrame:
    """One shuffle: every tile sends itself + 1-px strips to its ≤8
    neighbors, keyed by receiving tile (dy, dx tags the placement).

    ``grid``/``grid_x`` bound the tile grid per axis (rows/cols) so no
    strip is addressed to a nonexistent tile (which would orphan a
    group downstream); square rasters pass just ``grid``."""
    if grid_x is None:
        grid_x = grid
    msg_schema = StructType([
        StructField("raster_id", tiles.schema["raster_id"].dataType, False),
        StructField("band", tiles.schema["band"].dataType, False),
        StructField("tile_y", IntegerType(), False),
        StructField("tile_x", IntegerType(), False),
        StructField("dy", IntegerType(), False),
        StructField("dx", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("nodata", tiles.schema["nodata"].dataType, False),
        StructField("pixels", BinaryType(), False),
    ])

    def emit(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ty, tx = r.tile_y + dy, r.tile_x + dx
                        if not (0 <= ty < grid and 0 <= tx < grid_x):
                            continue
                        # strip of a the receiver needs: receiver below
                        # (dy=+1) takes our BOTTOM row, receiver right
                        # (dx=+1) takes our RIGHT column, etc.
                        strip = a
                        if dy == 1:
                            strip = strip[-1:]
                        elif dy == -1:
                            strip = strip[:1]
                        if dx == 1:
                            strip = strip[:, -1:]
                        elif dx == -1:
                            strip = strip[:, :1]
                        rows.append((
                            r.raster_id, r.band, ty, tx, -dy, -dx,
                            strip.shape[0], strip.shape[1], r.nodata,
                            np.ascontiguousarray(strip).tobytes(),
                        ))
            yield pd.DataFrame(rows, columns=[
                "raster_id", "band", "tile_y", "tile_x", "dy", "dx",
                "height", "width", "nodata", "pixels"])

    return tiles.mapInPandas(emit, schema=msg_schema)


def contour_segments_kernel(
    a: np.ndarray, level: float, gx0: int = 0, gy0: int = 0
) -> np.ndarray:
    """Marching-squares segments of iso-``level`` over one array.

    Cells are squares between 4 adjacent pixel centers; each cell with
    a sign change yields 1-2 segments with linearly interpolated
    endpoints (pixel-center coordinate space, offset by gx0/gy0).
    Returns (S, 4) float64 [x1, y1, x2, y2] — vectorized over cells,
    the standard 16-case table with midpoint disambiguation.
    """
    f = a.astype(np.float64) - level
    tl, tr = f[:-1, :-1], f[:-1, 1:]
    bl, br = f[1:, :-1], f[1:, 1:]
    idx = (
        (tl > 0).astype(np.int8)
        | ((tr > 0).astype(np.int8) << 1)
        | ((br > 0).astype(np.int8) << 2)
        | ((bl > 0).astype(np.int8) << 3)
    )
    valid = ~(np.isnan(tl) | np.isnan(tr) | np.isnan(bl) | np.isnan(br))
    cy, cx = np.nonzero((idx != 0) & (idx != 15) & valid)
    if len(cy) == 0:
        return np.empty((0, 4), dtype=np.float64)
    segs = []

    def interp(fa, fb):
        d = fa - fb
        return np.where(d != 0, fa / np.where(d == 0, 1.0, d), 0.5)

    tl_, tr_ = tl[cy, cx], tr[cy, cx]
    bl_, br_ = bl[cy, cx], br[cy, cx]
    code = idx[cy, cx]
    # edge crossing coordinates (pixel-center space)
    top_x = cx + interp(tl_, tr_)
    bot_x = cx + interp(bl_, br_)
    lef_y = cy + interp(tl_, bl_)
    rig_y = cy + interp(tr_, br_)
    top = np.stack([gx0 + top_x, gy0 + cy + 0.0], 1)
    bot = np.stack([gx0 + bot_x, gy0 + cy + 1.0], 1)
    lef = np.stack([gx0 + cx + 0.0, gy0 + lef_y], 1)
    rig = np.stack([gx0 + cx + 1.0, gy0 + rig_y], 1)
    # case table: which two edges connect (ambiguous 5/10 split by
    # center average sign)
    center = (tl_ + tr_ + bl_ + br_) / 4.0
    pair_map = {
        1: [("lef", "top")], 2: [("top", "rig")], 3: [("lef", "rig")],
        4: [("rig", "bot")], 6: [("top", "bot")], 7: [("lef", "bot")],
        8: [("bot", "lef")], 9: [("bot", "top")], 11: [("bot", "rig")],
        12: [("rig", "lef")], 13: [("rig", "top")], 14: [("top", "lef")],
    }
    edges = {"top": top, "bot": bot, "lef": lef, "rig": rig}
    for c, plist in pair_map.items():
        m = code == c
        if not m.any():
            continue
        for e1, e2 in plist:
            segs.append(np.hstack([edges[e1][m], edges[e2][m]]))
    for c, straight, crossed in ((5, [("lef", "top"), ("rig", "bot")],
                                  [("lef", "bot"), ("rig", "top")]),
                                 (10, [("top", "rig"), ("bot", "lef")],
                                  [("top", "lef"), ("bot", "rig")])):
        m = code == c
        if not m.any():
            continue
        amb = center[m] > 0
        for flag, plist in ((True, straight), (False, crossed)):
            mm = m.copy()
            mm[m] = amb == flag
            if not mm.any():
                continue
            for e1, e2 in plist:
                segs.append(np.hstack([edges[e1][mm], edges[e2][mm]]))
    return np.vstack(segs) if segs else np.empty((0, 4), dtype=np.float64)


def contour(
    tiles: DataFrame,
    levels: list[float],
    grid: int,
    tile: int,
    geotransform: tuple,
) -> DataFrame:
    """Distributed contour extraction (reference: gdal.ContourGenerate,
    /root/reference/SpaTopo.py:185-233).

    Marching squares per tile over a (tile+1)² pixel window — the
    right/bottom halo row comes from the neighbor exchange, so segments
    are identical to a whole-raster run.  Output one row per
    (raster_id, band, level, tile) with a MultiLineString WKB of the
    tile's segments in CRS coordinates (pixel centers).
    """
    from pyspark.sql.types import (
        BinaryType, DoubleType, IntegerType, StructField, StructType,
    )

    from ..geometry import wkb as _wkb

    x0, pw, _, y0, _, ph = geotransform
    msgs = _halo_exchange(tiles, grid)
    out_schema = StructType([
        StructField("raster_id", tiles.schema["raster_id"].dataType, False),
        StructField("band", tiles.schema["band"].dataType, False),
        StructField("level", DoubleType(), False),
        StructField("tile_y", IntegerType(), False),
        StructField("tile_x", IntegerType(), False),
        StructField("n_segments", IntegerType(), False),
        StructField("geometry", BinaryType(), False),
    ])

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid, band, ty, tx = key
        center = pdf[(pdf.dy == 0) & (pdf.dx == 0)].iloc[0]
        h, w = int(center.height), int(center.width)
        a = _buf(center.pixels, h, w).astype(np.float64)
        have = {}
        for r in pdf.itertuples(index=False):
            have[(r.dy, r.dx)] = _buf(r.pixels, r.height, r.width).astype(
                np.float64
            )
        # extend by one row/col to the bottom/right (cells owned by the
        # tile span pixel rows [0..h] × [0..w])
        ext = np.full((h + 1, w + 1), np.nan)
        ext[:h, :w] = a
        if (1, 0) in have:
            ext[h, :w] = have[(1, 0)][0]
        if (0, 1) in have:
            ext[:h, w] = have[(0, 1)][:, 0]
        if (1, 1) in have:
            ext[h, w] = have[(1, 1)][0, 0]
        # NaN rows (raster edge) produce no segments (comparisons False)
        rows = []
        for level in levels:
            segs = contour_segments_kernel(
                ext, float(level), gx0=tx * tile, gy0=ty * tile
            )
            if len(segs) == 0:
                continue
            # pixel-center → CRS coords
            coords = []
            for sx1, sy1, sx2, sy2 in segs:
                coords.append(np.array([
                    [x0 + (sx1 + 0.5) * pw, y0 + (sy1 + 0.5) * ph],
                    [x0 + (sx2 + 0.5) * pw, y0 + (sy2 + 0.5) * ph],
                ]))
            g = {"type": "MultiLineString", "coordinates": coords}
            rows.append((rid, band, float(level), int(ty), int(tx),
                         len(coords), _wkb.dumps(g)))
        return pd.DataFrame(rows, columns=[f.name for f in out_schema])

    return msgs.groupBy("raster_id", "band", "tile_y", "tile_x").applyInPandas(
        assemble, schema=out_schema
    )


def focal(
    tiles: DataFrame,
    op: str,
    grid: int,
    tile: int,
    out_raster_id: str = "out",
    **kw,
) -> DataFrame:
    """Run a 3×3 focal kernel over the tile table with halo exchange.

    op ∈ {hillshade, slope, aspect, tri, tpi, roughness}.
    """
    fn = _KERNELS.get(op)
    if fn is None:
        raise ValueError(f"unknown terrain op {op!r}")
    msgs = _halo_exchange(tiles, grid)
    out_schema = tiles.schema

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid, band, ty, tx = key
        center = pdf[(pdf.dy == 0) & (pdf.dx == 0)].iloc[0]
        h, w = int(center.height), int(center.width)
        a = _buf(center.pixels, h, w).astype(np.float64)
        p = np.empty((h + 2, w + 2), dtype=np.float64)
        p[1:-1, 1:-1] = a
        have = {}
        for r in pdf.itertuples(index=False):
            have[(r.dy, r.dx)] = _buf(r.pixels, r.height, r.width).astype(
                np.float64
            )
        # place neighbor strips; missing edges → linear extrapolation
        p[0, 1:-1] = have[(-1, 0)][-1] if (-1, 0) in have else 2 * a[0] - a[1]
        p[-1, 1:-1] = have[(1, 0)][0] if (1, 0) in have else 2 * a[-1] - a[-2]
        p[1:-1, 0] = (
            have[(0, -1)][:, -1] if (0, -1) in have else 2 * a[:, 0] - a[:, 1]
        )
        p[1:-1, -1] = (
            have[(0, 1)][:, 0] if (0, 1) in have else 2 * a[:, -1] - a[:, -2]
        )
        for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
            yy = 0 if dy < 0 else h + 1
            xx = 0 if dx < 0 else w + 1
            if (dy, dx) in have:
                p[yy, xx] = have[(dy, dx)][0 if dy < 0 else -1,
                                           0 if dx < 0 else -1]
            elif (0, dx) in have:
                # at the top/bottom raster edge with a real side strip:
                # row-extrapolate within the halo column (pad_oracle
                # extrapolates rows first)
                p[yy, xx] = 2 * p[1 if dy < 0 else h, xx] - p[
                    2 if dy < 0 else h - 1, xx
                ]
            else:
                # left/right raster edge or true corner: column-
                # extrapolate from the (possibly extrapolated) halo row
                # (pad_oracle extrapolates columns last)
                p[yy, xx] = 2 * p[yy, 1 if dx < 0 else w] - p[
                    yy, 2 if dx < 0 else w - 1
                ]
        out = fn(p, **kw)
        return pd.DataFrame([{
            "raster_id": out_raster_id, "band": band, "tile_y": ty,
            "tile_x": tx, "height": h, "width": w,
            "nodata": float(center.nodata), "pixels": out.tobytes(),
        }])

    return msgs.groupBy("raster_id", "band", "tile_y", "tile_x").applyInPandas(
        assemble, schema=out_schema
    )


# ---------------------------------------------------------------------------
# ColorRelief (gdaldem color-relief parity — reference SpaTopo.py:354)
# ---------------------------------------------------------------------------

# (elevation, r, g, b) — a standard hypsometric ramp; callers pass
# their own (gdaldem reads it from a color file)
DEFAULT_RAMP = (
    (-500.0, 49, 79, 143),
    (0.0, 110, 220, 110),
    (500.0, 240, 230, 140),
    (1000.0, 180, 120, 70),
    (2000.0, 255, 255, 255),
)


def color_relief(
    tiles: DataFrame,
    ramp=DEFAULT_RAMP,
    out_raster_id: str = "relief",
) -> DataFrame:
    """DEM → 3-band RGB relief, gdaldem color-relief semantics
    (/root/reference/SpaTopo.py:354-367 shells out to
    gdal.DEMProcessing): linear interpolation between ramp entries,
    clamped to the end colors outside the range, rounded to integer
    levels.  Purely per-tile (no halo) — each input tile maps to three
    output rows (band 1/2/3 = R/G/B); nodata pixels keep nodata."""
    elev = np.array([r[0] for r in ramp], dtype=np.float64)
    chans = [np.array([r[c] for r in ramp], dtype=np.float64)
             for c in (1, 2, 3)]
    schema = tiles.schema

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width).astype(np.float64)
                mask = np.equal(a, np.float64(np.float32(r.nodata)))
                for band, cv in enumerate(chans, start=1):
                    out = np.rint(np.interp(a, elev, cv))
                    out = np.where(mask, np.float64(r.nodata), out)
                    rows.append((
                        out_raster_id, band, r.tile_y, r.tile_x,
                        r.height, r.width, r.nodata,
                        out.astype("<f4").tobytes(),
                    ))
            yield pd.DataFrame(rows, columns=[
                "raster_id", "band", "tile_y", "tile_x", "height",
                "width", "nodata", "pixels"])

    return tiles.mapInPandas(run, schema=schema)
