"""Raster engine over a distributed tile table.

Data model (SURVEY.md §1.2): one row per (raster_id, band, tile_y,
tile_x) with a float32 C-order pixel buffer, nodata value, and a
raster-level geotransform manifest — replacing the reference's dense
in-memory numpy model (/root/reference/SpaRasters.py:58-122).

Operators:

- map algebra      — tile-aligned equi-join + numpy ufunc in a pandas
  batch (reference: Math dispatcher /root/reference/SpaRasters.py:894-985);
  comparison/logical results cast to int8-style 0/1 float (reference
  casts to GDT_Byte, SpaRasters.py:934-939).
- scalar algebra   — single-table mapInPandas, same ufuncs.
- min/max/histogram— mask-aware per-tile partials + final combine
  (reference: pure-Python double loops, SpaRasters.py:456-490,571-620).
- reclassify       — np.select over ranges (SpaRasters.py:1170-1217).
- crop             — tile filter + edge-tile slice (SpaRasters.py:1235-1282).
- value-at-point   — point→tile equi-join + buffer gather: the
  raster↔vector sampling op the north rule names (pixel↔ref math
  mirrors SpaRasters.py:349-401).
- zonal stats      — sample + groupBy(zone) aggregate.

NoData semantics follow the reference: mask = (band == nodata), masked
pixels excluded from stats and re-stamped after algebra
(SpaRasters.py:105-107,747-750,817-819).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_UFUNCS = {
    "add": np.add,
    "subtract": np.subtract,
    "multiply": np.multiply,
    "divide": np.divide,
    "maximum": np.maximum,
    "minimum": np.minimum,
    "power": np.power,
}
_CMP = {
    "equal": np.equal,
    "not_equal": np.not_equal,
    "less": np.less,
    "less_equal": np.less_equal,
    "greater": np.greater,
    "greater_equal": np.greater_equal,
    "and": np.logical_and,
    "or": np.logical_or,
}
_UNARY = {
    "round": np.around,
    "floor": np.floor,
    "ceil": np.ceil,
    "trunc": np.trunc,
    "abs": np.absolute,
    "sqrt": np.sqrt,
    "square": np.square,
    "exp": np.exp,
    # reference quirk: module-level Log() computes the NATURAL log
    # (SPAMATH_NATURAL_LOG at /root/reference/SpaRasters.py:2017) — we
    # expose both and name them honestly.
    "ln": np.log,
    "log10": np.log10,
    "not": np.logical_not,
}

_TILE_KEY = ["band", "tile_y", "tile_x"]


# GDAL pixel-dtype zoo (/root/reference/SpaRasters.py:665-685), as
# little-endian numpy codes.  ``ptype`` is the optional tile-table
# column naming the buffer's dtype; without it the codec infers from
# byte width (f4 / u1 / i2 / f8 — the unambiguous widths).  The
# width-ambiguous types (u2 vs i2, i4/u4 vs f4) REQUIRE the column.
_PTYPES = {
    "u1": "u1", "i1": "i1", "u2": "<u2", "i2": "<i2",
    "u4": "<u4", "i4": "<i4", "f4": "<f4", "f8": "<f8",
    # complex IEEE (CFloat32/CFloat64, SampleFormat 6) — transport
    # only: stats/algebra are real-valued ops, like GDAL most
    # algorithms skip complex bands (reference SpaRasters.py:678)
    "c8": "<c8", "c16": "<c16",
}


def _pt(r):
    """Row → its ptype tag (None when the table has no ptype column)."""
    v = getattr(r, "ptype", None)
    return None if v is None or (isinstance(v, float) and np.isnan(v)) else v


def _pts(a: np.ndarray) -> str:
    """Array → ptype tag ('u2', 'i4', 'f8', …)."""
    return f"{a.dtype.kind}{a.dtype.itemsize}"


def _ndmask(a: np.ndarray, nodata: float) -> np.ndarray:
    """Mask = (pixel == nodata), dtype-correct: float32 buffers compare
    in f32 (the measured bit-exact legacy path), float64 buffers against
    the UNROUNDED double, integer buffers against the f32-rounded value
    promoted exactly to f64 (legacy u1/i2 semantics; exact for i4/u4
    too — |int32| < 2^53)."""
    if a.dtype == np.dtype("<f4"):
        return np.equal(a, np.float32(nodata))
    if a.dtype.kind == "f":
        return np.equal(a, np.float64(nodata))
    return np.equal(a, np.float64(np.float32(nodata)))


def _buf(b: bytes, h: int, w: int, ptype: str | None = None) -> np.ndarray:
    """Tile payload → (h, w) array.  ``ptype`` (from the optional tile
    column) names the dtype explicitly; otherwise the buffer length
    selects it: 4 bytes/px → float32 (the compute type), 1 → uint8
    (landcover/class rasters), 2 → int16 (small DEM exports), 8 →
    float64.  Arithmetic operators promote to float64 regardless;
    dtype-preserving ops (crop, NN resample, reclassify, warp-nearest)
    keep the input dtype."""
    b = bytes(b)
    n = h * w
    if ptype is not None:
        a = np.frombuffer(b, dtype=np.dtype(_PTYPES[ptype]))
        if len(a) != n:
            raise ValueError(
                f"pixel buffer {len(b)} B is not {h}x{w} {ptype}")
        return a.reshape(h, w)
    if len(b) == n * 4:
        return np.frombuffer(b, dtype="<f4").reshape(h, w)
    if len(b) == n:
        return np.frombuffer(b, dtype="u1").reshape(h, w)
    if len(b) == n * 2:
        return np.frombuffer(b, dtype="<i2").reshape(h, w)
    if len(b) == n * 8:
        return np.frombuffer(b, dtype="<f8").reshape(h, w)
    raise ValueError(f"pixel buffer {len(b)} B does not match {h}x{w}")


def _masked_apply(fn, a, b, nodata, nodata_b=None):
    """Apply fn over masked buffers; each side masked against its OWN
    nodata (reference ORs per-raster masks, SpaRasters.py:750,2146-2156)
    and the output stamped with raster A's nodata.  Output is the f32
    compute type, except float64 inputs which stay f64 (GDAL promotes
    Float64 math to Float64)."""
    mask = _ndmask(a, nodata)
    if isinstance(b, np.ndarray):
        nb = nodata if nodata_b is None else nodata_b
        mask |= _ndmask(b, nb)
    with np.errstate(all="ignore"):
        out = fn(a.astype(np.float64), b if not isinstance(b, np.ndarray)
                 else b.astype(np.float64))
    if out.dtype == bool:
        out = out.astype(np.float64)
    out = np.where(mask, np.float64(nodata), out)
    odt = "<f8" if (a.dtype.kind == "f" and a.dtype.itemsize == 8) else "<f4"
    return out.astype(odt), mask


def map_algebra(
    tiles_a: DataFrame,
    op: str,
    tiles_b: DataFrame | float | int,
    out_raster_id: str = "out",
) -> DataFrame:
    """raster⊗raster (tile-aligned equi-join) or raster⊗scalar.

    Band counts must align per the reference (SpaRasters.py:914);
    comparison/logical ops yield 0/1 (GDT_Byte parity).
    """
    fn = _UFUNCS.get(op) or _CMP.get(op)
    if fn is None:
        raise ValueError(f"unknown op {op!r}")
    schema = tiles_a.schema

    if isinstance(tiles_b, DataFrame):
        b_cols = [
            *_TILE_KEY, F.col("pixels").alias("pixels_b"),
            F.col("nodata").alias("nodata_b"),
        ]
        if "ptype" in tiles_b.columns:
            b_cols.append(F.col("ptype").alias("ptype_b"))
        b = tiles_b.select(*b_cols)
        j = tiles_a.join(b, _TILE_KEY)  # co-partitioned equi-join
        drop_b = [c for c in ("pixels_b", "nodata_b", "ptype_b")
                  if c in j.columns]

        def run(batches):
            for pdf in batches:
                outs, pts = [], []
                for r in pdf.itertuples(index=False):
                    a = _buf(r.pixels, r.height, r.width, _pt(r))
                    bb = _buf(r.pixels_b, r.height, r.width,
                              getattr(r, "ptype_b", None))
                    out, _ = _masked_apply(fn, a, bb, r.nodata, r.nodata_b)
                    outs.append(out.tobytes())
                    pts.append(_pts(out))
                res = pdf.drop(columns=drop_b).copy()
                res["pixels"] = outs
                res["raster_id"] = out_raster_id
                if "ptype" in res.columns:
                    res["ptype"] = pts
                yield res

        return j.mapInPandas(run, schema=schema)

    scalar = float(tiles_b)

    def run_s(batches):
        for pdf in batches:
            outs, pts = [], []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width, _pt(r))
                out, _ = _masked_apply(fn, a, scalar, r.nodata)
                outs.append(out.tobytes())
                pts.append(_pts(out))
            res = pdf.copy()
            res["pixels"] = outs
            res["raster_id"] = out_raster_id
            if "ptype" in res.columns:
                res["ptype"] = pts
            yield res

    return tiles_a.mapInPandas(run_s, schema=schema)


def unary_algebra(tiles: DataFrame, op: str, out_raster_id: str = "out") -> DataFrame:
    fn = _UNARY.get(op)
    if fn is None:
        raise ValueError(f"unknown unary op {op!r}")
    schema = tiles.schema

    def run(batches):
        for pdf in batches:
            outs, pts = [], []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width, _pt(r))
                mask = _ndmask(a, r.nodata)
                with np.errstate(all="ignore"):
                    out = fn(a.astype(np.float64))
                if out.dtype == bool:
                    out = out.astype(np.float64)
                out = np.where(mask, np.float64(r.nodata), out)
                odt = ("<f8" if (a.dtype.kind == "f"
                                 and a.dtype.itemsize == 8) else "<f4")
                out = out.astype(odt)
                outs.append(out.tobytes())
                pts.append(_pts(out))
            res = pdf.copy()
            res["pixels"] = outs
            res["raster_id"] = out_raster_id
            if "ptype" in res.columns:
                res["ptype"] = pts
            yield res

    return tiles.mapInPandas(run, schema=schema)


def reclassify(tiles: DataFrame, bounds: list, values: list,
               out_raster_id: str = "out") -> DataFrame:
    """Range reclassify: pixel in [bounds[i], bounds[i+1]) → values[i]
    (reference SpaRasters.py:1170-1217 via np.select; we implement the
    single-band-correct semantics — its multi-band condlist leak is a
    documented reference bug, SURVEY.md §2.6)."""
    if len(values) != len(bounds) - 1:
        raise ValueError("need len(values) == len(bounds) - 1")
    schema = tiles.schema
    lo = [float(b) for b in bounds[:-1]]
    hi = [float(b) for b in bounds[1:]]
    vals = [float(v) for v in values]

    def run(batches):
        for pdf in batches:
            outs, pts = [], []
            for r in pdf.itertuples(index=False):
                a0 = _buf(r.pixels, r.height, r.width, _pt(r))
                a = a0.astype(np.float64)
                mask = _ndmask(a0, r.nodata)
                conds = [(a >= l) & (a < h) for l, h in zip(lo, hi)]
                out = np.select(conds, vals, default=np.float64(r.nodata))
                out = np.where(mask, np.float64(r.nodata), out)
                # integer tiles stay integer (exact landcover classes;
                # caller's values/nodata must fit the dtype); f64 stays
                # f64
                odt = (a0.dtype if a0.dtype.kind in "iu"
                       or a0.dtype.itemsize == 8 else np.dtype("<f4"))
                out = out.astype(odt)
                outs.append(out.tobytes())
                pts.append(_pts(out))
            res = pdf.copy()
            res["pixels"] = outs
            res["raster_id"] = out_raster_id
            if "ptype" in res.columns:
                res["ptype"] = pts
            yield res

    return tiles.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Stats (partial per tile → final combine)
# ---------------------------------------------------------------------------

def band_stats(tiles: DataFrame) -> DataFrame:
    """Mask-aware per-(raster,band) min/max/sum/count — classic
    partial+final aggregation (reference loops pixels in Python,
    SpaRasters.py:456-490)."""
    part_schema = StructType([
        StructField("raster_id", tiles.schema["raster_id"].dataType, False),
        StructField("band", tiles.schema["band"].dataType, False),
        StructField("t_min", DoubleType(), True),
        StructField("t_max", DoubleType(), True),
        StructField("t_sum", DoubleType(), True),
        StructField("t_cnt", LongType(), False),
    ])

    def partials(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width, _pt(r))
                valid = a[~_ndmask(a, r.nodata)]
                if len(valid) == 0:
                    rows.append((r.raster_id, r.band, None, None, None, 0))
                else:
                    v = valid.astype(np.float64)
                    rows.append((
                        r.raster_id, r.band, float(v.min()), float(v.max()),
                        float(v.sum()), int(len(v)),
                    ))
            yield pd.DataFrame(rows, columns=[
                "raster_id", "band", "t_min", "t_max", "t_sum", "t_cnt"])

    p = tiles.mapInPandas(partials, schema=part_schema)
    return p.groupBy("raster_id", "band").agg(
        F.min("t_min").alias("min"),
        F.max("t_max").alias("max"),
        F.sum("t_sum").alias("sum"),
        F.sum("t_cnt").alias("count"),
    )


def tile_stats(tiles: DataFrame) -> DataFrame:
    """Mask-aware per-tile stats (tile_y, tile_x, n_valid, sum, min,
    max) — the map-side partial of :func:`band_stats` exposed as its
    own operator (per-tile QA / progress maps).  One pass, no shuffle:
    each tile row reduces to one stat row in place."""
    schema = StructType([
        StructField("raster_id", tiles.schema["raster_id"].dataType, False),
        StructField("band", tiles.schema["band"].dataType, False),
        StructField("tile_y", tiles.schema["tile_y"].dataType, False),
        StructField("tile_x", tiles.schema["tile_x"].dataType, False),
        StructField("n_valid", LongType(), False),
        StructField("sum", DoubleType(), True),
        StructField("min", DoubleType(), True),
        StructField("max", DoubleType(), True),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width, _pt(r))
                valid = a[~_ndmask(a, r.nodata)].astype(np.float64)
                if len(valid) == 0:
                    rows.append((r.raster_id, r.band, r.tile_y, r.tile_x,
                                 0, None, None, None))
                else:
                    rows.append((
                        r.raster_id, r.band, r.tile_y, r.tile_x,
                        int(len(valid)), float(valid.sum()),
                        float(valid.min()), float(valid.max()),
                    ))
            yield pd.DataFrame(rows, columns=[
                "raster_id", "band", "tile_y", "tile_x", "n_valid",
                "sum", "min", "max"])

    return tiles.mapInPandas(run, schema=schema)


def histogram(tiles: DataFrame, bins: int = 10) -> DataFrame:
    """Two-pass histogram: global min/max agg, then per-tile bincount
    partials combined by bucket (reference SpaRasters.py:571-620)."""
    stats = {
        (r["raster_id"], r["band"]): (r["min"], r["max"])
        for r in band_stats(tiles).collect()
    }
    bc = tiles.sparkSession.sparkContext.broadcast((stats, bins))
    schema = StructType([
        StructField("raster_id", tiles.schema["raster_id"].dataType, False),
        StructField("band", tiles.schema["band"].dataType, False),
        StructField("bucket", LongType(), False),
        StructField("n", LongType(), False),
    ])

    def partials(batches):
        st, nb = bc.value
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                mn, mx = st[(r.raster_id, r.band)]
                a = _buf(r.pixels, r.height, r.width, _pt(r))
                valid = a[~_ndmask(a, r.nodata)].astype(np.float64)
                if len(valid) == 0 or mx <= mn:
                    continue
                w = (mx - mn) / nb
                idx = np.clip(((valid - mn) / w).astype(np.int64), 0, nb - 1)
                counts = np.bincount(idx, minlength=nb)
                for b_ in range(nb):
                    if counts[b_]:
                        rows.append((r.raster_id, r.band, b_, int(counts[b_])))
            yield pd.DataFrame(rows, columns=["raster_id", "band", "bucket", "n"])

    p = tiles.mapInPandas(partials, schema=schema)
    return p.groupBy("raster_id", "band", "bucket").agg(
        F.sum("n").alias("n")
    )


# ---------------------------------------------------------------------------
# Crop (tile filter + edge slice)
# ---------------------------------------------------------------------------


def crop_pixels(
    tiles: DataFrame,
    px0: int,
    py0: int,
    px1: int,
    py1: int,
    tile: int,
) -> DataFrame:
    """ExtractByPixels (reference SpaRasters.py:1341-1388): keep global
    pixel window [px0..px1) × [py0..py1), re-origined to (0,0), emitted
    as a new tile grid.  Whole-tile interior passes through without
    copying; only edge tiles slice."""
    schema = tiles.schema
    t0x, t1x = px0 // tile, (px1 - 1) // tile
    t0y, t1y = py0 // tile, (py1 - 1) // tile
    pruned = tiles.where(
        (F.col("tile_x") >= t0x) & (F.col("tile_x") <= t1x)
        & (F.col("tile_y") >= t0y) & (F.col("tile_y") <= t1y)
    )

    has_pt = "ptype" in tiles.columns

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                gx0, gy0 = r.tile_x * tile, r.tile_y * tile
                sx0 = max(px0 - gx0, 0)
                sy0 = max(py0 - gy0, 0)
                sx1 = min(px1 - gx0, r.width)
                sy1 = min(py1 - gy0, r.height)
                a = _buf(r.pixels, r.height, r.width, _pt(r))[sy0:sy1,
                                                              sx0:sx1]
                row = (
                    r.raster_id, r.band,
                    int(r.tile_y - t0y), int(r.tile_x - t0x),
                    a.shape[0], a.shape[1], r.nodata,
                    np.ascontiguousarray(a).tobytes(),
                )
                rows.append(row + (_pt(r),) if has_pt else row)
            cols = ["raster_id", "band", "tile_y", "tile_x", "height",
                    "width", "nodata", "pixels"] + (
                        ["ptype"] if has_pt else [])
            yield pd.DataFrame(rows, columns=cols)

    return pruned.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Raster↔vector: value-at-point sampling + zonal stats (north rule)
# ---------------------------------------------------------------------------


def sample_points(
    points: DataFrame,
    tiles: DataFrame,
    geotransform: tuple,
    tile: int,
    raster_id: str | None = None,
    band: int = 1,
    x: str = "lon",
    y: str = "lat",
    point_cols: list[str] | None = None,
    out: str = "value",
) -> DataFrame:
    """Value-at-point lookup: compute each point's (tile_y, tile_x)
    from the geotransform (pixel↔ref math of SpaRasters.py:349-401),
    equi-join to the tile table, gather from the pixel buffer.

    Points outside the raster or on nodata pixels are dropped (matching
    a masked sample).  The join is a plain Catalyst hash join on the
    integer tile key — at scale the tile side is pre-bucketed.
    """
    if point_cols is None:
        point_cols = [c for c in points.columns if c not in (x, y)]
    x0, pw, _, y0, _, ph = geotransform
    px = F.floor((F.col(x) - F.lit(x0)) / F.lit(pw)).cast("long")
    py = F.floor((F.col(y) - F.lit(y0)) / F.lit(ph)).cast("long")
    pts = points.select(*point_cols, x, y).withColumn("__px", px).withColumn(
        "__py", py
    )
    pts = pts.withColumn(
        "tile_x", F.floor(F.col("__px") / tile).cast("int")
    ).withColumn("tile_y", F.floor(F.col("__py") / tile).cast("int"))
    t = tiles.where(F.col("band") == band)
    if raster_id is not None:
        t = t.where(F.col("raster_id") == raster_id)
    t_cols = ["tile_y", "tile_x", "height", "width", "nodata", "pixels"]
    if "ptype" in t.columns:
        t_cols.append("ptype")
    t = t.select(*t_cols)
    fields = [f for f in points.schema.fields if f.name in point_cols]
    schema = StructType(fields + [StructField(out, DoubleType(), False)])

    # COGROUP, not join: a join would replicate the (large) pixel
    # buffer onto every point row — at 150k points × 16 KB tiles that
    # is GBs of duplicated payload.  Cogrouping shuffles points by the
    # integer tile key (needed anyway) and ships each buffer exactly
    # once per group.
    def gather(key, pts_pdf: pd.DataFrame, tile_pdf: pd.DataFrame):
        if len(pts_pdf) == 0 or len(tile_pdf) == 0:
            return pd.DataFrame(columns=point_cols + [out])
        trow = tile_pdf.iloc[0]
        h, w = int(trow["height"]), int(trow["width"])
        nd = float(trow["nodata"])
        a = _buf(trow["pixels"], h, w,
                 trow["ptype"] if "ptype" in tile_pdf.columns else None)
        ty, tx = int(key[0]), int(key[1])
        ly = pts_pdf["__py"].to_numpy(np.int64) - np.int64(ty) * tile
        lx = pts_pdf["__px"].to_numpy(np.int64) - np.int64(tx) * tile
        inb = (ly >= 0) & (ly < h) & (lx >= 0) & (lx < w)
        v = np.full(len(pts_pdf), nd)
        v[inb] = a[ly[inb], lx[inb]].astype(np.float64)
        ndc = (np.float64(nd) if a.dtype.kind == "f"
               and a.dtype.itemsize == 8 else np.float64(np.float32(nd)))
        ok = inb & ~np.equal(v, ndc)
        res = pts_pdf.loc[ok, point_cols].reset_index(drop=True)
        res[out] = v[ok]
        return res

    return (
        pts.groupBy("tile_y", "tile_x")
        .cogroup(t.groupBy("tile_y", "tile_x"))
        .applyInPandas(gather, schema=schema)
    )


def resample_nearest(
    tiles: DataFrame, row_rate: int, col_rate: int, tile: int,
    out_raster_id: str = "out",
) -> DataFrame:
    """Integer-stride nearest-neighbor downsample (the reference's
    pure-Python pixel loop, /root/reference/SpaRasters.py:1390-1498,
    as one numpy slice per tile).  ``tile`` must be divisible by the
    rates so tiles map 1:1 (the common power-of-two pyramid case);
    output tiles shrink to tile/rate."""
    if tile % row_rate or tile % col_rate:
        raise ValueError("tile size must be divisible by the rates")
    schema = tiles.schema

    has_pt = "ptype" in tiles.columns

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width, _pt(r))
                out = a[::row_rate, ::col_rate]
                row = (
                    out_raster_id, r.band, r.tile_y, r.tile_x,
                    out.shape[0], out.shape[1], r.nodata,
                    np.ascontiguousarray(out).tobytes(),
                )
                rows.append(row + (_pt(r),) if has_pt else row)
            cols = ["raster_id", "band", "tile_y", "tile_x", "height",
                    "width", "nodata", "pixels"] + (
                        ["ptype"] if has_pt else [])
            yield pd.DataFrame(rows, columns=cols)

    return tiles.mapInPandas(run, schema=schema)


def resample_bilinear(
    tiles: DataFrame, scale: int, grid: int, tile: int,
    out_raster_id: str = "out", grid_x: int | None = None,
) -> DataFrame:
    """Bilinear upsample by integer ``scale`` (the reference's
    scipy.ndimage.zoom order-1 role, /root/reference/SpaRasters.py:
    1284-1339; scipy is absent, so the kernel is direct numpy
    bilinear).  Cross-tile continuity via the 1-px halo exchange
    (terrain._halo_exchange); raster-boundary samples clamp to the
    edge (zoom's default reflect≈edge behavior at order 1 for the
    boundary half-pixel).

    Output tiles are (tile·scale)² at the same (tile_y, tile_x) grid.
    """
    if scale < 1:
        raise ValueError("bilinear path is for upsampling (scale >= 1)")
    return resample_bilinear_rational(
        tiles, scale, 1, grid, tile, out_raster_id, grid_x
    )


def resample_bilinear_rational(
    tiles: DataFrame, p: int, q: int, grid: int, tile: int,
    out_raster_id: str = "out", grid_x: int | None = None,
) -> DataFrame:
    """Bilinear resample by a RATIONAL factor p/q — the general
    scipy.ndimage.zoom(order=1) role (/root/reference/SpaRasters.py:
    1284-1339), closing the r3 verdict's non-integer-ratio gap.

    Order-1 zoom samples at out-pixel centers (j+0.5)·q/p − 0.5, so
    every sample needs only its two input neighbors regardless of the
    factor: the SAME 1-px halo exchange serves up- AND downsampling
    (no anti-alias prefilter, exactly like scipy order-1).  ``tile·p``
    must be divisible by ``q`` so tiles map 1:1 onto (tile·p/q)²
    output tiles at the same (tile_y, tile_x) keys — one shuffle, no
    re-tiling pass.

    For ``q == 1`` the sample grid is computed tile-locally (bit-
    identical to the original integer kernel — the dyadic contract
    oracles depend on that); for ``q > 1`` it is computed in GLOBAL
    pixel coordinates and shifted into the tile (exact integer
    subtraction), so the fractional weights are bit-equal to a
    whole-raster evaluation — which is what a closed-form SQL oracle
    recomputes.
    """
    rp, rq = int(p), int(q)
    if rp < 1 or rq < 1:
        raise ValueError("p and q must be positive")
    if (tile * rp) % rq:
        raise ValueError(
            f"tile*p must be divisible by q (tile={tile}, p={rp}, q={rq})"
        )
    from .terrain import _halo_exchange

    msgs = _halo_exchange(tiles, grid, grid_x)
    out_schema = tiles.schema
    ts = tile * rp // rq

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
        # edge-clamped halo (boundary) or real neighbor strip
        p[0, 1:-1] = have[(-1, 0)][-1] if (-1, 0) in have else a[0]
        p[-1, 1:-1] = have[(1, 0)][0] if (1, 0) in have else a[-1]
        p[1:-1, 0] = have[(0, -1)][:, -1] if (0, -1) in have else a[:, 0]
        p[1:-1, -1] = have[(0, 1)][:, 0] if (0, 1) in have else a[:, -1]
        for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
            yy = 0 if dy < 0 else h + 1
            xx = 0 if dx < 0 else w + 1
            ry = 0 if dy < 0 else -1
            rx = 0 if dx < 0 else -1
            if (dy, dx) in have:
                p[yy, xx] = have[(dy, dx)][ry, rx]
            elif (0, dx) in have:
                # at top/bottom raster edge: edge-clamp from the real
                # side strip (matches np.pad edge on the whole raster)
                p[yy, xx] = have[(0, dx)][ry, rx]
            elif (dy, 0) in have:
                p[yy, xx] = have[(dy, 0)][ry, rx]
            else:
                p[yy, xx] = p[1 if dy < 0 else h, 1 if dx < 0 else w]
        if (h * rp) % rq or (w * rp) % rq:
            raise ValueError(
                f"partial tile {h}x{w} not divisible under ratio {rp}/{rq}"
            )
        oh, ow = h * rp // rq, w * rp // rq
        # sample coords in padded space: global half-pixel alignment
        if rq == 1:
            oy = (np.arange(oh) + 0.5) / rp - 0.5 + 1.0
            ox = (np.arange(ow) + 0.5) / rp - 0.5 + 1.0
            y0 = np.floor(oy).astype(np.int64)
            x0 = np.floor(ox).astype(np.int64)
            fy = (oy - y0)[:, None]
            fx = (ox - x0)[None, :]
        else:
            # floor/frac on the PURE global in-coordinate — adding the
            # pad/tile offsets to the float first can round across an
            # integer at binade boundaries and flip a weight by 1 ulp
            # vs a whole-raster evaluation; the index shift into the
            # tile is integer arithmetic instead (exact)
            gy = np.arange(ty * ts, ty * ts + oh, dtype=np.float64)
            gx = np.arange(tx * ts, tx * ts + ow, dtype=np.float64)
            oy = (gy + 0.5) * float(rq) / float(rp) - 0.5
            ox = (gx + 0.5) * float(rq) / float(rp) - 0.5
            yg = np.floor(oy).astype(np.int64)
            xg = np.floor(ox).astype(np.int64)
            fy = (oy - yg)[:, None]
            fx = (ox - xg)[None, :]
            y0 = yg - ty * tile + 1
            x0 = xg - tx * tile + 1
        out = (
            p[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
            + p[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
            + p[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
            + p[np.ix_(y0 + 1, x0 + 1)] * fy * fx
        )
        return pd.DataFrame([{
            "raster_id": out_raster_id, "band": band, "tile_y": ty,
            "tile_x": tx, "height": oh, "width": ow,
            "nodata": float(center.nodata),
            "pixels": out.astype("<f4").tobytes(),
        }])

    return msgs.groupBy("raster_id", "band", "tile_y", "tile_x").applyInPandas(
        assemble, schema=out_schema
    )


def crop_pixels_aligned(
    tiles: DataFrame,
    px0: int,
    py0: int,
    px1: int,
    py1: int,
    tile: int,
    out_raster_id: str | None = None,
) -> DataFrame:
    """Crop re-tiled onto a CLEAN destination grid: output tile (0,0)
    starts exactly at the window origin and every tile is ``tile``²
    except the last row/column.  Unlike :func:`crop_pixels` (source-
    aligned slices, reference ExtractByPixels parity), this variant is
    grid-normalizing — the alignment contract joins/map-algebra need.

    One shuffle keyed by destination tile; each source tile contributes
    ≤4 sub-blocks, so cost is tile-local and size-independent."""
    W, H = px1 - px0, py1 - py0
    t0x, t1x = px0 // tile, (px1 - 1) // tile
    t0y, t1y = py0 // tile, (py1 - 1) // tile
    pruned = tiles.where(
        (F.col("tile_x") >= t0x) & (F.col("tile_x") <= t1x)
        & (F.col("tile_y") >= t0y) & (F.col("tile_y") <= t1y)
    )
    msg_schema = StructType([
        StructField("raster_id", tiles.schema["raster_id"].dataType, False),
        StructField("band", tiles.schema["band"].dataType, False),
        StructField("tile_y", IntegerType(), False),
        StructField("tile_x", IntegerType(), False),
        StructField("oy", IntegerType(), False),
        StructField("ox", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("nodata", tiles.schema["nodata"].dataType, False),
        StructField("pixels", BinaryType(), False),
    ])

    def emit(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                gx0, gy0 = r.tile_x * tile, r.tile_y * tile
                sx0, sy0 = max(px0 - gx0, 0), max(py0 - gy0, 0)
                sx1, sy1 = min(px1 - gx0, r.width), min(py1 - gy0, r.height)
                if sx1 <= sx0 or sy1 <= sy0:
                    continue
                a = _buf(r.pixels, r.height, r.width)
                rid = out_raster_id or r.raster_id
                y = sy0
                while y < sy1:
                    dty = (gy0 + y - py0) // tile
                    ylim = min(sy1, (dty + 1) * tile + py0 - gy0)
                    x = sx0
                    while x < sx1:
                        dtx = (gx0 + x - px0) // tile
                        xlim = min(sx1, (dtx + 1) * tile + px0 - gx0)
                        sub = np.ascontiguousarray(a[y:ylim, x:xlim])
                        rows.append((
                            rid, r.band, int(dty), int(dtx),
                            int((gy0 + y - py0) % tile),
                            int((gx0 + x - px0) % tile),
                            sub.shape[0], sub.shape[1], r.nodata,
                            sub.tobytes(),
                        ))
                        x = xlim
                    y = ylim
            yield pd.DataFrame(rows, columns=[
                "raster_id", "band", "tile_y", "tile_x", "oy", "ox",
                "height", "width", "nodata", "pixels"])

    msgs = pruned.mapInPandas(emit, schema=msg_schema)
    out_schema = tiles.schema

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid, band, dty, dtx = key
        h = min(tile, H - int(dty) * tile)
        w = min(tile, W - int(dtx) * tile)
        nd = float(pdf["nodata"].iloc[0])
        out = np.full((h, w), np.float32(nd), dtype="<f4")
        for r in pdf.itertuples(index=False):
            a = _buf(r.pixels, r.height, r.width)
            out[r.oy : r.oy + r.height, r.ox : r.ox + r.width] = a
        return pd.DataFrame([{
            "raster_id": rid, "band": band, "tile_y": int(dty),
            "tile_x": int(dtx), "height": h, "width": w, "nodata": nd,
            "pixels": out.tobytes(),
        }])

    return msgs.groupBy("raster_id", "band", "tile_y", "tile_x").applyInPandas(
        assemble, schema=out_schema
    )


def split_tiles(
    tiles: DataFrame, src_tile: int, dst_tile: int,
    out_raster_id: str | None = None,
) -> DataFrame:
    """Re-tile DOWN: split nominal ``src_tile``² tiles into ``dst_tile``²
    tiles (``src_tile`` a multiple of ``dst_tile``).  Pure per-row
    slicing — NO shuffle (each source tile maps to a whole number of
    destination tiles); the cheap half of a general retiler, which is
    all the upsample→align path needs."""
    if src_tile % dst_tile:
        raise ValueError("src_tile must be a multiple of dst_tile")
    f = src_tile // dst_tile
    schema = tiles.schema

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width)
                rid = out_raster_id or r.raster_id
                for sy in range(0, r.height, dst_tile):
                    for sx in range(0, r.width, dst_tile):
                        sub = np.ascontiguousarray(
                            a[sy : sy + dst_tile, sx : sx + dst_tile]
                        )
                        rows.append((
                            rid, r.band,
                            r.tile_y * f + sy // dst_tile,
                            r.tile_x * f + sx // dst_tile,
                            sub.shape[0], sub.shape[1], r.nodata,
                            sub.tobytes(),
                        ))
            yield pd.DataFrame(rows, columns=[
                "raster_id", "band", "tile_y", "tile_x", "height", "width",
                "nodata", "pixels"])

    return tiles.mapInPandas(run, schema=schema)


def apply_mask_union(
    tiles_a: DataFrame, tiles_b: DataFrame, out_raster_id: str | None = None
) -> DataFrame:
    """A's pixels with the UNION mask: a cell is nodata in the output
    wherever EITHER raster is nodata (each side tested against its OWN
    nodata) — the reference's mask-OR step
    (/root/reference/SpaRasters.py:2149-2160).  Tile-aligned equi-join,
    values unchanged elsewhere."""
    b = tiles_b.select(
        *_TILE_KEY, F.col("pixels").alias("pixels_b"),
        F.col("nodata").alias("nodata_b"),
    )
    j = tiles_a.join(b, _TILE_KEY)
    schema = tiles_a.schema

    def run(batches):
        for pdf in batches:
            outs = []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width)
                bb = _buf(r.pixels_b, r.height, r.width)
                mask = np.equal(a, np.float32(r.nodata)) | np.equal(
                    bb, np.float32(r.nodata_b)
                )
                outs.append(
                    np.where(mask, np.float32(r.nodata), a).tobytes()
                )
            res = pdf.drop(columns=["pixels_b", "nodata_b"]).copy()
            res["pixels"] = outs
            if out_raster_id is not None:
                res["raster_id"] = out_raster_id
            yield res

    return j.mapInPandas(run, schema=schema)


def resample_to_match(
    tiles_a: DataFrame,
    gt_a: tuple,
    size_a: tuple,
    tiles_b: DataFrame,
    gt_b: tuple,
    size_b: tuple,
    tile: int,
) -> tuple[DataFrame, DataFrame, tuple]:
    """Reference ResampleToMatch (/root/reference/SpaRasters.py:
    2088-2165): crop both rasters to their overlap, bring them to a
    common resolution, and OR the nodata masks into both.

    Follows the reference CODE (not its docstring): the coarser raster
    is zoomed UP to the finer's resolution (Resample factor
    res_coarse/res_fine > 1), order-1/bilinear.  Supported ratio:
    integer multiples (the pyramid case); other ratios raise.  The
    upsampled side re-tiles by pure per-row splitting (no shuffle), so
    the whole composition costs: 2 pruned crops + 1 halo shuffle + 2
    tile-aligned joins — independent of raster size per partition.

    ``size_* = (width, height)`` pixels; both rasters north-up.
    Returns (a_matched, b_matched, gt_out) on the finer grid, both
    carrying the union mask.
    """
    pw_a, ph_a = gt_a[1], gt_a[5]
    pw_b, ph_b = gt_b[1], gt_b[5]
    # intersection bounds in model space
    ax0, ay0 = gt_a[0], gt_a[3]
    bx0, by0 = gt_b[0], gt_b[3]
    x0 = max(ax0, bx0)
    x1 = min(ax0 + size_a[0] * pw_a, bx0 + size_b[0] * pw_b)
    y0 = min(ay0, by0)  # top (ph negative)
    y1 = max(ay0 + size_a[1] * ph_a, by0 + size_b[1] * ph_b)
    if x1 <= x0 or y1 >= y0:
        raise ValueError("rasters do not overlap")

    fine_first = abs(pw_a) <= abs(pw_b)
    pw_f = pw_a if fine_first else pw_b
    pw_c = pw_b if fine_first else pw_a
    ratio = abs(pw_c) / abs(pw_f)
    scale = int(round(ratio))
    if abs(ratio - scale) > 1e-9:
        raise NotImplementedError(
            f"non-integer resolution ratio {ratio} (pyramid case only)"
        )

    def _win(gt, X0, Y0, X1, Y1):
        px0 = int(round((X0 - gt[0]) / gt[1]))
        py0 = int(round((Y0 - gt[3]) / gt[5]))
        px1 = int(round((X1 - gt[0]) / gt[1]))
        py1 = int(round((Y1 - gt[3]) / gt[5]))
        return px0, py0, px1, py1

    # snap the window to COARSE pixels (reference Crop snaps to pixel
    # indices of each raster; a shared coarse snap keeps the two crops
    # describing the same model-space rectangle)
    gt_cc = gt_a if not fine_first else gt_b
    cx0, cy0, cx1, cy1 = _win(gt_cc, x0, y0, x1, y1)
    X0, Y0 = gt_cc[0] + cx0 * gt_cc[1], gt_cc[3] + cy0 * gt_cc[5]
    X1, Y1 = gt_cc[0] + cx1 * gt_cc[1], gt_cc[3] + cy1 * gt_cc[5]

    a_win = _win(gt_a, X0, Y0, X1, Y1)
    b_win = _win(gt_b, X0, Y0, X1, Y1)
    # aligned crops: both sides land on clean (0,0)-origin tile grids,
    # so after the upsample+split the tile keys correspond 1:1
    a2 = crop_pixels_aligned(
        tiles_a, a_win[0], a_win[1], a_win[2], a_win[3], tile
    )
    b2 = crop_pixels_aligned(
        tiles_b, b_win[0], b_win[1], b_win[2], b_win[3], tile
    )

    if scale > 1:
        coarse = b2 if fine_first else a2
        cw = (b_win if fine_first else a_win)
        n_ty = -(-(cw[3] - cw[1]) // tile)
        n_tx = -(-(cw[2] - cw[0]) // tile)
        up = resample_bilinear(
            coarse, scale, grid=n_ty, tile=tile,
            out_raster_id="up", grid_x=n_tx,
        )
        up = split_tiles(up, tile * scale, tile)
        if fine_first:
            b2 = up
        else:
            a2 = up

    gt_out = (X0, pw_f, 0.0, Y0, 0.0, -abs(pw_f) if ph_a < 0 else abs(pw_f))
    a3 = apply_mask_union(a2, b2)
    b3 = apply_mask_union(b2, a2)
    return a3, b3, gt_out


def trace_mask_rings(mask: np.ndarray):
    """Pixel-exact rectilinear boundary rings of a binary mask.

    Walks the unit edges between True and False pixels (interior kept
    on the LEFT), chaining them into closed rings: one CCW exterior per
    connected component plus CW hole rings.  Coordinates are in pixel
    units (pixel (x, y) spans [x, x+1] × [y, y+1]) — this is exactly
    GDAL Polygonize's rectilinear output geometry
    (/root/reference/SpaRasters.py:827-882).
    """
    h, w = mask.shape
    m = np.zeros((h + 2, w + 2), dtype=bool)
    m[1:-1, 1:-1] = mask
    # directed boundary edges, interior on the left of travel direction:
    #  - pixel above empty → edge along its top, traveling +x
    #  - below empty → bottom edge, traveling −x
    #  - left empty → left edge, traveling −y (up)... in raster coords
    #    (+y down) interior-left means: top: +x, right: +y, bottom: −x,
    #    left: −y
    from collections import defaultdict

    edges: dict[tuple, list] = defaultdict(list)
    ys, xs = np.nonzero(mask)
    for y, x in zip(ys.tolist(), xs.tolist()):
        if not m[y, x + 1]:  # above empty
            edges[(x, y)].append((x + 1, y))
        if not m[y + 2, x + 1]:  # below empty
            edges[(x + 1, y + 1)].append((x, y + 1))
        if not m[y + 1, x + 2]:  # right empty
            edges[(x + 1, y)].append((x + 1, y + 1))
        if not m[y + 1, x]:  # left empty
            edges[(x, y + 1)].append((x, y))

    def pop_next(node, din):
        """At pinch vertices prefer the sharpest LEFT turn relative to
        the incoming direction so touching components stay separate."""
        outs = edges.get(node)
        if not outs:
            return None
        if len(outs) == 1 or din is None:
            nxt = outs.pop()
        else:
            # rank: left turn < straight < right turn (never reverse)
            def rank(cand):
                dx, dy = cand[0] - node[0], cand[1] - node[1]
                cross = din[0] * dy - din[1] * dx
                dot = din[0] * dx + din[1] * dy
                if cross > 0:
                    return 0  # left (raster coords: +y down, CCW-left)
                if dot > 0:
                    return 1  # straight
                return 2
            outs.sort(key=rank)
            nxt = outs.pop(0)
        if not outs:
            edges.pop(node, None)
        return nxt

    rings = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        node = start
        din = None
        while True:
            nxt = pop_next(node, din)
            if nxt is None:
                break  # should not happen for well-formed masks
            din = (nxt[0] - node[0], nxt[1] - node[1])
            ring.append(nxt)
            node = nxt
            if node == start:
                break
        # collapse collinear runs
        pts = np.array(ring, dtype=np.float64)
        keep = [0]
        for i in range(1, len(pts) - 1):
            a, b, c = pts[keep[-1]], pts[i], pts[i + 1]
            if (b[0] - a[0]) * (c[1] - b[1]) != (b[1] - a[1]) * (c[0] - b[0]):
                keep.append(i)
        pts = np.vstack([pts[keep], pts[:1]])
        rings.append(pts)
    return rings


def polygonize_tiles(
    tiles: DataFrame, geotransform: tuple, tile: int,
) -> DataFrame:
    """Per-tile polygonize: 4-connected components of equal-valued
    pixels → one bbox-accurate boundary polygon per component
    (reference: gdal.Polygonize wrapper, /root/reference/
    SpaRasters.py:827-882, SpaRasterVectors.py:36-47).

    v1 scope: components are resolved per tile (cross-tile dissolve of
    same-valued touching components is the cell-join v2 noted in
    SURVEY §2.8); rings are pixel-exact rectilinear hulls via the
    marching-edges trace.  Output: (raster_id, band, value, n_pixels,
    geometry WKB Polygon in CRS coords).
    """
    from pyspark.sql.types import (
        BinaryType, DoubleType, LongType, StructField, StructType,
    )

    from ..geometry import wkb as _wkb

    x0, pw, _, y0, _, ph = geotransform
    out_schema = StructType([
        StructField("raster_id", tiles.schema["raster_id"].dataType, False),
        StructField("band", tiles.schema["band"].dataType, False),
        StructField("value", DoubleType(), False),
        StructField("n_pixels", LongType(), False),
        StructField("geometry", BinaryType(), False),
    ])

    def _components(a: np.ndarray, nodata: float):
        """4-connected labeling via iterative flood (numpy BFS)."""
        h, w = a.shape
        labels = np.full((h, w), -1, dtype=np.int64)
        nxt = 0
        for sy in range(h):
            for sx in range(w):
                if labels[sy, sx] != -1 or a[sy, sx] == np.float32(nodata):
                    continue
                v = a[sy, sx]
                stack = [(sy, sx)]
                labels[sy, sx] = nxt
                while stack:
                    cy, cx = stack.pop()
                    for ny, nx_ in ((cy-1, cx), (cy+1, cx), (cy, cx-1),
                                    (cy, cx+1)):
                        if (0 <= ny < h and 0 <= nx_ < w
                                and labels[ny, nx_] == -1
                                and a[ny, nx_] == v):
                            labels[ny, nx_] = nxt
                            stack.append((ny, nx_))
                nxt += 1
        return labels, nxt

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width)
                labels, n = _components(a, r.nodata)
                gx0, gy0 = r.tile_x * tile, r.tile_y * tile
                for lab in range(n):
                    m = labels == lab
                    npx = int(m.sum())
                    ys, xs = np.nonzero(m)
                    v = float(a[ys[0], xs[0]])
                    # pixel-exact rectilinear boundary (GDAL Polygonize
                    # geometry), pixel corners → CRS coords
                    rings_px = trace_mask_rings(m)
                    rings_crs = []
                    for rg in rings_px:
                        c = np.empty_like(rg)
                        c[:, 0] = x0 + (gx0 + rg[:, 0]) * pw
                        c[:, 1] = y0 + (gy0 + rg[:, 1]) * ph
                        rings_crs.append(c)
                    # exterior = largest |area| ring; rest are holes
                    from ..geometry.kernels import ring_signed_area

                    rings_crs.sort(
                        key=lambda rr: -abs(ring_signed_area(rr))
                    )
                    geom = {"type": "Polygon", "coordinates": rings_crs}
                    rows.append((
                        r.raster_id, r.band, v, npx, _wkb.dumps(geom),
                    ))
            yield pd.DataFrame(rows, columns=[
                "raster_id", "band", "value", "n_pixels", "geometry"])

    return tiles.mapInPandas(run, schema=out_schema)


def polygonize_dissolved(
    tiles: DataFrame, geotransform: tuple, tile: int,
    max_iters: int = 20,
    driver_max_edges: int = 2_000_000,
) -> DataFrame:
    """Cross-tile polygonize: per-tile connected components dissolved
    across tile borders (the v2 refinement of :func:`polygonize_tiles`;
    reference gdal.Polygonize operates on the whole raster,
    /root/reference/SpaRasters.py:827-882).

    Plan: per-tile components with globally-unique labels + their
    border-pixel runs → equivalence edges from adjacent border pixels
    with equal values (one self-join on the shared border key) →
    equivalence resolution → per-component aggregate (value, n_pixels,
    bbox geometry union).  Resolution is hybrid: edge sets up to
    ``driver_max_edges`` (edges are per border RUN, not per pixel —
    bounded even for huge rasters) collect to a driver union-find and
    broadcast ONE label→root map (2 jobs); larger graphs fall back to
    iterative min-label propagation (O(component diameter) rounds of
    joins, nothing collected).
    """
    from pyspark.sql.types import (
        BinaryType, DoubleType, LongType, StructField, StructType,
    )

    from ..geometry import wkb as _wkb

    x0, pw, _, y0, _, ph = geotransform
    spark = tiles.sparkSession

    comp_schema = StructType([
        StructField("raster_id", tiles.schema["raster_id"].dataType, False),
        StructField("band", tiles.schema["band"].dataType, False),
        StructField("label", LongType(), False),
        StructField("value", DoubleType(), False),
        StructField("n_pixels", LongType(), False),
        StructField("minx", LongType(), False),
        StructField("miny", LongType(), False),
        StructField("maxx", LongType(), False),
        StructField("maxy", LongType(), False),
    ])
    # border runs: (raster, band, side-key, global pixel pos, value, label)
    edge_schema = StructType([
        StructField("raster_id", tiles.schema["raster_id"].dataType, False),
        StructField("band", tiles.schema["band"].dataType, False),
        StructField("bkey", LongType(), False),
        StructField("pos", LongType(), False),
        StructField("value", DoubleType(), False),
        StructField("label", LongType(), False),
    ])

    def _components(a: np.ndarray, nodata: float):
        h, w = a.shape
        labels = np.full((h, w), -1, dtype=np.int64)
        nxt = 0
        for sy in range(h):
            for sx in range(w):
                if labels[sy, sx] != -1 or a[sy, sx] == np.float32(nodata):
                    continue
                v = a[sy, sx]
                stack = [(sy, sx)]
                labels[sy, sx] = nxt
                while stack:
                    cy, cx = stack.pop()
                    for ny, nx_ in ((cy-1, cx), (cy+1, cx), (cy, cx-1),
                                    (cy, cx+1)):
                        if (0 <= ny < h and 0 <= nx_ < w
                                and labels[ny, nx_] == -1
                                and a[ny, nx_] == v):
                            labels[ny, nx_] = nxt
                            stack.append((ny, nx_))
                nxt += 1
        return labels, nxt

    def emit(batches):
        for pdf in batches:
            crows, erows = [], []
            for r in pdf.itertuples(index=False):
                a = _buf(r.pixels, r.height, r.width)
                labels, n = _components(a, r.nodata)
                gx0, gy0 = r.tile_x * tile, r.tile_y * tile
                base = ((r.tile_y * 100_000 + r.tile_x) << 24)
                for lab in range(n):
                    m = labels == lab
                    ys, xs = np.nonzero(m)
                    crows.append((
                        r.raster_id, r.band, base + lab,
                        float(a[ys[0], xs[0]]), int(m.sum()),
                        int(gx0 + xs.min()), int(gy0 + ys.min()),
                        int(gx0 + xs.max()), int(gy0 + ys.max()),
                    ))
                # border runs on all 4 sides; bkey identifies a shared
                # border line: vertical x-boundary at X → 2*X, horizontal
                # y-boundary at Y → 2*Y+1 (disjoint keyspaces)
                h, w = a.shape
                for side, ky, kx, posa in (
                    ("t", 0, None, None), ("b", h - 1, None, None),
                    ("l", None, 0, None), ("r", None, w - 1, None),
                ):
                    if ky is not None:
                        sel = labels[ky, :]
                        gy = gy0 + ky
                        boundary = gy if side == "t" else gy + 1
                        for xx in np.nonzero(sel >= 0)[0]:
                            erows.append((
                                r.raster_id, r.band,
                                2 * int(boundary) + 1, int(gx0 + xx),
                                float(a[ky, xx]), base + int(sel[xx]),
                            ))
                    else:
                        sel = labels[:, kx]
                        gx = gx0 + kx
                        boundary = gx if side == "l" else gx + 1
                        for yy in np.nonzero(sel >= 0)[0]:
                            erows.append((
                                r.raster_id, r.band,
                                2 * int(boundary), int(gy0 + yy),
                                float(a[yy, kx]), base + int(sel[yy]),
                            ))
            yield pd.DataFrame(crows, columns=[f.name for f in comp_schema]
                               ), pd.DataFrame(
                erows, columns=[f.name for f in edge_schema])

    # materialize both streams once (two passes over tiles is simpler
    # than a tagged union; tile scans are cheap vs the label loop)
    def emit_comps(batches):
        for c, _ in emit(batches):
            yield c

    def emit_edges(batches):
        for _, e in emit(batches):
            yield e

    comps = tiles.mapInPandas(emit_comps, schema=comp_schema).cache()
    borders = tiles.mapInPandas(emit_edges, schema=edge_schema)
    # equivalence pairs: same boundary line, same pixel pos, same value
    l_ = borders.select("raster_id", "band", "bkey", "pos", "value",
                        F.col("label").alias("la"))
    r_ = borders.select("raster_id", "band", "bkey", "pos", "value",
                        F.col("label").alias("lb"))
    pairs = l_.join(r_, ["raster_id", "band", "bkey", "pos", "value"]).where(
        F.col("la") != F.col("lb")
    ).select("raster_id", "band", "la", "lb").distinct().cache()
    # equivalence resolution, two physical strategies:
    # (a) bounded edge sets (the overwhelming case — edges are per
    #     BORDER-pixel-run, not per pixel) collect to the driver for a
    #     union-find + one broadcast-joined mapping: 2 jobs total;
    # (b) otherwise the iterative min-label propagation below —
    #     O(component diameter) rounds of joins, never collects.
    n_edges = pairs.count()
    if n_edges <= driver_max_edges:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for e in pairs.collect():
            a = (e["raster_id"], e["band"], e["la"])
            b = (e["raster_id"], e["band"], e["lb"])
            ra, rb = find(a), find(b)
            if ra != rb:
                # min root wins (same answer as the iterative pass)
                lo, hi = (ra, rb) if ra <= rb else (rb, ra)
                parent[hi] = lo
        rows = []
        for k in list(parent):
            rt = find(k)
            if rt != k:
                rows.append((k[0], k[1], k[2], rt[2]))
        if rows:
            mapping = F.broadcast(spark.createDataFrame(
                [(r, b_, l_, rt) for r, b_, l_, rt in rows],
                schema=StructType([
                    StructField("raster_id",
                                tiles.schema["raster_id"].dataType, False),
                    StructField("band", tiles.schema["band"].dataType,
                                False),
                    StructField("label", LongType(), False),
                    StructField("root", LongType(), False),
                ]),
            ))
            merged_map = comps.join(
                mapping, ["raster_id", "band", "label"], "left"
            ).select(
                "raster_id", "band", "label",
                F.coalesce(F.col("root"), F.col("label")).alias("root"),
                "value", "n_pixels", "minx", "miny", "maxx", "maxy",
            )
        else:
            merged_map = comps.withColumn("root", F.col("label"))
        merged = merged_map.groupBy(
            "raster_id", "band", "root", "value"
        ).agg(
            F.sum("n_pixels").alias("n_pixels"),
            F.min("minx").alias("minx"), F.min("miny").alias("miny"),
            F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"),
        )
        return _dissolved_to_geom(merged, tiles, x0, pw, y0, ph)
    # min-label propagation to fixpoint
    mapping = comps.select(
        "raster_id", "band", F.col("label"), F.col("label").alias("root")
    )
    for _ in range(max_iters):
        prop = (
            mapping.alias("m")
            .join(
                pairs.alias("p"),
                (F.col("m.raster_id") == F.col("p.raster_id"))
                & (F.col("m.band") == F.col("p.band"))
                & (F.col("m.label") == F.col("p.la")),
                "left",
            )
            .groupBy("m.raster_id", "m.band", "m.label")
            .agg(F.min(F.col("m.root")).alias("self_root"))
        )
        # neighbor roots
        nbr = (
            pairs.alias("p")
            .join(
                mapping.alias("m2"),
                (F.col("p.raster_id") == F.col("m2.raster_id"))
                & (F.col("p.band") == F.col("m2.band"))
                & (F.col("p.lb") == F.col("m2.label")),
            )
            .groupBy(
                F.col("p.raster_id").alias("raster_id"),
                F.col("p.band").alias("band"),
                F.col("p.la").alias("label"),
            )
            .agg(F.min("m2.root").alias("nbr_root"))
        )
        new_mapping = (
            prop.withColumnRenamed("self_root", "root")
            .join(nbr, ["raster_id", "band", "label"], "left")
            .select(
                "raster_id", "band", "label",
                F.least(
                    F.col("root"),
                    F.coalesce(F.col("nbr_root"), F.col("root")),
                ).alias("root"),
            )
        ).cache()
        changed = (
            new_mapping.alias("n")
            .join(mapping.alias("o"), ["raster_id", "band", "label"])
            .where(F.col("n.root") != F.col("o.root"))
            .limit(1)
            .count()
        )
        mapping = new_mapping
        if changed == 0:
            break
    merged = (
        comps.join(mapping, ["raster_id", "band", "label"])
        .groupBy("raster_id", "band", "root", "value")
        .agg(
            F.sum("n_pixels").alias("n_pixels"),
            F.min("minx").alias("minx"), F.min("miny").alias("miny"),
            F.max("maxx").alias("maxx"), F.max("maxy").alias("maxy"),
        )
    )
    return _dissolved_to_geom(merged, tiles, x0, pw, y0, ph)


def _dissolved_to_geom(merged, tiles, x0, pw, y0, ph):
    """Final bbox-geometry projection shared by both dissolve
    strategies (driver union-find and iterative min-label)."""
    from pyspark.sql.types import (
        BinaryType, DoubleType, LongType, StructField, StructType,
    )

    from ..geometry import wkb as _wkb

    out_schema = StructType([
        StructField("raster_id", tiles.schema["raster_id"].dataType, False),
        StructField("band", tiles.schema["band"].dataType, False),
        StructField("value", DoubleType(), False),
        StructField("n_pixels", LongType(), False),
        StructField("geometry", BinaryType(), False),
    ])

    def to_geom(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                lx0 = x0 + r.minx * pw
                lx1 = x0 + (r.maxx + 1) * pw
                ly0 = y0 + r.miny * ph
                ly1 = y0 + (r.maxy + 1) * ph
                ring = [[lx0, ly0], [lx1, ly0], [lx1, ly1], [lx0, ly1]]
                rows.append((r.raster_id, r.band, r.value, r.n_pixels,
                             _wkb.dumps(_wkb.polygon(ring))))
            yield pd.DataFrame(rows, columns=[
                "raster_id", "band", "value", "n_pixels", "geometry"])

    return merged.mapInPandas(to_geom, schema=out_schema)


def zonal_stats(
    samples: DataFrame,
    zone_col: str = "zone_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-zone aggregate over sampled values — plain hash agg."""
    return samples.groupBy(zone_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
        F.sum(value_col).alias("sum"),
    )
