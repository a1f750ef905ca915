"""Raster CRS warp — the reference's ``gdal.Warp`` role
(/root/reference/SpaReferencing.py:358,273 → TransformRaster), the one
SURVEY §2 component previously scoped out.

An OUTPUT-DRIVEN inverse warp, the same strategy GDAL uses, re-shaped
for a distributed tile table:

1. **dst tile keys** are generated with ``spark.range`` (never a
   driver-side list — a 100 TB raster has millions of tiles);
2. a **need-map** ``(dst_tile → src_tile)`` is computed per dst tile
   by inverse-mapping a coarse sample lattice of its pixel centers and
   padding the resulting source-pixel bbox by ``margin_px`` — a few
   dozen mapper evaluations per TILE, not per pixel;
3. source tiles are equi-joined onto the need-map on the src tile key
   — the ONLY shuffle of pixel payloads, amplified by the per-tile
   fan-out (O(1): a dst tile overlaps a handful of src tiles at
   comparable resolutions);
4. ``applyInPandas`` per dst tile assembles the local source mosaic
   and samples every output pixel center in one vectorized pass
   (nearest or bilinear), stamping nodata outside the source extent.

dst tiles that map entirely outside the source raster emit no row
(absent tile ≡ all-nodata, the engine's sparse-raster convention).

The coordinate ``mapper`` (dst CRS → src CRS, vectorized over numpy
arrays) is injected; :func:`crs_mapper` builds one from any pair of
``geometry/crs.py`` front-end strings (proj4 / EPSG).  The sample
lattice + ``margin_px`` bound the need-map for any mapping that is
smooth at tile scale — the projection families this engine carries are
all monotone-per-axis inside their valid domains, so the default 8×8
lattice with a 2-px margin is conservative.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .raster import _buf, _pt, _pts

MapperT = Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]


def crs_mapper(dst_crs, src_crs) -> MapperT:
    """dst-CRS coords → src-CRS coords via the from-scratch projection
    kernels (any ``geometry/crs.py`` front-end: proj4 string/dict or
    EPSG int).  Inverse warp maps *destination* points back into the
    *source* frame, hence (dst, src) argument order."""
    from ..geometry import crs as _crs

    def mapper(x, y):
        return _crs.transform_arrays(x, y, dst_crs, src_crs)

    return mapper


def warp_raster(
    tiles: DataFrame,
    mapper: MapperT,
    src_origin: tuple[float, float],
    src_pixel: tuple[float, float],
    src_size: tuple[int, int],
    tile: int,
    dst_origin: tuple[float, float],
    dst_pixel: tuple[float, float],
    dst_size: tuple[int, int],
    dst_tile: int,
    method: str = "nearest",
    out_raster_id: str = "warp",
    margin_px: float = 2.0,
    lattice: int = 8,
) -> DataFrame:
    """Warp a north-up tiled raster onto a new north-up grid in another
    CRS.  ``*_origin`` is the TOP-LEFT corner ``(x0, y_top)``;
    ``*_pixel`` the positive pixel sizes ``(dx, dy)`` (row y decreases);
    ``*_size`` is ``(height, width)`` in pixels.  ``method`` is
    ``nearest`` (dtype-preserving, landcover-safe) or ``bilinear``
    (f32 output, source-edge-clamped like :func:`raster.
    resample_bilinear`).  Pixel (ix, iy) has center
    ``(x0 + (ix+0.5)·dx, y_top − (iy+0.5)·dy)`` — GDAL's convention.
    """
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown method {method!r}")
    spark = tiles.sparkSession
    sx0, sy0 = float(src_origin[0]), float(src_origin[1])
    sdx, sdy = float(src_pixel[0]), float(src_pixel[1])
    sh, sw = int(src_size[0]), int(src_size[1])
    dx0, dy0 = float(dst_origin[0]), float(dst_origin[1])
    ddx, ddy = float(dst_pixel[0]), float(dst_pixel[1])
    dh, dw = int(dst_size[0]), int(dst_size[1])
    gty, gtx = -(-dh // dst_tile), -(-dw // dst_tile)
    sgty, sgtx = -(-sh // tile), -(-sw // tile)
    pad = float(margin_px) + (1.0 if method == "bilinear" else 0.0)
    bs = max(int(lattice), 2)

    keys = spark.range(gty * gtx).select(
        (F.col("id") / gtx).cast("long").alias("dty"),
        (F.col("id") % gtx).alias("dtx"),
    )

    def need(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                y_lo, x_lo = r.dty * dst_tile, r.dtx * dst_tile
                y_hi = min(dh, y_lo + dst_tile)
                x_hi = min(dw, x_lo + dst_tile)
                ys = np.linspace(y_lo + 0.5, y_hi - 0.5, bs)
                xs = np.linspace(x_lo + 0.5, x_hi - 0.5, bs)
                gx, gy = np.meshgrid(xs, ys)
                mx, my = mapper(dx0 + gx.ravel() * ddx,
                                dy0 - gy.ravel() * ddy)
                fx = (np.asarray(mx, dtype=np.float64) - sx0) / sdx
                fy = (sy0 - np.asarray(my, dtype=np.float64)) / sdy
                if not (np.all(np.isfinite(fx)) and np.all(np.isfinite(fy))):
                    continue
                tx_a = max(0, int(np.floor((fx.min() - pad) / tile)))
                tx_b = min(sgtx - 1, int(np.floor((fx.max() + pad) / tile)))
                ty_a = max(0, int(np.floor((fy.min() - pad) / tile)))
                ty_b = min(sgty - 1, int(np.floor((fy.max() + pad) / tile)))
                for sty in range(ty_a, ty_b + 1):
                    for stx in range(tx_a, tx_b + 1):
                        rows.append((r.dty, r.dtx, sty, stx))
            yield pd.DataFrame(rows, columns=["dty", "dtx", "sty", "stx"])

    need_df = keys.mapInPandas(need, schema="dty long, dtx long,"
                               " sty long, stx long")

    j = tiles.join(
        need_df,
        (tiles["tile_y"] == need_df["sty"])
        & (tiles["tile_x"] == need_df["stx"]),
    ).drop("sty", "stx")
    out_schema = tiles.schema

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid, band, dty, dtx = key
        nodata = float(pdf["nodata"].iloc[0])
        ty_a, ty_b = int(pdf["dty_sty"].min()), int(pdf["dty_sty"].max())
        tx_a, tx_b = int(pdf["dty_stx"].min()), int(pdf["dty_stx"].max())
        mh, mw = (ty_b - ty_a + 1) * tile, (tx_b - tx_a + 1) * tile
        has_pt = "ptype" in pdf.columns
        first = _buf(pdf["pixels"].iloc[0], int(pdf["height"].iloc[0]),
                     int(pdf["width"].iloc[0]),
                     pdf["ptype"].iloc[0] if has_pt else None)
        f32 = method == "bilinear" or first.dtype == np.float32
        mos = np.full((mh, mw), np.float32(nodata) if f32
                      else first.dtype.type(nodata),
                      dtype=np.float32 if f32 else first.dtype)
        for rr in pdf.itertuples(index=False):
            a = _buf(rr.pixels, rr.height, rr.width, _pt(rr))
            oy = (int(rr.dty_sty) - ty_a) * tile
            ox = (int(rr.dty_stx) - tx_a) * tile
            mos[oy:oy + rr.height, ox:ox + rr.width] = a
        y_lo, x_lo = dty * dst_tile, dtx * dst_tile
        h = min(dh, y_lo + dst_tile) - y_lo
        w = min(dw, x_lo + dst_tile) - x_lo
        gy, gx = np.mgrid[y_lo:y_lo + h, x_lo:x_lo + w]
        mx, my = mapper(dx0 + (gx + 0.5).astype(np.float64) * ddx,
                        dy0 - (gy + 0.5).astype(np.float64) * ddy)
        fx = (np.asarray(mx, dtype=np.float64) - sx0) / sdx
        fy = (sy0 - np.asarray(my, dtype=np.float64)) / sdy
        if method == "nearest":
            ix = np.floor(fx).astype(np.int64)
            iy = np.floor(fy).astype(np.int64)
            ok = (ix >= 0) & (ix < sw) & (iy >= 0) & (iy < sh)
            lx = np.clip(ix - tx_a * tile, 0, mw - 1)
            ly = np.clip(iy - ty_a * tile, 0, mh - 1)
            # a pixel inside the raster but outside the shipped mosaic
            # can only arise from a mapper non-smooth beyond margin_px
            # — it reads mosaic nodata, never out of bounds
            ok &= (ix - tx_a * tile >= 0) & (ix - tx_a * tile < mw)
            ok &= (iy - ty_a * tile >= 0) & (iy - ty_a * tile < mh)
            out = np.where(ok, mos[ly, lx],
                           mos.dtype.type(nodata)).astype(mos.dtype)
            payload = (out.astype("<f4") if f32
                       else out.astype(out.dtype.newbyteorder("<")))
        else:
            inside = (fx >= 0) & (fx <= sw) & (fy >= 0) & (fy <= sh)
            xf, yf = fx - 0.5, fy - 0.5
            x0f = np.floor(xf)
            y0f = np.floor(yf)
            wx = xf - x0f
            wy = yf - y0f
            x0 = np.clip(x0f.astype(np.int64), 0, sw - 1)
            y0 = np.clip(y0f.astype(np.int64), 0, sh - 1)
            x1 = np.clip(x0 + 1, 0, sw - 1)
            y1 = np.clip(y0 + 1, 0, sh - 1)

            def gather(yy, xx):
                lyy = np.clip(yy - ty_a * tile, 0, mh - 1)
                lxx = np.clip(xx - tx_a * tile, 0, mw - 1)
                return mos[lyy, lxx].astype(np.float64)

            v00, v01 = gather(y0, x0), gather(y0, x1)
            v10, v11 = gather(y1, x0), gather(y1, x1)
            bad = (
                np.equal(v00, np.float32(nodata))
                | np.equal(v01, np.float32(nodata))
                | np.equal(v10, np.float32(nodata))
                | np.equal(v11, np.float32(nodata))
                | ~inside
            )
            val = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
                   + v10 * wy * (1 - wx) + v11 * wy * wx)
            payload = np.where(bad, np.float64(nodata),
                               val).astype("<f4")
        orow = {
            "raster_id": out_raster_id, "band": band, "tile_y": int(dty),
            "tile_x": int(dtx), "height": h, "width": w,
            "nodata": nodata, "pixels": payload.tobytes(),
        }
        if has_pt:
            orow["ptype"] = _pts(payload)
        return pd.DataFrame([orow])

    # keep the need-map key columns past the groupBy under stable names
    j = j.withColumnRenamed("dty", "__dty").withColumnRenamed(
        "dtx", "__dtx")

    def assemble_wrap(key, pdf):
        pdf = pdf.rename(columns={
            "tile_y": "dty_sty", "tile_x": "dty_stx"})
        return assemble(key, pdf)

    return (
        j.groupBy("raster_id", "band", "__dty", "__dtx")
        .applyInPandas(assemble_wrap, schema=out_schema)
    )
