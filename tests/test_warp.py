"""Raster CRS warp (operators/warp.py) — parity against whole-raster
numpy evaluations of the identical sampling, plus the straddle-margin
guarantee the contract oracle depends on."""

import numpy as np
import pytest

from spapy_spark.geometry import crs
from spapy_spark.operators import warp
from spapy_spark.sources import synth

R = 6378137.0
SRC0 = (-2.0e7, 2.0e7)      # top-left of the mercator source grid
SPX = (156250.0, 156250.0)  # 4e7 / 256
DST0 = (-175.0, 83.0)       # top-left of the geographic dst grid
DPX = (350.0 / 256, 166.0 / 256)


def _alg_array(h=256, w=256):
    gy, gx = np.mgrid[0:h, 0:w]
    return synth.alg_value(gx.astype(np.int64), gy.astype(np.int64))


def _collect(out, dh, dw, dst_tile, dtype="<f4"):
    got = np.full((dh, dw), np.nan, dtype=np.float64)
    n = 0
    for r in out.collect():
        a = np.frombuffer(bytes(r["pixels"]), dtype=dtype).reshape(
            r["height"], r["width"]
        )
        y0, x0 = r["tile_y"] * dst_tile, r["tile_x"] * dst_tile
        got[y0:y0 + r["height"], x0:x0 + r["width"]] = a
        n += 1
    return got, n


def test_warp_identity_nearest(spark):
    """Identity mapper on the identical grid reproduces the source
    bit-exactly — the warp machinery adds zero resampling error."""
    tiles = synth.alg_raster_tiles(spark)
    H = synth.GRID * synth.TILE

    out = warp.warp_raster(
        tiles, lambda x, y: (x, y),
        src_origin=(0.0, float(H)), src_pixel=(1.0, 1.0),
        src_size=(H, H), tile=synth.TILE,
        dst_origin=(0.0, float(H)), dst_pixel=(1.0, 1.0),
        dst_size=(H, H), dst_tile=synth.TILE,
    )
    got, n = _collect(out, H, H, synth.TILE)
    assert n == synth.GRID * synth.GRID
    np.testing.assert_array_equal(got, _alg_array().astype(np.float64))


def _expected_nearest(dh, dw, mapper, src):
    gy, gx = np.mgrid[0:dh, 0:dw]
    mx, my = mapper(DST0[0] + (gx + 0.5) * DPX[0],
                    DST0[1] - (gy + 0.5) * DPX[1])
    fx = (mx - SRC0[0]) / SPX[0]
    fy = (SRC0[1] - my) / SPX[1]
    ix = np.floor(fx).astype(np.int64)
    iy = np.floor(fy).astype(np.int64)
    ok = (ix >= 0) & (ix < 256) & (iy >= 0) & (iy < 256)
    out = np.where(ok, src[np.clip(iy, 0, 255), np.clip(ix, 0, 255)],
                   np.float32(synth.NODATA))
    return out.astype(np.float64)


def test_warp_mercator_nearest_parity(spark):
    """EPSG:3857 source → EPSG:4326 grid through the real crs kernels,
    bit-equal to a whole-raster evaluation of the same mapping."""
    tiles = synth.alg_raster_tiles(spark)
    mapper = warp.crs_mapper("epsg:4326", "epsg:3857")
    out = warp.warp_raster(
        tiles, mapper,
        src_origin=SRC0, src_pixel=SPX, src_size=(256, 256),
        tile=synth.TILE,
        dst_origin=DST0, dst_pixel=DPX, dst_size=(256, 256), dst_tile=64,
    )
    got, _ = _collect(out, 256, 256, 64)
    np.testing.assert_array_equal(got, _expected_nearest(
        256, 256, mapper, _alg_array()))


def test_warp_nodata_outside_and_partial_tiles(spark):
    """A dst grid poking beyond the source extent (lat ±88 exceeds
    mercator y ±2e7) stamps nodata outside, and a 200² dst with 64-px
    tiles exercises partial edge tiles."""
    tiles = synth.alg_raster_tiles(spark)
    mapper = warp.crs_mapper("epsg:4326", "epsg:3857")
    d0, dp = (-179.0, 88.0), (358.0 / 200, 176.0 / 200)
    out = warp.warp_raster(
        tiles, mapper,
        src_origin=SRC0, src_pixel=SPX, src_size=(256, 256),
        tile=synth.TILE,
        dst_origin=d0, dst_pixel=dp, dst_size=(200, 200), dst_tile=64,
    )
    gy, gx = np.mgrid[0:200, 0:200]
    mx, my = mapper(d0[0] + (gx + 0.5) * dp[0], d0[1] - (gy + 0.5) * dp[1])
    fx = (mx - SRC0[0]) / SPX[0]
    fy = (SRC0[1] - my) / SPX[1]
    ix, iy = np.floor(fx).astype(np.int64), np.floor(fy).astype(np.int64)
    ok = (ix >= 0) & (ix < 256) & (iy >= 0) & (iy < 256)
    src = _alg_array()
    want = np.where(ok, src[np.clip(iy, 0, 255), np.clip(ix, 0, 255)],
                    np.float32(synth.NODATA)).astype(np.float64)
    assert (~ok).any() and ok.any()
    got = np.full((200, 200), np.nan)
    rows = out.collect()
    for r in rows:
        a = np.frombuffer(bytes(r["pixels"]), dtype="<f4").reshape(
            r["height"], r["width"])
        got[r["tile_y"] * 64:r["tile_y"] * 64 + r["height"],
            r["tile_x"] * 64:r["tile_x"] * 64 + r["width"]] = a
    # dst tiles with zero source overlap may be absent == all nodata
    got = np.where(np.isnan(got), np.float64(synth.NODATA), got)
    np.testing.assert_array_equal(got, want)


def test_warp_bilinear_parity(spark):
    """Bilinear warp vs whole-raster numpy: same clamped 4-neighbor
    gather, f64 weights, f32 output — bit-exact."""
    tiles = synth.alg_raster_tiles(spark)
    mapper = warp.crs_mapper("epsg:4326", "epsg:3857")
    out = warp.warp_raster(
        tiles, mapper,
        src_origin=SRC0, src_pixel=SPX, src_size=(256, 256),
        tile=synth.TILE,
        dst_origin=DST0, dst_pixel=DPX, dst_size=(256, 256), dst_tile=64,
        method="bilinear",
    )
    got, _ = _collect(out, 256, 256, 64)
    src = _alg_array()
    gy, gx = np.mgrid[0:256, 0:256]
    mx, my = mapper(DST0[0] + (gx + 0.5) * DPX[0],
                    DST0[1] - (gy + 0.5) * DPX[1])
    fx = (mx - SRC0[0]) / SPX[0]
    fy = (SRC0[1] - my) / SPX[1]
    inside = (fx >= 0) & (fx <= 256) & (fy >= 0) & (fy <= 256)
    xf, yf = fx - 0.5, fy - 0.5
    x0 = np.clip(np.floor(xf).astype(np.int64), 0, 255)
    y0 = np.clip(np.floor(yf).astype(np.int64), 0, 255)
    wx, wy = xf - np.floor(xf), yf - np.floor(yf)
    x1, y1 = np.clip(x0 + 1, 0, 255), np.clip(y0 + 1, 0, 255)
    s = src.astype(np.float64)
    val = (s[y0, x0] * (1 - wy) * (1 - wx) + s[y0, x1] * (1 - wy) * wx
           + s[y1, x0] * wy * (1 - wx) + s[y1, x1] * wy * wx)
    want = np.where(inside, val, np.float64(synth.NODATA)).astype(
        np.float32).astype(np.float64)
    np.testing.assert_array_equal(got, want)


def test_warp_oracle_margins():
    """The contract oracle's floor indexes must sit far from integer
    boundaries relative to the known 1-ulp LN divergence between numpy
    and DuckDB (~4e-9 absolute at y≈2e7 → index noise ~2.4e-14)."""
    lon = DST0[0] + (np.arange(256) + 0.5) * DPX[0]
    lat = DST0[1] - (np.arange(256) + 0.5) * DPX[1]
    x = R * np.radians(lon)
    a = np.pi / 4 + np.radians(lat) / 2
    y = R * np.log(np.sin(a) / np.cos(a))
    fx = (x + 2e7) / 156250.0
    fy = (2e7 - y) / 156250.0
    for f in (fx, fy):
        assert np.all(f >= 0) and np.all(f < 256)
        assert np.min(np.abs(f - np.round(f))) > 1e-4


def test_warp_preserves_integer_dtype(spark):
    """nearest on a uint8 source keeps the byte-wide payload
    (landcover semantics, like crop/NN-resample/reclassify)."""
    import pandas as pd

    rows = []
    for ty in range(2):
        for tx in range(2):
            gy, gx = np.mgrid[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32]
            v = ((gx * 3 + gy * 5) % 200).astype(np.uint8)
            rows.append(("u8", 1, ty, tx, 32, 32, 255.0, v.tobytes()))
    tiles = spark.createDataFrame(rows, schema=synth.RASTER_SCHEMA)
    out = warp.warp_raster(
        tiles, lambda x, y: (x, y),
        src_origin=(0.0, 64.0), src_pixel=(1.0, 1.0), src_size=(64, 64),
        tile=32,
        dst_origin=(0.0, 64.0), dst_pixel=(2.0, 2.0), dst_size=(32, 32),
        dst_tile=32,
    )
    r = out.collect()
    assert len(r) == 1 and len(bytes(r[0]["pixels"])) == 32 * 32
    a = np.frombuffer(bytes(r[0]["pixels"]), dtype="u1").reshape(32, 32)
    gy, gx = np.mgrid[0:32, 0:32]
    sx, sy = 2 * gx + 1, 2 * gy + 1  # centers at odd source pixels
    want = ((sx * 3 + sy * 5) % 200).astype(np.uint8)
    np.testing.assert_array_equal(a, want)
