"""Full GDAL pixel-dtype zoo (reference dtype table,
/root/reference/SpaRasters.py:665-685): u1/i1/u2/i2/u4/i4/f4/f8 through
the GeoTIFF writer/reader, the tile codec's ``ptype`` column, and the
dtype-preserving operators.  The i4/u4/f8 fixtures deliberately carry
values a float32 cannot represent (>2^24, or 2^24+0.5) so any silent
f4 collapse anywhere in the chain breaks exact equality."""

import os
import tempfile

import numpy as np
import pytest

from spapy_spark.operators import raster, warp
from spapy_spark.operators.raster import _buf
from spapy_spark.sources import geotiff, synth

GT = synth.GEOTRANSFORM

ZOO = ["u1", "i1", "u2", "i2", "u4", "i4", "f4", "f8"]


def zoo_array(dt: str, n: int = 128) -> np.ndarray:
    gy, gx = np.mgrid[0:n, 0:n]
    k = gx.astype(np.int64) * 2654435761 + gy.astype(np.int64) * 40503
    if dt == "u1":
        return (k % 251).astype("u1")
    if dt == "i1":
        return ((k % 200) - 100).astype("i1")
    if dt == "u2":
        return (k % 60000).astype("<u2")
    if dt == "i2":
        return ((k % 60000) - 30000).astype("<i2")
    if dt == "u4":
        # most values > 2^24: a float32 detour would corrupt them
        return (k % 4000000000).astype("<u4")
    if dt == "i4":
        return ((k % 2000000000) - 1000000000).astype("<i4")
    if dt == "f4":
        return ((k % 1000) / 4.0).astype("<f4")
    if dt == "f8":
        # 2^24 + j + 0.5 is exact in f8, NOT representable in f4
        return (16777216.0 + (k % 4096).astype("<f8") + 0.5).astype("<f8")
    raise AssertionError(dt)


def zoo_nodata(dt: str) -> float:
    # a value outside each fixture's range (masks stay empty)
    return {"u1": 255.0, "i1": 127.0, "u2": 65535.0, "i2": 32767.0,
            "u4": 4294967295.0, "i4": 2147483647.0, "f4": -9999.0,
            "f8": -9999.0}[dt]


def _tmp(tag: str) -> str:
    return os.path.join(tempfile.gettempdir(),
                        f"spapy_zoo_{tag}_{os.getpid()}.tif")


def test_write_read_native_roundtrip():
    for dt in ZOO:
        arr = zoo_array(dt)
        p = _tmp(dt)
        geotiff.write_geotiff(p, arr, GT, nodata=zoo_nodata(dt),
                              dtype="native")
        back, info = geotiff.read_array(p)
        assert back.dtype.kind == arr.dtype.kind
        assert back.dtype.itemsize == arr.dtype.itemsize
        assert np.array_equal(back, arr), dt
        os.unlink(p)


def test_write_read_deflate_f8():
    arr = zoo_array("f8")
    p = _tmp("f8z")
    geotiff.write_geotiff(p, arr, GT, nodata=-9999.0, dtype="native",
                          compress="deflate")
    back, info = geotiff.read_array(p)
    assert back.dtype == np.dtype("<f8")
    assert np.array_equal(back, arr)
    os.unlink(p)


def test_legacy_writer_collapse_unchanged():
    # dtype=None keeps the historical transport collapse (int → i4)
    arr = zoo_array("i2")
    p = _tmp("leg")
    geotiff.write_geotiff(p, arr, GT)
    back, info = geotiff.read_array(p)
    assert back.dtype == np.dtype("<i4")
    assert np.array_equal(back, arr.astype("<i4"))
    os.unlink(p)


@pytest.mark.parametrize("dt", ["u2", "i4", "u4", "f8"])
def test_geotiff_tiles_native_ptype(spark, dt):
    arr = zoo_array(dt)
    p = _tmp(f"tiles_{dt}")
    geotiff.write_geotiff(p, arr, GT, nodata=zoo_nodata(dt),
                          dtype="native")
    tiles = geotiff.geotiff_tiles(spark, p, tile=64, raster_id=dt,
                                  nodata=zoo_nodata(dt),
                                  native_dtype=True)
    rows = tiles.collect()
    assert len(rows) == 4
    mosaic = np.empty((128, 128), dtype=arr.dtype)
    for r in rows:
        assert r["ptype"] == dt
        a = _buf(r["pixels"], r["height"], r["width"], r["ptype"])
        assert a.dtype.kind == arr.dtype.kind
        mosaic[r["tile_y"] * 64:(r["tile_y"] + 1) * 64,
               r["tile_x"] * 64:(r["tile_x"] + 1) * 64] = a
    assert np.array_equal(mosaic, arr)
    # tile stats are exact in float64 even for >2^24 integers
    st = {(r["tile_y"], r["tile_x"]): r
          for r in raster.tile_stats(tiles).collect()}
    for ty in range(2):
        for tx in range(2):
            sub = arr[ty * 64:(ty + 1) * 64,
                      tx * 64:(tx + 1) * 64].astype(np.float64)
            r = st[(ty, tx)]
            assert r["n_valid"] == 64 * 64
            assert r["sum"] == float(sub.sum())
            assert r["min"] == float(sub.min())
            assert r["max"] == float(sub.max())
    os.unlink(p)


def _tile_table(spark, arr, dt, nodata):
    rows = []
    n = arr.shape[0]
    for ty in range(n // 64):
        for tx in range(n // 64):
            sub = np.ascontiguousarray(
                arr[ty * 64:(ty + 1) * 64, tx * 64:(tx + 1) * 64])
            rows.append((dt, 1, ty, tx, 64, 64, float(nodata),
                         sub.tobytes(), dt))
    return spark.createDataFrame(
        rows, synth.RASTER_SCHEMA + ", ptype string")


def test_reclassify_preserves_u2(spark):
    arr = zoo_array("u2")
    t = _tile_table(spark, arr, "u2", zoo_nodata("u2"))
    out = raster.reclassify(t, [0, 20000, 40000, 60001], [1, 2, 3])
    rows = out.collect()
    expect = np.select([(arr >= 0) & (arr < 20000),
                        (arr >= 20000) & (arr < 40000),
                        (arr >= 40000) & (arr < 60001)],
                       [1, 2, 3], 0).astype("<u2")
    for r in rows:
        assert r["ptype"] == "u2"
        a = _buf(r["pixels"], 64, 64, r["ptype"])
        sub = expect[r["tile_y"] * 64:(r["tile_y"] + 1) * 64,
                     r["tile_x"] * 64:(r["tile_x"] + 1) * 64]
        assert a.dtype == np.dtype("<u2")
        assert np.array_equal(a, sub)


def test_crop_and_resample_preserve_i4(spark):
    arr = zoo_array("i4")
    t = _tile_table(spark, arr, "i4", zoo_nodata("i4"))
    c = raster.crop_pixels(t, 32, 32, 96, 96, tile=64)
    got = {(r["tile_y"], r["tile_x"]): r for r in c.collect()}
    assert len(got) == 4
    full = np.empty((64, 64), dtype="<i4")
    for (ty, tx), r in got.items():
        assert r["ptype"] == "i4"
        a = _buf(r["pixels"], r["height"], r["width"], r["ptype"])
        assert a.dtype == np.dtype("<i4")
        oy = 0 if ty == 0 else 64 - 32
        # reassemble via offsets: tile (0,0) is arr[32:64,32:64] etc.
    # simpler: check one interior slice exactly
    r00 = got[(0, 0)]
    a00 = _buf(r00["pixels"], r00["height"], r00["width"], r00["ptype"])
    assert np.array_equal(a00, arr[32:64, 32:64])

    rs = raster.resample_nearest(t, 2, 2, tile=64)
    for r in rs.collect():
        assert r["ptype"] == "i4"
        a = _buf(r["pixels"], r["height"], r["width"], r["ptype"])
        sub = arr[r["tile_y"] * 64:(r["tile_y"] + 1) * 64:2,
                  r["tile_x"] * 64:(r["tile_x"] + 1) * 64:2]
        assert np.array_equal(a, sub)


def test_algebra_f8_stays_f8(spark):
    arr = zoo_array("f8")
    t = _tile_table(spark, arr, "f8", -9999.0)
    out = raster.map_algebra(t, "add", 0.25)
    for r in out.collect():
        assert r["ptype"] == "f8"
        a = _buf(r["pixels"], 64, 64, r["ptype"])
        sub = arr[r["tile_y"] * 64:(r["tile_y"] + 1) * 64,
                  r["tile_x"] * 64:(r["tile_x"] + 1) * 64]
        assert a.dtype == np.dtype("<f8")
        # 2^24 + j + 0.75 survives ONLY in f8
        assert np.array_equal(a, sub + 0.25)


def test_algebra_int_promotes_to_f4_with_ptype_stamp(spark):
    arr = zoo_array("u2")
    t = _tile_table(spark, arr, "u2", zoo_nodata("u2"))
    out = raster.map_algebra(t, "add", 1.0)
    r = out.collect()[0]
    assert r["ptype"] == "f4"
    a = _buf(r["pixels"], 64, 64, r["ptype"])
    assert a.dtype == np.dtype("<f4")


def test_sample_points_i4_exact(spark):
    arr = zoo_array("i4")
    t = _tile_table(spark, arr, "i4", zoo_nodata("i4"))
    # geotransform x0=0, pw=1, y0=0, ph=-1 → pixel (px,py) at (x,-y)
    pts = spark.createDataFrame(
        [(i, float(17 * i % 128) + 0.5, -(float(29 * i % 128) + 0.5))
         for i in range(50)], "pid int, lon double, lat double")
    out = raster.sample_points(
        pts, t, geotransform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0), tile=64)
    got = {r["pid"]: r["value"] for r in out.collect()}
    assert len(got) == 50
    for i in range(50):
        px, py = 17 * i % 128, 29 * i % 128
        assert got[i] == float(arr[py, px])


def test_warp_nearest_preserves_u2(spark):
    arr = zoo_array("u2")
    t = _tile_table(spark, arr, "u2", zoo_nodata("u2"))
    out = warp.warp_raster(
        t, lambda x, y: (x, y),
        src_origin=(0.0, 128.0), src_pixel=(1.0, 1.0),
        src_size=(128, 128), tile=64,
        dst_origin=(0.0, 128.0), dst_pixel=(1.0, 1.0),
        dst_size=(128, 128), dst_tile=64, method="nearest")
    rows = out.collect()
    assert len(rows) == 4
    for r in rows:
        assert r["ptype"] == "u2"
        a = _buf(r["pixels"], r["height"], r["width"], r["ptype"])
        sub = arr[r["tile_y"] * 64:(r["tile_y"] + 1) * 64,
                  r["tile_x"] * 64:(r["tile_x"] + 1) * 64]
        assert a.dtype == np.dtype("<u2")
        assert np.array_equal(a, sub)
