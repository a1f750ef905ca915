"""Raster tile-table tests — oracle is numpy over the untiled arrays
(mask-aware, matching /root/reference/SpaRasters.py:456-490,571-620)."""

import numpy as np
import pandas as pd
import pytest

from spapy_spark.operators import raster
from spapy_spark.sources import synth


@pytest.fixture(scope="module")
def tiles(spark):
    return synth.raster_tiles(spark).cache()


def _assemble(df, raster_id, grid=synth.GRID, tile=synth.TILE):
    """Collect a tile table back into one numpy array (test helper)."""
    out = np.zeros((grid * tile, grid * tile), dtype=np.float32)
    for r in df.where(df.raster_id == raster_id).collect():
        a = np.frombuffer(bytes(r["pixels"]), dtype="<f4").reshape(
            r["height"], r["width"]
        )
        out[
            r["tile_y"] * tile : r["tile_y"] * tile + r["height"],
            r["tile_x"] * tile : r["tile_x"] * tile + r["width"],
        ] = a
    return out


def test_band_stats_matches_numpy(spark, tiles):
    got = {
        r["raster_id"]: r for r in raster.band_stats(tiles).collect()
    }
    for rid in ("dem_a", "dem_b"):
        arr = synth.untiled_array(rid)
        valid = arr[arr != np.float32(synth.NODATA)].astype(np.float64)
        assert got[rid]["min"] == pytest.approx(float(valid.min()))
        assert got[rid]["max"] == pytest.approx(float(valid.max()))
        assert got[rid]["count"] == len(valid)
        assert got[rid]["sum"] == pytest.approx(float(valid.sum()), rel=1e-9)


def test_histogram_matches_numpy(spark, tiles):
    bins = 8
    got = {
        (r["raster_id"], r["bucket"]): r["n"]
        for r in raster.histogram(tiles, bins=bins).collect()
    }
    for rid in ("dem_a", "dem_b"):
        arr = synth.untiled_array(rid)
        valid = arr[arr != np.float32(synth.NODATA)].astype(np.float64)
        mn, mx = float(valid.min()), float(valid.max())
        w = (mx - mn) / bins
        idx = np.clip(((valid - mn) / w).astype(np.int64), 0, bins - 1)
        want = np.bincount(idx, minlength=bins)
        for b in range(bins):
            assert got.get((rid, b), 0) == want[b]


def test_map_algebra_raster_raster(spark, tiles):
    a = tiles.where(tiles.raster_id == "dem_a")
    b = tiles.where(tiles.raster_id == "dem_b")
    out = raster.map_algebra(a, "add", b)
    arr = _assemble(out, "out")
    aa = synth.untiled_array("dem_a")
    bb = synth.untiled_array("dem_b")
    mask = (aa == np.float32(synth.NODATA)) | (bb == np.float32(synth.NODATA))
    want = np.where(
        mask, np.float32(synth.NODATA),
        (aa.astype(np.float64) + bb.astype(np.float64)).astype(np.float32),
    )
    np.testing.assert_array_equal(arr, want)


def test_map_algebra_scalar_and_compare(spark, tiles):
    a = tiles.where(tiles.raster_id == "dem_a")
    gt = raster.map_algebra(a, "greater", 50.0)
    arr = _assemble(gt, "out")
    aa = synth.untiled_array("dem_a")
    mask = aa == np.float32(synth.NODATA)
    want = np.where(
        mask, np.float32(synth.NODATA),
        (aa.astype(np.float64) > 50.0).astype(np.float32),
    )
    np.testing.assert_array_equal(arr, want)
    # 0/1 output (GDT_Byte parity)
    vals = np.unique(arr[~mask])
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_unary_and_reference_log_quirk(spark, tiles):
    a = tiles.where(tiles.raster_id == "dem_a")
    out = raster.unary_algebra(raster.map_algebra(a, "greater", -1e9), "not")
    arr = _assemble(out, "out")
    aa = synth.untiled_array("dem_a")
    mask = aa == np.float32(synth.NODATA)
    assert (arr[~mask] == 0.0).all()  # NOT(all-true) = 0
    assert "ln" in raster._UNARY and "log10" in raster._UNARY


def test_reclassify(spark, tiles):
    a = tiles.where(tiles.raster_id == "dem_a")
    out = raster.reclassify(a, [-1e9, 0.0, 100.0, 1e9], [1.0, 2.0, 3.0])
    arr = _assemble(out, "out")
    aa = synth.untiled_array("dem_a").astype(np.float64)
    mask = synth.untiled_array("dem_a") == np.float32(synth.NODATA)
    want = np.select(
        [(aa >= -1e9) & (aa < 0), (aa >= 0) & (aa < 100), (aa >= 100)],
        [1.0, 2.0, 3.0],
    )
    np.testing.assert_array_equal(arr[~mask], want.astype(np.float32)[~mask])


def test_crop_pixels(spark, tiles):
    a = tiles.where(tiles.raster_id == "dem_a")
    out = raster.crop_pixels(a, 10, 20, 150, 140, tile=synth.TILE)
    rows = out.collect()
    aa = synth.untiled_array("dem_a")
    want = aa[20:140, 10:150]
    # reassemble: tiles re-origined to (t0y, t0x) = (0, 0)
    total = sum(r["height"] * r["width"] for r in rows)
    assert total == want.size
    # spot-check one edge tile's first pixel
    first = [r for r in rows if r["tile_y"] == 0 and r["tile_x"] == 0][0]
    a0 = np.frombuffer(bytes(first["pixels"]), dtype="<f4").reshape(
        first["height"], first["width"]
    )
    np.testing.assert_array_equal(a0, aa[20:64, 10:64])


def test_sample_points_and_zonal(spark, tiles):
    # points at known pixel centers inside the raster extent
    x0, pw, _, y0, _, ph = synth.GEOTRANSFORM
    pts_rows = []
    rng = np.random.default_rng(7)
    for i in range(500):
        gx = int(rng.integers(0, synth.GRID * synth.TILE))
        gy = int(rng.integers(0, synth.GRID * synth.TILE))
        lon = x0 + (gx + 0.5) * pw
        lat = y0 + (gy + 0.5) * ph
        pts_rows.append((i, i % 7, lon, lat, gx, gy))
    pts = spark.createDataFrame(
        pts_rows, "pid long, zone_id long, lon double, lat double,"
        " gx long, gy long"
    )
    out = raster.sample_points(
        pts, synth.raster_tiles(spark), synth.GEOTRANSFORM, synth.TILE,
        raster_id="dem_a", point_cols=["pid", "zone_id", "gx", "gy"],
    )
    got = {r["pid"]: r for r in out.collect()}
    aa = synth.untiled_array("dem_a")
    n_valid = 0
    for pid, zid, lon, lat, gx, gy in pts_rows:
        v = aa[gy, gx]
        if v == np.float32(synth.NODATA):
            assert pid not in got
        else:
            n_valid += 1
            assert got[pid]["value"] == pytest.approx(float(v))
    assert len(got) == n_valid > 400
    zs = {r["zone_id"]: r for r in raster.zonal_stats(out).collect()}
    assert sum(r["n"] for r in zs.values()) == n_valid


def test_uint8_tiles_reclassify_exact(spark):
    # integer landcover tiles end-to-end: uint8 buffers ride the tile
    # codec (dtype inferred from byte width), reclassify stays uint8
    # with EXACT integer classes, stats see true values
    from spapy_spark.sources.synth import RASTER_SCHEMA

    rows = []
    for ty in range(2):
        for tx in range(2):
            gy, gx = np.mgrid[ty * 64:(ty + 1) * 64, tx * 64:(tx + 1) * 64]
            a = ((gx * 3 + gy * 7) % 200).astype("u1")
            rows.append(("lc", 1, ty, tx, 64, 64, 255.0, a.tobytes()))
    tiles = spark.createDataFrame(rows, schema=RASTER_SCHEMA)
    out = raster.reclassify(tiles, [0, 50, 120, 256], [10, 20, 30],
                            out_raster_id="cls").collect()
    assert len(out) == 4
    for r in out:
        buf = np.frombuffer(bytes(r["pixels"]), "u1").reshape(64, 64)
        gy, gx = np.mgrid[r["tile_y"] * 64:(r["tile_y"] + 1) * 64,
                          r["tile_x"] * 64:(r["tile_x"] + 1) * 64]
        src = ((gx * 3 + gy * 7) % 200)
        want = np.select([(src >= 0) & (src < 50), (src >= 50) & (src < 120),
                          (src >= 120) & (src < 256)], [10, 20, 30])
        np.testing.assert_array_equal(buf, want.astype("u1"))
    # stats on the uint8 classes are exact integers
    st = {(r["tile_y"], r["tile_x"]): r for r in raster.tile_stats(
        spark.createDataFrame(out, schema=RASTER_SCHEMA)).collect()}
    for (ty, tx), r in st.items():
        gy, gx = np.mgrid[ty * 64:(ty + 1) * 64, tx * 64:(tx + 1) * 64]
        src = ((gx * 3 + gy * 7) % 200)
        want = np.select([(src < 50), (src < 120)], [10, 20], 30)
        assert r["sum"] == float(want.sum())
        assert r["min"] == float(want.min()) and r["max"] == float(want.max())


def test_int16_geotiff_native_ingest(spark, tmp_path):
    # int16 DEM written -> native-dtype distributed ingest keeps 2-byte
    # buffers; crop preserves dtype; float ingest (default) widens
    from spapy_spark.sources import geotiff

    arr = (((np.arange(128 * 128) * 37) % 4001) - 2000).astype(
        "<i4").reshape(128, 128)
    p = str(tmp_path / "i.tif")
    geotiff.write_geotiff(p, arr, compress="deflate")
    # write_geotiff stores i4; reread as array
    got, info = geotiff.read_array(p)
    np.testing.assert_array_equal(got, arr)
    # build an int16 tile table directly through the codec
    a16 = arr.astype("<i2")
    rows = []
    for ty in range(2):
        for tx in range(2):
            sub = a16[ty * 64:(ty + 1) * 64, tx * 64:(tx + 1) * 64]
            rows.append(("dem16", 1, ty, tx, 64, 64, -32768.0,
                         np.ascontiguousarray(sub).tobytes()))
    from spapy_spark.sources.synth import RASTER_SCHEMA

    tiles = spark.createDataFrame(rows, schema=RASTER_SCHEMA)
    crop = raster.crop_pixels(tiles, 10, 10, 100, 100, 64).collect()
    for r in crop:
        buf = np.frombuffer(bytes(r["pixels"]), "<i2")
        assert buf.size == r["height"] * r["width"]
    st = raster.band_stats(tiles).collect()[0]
    assert st["sum"] == float(a16.astype(np.int64).sum())
