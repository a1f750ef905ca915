"""GeoTIFF I/O (from-scratch, no GDAL) + ResampleToMatch composition.

Oracles: lossless write→read roundtrips; distributed ingest vs the
whole array; terrain pipeline on a GeoTIFF-ingested DEM bit-equal to
the tile-table path; resample_to_match vs a whole-raster numpy
recomputation of crop + edge-clamped bilinear + mask-OR
(/root/reference/SpaRasters.py:2088-2165 semantics)."""

import numpy as np
import pytest

from spapy_spark.operators import raster, terrain
from spapy_spark.sources import geotiff, synth

GT = synth.GEOTRANSFORM


def _dem():
    gy, gx = np.mgrid[0:256, 0:256]
    return synth.dem_value(gx.astype(np.float64), gy.astype(np.float64))


def test_roundtrip_float(tmp_path):
    arr = _dem()
    p = str(tmp_path / "dem.tif")
    geotiff.write_geotiff(p, arr, geotransform=GT, nodata=synth.NODATA)
    got, info = geotiff.read_array(p)
    np.testing.assert_array_equal(got, arr.astype("<f4"))
    assert info.nodata == synth.NODATA
    assert info.geotransform == pytest.approx(GT)
    assert info.sample_format == 3 and info.bits == 32


def test_roundtrip_uint8(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, size=(100, 130), dtype=np.uint8)
    p = str(tmp_path / "mask.tif")
    geotiff.write_geotiff(p, arr)
    got, info = geotiff.read_array(p)
    np.testing.assert_array_equal(got, arr)
    assert info.bits == 8 and info.sample_format == 1


def test_compressed_rejected(tmp_path):
    # flip the Compression tag of a valid file to 6 (old-style JPEG,
    # unsupported; new-style 7 IS supported since r5) — reader must
    # refuse loudly, not return garbage
    import struct

    p = str(tmp_path / "c.tif")
    geotiff.write_geotiff(p, np.zeros((4, 4), dtype=np.uint8))
    raw = bytearray(open(p, "rb").read())
    (ifd,) = struct.unpack_from("<I", raw, 4)
    (n,) = struct.unpack_from("<H", raw, ifd)
    for i in range(n):
        tag = struct.unpack_from("<H", raw, ifd + 2 + 12 * i)[0]
        if tag == 259:
            struct.pack_into("<H", raw, ifd + 2 + 12 * i + 8, 6)
    open(p, "wb").write(bytes(raw))
    with pytest.raises(NotImplementedError):
        geotiff.read_info(p)


def test_distributed_tiles_match_array(spark, tmp_path):
    arr = _dem()
    p = str(tmp_path / "dem.tif")
    geotiff.write_geotiff(p, arr, geotransform=GT, nodata=synth.NODATA)
    tiles = geotiff.geotiff_tiles(spark, p, tile=64, raster_id="dem")
    rows = tiles.collect()
    assert len(rows) == 16
    got = np.zeros((256, 256), dtype="<f4")
    for r in rows:
        a = np.frombuffer(bytes(r["pixels"]), dtype="<f4").reshape(
            r["height"], r["width"]
        )
        got[r["tile_y"] * 64:(r["tile_y"] + 1) * 64,
            r["tile_x"] * 64:(r["tile_x"] + 1) * 64] = a
    np.testing.assert_array_equal(got, arr.astype("<f4"))
    assert all(r["nodata"] == synth.NODATA for r in rows)


def test_terrain_on_geotiff_dem(spark, tmp_path):
    """Real-file ingest feeds the (already oracle-verified) terrain
    stack: slope over the GeoTIFF equals slope over direct tiles."""
    arr = _dem()
    p = str(tmp_path / "dem.tif")
    geotiff.write_geotiff(p, arr, geotransform=GT, nodata=synth.NODATA)
    tiles = geotiff.geotiff_tiles(spark, p, tile=synth.TILE, raster_id="dem")
    got_rows = terrain.focal(
        tiles, "slope", grid=synth.GRID, tile=synth.TILE
    ).collect()
    got = np.zeros((256, 256), dtype=np.float32)
    for r in got_rows:
        a = np.frombuffer(bytes(r["pixels"]), dtype="<f4").reshape(
            r["height"], r["width"]
        )
        got[r["tile_y"] * 64:(r["tile_y"] + 1) * 64,
            r["tile_x"] * 64:(r["tile_x"] + 1) * 64] = a
    want = terrain._KERNELS["slope"](terrain.pad_oracle(arr.astype(np.float64)))
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# crop_pixels_aligned + resample_to_match
# ---------------------------------------------------------------------------


def _tiles_of(spark, arr, rid, nodata, tile=64):
    h, w = arr.shape
    rows = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            sub = np.ascontiguousarray(arr[ty:ty + tile, tx:tx + tile])
            rows.append((rid, 1, ty // tile, tx // tile, sub.shape[0],
                         sub.shape[1], nodata, sub.astype("<f4").tobytes()))
    return spark.createDataFrame(rows, schema=synth.RASTER_SCHEMA)


def _reassemble(rows, H, W, tile=64):
    out = np.full((H, W), np.nan, dtype="<f4")
    for r in rows:
        a = np.frombuffer(bytes(r["pixels"]), dtype="<f4").reshape(
            r["height"], r["width"]
        )
        out[r["tile_y"] * tile:r["tile_y"] * tile + r["height"],
            r["tile_x"] * tile:r["tile_x"] * tile + r["width"]] = a
    assert not np.isnan(out).any()
    return out


def test_crop_pixels_aligned_unaligned_window(spark):
    arr = synth.untiled_array("dem_a")
    tiles = _tiles_of(spark, arr, "dem_a", synth.NODATA)
    out = raster.crop_pixels_aligned(tiles, 72, 72, 256, 256, tile=64)
    got = _reassemble(out.collect(), 184, 184)
    np.testing.assert_array_equal(got, arr[72:256, 72:256])


def _bilinear_up(b, scale):
    p = np.pad(b.astype(np.float64), 1, mode="edge")
    H, W = b.shape
    oy = (np.arange(H * scale) + 0.5) / scale - 0.5 + 1.0
    ox = (np.arange(W * scale) + 0.5) / scale - 0.5 + 1.0
    y0 = np.floor(oy).astype(np.int64)
    x0 = np.floor(ox).astype(np.int64)
    fy = (oy - y0)[:, None]
    fx = (ox - x0)[None, :]
    return (
        p[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + p[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
        + p[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
        + p[np.ix_(y0 + 1, x0 + 1)] * fy * fx
    ).astype("<f4")


def test_resample_to_match(spark):
    # A: fine 256² @0.01 with ~2% nodata; B: coarse 128² @0.02,
    # shifted origin → partial overlap, unaligned to A's tile grid
    arr_a = synth.untiled_array("dem_a")
    gt_a, size_a = GT, (256, 256)
    gyb, gxb = np.mgrid[0:128, 0:128]
    arr_b = ((gxb * 7 + gyb * 3) % 50).astype("<f4")
    gt_b = (-9.28, 0.02, 0.0, 9.28, 0.0, -0.02)
    size_b = (128, 128)
    a_t = _tiles_of(spark, arr_a, "a", synth.NODATA)
    b_t = _tiles_of(spark, arr_b, "b", -7777.0)

    a2, b2, gt_out = raster.resample_to_match(
        a_t, gt_a, size_a, b_t, gt_b, size_b, tile=64
    )
    # overlap: x [-9.28, -7.44], y [9.28, 7.44] → fine 184², coarse 92²
    assert gt_out[0] == pytest.approx(-9.28)
    assert gt_out[3] == pytest.approx(9.28)
    assert gt_out[1] == pytest.approx(0.01)

    got_a = _reassemble(a2.collect(), 184, 184)
    got_b = _reassemble(b2.collect(), 184, 184)

    a_crop = arr_a[72:256, 72:256].astype("<f4")
    b_crop = arr_b[0:92, 0:92]
    b_up = _bilinear_up(b_crop, 2)
    mask = np.equal(a_crop, np.float32(synth.NODATA))  # B is nodata-free
    want_a = np.where(mask, np.float32(synth.NODATA), a_crop)
    want_b = np.where(mask, np.float32(-7777.0), b_up)
    np.testing.assert_array_equal(got_a, want_a)
    np.testing.assert_array_equal(got_b, want_b)


def test_deflate_roundtrip_and_distributed(spark, tmp_path):
    # Deflate-compressed strips (Compression=8, stdlib zlib): whole-
    # array roundtrip bit-exact, file measurably smaller on a smooth
    # DEM, and the DISTRIBUTED byte-range reader decodes the same tiles
    arr = synth.untiled_array("dem_a")
    pu = str(tmp_path / "u.tif")
    pc = str(tmp_path / "c.tif")
    geotiff.write_geotiff(pu, arr, geotransform=GT, nodata=synth.NODATA)
    geotiff.write_geotiff(pc, arr, geotransform=GT, nodata=synth.NODATA,
                          compress="deflate")
    import os

    assert os.path.getsize(pc) < os.path.getsize(pu)
    got, info = geotiff.read_array(pc)
    assert info.compression == 8
    np.testing.assert_array_equal(got, arr.astype("<f4"))
    tiles = geotiff.geotiff_tiles(spark, pc, tile=64, raster_id="dem")
    rows = tiles.collect()
    assert len(rows) == 16
    for r in rows:
        sub = np.frombuffer(bytes(r["pixels"]), "<f4").reshape(64, 64)
        want = arr[r["tile_y"] * 64:(r["tile_y"] + 1) * 64,
                   r["tile_x"] * 64:(r["tile_x"] + 1) * 64]
        np.testing.assert_array_equal(sub, want.astype("<f4"))
