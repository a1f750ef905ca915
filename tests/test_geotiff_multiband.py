"""Multi-band / BigTIFF / Predictor=2 GeoTIFF coverage.

The reference's rasters are GDAL band stacks
(/root/reference/SpaRasters.py:62 TheBands; Load reads every band at
:687-752) — these tests pin the from-scratch reader/writer on the
container variants a real GDAL export produces: chunky and planar
band interleaving, strip and tile organization, horizontal-differencing
predictor under Deflate, and the BigTIFF (magic 43) 8-byte-offset
container that any >4 GB raster requires.

The planar and tiled fixtures are crafted byte-by-byte in the test
(writer-independent), so reader bugs can't cancel writer bugs.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from spapy_spark.sources import geotiff as gt

GTR = (100.0, 0.5, 0.0, 200.0, 0.0, -0.5)


def _craft(path, bands, planar=1, tiled=False, tile=32, rps=16):
    """Minimal hand-rolled classic-TIFF writer with explicit
    PlanarConfiguration and strip/tile organization (uncompressed,
    little-endian) — independent of geotiff.write_geotiff."""
    spp, h, w = bands.shape
    a = bands  # (spp, h, w), native-typed
    sfmt = {"u": 1, "i": 2, "f": 3}[a.dtype.kind]
    bits = a.dtype.itemsize * 8

    blobs = []
    if tiled:
        nty, ntx = -(-h // tile), -(-w // tile)
        pad = np.zeros((spp, nty * tile, ntx * tile), a.dtype)
        pad[:, :h, :w] = a
        order = (
            [(b, ty, tx) for b in range(spp)
             for ty in range(nty) for tx in range(ntx)]
            if planar == 2 else
            [(None, ty, tx) for ty in range(nty) for tx in range(ntx)]
        )
        for b, ty, tx in order:
            cell = pad[:, ty * tile:(ty + 1) * tile,
                       tx * tile:(tx + 1) * tile]
            if planar == 2:
                blobs.append(cell[b].tobytes())
            else:  # chunky: interleave samples within the tile
                blobs.append(np.ascontiguousarray(
                    np.moveaxis(cell, 0, 2)).tobytes())
    else:
        n_strips = -(-h // rps)
        order = (
            [(b, s) for b in range(spp) for s in range(n_strips)]
            if planar == 2 else [(None, s) for s in range(n_strips)]
        )
        for b, s in order:
            rows = a[:, s * rps:s * rps + rps]
            if planar == 2:
                blobs.append(rows[b].tobytes())
            else:
                blobs.append(np.ascontiguousarray(
                    np.moveaxis(rows, 0, 2)).tobytes())

    off = 8
    offsets, counts = [], []
    for blob in blobs:
        offsets.append(off)
        counts.append(len(blob))
        off += len(blob)
    ifd_off = off

    entries, extra = [], b""

    def ent(tag, typ, cnt, values):
        nonlocal extra
        fmt = {3: "H", 4: "I"}[typ]
        raw = struct.pack("<" + fmt * cnt, *values)
        if len(raw) <= 4:
            entries.append((tag, typ, cnt, raw.ljust(4, b"\0")))
        else:
            entries.append((tag, typ, cnt, ("ptr", len(extra))))
            extra += raw

    ent(256, 4, 1, [w])
    ent(257, 4, 1, [h])
    ent(258, 3, spp, [bits] * spp)
    ent(259, 3, 1, [1])
    ent(262, 3, 1, [1])
    ent(277, 3, 1, [spp])
    ent(284, 3, 1, [planar])
    ent(339, 3, spp, [sfmt] * spp)
    if tiled:
        ent(322, 3, 1, [tile])
        ent(323, 3, 1, [tile])
        ent(324, 4, len(offsets), offsets)
        ent(325, 4, len(counts), counts)
    else:
        ent(278, 4, 1, [rps])
        ent(273, 4, len(offsets), offsets)
        ent(279, 4, len(counts), counts)
    entries.sort(key=lambda e: e[0])
    extra_base = ifd_off + 2 + 12 * len(entries) + 4
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, ifd_off))
        for blob in blobs:
            f.write(blob)
        f.write(struct.pack("<H", len(entries)))
        for tag, typ, cnt, val in entries:
            if isinstance(val, tuple):
                val = struct.pack("<I", extra_base + val[1])
            f.write(struct.pack("<HHI", tag, typ, cnt) + val)
        f.write(struct.pack("<I", 0))
        f.write(extra)


def test_multiband_chunky_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 60000, size=(3, 150, 97)).astype("<u2")
    p = str(tmp_path / "mb.tif")
    gt.write_geotiff(p, a, GTR, nodata=65535.0, compress="deflate",
                     dtype="native", predictor=2)
    info = gt.read_info(p)
    assert info.samples_per_pixel == 3
    assert info.planar == 1 and info.predictor == 2
    for b in range(3):
        r, _ = gt.read_array(p, band=b)
        assert r.dtype == np.dtype("<u2")
        assert np.array_equal(r, a[b])


def test_bigtiff_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    d = (rng.random((200, 130)) * 1e6).astype("<f8")
    p = str(tmp_path / "big.tif")
    gt.write_geotiff(p, d, GTR, nodata=-9999.0, dtype="native",
                     bigtiff=True)
    with open(p, "rb") as f:
        assert struct.unpack("<H", f.read(4)[2:4])[0] == 43
    r, info = gt.read_array(p)
    assert np.array_equal(r, d)
    assert info.geotransform is not None
    assert abs(info.geotransform[0] - 100.0) < 1e-9
    assert info.nodata == -9999.0


def test_bigtiff_multiband_deflate_predictor(tmp_path):
    rng = np.random.default_rng(13)
    a = rng.integers(-2 ** 30, 2 ** 30, size=(4, 77, 203)).astype("<i4")
    p = str(tmp_path / "bigmb.tif")
    gt.write_geotiff(p, a, GTR, compress="deflate", dtype="native",
                     bigtiff=True, predictor=2)
    for b in range(4):
        r, _ = gt.read_array(p, band=b)
        assert np.array_equal(r, a[b])


def test_planar_strips_read(tmp_path):
    rng = np.random.default_rng(17)
    a = rng.integers(-30000, 30000, size=(3, 90, 41)).astype("<i2")
    p = str(tmp_path / "planar.tif")
    _craft(p, a, planar=2, tiled=False, rps=16)
    info = gt.read_info(p)
    assert info.planar == 2 and info.samples_per_pixel == 3
    for b in range(3):
        r, _ = gt.read_array(p, band=b)
        assert np.array_equal(r, a[b])
    # row-window read straddling strip boundaries
    with open(p, "rb") as f:
        win = gt._rows_bytes(info, f, 13, 55, band=2)
    assert np.array_equal(win, a[2, 13:55])


def test_tiled_chunky_read(tmp_path):
    rng = np.random.default_rng(19)
    a = rng.integers(0, 255, size=(3, 70, 85)).astype("u1")
    p = str(tmp_path / "tiled.tif")
    _craft(p, a, planar=1, tiled=True, tile=32)
    info = gt.read_info(p)
    assert info.tiled and info.samples_per_pixel == 3
    for b in range(3):
        r, _ = gt.read_array(p, band=b)
        assert np.array_equal(r, a[b])


def test_tiled_planar_read(tmp_path):
    rng = np.random.default_rng(23)
    a = (rng.random((2, 45, 67)) * 1000).astype("<f4")
    p = str(tmp_path / "tiled_planar.tif")
    _craft(p, a, planar=2, tiled=True, tile=32)
    for b in range(2):
        r, _ = gt.read_array(p, band=b)
        assert np.array_equal(r, a[b])


def test_predictor_requires_int(tmp_path):
    a = np.ones((8, 8), dtype="<f4")
    with pytest.raises(ValueError):
        gt.write_geotiff(str(tmp_path / "x.tif"), a, GTR,
                         dtype="native", predictor=2)


def test_geotiff_tiles_multiband_distributed(spark, tmp_path):
    """3-band chunky GeoTIFF → engine tile table: one row per
    (band, tile_y, tile_x), per-band stats match numpy exactly."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(29)
    a = rng.integers(0, 60000, size=(3, 130, 110)).astype("<u2")
    p = str(tmp_path / "mb_dist.tif")
    gt.write_geotiff(p, a, GTR, nodata=65535.0, compress="deflate",
                     dtype="native", predictor=2)
    tiles = gt.geotiff_tiles(spark, p, tile=64, raster_id="mb",
                             nodata=65535.0, native_dtype=True)
    rows = (tiles.groupBy("band")
            .agg(F.count("*").alias("n_tiles"))
            .orderBy("band").collect())
    assert [(r["band"], r["n_tiles"]) for r in rows] == [
        (1, 6), (2, 6), (3, 6)]  # ceil(130/64)*ceil(110/64) = 3*2

    from spapy_spark.operators import raster
    st = raster.tile_stats(tiles).toPandas()
    for b in range(3):
        sb = st[st["band"] == b + 1]
        assert sb["sum"].sum() == float(a[b].astype(np.float64).sum())
        assert sb["min"].min() == float(a[b].min())
        assert sb["max"].max() == float(a[b].max())
