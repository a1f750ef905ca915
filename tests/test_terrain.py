"""Terrain focal ops: tiled+halo result must be bit-identical to the
whole-raster numpy oracle (the halo exchange is the hard part)."""

import numpy as np
import pandas as pd
import pytest

from spapy_spark.operators import raster, terrain
from spapy_spark.sources import synth


def _assemble(rows, grid=synth.GRID, tile=synth.TILE):
    out = np.zeros((grid * tile, grid * tile), dtype=np.float32)
    for r in rows:
        a = np.frombuffer(bytes(r["pixels"]), dtype="<f4").reshape(
            r["height"], r["width"]
        )
        out[r["tile_y"] * tile:(r["tile_y"] + 1) * tile,
            r["tile_x"] * tile:(r["tile_x"] + 1) * tile] = a
    return out


@pytest.fixture(scope="module")
def smooth_tiles(spark):
    # nodata-free smooth surface (focal kernels assume continuous DEM)
    rows = []
    for ty in range(synth.GRID):
        for tx in range(synth.GRID):
            gy, gx = np.mgrid[ty * synth.TILE:(ty + 1) * synth.TILE,
                              tx * synth.TILE:(tx + 1) * synth.TILE]
            v = synth.dem_value(gx.astype(np.float64), gy.astype(np.float64))
            rows.append(("dem", 1, ty, tx, synth.TILE, synth.TILE,
                         synth.NODATA, v.astype("<f4").tobytes()))
    return spark.createDataFrame(rows, schema=synth.RASTER_SCHEMA).cache()


def _oracle(op, **kw):
    gy, gx = np.mgrid[0:synth.GRID * synth.TILE, 0:synth.GRID * synth.TILE]
    arr = synth.dem_value(gx.astype(np.float64), gy.astype(np.float64))
    p = terrain.pad_oracle(arr.astype(np.float64))
    return terrain._KERNELS[op](p, **kw)


@pytest.mark.parametrize(
    "op", ["hillshade", "slope", "aspect", "tri", "tpi", "roughness"]
)
def test_focal_matches_whole_raster(spark, smooth_tiles, op):
    got = _assemble(
        terrain.focal(smooth_tiles, op, grid=synth.GRID, tile=synth.TILE)
        .collect()
    )
    want = _oracle(op)
    np.testing.assert_array_equal(got, want)


def test_resample_nearest(spark, smooth_tiles):
    out = raster.resample_nearest(smooth_tiles, 2, 2, tile=synth.TILE)
    rows = out.collect()
    assert all(r["height"] == 32 and r["width"] == 32 for r in rows)
    got = np.zeros((128, 128), dtype=np.float32)
    for r in rows:
        a = np.frombuffer(bytes(r["pixels"]), dtype="<f4").reshape(32, 32)
        got[r["tile_y"] * 32:(r["tile_y"] + 1) * 32,
            r["tile_x"] * 32:(r["tile_x"] + 1) * 32] = a
    gy, gx = np.mgrid[0:256, 0:256]
    want = synth.dem_value(gx.astype(np.float64), gy.astype(np.float64))[::2, ::2]
    np.testing.assert_array_equal(got, want)


def test_polygonize(spark):
    # two rectangular plateaus + background, all inside one tile
    a = np.zeros((64, 64), dtype="<f4")
    a[5:10, 5:15] = 7.0
    a[30:40, 20:25] = 9.0
    rows = [("r", 1, 0, 0, 64, 64, -9999.0, a.tobytes())]
    tiles = spark.createDataFrame(rows, schema=synth.RASTER_SCHEMA)
    out = raster.polygonize_tiles(
        tiles, synth.GEOTRANSFORM, synth.TILE
    ).collect()
    by_val = {r["value"]: r for r in out}
    assert by_val[7.0]["n_pixels"] == 50
    assert by_val[9.0]["n_pixels"] == 50
    assert by_val[0.0]["n_pixels"] == 64 * 64 - 100
    from spapy_spark.geometry import kernels, wkb
    g = wkb.loads(bytes(by_val[7.0]["geometry"]))
    # 10 px wide × 5 px tall at 0.01°/px
    assert kernels.geom_area(g) == pytest.approx(0.1 * 0.05, rel=1e-9)


def test_resample_bilinear_matches_whole_raster(spark, smooth_tiles):
    s = 2
    out = raster.resample_bilinear(
        smooth_tiles, scale=s, grid=synth.GRID, tile=synth.TILE
    ).collect()
    H = synth.GRID * synth.TILE
    got = np.zeros((H * s, H * s), dtype=np.float32)
    for r in out:
        a = np.frombuffer(bytes(r["pixels"]), dtype="<f4").reshape(
            r["height"], r["width"]
        )
        ts = synth.TILE * s
        got[r["tile_y"] * ts:(r["tile_y"] + 1) * ts,
            r["tile_x"] * ts:(r["tile_x"] + 1) * ts] = a
    # whole-raster oracle: same bilinear on the edge-clamp padded array
    gy, gx = np.mgrid[0:H, 0:H]
    arr = synth.dem_value(gx.astype(np.float64), gy.astype(np.float64)).astype(
        np.float64
    )
    p = np.pad(arr, 1, mode="edge")
    oy = (np.arange(H * s) + 0.5) / s - 0.5 + 1.0
    ox = (np.arange(H * s) + 0.5) / s - 0.5 + 1.0
    y0 = np.floor(oy).astype(np.int64)
    x0 = np.floor(ox).astype(np.int64)
    fy = (oy - y0)[:, None]
    fx = (ox - x0)[None, :]
    want = (
        p[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        + p[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
        + p[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
        + p[np.ix_(y0 + 1, x0 + 1)] * fy * fx
    ).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_polygonize_dissolved_cross_tile(spark):
    # 2x2 tile grid with a plateau spanning all four tiles
    T = synth.TILE
    full = np.zeros((2 * T, 2 * T), dtype="<f4")
    full[40:90, 50:100] = 5.0  # crosses both tile boundaries
    rows = []
    for ty in range(2):
        for tx in range(2):
            a = full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            rows.append(("r", 1, ty, tx, T, T, -9999.0,
                         np.ascontiguousarray(a).tobytes()))
    tiles = spark.createDataFrame(rows, schema=synth.RASTER_SCHEMA)
    # both physical strategies must dissolve identically: the driver
    # union-find (default) and the iterative min-label fallback
    out_drv = raster.polygonize_dissolved(
        tiles, synth.GEOTRANSFORM, synth.TILE
    ).collect()
    out_it = raster.polygonize_dissolved(
        tiles, synth.GEOTRANSFORM, synth.TILE, driver_max_edges=0
    ).collect()
    for out in (out_drv, out_it):
        _check_dissolved(out)


def _check_dissolved(out):
    T = synth.TILE
    by_val = {}
    for r in out:
        by_val.setdefault(r["value"], []).append(r)
    # plateau dissolves into ONE component of exactly 50*50 px
    assert len(by_val[5.0]) == 1
    assert by_val[5.0][0]["n_pixels"] == 2500
    # background dissolves into one component covering the rest
    assert len(by_val[0.0]) == 1
    assert by_val[0.0][0]["n_pixels"] == 4 * T * T - 2500
    # bbox geometry of the plateau matches its pixel window
    from spapy_spark.geometry import kernels, wkb
    g = wkb.loads(bytes(by_val[5.0][0]["geometry"]))
    x0, pw, _, y0, _, ph = synth.GEOTRANSFORM
    minx, miny, maxx, maxy = kernels.geom_bounds(g)
    assert minx == pytest.approx(x0 + 50 * pw)
    assert maxx == pytest.approx(x0 + 100 * pw)


def test_contour_analytic_and_tiled(spark):
    from spapy_spark.operators.terrain import contour_segments_kernel

    # analytic: contour of z = x at level 10.5 → vertical line x=10.5
    gy, gx = np.mgrid[0:32, 0:32]
    ramp = gx.astype(np.float64)
    segs = contour_segments_kernel(ramp, 10.5)
    assert len(segs) == 31  # one segment per cell row
    np.testing.assert_allclose(segs[:, 0], 10.5)
    np.testing.assert_allclose(segs[:, 2], 10.5)
    total_len = np.sqrt((segs[:, 2] - segs[:, 0]) ** 2
                        + (segs[:, 3] - segs[:, 1]) ** 2).sum()
    assert total_len == pytest.approx(31.0)

    # tiled == whole-raster segment multiset on the smooth DEM
    T, G = synth.TILE, synth.GRID
    gy, gx = np.mgrid[0:G * T, 0:G * T]
    arr = synth.dem_value(gx.astype(np.float64), gy.astype(np.float64)).astype(
        np.float64
    )
    level = 60.0
    want = contour_segments_kernel(arr, level)
    rows = []
    for ty in range(G):
        for tx in range(G):
            a = arr[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
            rows.append(("dem", 1, ty, tx, T, T, synth.NODATA,
                         a.astype("<f4").tobytes()))
    tiles = spark.createDataFrame(rows, schema=synth.RASTER_SCHEMA)
    out = terrain.contour(tiles, [level], grid=G, tile=T,
                          geotransform=synth.GEOTRANSFORM).collect()
    from spapy_spark.geometry import wkb
    x0, pw, _, y0, _, ph = synth.GEOTRANSFORM
    got = []
    for r in out:
        g = wkb.loads(bytes(r["geometry"]))
        for seg in g["coordinates"]:
            # CRS → pixel-center coords (invert the transform)
            p = [( (c[0] - x0) / pw - 0.5, (c[1] - y0) / ph - 0.5)
                 for c in np.asarray(seg)]
            got.append((round(p[0][0], 6), round(p[0][1], 6),
                        round(p[1][0], 6), round(p[1][1], 6)))
    # want arr computed in float64; tiles store float32 → recompute want
    # from the float32-rounded array for exact comparison
    want32 = contour_segments_kernel(
        arr.astype("<f4").astype(np.float64), level)
    want_set = sorted(
        (round(s[0], 6), round(s[1], 6), round(s[2], 6), round(s[3], 6))
        for s in want32
    )
    assert sorted(got) == want_set and len(want_set) > 100


def test_polygonize_exact_boundaries(spark):
    """Pixel-exact boundary traces: area == n_pixels × pixel area for
    arbitrary shapes (L-shape, diagonal touch, donut with hole)."""
    from spapy_spark.geometry import kernels, wkb
    from spapy_spark.operators.raster import trace_mask_rings

    # unit checks on the tracer itself
    m = np.zeros((8, 8), bool)
    m[1:4, 1:6] = True   # bar
    m[1:7, 1:3] = True   # L
    rings = trace_mask_rings(m)
    assert len(rings) == 1
    area = abs(kernels.ring_signed_area(rings[0]))
    assert area == m.sum()
    # diagonal touch stays two components' worth of boundary
    m2 = np.zeros((4, 4), bool)
    m2[0, 0] = True
    m2[1, 1] = True
    r2 = trace_mask_rings(m2)
    assert len(r2) == 2
    assert sum(abs(kernels.ring_signed_area(r)) for r in r2) == 2.0
    # donut: exterior + hole ring
    m3 = np.zeros((8, 8), bool)
    m3[1:7, 1:7] = True
    m3[3:5, 3:5] = False
    r3 = trace_mask_rings(m3)
    assert len(r3) == 2
    areas = sorted(abs(kernels.ring_signed_area(r)) for r in r3)
    assert areas == [4.0, 36.0]

    # end-to-end through the tile operator
    a = np.zeros((64, 64), dtype="<f4")
    a[5:15, 5:15] = 7.0
    a[8:12, 8:12] = 0.0  # hole in the plateau
    rows = [("r", 1, 0, 0, 64, 64, -9999.0, a.tobytes())]
    tiles = spark.createDataFrame(rows, schema=synth.RASTER_SCHEMA)
    out = raster.polygonize_tiles(
        tiles, synth.GEOTRANSFORM, synth.TILE
    ).collect()
    px_area = abs(synth.GEOTRANSFORM[1] * synth.GEOTRANSFORM[5])
    for r in out:
        g = wkb.loads(bytes(r["geometry"]))
        assert kernels.geom_area(g) == pytest.approx(
            r["n_pixels"] * px_area, rel=1e-9
        )


def test_color_relief(spark, smooth_tiles):
    out = terrain.color_relief(smooth_tiles).collect()
    # 3 bands per input tile
    assert len(out) == synth.GRID * synth.GRID * 3
    assert sorted({r["band"] for r in out}) == [1, 2, 3]
    # whole-raster oracle per band
    gy, gx = np.mgrid[0:synth.GRID * synth.TILE, 0:synth.GRID * synth.TILE]
    arr = synth.dem_value(gx.astype(np.float64), gy.astype(np.float64)).astype(
        np.float64
    )
    elev = np.array([r[0] for r in terrain.DEFAULT_RAMP])
    for band in (1, 2, 3):
        cv = np.array([r[band] for r in terrain.DEFAULT_RAMP], dtype=np.float64)
        want = np.rint(np.interp(arr, elev, cv)).astype(np.float32)
        got = _assemble([r for r in out if r["band"] == band])
        np.testing.assert_array_equal(got, want)
    # values are integer color levels in range
    g = _assemble([r for r in out if r["band"] == 1])
    assert g.min() >= 0 and g.max() <= 255


def test_contour_to_shapefile_roundtrip(spark, tmp_path):
    # reference parity: SpaTopo.Contour writes a contour SHAPEFILE
    # (/root/reference/SpaPyTests/Tests/SpaTopoTest.py:51) — our
    # contour MultiLineStrings roundtrip through the from-scratch
    # PolyLine writer/reader with coordinates intact
    from spapy_spark.sources import shapefile

    tiles = synth.quad_raster_tiles(spark)
    out = terrain.contour(
        tiles, [20000.125], synth.GRID, synth.TILE, synth.GEOTRANSFORM
    ).collect()
    assert len(out) > 0
    pdf = pd.DataFrame({
        "tile_y": [r["tile_y"] for r in out],
        "tile_x": [r["tile_x"] for r in out],
        "nseg": [r["n_segments"] for r in out],
        "geometry": [bytes(r["geometry"]) for r in out],
    })
    p = str(tmp_path / "contours.shp")
    shapefile.write_pdf(pdf, p)
    back = shapefile.read_pdf(p)
    assert len(back) == len(pdf)
    from spapy_spark.geometry import wkb as _wkb

    for i in range(len(pdf)):
        g0 = _wkb.loads(pdf["geometry"].iloc[i])
        g1 = _wkb.loads(bytes(back["geometry"].iloc[i]))
        c0 = np.vstack(
            g0["coordinates"] if g0["type"] == "MultiLineString"
            else [g0["coordinates"]]
        )
        c1 = np.vstack(
            g1["coordinates"] if g1["type"] == "MultiLineString"
            else [g1["coordinates"]]
        )
        np.testing.assert_array_equal(c0, c1)


@pytest.mark.parametrize("pq", [(3, 2), (5, 4), (3, 4)])
def test_resample_bilinear_rational_matches_whole_raster(
    spark, smooth_tiles, pq
):
    """Rational p/q zoom (up 3/2, 5/4; down 3/4) must equal a single-
    array evaluation of the same order-1 sampling on the edge-padded
    raster BIT-EXACTLY — the kernel computes its sample grid in global
    coordinates precisely so tiling cannot perturb the weights."""
    p_, q_ = pq
    out = raster.resample_bilinear_rational(
        smooth_tiles, p_, q_, grid=synth.GRID, tile=synth.TILE
    ).collect()
    H = synth.GRID * synth.TILE
    Hout = H * p_ // q_
    ts = synth.TILE * p_ // q_
    got = np.zeros((Hout, Hout), dtype=np.float32)
    for r in out:
        a = np.frombuffer(bytes(r["pixels"]), dtype="<f4").reshape(
            r["height"], r["width"]
        )
        assert r["height"] == ts and r["width"] == ts
        got[r["tile_y"] * ts:(r["tile_y"] + 1) * ts,
            r["tile_x"] * ts:(r["tile_x"] + 1) * ts] = a
    gy, gx = np.mgrid[0:H, 0:H]
    arr = synth.dem_value(gx.astype(np.float64), gy.astype(np.float64))
    pad = np.pad(arr.astype(np.float64), 1, mode="edge")
    o = (np.arange(Hout, dtype=np.float64) + 0.5) * float(q_) / float(p_) \
        - 0.5
    yg = np.floor(o).astype(np.int64)
    fy = (o - yg)[:, None]
    fx = (o - yg)[None, :]
    y0 = yg + 1  # pad offset, integer arithmetic
    want = (
        pad[np.ix_(y0, y0)] * (1 - fy) * (1 - fx)
        + pad[np.ix_(y0 + 1, y0)] * fy * (1 - fx)
        + pad[np.ix_(y0, y0 + 1)] * (1 - fy) * fx
        + pad[np.ix_(y0 + 1, y0 + 1)] * fy * fx
    ).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_resample_rational_validation(spark, smooth_tiles):
    with pytest.raises(ValueError):
        raster.resample_bilinear_rational(
            smooth_tiles, 2, 3, grid=synth.GRID, tile=synth.TILE
        )  # 64*2 % 3 != 0
    with pytest.raises(ValueError):
        raster.resample_bilinear_rational(
            smooth_tiles, 0, 1, grid=synth.GRID, tile=synth.TILE
        )
