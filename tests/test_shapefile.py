"""Shapefile reader vs the reference's own test data (NaturalEarth +
Box.shp — the exact files SpaPy's tests load, /root/reference/
SpaPyTests/Tests/SpaVectorTest.py:34,215)."""

import numpy as np
import pytest

from spapy_spark.geometry import kernels, wkb
from spapy_spark.sources import io as sio
from spapy_spark.sources import shapefile

NE = "/root/reference/SpaPyTests/Data/NaturalEarth"
BOX = "/root/reference/SpaPyTests/Data/Overlay/Box.shp"


def test_box_shp():
    pdf = shapefile.read_pdf(BOX)
    assert len(pdf) == 1
    g = wkb.loads(pdf["geometry"].iloc[0])
    assert g["type"] in ("Polygon", "MultiPolygon")
    # Box.shp is the overlay window SpaPy's vector test intersects with
    minx, miny, maxx, maxy = kernels.geom_bounds(g)
    assert minx < maxx and miny < maxy


def test_countries_layer():
    pdf = shapefile.read_pdf(f"{NE}/ne_110m_admin_0_countries.shp")
    # NaturalEarth 110m admin0 has 177 countries
    assert len(pdf) == 177
    assert "ADMIN" in pdf.columns or "NAME" in pdf.columns
    name_col = "ADMIN" if "ADMIN" in pdf.columns else "NAME"
    usa = pdf[pdf[name_col] == "United States of America"]
    assert len(usa) == 1  # the SelectEqual target of SpaVectorTest:178
    g = wkb.loads(usa["geometry"].iloc[0])
    assert g["type"] == "MultiPolygon"  # Alaska, Hawaii, mainland…
    assert len(g["coordinates"]) > 3
    # bounds are geographic
    minx, miny, maxx, maxy = kernels.geom_bounds(g)
    assert -180 <= minx < maxx <= 180 and -90 <= miny < maxy <= 90


def test_rivers_polylines():
    pdf = shapefile.read_pdf(f"{NE}/ne_110m_rivers_lake_centerlines.shp")
    assert len(pdf) > 5
    types = {wkb.loads(b)["type"] for b in pdf["geometry"] if b is not None}
    assert types <= {"LineString", "MultiLineString"}


def test_populated_places_points():
    pdf = shapefile.read_pdf(f"{NE}/ne_110m_populated_places_simple.shp")
    assert len(pdf) > 100
    g = wkb.loads(pdf["geometry"].iloc[0])
    assert g["type"] == "Point"
    # attribute typing: pop_max is numeric in the dbf
    num_cols = [c for c in pdf.columns
                if pdf[c].dtype.kind in "if" and c != "geometry"]
    assert len(num_cols) > 2


def test_spark_roundtrip_and_dispatch(spark):
    df = sio.read_any(spark, f"{NE}/ne_110m_admin_0_countries.shp")
    assert df.count() == 177
    from spapy_spark.operators import vector

    areas = vector.with_area(df.select("geometry")).agg(
        {"area": "sum"}
    ).collect()[0][0]
    assert areas > 1000  # degrees² of all land
    with pytest.raises(ValueError):
        sio.read_any(spark, "/tmp/x.xyz")


def test_writer_roundtrip_polygons(tmp_path):
    """write_pdf → read_pdf roundtrip on the synthetic zone layer
    (convex polygons, giant boxes, multipolygons, one holed polygon):
    geometry areas/bounds and attributes survive."""
    from spapy_spark.geometry import kernels, wkb
    from spapy_spark.sources import shapefile, synth

    pdf = synth.zones_pdf(50)
    p = str(tmp_path / "zones.shp")
    shapefile.write_pdf(pdf, p)
    back = shapefile.read_pdf(p)
    assert len(back) == len(pdf)
    assert list(back["zone_id"]) == list(pdf["zone_id"])
    assert list(back["name"]) == list(pdf["name"])
    for a, b in zip(pdf["pop_est"], back["pop_est"]):
        assert abs(a - b) <= 1e-9 * max(1.0, abs(a))
    for ga, gb in zip(pdf["geometry"], back["geometry"]):
        A = wkb.loads(bytes(ga))
        B = wkb.loads(bytes(gb))
        assert kernels.geom_area(B) == pytest.approx(
            kernels.geom_area(A), rel=1e-12
        )
        assert kernels.geom_bounds(B) == pytest.approx(
            kernels.geom_bounds(A), rel=1e-12
        )


def test_writer_roundtrip_points_and_nulls(tmp_path):
    from spapy_spark.geometry import wkb
    from spapy_spark.sources import shapefile
    import pandas as pd

    pdf = pd.DataFrame({
        "fid": [1, 2, 3],
        "tag": ["a", "b", None],
        "geometry": [
            wkb.dumps(wkb.point(1.5, -2.25)),
            None,
            wkb.dumps(wkb.point(-100.0, 45.0)),
        ],
    })
    p = str(tmp_path / "pts.shp")
    shapefile.write_pdf(pdf, p)
    back = shapefile.read_pdf(p)
    assert back["geometry"][1] is None
    g = wkb.loads(bytes(back["geometry"][0]))
    assert g["type"] == "Point" and tuple(g["coordinates"]) == (1.5, -2.25)
    assert list(back["fid"]) == [1, 2, 3]


def test_dbf_vectorized_writer_nulls_and_types(tmp_path):
    """The struct-packed .dbf writer (no per-row Python) must encode
    ints/floats/bools/strings with nulls exactly like the dBASE spec:
    right-justified numerics, 'T'/'F' logicals, space-padded text,
    all-space nulls."""
    import pandas as pd

    from spapy_spark.geometry import wkb as _wkb
    from spapy_spark.sources import shapefile as shp

    pdf = pd.DataFrame({
        "n_int": pd.array([1, -42, None, 10**17], dtype="Int64"),
        "n_flt": [1.5, None, -3.25, 2.0],
        "flag": [True, False, True, False],
        "name": ["abc", None, "é" * 300, ""],  # >254 → truncated
        "geometry": [_wkb.dumps(_wkb.box(i, 0, i + 1, 1))
                     for i in range(4)],
    })
    p = str(tmp_path / "t.shp")
    shp.write_pdf(pdf, p)
    back = shp.read_pdf(p)
    assert back["n_int"][0] == 1 and back["n_int"][1] == -42
    assert pd.isna(back["n_int"][2])
    assert back["n_int"][3] == 10**17
    assert back["n_flt"][0] == 1.5 and back["n_flt"][2] == -3.25
    assert pd.isna(back["n_flt"][1])
    assert list(back["flag"]) == [True, False, True, False]
    assert back["name"][0] == "abc"
    assert back["name"][2] == "é" * 254  # dBASE C width cap
    # raw record block: deletion flag + right-justified int field
    raw = open(str(tmp_path / "t.dbf"), "rb").read()
    hsize = int.from_bytes(raw[8:10], "little")
    rsize = int.from_bytes(raw[10:12], "little")
    rec0 = raw[hsize:hsize + rsize]
    assert rec0[0:1] == b" "
    assert rec0[1:19] == b"                 1"  # %18d
