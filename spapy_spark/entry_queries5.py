"""Round-5 contract queries: datum shifts, GeoJSON/GeoPackage vector
IO, the read_any/write_raster extension map (AAIGrid + PNG paths).

Every query has a bit-exact DuckDB oracle twin; computed columns are
aliased identically on both sides.  Fixture derivations reuse the
repo's dyadic-grid conventions (k*primes % pow2 / 1024) so oracle
arithmetic is exact in both engines.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .entry_queries import PTS_SQL, derived_points
from .entry_queries3 import _dlit
from .operators import raster, vector
from .sources import synth


# ---------------------------------------------------------------------------
# crs_nad27 — geographic datum shift (r4 VERDICT missing #4)
# ---------------------------------------------------------------------------


def q_crs_nad27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NAD27→WGS84 geographic datum shift (EPSG 9603 geocentric
    translation: geodetic→ECEF on Clarke 1866, +towgs84 translation,
    Bowring+Newton back to geodetic on WGS84).  The reference gets
    this from pyproj's datum database
    (/root/reference/SpaReferencing.py:162-271); the oracle re-runs
    the whole chain in SQL.  atan2/hypot differ from numpy by 1 ulp on
    a fraction of inputs (~1e-13 deg downstream) — 7-dp rounding with
    a 1e-10 dither absorbs it (same discipline as crs_albers)."""
    from .geometry import crs

    pts = derived_points(spark, sf_dir)

    def tx(batches):
        for pdf in batches:
            lo, la = crs.transform_arrays(
                pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                "epsg:4267", "epsg:4326",
            )
            yield pd.DataFrame(
                {"point_id": pdf["point_id"], "lon_w": lo, "lat_w": la}
            )

    out = pts.mapInPandas(
        tx, schema="point_id bigint, lon_w double, lat_w double"
    )
    return out.select(
        "point_id",
        F.round(F.col("lon_w") + F.lit(1e-10), 7).alias("lon_w"),
        F.round(F.col("lat_w") + F.lit(1e-10), 7).alias("lat_w"),
    ).orderBy("point_id")


def _crs_nad27_oracle_sql() -> str:
    from .geometry import crs

    a_s, rf_s = crs._ELLIPSOIDS["clrk66"]
    a_w, rf_w = crs._ELLIPSOIDS["WGS84"]
    f_s, f_w = 1.0 / rf_s, 1.0 / rf_w
    e2s = _dlit(f_s * (2.0 - f_s))
    e2w_v = f_w * (2.0 - f_w)
    e2w = _dlit(e2w_v)
    b_w = a_w * (1.0 - f_w)
    ep2b = _dlit((e2w_v / (1.0 - e2w_v)) * b_w)  # ep2*b, scalar-first
    e2aw = _dlit(e2w_v * a_w)                    # e2*a, scalar-first
    asl, awl, bwl = _dlit(a_s), _dlit(a_w), _dlit(b_w)
    dx, dy, dz = "(-8.0)", "160.0", "176.0"
    newton = (
        " n{i} AS (SELECT point_id, x, y, z, p,"
        f" {awl} / sqrt(1 - ({e2w} * sin(ph{{j}})) * sin(ph{{j}}))"
        " AS nn, ph{j} FROM s{j}),"
        " h{i} AS (SELECT point_id, x, y, z, p, nn,"
        " p / cos(ph{j}) - nn AS hh, ph{j} FROM n{i}),"
        " s{i} AS (SELECT point_id, x, y, z, p,"
        f" atan2(z, p * (1 - ({e2w} * nn) / (nn + hh))) AS ph{{i}}"
        " FROM h{i})"
    )
    return (
        f"WITH pts AS ({PTS_SQL}),"
        " rad AS (SELECT point_id, radians(lon) AS lam,"
        " radians(lat) AS phi FROM pts),"
        f" ec AS (SELECT point_id, lam, phi, {asl} /"
        f" sqrt(1 - ({e2s} * sin(phi)) * sin(phi)) AS nn FROM rad),"
        " xyz AS (SELECT point_id,"
        f" nn * cos(phi) * cos(lam) + {dx} AS x,"
        f" nn * cos(phi) * sin(lam) + {dy} AS y,"
        f" (nn * (1 - {e2s})) * sin(phi) + {dz} AS z FROM ec),"
        " pp AS (SELECT point_id, x, y, z, sqrt(x*x + y*y) AS p"
        " FROM xyz),"
        f" th AS (SELECT point_id, x, y, z, p, atan2(z * {awl},"
        f" p * {bwl}) AS theta FROM pp),"
        " s0 AS (SELECT point_id, x, y, z, p,"
        f" atan2(z + ({ep2b} * sin(theta)) * sin(theta) * sin(theta),"
        f" p - ({e2aw} * cos(theta)) * cos(theta) * cos(theta)) AS ph0"
        " FROM th),"
        + newton.format(i=1, j=0) + ","
        + newton.format(i=2, j=1)
        + " SELECT point_id,"
        " ROUND(degrees(atan2(y, x)) + 0.0000000001, 7) AS lon_w,"
        " ROUND(degrees(ph2) + 0.0000000001, 7) AS lat_w"
        " FROM s2 ORDER BY point_id"
    )


# ---------------------------------------------------------------------------
# Vector format roundtrips — GeoJSON (distributed seq read) + GPKG
# ---------------------------------------------------------------------------


def _box_fixture(sf_dir: str, modulo: int, px, py, pw, ph):
    """Dyadic box table off orders keys — exact in both engines."""
    import duckdb as _duck

    from .geometry import wkb as _wkb

    con = _duck.connect()
    ks = con.execute(
        f"SELECT o_orderkey FROM '{sf_dir}/orders.parquet'"
        f" WHERE o_orderkey % {modulo} = 0 ORDER BY o_orderkey"
    ).fetchnumpy()["o_orderkey"].astype(np.int64)
    con.close()
    cx = ((ks * px) % 4096) / 1024.0 - 2.0
    cy = ((ks * py) % 4096) / 1024.0 - 2.0
    w = (((ks * pw) % 256) + 64) / 1024.0
    h = (((ks * ph) % 256) + 64) / 1024.0
    return pd.DataFrame(
        {
            "point_id": ks,
            "geometry": [
                _wkb.dumps(_wkb.box(a - c, b - d, a + c, b + d))
                for a, b, c, d in zip(cx, cy, w, h)
            ],
        }
    )


def _box_area_sql(modulo: int, pw: int, ph: int) -> str:
    return (
        "SELECT o_orderkey AS point_id,"
        f" (2 * ((((o_orderkey * {pw}) % 256) + 64) / 1024.0))"
        f" * (2 * ((((o_orderkey * {ph}) % 256) + 64) / 1024.0)) AS area"
        f" FROM orders WHERE o_orderkey % {modulo} = 0"
        " ORDER BY point_id"
    )


def q_geojson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write boxes as LINE-DELIMITED GeoJSON features, re-read with the
    distributed seq reader (spark.read.text + Arrow-batched parse —
    the 100-TB path), shoelace areas.  Exercises the full json→WKB
    coordinate chain; reference reads GeoJSON via fiona
    (/root/reference/SpaVectors.py:195-222)."""
    import json

    from .sources import geojson

    pdf = _box_fixture(sf_dir, 36, 9973, 7919, 31, 57)
    path = os.path.join(
        tempfile.gettempdir(), f"spapy_rt_{os.getpid()}_boxes.geojsonl"
    )
    with open(path, "w", encoding="utf-8") as f:
        for _, r in pdf.iterrows():
            f.write(json.dumps({
                "type": "Feature",
                "geometry": geojson.wkb_to_geometry(r["geometry"]),
                "properties": {"point_id": int(r["point_id"])},
            }) + "\n")
    df = geojson.read_geojson_seq(
        spark, path, "point_id long, geometry binary"
    )
    out = vector.with_area(df)
    return out.select("point_id", "area").orderBy("point_id")


def q_gpkg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write boxes to a spec-conformant GeoPackage (stdlib sqlite3 +
    GPB wrapping), re-read with the DISTRIBUTED rowid-ranged reader,
    shoelace areas.  Reference reads GPKG via fiona like any OGR
    format (/root/reference/SpaVectors.py:195-222)."""
    from .sources import geopackage

    pdf = _box_fixture(sf_dir, 44, 7919, 9973, 57, 31)
    path = os.path.join(
        tempfile.gettempdir(), f"spapy_rt_{os.getpid()}_boxes.gpkg"
    )
    geopackage.write_geopackage(pdf, path, table="boxes")
    df = geopackage.read_geopackage(spark, path, partitions=8)
    out = vector.with_area(df)
    return out.select(
        F.col("point_id").cast("long").alias("point_id"), "area"
    ).orderBy("point_id")


def q_gpkg_bbox_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GeoPackage window read THROUGH the gpkg_rtree_index extension:
    the writer builds the SQLite R*Tree, every rowid-range task joins
    its slice against it, and only window-intersecting features ever
    leave the container (GDAL reads GPKG windows the same way).  The
    oracle recomputes the envelope intersection in closed form, so a
    wrong index entry OR a wrong pushdown predicate breaks the hash."""
    from .operators import vector as _vector
    from .sources import geopackage

    pdf = _box_fixture(sf_dir, 28, 9973, 7919, 57, 31)
    path = os.path.join(
        tempfile.gettempdir(), f"spapy_rt_{os.getpid()}_win.gpkg"
    )
    geopackage.write_geopackage(pdf, path, table="boxes")
    bbox = (-1.0, -1.5, 1.25, 0.75)
    df = geopackage.read_geopackage(spark, path, partitions=8, bbox=bbox)
    out = _vector.with_area(df)
    return out.select(
        F.col("point_id").cast("long").alias("point_id"), "area"
    ).orderBy("point_id")


def _gpkg_bbox_oracle_sql() -> str:
    cx = "(((o_orderkey * 9973) % 4096) / 1024.0 - 2.0)"
    cy = "(((o_orderkey * 7919) % 4096) / 1024.0 - 2.0)"
    w = "(((((o_orderkey * 57) % 256)) + 64) / 1024.0)"
    h = "(((((o_orderkey * 31) % 256)) + 64) / 1024.0)"
    return (
        f"SELECT o_orderkey AS point_id, (2 * {w}) * (2 * {h}) AS area"
        " FROM orders WHERE o_orderkey % 28 = 0"
        f" AND {cx} + {w} >= -1.0 AND {cx} - {w} <= 1.25"
        f" AND {cy} + {h} >= -1.5 AND {cy} - {h} <= 0.75"
        " ORDER BY point_id"
    )


# ---------------------------------------------------------------------------
# Raster save/read extension map — AAIGrid + PNG through write_raster /
# read_any (r4 VERDICT missing #1/#2)
# ---------------------------------------------------------------------------


def q_aaigrid_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Esri ASCII grid save→read_any→per-tile stats: text round-trip
    of the algebraic raster (reference .asc save via the AAIGrid GDAL
    driver, /root/reference/SpaRasters.py:769-777)."""
    from .sources import io as _io

    gy, gx = np.mgrid[0:100, 0:120]
    arr = ((gx * 7 + gy * 13) % 97).astype(np.int32)
    path = os.path.join(
        tempfile.gettempdir(), f"spapy_rt_{os.getpid()}.asc"
    )
    _io.write_raster(path, arr)
    tiles = _io.read_any(spark, path)
    st = raster.tile_stats(tiles)
    return st.select(
        "tile_y", "tile_x", "n_valid",
        F.col("sum").cast("long").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("tile_y", "tile_x")


def _aaigrid_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT gx, gy FROM generate_series(0, 119) a(gx)"
        " CROSS JOIN generate_series(0, 99) b(gy)),"
        " v AS (SELECT gy // 64 AS tile_y, gx // 64 AS tile_x,"
        " (gx * 7 + gy * 13) % 97 AS val FROM g)"
        " SELECT CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid,"
        " CAST(sum(val) AS BIGINT) AS sum_val,"
        " CAST(min(val) AS DOUBLE) AS min_val,"
        " CAST(max(val) AS DOUBLE) AS max_val"
        " FROM v GROUP BY tile_y, tile_x ORDER BY tile_y, tile_x"
    )


def q_png_raster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-band uint8 raster → write_raster('.png') → read_any → per-band
    checksums.  PNG is lossless, so the closed form survives the full
    encode(filter+deflate)/decode chain bit-exactly (reference .png
    save, /root/reference/SpaRasters.py:769-771)."""
    from .sources import io as _io

    gy, gx = np.mgrid[0:90, 0:130]
    bands = np.stack(
        [((gx * 3 + gy * 5 + b * 11) % 256).astype(np.uint8)
         for b in range(3)]
    )
    path = os.path.join(
        tempfile.gettempdir(), f"spapy_rt_{os.getpid()}.png"
    )
    _io.write_raster(path, bands, filter_type=3)  # average filter
    tiles = _io.read_any(spark, path)
    st = raster.band_stats(tiles)
    return st.select(
        "band",
        F.col("count").alias("n_px"),
        F.col("sum").cast("long").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("band")


def _png_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT gx, gy, b FROM generate_series(0, 129) a(gx)"
        " CROSS JOIN generate_series(0, 89) c(gy)"
        " CROSS JOIN generate_series(0, 2) d(b))"
        " SELECT CAST(b + 1 AS INTEGER) AS band,"
        " CAST(count(*) AS BIGINT) AS n_px,"
        " CAST(sum((gx * 3 + gy * 5 + b * 11) % 256) AS BIGINT)"
        " AS sum_val,"
        " CAST(min((gx * 3 + gy * 5 + b * 11) % 256) AS DOUBLE)"
        " AS min_val,"
        " CAST(max((gx * 3 + gy * 5 + b * 11) % 256) AS DOUBLE)"
        " AS max_val"
        " FROM g GROUP BY b ORDER BY band"
    )


def q_webp_raster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-band uint8 raster → write_raster('.webp') → read_any →
    per-band checksums.  VP8L is lossless (from-scratch RFC 9649
    codec in sources/webp.py) so the closed form survives the full
    prefix-code/LZ77 chain bit-exactly; the reference reads WebP via
    GDAL/PIL."""
    from .sources import io as _io

    gy, gx = np.mgrid[0:75, 0:110]
    bands = np.stack(
        [((gx * 13 + gy * 7 + b * 29) % 251).astype(np.uint8)
         for b in range(3)]
    )
    path = os.path.join(
        tempfile.gettempdir(), f"spapy_rt_{os.getpid()}.webp"
    )
    _io.write_raster(path, bands, cache_bits=5)
    tiles = _io.read_any(spark, path)
    st = raster.band_stats(tiles)
    return st.select(
        "band",
        F.col("count").alias("n_px"),
        F.col("sum").cast("long").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("band")


def _webp_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT gx, gy, b FROM generate_series(0, 109) a(gx)"
        " CROSS JOIN generate_series(0, 74) c(gy)"
        " CROSS JOIN generate_series(0, 2) d(b))"
        " SELECT CAST(b + 1 AS INTEGER) AS band,"
        " CAST(count(*) AS BIGINT) AS n_px,"
        " CAST(sum((gx * 13 + gy * 7 + b * 29) % 251) AS BIGINT)"
        " AS sum_val,"
        " CAST(min((gx * 13 + gy * 7 + b * 29) % 251) AS DOUBLE)"
        " AS min_val,"
        " CAST(max((gx * 13 + gy * 7 + b * 29) % 251) AS DOUBLE)"
        " AS max_val"
        " FROM g GROUP BY b ORDER BY band"
    )


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def build_queries() -> dict:
    return {
        "crs_nad27": q_crs_nad27,
        "geojson_roundtrip": q_geojson_roundtrip,
        "gpkg_roundtrip": q_gpkg_roundtrip,
        "gpkg_bbox_window": q_gpkg_bbox_window,
        "aaigrid_roundtrip": q_aaigrid_roundtrip,
        "png_raster_stats": q_png_raster_stats,
        "webp_raster_stats": q_webp_raster_stats,
    }


def build_oracle_sql() -> dict:
    return {
        "crs_nad27": _crs_nad27_oracle_sql(),
        "geojson_roundtrip": _box_area_sql(36, 31, 57),
        "gpkg_roundtrip": _box_area_sql(44, 57, 31),
        "gpkg_bbox_window": _gpkg_bbox_oracle_sql(),
        "aaigrid_roundtrip": _aaigrid_oracle_sql(),
        "png_raster_stats": _png_oracle_sql(),
        "webp_raster_stats": _webp_oracle_sql(),
    }
