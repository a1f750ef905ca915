"""Round-3 driver-contract queries: oracle twins for the terrain,
raster-shape (crop/resample/polygonize/contour), and file-IO families
that were pytest-only in rounds 1-2 (VERDICT r2 item 1).

Fixture discipline — the closed-form-DEM playbook:

* ``synth.quad_value``: an elliptic paraboloid whose Horn/central
  gradients are nonzero INTEGERS everywhere (closed-form constants on
  the linear-extrapolated raster border), so slope/aspect/hillshade
  reduce to per-pixel algebra over (dzdx, dzdy) that DuckDB recomputes.
  The transcendental tail (atan/atan2) differs from numpy by ≤1 ulp in
  float64 — the engine's float32 tile codec absorbs it, so BOTH sides
  compare through a float32 cast, bit-exact (verified empirically:
  sin/cos/sqrt/degrees are bit-identical glibc, atan/atan2 are 1-ulp,
  float32(round) of both is identical).
* TRI/TPI/roughness, crop, nearest/bilinear resample and the block
  polygonize are dyadic-rational end-to-end → EXACT oracle rows, no
  rounding at all.
* GeoTIFF / shapefile IO get contract rows by ROUNDTRIPPING through
  the from-scratch writer+reader inside the query; the oracle knows
  only the closed form, so any codec bug breaks the hash.

Reference parity: SpaTopo.py:51-233 (hillshade/slope/aspect/TRI/TPI/
roughness), SpaTopo.py:185-233 (contour), SpaRasters.py:827-882
(polygonize), :1235-1498 (crop/resample), :687-782 (GeoTIFF load/save),
SpaVectors.py:195-260 (shapefile load/save).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .entry_queries import load
from .operators import raster, terrain, vector
from .sources import synth

# ---------------------------------------------------------------------------
# Shared SQL fragments
# ---------------------------------------------------------------------------

# Horn == central-difference gradients of the separable quad DEM
# (integers; boundary columns use the linear-extrapolation closed form:
# dzdx(0) = X(1)-X(0) = -254, dzdx(255) = X(255)-X(254) = 254, etc.)
_DZDX = (
    "CASE WHEN gx = 0 THEN -254.0 WHEN gx = 255 THEN 254.0"
    " ELSE CAST(2 * gx - 255 AS DOUBLE) END"
)
_DZDY = (
    "CASE WHEN gy = 0 THEN -508.0 WHEN gy = 255 THEN 508.0"
    " ELSE CAST(2 * (2 * gy - 255) AS DOUBLE) END"
)

# in-raster sample points derived from orders keys (the raster_sample
# derivation: lon in [-10, -7.45), lat in (7.45, 10])
_TPTS_SQL = (
    "SELECT o_orderkey AS point_id,"
    " -10.0 + ((o_orderkey * 7919) % 25500) / 10000.0 + 0.00005 AS lon,"
    " 10.0 - ((o_orderkey * 9973) % 25500) / 10000.0 - 0.00005 AS lat"
    " FROM orders"
)

_TPX_SQL = (
    f"WITH pts AS ({_TPTS_SQL}),"
    " px AS (SELECT point_id,"
    " CAST(floor((lon - (-10.0)) / 0.01) AS BIGINT) AS gx,"
    " CAST(floor((lat - 10.0) / (-0.01)) AS BIGINT) AS gy FROM pts)"
)


def _terrain_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        k.alias("point_id"),
        (F.lit(-10.0) + ((k * 7919) % 25500) / 10000.0 + 0.00005).alias("lon"),
        (F.lit(10.0) - ((k * 9973) % 25500) / 10000.0 - 0.00005).alias("lat"),
    )


def _sampled_focal(spark: SparkSession, sf_dir: str, op: str) -> DataFrame:
    """focal(quad DEM, op) → value-at-point sample → (point_id, value).

    The sampled value is the engine's float32 pixel widened to double —
    compared bit-exact against the oracle's CAST(... AS FLOAT) twin."""
    tiles = synth.quad_raster_tiles(spark)
    out = terrain.focal(tiles, op, grid=synth.GRID, tile=synth.TILE,
                        out_raster_id=op)
    pts = _terrain_points(spark, sf_dir)
    s = raster.sample_points(
        pts, out, synth.GEOTRANSFORM, synth.TILE, raster_id=op,
        point_cols=["point_id"],
    )
    return s.orderBy("point_id")


def q_terrain_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn slope (degrees) on the quad DEM, sampled at derived points
    (reference gdaldem-slope path, /root/reference/SpaTopo.py:147-182).
    """
    return _sampled_focal(spark, sf_dir, "slope")


def _terrain_slope_oracle_sql() -> str:
    return (
        _TPX_SQL +
        " SELECT point_id, CAST(CAST(degrees(atan(sqrt("
        f" ({_DZDX}) * ({_DZDX}) + ({_DZDY}) * ({_DZDY})"
        " ))) AS FLOAT) AS DOUBLE) AS value"
        " FROM px ORDER BY point_id"
    )


def q_terrain_aspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn aspect (compass degrees) on the quad DEM, sampled
    (/root/reference/SpaTopo.py:147-182 via gdal.DEMProcessing)."""
    return _sampled_focal(spark, sf_dir, "aspect")


def _terrain_aspect_oracle_sql() -> str:
    # engine: asp = degrees(atan2(dzdy, -dzdx)); remap to compass.
    # dzdx/dzdy are never 0 on this DEM, so the atan2 special values
    # (±0 arguments) are unreachable; the float32 cast absorbs the
    # 1-ulp float64 atan2 divergence between numpy and DuckDB.
    return (
        _TPX_SQL +
        f", a AS (SELECT point_id, degrees(atan2(({_DZDY}),"
        f" -({_DZDX}))) AS asp FROM px)"
        " SELECT point_id, CAST(CAST("
        " CASE WHEN asp < 0 THEN 90.0 - asp"
        " WHEN asp > 90.0 THEN 360.0 - asp + 90.0"
        " ELSE 90.0 - asp END"
        " AS FLOAT) AS DOUBLE) AS value"
        " FROM a ORDER BY point_id"
    )


def q_terrain_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hillshade (az 315°, alt 45°, 0-255) on the quad DEM, sampled
    (/root/reference/SpaTopo.py:51-80 formula family)."""
    return _sampled_focal(spark, sf_dir, "hillshade")


def _terrain_hillshade_oracle_sql() -> str:
    # mirror hillshade_kernel's FP evaluation order exactly:
    # slope = pi/2 - atan(sqrt(gx²+gy²)); aspect = atan2(-gx, gy);
    # az = radians(135); alt = radians(45);
    # shaded = sin(alt)*sin(slope) + cos(alt)*cos(slope)*cos(az-aspect)
    # out = 255*(shaded+1)/2  → float32
    return (
        _TPX_SQL +
        f", g AS (SELECT point_id, ({_DZDX}) AS dx, ({_DZDY}) AS dy"
        " FROM px),"
        " t AS (SELECT point_id,"
        " pi() / 2.0 - atan(sqrt(dx * dx + dy * dy)) AS slope,"
        " atan2(-dx, dy) AS aspect FROM g)"
        " SELECT point_id, CAST(CAST("
        " 255.0 * ((sin(radians(45.0)) * sin(slope)"
        " + cos(radians(45.0)) * cos(slope)"
        " * cos(radians(135.0) - aspect)) + 1.0) / 2.0"
        " AS FLOAT) AS DOUBLE) AS value"
        " FROM t ORDER BY point_id"
    )


# ---------------------------------------------------------------------------
# TRI / TPI / roughness — dyadic-exact per-tile stats (no rounding)
# ---------------------------------------------------------------------------


def q_terrain_focal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRI + TPI + roughness over the quad DEM reduced to per-tile
    stats.  Every kernel output is an exact multiple of 1/32 (integer
    quarters in, /8 means out) → sums/mins/maxes are exact in float32
    AND in the oracle's float64 recomputation — zero rounding."""
    tiles = synth.quad_raster_tiles(spark)
    outs = []
    for op in ("tri", "tpi", "roughness"):
        o = terrain.focal(tiles, op, grid=synth.GRID, tile=synth.TILE,
                          out_raster_id=op)
        outs.append(raster.tile_stats(o))
    st = outs[0].unionByName(outs[1]).unionByName(outs[2])
    return st.select(
        F.col("raster_id").alias("op"), "tile_y", "tile_x", "n_valid",
        F.col("sum").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("op", "tile_y", "tile_x")


def _terrain_focal_oracle_sql() -> str:
    # padded separable DEM: xf on [-1..256] with linear-extrapolated
    # ends (2·XF(0)−XF(1) = 16510.25; symmetric at 256); yf likewise.
    return (
        "WITH pad AS (SELECT i,"
        " CASE WHEN i = -1 OR i = 256 THEN 16510.25"
        " ELSE (2*i - 255) * (2*i - 255) / 4.0 END AS xf,"
        " CASE WHEN i = -1 OR i = 256 THEN 33020.5"
        " ELSE (2*i - 255) * (2*i - 255) / 2.0 END AS yf"
        " FROM generate_series(-1, 256) s(i)),"
        " px AS (SELECT gx, gy FROM generate_series(0, 255) a(gx)"
        " CROSS JOIN generate_series(0, 255) b(gy)),"
        " off AS (SELECT dx, dy FROM (VALUES (-1),(0),(1)) o1(dx)"
        " CROSS JOIN (VALUES (-1),(0),(1)) o2(dy)),"
        " nb AS (SELECT p.gx, p.gy,"
        " cx.xf + cy.yf AS z, nx.xf + ny.yf AS zn,"
        " (o.dx = 0 AND o.dy = 0) AS is_c"
        " FROM px p CROSS JOIN off o"
        " JOIN pad cx ON cx.i = p.gx JOIN pad cy ON cy.i = p.gy"
        " JOIN pad nx ON nx.i = p.gx + o.dx"
        " JOIN pad ny ON ny.i = p.gy + o.dy),"
        " k AS (SELECT gx, gy,"
        " sum(abs(zn - z)) FILTER (WHERE NOT is_c) / 8.0 AS tri,"
        " any_value(z) - sum(zn) FILTER (WHERE NOT is_c) / 8.0 AS tpi,"
        " max(zn) - min(zn) AS rough"
        " FROM nb GROUP BY gx, gy),"
        " u AS (SELECT 'tri' AS op, gy // 64 AS tile_y, gx // 64 AS tile_x,"
        " tri AS v FROM k"
        " UNION ALL SELECT 'tpi', gy // 64, gx // 64, tpi FROM k"
        " UNION ALL SELECT 'roughness', gy // 64, gx // 64, rough FROM k)"
        " SELECT op, CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid, sum(v) AS sum_val,"
        " min(v) AS min_val, max(v) AS max_val"
        " FROM u GROUP BY op, tile_y, tile_x"
        " ORDER BY op, tile_y, tile_x"
    )


# ---------------------------------------------------------------------------
# Crop / resample — dyadic-exact per-tile stats
# ---------------------------------------------------------------------------


def q_crop_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtractByPixels window [37,201)×[22,240) of the algebraic
    raster → per-tile stats (reference SpaRasters.py:1341-1388).
    The window straddles all tile borders, so both the pass-through
    and the edge-slice paths are exercised."""
    tiles = synth.alg_raster_tiles(spark)
    out = raster.crop_pixels(tiles, 37, 22, 201, 240, synth.TILE)
    st = raster.tile_stats(out)
    return st.select(
        "tile_y", "tile_x", "n_valid",
        F.col("sum").cast("long").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("tile_y", "tile_x")


def _crop_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT gx, gy FROM generate_series(37, 200) a(gx)"
        " CROSS JOIN generate_series(22, 239) b(gy)),"
        " v AS (SELECT gy // 64 AS tile_y, gx // 64 AS tile_x,"
        " ((gx * 37 + gy * 91) % 1000) - 200 AS val FROM g)"
        " SELECT CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid,"
        " CAST(sum(val) AS BIGINT) AS sum_val,"
        " CAST(min(val) AS DOUBLE) AS min_val,"
        " CAST(max(val) AS DOUBLE) AS max_val"
        " FROM v GROUP BY tile_y, tile_x ORDER BY tile_y, tile_x"
    )


def q_resample_nn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-4 nearest-neighbor downsample → per-tile stats
    (reference SpaRasters.py:1390-1498).  Tile-local stride composes
    to the global identity out(y,x) = in(4y, 4x)."""
    tiles = synth.alg_raster_tiles(spark)
    out = raster.resample_nearest(tiles, 4, 4, synth.TILE, "nn")
    st = raster.tile_stats(out)
    return st.select(
        "tile_y", "tile_x", "n_valid",
        F.col("sum").cast("long").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("tile_y", "tile_x")


def _resample_nn_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT ox, oy FROM generate_series(0, 63) a(ox)"
        " CROSS JOIN generate_series(0, 63) b(oy)),"
        " v AS (SELECT oy // 16 AS tile_y, ox // 16 AS tile_x,"
        " (((4 * ox) * 37 + (4 * oy) * 91) % 1000) - 200 AS val FROM g)"
        " SELECT CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid,"
        " CAST(sum(val) AS BIGINT) AS sum_val,"
        " CAST(min(val) AS DOUBLE) AS min_val,"
        " CAST(max(val) AS DOUBLE) AS max_val"
        " FROM v GROUP BY tile_y, tile_x ORDER BY tile_y, tile_x"
    )


def q_resample_bilinear_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2× bilinear upsample (halo-exchanged, edge-clamped) → per-tile
    stats (reference scipy-zoom role, SpaRasters.py:1284-1339).
    Weights are {1,3,9}/16 on integer pixels → every output value is
    an exact multiple of 1/16: sums are exact, zero rounding."""
    tiles = synth.alg_raster_tiles(spark)
    out = raster.resample_bilinear(tiles, 2, synth.GRID, synth.TILE, "bi2")
    st = raster.tile_stats(out)
    return st.select(
        "tile_y", "tile_x", "n_valid", F.col("sum").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("tile_y", "tile_x")


def _resample_bilinear_oracle_sql() -> str:
    # out pixel (X,Y) ∈ 512²: src y0 = floor((Y-1)/2), fy = .75 if Y
    # even else .25; samples edge-clamped to [0,255]; z = alg formula.
    return (
        "WITH g AS (SELECT ox, oy FROM generate_series(0, 511) a(ox)"
        " CROSS JOIN generate_series(0, 511) b(oy)),"
        " c AS (SELECT ox, oy,"
        " CAST(floor((ox - 1) / 2.0) AS BIGINT) AS x0,"
        " CAST(floor((oy - 1) / 2.0) AS BIGINT) AS y0,"
        " CASE WHEN ox % 2 = 0 THEN 0.75 ELSE 0.25 END AS fx,"
        " CASE WHEN oy % 2 = 0 THEN 0.75 ELSE 0.25 END AS fy FROM g),"
        " s AS (SELECT ox, oy, fx, fy,"
        " LEAST(GREATEST(x0, 0), 255) AS xa,"
        " LEAST(GREATEST(x0 + 1, 0), 255) AS xb,"
        " LEAST(GREATEST(y0, 0), 255) AS ya,"
        " LEAST(GREATEST(y0 + 1, 0), 255) AS yb FROM c),"
        " v AS (SELECT oy // 128 AS tile_y, ox // 128 AS tile_x,"
        " (((xa * 37 + ya * 91) % 1000) - 200) * (1 - fy) * (1 - fx)"
        " + (((xa * 37 + yb * 91) % 1000) - 200) * fy * (1 - fx)"
        " + (((xb * 37 + ya * 91) % 1000) - 200) * (1 - fy) * fx"
        " + (((xb * 37 + yb * 91) % 1000) - 200) * fy * fx AS val"
        " FROM s)"
        " SELECT CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid, sum(val) AS sum_val,"
        " min(val) AS min_val, max(val) AS max_val"
        " FROM v GROUP BY tile_y, tile_x ORDER BY tile_y, tile_x"
    )


def q_resample_rational_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4/3 RATIONAL bilinear zoom (the general non-integer
    scipy.ndimage.zoom(order=1) role, reference SpaRasters.py:1284-1339)
    → per-tile stats.  Fixture is the alg raster re-tiled at 48 px
    (192² total) so tile·p/q = 64 is integral; with p = 4 a power of
    two, every sample coordinate (6·out − 1)/8 has an exact-eighth
    fraction → weights, pixel values, the float32 cast, and the f64
    tile sums are ALL dyadic-exact.  Zero rounding end-to-end."""
    tiles = synth.alg_raster_tiles(spark, grid=4, tile=48)
    out = raster.resample_bilinear_rational(
        tiles, 4, 3, grid=4, tile=48, out_raster_id="r43"
    )
    st = raster.tile_stats(out)
    return st.select(
        "tile_y", "tile_x", "n_valid", F.col("sum").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("tile_y", "tile_x")


def _resample_rational_oracle_sql() -> str:
    # out pixel (X,Y) ∈ 256²: src coord (6X−1)/8 (exact eighths), two
    # neighbors edge-clamped to [0,191]; val = alg formula.  Every
    # product is a dyadic rational well inside f64 — order-free sums.
    return (
        "WITH g AS (SELECT ox, oy FROM generate_series(0, 255) a(ox)"
        " CROSS JOIN generate_series(0, 255) b(oy)),"
        " c AS (SELECT ox, oy,"
        " CAST(floor((6 * ox - 1) / 8.0) AS BIGINT) AS x0,"
        " CAST(floor((6 * oy - 1) / 8.0) AS BIGINT) AS y0,"
        " (6 * ox - 1) / 8.0 - floor((6 * ox - 1) / 8.0) AS fx,"
        " (6 * oy - 1) / 8.0 - floor((6 * oy - 1) / 8.0) AS fy FROM g),"
        " s AS (SELECT ox, oy, fx, fy,"
        " LEAST(GREATEST(x0, 0), 191) AS xa,"
        " LEAST(GREATEST(x0 + 1, 0), 191) AS xb,"
        " LEAST(GREATEST(y0, 0), 191) AS ya,"
        " LEAST(GREATEST(y0 + 1, 0), 191) AS yb FROM c),"
        " v AS (SELECT oy // 64 AS tile_y, ox // 64 AS tile_x,"
        " (((xa * 37 + ya * 91) % 1000) - 200) * (1 - fy) * (1 - fx)"
        " + (((xa * 37 + yb * 91) % 1000) - 200) * fy * (1 - fx)"
        " + (((xb * 37 + ya * 91) % 1000) - 200) * (1 - fy) * fx"
        " + (((xb * 37 + yb * 91) % 1000) - 200) * fy * fx AS val"
        " FROM s)"
        " SELECT CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid, sum(val) AS sum_val,"
        " min(val) AS min_val, max(val) AS max_val"
        " FROM v GROUP BY tile_y, tile_x ORDER BY tile_y, tile_x"
    )


def _warp_merc_mapper(lon, lat):
    """dst EPSG:4326 → src EPSG:3857 for the warp contract row.
    Same spherical-mercator math as crs.lonlat_to_webmercator but with
    tan(a) spelled sin(a)/cos(a): DuckDB's SIN/COS/RADIANS are measured
    BIT-IDENTICAL to numpy on identical doubles (and division is
    correctly rounded on both), whereas TAN parity is unestablished.
    LN still differs by 1 ulp on ~25% of inputs — absorbed by the
    fixture's ≥3.5e-3 floor-boundary margins (test_warp_oracle_margins;
    1 ulp at y≈2e7 is ~4e-9 → index noise ~2.4e-14)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    a = np.pi / 4 + np.radians(lat) / 2
    return (6378137.0 * np.radians(lon),
            6378137.0 * np.log(np.sin(a) / np.cos(a)))


def q_warp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster CRS warp (reference gdal.Warp role, SpaReferencing.py:
    358,273): the alg raster on an EPSG:3857 meter grid (origin ±2e7,
    156250 m pixels) warped nearest-neighbor onto an EPSG:4326 grid
    (lon ±175, lat ±83, 256²) → per-dst-tile stats.  Output-driven
    inverse warp: dst tile keys via spark.range, need-map join keyed on
    src tile ids (the only payload shuffle), vectorized per-tile
    sampling (operators/warp.py).  All 65536 samples land interior to
    the source, so values are the integer alg formula — exact stats."""
    from .operators import warp as warp_ops

    tiles = synth.alg_raster_tiles(spark)
    out = warp_ops.warp_raster(
        tiles, _warp_merc_mapper,
        src_origin=(-2.0e7, 2.0e7), src_pixel=(156250.0, 156250.0),
        src_size=(256, 256), tile=synth.TILE,
        dst_origin=(-175.0, 83.0),
        dst_pixel=(350.0 / 256, 166.0 / 256),
        dst_size=(256, 256), dst_tile=64,
        method="nearest", out_raster_id="warp",
    )
    st = raster.tile_stats(out)
    return st.select(
        "tile_y", "tile_x", "n_valid",
        F.col("sum").cast("long").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("tile_y", "tile_x")


def _warp_oracle_sql() -> str:
    # dst pixel (X,Y) ∈ 256²: center lon = −175 + (X+.5)·350/256 (exact
    # dyadic), forward-projected to mercator; src index = floor.  The
    # margins make the floor straddle-free under the 1-ulp LN skew.
    merc_y = (
        "6378137.0 * LN(SIN(PI()/4 + RADIANS(83 - (oy + 0.5)"
        " * 0.6484375)/2) / COS(PI()/4 + RADIANS(83 - (oy + 0.5)"
        " * 0.6484375)/2))"
    )
    return (
        "WITH g AS (SELECT ox, oy FROM generate_series(0, 255) a(ox)"
        " CROSS JOIN generate_series(0, 255) b(oy)),"
        " c AS (SELECT ox, oy,"
        " CAST(floor((6378137.0 * RADIANS(-175 + (ox + 0.5)"
        " * 1.3671875) + 20000000.0) / 156250.0) AS BIGINT) AS ix,"
        f" CAST(floor((20000000.0 - {merc_y}) / 156250.0) AS BIGINT)"
        " AS iy FROM g),"
        " v AS (SELECT oy // 64 AS tile_y, ox // 64 AS tile_x,"
        " ((ix * 37 + iy * 91) % 1000) - 200 AS val FROM c)"
        " SELECT CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid,"
        " CAST(sum(val) AS BIGINT) AS sum_val,"
        " CAST(min(val) AS DOUBLE) AS min_val,"
        " CAST(max(val) AS DOUBLE) AS max_val"
        " FROM v GROUP BY tile_y, tile_x ORDER BY tile_y, tile_x"
    )


def q_reclassify_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range reclassify of the algebraic raster into 3 classes →
    per-tile stats (reference ReclassifyRange, SpaRasters.py:1170-1217;
    its own test's shape at SpaPyTests/Tests/SpaRasterTest.py:347).
    Class values are small integers — exact in float32 and SQL."""
    tiles = synth.alg_raster_tiles(spark)
    out = raster.reclassify(tiles, [-200, 0, 300, 800], [1, 2, 3], "cls")
    st = raster.tile_stats(out)
    return st.select(
        "tile_y", "tile_x", "n_valid",
        F.col("sum").cast("long").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("tile_y", "tile_x")


def _reclassify_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT gx, gy FROM generate_series(0, 255) a(gx)"
        " CROSS JOIN generate_series(0, 255) b(gy)),"
        " v AS (SELECT gy // 64 AS tile_y, gx // 64 AS tile_x,"
        " CASE WHEN ((gx * 37 + gy * 91) % 1000) - 200 < 0 THEN 1"
        " WHEN ((gx * 37 + gy * 91) % 1000) - 200 < 300 THEN 2"
        " ELSE 3 END AS val FROM g)"
        " SELECT CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid,"
        " CAST(sum(val) AS BIGINT) AS sum_val,"
        " CAST(min(val) AS DOUBLE) AS min_val,"
        " CAST(max(val) AS DOUBLE) AS max_val"
        " FROM v GROUP BY tile_y, tile_x ORDER BY tile_y, tile_x"
    )


def q_resample_match_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ResampleToMatch of the fine algebraic raster (256² @0.01) with
    its coarse twin (64² @0.04, full overlap) → per-tile stats of BOTH
    matched outputs (reference SpaRasters.py:2088-2165).  The coarse
    side zooms ×4 bilinear (weights {1,3,5,7}/8 → /64-exact on integer
    pixels) — the whole composition (aligned crops + halo zoom +
    split + mask-union joins) is dyadic-exact, zero rounding."""
    a = synth.alg_raster_tiles(spark)
    b = synth.alg_coarse_tiles(spark)
    a2, b2, _gt = raster.resample_to_match(
        a, synth.GEOTRANSFORM, (256, 256),
        b, synth.GEOTRANSFORM_C, (64, 64), tile=synth.TILE,
    )
    st = raster.tile_stats(a2).unionByName(raster.tile_stats(b2))
    return st.select(
        F.col("raster_id").alias("side"), "tile_y", "tile_x", "n_valid",
        F.col("sum").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("side", "tile_y", "tile_x")


def _resample_match_oracle_sql() -> str:
    # fine side passes through ('alg'); coarse side ('up') is the ×4
    # edge-clamped bilinear zoom of algc: out (X,Y) ∈ 256², src
    # x0 = floor((X-2)/4), fx = (2*(X mod 4)+1±4)/8 — equivalently
    # sx = (X+0.5)/4-0.5, clamped to [0,63]
    return (
        "WITH g AS (SELECT gx, gy FROM generate_series(0, 255) a(gx)"
        " CROSS JOIN generate_series(0, 255) b(gy)),"
        " fine AS (SELECT 'alg' AS side, gy // 64 AS tile_y,"
        " gx // 64 AS tile_x,"
        " CAST(((gx * 37 + gy * 91) % 1000) - 200 AS DOUBLE) AS val"
        " FROM g),"
        " c AS (SELECT gx, gy,"
        " CAST(floor((gx - 2) / 4.0) AS BIGINT) AS x0,"
        " CAST(floor((gy - 2) / 4.0) AS BIGINT) AS y0,"
        " (2 * (gx % 4) + 1 + CASE WHEN gx % 4 < 2 THEN 4 ELSE -4 END)"
        " / 8.0 AS fx,"
        " (2 * (gy % 4) + 1 + CASE WHEN gy % 4 < 2 THEN 4 ELSE -4 END)"
        " / 8.0 AS fy FROM g),"
        " s AS (SELECT gx, gy, fx, fy,"
        " LEAST(GREATEST(x0, 0), 63) AS xa,"
        " LEAST(GREATEST(x0 + 1, 0), 63) AS xb,"
        " LEAST(GREATEST(y0, 0), 63) AS ya,"
        " LEAST(GREATEST(y0 + 1, 0), 63) AS yb FROM c),"
        " coarse AS (SELECT 'up' AS side, gy // 64 AS tile_y,"
        " gx // 64 AS tile_x,"
        " (((xa * 7 + ya * 3) % 400) - 100) * (1 - fy) * (1 - fx)"
        " + (((xa * 7 + yb * 3) % 400) - 100) * fy * (1 - fx)"
        " + (((xb * 7 + ya * 3) % 400) - 100) * (1 - fy) * fx"
        " + (((xb * 7 + yb * 3) % 400) - 100) * fy * fx AS val"
        " FROM s),"
        " u AS (SELECT * FROM fine UNION ALL SELECT * FROM coarse)"
        " SELECT side, CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid, sum(val) AS sum_val,"
        " min(val) AS min_val, max(val) AS max_val"
        " FROM u GROUP BY side, tile_y, tile_x"
        " ORDER BY side, tile_y, tile_x"
    )


# ---------------------------------------------------------------------------
# Polygonize (cross-tile dissolve) + contour
# ---------------------------------------------------------------------------


def q_polygonize_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tile polygonize of the 81-block pattern → per-value
    component count + pixel sum (reference gdal.Polygonize,
    SpaRasters.py:827-882).  Block edges at 16+32k never coincide with
    the 64-px tile grid, so every interior tile border splits blocks —
    the equivalence-join dissolve does real work for every component.
    """
    tiles = synth.block_raster_tiles(spark)
    out = raster.polygonize_dissolved(tiles, synth.GEOTRANSFORM, synth.TILE)
    return (
        out.groupBy("value")
        .agg(
            F.count(F.lit(1)).alias("n_polys"),
            F.sum("n_pixels").alias("n_pixels"),
        )
        .orderBy("value")
    )


def _polygonize_oracle_sql() -> str:
    return (
        "WITH seg AS (SELECT s,"
        " CASE WHEN s = 0 OR s = 8 THEN 16 ELSE 32 END AS w"
        " FROM generate_series(0, 8) t(s)),"
        " blk AS (SELECT CAST((a.s + 3 * b.s) % 5 AS DOUBLE) AS value,"
        " a.w * b.w AS px FROM seg a CROSS JOIN seg b)"
        " SELECT value, CAST(count(*) AS BIGINT) AS n_polys,"
        " CAST(sum(px) AS BIGINT) AS n_pixels"
        " FROM blk GROUP BY value ORDER BY value"
    )


_CONTOUR_LEVELS = [5000.125, 20000.125, 40000.125]


def q_contour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares contour of the quad DEM at three levels →
    per-(level, tile) segment counts (reference gdal.ContourGenerate,
    /root/reference/SpaTopo.py:185-233).  Levels are odd eighths so
    no pixel (exact quarters) ever sits ON a level — every sign and
    every saddle decision is exact in both engines."""
    tiles = synth.quad_raster_tiles(spark)
    out = terrain.contour(
        tiles, _CONTOUR_LEVELS, synth.GRID, synth.TILE, synth.GEOTRANSFORM
    )
    return out.select("level", "tile_y", "tile_x", "n_segments").orderBy(
        "level", "tile_y", "tile_x"
    )


def _contour_oracle_sql() -> str:
    # cell (gx, gy) spans pixels (gx..gx+1, gy..gy+1); code bits follow
    # the engine: tl | tr<<1 | br<<2 | bl<<3 on (z > L); saddles
    # (5, 10) emit 2 segments, other non-trivial codes 1.
    lvl = ", ".join(f"({repr(v)})" for v in _CONTOUR_LEVELS)
    return (
        "WITH lv AS (SELECT CAST(lvl AS DOUBLE) AS level FROM"
        f" (VALUES {lvl}) t(lvl)),"
        " px AS (SELECT gx, gy,"
        " ((2*gx - 255) * (2*gx - 255) + 2 * (2*gy - 255) * (2*gy - 255))"
        " / 4.0 AS z FROM generate_series(0, 255) a(gx)"
        " CROSS JOIN generate_series(0, 255) b(gy)),"
        " cell AS (SELECT c.gx, c.gy, lv.level,"
        " CASE WHEN tl.z > lv.level THEN 1 ELSE 0 END"
        " + CASE WHEN tr.z > lv.level THEN 2 ELSE 0 END"
        " + CASE WHEN br.z > lv.level THEN 4 ELSE 0 END"
        " + CASE WHEN bl.z > lv.level THEN 8 ELSE 0 END AS code"
        " FROM (SELECT gx, gy FROM generate_series(0, 254) a(gx)"
        " CROSS JOIN generate_series(0, 254) b(gy)) c"
        " CROSS JOIN lv"
        " JOIN px tl ON tl.gx = c.gx AND tl.gy = c.gy"
        " JOIN px tr ON tr.gx = c.gx + 1 AND tr.gy = c.gy"
        " JOIN px bl ON bl.gx = c.gx AND bl.gy = c.gy + 1"
        " JOIN px br ON br.gx = c.gx + 1 AND br.gy = c.gy + 1)"
        " SELECT level, CAST(gy // 64 AS INTEGER) AS tile_y,"
        " CAST(gx // 64 AS INTEGER) AS tile_x,"
        " CAST(sum(CASE WHEN code IN (5, 10) THEN 2"
        " WHEN code IN (0, 15) THEN 0 ELSE 1 END) AS INTEGER)"
        " AS n_segments"
        " FROM cell GROUP BY level, tile_y, tile_x"
        " HAVING sum(CASE WHEN code IN (5, 10) THEN 2"
        " WHEN code IN (0, 15) THEN 0 ELSE 1 END) > 0"
        " ORDER BY level, tile_y, tile_x"
    )


# ---------------------------------------------------------------------------
# File IO — roundtrip through the from-scratch writers/readers
# ---------------------------------------------------------------------------


def q_geotiff_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the algebraic raster as a real GeoTIFF with the
    from-scratch writer, re-ingest it with the DISTRIBUTED byte-range
    reader, reduce to per-tile stats.  The oracle recomputes the
    closed form — a single flipped byte anywhere in the codec chain
    breaks the hash (reference Load/Save, SpaRasters.py:687-782)."""
    from .sources import geotiff

    gy, gx = np.mgrid[0:256, 0:256]
    arr = synth.alg_value(gx.astype(np.int64), gy.astype(np.int64))
    path = os.path.join(
        tempfile.gettempdir(), f"spapy_rt_{os.getpid()}.tif"
    )
    geotiff.write_geotiff(path, arr, synth.GEOTRANSFORM, nodata=synth.NODATA)
    tiles = geotiff.geotiff_tiles(
        spark, path, tile=synth.TILE, raster_id="alg"
    )
    st = raster.tile_stats(tiles)
    return st.select(
        "tile_y", "tile_x", "n_valid",
        F.col("sum").cast("long").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("tile_y", "tile_x")


def _geotiff_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT gx, gy FROM generate_series(0, 255) a(gx)"
        " CROSS JOIN generate_series(0, 255) b(gy)),"
        " v AS (SELECT gy // 64 AS tile_y, gx // 64 AS tile_x,"
        " ((gx * 37 + gy * 91) % 1000) - 200 AS val FROM g)"
        " SELECT CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid,"
        " CAST(sum(val) AS BIGINT) AS sum_val,"
        " CAST(min(val) AS DOUBLE) AS min_val,"
        " CAST(max(val) AS DOUBLE) AS max_val"
        " FROM v GROUP BY tile_y, tile_x ORDER BY tile_y, tile_x"
    )


def q_dtype_zoo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full GDAL pixel-dtype zoo (reference dtype table,
    /root/reference/SpaRasters.py:665-685): u2/i4/u4/f8 rasters with a
    shared closed-form value formula, written as native-typed GeoTIFFs
    by the from-scratch writer, re-ingested with ``native_dtype=True``
    (tile codec ``ptype`` column), reduced to per-tile stats.  The
    i4/u4 fixtures are mostly >2^24 and the f8 one is 2^24+j+0.5 — any
    silent float32 collapse in writer, reader, codec, or stats breaks
    the exact sums.  All arithmetic is ≤2^53 so every sum is an exact
    double in both engines regardless of accumulation order."""
    from .sources import geotiff

    gy, gx = np.mgrid[0:128, 0:128]
    k = gx.astype(np.int64) * 2654435761 + gy.astype(np.int64) * 40503
    arrs = {
        "u2": (k % 60000).astype("<u2"),
        "i4": ((k % 2000000000) - 1000000000).astype("<i4"),
        "u4": (k % 4000000000).astype("<u4"),
        "f8": (16777216.0 + (k % 4096).astype("<f8") + 0.5),
    }
    nd = {"u2": 65535.0, "i4": 2147483647.0, "u4": 4294967295.0,
          "f8": -9999.0}
    parts = []
    for dt, arr in arrs.items():
        path = os.path.join(
            tempfile.gettempdir(), f"spapy_zoo_{dt}_{os.getpid()}.tif"
        )
        geotiff.write_geotiff(path, arr, synth.GEOTRANSFORM,
                              nodata=nd[dt], dtype="native")
        parts.append(geotiff.geotiff_tiles(
            spark, path, tile=synth.TILE, raster_id=dt, nodata=nd[dt],
            native_dtype=True,
        ))
    tiles = parts[0]
    for p in parts[1:]:
        tiles = tiles.unionByName(p)
    st = raster.tile_stats(tiles)
    return st.select(
        F.col("raster_id").alias("dtype"), "tile_y", "tile_x", "n_valid",
        F.col("sum").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("dtype", "tile_y", "tile_x")


def _dtype_zoo_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT gx, gy,"
        " gx * 2654435761 + gy * 40503 AS k"
        " FROM generate_series(0, 127) a(gx)"
        " CROSS JOIN generate_series(0, 127) b(gy)),"
        " v AS ("
        " SELECT 'u2' AS dtype, gx, gy,"
        " CAST(k % 60000 AS DOUBLE) AS val FROM g"
        " UNION ALL SELECT 'i4', gx, gy,"
        " CAST((k % 2000000000) - 1000000000 AS DOUBLE) FROM g"
        " UNION ALL SELECT 'u4', gx, gy,"
        " CAST(k % 4000000000 AS DOUBLE) FROM g"
        " UNION ALL SELECT 'f8', gx, gy,"
        " 16777216.0 + CAST(k % 4096 AS DOUBLE) + 0.5 FROM g)"
        " SELECT dtype, CAST(gy // 64 AS INTEGER) AS tile_y,"
        " CAST(gx // 64 AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid,"
        " CAST(sum(val) AS DOUBLE) AS sum_val,"
        " CAST(min(val) AS DOUBLE) AS min_val,"
        " CAST(max(val) AS DOUBLE) AS max_val"
        " FROM v GROUP BY dtype, tile_y, tile_x"
        " ORDER BY dtype, tile_y, tile_x"
    )


def q_multiband_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-band GeoTIFF ingest (reference band stacks,
    /root/reference/SpaRasters.py:62,687-752): a 3-band chunky
    (PlanarConfiguration=1) u2 file written with Deflate +
    Predictor=2 horizontal differencing — the exact layout `gdal
    Translate -co COMPRESS=DEFLATE -co PREDICTOR=2` emits — is
    re-ingested by the distributed reader (one decode per tile row
    covers all bands) and reduced to per-(band, tile) stats.  Any
    error in band interleave, predictor cumsum, or the u2 codec
    shifts a sum."""
    from .sources import geotiff

    gy, gx = np.mgrid[0:128, 0:128]
    base = gx.astype(np.int64) * 37 + gy.astype(np.int64) * 91
    arr = np.stack([
        ((base + b * 12345) % 60000).astype("<u2") for b in range(3)
    ])
    path = os.path.join(
        tempfile.gettempdir(), f"spapy_mb_{os.getpid()}.tif"
    )
    geotiff.write_geotiff(path, arr, synth.GEOTRANSFORM, nodata=65535.0,
                          compress="deflate", dtype="native", predictor=2)
    tiles = geotiff.geotiff_tiles(
        spark, path, tile=synth.TILE, raster_id="mb", nodata=65535.0,
        native_dtype=True,
    )
    st = raster.tile_stats(tiles)
    return st.select(
        "band", "tile_y", "tile_x", "n_valid",
        F.col("sum").cast("long").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("band", "tile_y", "tile_x")


def _multiband_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT gx, gy, gx * 37 + gy * 91 AS base"
        " FROM generate_series(0, 127) a(gx)"
        " CROSS JOIN generate_series(0, 127) b(gy)),"
        " v AS (SELECT band, gx, gy,"
        " (base + (band - 1) * 12345) % 60000 AS val"
        " FROM g CROSS JOIN generate_series(1, 3) c(band))"
        " SELECT CAST(band AS INTEGER) AS band,"
        " CAST(gy // 64 AS INTEGER) AS tile_y,"
        " CAST(gx // 64 AS INTEGER) AS tile_x,"
        " CAST(count(*) AS BIGINT) AS n_valid,"
        " CAST(sum(val) AS BIGINT) AS sum_val,"
        " CAST(min(val) AS DOUBLE) AS min_val,"
        " CAST(max(val) AS DOUBLE) AS max_val"
        " FROM v GROUP BY band, tile_y, tile_x"
        " ORDER BY band, tile_y, tile_x"
    )


def q_shapefile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write derived boxes to a real .shp/.shx/.dbf with the
    from-scratch writer, re-read with the from-scratch reader, compute
    shoelace areas (exact dyadic) — closed-form oracle; any ring
    orientation / record framing bug breaks count or hash (reference
    Load/Save, SpaVectors.py:195-260)."""
    from .geometry import wkb as _wkb
    from .sources import shapefile

    # driver-side fixture: same derivation as entry_queries2's
    # _small_boxes (orders keys % 30), built in pandas
    import duckdb as _duck

    con = _duck.connect()
    ks = con.execute(
        f"SELECT o_orderkey FROM '{sf_dir}/orders.parquet'"
        " WHERE o_orderkey % 30 = 0 ORDER BY o_orderkey"
    ).fetchnumpy()["o_orderkey"].astype(np.int64)
    con.close()
    cx = ((ks * 9973) % 4096) / 1024.0 - 2.0
    cy = ((ks * 7919) % 4096) / 1024.0 - 2.0
    w = (((ks * 31) % 256) + 64) / 1024.0
    h = (((ks * 57) % 256) + 64) / 1024.0
    pdf = pd.DataFrame({
        "point_id": ks,
        "geometry": [
            _wkb.dumps(_wkb.box(a - c, b - d, a + c, b + d))
            for a, b, c, d in zip(cx, cy, w, h)
        ],
    })
    path = os.path.join(
        tempfile.gettempdir(), f"spapy_rt_{os.getpid()}_boxes.shp"
    )
    shapefile.write_pdf(pdf, path)
    df = shapefile.read_spark(spark, path)
    out = vector.with_area(df)
    return out.select(
        F.col("point_id").cast("long").alias("point_id"), "area"
    ).orderBy("point_id")


def _shapefile_oracle_sql() -> str:
    return (
        "SELECT o_orderkey AS point_id,"
        " (2 * ((((o_orderkey * 31) % 256) + 64) / 1024.0))"
        " * (2 * ((((o_orderkey * 57) % 256) + 64) / 1024.0)) AS area"
        " FROM orders WHERE o_orderkey % 30 = 0 ORDER BY point_id"
    )


# ---------------------------------------------------------------------------
# Difference overlay — cell-pruned O(N·M) output
# ---------------------------------------------------------------------------


def q_overlay_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise A∖B over boxes × grid (reference nested-loop overlay,
    /root/reference/SpaVectors.py:964-983): output is inherently
    O(N·M), but only cell-overlapping candidates run the Python wedge
    kernel — the disjoint remainder passes the left geometry through
    pure Catalyst (binary MultiPolygon promotion).  Oracle: closed-form
    area 4wh − iw·ih per pair, empties (box ⊆ cell) dropped."""
    from .entry_queries2 import _EPS, _boxes_df, _dither_round, _grid_df
    from .operators import overlay, vector

    left = _boxes_df(spark, sf_dir)
    right = _grid_df(spark, _EPS)
    out = overlay.overlay_join(
        left, right, "difference", res=7, left_id="point_id",
        right_id="grid_id",
    )
    out = vector.with_area(out)
    return (
        out.where(F.col("area") > 0)
        .select(
            "point_id", "grid_id",
            _dither_round(F.col("area"), 6).alias("area"),
        )
        .orderBy("point_id", "grid_id")
    )


def _overlay_difference_oracle_sql() -> str:
    from .entry_queries2 import _BOX_SQL, _EPS, _grid_sql

    return (
        f"WITH b AS ({_BOX_SQL}), g AS ({_grid_sql(_EPS)}),"
        " p AS (SELECT point_id, grid_id, 4 * w * h AS area_box,"
        " GREATEST(LEAST(cx + w, gx2) - GREATEST(cx - w, gx1), 0) AS iw,"
        " GREATEST(LEAST(cy + h, gy2) - GREATEST(cy - h, gy1), 0) AS ih"
        " FROM b CROSS JOIN g)"
        " SELECT point_id, grid_id,"
        " ROUND(area_box - iw * ih + 0.000000001, 6) AS area"
        " FROM p WHERE area_box - iw * ih > 0"
        " ORDER BY point_id, grid_id"
    )


# ---------------------------------------------------------------------------
# §2.3 geometry transforms — clip / densify / simplify
# ---------------------------------------------------------------------------

_CLIP_EPS = 1.0 / 2048  # box edges are multiples of 2^-10: never coincide


def q_clip_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip the derived boxes to a global bbox (reference Clip,
    /root/reference/SpaVectors.py:1501-1527): Sutherland–Hodgman
    against the box, empties dropped.  All cuts are axis-parallel at
    dyadic coordinates → clipped areas are EXACT, zero rounding."""
    from .entry_queries2 import _boxes_df

    b = _boxes_df(spark, sf_dir)
    e = _CLIP_EPS
    out = vector.clip_bbox(b, -10.0 + e, -10.0 + e, 6.0 + e, 6.0 + e)
    out = vector.with_area(out)
    return out.select("point_id", "area").orderBy("point_id")


def _clip_bbox_oracle_sql() -> str:
    from .entry_queries2 import _BOX_SQL

    e = repr(float(_CLIP_EPS))
    return (
        f"WITH b AS ({_BOX_SQL}),"
        " p AS (SELECT point_id,"
        f" LEAST(cx + w, 6.0 + {e}) - GREATEST(cx - w, -10.0 + {e}) AS iw,"
        f" LEAST(cy + h, 6.0 + {e}) - GREATEST(cy - h, -10.0 + {e}) AS ih"
        " FROM b)"
        " SELECT point_id, iw * ih AS area FROM p"
        " WHERE iw > 0 AND ih > 0 ORDER BY point_id"
    )


def q_split_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SplitFeatures (reference SpaVectors.py:591-629): 2-part
    MultiPolygon features explode to single parts with attributes
    duplicated — per-part exact areas against a closed-form oracle."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    from .geometry import wkb as _wkb

    o = load(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    k = F.col("o_orderkey")
    src = o.select(
        k.alias("point_id"),
        (((k * 9973) % 32768) / 1024.0 - 16.0).alias("cx"),
        (((k * 7919) % 32768) / 1024.0 - 16.0).alias("cy"),
        ((((k * 31) % 512) + 64) / 1024.0).alias("w"),
        ((((k * 57) % 512) + 64) / 1024.0).alias("h"),
    )
    schema = StructType(
        [src.schema["point_id"], StructField("geometry", BinaryType(), False)]
    )

    def mk(batches):
        for pdf in batches:
            geoms = []
            for cx, cy, w, h in zip(pdf["cx"], pdf["cy"], pdf["w"],
                                    pdf["h"]):
                # two disjoint boxes: the derived box + a shifted twin
                # with swapped extents
                b1 = _wkb.box(cx - w, cy - h, cx + w, cy + h)
                b2 = _wkb.box(cx + w + 1.0, cy - w, cx + w + 1.0 + 2 * h,
                              cy + w)
                geoms.append(_wkb.dumps({
                    "type": "MultiPolygon",
                    "coordinates": [b1["coordinates"], b2["coordinates"]],
                }))
            yield pd.DataFrame({"point_id": pdf["point_id"],
                                "geometry": geoms})

    mp = src.mapInPandas(mk, schema=schema)
    out = vector.split_features(mp)
    out = vector.with_area(out)
    return out.select("point_id", "area").orderBy("point_id", "area")


def _split_parts_oracle_sql() -> str:
    from .entry_queries2 import _BOX_SQL

    return (
        f"WITH b AS ({_BOX_SQL})"
        " SELECT point_id, (2 * w) * (2 * h) AS area FROM b"
        " UNION ALL"
        " SELECT point_id, (2 * h) * (2 * w) AS area FROM b"
        " ORDER BY point_id, area"
    )


def q_hull_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConvexHull (reference SpaVectors.py:848-869) on boxes carrying
    collinear edge midpoints: the monotone chain drops collinear
    points, leaving the 4 corners — count + exact area closed-form."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    from .geometry import wkb as _wkb

    o = load(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    k = F.col("o_orderkey")
    src = o.select(
        k.alias("point_id"),
        (((k * 9973) % 32768) / 1024.0 - 16.0).alias("cx"),
        (((k * 7919) % 32768) / 1024.0 - 16.0).alias("cy"),
        ((((k * 31) % 512) + 64) / 1024.0).alias("w"),
        ((((k * 57) % 512) + 64) / 1024.0).alias("h"),
    )
    schema = StructType(
        [src.schema["point_id"], StructField("geometry", BinaryType(), False)]
    )

    def mk(batches):
        for pdf in batches:
            geoms = []
            for cx, cy, w, h in zip(pdf["cx"], pdf["cy"], pdf["w"],
                                    pdf["h"]):
                x0, y0, x1, y1 = cx - w, cy - h, cx + w, cy + h
                ring = np.array([
                    [x0, y0], [cx, y0], [x1, y0], [x1, y1], [cx, y1],
                    [x0, y1], [x0, y0],
                ])
                geoms.append(_wkb.dumps(
                    {"type": "Polygon", "coordinates": [ring]}
                ))
            yield pd.DataFrame({"point_id": pdf["point_id"],
                                "geometry": geoms})

    hexed = src.mapInPandas(mk, schema=schema)
    out = vector.convex_hull(hexed)
    out = vector.with_area(out)
    return out.select(
        "point_id",
        ((F.length("geometry") - 13) / 16).cast("long").alias("n_points"),
        "area",
    ).orderBy("point_id")


def q_layer_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer bounds (reference SpaVectors.py:754-782): bbox struct per
    feature → one min/max aggregation row (partial+final combine)."""
    from .entry_queries2 import _boxes_df

    b = _boxes_df(spark, sf_dir)
    wb = vector.with_bounds(b)
    return wb.agg(
        F.min("bbox.minx").alias("minx"), F.min("bbox.miny").alias("miny"),
        F.max("bbox.maxx").alias("maxx"), F.max("bbox.maxy").alias("maxy"),
    )


def _layer_bounds_oracle_sql() -> str:
    from .entry_queries2 import _BOX_SQL

    return (
        f"WITH b AS ({_BOX_SQL})"
        " SELECT min(cx - w) AS minx, min(cy - h) AS miny,"
        " max(cx + w) AS maxx, max(cy + h) AS maxy FROM b"
    )


_DENS_D = 0.25


def q_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-subdivision densify of the derived boxes (reference
    SpaDensify.py:41-147): per edge ceil(len/d) splits.  Vertex count
    comes straight off the WKB byte length (pure Catalyst); the area is
    invariant (collinear inserts) — dither-rounded for the inserted
    points' t=j/k interpolation noise."""
    from .entry_queries2 import _boxes_df, _dither_round

    b = _boxes_df(spark, sf_dir)
    out = vector.densify(b, _DENS_D)
    out = vector.with_area(out)
    return out.select(
        "point_id",
        ((F.length("geometry") - 13) / 16).cast("long").alias("n_points"),
        _dither_round(F.col("area"), 6).alias("area"),
    ).orderBy("point_id")


def _densify_oracle_sql() -> str:
    from .entry_queries2 import _BOX_SQL

    d = repr(float(_DENS_D))
    return (
        f"WITH b AS ({_BOX_SQL})"
        " SELECT point_id,"
        f" CAST(1 + 2 * CEIL(2 * w / {d}) + 2 * CEIL(2 * h / {d})"
        " AS BIGINT) AS n_points,"
        " ROUND((2 * w) * (2 * h) + 0.000000001, 6) AS area"
        " FROM b ORDER BY point_id"
    )


def q_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Douglas-Peucker simplify (reference SpaVectors.py:820-846) on
    boxes carrying redundant collinear edge midpoints: the midpoints
    (deviation 0 < tolerance) drop, the corners survive — vertex count
    and exact area are both closed-form."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    from .entry_queries import load
    from .geometry import wkb as _wkb

    o = load(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    k = F.col("o_orderkey")
    src = o.select(
        k.alias("point_id"),
        (((k * 9973) % 32768) / 1024.0 - 16.0).alias("cx"),
        (((k * 7919) % 32768) / 1024.0 - 16.0).alias("cy"),
        ((((k * 31) % 512) + 64) / 1024.0).alias("w"),
        ((((k * 57) % 512) + 64) / 1024.0).alias("h"),
    )
    schema = StructType(
        [src.schema["point_id"], StructField("geometry", BinaryType(), False)]
    )

    def mk(batches):
        for pdf in batches:
            geoms = []
            for cx, cy, w, h in zip(pdf["cx"], pdf["cy"], pdf["w"],
                                    pdf["h"]):
                x0, y0, x1, y1 = cx - w, cy - h, cx + w, cy + h
                ring = np.array([
                    [x0, y0], [cx, y0], [x1, y0], [x1, y1], [cx, y1],
                    [x0, y1], [x0, y0],
                ])
                geoms.append(_wkb.dumps(
                    {"type": "Polygon", "coordinates": [ring]}
                ))
            yield pd.DataFrame({"point_id": pdf["point_id"],
                                "geometry": geoms})

    hexed = src.mapInPandas(mk, schema=schema)
    out = vector.simplify(hexed, tolerance=1e-6)
    out = vector.with_area(out)
    return out.select(
        "point_id",
        ((F.length("geometry") - 13) / 16).cast("long").alias("n_points"),
        "area",
    ).orderBy("point_id")


def _simplify_oracle_sql() -> str:
    from .entry_queries2 import _BOX_SQL

    return (
        f"WITH b AS ({_BOX_SQL})"
        " SELECT point_id, CAST(5 AS BIGINT) AS n_points,"
        " (2 * w) * (2 * h) AS area"
        " FROM b ORDER BY point_id"
    )


# ---------------------------------------------------------------------------
# Structured Streaming — windowed aggregation vs the batch oracle
# ---------------------------------------------------------------------------


def q_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Structured Streaming plan (file stream → watermark →
    tumbling-window counts → availableNow drain to a parquet sink),
    checked against a plain batch SQL oracle: with a 0-second
    watermark, append mode emits exactly the windows whose end is ≤
    the final watermark (= max event ts) — SQL-expressible, so the
    streaming execution faces the same bit-level gate as every batch
    operator (emission semantics, window boundaries, exactly-once
    sink bookkeeping all under test)."""
    import shutil

    from .streaming import events as sev

    base = os.path.join(
        tempfile.gettempdir(), f"spapy_stream_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "in")
    os.makedirs(src)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src, "events.parquet"),
    )
    ev = sev.read_events_stream(spark, src)
    agg = sev.windowed_counts(ev, window="1 hour", watermark="0 seconds")
    sev.run_available_now(
        agg, os.path.join(base, "ck"), os.path.join(base, "out")
    )
    res = spark.read.parquet(os.path.join(base, "out"))
    return res.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        F.col("n").cast("long").alias("n"),
    ).orderBy("window_start", "event_type")


_STREAMING_HOURLY_SQL = (
    "WITH m AS (SELECT max(ts) AS mx FROM events)"
    " SELECT date_trunc('hour', ts) AS window_start, event_type,"
    " CAST(count(*) AS BIGINT) AS n"
    " FROM events, m"
    " GROUP BY date_trunc('hour', ts), event_type, mx"
    " HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= mx"
    " ORDER BY window_start, event_type"
)


def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL streaming operator under the oracle gate:
    per-user incremental session tracking via applyInPandasWithState
    (GroupState fold over micro-batches, chunk-order-insensitive),
    drained with availableNow into the memory sink.  Running totals
    are non-decreasing, so max() per user is exact across any batch
    split — the final counts must equal the batch sessionizer's, which
    the SQL oracle recomputes with window functions."""
    import shutil

    from .streaming import events as sev, stateful

    base = os.path.join(
        tempfile.gettempdir(), f"spapy_sess_{os.getpid()}"
    )
    shutil.rmtree(base, ignore_errors=True)
    src = os.path.join(base, "in")
    os.makedirs(src)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(src, "events.parquet"),
    )
    stream = sev.read_events_stream(spark, src)
    out = stateful.track_sessions(stream, gap_seconds=1800)
    name = f"spapy_sess_q_{os.getpid()}"
    (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(base, "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    res = spark.table(name)
    return (
        res.groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
        .orderBy("user_id")
    )


_STREAMING_SESSIONS_SQL = (
    "WITH e AS (SELECT user_id, ts, event_id,"
    " lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev"
    " FROM events),"
    " s AS (SELECT user_id,"
    " CASE WHEN prev IS NULL OR"
    " date_diff('microsecond', prev, ts) > 1800000000"
    " THEN 1 ELSE 0 END AS new_s FROM e)"
    " SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,"
    " CAST(count(*) AS BIGINT) AS n_events"
    " FROM s GROUP BY user_id ORDER BY user_id"
)


# ---------------------------------------------------------------------------
# CRS — Albers proj4-string front-end (reference's own test projection)
# ---------------------------------------------------------------------------

# US Albers, the reference's Albers-test parameter shape
# (/root/reference/SpaPyTests/Tests/SpaReferencingTest.py:56-89)
_ALBERS_P4 = "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23.0 +lon_0=-96.0"


def q_crs_albers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ellipsoidal Albers equal-area forward through the proj4-STRING
    front-end (exercises parse_proj4 → from_proj_dict → the authalic
    kernel; reference accepts proj4/dict/EPSG interchangeably,
    /root/reference/SpaReferencing.py:128-135)."""
    from .entry_queries import derived_points
    from .geometry import crs

    pts = derived_points(spark, sf_dir)

    def tx(batches):
        for pdf in batches:
            x, y = crs.transform_arrays(
                pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                "epsg:4326", _ALBERS_P4,
            )
            yield pd.DataFrame({"point_id": pdf["point_id"], "x": x, "y": y})

    out = pts.mapInPandas(tx, schema="point_id bigint, x double, y double")
    # mm rounding with dyadic-tie dither; ln() differs from numpy's
    # SIMD log by 1 ulp on ~25% of inputs (~7e-9 absolute at 1e7 m) —
    # verified to straddle NO 3-dp boundary at sf0.001/0.01/0.1
    return out.select(
        "point_id",
        F.round(F.col("x") + F.lit(1e-9), 3).alias("x"),
        F.round(F.col("y") + F.lit(1e-9), 3).alias("y"),
    ).orderBy("point_id")


def _dlit(v: float) -> str:
    """SQL text reconstructing an exact float64 (DuckDB's decimal
    literal parsing is not correctly rounded, so 17-digit repr would
    be off by 1 ulp): sign·mantissa·2^exp with integer mantissa."""
    import math

    if v == 0:
        return "0.0"
    m, e = math.frexp(float(v))
    return f"(CAST({int(m * (1 << 53))} AS BIGINT) * POW(2.0, {e - 53}))"


def _crs_albers_oracle_sql() -> str:
    from .entry_queries import PTS_SQL
    from .geometry import crs

    alb = crs.Albers(29.5, 45.5, lat_0=23.0, lon_0=-96.0)
    e2, e = _dlit(crs._E2), _dlit(float(crs._E))
    a, n = _dlit(crs._A), _dlit(float(alb.n))
    c, rho0, lon0 = (_dlit(float(alb.C)), _dlit(float(alb.rho0)),
                     _dlit(float(alb.lon0)))
    return (
        f"WITH pts AS ({PTS_SQL}),"
        " s AS (SELECT point_id, radians(lon) AS lam,"
        " sin(radians(lat)) AS sp FROM pts),"
        f" qa AS (SELECT point_id, lam, (1 - {e2}) * (sp /"
        f" (1 - {e2} * sp * sp) - (1 / (2 * {e})) *"
        f" ln((1 - {e} * sp) / (1 + {e} * sp))) AS q FROM s),"
        f" rho AS (SELECT point_id,"
        f" {a} * sqrt({c} - {n} * q) / {n} AS rho,"
        f" {n} * (lam - {lon0}) AS th FROM qa)"
        " SELECT point_id,"
        " ROUND(0.0 + rho * sin(th) + 0.000000001, 3) AS x,"
        f" ROUND(0.0 + {rho0} - rho * cos(th) + 0.000000001, 3) AS y"
        " FROM rho ORDER BY point_id"
    )


# WKT1 for EPSG:2263 (the registry's own definition text) — exercises
# the WKT front-end end-to-end: parser → method/parameter mapping →
# unit conversion (false origins arrive in survey feet) → LCC kernel.
_WKT_2263 = (
    'PROJCS["NAD83 / New York Long Island (ftUS)",'
    'GEOGCS["NAD83",DATUM["North_American_Datum_1983",'
    'SPHEROID["GRS 1980",6378137,298.257222101]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Lambert_Conformal_Conic_2SP"],'
    'PARAMETER["standard_parallel_1",41.03333333333333],'
    'PARAMETER["standard_parallel_2",40.66666666666666],'
    'PARAMETER["latitude_of_origin",40.16666666666666],'
    'PARAMETER["central_meridian",-74],'
    'PARAMETER["false_easting",984250.0000000002],'
    'PARAMETER["false_northing",0],'
    'UNIT["US survey foot",0.3048006096012192],'
    'AUTHORITY["EPSG","2263"]]'
)


def q_crs_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-WKT CRS input (r3 verdict missing #1): the EPSG
    registry's WKT1 text for 2263 drives the same LCC kernel as the
    EPSG shortcut — parser, method table, parameter mapping, and the
    feet→meters false-origin conversion all sit on the hash path.  The
    reference accepts WKT via pyproj
    (/root/reference/SpaReferencing.py:128-135)."""
    from .entry_queries import derived_points
    from .geometry import crs

    pts = derived_points(spark, sf_dir).select(
        "point_id",
        (F.col("lon") / 90.0 + F.lit(-74.0)).alias("lon"),
        (F.col("lat") / 50.0 + F.lit(40.5)).alias("lat"),
    )

    def tx(batches):
        for pdf in batches:
            x, y = crs.transform_arrays(
                pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                "epsg:4326", _WKT_2263,
            )
            yield pd.DataFrame({"point_id": pdf["point_id"], "x": x, "y": y})

    out = pts.mapInPandas(tx, schema="point_id bigint, x double, y double")
    return out.select(
        "point_id",
        F.round(F.col("x") + F.lit(1e-9), 3).alias("x"),
        F.round(F.col("y") + F.lit(1e-9), 3).alias("y"),
    ).orderBy("point_id")


def _crs_wkt_oracle_sql() -> str:
    """Same LCC-2SP closed form as the state-plane oracle, but with
    every injected constant taken from the WKT-PARSED projection object
    — bit-for-bit the constants the query's kernel evaluates, so the
    3-dp round cannot straddle on the ~1e-10 ft difference between the
    WKT false easting (984250.0000000002 ftUS × factor) and the EPSG
    table's x_0."""
    from .entry_queries import PTS_SQL
    from .geometry import crs as _crs

    p = _crs.from_proj_dict(_crs.wkt_to_proj_dict(_WKT_2263))
    base, u = p.base, p.to_meter
    e, ehalf = _dlit(float(_crs._E)), _dlit(float(_crs._E) / 2)
    pio4 = _dlit(np.pi / 4)
    af = _dlit(float(_crs._A * base.F))
    n, lon0 = _dlit(float(base.n)), _dlit(float(base.lon0))
    x0, y0r0 = _dlit(float(base.x0)), _dlit(float(base.y0 + base.rho0))
    udiv = _dlit(float(u))
    return (
        f"WITH pts AS ({PTS_SQL}),"
        " w AS (SELECT point_id, lon / 90.0 + (-74.0) AS lon,"
        " lat / 50.0 + 40.5 AS lat FROM pts),"
        " r AS (SELECT point_id, radians(lon) AS lam,"
        " radians(lat) AS phi FROM w),"
        f" t AS (SELECT point_id, lam, tan({pio4} - phi / 2) /"
        f" POW((1 - {e} * sin(phi)) / (1 + {e} * sin(phi)), {ehalf})"
        " AS tc FROM r),"
        f" rho AS (SELECT point_id, {af} * POW(tc, {n}) AS rho,"
        f" {n} * (lam - {lon0}) AS th FROM t)"
        " SELECT point_id,"
        f" ROUND(({x0} + rho * sin(th)) / {udiv} + 0.000000001, 3) AS x,"
        f" ROUND(({y0r0} - rho * cos(th)) / {udiv} + 0.000000001, 3) AS y"
        " FROM rho ORDER BY point_id"
    )


def q_crs_stateplane(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-plane CRS through the EPSG front-end with non-meter units
    (r3 verdict item 5): EPSG:2263 (NAD83 NY Long Island, LCC 2SP, US
    survey feet).  Exercises the EPSG→proj-dict table, the ellipsoidal
    LCC kernel, and the unit adapter; the reference reaches the same
    surface via pyproj (/root/reference/SpaReferencing.py:128-135).
    Points are windowed into the zone's neighborhood so magnitudes stay
    ~1e6 ft (1 ulp ≈ 2e-10 — far inside the 3-dp dither guard)."""
    from .entry_queries import derived_points
    from .geometry import crs

    pts = derived_points(spark, sf_dir).select(
        "point_id",
        (F.col("lon") / 90.0 + F.lit(-74.0)).alias("lon"),
        (F.col("lat") / 50.0 + F.lit(40.5)).alias("lat"),
    )

    def tx(batches):
        for pdf in batches:
            x, y = crs.transform_arrays(
                pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                "epsg:4326", "epsg:2263",
            )
            yield pd.DataFrame({"point_id": pdf["point_id"], "x": x, "y": y})

    out = pts.mapInPandas(tx, schema="point_id bigint, x double, y double")
    return out.select(
        "point_id",
        F.round(F.col("x") + F.lit(1e-9), 3).alias("x"),
        F.round(F.col("y") + F.lit(1e-9), 3).alias("y"),
    ).orderBy("point_id")


def _crs_stateplane_oracle_sql() -> str:
    """DuckDB mirror of the EPSG:2263 forward: LCC 2SP with the exact
    run-time constants (injected as mantissa·2^exp literals) in the
    kernel's own evaluation order, then the survey-foot division."""
    from .entry_queries import PTS_SQL
    from .geometry import crs as _crs

    p = _crs.from_proj_dict(_crs._EPSG_CONICS["epsg:2263"])
    base, u = p.base, p.to_meter
    e, ehalf = _dlit(float(_crs._E)), _dlit(float(_crs._E) / 2)
    pio4 = _dlit(np.pi / 4)
    af = _dlit(float(_crs._A * base.F))
    n, lon0 = _dlit(float(base.n)), _dlit(float(base.lon0))
    x0, y0r0 = _dlit(float(base.x0)), _dlit(float(base.y0 + base.rho0))
    udiv = _dlit(float(u))
    return (
        f"WITH pts AS ({PTS_SQL}),"
        " w AS (SELECT point_id, lon / 90.0 + (-74.0) AS lon,"
        " lat / 50.0 + 40.5 AS lat FROM pts),"
        " r AS (SELECT point_id, radians(lon) AS lam,"
        " radians(lat) AS phi FROM w),"
        f" t AS (SELECT point_id, lam, tan({pio4} - phi / 2) /"
        f" POW((1 - {e} * sin(phi)) / (1 + {e} * sin(phi)), {ehalf})"
        " AS tc FROM r),"
        f" rho AS (SELECT point_id, {af} * POW(tc, {n}) AS rho,"
        f" {n} * (lam - {lon0}) AS th FROM t)"
        " SELECT point_id,"
        f" ROUND(({x0} + rho * sin(th)) / {udiv} + 0.000000001, 3) AS x,"
        f" ROUND(({y0r0} - rho * cos(th)) / {udiv} + 0.000000001, 3) AS y"
        " FROM rho ORDER BY point_id"
    )


# ---------------------------------------------------------------------------
# Multimodal — audio/video codec roundtrips under the oracle gate
# ---------------------------------------------------------------------------


def q_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize integer-exact sawtooth clips IN EXECUTORS, encode
    each as real RIFF/WAVE bytes with the from-scratch writer
    (sources/wav.py), decode back, reduce to per-clip integer stats.
    The dtype cycles u8/i16/i32 and the channel count 1/2 — any byte
    slip in header layout, interleave, or sample width breaks the
    exact sums.  The oracle recomputes the sawtooth closed form
    (every value and sum is an exact int64 in both engines).  The
    reference has no audio path; this serves the multimodal-pipeline
    mandate alongside geotiff_roundtrip's pattern."""
    from .sources import wav as _wav

    out_schema = (
        "media_id int, bits int, channels int, rate int,"
        " n_frames long, sum_val long, min_val long, max_val long"
    )
    ids = spark.range(48).select(
        F.col("id").cast("int").alias("media_id")
    ).repartition(8)

    def run(batches):
        for pdf in batches:
            rows = []
            for i in pdf["media_id"]:
                i = int(i)
                n = 1000 + 10 * i
                t = np.arange(n, dtype=np.int64)
                m = t * (2 * i + 3) + 7 * i
                sel = i % 3
                if sel == 0:
                    v, bits = (m % 256).astype(np.uint8), 8
                elif sel == 1:
                    v, bits = ((m % 65536) - 32768).astype(np.int16), 16
                else:
                    v = (((m * 1234567) % 4294967296)
                         - 2147483648).astype(np.int32)
                    bits = 32
                ch = 1 + (i % 2)
                payload = _wav.encode_wav(
                    v.reshape(-1, ch), 8000 + 100 * (i % 5))
                dec, rate = _wav.decode_wav(payload)
                a = dec.astype(np.int64)
                rows.append((i, bits, dec.shape[1], rate, dec.shape[0],
                             int(a.sum()), int(a.min()), int(a.max())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "bits", "channels", "rate", "n_frames",
                "sum_val", "min_val", "max_val"])

    return ids.mapInPandas(run, out_schema).orderBy("media_id")


def _wav_oracle_sql() -> str:
    return (
        "WITH ids AS (SELECT CAST(i AS INTEGER) AS i"
        " FROM generate_series(0, 47) t(i)),"
        " s AS (SELECT i, t, t * (2*i + 3) + 7*i AS m FROM ids"
        " CROSS JOIN generate_series(0, 1469) g(t)"
        " WHERE t < 1000 + 10*i),"
        " v AS (SELECT i, CASE i % 3 WHEN 0 THEN m % 256"
        " WHEN 1 THEN (m % 65536) - 32768"
        " ELSE ((m * 1234567) % 4294967296) - 2147483648 END AS val"
        " FROM s)"
        " SELECT i AS media_id,"
        " CAST(CASE i % 3 WHEN 0 THEN 8 WHEN 1 THEN 16 ELSE 32 END"
        " AS INTEGER) AS bits,"
        " CAST(1 + (i % 2) AS INTEGER) AS channels,"
        " CAST(8000 + 100 * (i % 5) AS INTEGER) AS rate,"
        " CAST((1000 + 10*i) // (1 + (i % 2)) AS BIGINT) AS n_frames,"
        " CAST(sum(val) AS BIGINT) AS sum_val,"
        " CAST(min(val) AS BIGINT) AS min_val,"
        " CAST(max(val) AS BIGINT) AS max_val"
        " FROM v GROUP BY i ORDER BY media_id"
    )


def q_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Y4M clips → REAL frame_sample (every 5th frame,
    seek-past-skipped decode, re-encoded 1-frame payloads) → per-frame
    plane sums decoded FROM THE RE-ENCODED payloads.  The oracle
    recomputes the synthesis closed form per kept frame, so a bug in
    either direction of the Y4M codec or in the sampling arithmetic
    breaks the exact sums (operator: multimodal.frame_sample;
    reference has no video path — multimodal-pipeline mandate)."""
    from .operators import multimodal as mm
    from .sources import y4m as _y4m

    vids = mm.synth_media(spark, n=12, codec="y4m")
    frames = mm.frame_sample(vids, every_n=5, fake=False)
    out_schema = (
        "media_id long, frame_idx int, w int, h int,"
        " y_sum long, u_sum long, v_sum long"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, fi, p in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"]
            ):
                params, fr = _y4m.decode_y4m(bytes(p))
                y, u, v = fr[0]
                rows.append((
                    int(mid), int(fi), params["width"], params["height"],
                    int(y.astype(np.int64).sum()),
                    int(u.astype(np.int64).sum()),
                    int(v.astype(np.int64).sum()),
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_idx", "w", "h", "y_sum", "u_sum",
                "v_sum"])

    return frames.mapInPandas(run, out_schema).orderBy(
        "media_id", "frame_idx")


def _y4m_oracle_sql() -> str:
    return (
        "WITH ids AS (SELECT i, 32 + (i % 3) * 16 AS w,"
        " 24 + (i % 2) * 8 AS h, 12 + (i % 3) AS nf"
        " FROM generate_series(0, 11) t(i)),"
        " fr AS (SELECT i, w, h, f FROM ids"
        " CROSS JOIN generate_series(0, 14) g(f)"
        " WHERE f % 5 = 0 AND f < nf),"
        " ys AS (SELECT i, f, w, h,"
        " sum((xx * (i + 3) + yy + f * 7) % 256) AS y_sum"
        " FROM fr CROSS JOIN generate_series(0, 63) a(xx)"
        " CROSS JOIN generate_series(0, 31) b(yy)"
        " WHERE xx < w AND yy < h GROUP BY i, f, w, h)"
        " SELECT CAST(i AS BIGINT) AS media_id,"
        " CAST(f AS INTEGER) AS frame_idx,"
        " CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,"
        " CAST(y_sum AS BIGINT) AS y_sum,"
        " CAST((w // 2) * (h // 2) * ((f * 11 + i) % 256) AS BIGINT)"
        " AS u_sum,"
        " CAST((w // 2) * (h // 2) * ((f * 5 + 2 * i) % 256) AS BIGINT)"
        " AS v_sum"
        " FROM ys ORDER BY media_id, frame_idx"
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def build_queries() -> dict:
    return {
        "terrain_slope": q_terrain_slope,
        "terrain_aspect": q_terrain_aspect,
        "terrain_hillshade": q_terrain_hillshade,
        "terrain_focal_stats": q_terrain_focal_stats,
        "crop_stats": q_crop_stats,
        "resample_nn_stats": q_resample_nn_stats,
        "resample_bilinear_stats": q_resample_bilinear_stats,
        "resample_rational_stats": q_resample_rational_stats,
        "warp_stats": q_warp_stats,
        "polygonize_counts": q_polygonize_counts,
        "contour_counts": q_contour_counts,
        "geotiff_roundtrip": q_geotiff_roundtrip,
        "dtype_zoo_stats": q_dtype_zoo_stats,
        "multiband_stats": q_multiband_stats,
        "shapefile_roundtrip": q_shapefile_roundtrip,
        "crs_albers": q_crs_albers,
        "crs_stateplane": q_crs_stateplane,
        "crs_wkt": q_crs_wkt,
        "overlay_difference": q_overlay_difference,
        "reclassify_stats": q_reclassify_stats,
        "resample_match_stats": q_resample_match_stats,
        "streaming_hourly": q_streaming_hourly,
        "streaming_sessions": q_streaming_sessions,
        "clip_bbox": q_clip_bbox,
        "densify_counts": q_densify,
        "simplify_counts": q_simplify,
        "split_parts": q_split_parts,
        "hull_counts": q_hull_counts,
        "layer_bounds": q_layer_bounds,
        "wav_roundtrip": q_wav_roundtrip,
        "y4m_frames": q_y4m_frames,
    }


def build_oracle_sql() -> dict:
    return {
        "terrain_slope": _terrain_slope_oracle_sql(),
        "terrain_aspect": _terrain_aspect_oracle_sql(),
        "terrain_hillshade": _terrain_hillshade_oracle_sql(),
        "terrain_focal_stats": _terrain_focal_oracle_sql(),
        "crop_stats": _crop_oracle_sql(),
        "resample_nn_stats": _resample_nn_oracle_sql(),
        "resample_bilinear_stats": _resample_bilinear_oracle_sql(),
        "resample_rational_stats": _resample_rational_oracle_sql(),
        "warp_stats": _warp_oracle_sql(),
        "polygonize_counts": _polygonize_oracle_sql(),
        "contour_counts": _contour_oracle_sql(),
        "geotiff_roundtrip": _geotiff_oracle_sql(),
        "dtype_zoo_stats": _dtype_zoo_oracle_sql(),
        "multiband_stats": _multiband_oracle_sql(),
        "shapefile_roundtrip": _shapefile_oracle_sql(),
        "crs_albers": _crs_albers_oracle_sql(),
        "crs_stateplane": _crs_stateplane_oracle_sql(),
        "crs_wkt": _crs_wkt_oracle_sql(),
        "overlay_difference": _overlay_difference_oracle_sql(),
        "reclassify_stats": _reclassify_oracle_sql(),
        "resample_match_stats": _resample_match_oracle_sql(),
        "streaming_hourly": _STREAMING_HOURLY_SQL,
        "streaming_sessions": _STREAMING_SESSIONS_SQL,
        "clip_bbox": _clip_bbox_oracle_sql(),
        "densify_counts": _densify_oracle_sql(),
        "simplify_counts": _simplify_oracle_sql(),
        "split_parts": _split_parts_oracle_sql(),
        "hull_counts": _simplify_oracle_sql(),
        "layer_bounds": _layer_bounds_oracle_sql(),
        "wav_roundtrip": _wav_oracle_sql(),
        "y4m_frames": _y4m_oracle_sql(),
    }
