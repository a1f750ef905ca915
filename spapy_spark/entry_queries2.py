"""Round-2 driver-contract queries: oracle twins for the operator
families that were pytest-only in round 1 (VERDICT r1 item 1) —
overlay joins (both physical strategies), relate predicates, raster
map algebra + tile stats + histogram, buffer, centroid/bounds,
distance-within join, fully-distributed kNN, CRS transforms.

Fixture discipline (same playbook as entry_queries.py): spatial
layers are *derived* from the driver's integer key columns with
dyadic arithmetic (multiples of 2^-10/2^-11) so every box coordinate,
interval intersection, and shoelace area is exact in both engines.
Where the engine's FP result carries honest kernel noise (clip vertex
interpolation, centroid division), the query rounds — with a +1e-9
dither first, because dyadic values CAN sit exactly on decimal
rounding ties (k/1024 == (m+.5)/1e6 has integer solutions) and the
two engines would then disagree on the tie side.

Reference parity notes inline; see SURVEY.md §2 rows per operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BinaryType, StructField, StructType

from .entry_queries import (
    PTS_SQL,
    _ann_oracle_sql,
    _knn_oracle_sql,
    _knn_sites_values,
    derived_points,
    load,
)
from .geometry import wkb
from .operators import ann, knn, overlay, raster, vector
from .sources import synth

# ---------------------------------------------------------------------------
# Derived-box fixtures (dyadic /1024 coords — exact in both engines)
# ---------------------------------------------------------------------------

# grid offset 2^-11: left-box edges (multiples of 2^-10) can never
# coincide with grid edges, so clips are pure-transversal (no GH
# degeneracy perturbation) and box∩box areas are exact to ~1 ulp.
_EPS = 1.0 / 2048  # 0.00048828125

_BOX_SQL = (
    "SELECT o_orderkey AS point_id,"
    " ((o_orderkey * 9973) % 32768) / 1024.0 - 16.0 AS cx,"
    " ((o_orderkey * 7919) % 32768) / 1024.0 - 16.0 AS cy,"
    " (((o_orderkey * 31) % 512) + 64) / 1024.0 AS w,"
    " (((o_orderkey * 57) % 512) + 64) / 1024.0 AS h"
    " FROM orders"
)


def _grid_sql(eps: float) -> str:
    e = repr(float(eps))
    return (
        "SELECT CAST(i AS BIGINT) AS grid_id,"
        f" -16.0 + 8 * (i % 4) + {e} AS gx1,"
        f" -16.0 + 8 * (i // 4) + {e} AS gy1,"
        f" -8.0 + 8 * (i % 4) + {e} AS gx2,"
        f" -8.0 + 8 * (i // 4) + {e} AS gy2"
        " FROM generate_series(0, 15) t(i)"
    )


def _boxes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(point_id, geometry) box layer derived from orders keys.

    Repartitioned to the session parallelism: the sf0.01 orders table
    is one parquet file → one input split, which would serialize every
    downstream Python geometry stage onto a single task."""
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
            cx = pdf["cx"].to_numpy(); cy = pdf["cy"].to_numpy()
            w = pdf["w"].to_numpy(); h = pdf["h"].to_numpy()
            geoms = wkb.dumps_boxes(
                np.stack([cx - w, cy - h, cx + w, cy + h], axis=1)
            )
            yield pd.DataFrame({"point_id": pdf["point_id"], "geometry": geoms})

    return src.mapInPandas(mk, schema=schema)


def _grid_df(spark: SparkSession, eps: float) -> DataFrame:
    rows = []
    for i in range(16):
        x1 = -16.0 + 8 * (i % 4) + eps
        y1 = -16.0 + 8 * (i // 4) + eps
        rows.append((i, wkb.dumps(wkb.box(x1, y1, x1 + 8.0, y1 + 8.0))))
    return spark.createDataFrame(rows, "grid_id bigint, geometry binary")


def _dither_round(col, digits: int):
    return F.round(col + F.lit(1e-9), digits)


# ---------------------------------------------------------------------------
# §2.4 overlay_join — both physical strategies vs one oracle
# ---------------------------------------------------------------------------


def q_overlay_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise intersection overlay (convex Sutherland–Hodgman path,
    cell-pruned candidates) — reference nested-loop overlay semantics
    (/root/reference/SpaVectors.py:939-983), distributed."""
    left = _boxes_df(spark, sf_dir)
    right = _grid_df(spark, _EPS)
    out = overlay.overlay_join(
        left, right, "intersection", res=7, left_id="point_id",
        right_id="grid_id",
    )
    out = vector.with_area(out)
    # filter on the UNROUNDED area (a 1/2048² corner sliver would
    # round to 0 here but be kept by the oracle's pre-round iw/ih>0
    # filter — ADVICE r2); the oracle filters pre-round too.
    return (
        out.where(F.col("area") > 0)
        .select(
            "point_id", "grid_id", _dither_round(F.col("area"), 6).alias("area")
        )
        .orderBy("point_id", "grid_id")
    )


def q_overlay_boxes_general(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same join through the general Greiner–Hormann kernel
    (force_general) — strategy equivalence gate: shares the convex
    path's oracle, so both physical plans must be row-identical."""
    left = _boxes_df(spark, sf_dir)
    right = _grid_df(spark, _EPS)
    out = overlay.overlay_join(
        left, right, "intersection", res=7, left_id="point_id",
        right_id="grid_id", force_general=True,
    )
    out = vector.with_area(out)
    # filter on the UNROUNDED area (a 1/2048² corner sliver would
    # round to 0 here but be kept by the oracle's pre-round iw/ih>0
    # filter — ADVICE r2); the oracle filters pre-round too.
    return (
        out.where(F.col("area") > 0)
        .select(
            "point_id", "grid_id", _dither_round(F.col("area"), 6).alias("area")
        )
        .orderBy("point_id", "grid_id")
    )


def _overlay_oracle_sql() -> str:
    return (
        f"WITH b AS ({_BOX_SQL}), g AS ({_grid_sql(_EPS)}),"
        " p AS (SELECT point_id, grid_id,"
        " LEAST(cx + w, gx2) - GREATEST(cx - w, gx1) AS iw,"
        " LEAST(cy + h, gy2) - GREATEST(cy - h, gy1) AS ih"
        " FROM b CROSS JOIN g)"
        " SELECT point_id, grid_id,"
        " ROUND(iw * ih + 0.000000001, 6) AS area"
        " FROM p WHERE iw > 0 AND ih > 0"
        " ORDER BY point_id, grid_id"
    )


# ---------------------------------------------------------------------------
# §2.4 relate predicates (truth-table semantics, SpaVectors.py:1109-1348)
# ---------------------------------------------------------------------------

_RELATE_PREDS = ("contains", "intersects", "overlaps", "touches", "within")


def q_relate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair counts for each boolean relate predicate over the derived
    boxes × the ALIGNED 8°-grid (edges can coincide → touches occurs).
    All box arithmetic is dyadic, so every predicate decision reduces
    to exact-sign cross products — bit-deterministic."""
    left = _boxes_df(spark, sf_dir)
    right = _grid_df(spark, 0.0)
    return overlay.relate_counts_multi(
        left, right, _RELATE_PREDS, res=7,
        left_id="point_id", right_id="grid_id",
    ).orderBy("predicate")


def _relate_oracle_sql() -> str:
    return (
        f"WITH b AS ({_BOX_SQL}), g AS ({_grid_sql(0.0)}),"
        " p AS (SELECT cx - w AS x1, cx + w AS x2, cy - h AS y1,"
        " cy + h AS y2, gx1, gy1, gx2, gy2 FROM b CROSS JOIN g),"
        " f AS (SELECT"
        " (x1 <= gx2 AND gx1 <= x2 AND y1 <= gy2 AND gy1 <= y2) AS incl,"
        " (x1 < gx2 AND gx1 < x2 AND y1 < gy2 AND gy1 < y2) AS strict,"
        " (gx1 <= x1 AND x2 <= gx2 AND gy1 <= y1 AND y2 <= gy2) AS w_in,"
        " (x1 <= gx1 AND gx2 <= x2 AND y1 <= gy1 AND gy2 <= y2) AS c_in"
        " FROM p)"
        " SELECT 'contains' AS predicate,"
        " CAST(count(*) FILTER (WHERE c_in) AS BIGINT) AS n_pairs FROM f"
        " UNION ALL SELECT 'intersects',"
        " CAST(count(*) FILTER (WHERE incl) AS BIGINT) FROM f"
        " UNION ALL SELECT 'overlaps',"
        " CAST(count(*) FILTER (WHERE strict AND NOT w_in AND NOT c_in)"
        " AS BIGINT) FROM f"
        " UNION ALL SELECT 'touches',"
        " CAST(count(*) FILTER (WHERE incl AND NOT strict) AS BIGINT) FROM f"
        " UNION ALL SELECT 'within',"
        " CAST(count(*) FILTER (WHERE w_in) AS BIGINT) FROM f"
    )


# ---------------------------------------------------------------------------
# §2.6/§2.5 raster map algebra + per-tile stats + histogram
# ---------------------------------------------------------------------------


def q_raster_algebra_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alg + alg2 with per-raster nodata masks (reference ORs each
    raster's own mask, SpaRasters.py:2146-2156), then mask-aware
    per-tile stats.  Pixel values are integer-exact closed forms the
    oracle recomputes in SQL."""
    a = synth.alg_raster_tiles(spark)
    b = synth.alg2_raster_tiles(spark)
    out = raster.map_algebra(a, "add", b, out_raster_id="sum_ab")
    st = raster.tile_stats(out)
    return st.select(
        "tile_y", "tile_x", "n_valid",
        F.col("sum").cast("long").alias("sum_val"),
        F.col("min").alias("min_val"), F.col("max").alias("max_val"),
    ).orderBy("tile_y", "tile_x")


def _raster_algebra_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT gx, gy FROM generate_series(0, 255) t1(gx)"
        " CROSS JOIN generate_series(0, 255) t2(gy)),"
        " v AS (SELECT gy // 64 AS tile_y, gx // 64 AS tile_x,"
        " CASE WHEN (gx * 11 + gy * 29) % 101 = 0 THEN NULL"
        " ELSE ((gx * 37 + gy * 91) % 1000 - 200)"
        " + ((gx * 13 + gy * 7) % 500 - 100) END AS val FROM g)"
        " SELECT CAST(tile_y AS INTEGER) AS tile_y,"
        " CAST(tile_x AS INTEGER) AS tile_x,"
        " CAST(count(val) AS BIGINT) AS n_valid,"
        " CAST(sum(val) AS BIGINT) AS sum_val,"
        " CAST(min(val) AS DOUBLE) AS min_val,"
        " CAST(max(val) AS DOUBLE) AS max_val"
        " FROM v GROUP BY tile_y, tile_x ORDER BY tile_y, tile_x"
    )


def q_raster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass distributed histogram (global min/max agg → per-tile
    bincount partials; reference SpaRasters.py:571-620)."""
    tiles = synth.alg_raster_tiles(spark)
    h = raster.histogram(tiles, bins=10)
    return h.select("raster_id", "band", "bucket", "n").orderBy("bucket")


def _raster_histogram_oracle_sql() -> str:
    return (
        "WITH g AS (SELECT gx, gy FROM generate_series(0, 255) t1(gx)"
        " CROSS JOIN generate_series(0, 255) t2(gy)),"
        " v AS (SELECT CAST((gx * 37 + gy * 91) % 1000 - 200 AS DOUBLE)"
        " AS val FROM g),"
        " s AS (SELECT MIN(val) AS mn, MAX(val) AS mx FROM v),"
        # floor() then cast — DuckDB CAST(double AS BIGINT) rounds-to-
        # nearest, while the engine truncates ((v-mn)/w ≥ 0 → floor)
        " bk AS (SELECT LEAST(GREATEST(CAST(floor((val - mn) /"
        " ((mx - mn) / 10.0)) AS BIGINT), 0), 9) AS bucket"
        " FROM v CROSS JOIN s)"
        " SELECT 'alg' AS raster_id, CAST(1 AS INTEGER) AS band, bucket,"
        " CAST(count(*) AS BIGINT) AS n FROM bk GROUP BY bucket"
        " ORDER BY bucket"
    )


# ---------------------------------------------------------------------------
# §2.3 buffer (Minkowski) + §2.2 feature info (area/bounds/centroid)
# ---------------------------------------------------------------------------


def _small_boxes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """500-ish boxes near the origin (keeps shoelace cancellation noise
    ~1e-13 so the closed-form area oracle survives rounding)."""
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 30 == 0)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    k = F.col("o_orderkey")
    src = o.select(
        k.alias("point_id"),
        (((k * 9973) % 4096) / 1024.0 - 2.0).alias("cx"),
        (((k * 7919) % 4096) / 1024.0 - 2.0).alias("cy"),
        ((((k * 31) % 256) + 64) / 1024.0).alias("w"),
        ((((k * 57) % 256) + 64) / 1024.0).alias("h"),
    )
    schema = StructType(
        [src.schema["point_id"], StructField("geometry", BinaryType(), False)]
    )

    def mk(batches):
        for pdf in batches:
            cx = pdf["cx"].to_numpy(); cy = pdf["cy"].to_numpy()
            w = pdf["w"].to_numpy(); h = pdf["h"].to_numpy()
            geoms = wkb.dumps_boxes(
                np.stack([cx - w, cy - h, cx + w, cy + h], axis=1)
            )
            yield pd.DataFrame({"point_id": pdf["point_id"], "geometry": geoms})

    return src.mapInPandas(mk, schema=schema)


def q_buffer_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minkowski buffer of boxes by r=1/4 (quad_segs=4 → 16-gon discs).
    Closed-form oracle: A + P·r + 8r²·sin(π/8) — the quarter corner
    wedges sum to one full polygonal disc because the 16-gon has
    vertices on the axis directions (reference buffer delegates to the
    same GEOS fan construction, /root/reference/SpaVectors.py:790-818).
    """
    boxes = _small_boxes_df(spark, sf_dir)
    out = vector.buffer(boxes, 0.25, quad_segs=4)
    out = vector.with_area(out)
    return out.select(
        "point_id", _dither_round(F.col("area"), 3).alias("area")
    ).orderBy("point_id")


def _buffer_oracle_sql() -> str:
    return (
        "WITH b AS (SELECT o_orderkey AS point_id,"
        " (((o_orderkey * 31) % 256) + 64) / 1024.0 AS w,"
        " (((o_orderkey * 57) % 256) + 64) / 1024.0 AS h"
        " FROM orders WHERE o_orderkey % 30 = 0)"
        " SELECT point_id,"
        " ROUND(4 * w * h + (w + h) + 0.5 * sin(pi() / 8) + 0.000000001, 3)"
        " AS area FROM b ORDER BY point_id"
    )


def q_centroid_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-info family oracle row: shoelace area (exact dyadic),
    bbox bounds (exact), centroid (dither-rounded) over the derived
    boxes (/root/reference/SpaVectors.py:690-754,871)."""
    boxes = _boxes_df(spark, sf_dir)
    info = vector.with_feature_info(boxes)
    return info.select(
        "point_id", "area", "minx", "miny", "maxx", "maxy",
        _dither_round(F.col("cx"), 6).alias("cx"),
        _dither_round(F.col("cy"), 6).alias("cy"),
    ).orderBy("point_id")


def _centroid_bounds_oracle_sql() -> str:
    return (
        f"WITH b AS ({_BOX_SQL})"
        " SELECT point_id, (2 * w) * (2 * h) AS area,"
        " cx - w AS minx, cy - h AS miny, cx + w AS maxx, cy + h AS maxy,"
        " ROUND(cx + 0.000000001, 6) AS cx,"
        " ROUND(cy + 0.000000001, 6) AS cy"
        " FROM b ORDER BY point_id"
    )


# ---------------------------------------------------------------------------
# §2.4 distance-within join + total-answer grid kNN
# ---------------------------------------------------------------------------

_WD = 3.0


def q_within_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via buffered cell covering (SURVEY §2.4 theta-join
    row) — pure Catalyst, both sides unbounded."""
    pts = derived_points(spark, sf_dir)
    sites = synth.sites(spark, 64)
    out = knn.within_distance(pts, sites, _WD, res=6)
    return out.orderBy("point_id", "site_id")


def _within_dist_oracle_sql() -> str:
    return (
        f"WITH pts AS ({PTS_SQL}),"
        f" sites AS (SELECT * FROM {_knn_sites_values()})"
        " SELECT p.point_id, s.site_id,"
        " sqrt((p.lon - s.x) * (p.lon - s.x) +"
        " (p.lat - s.y) * (p.lat - s.y)) AS dist"
        " FROM pts p CROSS JOIN sites s"
        " WHERE (p.lon - s.x) * (p.lon - s.x) +"
        f" (p.lat - s.y) * (p.lat - s.y) <= {_WD * _WD!r}"
        " ORDER BY p.point_id, s.site_id"
    )


def q_knn_sites_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same kNN answer as knn_sites through the fully-distributed
    grid path (no collect, no Python) — shares the broadcast path's
    oracle: strategy equivalence for kNN.

    Uses the single-pass exact plan (site-side per-cell domination
    pruning, knn.knn_join_grid_exact): one shuffle of the point
    stream, everything else JVM windows.  res=5 → ~8 candidate sites
    per point for this 64-site layout (measured r4); the r3 ring-
    escalation wrapper paid a localCheckpoint + count action per pass
    and a 25-cell point-side explosion — 24.9 s vs 2.2 s here."""
    pts = derived_points(spark, sf_dir)
    sites = synth.sites(spark, 64)
    out = knn.knn_join_grid_exact(pts, sites, k=3, res=5)
    return out.select("point_id", "site_id", "rank", "dist").orderBy(
        "point_id", "rank"
    )


# ---------------------------------------------------------------------------
# §2.3 CRS — WebMercator forward + roundtrip
# ---------------------------------------------------------------------------


def q_crs_webmercator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPSG:3857 forward (spherical, /root/reference/SpaReferencing.py
    :324 path) to mm-rounded meters + inverse roundtrip to 1e-6°."""
    from .geometry import crs

    pts = derived_points(spark, sf_dir)

    def tx(batches):
        for pdf in batches:
            x, y = crs.lonlat_to_webmercator(
                pdf["lon"].to_numpy(), pdf["lat"].to_numpy()
            )
            lon_rt, lat_rt = crs.webmercator_to_lonlat(x, y)
            yield pd.DataFrame({
                "point_id": pdf["point_id"], "x_merc": x, "y_merc": y,
                "lon_rt": lon_rt, "lat_rt": lat_rt,
            })

    out = pts.mapInPandas(
        tx,
        schema="point_id bigint, x_merc double, y_merc double,"
        " lon_rt double, lat_rt double",
    )
    return out.select(
        "point_id",
        F.round(F.col("x_merc"), 3).alias("x_merc"),
        F.round(F.col("y_merc"), 3).alias("y_merc"),
        F.round(F.col("lon_rt"), 6).alias("lon_rt"),
        F.round(F.col("lat_rt"), 6).alias("lat_rt"),
    ).orderBy("point_id")


def _crs_oracle_sql() -> str:
    return (
        f"WITH pts AS ({PTS_SQL})"
        " SELECT point_id,"
        " ROUND(6378137.0 * radians(lon), 3) AS x_merc,"
        " ROUND(6378137.0 * ln(tan(pi() / 4 + radians(lat) / 2)), 3)"
        " AS y_merc,"
        " ROUND(lon, 6) AS lon_rt, ROUND(lat, 6) AS lat_rt"
        " FROM pts ORDER BY point_id"
    )


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every 'view' event matched to the user's most recent
    prior (≤) 'click' — oracle is DuckDB's NATIVE ASOF JOIN, so the
    union+window carry-forward plan is checked against a first-party
    implementation of the semantics."""
    from .operators import asof

    ev = load(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.col("event_id").alias("click"), F.col("value").alias("cval"),
    )
    out = asof.asof_join(
        views, clicks, on="ts", by="user_id",
        right_cols=["click", "cval"], suffix="_m",
    )
    return out.select(
        "event_id", "user_id",
        F.col("click_m").alias("click_id"),
        F.col("cval_m").alias("click_value"),
        F.col("ts_m").alias("click_ts"),
    ).orderBy("event_id")


_ASOF_SQL = (
    "SELECT l.event_id, l.user_id, r.event_id AS click_id,"
    " r.value AS click_value, r.ts AS click_ts"
    " FROM (SELECT * FROM events WHERE event_type = 'view') l"
    " ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') r"
    " ON l.user_id = r.user_id AND l.ts >= r.ts"
    " ORDER BY l.event_id"
)


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: day × event_type with
    subtotal rows per day and a grand total, in ONE pass (Spark
    ``rollup`` ≡ SQL GROUP BY ROLLUP — Catalyst expands to a single
    shuffle with grouping-id, not one job per level)."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    out = (
        ev.rollup(day, F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    return out.orderBy("day", "event_type")


_ROLLUP_SQL = (
    "SELECT date_trunc('day', ts) AS day, event_type,"
    " CAST(count(*) AS BIGINT) AS n,"
    " CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value"
    " FROM events GROUP BY ROLLUP (date_trunc('day', ts), event_type)"
    " ORDER BY day, event_type"
)

# ASCII-only classes: identical semantics in Java regex (Spark) and
# RE2 (DuckDB); texts contain '°' which \\w would treat asymmetrically
_TOKEN_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def q_token_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenization (word runs + single punctuation marks)
    — the token-counting flavor LLM data pipelines actually use, as
    pure codegen SQL (regexp_extract_all, no Python)."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(text, '{_TOKEN_RE}', 0)")
        ).alias("tok"),
    )
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("n_distinct"),
            F.sum(F.length("tok")).alias("n_chars"),
        )
        .orderBy("doc_id")
    )


_TOKEN_REGEX_SQL = (
    "WITH toks AS (SELECT doc_id,"
    f" unnest(regexp_extract_all(text, '{_TOKEN_RE}')) AS tok"
    " FROM documents)"
    " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,"
    " CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct,"
    " CAST(sum(length(tok)) AS BIGINT) AS n_chars"
    " FROM toks GROUP BY doc_id ORDER BY doc_id"
)


def q_ann_cosine_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k through the PRODUCTION Arrow-matmul plan —
    same oracle as ann_cosine (rounded to 6 dp: float64 matmul vs
    decimal-exact sums differ ≤1 ulp), proving the fast path and the
    posexplode oracle twin are result-identical."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann.cosine_topk_arrow(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", "rank", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "rank")


def _ann_arrow_oracle_sql() -> str:
    return _ann_oracle_sql().replace(
        "AS rank, cosine", "AS rank, ROUND(cosine, 6) AS cosine"
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def build_queries() -> dict:
    return {
        "overlay_boxes": q_overlay_boxes,
        "overlay_boxes_general": q_overlay_boxes_general,
        "relate_counts": q_relate_counts,
        "raster_algebra_tiles": q_raster_algebra_tiles,
        "raster_histogram": q_raster_histogram,
        "buffer_area": q_buffer_area,
        "centroid_bounds": q_centroid_bounds,
        "within_dist": q_within_dist,
        "knn_sites_grid": q_knn_sites_grid,
        "crs_webmercator": q_crs_webmercator,
        "ann_cosine_arrow": q_ann_cosine_arrow,
        "events_asof": q_events_asof,
        "events_rollup": q_events_rollup,
        "token_regex": q_token_regex,
    }


def build_oracle_sql() -> dict:
    return {
        "overlay_boxes": _overlay_oracle_sql(),
        "overlay_boxes_general": _overlay_oracle_sql(),
        "relate_counts": _relate_oracle_sql(),
        "raster_algebra_tiles": _raster_algebra_oracle_sql(),
        "raster_histogram": _raster_histogram_oracle_sql(),
        "buffer_area": _buffer_oracle_sql(),
        "centroid_bounds": _centroid_bounds_oracle_sql(),
        "within_dist": _within_dist_oracle_sql(),
        "knn_sites_grid": _knn_oracle_sql(),
        "crs_webmercator": _crs_oracle_sql(),
        "ann_cosine_arrow": _ann_arrow_oracle_sql(),
        "events_asof": _ASOF_SQL,
        "events_rollup": _ROLLUP_SQL,
        "token_regex": _TOKEN_REGEX_SQL,
    }
