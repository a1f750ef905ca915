"""Ring-expansion kNN must agree exactly with the brute-force
broadcast path (same tie-break) on clustered + uniform points."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spapy_spark.operators import knn
from spapy_spark.operators.knn import SiteGrid
from spapy_spark.sources import synth


def test_sitegrid_batch_matches_bruteforce():
    rows = [(r[0], r[2], r[3]) for r in synth._site_rows(500)]
    grid = SiteGrid(rows, res=5)
    ids = np.arange(3000)
    _, lat, lon = synth.doc_coords(ids)
    px, py = lon[:400], lat[:400]
    pi, si, rk, d = grid.query_batch(px, py, k=3)
    sid = np.array([r[0] for r in rows])
    sx = np.array([r[1] for r in rows])
    sy = np.array([r[2] for r in rows])
    for p in range(400):
        d2 = (px[p] - sx) ** 2 + (py[p] - sy) ** 2
        order = np.lexsort((sid, d2))[:3]
        mine = si[pi == p]
        assert mine.tolist() == sid[order].tolist(), f"point {p}"
        md = d[pi == p]
        np.testing.assert_allclose(md, np.sqrt(d2[order]), rtol=1e-12)


def test_knn_cells_matches_broadcast(spark):
    sites = synth.sites(spark, 300)
    ids = np.arange(1000)
    _, lat, lon = synth.doc_coords(ids)
    pts = spark.createDataFrame(
        [(int(i), float(lat[i]), float(lon[i])) for i in ids[:500]],
        "point_id long, lat double, lon double",
    )
    a = knn.knn_join_broadcast(pts, sites, k=2, point_cols=["point_id"])
    b = knn.knn_join_cells(pts, sites, k=2, res=5, point_cols=["point_id"])
    ra = sorted((r["point_id"], r["rank"], r["site_id"]) for r in a.collect())
    rb = sorted((r["point_id"], r["rank"], r["site_id"]) for r in b.collect())
    assert ra == rb and len(ra) == 1000  # 500 points × k=2


def test_knn_haversine_metric(spark):
    """Geodesic ranking differs from planar near the poles: at 80°N a
    1° lon offset is ~6x shorter on the sphere than 1° lat."""
    from spapy_spark.geometry.kernels import haversine_m

    sites = spark.createDataFrame(
        [(1, 1.0, 80.0), (2, 0.0, 79.1)],  # (id, lon, lat)
        "site_id long, x double, y double",
    )
    pts = spark.createDataFrame([(0, 80.0, 0.0)],
                                "point_id long, lat double, lon double")
    planar = knn.knn_join_broadcast(pts, sites, k=1,
                                    point_cols=["point_id"]).collect()
    hav = knn.knn_join_broadcast(pts, sites, k=1, point_cols=["point_id"],
                                 metric="haversine").collect()
    # planar degrees: site2 at dist 0.9 beats site1 at dist 1.0
    assert planar[0]["site_id"] == 2
    # geodesic: 1° lon at 80°N ≈ 19 km, 0.9° lat ≈ 100 km → site1 wins
    assert hav[0]["site_id"] == 1
    d = float(haversine_m(np.array([80.0]), np.array([0.0]),
                          np.array([80.0]), np.array([1.0]))[0])
    assert hav[0]["dist"] == pytest.approx(d, rel=1e-12)


def test_knn_grid_no_broadcast(spark):
    """Pure-Catalyst distributed kNN: certain rows must agree exactly
    with the brute-force path; the plan must contain no Python node."""
    sites = synth.sites(spark, 400)
    ids = np.arange(2000)
    _, lat, lon = synth.doc_coords(ids)
    pts = spark.createDataFrame(
        [(int(i), float(lat[i]), float(lon[i])) for i in ids[:600]],
        "point_id long, lat double, lon double",
    )
    grid = knn.knn_join_grid(pts, sites, k=2, res=4, ring=1)
    plan = grid._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # fully JVM-side
    rows = grid.collect()
    brute = knn.knn_join_broadcast(pts, sites, k=2,
                                   point_cols=["point_id"]).collect()
    want = {(r["point_id"], r["rank"]): r["site_id"] for r in brute}
    n_certain = 0
    for r in rows:
        if r["certain"]:
            n_certain += 1
            assert want[(r["point_id"], r["rank"])] == r["site_id"]
    assert n_certain > len(rows) * 0.5  # most points resolve in ring 1
