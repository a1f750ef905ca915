"""General (concave) polygon boolean ops — Greiner–Hormann.

Oracle: Monte-Carlo membership equivalence — for sample points p,
p ∈ result  ⟺  (p ∈ A) op (p ∈ B), excluding an epsilon band around
input boundaries.  This is implementation-independent and exact in
the limit; 8k points catch any region-level defect.
"""

import numpy as np
import pytest

from spapy_spark.geometry import clip2, kernels


def star(seed, cx, cy, rmin=0.4, rmax=2.0):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(5, 12))
    th = np.sort(rng.uniform(0, 2 * np.pi, k))
    rr = rng.uniform(rmin, rmax, k)
    r = np.column_stack([cx + rr * np.cos(th), cy + rr * np.sin(th)])
    return np.vstack([r, r[:1]])


def contained_hole(seed, ext, cx, cy):
    """A hole guaranteed inside ``ext``: scaled to half the center's
    clearance from the exterior boundary."""
    clear = float(kernels.seg_min_distance(
        np.array([cx]), np.array([cy]), ext)[0])
    return star(seed, cx, cy, rmin=clear * 0.1, rmax=clear * 0.45)


def member(g, pts):
    if g is None:
        return np.zeros(len(pts), bool)
    return kernels.points_in_polygon_geom(pts[:, 0], pts[:, 1], g)


def mc_equiv(g1, g2, op, res, n=8000, seed=0):
    rng = np.random.default_rng(seed)
    all_xy = np.vstack(
        [a for g in (g1, g2) for a in kernels._leaf_arrays(g)]
    )
    lo, hi = all_xy.min(0) - 0.3, all_xy.max(0) + 0.3
    pts = rng.uniform(lo, hi, (n, 2))
    ia, ib = member(g1, pts), member(g2, pts)
    want = {
        "intersection": ia & ib, "union": ia | ib,
        "difference": ia & ~ib, "symmetric_difference": ia ^ ib,
    }[op]
    got = member(res, pts)
    near = np.zeros(n, bool)
    for g in (g1, g2):
        for r in kernels._leaf_arrays(g):
            near |= kernels.points_on_ring_boundary(
                pts[:, 0], pts[:, 1], r, 1e-5
            )
    return int(((got != want) & ~near).sum())


@pytest.mark.parametrize("i", range(25))
def test_ring_level_random_concave(i):
    a = star(i, 0, 0)
    b = star(
        i + 1000,
        float(np.random.default_rng(i).uniform(-1.5, 1.5)),
        float(np.random.default_rng(i + 5).uniform(-1.5, 1.5)),
    )
    for op in ("intersection", "union", "difference"):
        rings = clip2.clip_rings(a, b, op)
        g = {"type": "MultiPolygon", "coordinates": [
            [r] for r in rings if not isinstance(r, tuple)
        ]}
        # hole marks subtract
        holes = [r[1] for r in rings if isinstance(r, tuple)]
        ga = {"type": "Polygon", "coordinates": [a]}
        gb = {"type": "Polygon", "coordinates": [b]}
        if holes:
            g["coordinates"][0].extend(holes)
        assert mc_equiv(ga, gb, op, g, seed=i) == 0, (i, op)


@pytest.mark.parametrize("i", range(15))
def test_multipolygon_with_holes(i):
    ext = star(i, 0, 0)
    parts1 = [[ext] + ([contained_hole(i + 77, ext, 0.0, 0.0)]
                       if i % 2 == 0 else [])]
    parts1.append([star(i + 500, 4.5, 0.5, 0.3, 1.2)])
    g1 = {"type": "MultiPolygon", "coordinates": parts1}
    g2 = {"type": "MultiPolygon", "coordinates": [
        [star(i + 1000, 1.0, 0.3)],
        [star(i + 1500, -2.5, -1.2, 0.3, 1.0)],
    ]}
    for op in ("intersection", "difference"):
        res = clip2.boolean_op(g1, g2, op)
        assert mc_equiv(g1, g2, op, res, seed=i) == 0, (i, op)
    if i % 2 == 1:  # hole-free left → union/symdiff supported
        for op in ("union", "symmetric_difference"):
            res = clip2.boolean_op(g1, g2, op)
            assert mc_equiv(g1, g2, op, res, seed=i) == 0, (i, op)


def test_degenerate_configs():
    A = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    B = np.array([[4, 0], [8, 0], [8, 4], [4, 4], [4, 0]], float)
    C = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], float)
    ga = {"type": "Polygon", "coordinates": [A]}
    for other, nm in ((B, "shared-edge"), (A, "identical"), (C, "contained")):
        go = {"type": "Polygon", "coordinates": [other]}
        for op in ("intersection", "union", "difference"):
            res = clip2.boolean_op(ga, go, op)
            assert mc_equiv(ga, go, op, res) == 0, (nm, op)


def test_union_with_hole_result():
    """U-shape closed by a bar: the union encloses a hole."""
    u = np.array([[0, 0], [5, 0], [5, 4], [4, 4], [4, 1], [1, 1], [1, 4],
                  [0, 4], [0, 0]], float)
    bar = np.array([[0, 3.5], [5, 3.5], [5, 4.5], [0, 4.5], [0, 3.5]], float)
    gu = {"type": "Polygon", "coordinates": [u]}
    gb = {"type": "Polygon", "coordinates": [bar]}
    res = clip2.boolean_op(gu, gb, "union")
    assert mc_equiv(gu, gb, "union", res) == 0
    # the enclosed courtyard must NOT be inside the union
    assert not member(res, np.array([[2.5, 2.0]]))[0]
    assert member(res, np.array([[0.5, 2.0]]))[0]


def test_overlay_geom_dispatch_concave(spark):
    """End-to-end: the distributed overlay handles concave geometries
    through the general path."""
    from spapy_spark.geometry import wkb
    from spapy_spark.operators import overlay

    L = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]],
                 float)  # concave L
    S = np.array([[0.5, 0.5], [3, 0.5], [3, 3], [0.5, 3], [0.5, 0.5]], float)
    gl = {"type": "Polygon", "coordinates": [L]}
    gs = {"type": "Polygon", "coordinates": [S]}
    # kernel level: concave SUBJECT and concave CLIP both work
    for op in ("intersection", "union", "difference"):
        res = overlay.overlay_geom(gl, gs, op)
        assert mc_equiv(gl, gs, op, res) == 0, op
        res2 = overlay.overlay_geom(gs, gl, op)
        assert mc_equiv(gs, gl, op, res2) == 0, op
    # distributed level
    left = spark.createDataFrame(
        [(0, wkb.dumps(gl))], "left_id long, geometry binary"
    )
    right = spark.createDataFrame(
        [(1, wkb.dumps(gs))], "right_id long, geometry binary"
    )
    out = overlay.overlay_join(left, right, "difference").collect()
    got = wkb.loads(bytes(out[0]["geometry"]))
    # L minus S: area = area(L) - area(L∩S)
    l_area = kernels.geom_area(gl)
    inter = overlay.overlay_geom(gl, gs, "intersection")
    assert kernels.geom_area(got) == pytest.approx(
        l_area - kernels.geom_area(inter), abs=1e-9
    )


@pytest.mark.parametrize("i", range(10))
def test_holed_clip_all_ops(i):
    """Holes on BOTH sides, all four ops (the A∖(E∖H) identity)."""
    e1 = star(i, 0, 0)
    h1 = contained_hole(i + 31, e1, 0.0, 0.0)
    e2 = star(i + 1000, 1.0, 0.4)
    h2 = contained_hole(i + 63, e2, 1.0, 0.4)
    g1 = {"type": "Polygon", "coordinates": [e1, h1]}
    g2 = {"type": "Polygon", "coordinates": [e2, h2]}
    for op in ("intersection", "difference", "union",
               "symmetric_difference"):
        res = clip2.boolean_op(g1, g2, op)
        assert mc_equiv(g1, g2, op, res, seed=i) == 0, (i, op)


def test_concave_buffer_distance_oracle():
    """buffer(P, r) membership ⟺ distance(p, P) ≤ r (excluding the
    disc-discretization band near the radius)."""
    from spapy_spark.operators.vector import buffer_geom

    L = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]],
                 float)
    g = {"type": "Polygon", "coordinates": [L]}
    r = 0.5
    res = buffer_geom(g, r, quad_segs=16)
    assert res is not None
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1.2, 5.2, (20000, 2))
    dist = kernels.points_to_polygon_distance(pts[:, 0], pts[:, 1], [L])
    want = dist <= r
    got = member(res, pts)
    band = np.abs(dist - r) < 0.003 * r  # 64-gon sagitta margin
    mism = (got != want) & ~band
    assert int(mism.sum()) == 0
    # concave notch respected: the inner corner region within r of two
    # edges is included exactly once (no hull over-coverage): a point
    # deep in the notch but > r from the polygon stays OUTSIDE
    assert not member(res, np.array([[2.5, 2.5]]))[0]
    assert member(res, np.array([[1.2, 1.2]]))[0]


def test_buffer_df_concave(spark):
    from spapy_spark.geometry import wkb
    from spapy_spark.operators import vector

    L = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]],
                 float)
    df = spark.createDataFrame(
        [(0, wkb.dumps({"type": "Polygon", "coordinates": [L]}))],
        "fid long, geometry binary",
    )
    out = vector.buffer(df, 0.5).collect()
    g = wkb.loads(bytes(out[0]["geometry"]))
    assert g["type"] == "MultiPolygon"
    # area ≈ A + perimeter*r + pi*r^2 (Minkowski with a disc)
    A, P, r = 7.0, 16.0, 0.5
    assert kernels.geom_area(g) == pytest.approx(
        A + P * r + np.pi * r * r, rel=0.01
    )
