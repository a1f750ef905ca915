"""Unit tests for the pure-numpy geometry layer (WKB codec + kernels).

The relate truth-table cases encode the reference's only asserted
expectations (/root/reference/SpaPyTests/Tests/SpaTopologyTest.py:56-108)
— see FIXTURES.md §5.
"""

import numpy as np
import pytest

from spapy_spark.geometry import kernels, wkb


# ---------------------------------------------------------------------------
# WKB codec
# ---------------------------------------------------------------------------


def test_wkb_point_roundtrip():
    g = wkb.point(-122.3331, 47.6097)
    g2 = wkb.loads(wkb.dumps(g))
    assert g2["type"] == "Point"
    np.testing.assert_allclose(g2["coordinates"], [-122.3331, 47.6097])


def test_wkb_polygon_with_hole_roundtrip():
    g = wkb.polygon(
        [[0, 0], [10, 0], [10, 10], [0, 10]],
        holes=[[[4, 4], [6, 4], [6, 6], [4, 6]]],
    )
    g2 = wkb.loads(wkb.dumps(g))
    assert g2["type"] == "Polygon"
    assert len(g2["coordinates"]) == 2
    np.testing.assert_allclose(g2["coordinates"][0], g["coordinates"][0])


def test_wkb_multipolygon_roundtrip():
    p1 = wkb.polygon([[0, 0], [1, 0], [1, 1], [0, 1]])
    mp = {"type": "MultiPolygon", "coordinates": [p1["coordinates"]]}
    g2 = wkb.loads(wkb.dumps(mp))
    assert g2["type"] == "MultiPolygon"
    assert len(g2["coordinates"]) == 1


def test_wkb_linestring_and_multipoint():
    ls = {"type": "LineString", "coordinates": np.array([[0.0, 0.0], [3.0, 4.0]])}
    assert wkb.loads(wkb.dumps(ls))["type"] == "LineString"
    mpt = {"type": "MultiPoint", "coordinates": np.array([[1.0, 2.0], [3.0, 4.0]])}
    out = wkb.loads(wkb.dumps(mpt))
    assert out["type"] == "MultiPoint"
    np.testing.assert_allclose(out["coordinates"], mpt["coordinates"])


def test_wkb_big_endian_decode():
    # hand-built big-endian point
    import struct

    buf = struct.pack(">bI2d", 0, 1, 1.5, -2.5)
    g = wkb.loads(buf)
    np.testing.assert_allclose(g["coordinates"], [1.5, -2.5])


def test_promote_multi_matches_reference_rule():
    p = wkb.polygon([[0, 0], [1, 0], [1, 1], [0, 1]])
    assert wkb.promote_multi(p)["type"] == "MultiPolygon"
    ls = {"type": "LineString", "coordinates": np.array([[0.0, 0.0], [1.0, 1.0]])}
    assert wkb.promote_multi(ls)["type"] == "MultiLineString"
    pt = wkb.point(0, 0)
    assert wkb.promote_multi(pt)["type"] == "Point"


# ---------------------------------------------------------------------------
# PIP
# ---------------------------------------------------------------------------


def square(minx, miny, maxx, maxy):
    return wkb.box(minx, miny, maxx, maxy)["coordinates"]


def test_pip_square():
    rings = square(-10, -10, 10, 10)
    px = np.array([0.0, 9.99, -9.99, 10.01, -20.0, 0.0])
    py = np.array([0.0, 9.99, -9.99, 0.0, 0.0, 10.01])
    got = kernels.points_in_rings(px, py, rings)
    np.testing.assert_array_equal(got, [True, True, True, False, False, False])


def test_pip_polygon_with_hole():
    rings = [
        np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float),
        np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float),
    ]
    px = np.array([5.0, 2.0, 4.5])
    py = np.array([5.0, 2.0, 4.5])
    got = kernels.points_in_rings(px, py, rings)
    np.testing.assert_array_equal(got, [False, True, False])


def test_pip_concave():
    # C-shaped concave polygon
    ring = np.array(
        [[0, 0], [10, 0], [10, 2], [2, 2], [2, 8], [10, 8], [10, 10], [0, 10], [0, 0]],
        float,
    )
    px = np.array([5.0, 1.0, 5.0])
    py = np.array([5.0, 5.0, 1.0])
    got = kernels.points_in_ring(px, py, ring)
    np.testing.assert_array_equal(got, [False, True, True])


def test_covers_vs_contains_boundary():
    rings = square(0, 0, 10, 10)
    px = np.array([0.0, 5.0])
    py = np.array([5.0, 5.0])
    cov = kernels.points_covered_by(px, py, rings, eps=1e-9)
    con = kernels.points_contained(px, py, rings, eps=1e-9)
    np.testing.assert_array_equal(cov, [True, True])
    np.testing.assert_array_equal(con, [False, True])


def test_pip_brute_force_oracle_random():
    """Cross-check the vectorized ray cast against a per-point reference
    implementation of the same even-odd rule (the reference's PIP
    delegate is GEOS; even-odd on a simple ring is equivalent)."""
    rng = np.random.default_rng(3)
    ring = kernels.convex_hull(rng.uniform(-5, 5, size=(30, 2)))
    pts = rng.uniform(-6, 6, size=(500, 2))

    def slow_pip(x, y):
        inside = False
        for i in range(len(ring) - 1):
            x1, y1 = ring[i]
            x2, y2 = ring[i + 1]
            if (y1 > y) != (y2 > y):
                if x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                    inside = not inside
        return inside

    got = kernels.points_in_ring(pts[:, 0], pts[:, 1], ring)
    want = np.array([slow_pip(x, y) for x, y in pts])
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Relate truth table (reference golden, SpaTopologyTest.py:89-108)
# ---------------------------------------------------------------------------


def test_relate_truth_table():
    inside = square(-10, -10, 10, 10)
    box2 = square(-20, -20, 0, 0)
    box3 = square(-200, -100, -100, -30)

    def intersects(a, b):
        # any vertex of one covered by the other, or any edge pair crossing
        ax, ay = a[0][:, 0], a[0][:, 1]
        bx, by = b[0][:, 0], b[0][:, 1]
        if kernels.points_covered_by(ax, ay, b).any():
            return True
        if kernels.points_covered_by(bx, by, a).any():
            return True
        lo = np.array([b[0][:, 0].min()])
        la = np.array([b[0][:, 1].min()])
        hi = np.array([b[0][:, 0].max()])
        ha = np.array([b[0][:, 1].max()])
        return bool(kernels.rects_intersect_ring(lo, la, hi, ha, a[0])[0])

    assert intersects(box2, inside) is True
    assert intersects(box3, inside) is False


# ---------------------------------------------------------------------------
# Measures
# ---------------------------------------------------------------------------


def test_area_with_hole():
    rings = [
        np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float),
        np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float),
    ]
    assert kernels.polygon_area(rings) == pytest.approx(96.0)


def test_centroid_square_and_lshape():
    sq = square(0, 0, 10, 10)
    cx, cy = kernels.ring_centroid(sq)
    assert (cx, cy) == pytest.approx((5.0, 5.0))
    # L-shape: union of [0,2]x[0,1] and [0,1]x[1,2]; area 3
    ring = np.array([[0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2], [0, 0]], float)
    cx, cy = kernels.ring_centroid([ring])
    assert cx == pytest.approx((1.0 * 2 + 0.5 * 1) / 3)  # 2*1 rect cx=1, 1*1 rect cx=0.5
    assert cy == pytest.approx((0.5 * 2 + 1.5 * 1) / 3)


def test_length_and_bounds():
    ls = {"type": "LineString", "coordinates": np.array([[0.0, 0.0], [3.0, 4.0]])}
    assert kernels.geom_length(ls) == pytest.approx(5.0)
    assert kernels.geom_bounds(ls) == (0.0, 0.0, 3.0, 4.0)


def test_convex_hull():
    pts = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5]], float)
    hull = kernels.convex_hull(pts)
    assert abs(kernels.ring_signed_area(hull)) == pytest.approx(4.0)
    assert len(hull) == 5  # 4 corners + closure


def test_simplify_collinear():
    c = np.array([[0, 0], [1, 0.001], [2, 0], [3, 0.001], [4, 0]], float)
    out = kernels.simplify_dp(c, 0.01)
    assert len(out) == 2
    out2 = kernels.simplify_dp(c, 0.0001)
    assert len(out2) == 5


def test_segmentize():
    c = np.array([[0, 0], [10, 0]], float)
    out = kernels.segmentize(c, 3.0)
    assert len(out) == 5  # 4 equal segments of 2.5
    np.testing.assert_allclose(out[:, 0], [0, 2.5, 5, 7.5, 10])
    # closed ring stays closed
    ring = np.array([[0, 0], [9, 0], [9, 9], [0, 9], [0, 0]], float)
    r2 = kernels.segmentize(ring, 4.0)
    np.testing.assert_allclose(r2[0], r2[-1])


def test_clip_convex_box():
    subj = square(0, 0, 10, 10)[0]
    clip = square(5, 5, 15, 15)[0]
    out = kernels.clip_ring_convex(subj, clip)
    assert out is not None
    assert abs(kernels.ring_signed_area(out)) == pytest.approx(25.0)
    # disjoint → None
    assert kernels.clip_ring_convex(subj, square(20, 20, 30, 30)[0]) is None
    # clip fully inside subject → clip itself
    out3 = kernels.clip_ring_convex(subj, square(2, 2, 4, 4)[0])
    assert abs(kernels.ring_signed_area(out3)) == pytest.approx(4.0)


def test_clip_concave_subject():
    # concave L-shape clipped by a box covering its notch
    subj = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]], float)
    clip = square(0, 0, 4, 4)[0]
    out = kernels.clip_ring_convex(subj, clip)
    assert abs(kernels.ring_signed_area(out)) == pytest.approx(7.0)


def test_distances():
    d = kernels.seg_min_distance(
        np.array([0.0, 5.0]), np.array([5.0, 5.0]),
        np.array([[0, 0], [10, 0]], float),
    )
    np.testing.assert_allclose(d, [5.0, 5.0])
    rings = square(0, 0, 10, 10)
    d2 = kernels.points_to_polygon_distance(
        np.array([5.0, 15.0]), np.array([5.0, 10.0]), rings
    )
    np.testing.assert_allclose(d2, [0.0, 5.0])


def test_haversine_known():
    # equator degree ≈ 111.19 km
    d = kernels.haversine_m(np.array([0.0]), np.array([0.0]), np.array([0.0]), np.array([1.0]))
    assert d[0] == pytest.approx(111195, rel=1e-3)


def test_point_buffer_ring_area_converges():
    ring = kernels.point_buffer_ring(0, 0, 1.0, quad_segs=16)
    area = abs(kernels.ring_signed_area(ring))
    assert area == pytest.approx(np.pi, rel=5e-3)
