"""Unit tests for the Z-order cell index (spapy_spark.cells)."""

import numpy as np
import pytest

from spapy_spark import cells


def test_roundtrip_encode_decode():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89.9, 89.9, 5000)
    lon = rng.uniform(-180.0, 179.999, 5000)
    for res in (0, 1, 7, 12, 20, 26):
        c = cells.latlon_to_cell(lat, lon, res)
        assert c.dtype == np.int64
        assert (c >= 0).all()
        assert (cells.cell_res(c) == res).all()
        lo, la, hi, ha = cells.cell_bounds(c)
        assert (lon >= lo).all() and (lon < hi + 1e-9).all()
        assert (lat >= la).all() and (lat < ha + 1e-9).all()


def test_cell_contains_its_point():
    # exact quantization: recomputing the cell of a cell's center is stable
    lat = np.array([47.6097, -33.8688, 0.0001, 69.99])
    lon = np.array([-122.3331, 151.2093, 0.0001, -179.99])
    c = cells.latlon_to_cell(lat, lon, 12)
    lo, la, hi, ha = cells.cell_bounds(c)
    c2 = cells.latlon_to_cell((la + ha) / 2, (lo + hi) / 2, 12)
    assert (c == c2).all()


def test_parent_prefix_property():
    lat = np.array([10.5, -45.25, 80.0])
    lon = np.array([100.0, -60.0, 179.0])
    child = cells.latlon_to_cell(lat, lon, 14)
    parent = cells.cell_to_parent(child, 10)
    direct = cells.latlon_to_cell(lat, lon, 10)
    assert (parent == direct).all()


def test_lon_wrap():
    c1 = cells.latlon_to_cell(np.array([10.0]), np.array([190.0]), 8)
    c2 = cells.latlon_to_cell(np.array([10.0]), np.array([-170.0]), 8)
    assert c1[0] == c2[0]


def test_k_ring_counts_and_membership():
    c = int(cells.latlon_to_cell(np.array([40.0]), np.array([-100.0]), 10)[0])
    r1 = cells.k_ring(c, 1)
    assert len(r1) == 9
    assert c in set(r1.tolist())
    shell = cells.ring_shell(c, 1)
    assert len(shell) == 8
    assert c not in set(shell.tolist())
    # shell ∪ ring(0) == ring(1)
    assert set(shell.tolist()) | {c} == set(r1.tolist())


def test_k_ring_clamps_at_pole():
    top = int(cells.latlon_to_cell(np.array([89.9]), np.array([0.0]), 5)[0])
    r = cells.k_ring(top, 1)
    assert len(r) == 6  # top row: 3 lon × 2 lat (no row above)


def test_cover_bbox_exact_tiles():
    # a bbox spanning exactly 2×2 cells at res 3 (cell size 45°×22.5°)
    got = cells.cover_bbox(-45.0, 0.0, 44.0, 44.0, 3)
    assert len(got) == 4
    lo, la, hi, ha = cells.cell_bounds(got)
    assert lo.min() == -45.0 and ha.max() == 45.0


def test_cover_bbox_adaptive_coarsens():
    c, eff = cells.cover_bbox_adaptive(-180, -90, 179.9, 89.9, 20, max_cells=64)
    assert eff < 20
    assert len(c) <= 64


def test_polygon_cover_triangle_superset_and_pruned():
    # triangle in the NE quadrant; covering must contain the cells of
    # interior points and prune most of the bbox corners
    tri = np.array([[10.0, 10.0], [30.0, 10.0], [10.0, 30.0], [10.0, 10.0]])
    cover = cells.polygon_cover([tri], 8)
    cover_set = set(cover.tolist())
    rng = np.random.default_rng(7)
    # rejection-sample interior points
    pts = rng.uniform(10, 30, size=(2000, 2))
    inside = pts[:, 0] + pts[:, 1] < 40.0 - 1e-9
    lat, lon = pts[inside, 1], pts[inside, 0]
    pc = cells.latlon_to_cell(lat, lon, 8)
    assert set(pc.tolist()) <= cover_set, "covering missed interior cells"
    # corner far outside the triangle must be pruned
    far = int(cells.latlon_to_cell(np.array([29.0]), np.array([29.0]), 8)[0])
    assert far not in cover_set


def test_cell_ids_are_positive_and_distinct_across_res():
    c5 = cells.latlon_to_cell(np.array([1.0]), np.array([1.0]), 5)[0]
    c6 = cells.latlon_to_cell(np.array([1.0]), np.array([1.0]), 6)[0]
    assert c5 != c6


@pytest.mark.parametrize("res", [0, 26])
def test_extreme_resolutions(res):
    c = cells.latlon_to_cell(np.array([0.0]), np.array([0.0]), res)
    assert cells.cell_res(c)[0] == res
