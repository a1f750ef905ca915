"""S2 cell index (operators/s2.py).

The automaton is verified three independent ways: a scalar recursive
quadrant-subdivision reference (different algorithm, same curve),
encode/decode roundtrip + Hilbert adjacency, and a public known-value
fixture (Paris's level-8 S2CellId).  Cross-engine bit-exactness is the
s2_tiles oracle row.
"""

import numpy as np
import pytest
from pyspark.sql import Row

from spapy_spark.operators import s2


def ref_hilbert_pos(face, i, j, level):
    """Recursive subdivision reference (scalar, no bit automaton):
    at each step pick the child quadrant containing (i, j) in the
    current orientation's visit order, recurse with the child frame."""
    # orientation = (swap, invert); visit order of (a, b) quadrant
    # coords in curve order for the canonical frame
    def visit_order(swap, invert):
        base = [(0, 0), (0, 1), (1, 1), (1, 0)]  # canonical: j then i
        out = []
        for a, b in base:
            if invert:
                a, b = 1 - a, 1 - b
            if swap:
                a, b = b, a
            out.append((a, b))
        return out

    # child frame deltas in curve order: swap, none, none, swap+invert
    deltas = [(True, False), (False, False), (False, False), (True, True)]
    swap, invert = bool(face & 1), False
    pos = 0
    for k in range(level - 1, -1, -1):
        ib, jb = (i >> k) & 1, (j >> k) & 1
        p = visit_order(swap, invert).index((ib, jb))
        pos = pos * 4 + p
        ds, di = deltas[p]
        swap, invert = swap ^ ds, invert ^ di
    return pos


def test_automaton_vs_recursive_reference():
    rng = np.random.default_rng(42)
    face = rng.integers(0, 6, 300)
    i = rng.integers(0, 64, 300)
    j = rng.integers(0, 64, 300)
    got = s2.hilbert_pos(face, i, j, 6)
    for n in range(300):
        assert int(got[n]) == ref_hilbert_pos(
            int(face[n]), int(i[n]), int(j[n]), 6
        )


def test_hilbert_roundtrip_and_adjacency():
    rng = np.random.default_rng(7)
    face = rng.integers(0, 6, 2000)
    i = rng.integers(0, 1 << 10, 2000)
    j = rng.integers(0, 1 << 10, 2000)
    pos = s2.hilbert_pos(face, i, j, 10)
    i2, j2 = s2.hilbert_ij(face, pos, 10)
    assert (i2 == i).all() and (j2 == j).all()
    # consecutive curve positions are 4-adjacent grid cells on every face
    for f in range(6):
        ps = np.arange(4**5, dtype=np.uint64)
        ii, jj = s2.hilbert_ij(np.full(len(ps), f), ps, 5)
        d = np.abs(np.diff(ii)) + np.abs(np.diff(jj))
        assert (d == 1).all(), f


def test_face_assignment():
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    f, u, v = s2.xyz_to_face_uv(*s2.latlng_to_xyz(lat, lon))
    assert f.tolist() == [0, 1, 2, 3, 4, 5]
    assert np.allclose(u, 0) and np.allclose(v, 0)


def test_face_centers_hit_middle_cell():
    cells = s2.cell_from_latlng(np.array([0.0]), np.array([0.0]), 4)
    i, j = s2.hilbert_ij(np.array([0]), cells & np.int64(4**4 - 1), 4)
    assert (int(i[0]), int(j[0])) == (8, 8)


def test_hierarchy_prefix():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-180, 180, 500)
    c10 = s2.cell_from_latlng(lat, lon, 10)
    c6 = s2.cell_from_latlng(lat, lon, 6)
    assert (s2.cell_parent(c10, 10, 6) == c6).all()


def test_canonical_id_paris():
    # Public fixture: Paris (48.8566, 2.3522) lies in S2 cell
    # 0x47e66... at fine levels; its level-8 ancestor's canonical id is
    # 0x47e6700000000000 (face 2, 16 position bits, trailing 1 at
    # bit 44).  Matching it pins face order, ST transform, and the
    # Hilbert tables to the real S2 layout.
    c = s2.cell_from_latlng(np.array([48.8566]), np.array([2.3522]), 8)
    assert int(s2.canonical_id(c, 8)[0]) == 0x47E6700000000000
    assert s2.token(c, 8) == ["2/03330303"]


def test_canonical_id_structure():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89, 89, 200)
    lon = rng.uniform(-180, 180, 200)
    for level in (1, 8, 15):
        c = s2.cell_from_latlng(lat, lon, level)
        cid = np.asarray(s2.canonical_id(c, level), dtype=np.uint64)
        lsb = np.uint64(1) << np.uint64(2 * (30 - level))
        assert ((cid & lsb) != 0).all()          # level marker present
        assert ((cid & (lsb - np.uint64(1))) == 0).all()  # below it: zeros
        assert ((cid >> np.uint64(61)) == (np.asarray(c, dtype=np.uint64)
                >> np.uint64(2 * level))).all()  # face preserved


def test_spark_encode_matches_numpy(spark):
    rng = np.random.default_rng(5)
    rows = [
        Row(pid=i, lat=float(la), lon=float(lo))
        for i, (la, lo) in enumerate(
            zip(rng.uniform(-89, 89, 200), rng.uniform(-180, 180, 200))
        )
    ]
    df = spark.createDataFrame(rows)
    got = {
        r["pid"]: r["s2_cell"]
        for r in s2.s2_encode(df, "lat", "lon", level=9).collect()
    }
    lat = np.array([r.lat for r in rows])
    lon = np.array([r.lon for r in rows])
    want = s2.cell_from_latlng(lat, lon, 9)
    for i in range(len(rows)):
        assert got[i] == int(want[i])


def test_spark_encode_xyz(spark):
    df = spark.createDataFrame(
        [Row(x=1.0, y=0.25, z=-0.125), Row(x=-0.5, y=2.0, z=0.0)]
    )
    out = s2.s2_encode_xyz(df, level=6).collect()
    want = s2.cell_from_xyz(
        np.array([1.0, -0.5]), np.array([0.25, 2.0]), np.array([-0.125, 0.0]), 6
    )
    assert [r["s2_cell"] for r in out] == want.tolist()


def test_level_bounds():
    with pytest.raises(ValueError):
        s2.cell_from_latlng(np.array([0.0]), np.array([0.0]), 0)
    with pytest.raises(ValueError):
        s2.cell_from_latlng(np.array([0.0]), np.array([0.0]), 31)
