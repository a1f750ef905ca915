"""Polygon boolean ops: exact area identities are the oracle —
area(A∖B) = area(A) − area(A∩B), area(A∪B) = a+b−i, symdiff = u−i.
Random convex polygon pairs + the reference's box cases."""

import numpy as np
import pytest

from spapy_spark.geometry import kernels, wkb
from spapy_spark.operators import overlay
from spapy_spark.sources.synth import u01


def _rand_convex(i: int, cx: float, cy: float, r: float) -> dict:
    k = 5 + int(u01(np.array([i]), 900)[0] * 6)
    th = np.sort(u01(np.arange(i * 31, i * 31 + k), 901)) * 2 * np.pi
    rr = r * (0.5 + u01(np.arange(i * 31, i * 31 + k), 902))
    ring = np.column_stack([cx + rr * np.cos(th), cy + rr * np.sin(th)])
    hull = kernels.convex_hull(ring)
    return wkb.polygon(hull)


AREAS = lambda g: 0.0 if g is None else kernels.geom_area(g)  # noqa: E731


@pytest.mark.parametrize("i", range(12))
def test_boolean_area_identities_random(i):
    a = _rand_convex(i, 0.0, 0.0, 2.0)
    b = _rand_convex(i + 100, u01(np.array([i]), 903)[0] * 3 - 1.5,
                     u01(np.array([i]), 904)[0] * 3 - 1.5, 1.5)
    ai, au = AREAS(a), AREAS(b)
    inter = AREAS(overlay.intersection_convex_clip(a, b))
    diff = AREAS(overlay.difference_convex_clip(a, b))
    diff_ba = AREAS(overlay.difference_convex_clip(b, a))
    union = AREAS(overlay.union_convex(a, b))
    sym = AREAS(overlay.symmetric_difference_convex(a, b))
    assert diff == pytest.approx(ai - inter, abs=1e-9)
    assert diff_ba == pytest.approx(au - inter, abs=1e-9)
    assert union == pytest.approx(ai + au - inter, abs=1e-9)
    assert sym == pytest.approx(union - inter, abs=1e-9)


def test_boxes_reference_case():
    inside = wkb.box(-10, -10, 10, 10)
    box2 = wkb.box(-20, -20, 0, 0)
    assert AREAS(overlay.difference_convex_clip(inside, box2)) == pytest.approx(300.0)
    assert AREAS(overlay.union_convex(inside, box2)) == pytest.approx(700.0)
    assert AREAS(
        overlay.symmetric_difference_convex(inside, box2)
    ) == pytest.approx(600.0)
    # disjoint: difference = identity, intersection = empty
    far = wkb.box(100, 100, 110, 110)
    d = overlay.difference_convex_clip(inside, far)
    assert AREAS(d) == pytest.approx(400.0)
    assert overlay.intersection_convex_clip(inside, far) is None


def test_difference_with_subject_hole():
    holed = wkb.polygon(
        [[-5, -5], [5, -5], [5, 5], [-5, 5]],
        holes=[[[-1, -1], [1, -1], [1, 1], [-1, 1]]],
    )
    clip = wkb.box(0, -10, 10, 10)
    d = overlay.difference_convex_clip(holed, clip)
    # left half of the square minus left half of the hole
    assert AREAS(d) == pytest.approx(50.0 - 2.0)


def test_multipart_clip_sequential():
    a = wkb.box(0, 0, 10, 10)
    mp = {"type": "MultiPolygon", "coordinates": [
        wkb.box(0, 0, 3, 10)["coordinates"],
        wkb.box(7, 0, 10, 10)["coordinates"],
    ]}
    d = overlay.difference_convex_clip(a, mp)
    assert AREAS(d) == pytest.approx(40.0)  # middle 4×10 band


def test_distributed_overlay_ops(spark):
    left = spark.createDataFrame(
        [(0, wkb.dumps(wkb.box(0, 0, 10, 10))),
         (1, wkb.dumps(wkb.box(20, 20, 30, 30)))],
        "left_id long, geometry binary",
    )
    right = spark.createDataFrame(
        [(100, wkb.dumps(wkb.box(5, 5, 15, 15)))],
        "right_id long, geometry binary",
    )
    inter = overlay.overlay_join(left, right, "intersection").collect()
    assert len(inter) == 1  # only the overlapping pair survives
    diff = overlay.overlay_join(left, right, "difference").collect()
    assert len(diff) == 2  # disjoint pair keeps its full geometry
    areas = {r["left_id"]: kernels.geom_area(wkb.loads(bytes(r["geometry"])))
             for r in diff}
    assert areas[0] == pytest.approx(75.0)
    assert areas[1] == pytest.approx(100.0)
    union = overlay.overlay_join(left, right, "union").collect()
    ua = {r["left_id"]: kernels.geom_area(wkb.loads(bytes(r["geometry"])))
          for r in union}
    assert ua[0] == pytest.approx(175.0)
    assert ua[1] == pytest.approx(200.0)


def test_self_overlay_fold(spark):
    df = spark.createDataFrame(
        [(0, wkb.dumps(wkb.box(0, 0, 10, 10))),
         (1, wkb.dumps(wkb.box(5, 0, 15, 10))),
         (2, wkb.dumps(wkb.box(8, 0, 20, 10)))],
        "fid long, geometry binary",
    )
    inter = overlay.self_overlay_fold(df, "intersection")
    assert kernels.geom_area(inter) == pytest.approx(20.0)  # 8..10 × 0..10
    union = overlay.self_overlay_fold(df, "union")
    assert kernels.geom_area(union) == pytest.approx(200.0)  # 0..20 × 0..10


def test_self_overlay_fold_distributed_parity(spark):
    """The distributed partial fold (associative ops) must match the
    sequential driver fold on a many-partition layer.  Dyadic box
    coordinates make every clip vertex exact, so the comparison is by
    exact area and part count, independent of fold grouping."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 4000
    # nested boxes: every box contains [0,1]x[0,1] => intersection is
    # the smallest box; built from dyadic halves so clips are exact
    rows = []
    for i in range(n):
        m = 1.0 + float(rng.integers(0, 2000)) / 1024.0
        rows.append((i, wkb.dumps(wkb.box(-m, -m, m, m))))
    df = spark.createDataFrame(rows, "fid long, geometry binary").repartition(16)
    inter = overlay.self_overlay_fold(df, "intersection")
    seq = _sequential_fold(rows, "intersection")
    assert kernels.geom_area(inter) == kernels.geom_area(seq)

    # disjoint unit boxes on a dyadic grid: union = all parts
    rows_u = [
        (i, wkb.dumps(wkb.box(2.0 * i, 0.0, 2.0 * i + 1.0, 1.0)))
        for i in range(64)
    ]
    dfu = spark.createDataFrame(rows_u, "fid long, geometry binary").repartition(8)
    uni = overlay.self_overlay_fold(dfu, "union")
    sequ = _sequential_fold(rows_u, "union")
    assert kernels.geom_area(uni) == kernels.geom_area(sequ) == 64.0
    canon = lambda g: sorted(  # noqa: E731
        tuple(np.asarray(rings[0]).min(axis=0)) for rings in wkb.polygons_of(g)
    )
    assert canon(uni) == canon(sequ)

    # empty intersection propagates as None through the combine
    rows_e = rows_u[:4]
    dfe = spark.createDataFrame(rows_e, "fid long, geometry binary").repartition(4)
    assert overlay.self_overlay_fold(dfe, "intersection") is None


def _sequential_fold(rows, op):
    acc = wkb.loads(bytes(rows[0][1]))
    for _, buf in rows[1:]:
        acc = overlay.overlay_geom(acc, wkb.loads(bytes(buf)), op)
        if acc is None:
            return None
    return acc


def test_self_overlay_fold_difference_distributed(spark):
    """difference fold = A0 - union(rest): distributed result must be
    point-set identical to the sequential left fold (MC membership)
    and exact-area equal on dyadic inputs."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(0, wkb.dumps(wkb.box(0.0, 0.0, 16.0, 16.0)))]
    for i in range(1, 40):
        x = float(rng.integers(0, 14 * 64)) / 64.0
        y = float(rng.integers(0, 14 * 64)) / 64.0
        w = float(rng.integers(32, 3 * 64)) / 64.0
        h = float(rng.integers(32, 3 * 64)) / 64.0
        rows.append((i, wkb.dumps(wkb.box(x, y, x + w, y + h))))
    # NOTE: createDataFrame splits the list in order (no shuffle), so
    # feature 0 stays the fold head; a repartition() would reorder and
    # legitimately change which feature leads the fold
    df = spark.createDataFrame(rows, "fid long, geometry binary")
    assert df.rdd.getNumPartitions() > 1
    dist = overlay.self_overlay_fold(df, "difference")
    seq = _sequential_fold(rows, "difference")
    assert dist is not None and seq is not None
    assert kernels.geom_area(dist) == pytest.approx(
        kernels.geom_area(seq), abs=1e-9
    )
    # MC membership: p ∈ result ⟺ p ∈ A0 and p ∉ any other box
    px = rng.uniform(-1, 17, 4000)
    py = rng.uniform(-1, 17, 4000)
    got = kernels.points_in_polygon_geom(px, py, dist)
    boxes = [wkb.loads(bytes(b)) for _, b in rows]
    in0 = kernels.points_in_polygon_geom(px, py, boxes[0])
    in_rest = np.zeros(len(px), dtype=bool)
    for g in boxes[1:]:
        in_rest |= kernels.points_in_polygon_geom(px, py, g)
    exp = in0 & ~in_rest
    # exclude points within eps of any box edge (boundary ambiguity)
    eps = 1e-9
    safe = np.ones(len(px), dtype=bool)
    for g in boxes:
        r = np.asarray(list(wkb.polygons_of(g))[0][0])
        x0, y0 = r.min(axis=0); x1, y1 = r.max(axis=0)
        for v in (x0, x1):
            safe &= np.abs(px - v) > eps
        for v in (y0, y1):
            safe &= np.abs(py - v) > eps
    assert (got[safe] == exp[safe]).all()


def test_self_overlay_fold_difference_empty_and_single(spark):
    rows = [(0, wkb.dumps(wkb.box(0, 0, 4, 4)))]
    df1 = spark.createDataFrame(rows, "fid long, geometry binary")
    only = overlay.self_overlay_fold(df1, "difference")
    assert kernels.geom_area(only) == pytest.approx(16.0)
    # fully swallowed => empty result (None)
    rows2 = rows + [(1, wkb.dumps(wkb.box(-1, -1, 5, 5)))]
    df2 = spark.createDataFrame(rows2, "fid long, geometry binary")
    assert overlay.self_overlay_fold(df2, "difference") is None
    dfe = spark.createDataFrame([], "fid long, geometry binary")
    assert overlay.self_overlay_fold(dfe, "difference") is None


def test_self_overlay_fold_symdiff_distributed(spark):
    """symdiff is associative (odd-coverage set): the distributed
    partial fold must match the sequential fold by exact area and MC
    odd-coverage membership on dyadic inputs."""
    import numpy as np

    rng = np.random.default_rng(23)
    rows = []
    for i in range(24):
        x = float(rng.integers(0, 10 * 64)) / 64.0
        y = float(rng.integers(0, 10 * 64)) / 64.0
        rows.append((i, wkb.dumps(wkb.box(x, y, x + 2.0, y + 2.0))))
    df = spark.createDataFrame(
        rows, "fid long, geometry binary"
    ).repartition(6)
    dist = overlay.self_overlay_fold(df, "symmetric_difference")
    seq = _sequential_fold(rows, "symmetric_difference")
    assert dist is not None and seq is not None
    assert kernels.geom_area(dist) == pytest.approx(
        kernels.geom_area(seq), abs=1e-6
    )
    px = rng.uniform(-1, 13, 4000)
    py = rng.uniform(-1, 13, 4000)
    boxes = [wkb.loads(bytes(b)) for _, b in rows]
    cover = np.zeros(len(px), dtype=np.int64)
    for g in boxes:
        cover += kernels.points_in_polygon_geom(px, py, g).astype(np.int64)
    eps = 1e-9
    safe = np.ones(len(px), dtype=bool)
    for g in boxes:
        r = np.asarray(list(wkb.polygons_of(g))[0][0])
        x0, y0 = r.min(axis=0); x1, y1 = r.max(axis=0)
        for v in (x0, x1):
            safe &= np.abs(px - v) > eps
        for v in (y0, y1):
            safe &= np.abs(py - v) > eps
    got = kernels.points_in_polygon_geom(px, py, dist)
    assert (got[safe] == ((cover[safe] % 2) == 1)).all()


def test_union_pair_space_guard(spark):
    rows = [(i, wkb.dumps(wkb.box(i, 0, i + 1, 1))) for i in range(40)]
    df = spark.createDataFrame(rows, "left_id long, geometry binary")
    dfr = df.withColumnRenamed("left_id", "right_id")
    with pytest.raises(ValueError, match="pair space"):
        overlay.overlay_join(df, dfr, "union", max_pairs=1000).collect()
    # explicit opt-out still runs (reference semantics)
    out = overlay.overlay_join(df.limit(3), dfr.limit(3), "union",
                               max_pairs=None)
    assert out.count() == 9
    # intersection/difference stay unguarded (cell-pruned paths)
    overlay.overlay_join(df, dfr, "intersection", max_pairs=1000).count()
