"""Vectorized axis-aligned-rectangle fast path (operators/overlay.py):
the whole-batch decode/predicate/encode helpers must agree bit-for-bit
with the per-pair dict-geometry kernels they shortcut."""

import numpy as np
import pytest

from spapy_spark.geometry import kernels, wkb
from spapy_spark.operators import overlay


def _rand_rects(n, rng):
    x0 = rng.integers(-1000, 1000, n) / 64.0
    y0 = rng.integers(-1000, 1000, n) / 64.0
    w = rng.integers(1, 300, n) / 64.0
    h = rng.integers(1, 300, n) / 64.0
    return np.stack([x0, y0, x0 + w, y0 + h], axis=1)


def test_decode_roundtrip_and_rejects():
    rng = np.random.default_rng(7)
    rects = _rand_rects(50, rng)
    bufs = [wkb.dumps(wkb.box(*r)) for r in rects]
    # adversarial non-rects of the same byte length (93): rotated
    # 5-point ring, degenerate (zero-height), non-closed ring
    tri_like = wkb.dumps({
        "type": "Polygon",
        "coordinates": [np.array(
            [[0, 0], [2, 1], [1, 3], [-1, 2], [0, 0]], dtype=np.float64
        )],
    })
    degen = wkb.dumps(wkb.box(0, 0, 5, 0))
    mp = wkb.dumps({"type": "MultiPolygon",
                    "coordinates": [[np.array(
                        [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]],
                        dtype=np.float64)]]})
    bufs += [tri_like, degen, mp]
    ok, out = overlay.decode_aa_rects(np.array(bufs, dtype=object))
    assert ok[:50].all() and not ok[50:].any()
    np.testing.assert_array_equal(out[:50], rects)


def test_encode_mp_boxes_matches_wkb_dumps():
    rng = np.random.default_rng(3)
    rects = _rand_rects(20, rng)
    fast = overlay.encode_mp_boxes(rects)
    for r, buf in zip(rects, fast):
        slow = wkb.dumps({
            "type": "MultiPolygon",
            "coordinates": [[wkb.box(*r)["coordinates"][0]]],
        })
        assert buf == slow


@pytest.mark.parametrize("predicate", [
    "intersects", "touches", "overlaps", "contains", "within", "disjoint",
])
def test_rect_predicates_match_pairwise_kernels(predicate):
    rng = np.random.default_rng(11)
    # dyadic coords with shared grid values → touching/containment
    # configurations occur with real frequency
    lr = _rand_rects(120, rng)
    rr = _rand_rects(120, rng)
    # force some exact-touch and containment cases
    rr[0] = [lr[0, 2], lr[0, 1], lr[0, 2] + 1, lr[0, 3]]     # edge touch
    rr[1] = [lr[1, 2], lr[1, 3], lr[1, 2] + 1, lr[1, 3] + 1]  # corner touch
    rr[2] = lr[2] + [0.125, 0.125, -0.125, -0.125]            # strict inside
    rr[3] = lr[3]                                             # equal
    rr[4] = [lr[4, 0], lr[4, 1], lr[4, 2] - 0.125, lr[4, 3]]  # inside, shared edge
    got = overlay.rect_predicates(lr, rr)[predicate]
    for i in range(len(lr)):
        g1 = {"type": "Polygon", "coordinates": [wkb.box(*lr[i])["coordinates"][0]]}
        g2 = {"type": "Polygon", "coordinates": [wkb.box(*rr[i])["coordinates"][0]]}
        want = overlay.predicate_pair(g1, g2, predicate)
        assert bool(got[i]) == want, (predicate, i, lr[i], rr[i])


def test_overlay_fast_path_area_matches_slow(spark):
    # same pairs through a rect-only layer (fast path) and through a
    # 6-vertex redundant-vertex encoding of the SAME shapes (slow
    # path): identical (id, area) sets
    rng = np.random.default_rng(5)
    lrects = _rand_rects(40, rng)
    rrects = _rand_rects(12, rng) * 0.5
    lrows = [(int(i), wkb.dumps(wkb.box(*r))) for i, r in enumerate(lrects)]

    def hexagonish(r):
        x0, y0, x1, y1 = r
        xm = (x0 + x1) / 2
        ring = np.array(
            [[x0, y0], [xm, y0], [x1, y0], [x1, y1], [xm, y1], [x0, y1],
             [x0, y0]], dtype=np.float64)
        return wkb.dumps({"type": "Polygon", "coordinates": [ring]})

    rrows_fast = [(int(j), wkb.dumps(wkb.box(*r))) for j, r in enumerate(rrects)]
    rrows_slow = [(int(j), hexagonish(r)) for j, r in enumerate(rrects)]
    left = spark.createDataFrame(lrows, "lid bigint, geometry binary")

    def run(rrows):
        right = spark.createDataFrame(rrows, "rid bigint, geometry binary")
        out = overlay.overlay_join(
            left, right, "intersection", res=5, left_id="lid", right_id="rid"
        ).collect()
        return {
            (r["lid"], r["rid"]): kernels.geom_area(wkb.loads(bytes(r["geometry"])))
            for r in out
        }

    fast, slow = run(rrows_fast), run(rrows_slow)
    assert set(fast) == set(slow)
    for k in fast:
        assert fast[k] == pytest.approx(slow[k], abs=1e-12)


def test_persisted_coverings_released(spark):
    # ADVICE r2: coverings persisted by _candidates must not accumulate
    # across queries in a long-lived session
    from spapy_spark.operators import knn as knn_ops

    overlay.release_persisted()
    knn_ops.release_persisted()
    base = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    rng = np.random.default_rng(2)
    left = spark.createDataFrame(
        [(int(i), wkb.dumps(wkb.box(*r))) for i, r in
         enumerate(_rand_rects(50, rng))],
        "lid bigint, geometry binary")
    right = spark.createDataFrame(
        [(int(j), wkb.dumps(wkb.box(*r))) for j, r in
         enumerate(_rand_rects(8, rng))],
        "rid bigint, geometry binary")
    for _ in range(3):
        overlay.overlay_join(left, right, "intersection", res=5,
                             left_id="lid", right_id="rid").count()
    # each call releases the previous call's coverings: at most one
    # query's worth of cached datasets outstanding
    n_after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert n_after - base <= 2
    overlay.release_persisted()
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() <= base
