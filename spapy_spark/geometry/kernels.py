"""Vectorized numpy geometry kernels (the GEOS role, from scratch).

Every function is array-in/array-out so it can run inside Arrow-batched
pandas UDFs — loops are only over polygon *edges* or *rings* (small),
never over the point/document axis (large).

Semantics notes vs the reference (which delegates to GEOS via shapely):

- point-in-polygon uses the even-odd (crossing-number) rule with the
  half-open edge convention; holes fall out of the XOR across rings.
  ``points_covered_by`` additionally counts boundary points as inside
  (GEOS ``covers``); ``points_in`` excludes an ``eps``-boundary (GEOS
  ``contains``).  The reference's PIP is shapely ``contains`` inside its
  nested-loop overlay (/root/reference/SpaVectors.py:939-983).
- areas are shoelace: |exterior| − Σ|holes| (shapely ``.area``,
  /root/reference/SpaVectors.py:690-700).
- simplify is Douglas-Peucker (shapely ``simplify``,
  /root/reference/SpaVectors.py:820-846).
- densify matches the reference's equal-subdivision rule: each segment
  longer than ``max_len`` is split into ``ceil(len/max_len)`` equal
  parts (/root/reference/SpaDensify.py:41-147).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Point-in-polygon (ray casting, even-odd)
# ---------------------------------------------------------------------------


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of N points against one closed ring.

    Loop is over the ring's edges (small); each iteration is vectorized
    over all points.  Boundary behavior follows the half-open convention
    (deterministic, but use the eps-boundary helpers for covers/contains).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    x1s, y1s = ring[:-1, 0], ring[:-1, 1]
    x2s, y2s = ring[1:, 0], ring[1:, 1]
    for x1, y1, x2, y2 in zip(x1s, y1s, x2s, y2s):
        if y1 == y2:
            continue
        crosses = (y1 > py) != (y2 > py)
        if not crosses.any():
            continue
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
        inside ^= crosses & (px < xint)
    return inside


def points_in_rings(px, py, rings) -> np.ndarray:
    """Even-odd across all rings of a polygon — holes handled by XOR."""
    out = np.zeros(np.asarray(px).shape, dtype=bool)
    for r in rings:
        out ^= points_in_ring(px, py, r)
    return out


def points_in_polygon_geom(px, py, geom: dict) -> np.ndarray:
    """PIP against a Polygon or MultiPolygon geometry dict."""
    from . import wkb

    out = np.zeros(np.asarray(px).shape, dtype=bool)
    for rings in wkb.polygons_of(geom):
        out |= points_in_rings(px, py, rings)
    return out


def points_on_ring_boundary(px, py, ring, eps: float) -> np.ndarray:
    """True where a point lies within ``eps`` of any ring edge."""
    d = seg_min_distance(px, py, ring)
    return d <= eps


def points_covered_by(px, py, rings, eps: float = 1e-12) -> np.ndarray:
    """GEOS ``covers``: interior ∪ (eps-)boundary."""
    inside = points_in_rings(px, py, rings)
    for r in rings:
        inside |= points_on_ring_boundary(px, py, r, eps)
    return inside


def points_contained(px, py, rings, eps: float = 1e-12) -> np.ndarray:
    """GEOS ``contains``: interior, excluding the (eps-)boundary."""
    inside = points_in_rings(px, py, rings)
    for r in rings:
        inside &= ~points_on_ring_boundary(px, py, r, eps)
    return inside


# ---------------------------------------------------------------------------
# Distances
# ---------------------------------------------------------------------------


def seg_min_distance(px, py, coords: np.ndarray) -> np.ndarray:
    """Min distance from N points to a polyline's segments (planar).

    Broadcasts (N, E); chunk callers keep E modest (rings are small).
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    coords = np.asarray(coords, dtype=np.float64)
    ax, ay = coords[:-1, 0][None, :], coords[:-1, 1][None, :]
    bx, by = coords[1:, 0][None, :], coords[1:, 1][None, :]
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    t = ((px - ax) * dx + (py - ay) * dy) / np.where(ll == 0.0, 1.0, ll)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    return np.sqrt(d2.min(axis=1))


def points_to_polygon_distance(px, py, rings) -> np.ndarray:
    """0 inside/on-boundary, else min distance to the exterior/hole edges."""
    inside = points_in_rings(px, py, rings)
    d = np.full(np.asarray(px).shape, np.inf)
    for r in rings:
        d = np.minimum(d, seg_min_distance(px, py, r))
    return np.where(inside, 0.0, d)


def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in meters (vectorized)."""
    r = 6371008.8
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * r * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


# ---------------------------------------------------------------------------
# Measures
# ---------------------------------------------------------------------------


def segment_lengths(coords: np.ndarray) -> np.ndarray:
    """Per-segment lengths of a polyline — the reference's
    GetSegmentLength utility (/root/reference/SpaBase.py:62-77,
    duplicated at SpaVectors.py:69-85), vectorized."""
    c = np.asarray(coords, dtype=np.float64)
    return np.sqrt(((c[1:] - c[:-1]) ** 2).sum(axis=1))


def xys_from_coords(coords: np.ndarray):
    """(xs, ys) arrays from an (N,2) coordinate array — the reference's
    GetXYsFromCoords (/root/reference/SpaBase.py:36-60)."""
    c = np.asarray(coords, dtype=np.float64)
    return c[:, 0].copy(), c[:, 1].copy()


def ring_signed_area(ring: np.ndarray) -> float:
    ring = np.asarray(ring, dtype=np.float64)
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def polygon_area(rings) -> float:
    """|exterior| − Σ|holes| (shapely ``.area`` semantics)."""
    a = abs(ring_signed_area(rings[0]))
    for h in rings[1:]:
        a -= abs(ring_signed_area(h))
    return a


def geom_area(geom: dict) -> float:
    t = geom["type"]
    if t == "Polygon":
        return polygon_area(geom["coordinates"])
    if t == "MultiPolygon":
        return sum(polygon_area(p) for p in geom["coordinates"])
    return 0.0


def coords_length(coords: np.ndarray) -> float:
    c = np.asarray(coords, dtype=np.float64)
    return float(np.sqrt(((c[1:] - c[:-1]) ** 2).sum(axis=1)).sum())


def geom_length(geom: dict) -> float:
    t = geom["type"]
    if t == "LineString":
        return coords_length(geom["coordinates"])
    if t == "MultiLineString":
        return sum(coords_length(c) for c in geom["coordinates"])
    if t == "Polygon":
        return sum(coords_length(r) for r in geom["coordinates"])
    if t == "MultiPolygon":
        return sum(
            coords_length(r) for p in geom["coordinates"] for r in p
        )
    return 0.0


def geom_bounds(geom: dict) -> tuple[float, float, float, float]:
    t = geom["type"]
    if t == "Point":
        x, y = geom["coordinates"][0], geom["coordinates"][1]
        return float(x), float(y), float(x), float(y)
    arrs = _leaf_arrays(geom)
    allc = np.vstack(arrs)
    mn = allc.min(axis=0)
    mx = allc.max(axis=0)
    return float(mn[0]), float(mn[1]), float(mx[0]), float(mx[1])


def _leaf_arrays(geom: dict):
    t = geom["type"]
    c = geom["coordinates"]
    if t == "Point":
        return [np.asarray(c, dtype=np.float64).reshape(1, 2)]
    if t in ("LineString", "MultiPoint"):
        return [np.asarray(c, dtype=np.float64)]
    if t == "Polygon":
        return [np.asarray(r, dtype=np.float64) for r in c]
    if t == "MultiLineString":
        return [np.asarray(r, dtype=np.float64) for r in c]
    if t == "MultiPolygon":
        return [np.asarray(r, dtype=np.float64) for p in c for r in p]
    if t == "GeometryCollection":
        return [a for g in c for a in _leaf_arrays(g)]
    raise ValueError(t)


def ring_centroid(rings) -> tuple[float, float]:
    """Area-weighted polygon centroid (exterior + holes, signed)."""
    sa = 0.0
    cx = 0.0
    cy = 0.0
    for i, r in enumerate(rings):
        r = np.asarray(r, dtype=np.float64)
        x, y = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        cross = x * y2 - x2 * y
        a = cross.sum() / 2.0
        sign = 1.0 if i == 0 else -1.0
        a = abs(a) * sign
        if a == 0:
            continue
        # standard centroid formula needs the signed cross; recompute sign-safe
        csum = cross.sum()
        if csum == 0:
            continue
        gx = ((x + x2) * cross).sum() / (3.0 * csum)
        gy = ((y + y2) * cross).sum() / (3.0 * csum)
        sa += a
        cx += gx * a
        cy += gy * a
    if sa == 0.0:
        allc = np.vstack([np.asarray(r) for r in rings])
        return float(allc[:, 0].mean()), float(allc[:, 1].mean())
    return cx / sa, cy / sa


def geom_centroid(geom: dict) -> tuple[float, float]:
    t = geom["type"]
    if t == "Point":
        c = geom["coordinates"]
        return float(c[0]), float(c[1])
    if t == "MultiPoint":
        c = np.asarray(geom["coordinates"], dtype=np.float64)
        return float(c[:, 0].mean()), float(c[:, 1].mean())
    if t in ("LineString", "MultiLineString"):
        parts = (
            [geom["coordinates"]] if t == "LineString" else geom["coordinates"]
        )
        tot = 0.0
        cx = cy = 0.0
        for p in parts:
            p = np.asarray(p, dtype=np.float64)
            seg = p[1:] - p[:-1]
            ln = np.sqrt((seg**2).sum(axis=1))
            mid = (p[1:] + p[:-1]) / 2.0
            tot += ln.sum()
            cx += (mid[:, 0] * ln).sum()
            cy += (mid[:, 1] * ln).sum()
        if tot == 0:
            allc = np.vstack(parts)
            return float(allc[:, 0].mean()), float(allc[:, 1].mean())
        return cx / tot, cy / tot
    if t == "Polygon":
        return ring_centroid(geom["coordinates"])
    if t == "MultiPolygon":
        tot = 0.0
        cx = cy = 0.0
        for p in geom["coordinates"]:
            a = polygon_area(p)
            gx, gy = ring_centroid(p)
            tot += a
            cx += gx * a
            cy += gy * a
        if tot == 0:
            allc = np.vstack(_leaf_arrays(geom))
            return float(allc[:, 0].mean()), float(allc[:, 1].mean())
        return cx / tot, cy / tot
    raise ValueError(t)


# ---------------------------------------------------------------------------
# Hull / simplify / densify
# ---------------------------------------------------------------------------


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns closed CCW hull ring (M,2)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(seq):
        out = []
        for p in seq:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1], dtype=np.float64)
    return np.vstack([hull, hull[:1]])


def simplify_dp(coords: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker, iterative (stack), keeps endpoints."""
    c = np.asarray(coords, dtype=np.float64)
    n = len(c)
    if n <= 2:
        return c
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = c[j] - c[i]
        ll = float(seg @ seg)
        mid = c[i + 1 : j]
        if ll == 0.0:
            d = np.sqrt(((mid - c[i]) ** 2).sum(axis=1))
        else:
            t = np.clip(((mid - c[i]) @ seg) / ll, 0.0, 1.0)
            proj = c[i] + t[:, None] * seg
            d = np.sqrt(((mid - proj) ** 2).sum(axis=1))
        k = int(np.argmax(d))
        if d[k] > tol:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return c[keep]


def segmentize(coords: np.ndarray, max_len: float) -> np.ndarray:
    """Insert vertices so no segment exceeds ``max_len`` (equal splits,
    matching /root/reference/SpaDensify.py:41-147)."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2 or max_len <= 0:
        return c
    seg = c[1:] - c[:-1]
    ln = np.sqrt((seg**2).sum(axis=1))
    nsplit = np.maximum(1, np.ceil(ln / max_len)).astype(np.int64)
    out = [c[:1]]
    for i in range(len(c) - 1):
        k = nsplit[i]
        if k == 1:
            out.append(c[i + 1 : i + 2])
        else:
            ts = np.arange(1, k + 1, dtype=np.float64)[:, None] / k
            out.append(c[i] + ts * seg[i])
    return np.vstack(out)


# ---------------------------------------------------------------------------
# Clipping (Sutherland–Hodgman, convex clip window)
# ---------------------------------------------------------------------------


def clip_ring_convex(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray | None:
    """Clip a subject ring by a *convex* clip ring (CCW or CW auto).

    Returns the closed clipped ring or None when empty.  Exact for any
    subject polygon; the engine's Clip / box-overlay path
    (/root/reference/SpaVectors.py:1501-1527) always has a convex
    (rectangle) clip, where this is exact GEOS-equivalent up to FP.
    """
    clip = np.asarray(clip_ring, dtype=np.float64)
    if np.array_equal(clip[0], clip[-1]):
        clip = clip[:-1]
    if ring_signed_area(np.vstack([clip, clip[:1]])) < 0:
        clip = clip[::-1]  # force CCW so "inside" is left of each edge
    out = np.asarray(subject, dtype=np.float64)
    if np.array_equal(out[0], out[-1]):
        out = out[:-1]
    for i in range(len(clip)):
        if len(out) == 0:
            return None
        a = clip[i]
        b = clip[(i + 1) % len(clip)]
        ex, ey = b[0] - a[0], b[1] - a[1]
        px, py = out[:, 0], out[:, 1]
        side = ex * (py - a[1]) - ey * (px - a[0])  # >=0 inside (left)
        nxt = np.roll(out, -1, axis=0)
        side_n = np.roll(side, -1)
        new_pts = []
        for j in range(len(out)):
            cur_in = side[j] >= 0
            nxt_in = side_n[j] >= 0
            if cur_in:
                new_pts.append(out[j])
            if cur_in != nxt_in:
                # edge crosses the clip line — add intersection
                d = side[j] - side_n[j]
                t = side[j] / d if d != 0 else 0.0
                new_pts.append(out[j] + t * (nxt[j] - out[j]))
        if not new_pts:
            return None
        out = np.array(new_pts, dtype=np.float64)
    if len(out) < 3:
        return None
    return np.vstack([out, out[:1]])


def ring_is_convex(ring: np.ndarray) -> bool:
    """True when all cross products around the ring share a sign
    (collinear vertices allowed)."""
    r = np.asarray(ring, dtype=np.float64)
    if np.array_equal(r[0], r[-1]):
        r = r[:-1]
    if len(r) < 3:
        return True
    nxt = np.roll(r, -1, axis=0)
    nx2 = np.roll(r, -2, axis=0)
    cross = (nxt[:, 0] - r[:, 0]) * (nx2[:, 1] - nxt[:, 1]) - (
        nxt[:, 1] - r[:, 1]
    ) * (nx2[:, 0] - nxt[:, 0])
    return bool((cross >= 0).all() or (cross <= 0).all())


def clip_ring_halfplane(
    subject: np.ndarray, a: np.ndarray, b: np.ndarray, keep_left: bool = True
) -> np.ndarray | None:
    """Clip a ring by one infinite half-plane of the directed line a→b
    (keep the left side when ``keep_left``).  Same Sutherland–Hodgman
    inner step as :func:`clip_ring_convex`, for a single unbounded
    edge — the building block of the convex-complement wedge
    decomposition used by polygon difference."""
    out = np.asarray(subject, dtype=np.float64)
    if np.array_equal(out[0], out[-1]):
        out = out[:-1]
    ex, ey = float(b[0] - a[0]), float(b[1] - a[1])
    sgn = 1.0 if keep_left else -1.0
    px, py = out[:, 0], out[:, 1]
    side = sgn * (ex * (py - a[1]) - ey * (px - a[0]))
    nxt = np.roll(out, -1, axis=0)
    side_n = np.roll(side, -1)
    new_pts = []
    for j in range(len(out)):
        cur_in = side[j] >= 0
        nxt_in = side_n[j] >= 0
        if cur_in:
            new_pts.append(out[j])
        if cur_in != nxt_in:
            d = side[j] - side_n[j]
            t = side[j] / d if d != 0 else 0.0
            new_pts.append(out[j] + t * (nxt[j] - out[j]))
    if len(new_pts) < 3:
        return None
    arr = np.array(new_pts, dtype=np.float64)
    return np.vstack([arr, arr[:1]])


# ---------------------------------------------------------------------------
# Rect × ring intersection (for cell coverings)
# ---------------------------------------------------------------------------


def rects_intersect_ring(
    lo_x: np.ndarray, lo_y: np.ndarray, hi_x: np.ndarray, hi_y: np.ndarray,
    ring: np.ndarray,
) -> np.ndarray:
    """True per rect when the axis-aligned rect intersects the ring's
    polygon (interior or boundary).  Used to trim bbox cell coverings.

    Three vectorized conditions: (a) rect center/corner inside polygon,
    (b) any ring vertex inside rect, (c) any ring edge crosses the rect
    (Liang–Barsky span test, broadcast (M rects × E edges)).
    """
    lo_x = np.asarray(lo_x, dtype=np.float64)
    lo_y = np.asarray(lo_y, dtype=np.float64)
    hi_x = np.asarray(hi_x, dtype=np.float64)
    hi_y = np.asarray(hi_y, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    m = len(lo_x)
    hit = np.zeros(m, dtype=bool)

    # (a) rect corners inside polygon
    for cx, cy in (
        (lo_x, lo_y), (hi_x, lo_y), (lo_x, hi_y), (hi_x, hi_y),
        ((lo_x + hi_x) / 2, (lo_y + hi_y) / 2),
    ):
        hit |= points_in_ring(cx, cy, ring)

    # (b) ring vertices inside rect
    vx, vy = ring[:, 0], ring[:, 1]
    inrect = (
        (vx[None, :] >= lo_x[:, None])
        & (vx[None, :] <= hi_x[:, None])
        & (vy[None, :] >= lo_y[:, None])
        & (vy[None, :] <= hi_y[:, None])
    )
    hit |= inrect.any(axis=1)

    # (c) edge × rect crossing via Liang–Barsky (only for undecided rects)
    todo = ~hit
    if todo.any():
        idx = np.nonzero(todo)[0]
        ax, ay = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
        dx = ring[1:, 0][None, :] - ax
        dy = ring[1:, 1][None, :] - ay
        lx, ly = lo_x[idx][:, None], lo_y[idx][:, None]
        hx, hy = hi_x[idx][:, None], hi_y[idx][:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            t0 = np.zeros((len(idx), ring.shape[0] - 1))
            t1 = np.ones_like(t0)
            for p, q in (
                (-dx, ax - lx), (dx, hx - ax), (-dy, ay - ly), (dy, hy - ay),
            ):
                r = np.where(p != 0, q / np.where(p == 0, 1.0, p), np.inf)
                ent = np.where(p < 0, r, -np.inf)
                ext = np.where(p > 0, r, np.inf)
                t0 = np.maximum(t0, ent)
                t1 = np.minimum(t1, ext)
                # p == 0 & q < 0 → fully outside this slab
                t0 = np.where((p == 0) & (q < 0), np.inf, t0)
        cross = (t0 <= t1).any(axis=1)
        hit[idx] |= cross
    return hit


# ---------------------------------------------------------------------------
# Segment × segment intersection (vectorized E1×E2 orientation tests)
# ---------------------------------------------------------------------------


def _orient(ax, ay, bx, by, cx, cy):
    """Signed orientation of c vs directed segment a→b (broadcastable)."""
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def segments_intersect_matrix(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """(E1, E2) bool matrix: does edge i of polyline ``c1`` intersect
    edge j of ``c2`` (touching counts)?  Standard orientation test with
    collinear-overlap handling."""
    c1 = np.asarray(c1, dtype=np.float64)
    c2 = np.asarray(c2, dtype=np.float64)
    ax, ay = c1[:-1, 0][:, None], c1[:-1, 1][:, None]
    bx, by = c1[1:, 0][:, None], c1[1:, 1][:, None]
    cx, cy = c2[:-1, 0][None, :], c2[:-1, 1][None, :]
    dx, dy = c2[1:, 0][None, :], c2[1:, 1][None, :]
    d1 = _orient(ax, ay, bx, by, cx, cy)
    d2 = _orient(ax, ay, bx, by, dx, dy)
    d3 = _orient(cx, cy, dx, dy, ax, ay)
    d4 = _orient(cx, cy, dx, dy, bx, by)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (
        (d1 != 0) | (d2 != 0)
    ) & ((d3 != 0) | (d4 != 0))
    # collinear / endpoint-touch cases: zero orientation + bbox overlap
    def on_seg(px, py, qx, qy, rx, ry):
        return (
            (np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx))
            & (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy))
        )

    touch = (
        ((d1 == 0) & on_seg(ax, ay, bx, by, cx, cy))
        | ((d2 == 0) & on_seg(ax, ay, bx, by, dx, dy))
        | ((d3 == 0) & on_seg(cx, cy, dx, dy, ax, ay))
        | ((d4 == 0) & on_seg(cx, cy, dx, dy, bx, by))
    )
    return proper | touch


def segments_proper_cross_any(c1: np.ndarray, c2: np.ndarray) -> bool:
    """True when any edge pair crosses *properly* (interiors of the
    segments intersect at a single point — excludes endpoint touches)."""
    c1 = np.asarray(c1, dtype=np.float64)
    c2 = np.asarray(c2, dtype=np.float64)
    ax, ay = c1[:-1, 0][:, None], c1[:-1, 1][:, None]
    bx, by = c1[1:, 0][:, None], c1[1:, 1][:, None]
    cx, cy = c2[:-1, 0][None, :], c2[:-1, 1][None, :]
    dx, dy = c2[1:, 0][None, :], c2[1:, 1][None, :]
    d1 = _orient(ax, ay, bx, by, cx, cy)
    d2 = _orient(ax, ay, bx, by, dx, dy)
    d3 = _orient(cx, cy, dx, dy, ax, ay)
    d4 = _orient(cx, cy, dx, dy, bx, by)
    return bool(
        (((d1 > 0) & (d2 < 0) | (d1 < 0) & (d2 > 0))
         & ((d3 > 0) & (d4 < 0) | (d3 < 0) & (d4 > 0))).any()
    )


def rings_intersect(r1: np.ndarray, r2: np.ndarray) -> bool:
    """Polygon-ring × polygon-ring 'intersects' (shared point counts):
    any edge intersection, or one ring inside the other."""
    if segments_intersect_matrix(r1, r2).any():
        return True
    if points_in_ring(r2[:1, 0], r2[:1, 1], r1)[0]:
        return True
    if points_in_ring(r1[:1, 0], r1[:1, 1], r2)[0]:
        return True
    return False


def _edges_cross_rects(
    lo_x: np.ndarray, lo_y: np.ndarray, hi_x: np.ndarray, hi_y: np.ndarray,
    ring: np.ndarray,
) -> np.ndarray:
    """True per rect when any ring edge intersects the rect (Liang–
    Barsky span test, broadcast M rects × E edges)."""
    ring = np.asarray(ring, dtype=np.float64)
    ax, ay = ring[:-1, 0][None, :], ring[:-1, 1][None, :]
    dx = ring[1:, 0][None, :] - ax
    dy = ring[1:, 1][None, :] - ay
    lx, ly = lo_x[:, None], lo_y[:, None]
    hx, hy = hi_x[:, None], hi_y[:, None]
    t0 = np.zeros((len(lo_x), ring.shape[0] - 1))
    t1 = np.ones_like(t0)
    for p, q in ((-dx, ax - lx), (dx, hx - ax), (-dy, ay - ly), (dy, hy - ay)):
        r = np.where(p != 0, q / np.where(p == 0, 1.0, p), np.inf)
        t0 = np.maximum(t0, np.where(p < 0, r, -np.inf))
        t1 = np.minimum(t1, np.where(p > 0, r, np.inf))
        t0 = np.where((p == 0) & (q < 0), np.inf, t0)
    return (t0 <= t1).any(axis=1)


def rects_fully_inside_ring(
    lo_x, lo_y, hi_x, hi_y, ring: np.ndarray
) -> np.ndarray:
    """True per rect when the whole axis-aligned rect lies inside the
    ring's polygon: all 4 corners inside AND no ring edge crosses the
    rect.  Exact for arbitrary simple rings (not just convex)."""
    lo_x = np.asarray(lo_x, dtype=np.float64)
    lo_y = np.asarray(lo_y, dtype=np.float64)
    hi_x = np.asarray(hi_x, dtype=np.float64)
    hi_y = np.asarray(hi_y, dtype=np.float64)
    inside = np.ones(len(lo_x), dtype=bool)
    for cx, cy in ((lo_x, lo_y), (hi_x, lo_y), (lo_x, hi_y), (hi_x, hi_y)):
        inside &= points_in_ring(cx, cy, ring)
    todo = inside.copy()
    if todo.any():
        idx = np.nonzero(todo)[0]
        cross = _edges_cross_rects(
            lo_x[idx], lo_y[idx], hi_x[idx], hi_y[idx], np.asarray(ring)
        )
        inside[idx] &= ~cross
    return inside


# ---------------------------------------------------------------------------
# Buffers (n-gon approximations; exact distance joins never build these)
# ---------------------------------------------------------------------------


def point_buffer_ring(x: float, y: float, radius: float, quad_segs: int = 16,
                      phase: float = 0.0) -> np.ndarray:
    """Regular n-gon approximating a circle (shapely's quad_segs=16 →
    64-gon; /root/reference/SpaVectors.py:790-818 delegates to GEOS
    buffer which uses the same fan approximation).

    ``phase`` rotates the vertex fan (radians).  The Minkowski buffer
    passes a half-segment offset so disc vertices never coincide with
    edge-rectangle corners (axis directions), which would otherwise
    feed maximally-degenerate shared-vertex configurations to the
    Greiner–Hormann union.  The n-gon area 0.5·n·r²·sin(2π/n) is
    phase-invariant, as is the corner-wedge decomposition (the wedge
    cuts pass through the disc center)."""
    n = max(4, 4 * quad_segs)
    th = np.linspace(0.0, 2 * np.pi, n, endpoint=False) + phase
    ring = np.column_stack([x + radius * np.cos(th), y + radius * np.sin(th)])
    return np.vstack([ring, ring[:1]])


__all__ = [
    "points_in_ring",
    "points_in_rings",
    "points_in_polygon_geom",
    "points_covered_by",
    "points_contained",
    "points_on_ring_boundary",
    "seg_min_distance",
    "points_to_polygon_distance",
    "haversine_m",
    "ring_signed_area",
    "polygon_area",
    "geom_area",
    "coords_length",
    "geom_length",
    "geom_bounds",
    "geom_centroid",
    "ring_centroid",
    "convex_hull",
    "simplify_dp",
    "segmentize",
    "clip_ring_convex",
    "rects_intersect_ring",
    "point_buffer_ring",
]
