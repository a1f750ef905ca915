"""General polygon boolean ops — Greiner–Hormann clipping.

Removes the convex-clip restriction of kernels.clip_ring_convex for
arbitrary *simple* rings (the reference delegates these cases to GEOS,
/root/reference/SpaVectors.py:901-937).  Supported ops: intersection,
union, difference of two simple rings; overlay.py composes multi-part
and holed inputs on top.

Algorithm (Greiner & Hormann 1998):
1. find all edge×edge intersection points; insert them into circular
   vertex lists of both polygons, ordered by the edge parameter alpha;
2. mark each intersection alternately entry/exit, seeded by whether
   the first subject vertex lies inside the clip polygon;
3. trace result contours: from an unvisited intersection, follow the
   subject list forward/backward (by op), switch lists at each
   intersection, until the start point closes.

Degenerate inputs (shared vertices, collinear edge overlaps, vertex-
on-edge) are handled by the standard epsilon-perturbation fallback:
when a degeneracy is detected the CLIP polygon is perturbed by a
deterministic sub-nanometer offset and the clip retried — results are
then exact up to 1e-9, which the engine's FP contract allows
(SURVEY §7.3 treats sub-nanometer as below join-key resolution).
"""

from __future__ import annotations

import numpy as np

from . import kernels

_EPS = 1e-12


class _V:
    __slots__ = ("x", "y", "nxt", "prv", "neighbor", "entry", "inter",
                 "alpha", "visited")

    def __init__(self, x: float, y: float, inter: bool = False,
                 alpha: float = 0.0):
        self.x = x
        self.y = y
        self.nxt = None
        self.prv = None
        self.neighbor = None
        self.entry = True
        self.inter = inter
        self.alpha = alpha
        self.visited = False


def _signed_area(pts) -> float:
    """Shoelace signed area of a CLOSED ring (first == last vertex).

    For rings of ≤8 terms the scalar sequential sum is BIT-IDENTICAL
    to kernels.ring_signed_area (numpy's pairwise summation degrades
    to a plain loop below 8 elements), without the ~13 µs small-array
    numpy overhead per call that dominated the GH profile.  Larger
    rings defer to the numpy kernel so the summation order (and thus
    the degenerate-sliver thresholds) never changes.
    """
    n1 = len(pts) - 1
    if n1 > 7:
        return kernels.ring_signed_area(np.asarray(pts, dtype=np.float64))
    if isinstance(pts, np.ndarray):
        pts = pts.tolist()
    s = 0.0
    for i in range(n1):
        p = pts[i]
        q = pts[i + 1]
        s += p[0] * q[1] - q[0] * p[1]
    return 0.5 * s


def _closed(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if not (r[0, 0] == r[-1, 0] and r[0, 1] == r[-1, 1]):
        r = np.vstack([r, r[:1]])
    return r


def _build(ring: np.ndarray) -> _V:
    # tolist(): the vertex machinery runs on PYTHON floats — identical
    # IEEE values, ~3× faster scalar arithmetic than np.float64 scalars
    pts = np.asarray(ring, dtype=np.float64).tolist()
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    first = None
    prev = None
    for x, y in pts:
        v = _V(x, y)
        if first is None:
            first = v
        else:
            prev.nxt = v
            v.prv = prev
        prev = v
    prev.nxt = first
    first.prv = prev
    return first


def _verts(head: _V):
    v = head
    while True:
        yield v
        v = v.nxt
        if v is head:
            break


def _insert(v: _V, start: _V, end: _V):
    """Insert intersection vertex between start and end, alpha-sorted."""
    cur = start
    while cur.nxt is not end and cur.nxt.inter and cur.nxt.alpha < v.alpha:
        cur = cur.nxt
    # skip over already-inserted intersections with smaller alpha
    nxt = cur.nxt
    cur.nxt = v
    v.prv = cur
    v.nxt = nxt
    nxt.prv = v


def _seg_inter(p1, p2, q1, q2):
    """Proper intersection of segments p1p2 × q1q2 → (x, y, ta, tb) or
    None; returns None (degenerate) for collinear/endpoint touches."""
    d1x, d1y = p2.x - p1.x, p2.y - p1.y
    d2x, d2y = q2.x - q1.x, q2.y - q1.y
    den = d1x * d2y - d1y * d2x
    if den == 0.0:
        return None
    ta = ((q1.x - p1.x) * d2y - (q1.y - p1.y) * d2x) / den
    tb = ((q1.x - p1.x) * d1y - (q1.y - p1.y) * d1x) / den
    if ta <= _EPS or ta >= 1 - _EPS or tb <= _EPS or tb >= 1 - _EPS:
        if -_EPS < ta < 1 + _EPS and -_EPS < tb < 1 + _EPS:
            raise _Degenerate()
        return None
    return (p1.x + ta * d1x, p1.y + ta * d1y, ta, tb)


class _Degenerate(Exception):
    pass


def _point_in(x: float, y: float, head: _V) -> bool:
    """Scalar even-odd crossing test — the per-edge arithmetic is the
    EXACT expression of kernels.points_in_ring (same operations, same
    order per edge; the XOR accumulation is order-free), so the result
    is bit-identical without the small-array numpy overhead that
    dominated the GH profile."""
    inside = False
    v = head
    while True:
        x1, y1 = v.x, v.y
        nxt = v.nxt
        x2, y2 = nxt.x, nxt.y
        if y1 != y2 and ((y1 > y) != (y2 > y)):
            xint = (x2 - x1) * (y - y1) / (y2 - y1) + x1
            if x < xint:
                inside = not inside
        v = nxt
        if v is head:
            break
    return inside


def _edges(head: _V):
    """(v, next-non-intersection vertex) original edges."""
    originals = [v for v in _verts(head) if not v.inter]
    n = len(originals)
    for i, v in enumerate(originals):
        yield v, originals[(i + 1) % n]


def _clip_once(subject: np.ndarray, clip: np.ndarray, op: str):
    s_head = _build(subject)
    c_head = _build(clip)
    # phase 1: intersections
    found = 0
    for sv, sn in list(_edges(s_head)):
        for cv, cn in list(_edges(c_head)):
            hit = _seg_inter(sv, sn, cv, cn)
            if hit is None:
                continue
            x, y, ta, tb = hit
            a = _V(x, y, inter=True, alpha=ta)
            b = _V(x, y, inter=True, alpha=tb)
            a.neighbor = b
            b.neighbor = a
            _insert(a, sv, sn)
            _insert(b, cv, cn)
            found += 1
    if found == 0:
        # containment / disjoint resolution (closed rings out)
        s_in_c = _point_in(s_head.x, s_head.y, c_head)
        c_in_s = _point_in(c_head.x, c_head.y, s_head)
        sub_ring = _closed(subject)
        clip_ring = _closed(clip)
        if op == "intersection":
            if s_in_c:
                return [sub_ring]
            if c_in_s:
                return [clip_ring]
            return []
        if op == "union":
            if s_in_c:
                return [clip_ring]
            if c_in_s:
                return [sub_ring]
            return [sub_ring, clip_ring]
        if op == "difference":  # subject \ clip
            if s_in_c:
                return []
            if c_in_s:
                # clip is a hole in subject — caller-level concern;
                # represent as subject with hole
                return [sub_ring, ("hole", clip_ring)]
            return [sub_ring]
    # phase 2: entry/exit marks
    for head, other in ((s_head, c_head), (c_head, s_head)):
        status = not _point_in(head.x, head.y, other)  # True → next is entry
        for v in _verts(head):
            if v.inter:
                v.entry = status
                status = not status
    # op-specific traversal orientation
    # intersection: at entry follow forward; union: at entry go backward
    # difference: subject forward at exit / clip backward (classic table)
    if op == "union":
        flip_s, flip_c = True, True
    elif op == "difference":
        flip_s, flip_c = True, False
    else:
        flip_s, flip_c = False, False
    # apply flips by inverting entry flags
    if flip_s:
        for v in _verts(s_head):
            if v.inter:
                v.entry = not v.entry
    if flip_c:
        for v in _verts(c_head):
            if v.inter:
                v.entry = not v.entry
    # phase 3: trace
    results = []
    inters = [v for v in _verts(s_head) if v.inter]
    for start in inters:
        if start.visited:
            continue
        contour = []
        cur = start
        while True:
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            if cur.entry:
                while True:
                    contour.append((cur.x, cur.y))
                    cur = cur.nxt
                    if cur.inter:
                        break
            else:
                while True:
                    contour.append((cur.x, cur.y))
                    cur = cur.prv
                    if cur.inter:
                        break
            cur = cur.neighbor
            if cur is start or (cur.x == start.x and cur.y == start.y):
                break
            if len(contour) > 100000:
                raise _Degenerate()  # tracing ran away → perturb+retry
        closedc = contour + [contour[0]]
        if len(closedc) >= 4 and abs(_signed_area(closedc)) > 1e-14:
            results.append(np.array(closedc, dtype=np.float64))
    # hole classification by CONTAINMENT (trace orientation is not
    # deterministic): probe each ring's first-edge midpoint against
    # every other ring; odd containment count → hole.  Midpoints sit
    # strictly off other contours in general position (degenerate
    # configs re-enter via the perturbation retry).
    outs: list = []
    holes: list = []
    for i, r in enumerate(results):
        mx, my = (r[0] + r[1]) / 2.0
        inside = 0
        for j, r2 in enumerate(results):
            if i != j and kernels.points_in_ring(
                np.array([mx]), np.array([my]), r2
            )[0]:
                inside += 1
        (holes if inside % 2 == 1 else outs).append(r)
    return outs + [("hole", h) for h in holes]


def clip_rings(subject, clip, op: str):
    """Boolean op of two simple rings → list of result rings (the
    'difference leaves a hole' case returns [outer, ("hole", ring)]).

    Degeneracies retry with a deterministic sub-nanometer perturbation
    of the clip ring (documented in the module docstring).
    """
    subject = np.asarray(subject, dtype=np.float64)
    clip = np.asarray(clip, dtype=np.float64)
    # normalize both rings CCW so hole classification by signed area
    # is well-defined
    if _signed_area(_closed(subject)) < 0:
        subject = subject[::-1]
    if _signed_area(_closed(clip)) < 0:
        clip = clip[::-1]
    base = clip
    for attempt in range(7):
        try:
            return _clip_once(subject, clip, op)
        except _Degenerate:
            # geometric bump growth escapes clustered degeneracies the
            # linear schedule couldn't (accumulated union folds leave
            # vertices ~1e-9 apart); capped at 1e-7 — still far below
            # any join-key/area resolution the engine promises
            bump = min(1e-9 * 4.0 ** attempt, 1e-7)
            clip = base + np.array([[bump, bump * 0.7]])
    raise ValueError("unresolvable degenerate polygon configuration")


# ---------------------------------------------------------------------------
# (Multi)Polygon-dict composition
# ---------------------------------------------------------------------------


def _split_marks(rings):
    outs = [r for r in rings if not isinstance(r, tuple)]
    holes = [r[1] for r in rings if isinstance(r, tuple)]
    return outs, holes


def _subtract_ring(parts, ring):
    """[(ext, holes)] ∖ ring → new part list (GH per exterior; holes
    clipped into the surviving pieces)."""
    out = []
    for ext, holes in parts:
        pieces_o, pieces_h = _split_marks(clip_rings(ext, ring, "difference"))
        for po in pieces_o:
            new_holes = list(pieces_h) if len(pieces_o) == 1 else [
                h for h in pieces_h
                if kernels.points_in_ring(
                    np.array([(h[0][0] + h[1][0]) / 2]),
                    np.array([(h[0][1] + h[1][1]) / 2]), po)[0]
            ]
            for h in holes:
                ho, _ = _split_marks(clip_rings(h, po, "intersection"))
                new_holes.extend(ho)
            out.append((po, new_holes))
    return out


def boolean_op(g1: dict, g2: dict, op: str) -> dict | None:
    """General boolean op of (Multi)Polygon dicts (arbitrary simple
    rings, holes supported on BOTH sides for all four ops — holed
    clips decompose via A ∖ (E∖H) = (A∖E) ⊎ (A∩H)).  Returns a
    MultiPolygon dict or None when empty."""
    from . import wkb

    p1 = [(list(r)[0], list(r)[1:]) for r in wkb.polygons_of(g1)]
    p2 = [(list(r)[0], list(r)[1:]) for r in wkb.polygons_of(g2)]
    if op == "intersection":
        parts = []
        for e1, h1 in p1:
            for e2, h2 in p2:
                outs, marks = _split_marks(clip_rings(e1, e2, "intersection"))
                if len(outs) <= 1:
                    cur = [(o, list(marks)) for o in outs]
                else:
                    # multiple outer components (interlocking concave
                    # shapes): assign each hole mark to its containing
                    # component by midpoint test, as _subtract_ring does
                    cur = [
                        (o, [
                            h for h in marks
                            if kernels.points_in_ring(
                                np.array([(h[0][0] + h[1][0]) / 2]),
                                np.array([(h[0][1] + h[1][1]) / 2]), o)[0]
                        ])
                        for o in outs
                    ]
                for h in list(h1) + list(h2):
                    cur = _subtract_ring(cur, h)
                parts.extend(cur)
        return _assemble(parts)
    if op == "difference":
        # A ∖ (ext ∖ hole) = (A ∖ ext) ⊎ (A ∩ hole): each holed clip
        # part subtracts its exterior and adds back the hole overlaps —
        # the two sets are disjoint (hole ⊂ ext), so plain concatenation
        cur = p1
        for e2, h2 in p2:
            add_back = []
            for h in h2:
                for ext, holes in cur:
                    hg = {"type": "Polygon", "coordinates": [ext] + list(holes)}
                    clipg = {"type": "Polygon", "coordinates": [h]}
                    inter = boolean_op(hg, clipg, "intersection")
                    if inter is not None:
                        add_back.extend(
                            (list(r)[0], list(r)[1:])
                            for r in wkb.polygons_of(inter)
                        )
            cur = _subtract_ring(cur, e2) + add_back
        return _assemble(cur)
    if op == "union":
        # disjoint decomposition: g1 ⊎ (g2 ∖ g1) — g1 holes are fine
        # (the difference's holed-clip identity handles them)
        rest = boolean_op(g2, g1, "difference")
        parts = list(p1)
        if rest is not None:
            parts.extend(
                (list(r)[0], list(r)[1:]) for r in wkb.polygons_of(rest)
            )
        return _assemble(parts)
    if op == "symmetric_difference":
        a = boolean_op(g1, g2, "difference")
        b = boolean_op(g2, g1, "difference")
        parts = []
        for g in (a, b):
            if g is not None:
                parts.extend(
                    (list(r)[0], list(r)[1:]) for r in wkb.polygons_of(g)
                )
        return _assemble(parts)
    raise ValueError(op)


def _assemble(parts) -> dict | None:
    out = []
    for ext, holes in parts:
        if abs(_signed_area(_closed(ext))) <= 1e-12:
            continue
        out.append([_closed(ext)] + [_closed(h) for h in holes])
    if not out:
        return None
    return {"type": "MultiPolygon", "coordinates": out}
