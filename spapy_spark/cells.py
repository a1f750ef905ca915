"""Z-order hierarchical cell index (the H3/S2 role), pure vectorized numpy.

A *cell* is an int64 encoding ``(resolution, morton(ix, iy))`` of a square
lat/lon grid tile:

- resolution ``r`` in [0, 26]: the world is split into ``2^r × 2^r`` tiles
  (lon axis -180..180, lat axis -90..90, half-open on the top edge).
- ``ix`` indexes longitude, ``iy`` latitude; bits interleaved (Morton /
  Z-order) so that a parent cell id is a *prefix* of its children —
  the "cell-prefix hash join" key of BASELINE.json's north rule.
- layout: ``cell = (r << 56) | interleave2(ix, iy)`` — 5 res bits at the
  top (sign bit clear), ≤52 Morton bits below.  Fits Spark LongType.

Why not real H3/S2: neither library is available in this environment and
the engine must be from-scratch; a Z-order quadtree gives the same
algebra the join planner needs (point→cell, polygon→cover set, k-ring
neighborhoods, parent/child truncation) with exact integer arithmetic —
no floating-point platform drift in the join keys (SURVEY.md §7.3).

Everything here is a pure function of numpy arrays so it can run inside
Arrow-batched pandas UDFs (no per-row Python in the hot path).

Reference parity note: the reference has *no* spatial index at all — it
nested-loops every feature pair (/root/reference/SpaVectors.py:964-983).
This module is the scale substitute demanded by the north rule.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 26
_RES_SHIFT = 56
_MORTON_MASK = (np.uint64(1) << np.uint64(52)) - np.uint64(1)

# ---------------------------------------------------------------------------
# Morton bit-interleave (classic magic-mask spread), vectorized uint64.
# ---------------------------------------------------------------------------

_M1 = np.uint64(0x0000FFFF0000FFFF)
_M2 = np.uint64(0x00FF00FF00FF00FF)
_M3 = np.uint64(0x0F0F0F0F0F0F0F0F)
_M4 = np.uint64(0x3333333333333333)
_M5 = np.uint64(0x5555555555555555)


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of ``x`` into the even bit positions."""
    x = x.astype(np.uint64, copy=True)
    x &= np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & _M1
    x = (x | (x << np.uint64(8))) & _M2
    x = (x | (x << np.uint64(4))) & _M3
    x = (x | (x << np.uint64(2))) & _M4
    x = (x | (x << np.uint64(1))) & _M5
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_part1by1`: gather even bit positions."""
    x = x.astype(np.uint64, copy=True)
    x &= _M5
    x = (x | (x >> np.uint64(1))) & _M4
    x = (x | (x >> np.uint64(2))) & _M3
    x = (x | (x >> np.uint64(4))) & _M2
    x = (x | (x >> np.uint64(8))) & _M1
    x = (x | (x >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return x


def _interleave(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return _part1by1(ix) | (_part1by1(iy) << np.uint64(1))


# ---------------------------------------------------------------------------
# Encode / decode
# ---------------------------------------------------------------------------


def latlon_to_ij(lat, lon, res: int):
    """Quantize lat/lon arrays to integer grid coords at ``res``.

    Longitude wraps modulo 360 into [-180, 180); latitude clamps to the
    valid band (poles land in the top/bottom row).
    """
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}], got {res}")
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    n = np.int64(1) << np.int64(res)
    fx = (np.mod(lon + 180.0, 360.0)) / 360.0  # [0, 1)
    fy = (lat + 90.0) / 180.0
    ix = np.clip(np.floor(fx * n).astype(np.int64), 0, int(n) - 1)
    iy = np.clip(np.floor(fy * n).astype(np.int64), 0, int(n) - 1)
    return ix, iy


def ij_to_cell(ix, iy, res: int) -> np.ndarray:
    ix = np.asarray(ix, dtype=np.uint64)
    iy = np.asarray(iy, dtype=np.uint64)
    head = np.uint64(res) << np.uint64(_RES_SHIFT)
    return (_interleave(ix, iy) | head).astype(np.int64)


def latlon_to_cell(lat, lon, res: int) -> np.ndarray:
    """Vectorized point→cell encode. Returns int64 array."""
    ix, iy = latlon_to_ij(lat, lon, res)
    return ij_to_cell(ix, iy, res)


def cell_res(cell) -> np.ndarray:
    cell = np.asarray(cell, dtype=np.uint64)
    return (cell >> np.uint64(_RES_SHIFT)).astype(np.int64)


def cell_to_ij(cell):
    """Decode cells to (ix, iy) int64 arrays (resolution from the id)."""
    cell = np.asarray(cell, dtype=np.uint64)
    m = cell & _MORTON_MASK
    ix = _compact1by1(m).astype(np.int64)
    iy = _compact1by1(m >> np.uint64(1)).astype(np.int64)
    return ix, iy


def cell_bounds(cell):
    """(lon_min, lat_min, lon_max, lat_max) float64 arrays per cell."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = cell_res(cell)
    ix, iy = cell_to_ij(cell)
    size_lon = 360.0 / (np.float64(2.0) ** res)
    size_lat = 180.0 / (np.float64(2.0) ** res)
    lon_min = -180.0 + ix * size_lon
    lat_min = -90.0 + iy * size_lat
    return lon_min, lat_min, lon_min + size_lon, lat_min + size_lat


def cell_to_parent(cell, parent_res: int) -> np.ndarray:
    """Truncate cells to a coarser resolution (prefix property)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = cell_res(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell resolution")
    shift = (2 * (res - parent_res)).astype(np.uint64)
    m = (cell & _MORTON_MASK) >> shift
    head = np.uint64(parent_res) << np.uint64(_RES_SHIFT)
    return (m | head).astype(np.int64)


# ---------------------------------------------------------------------------
# Neighborhoods & coverings
# ---------------------------------------------------------------------------


def k_ring(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` of ``cell`` (incl. itself).

    Longitude wraps; latitude rows outside the grid are dropped.
    """
    res = int(cell_res(np.array([cell]))[0])
    n = 1 << res
    ix, iy = cell_to_ij(np.array([cell]))
    ix, iy = int(ix[0]), int(iy[0])
    dxs = np.arange(-k, k + 1, dtype=np.int64)
    dys = np.arange(-k, k + 1, dtype=np.int64)
    gx, gy = np.meshgrid(dxs, dys, indexing="ij")
    nx = np.mod(ix + gx.ravel(), n)
    ny = iy + gy.ravel()
    ok = (ny >= 0) & (ny < n)
    return ij_to_cell(nx[ok], ny[ok], res)


def ring_shell(cell: int, k: int) -> np.ndarray:
    """Cells at exactly Chebyshev distance ``k`` (the hollow ring)."""
    if k == 0:
        return np.array([cell], dtype=np.int64)
    inner = set(k_ring(cell, k - 1).tolist())
    outer = k_ring(cell, k)
    return np.array([c for c in outer.tolist() if c not in inner], dtype=np.int64)


def cover_bbox(lon_min, lat_min, lon_max, lat_max, res: int) -> np.ndarray:
    """All res-``res`` cells intersecting an axis-aligned bbox (no
    antimeridian wrap — callers split wrapped boxes first)."""
    n = 1 << res
    ix0, iy0 = latlon_to_ij(np.float64(lat_min), np.float64(lon_min), res)
    # upper edge is half-open: nudge so exact-boundary maxima don't spill
    eps = 1e-12
    ix1, iy1 = latlon_to_ij(
        np.float64(min(lat_max, 90.0) - eps * 0.0),
        np.float64(lon_max),
        res,
    )
    ix0, iy0, ix1, iy1 = int(ix0), int(iy0), int(ix1), int(iy1)
    ix1 = min(max(ix1, ix0), n - 1)
    iy1 = min(max(iy1, iy0), n - 1)
    xs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    ys = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return ij_to_cell(gx.ravel(), gy.ravel(), res)


def cover_bbox_adaptive(
    lon_min, lat_min, lon_max, lat_max, res: int, max_cells: int = 4096
) -> tuple[np.ndarray, int]:
    """Like :func:`cover_bbox` but coarsens ``res`` until the covering has
    at most ``max_cells`` cells. Returns (cells, effective_res)."""
    r = res
    while r > 0:
        n = 1 << r
        w = (lon_max - lon_min) / (360.0 / n) + 2
        h = (lat_max - lat_min) / (180.0 / n) + 2
        if w * h <= max_cells:
            break
        r -= 1
    return cover_bbox(lon_min, lat_min, lon_max, lat_max, r), r


def zone_cover(parts, res: int, max_cells: int = 4096) -> tuple[np.ndarray, int]:
    """Covering cells for a whole (Multi)Polygon at ONE effective res.

    The effective res is picked from the combined bbox so the covering
    stays under ``max_cells`` — giant zones coarsen, small zones keep
    ``res``.  A single res per zone guarantees each (point, zone)
    candidate pair appears at most once in a prefix join (the point's
    ancestor cell at that res is unique).

    ``parts``: list of polygons, each a list of rings.
    Returns (cells int64 array, effective_res).
    """
    exts = [np.asarray(p[0], dtype=np.float64) for p in parts]
    allv = np.vstack(exts)
    lon_min, lat_min = allv.min(axis=0)
    lon_max, lat_max = allv.max(axis=0)
    _, eff = cover_bbox_adaptive(lon_min, lat_min, lon_max, lat_max, res, max_cells)
    out: list[np.ndarray] = []
    for p in parts:
        out.append(polygon_cover(p, eff, max_cells=max_cells, _fixed_res=True))
    cells_ = np.unique(np.concatenate(out))
    return cells_, eff


def polygon_cover(
    rings, res: int, max_cells: int = 4096, _fixed_res: bool = False
) -> np.ndarray:
    """Cells at ``res`` that intersect the polygon (exterior ring +
    optional hole rings, each an (N,2) array of (lon, lat)).

    Conservative covering: bbox cells filtered to those whose square
    actually intersects the exterior ring (corner-in-poly, vertex-in-rect
    or edge crossing).  Holes are NOT subtracted — covering must stay a
    superset so the candidate join has no false negatives (SURVEY §5.5).
    """
    from .geometry import kernels  # local import: avoid cycle at module load

    ext = np.asarray(rings[0], dtype=np.float64)
    lon_min, lat_min = ext.min(axis=0)
    lon_max, lat_max = ext.max(axis=0)
    if _fixed_res:
        cells = cover_bbox(lon_min, lat_min, lon_max, lat_max, res)
    else:
        cells, eff = cover_bbox_adaptive(
            lon_min, lat_min, lon_max, lat_max, res, max_cells
        )
    if len(cells) <= 4:  # tiny covering — keep it all
        return cells
    clo, cla, chi, cha = cell_bounds(cells)
    keep = kernels.rects_intersect_ring(clo, cla, chi, cha, ext)
    return cells[keep]


__all__ = [
    "MAX_RES",
    "latlon_to_cell",
    "latlon_to_ij",
    "ij_to_cell",
    "cell_res",
    "cell_to_ij",
    "cell_bounds",
    "cell_to_parent",
    "k_ring",
    "ring_shell",
    "cover_bbox",
    "cover_bbox_adaptive",
    "polygon_cover",
    "zone_cover",
]
