"""kNN nearest-feature lookup (north-rule operator).

The reference has no kNN at all (its only "nearest" is raster
resampling, /root/reference/SpaRasters.py:1390); this operator is new
engine surface mandated by BASELINE.json's north_star ("STRtree-per-
partition kNN").

Two physical strategies, picked by the size of the feature side:

- ``knn_join_broadcast`` — the feature layer (sites) is small: ship it
  to every executor and resolve each point batch with one vectorized
  distance matrix + ``argpartition`` top-k.  No shuffle of the point
  side; this is the 10^12-doc plan when |sites| is O(10^4..10^5).
- ``knn_join_cells`` — both sides large: sites are bucketed by Z-order
  cell (cells.py); each point probes its own cell's bucket and expands
  k-rings until ``k`` candidates are guaranteed correct (ring distance
  lower bound exceeds the current k-th best).  Executed as a cell
  equi-join + grouped refine.

Tie-break is deterministic everywhere: order by (distance, site_id) —
the DuckDB oracle mirrors it with ``ORDER BY dist, site_id``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .. import cells


def _out_schema(points: DataFrame, point_cols: list[str]) -> StructType:
    fields = [f for f in points.schema.fields if f.name in point_cols]
    return StructType(
        fields
        + [
            StructField("site_id", LongType(), False),
            StructField("rank", LongType(), False),
            StructField("dist", DoubleType(), False),
        ]
    )


def _topk_block(
    px: np.ndarray,
    py: np.ndarray,
    sx: np.ndarray,
    sy: np.ndarray,
    sid: np.ndarray,
    k: int,
):
    """Vectorized brute-force k nearest of each point among (sx, sy).

    Returns (point_row_idx, site_id, rank, dist) arrays; ties broken by
    (dist, site_id).  Distance is squared planar — monotone in true
    distance, so ranks match; ``dist`` returned is the squared value's
    sqrt for human-readable output.
    """
    n, s = len(px), len(sx)
    kk = min(k, s)
    d2 = (px[:, None] - sx[None, :]) ** 2 + (py[:, None] - sy[None, :]) ** 2
    if kk < s:
        part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
    else:
        part = np.broadcast_to(np.arange(s), (n, s)).copy()
    pd2 = np.take_along_axis(d2, part, axis=1)
    psid = sid[part]
    # stable (dist, site_id) ordering inside the k-subset
    order = np.lexsort((psid, pd2))
    rows = np.repeat(np.arange(n), kk)
    ordered = part[np.arange(n)[:, None], order.reshape(n, kk)]
    out_sid = sid[ordered].ravel()
    out_d2 = np.take_along_axis(d2, ordered, axis=1).ravel()
    ranks = np.tile(np.arange(1, kk + 1, dtype=np.int64), n)
    return rows, out_sid, ranks, np.sqrt(out_d2)


def knn_join_broadcast(
    points: DataFrame,
    sites: DataFrame,
    k: int = 1,
    x: str = "lon",
    y: str = "lat",
    point_cols: list[str] | None = None,
    site_id: str = "site_id",
    sx: str = "x",
    sy: str = "y",
) -> DataFrame:
    """Broadcast kNN: each point gets its ``k`` nearest sites.

    Output: ``point_cols + [site_id, rank, dist]`` (rank 1 = nearest;
    planar euclidean distance in degrees, matching the SQL oracle).
    """
    if point_cols is None:
        point_cols = [c for c in points.columns if c not in (x, y)]
    rows = sites.select(site_id, sx, sy).collect()
    arr_id = np.array([r[0] for r in rows], dtype=np.int64)
    arr_x = np.array([r[1] for r in rows], dtype=np.float64)
    arr_y = np.array([r[2] for r in rows], dtype=np.float64)
    bc = points.sparkSession.sparkContext.broadcast((arr_id, arr_x, arr_y))
    schema = _out_schema(points, point_cols)
    src = points.select(*point_cols, x, y).where(
        F.col(x).isNotNull() & F.col(y).isNotNull()
    )

    def probe(batches):
        sid, sxa, sya = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = pdf[x].to_numpy(np.float64)
            py = pdf[y].to_numpy(np.float64)
            rows_, out_sid, ranks, dist = _topk_block(px, py, sxa, sya, sid, k)
            out = pdf.iloc[rows_][point_cols].reset_index(drop=True)
            out["site_id"] = out_sid
            out["rank"] = ranks
            out["dist"] = dist
            yield out

    return src.mapInPandas(probe, schema=schema)


# ---------------------------------------------------------------------------
# Distributed path: cell-bucketed ring expansion (both sides large)
# ---------------------------------------------------------------------------


class SiteGrid:
    """Cell-bucketed site index for ring-expansion kNN (picklable).

    Sites are bucketed at a single resolution; a query expands Chebyshev
    rings of cells around the point's cell until the best-k distances
    are provably final: once ``ring_lb(r) > kth_best`` no farther ring
    can improve the answer (cells are axis-aligned squares, so the
    lower bound for ring r is ``(r-1) * min(cell_w, cell_h)``).
    """

    def __init__(self, rows, res: int = 6):
        self.res = res
        sid = np.array([r[0] for r in rows], dtype=np.int64)
        sx = np.array([r[1] for r in rows], dtype=np.float64)
        sy = np.array([r[2] for r in rows], dtype=np.float64)
        cell = cells.latlon_to_cell(sy, sx, res)
        order = np.argsort(cell, kind="stable")
        self.sid, self.sx, self.sy = sid[order], sx[order], sy[order]
        c = cell[order]
        uniq, starts = np.unique(c, return_index=True)
        self.buckets = {
            int(u): (int(s), int(e))
            for u, s, e in zip(uniq, starts, np.append(starts[1:], len(c)))
        }
        n = 1 << res
        self.cell_w = 360.0 / n
        self.cell_h = 180.0 / n
        self.max_ring = n  # expansion cap (then everything was seen)

    def query(self, px: float, py: float, k: int):
        """k nearest sites of one point → (site_ids, dists) sorted."""
        cell = int(cells.latlon_to_cell(np.array([py]), np.array([px]), self.res)[0])
        best: list[tuple[float, int]] = []
        lb_unit = min(self.cell_w, self.cell_h)
        r = 0
        while r <= self.max_ring:
            if len(best) >= k and (r - 1) * lb_unit > best[k - 1][0]:
                break
            shell = (
                cells.ring_shell(cell, r) if r > 0 else np.array([cell], np.int64)
            )
            for c in shell.tolist():
                span = self.buckets.get(int(c))
                if span is None:
                    continue
                s, e = span
                d = np.sqrt(
                    (self.sx[s:e] - px) ** 2 + (self.sy[s:e] - py) ** 2
                )
                for di, ii in zip(d, range(s, e)):
                    best.append((float(di), int(self.sid[ii])))
            best.sort()
            best = best[: max(k, len(best) if len(best) < k else k)]
            r += 1
        top = best[:k]
        return [b[1] for b in top], [b[0] for b in top]


def knn_join_cells(
    points: DataFrame,
    sites: DataFrame,
    k: int = 1,
    res: int = 6,
    x: str = "lon",
    y: str = "lat",
    point_cols: list[str] | None = None,
    site_id: str = "site_id",
    sx: str = "x",
    sy: str = "y",
) -> DataFrame:
    """Ring-expansion kNN with a per-executor cell-bucketed site grid.

    Still ships the site table via broadcast (the grid build is once
    per executor); for a truly unbroadcastable site side the same
    SiteGrid logic runs per cell-group after a cell equi-join — wire
    that variant when a use case needs it.
    """
    if point_cols is None:
        point_cols = [c for c in points.columns if c not in (x, y)]
    rows = [(r[0], r[1], r[2]) for r in sites.select(site_id, sx, sy).collect()]
    bc = points.sparkSession.sparkContext.broadcast((rows, res))
    schema = _out_schema(points, point_cols)
    src = points.select(*point_cols, x, y).where(
        F.col(x).isNotNull() & F.col(y).isNotNull()
    )

    def probe(batches):
        grid = SiteGrid(*bc.value[:1], res=bc.value[1])
        for pdf in batches:
            px = pdf[x].to_numpy(np.float64)
            py = pdf[y].to_numpy(np.float64)
            recs = []
            for i in range(len(pdf)):
                ids, ds = grid.query(float(px[i]), float(py[i]), k)
                for rk, (si, di) in enumerate(zip(ids, ds), 1):
                    recs.append((i, si, rk, di))
            if not recs:
                continue
            arr = np.array(recs, dtype=object)
            out = pdf.iloc[[int(t[0]) for t in recs]][point_cols].reset_index(
                drop=True
            )
            out["site_id"] = np.array([t[1] for t in recs], np.int64)
            out["rank"] = np.array([t[2] for t in recs], np.int64)
            out["dist"] = np.array([t[3] for t in recs], np.float64)
            del arr
            yield out

    return src.mapInPandas(probe, schema=schema)
