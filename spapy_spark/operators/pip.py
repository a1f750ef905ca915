"""Point-in-polygon join — the engine's flagship operator.

Reference semantics: SpaPy answers containment via its O(N·M)
nested-loop overlay (/root/reference/SpaVectors.py:939-983, kernel
:901-937).  Output rows here match that brute force exactly (tests
compare against a reimplemented nested loop) but execute as a proper
distributed join:

- **broadcast path** (`pip_join_broadcast`): the polygon layer is small
  (zones).  It is decoded once per executor into a :class:`ZoneIndex`
  (cell-bucketed, the STRtree role) and probed from ``mapInPandas`` —
  no shuffle of the document side at all.  This is the plan the north
  rule wants at 10^12 docs × O(10^5) zones.
- **cell-join path** (`pip_join_cells`): both sides large.  Zones
  explode to their covering cells, points encode their cell, Catalyst
  hash-joins on the integer cell id, then candidates are refined with
  the vectorized ray cast.  Optional salting spreads hot cells
  (Zipf-city skew) across ``salt`` buckets.

Exactness: coverings are supersets (no false negatives) and a point has
exactly one cell at a given res, so cell-join candidates contain each
true pair exactly once — no dedup pass needed.  Refinement uses
``covers`` (boundary-inclusive) by default; ``contains`` mirrors GEOS.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .. import cells
from ..geometry import kernels, wkb

_PREDICATES = ("covers", "contains")

# Per-worker-process cache of built ZoneIndex objects.  Python workers
# are reused across tasks (spark.python.worker.reuse), so the index
# build — the dominant per-task cost at high parallelism — happens once
# per executor worker instead of once per task.  Bounded LRU-ish.
_INDEX_CACHE: dict[str, "ZoneIndex"] = {}
_INDEX_CACHE_MAX = 4


def _cached_index(token: str, build) -> "ZoneIndex":
    idx = _INDEX_CACHE.get(token)
    if idx is None:
        idx = build()
        if len(_INDEX_CACHE) >= _INDEX_CACHE_MAX:
            _INDEX_CACHE.pop(next(iter(_INDEX_CACHE)))
        _INDEX_CACHE[token] = idx
    return idx


class ZoneIndex:
    """Cell-bucketed polygon index (the per-executor STRtree substitute).

    Buckets every zone's covering cells at an auto-picked resolution;
    probe = encode points → group by cell → refine only zones bucketed
    in that cell.  Pure numpy, picklable for Spark broadcast.
    """

    def __init__(self, rows, res: int | None = None, max_cells_per_zone: int = 256):
        """``rows``: iterable of (zone_id, wkb_bytes)."""
        self.zone_ids: list[int] = []
        self.parts: list[list[list[np.ndarray]]] = []  # zone → polygon parts → rings
        self.bboxes: list[tuple] = []
        for zid, buf in rows:
            g = wkb.loads(bytes(buf))
            parts = list(wkb.polygons_of(g))
            self.zone_ids.append(int(zid))
            self.parts.append(parts)
            self.bboxes.append(kernels.geom_bounds(g))
        if res is None:
            res = self._auto_res()
        self.res = res
        # flat (cell, zone, full) bucket table per level, sorted by cell —
        # probe is one np.searchsorted per level, no dict lookups.
        # ``full`` marks cells whose square is entirely inside the zone
        # (all 4 corners covered, holes excluded): their candidate points
        # skip the exact refine altogether.
        by_level: dict[int, list[tuple[int, int, bool]]] = {}
        for i, parts in enumerate(self.parts):
            zcells, eff = cells.zone_cover(parts, res, max_cells=max_cells_per_zone)
            if len(zcells) == 0:
                continue
            full = self._full_cells(zcells, parts)
            lev = by_level.setdefault(int(eff), [])
            for c, fl in zip(zcells.tolist(), full.tolist()):
                lev.append((c, i, fl))
        self.levels: list[tuple[int, np.ndarray, np.ndarray, np.ndarray]] = []
        for lev in sorted(by_level):
            ent = by_level[lev]
            bc = np.array([e[0] for e in ent], dtype=np.int64)
            bz = np.array([e[1] for e in ent], dtype=np.int64)
            bf = np.array([e[2] for e in ent], dtype=bool)
            o = np.argsort(bc, kind="stable")
            self.levels.append((lev, bc[o], bz[o], bf[o]))
        self.res_levels = [l[0] for l in self.levels]

    def _full_cells(self, zcells: np.ndarray, parts) -> np.ndarray:
        """Per covering cell: is the whole cell square inside the zone?

        Exact for arbitrary simple rings (corner-in + no-edge-crossing);
        holes void fullness conservatively on bbox overlap.
        """
        lo_x, lo_y, hi_x, hi_y = cells.cell_bounds(zcells)
        full = np.zeros(len(zcells), dtype=bool)
        for rings in parts:
            inside = kernels.rects_fully_inside_ring(
                lo_x, lo_y, hi_x, hi_y, rings[0]
            )
            for h in rings[1:]:
                hx0, hy0 = np.asarray(h).min(axis=0)
                hx1, hy1 = np.asarray(h).max(axis=0)
                overlap = (lo_x <= hx1) & (hi_x >= hx0) & (lo_y <= hy1) & (
                    hi_y >= hy0
                )
                inside &= ~overlap
            full |= inside
        return full

    def _auto_res(self) -> int:
        if not self.bboxes:
            return 8
        ext = np.array(
            [max(b[2] - b[0], b[3] - b[1], 1e-9) for b in self.bboxes]
        )
        med = float(np.median(ext))
        # cell size ≈ median zone extent → a zone covers O(4..9) cells
        res = int(np.clip(np.floor(np.log2(360.0 / med)), 3, 16))
        return res

    def query(self, px: np.ndarray, py: np.ndarray, predicate: str = "covers"):
        """Return (point_idx, zone_id) int64 arrays of all matches.

        Zone-grouped probe: per level, sort points by cell once, locate
        each bucket entry's point span with two ``searchsorted`` calls,
        then refine per *zone* with one vectorized kernel call.  Cells
        flagged full-interior skip the refine entirely.
        """
        if predicate not in _PREDICATES:
            raise ValueError(f"predicate must be one of {_PREDICATES}")
        n = len(px)
        if n == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        out_p: list[np.ndarray] = []
        out_z: list[np.ndarray] = []
        zone_ids = np.array(self.zone_ids, dtype=np.int64)
        for lvl, bcell, bzone, bfull in self.levels:
            pcell = cells.latlon_to_cell(py, px, lvl)
            order = np.argsort(pcell, kind="stable")
            sc = pcell[order]
            lo = np.searchsorted(sc, bcell, side="left")
            hi = np.searchsorted(sc, bcell, side="right")
            nz = hi > lo
            if not nz.any():
                continue
            lo, hi, bz, bf = lo[nz], hi[nz], bzone[nz], bfull[nz]
            # full-interior cells: every point in the span is a hit
            if bf.any():
                spans = [order[l:h] for l, h in zip(lo[bf], hi[bf])]
                zrep = np.repeat(zone_ids[bz[bf]], hi[bf] - lo[bf])
                out_p.append(np.concatenate(spans))
                out_z.append(zrep)
            # boundary cells: group spans by zone, one refine per zone
            eb = ~bf
            if not eb.any():
                continue
            lo_e, hi_e, bz_e = lo[eb], hi[eb], bz[eb]
            zorder = np.argsort(bz_e, kind="stable")
            bz_s = bz_e[zorder]
            zuniq, zstart = np.unique(bz_s, return_index=True)
            zbound = np.append(zstart, len(bz_s))
            for zi_pos, zi in enumerate(zuniq.tolist()):
                ent = zorder[zbound[zi_pos] : zbound[zi_pos + 1]]
                cand = np.concatenate(
                    [order[l:h] for l, h in zip(lo_e[ent], hi_e[ent])]
                )
                cx, cy = px[cand], py[cand]
                hit = np.zeros(len(cand), dtype=bool)
                for rings in self.parts[zi]:
                    hit |= self._refine(cx, cy, rings, predicate)
                if hit.any():
                    out_p.append(cand[hit])
                    out_z.append(np.full(int(hit.sum()), zone_ids[zi], np.int64))
        if not out_p:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(out_p), np.concatenate(out_z)

    @staticmethod
    def _refine(cx, cy, rings, predicate: str) -> np.ndarray:
        """Exact PIP with the boundary-eps pass only where it can matter:
        ``covers`` adds the eps-boundary only for ray-cast misses,
        ``contains`` subtracts it only for ray-cast hits — halves the
        (N×E) distance work on the hot path."""
        inside = kernels.points_in_rings(cx, cy, rings)
        if predicate == "covers":
            miss = ~inside
            if miss.any():
                bx, by = cx[miss], cy[miss]
                onb = np.zeros(len(bx), dtype=bool)
                for r in rings:
                    onb |= kernels.points_on_ring_boundary(bx, by, r, 1e-12)
                inside[miss] = onb
            return inside
        if inside.any():
            bx, by = cx[inside], cy[inside]
            onb = np.zeros(len(bx), dtype=bool)
            for r in rings:
                onb |= kernels.points_on_ring_boundary(bx, by, r, 1e-12)
            keep = inside.copy()
            keep[inside] = ~onb
            return keep
        return inside


def _point_schema(df: DataFrame, point_cols: list[str]) -> StructType:
    fields = [f for f in df.schema.fields if f.name in point_cols]
    return StructType(fields + [StructField("zone_id", LongType(), False)])


def pip_join_broadcast(
    points: DataFrame,
    zones: DataFrame,
    x: str = "lon",
    y: str = "lat",
    point_cols: list[str] | None = None,
    zone_id: str = "zone_id",
    geometry: str = "geometry",
    predicate: str = "covers",
    res: int | None = None,
) -> DataFrame:
    """Broadcast PIP join: tiny polygon side, huge point side, no shuffle.

    Returns ``point_cols + [zone_id]``; a point inside k zones yields k
    rows (overlapping zones allowed, matching the reference's overlay
    which emits one row per matching pair).
    """
    if point_cols is None:
        point_cols = [c for c in points.columns if c not in (x, y)]
    import uuid

    spark = points.sparkSession
    zrows = [(r[zone_id], bytes(r[geometry])) for r in
             zones.select(zone_id, geometry).collect()]
    bc = spark.sparkContext.broadcast((zrows, res))
    token = uuid.uuid4().hex  # cache key: one index per operator call
    schema = _point_schema(points, point_cols)
    src = points.select(*point_cols, x, y).where(
        F.col(x).isNotNull() & F.col(y).isNotNull()
    )

    def probe(batches):
        # mapInArrow: payload columns (urls!) stay in Arrow buffers —
        # the hit gather is a C++ take(), no per-row Python objects.
        import pyarrow as pa

        rows, res_ = bc.value
        idx = _cached_index(token, lambda: ZoneIndex(rows, res=res_))
        for batch in batches:
            px = batch.column(x).to_numpy(zero_copy_only=False)
            py = batch.column(y).to_numpy(zero_copy_only=False)
            pi, zi = idx.query(
                np.ascontiguousarray(px, np.float64),
                np.ascontiguousarray(py, np.float64),
                predicate,
            )
            cols = [batch.column(c).take(pa.array(pi)) for c in point_cols]
            cols.append(pa.array(zi, type=pa.int64()))
            yield pa.RecordBatch.from_arrays(cols, point_cols + ["zone_id"])

    return src.mapInArrow(probe, schema=schema)


def pip_count_by_zone(
    points: DataFrame,
    zones: DataFrame,
    x: str = "lon",
    y: str = "lat",
    zone_id: str = "zone_id",
    geometry: str = "geometry",
    predicate: str = "covers",
    res: int | None = None,
) -> DataFrame:
    """Broadcast PIP with map-side combine: per-zone counts computed
    inside the probe (np.bincount per batch), so only ~|zones| rows per
    task cross the Python→JVM boundary and the shuffle.  This is the
    tile-assignment-count plan for the north rule's throughput metric —
    identical match semantics to :func:`pip_join_broadcast`, minus the
    materialized pair stream nobody aggregates twice.
    """
    import uuid

    import pyarrow as pa

    spark = points.sparkSession
    zrows = [(r[zone_id], bytes(r[geometry])) for r in
             zones.select(zone_id, geometry).collect()]
    bc = spark.sparkContext.broadcast((zrows, res))
    token = uuid.uuid4().hex
    src = points.select(x, y).where(
        F.col(x).isNotNull() & F.col(y).isNotNull()
    )

    def probe(batches):
        rows, res_ = bc.value
        idx = _cached_index(token, lambda: ZoneIndex(rows, res=res_))
        zid_arr = np.array(idx.zone_ids, dtype=np.int64)
        zmax = int(zid_arr.max()) + 1 if len(zid_arr) else 1
        acc = np.zeros(zmax, dtype=np.int64)
        for batch in batches:
            px = np.ascontiguousarray(
                batch.column(x).to_numpy(zero_copy_only=False), np.float64)
            py = np.ascontiguousarray(
                batch.column(y).to_numpy(zero_copy_only=False), np.float64)
            _, zi = idx.query(px, py, predicate)
            if len(zi):
                acc += np.bincount(zi, minlength=zmax)
        nz = np.nonzero(acc)[0]
        yield pa.RecordBatch.from_arrays(
            [pa.array(nz, type=pa.int64()),
             pa.array(acc[nz], type=pa.int64())],
            ["zone_id", "n_partial"],
        )

    partials = src.mapInArrow(probe, schema="zone_id long, n_partial long")
    return partials.groupBy("zone_id").agg(
        F.sum("n_partial").alias("n_docs")
    )


def auto_salt(
    points: DataFrame,
    res: int,
    x: str = "lon",
    y: str = "lat",
    sample_frac: float = 0.05,
    skew_threshold: float = 4.0,
    max_salt: int = 32,
) -> int:
    """Pick the salt factor from a sampled cell histogram (SURVEY §7.3:
    web-data cell histograms are Zipfian; the hot-cities cell dwarfs
    the mean).  salt = hottest-cell share / (skew_threshold × mean
    share), clamped to [1, max_salt] — 1 for uniform data, growing
    with the hot-cell ratio so no reducer sees more than ~threshold×
    the average key load."""
    sampled = points.sample(fraction=sample_frac, seed=7).where(
        F.col(x).isNotNull() & F.col(y).isNotNull()
    )
    enc = cell_encode(sampled, res, y=y, x=x)
    hist = enc.groupBy("cell").count()
    row = hist.agg(
        F.max("count").alias("mx"), F.avg("count").alias("avg")
    ).collect()[0]
    if row["mx"] is None or not row["avg"]:
        return 1
    ratio = float(row["mx"]) / float(row["avg"])
    return int(np.clip(np.ceil(ratio / skew_threshold), 1, max_salt))


# ---------------------------------------------------------------------------
# Distributed cell-join path (both sides large)
# ---------------------------------------------------------------------------


def zone_cell_covering(
    zones: DataFrame,
    res: int,
    zone_id: str = "zone_id",
    geometry: str = "geometry",
    max_cells: int = 4096,
) -> DataFrame:
    """Explode each zone to its covering cells: (cell, zone_id, geometry).

    Runs distributed (mapInPandas) — the polygon side may be huge.
    """
    schema = StructType(
        [StructField("cell", LongType(), False)]
        + [f for f in zones.schema.fields if f.name in (zone_id, geometry)]
    )

    def cover(batches):
        from .overlay import decode_aa_rects

        for pdf in batches:
            zvals = pdf[zone_id].to_numpy()
            gvals = pdf[geometry].to_numpy()
            frames = []
            # whole-batch fast path: axis-aligned rectangles cover
            # exactly their bbox cells (every bbox cell intersects the
            # rect), so the per-feature zone_cover loop reduces to
            # vectorized quantize + repeat/arange cell generation —
            # cell-for-cell identical to zone_cover's output.
            rok, rects = decode_aa_rects(gvals)
            slow_idx = np.nonzero(~rok)[0]
            if rok.any():
                r = rects[rok]
                ridx = np.nonzero(rok)[0]
                c_cells, c_rid = _rect_cover_batch(r, res, max_cells)
                frames.append(pd.DataFrame({
                    "cell": c_cells,
                    zone_id: zvals[ridx[c_rid]],
                    geometry: gvals[ridx[c_rid]],
                }))
            if len(slow_idx):
                cs, zs, gs = [], [], []
                for i in slow_idx:
                    g = wkb.loads(bytes(gvals[i]))
                    zcells, _eff = cells.zone_cover(
                        list(wkb.polygons_of(g)), res, max_cells=max_cells
                    )
                    cs.extend(zcells.tolist())
                    zs.extend([zvals[i]] * len(zcells))
                    gs.extend([gvals[i]] * len(zcells))
                frames.append(pd.DataFrame({
                    "cell": np.array(cs, np.int64), zone_id: zs,
                    geometry: gs,
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return zones.select(zone_id, geometry).mapInPandas(cover, schema=schema)


def _rect_cover_batch(
    r: np.ndarray, res: int, max_cells: int
) -> tuple[np.ndarray, np.ndarray]:
    """Covering cells for (n, 4) [minx,miny,maxx,maxy] rectangles.

    Replicates cells.zone_cover bit-for-bit on rectangle inputs: the
    same adaptive effective res (coarsen until the bbox estimate fits
    ``max_cells``), the same quantize/clamp math, the same cell ids —
    just with the per-feature Python loop replaced by one repeat/arange
    pass.  Returns (cells, rect_index) aligned arrays.
    """
    n_r = len(r)
    # adaptive effective res, vectorized over rects (mirrors
    # cells.cover_bbox_adaptive's loop)
    eff = np.zeros(n_r, dtype=np.int64)
    dlon = r[:, 2] - r[:, 0]
    dlat = r[:, 3] - r[:, 1]
    for rr in range(res, 0, -1):
        ncand = 1 << rr
        w = dlon / (360.0 / ncand) + 2
        h = dlat / (180.0 / ncand) + 2
        eff = np.where((eff == 0) & (w * h <= max_cells), rr, eff)
    # quantize both corners at each rect's eff (grouped by eff so the
    # scalar-res encode path is reused verbatim)
    out_cells, out_rid = [], []
    for rr in np.unique(eff):
        m = np.nonzero(eff == rr)[0]
        rs = int(rr)
        nn = 1 << rs
        ix0, iy0 = cells.latlon_to_ij(r[m, 1], r[m, 0], rs)
        ix1, iy1 = cells.latlon_to_ij(r[m, 3], r[m, 2], rs)
        ix1 = np.minimum(np.maximum(ix1, ix0), nn - 1)
        iy1 = np.minimum(np.maximum(iy1, iy0), nn - 1)
        w = ix1 - ix0 + 1
        h = iy1 - iy0 + 1
        cnt = w * h
        rid = np.repeat(np.arange(len(m)), cnt)
        offs = np.repeat(np.concatenate([[0], np.cumsum(cnt)])[:-1], cnt)
        k = np.arange(int(cnt.sum()), dtype=np.int64) - offs
        ix = ix0[rid] + k // h[rid]
        iy = iy0[rid] + k % h[rid]
        out_cells.append(cells.ij_to_cell(ix, iy, rs))
        out_rid.append(m[rid])
    if not out_cells:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_cells), np.concatenate(out_rid)


def pip_join_cells(
    points: DataFrame,
    zones: DataFrame,
    res: int = 8,
    x: str = "lon",
    y: str = "lat",
    point_cols: list[str] | None = None,
    zone_id: str = "zone_id",
    geometry: str = "geometry",
    predicate: str = "covers",
    salt: int = 1,
) -> DataFrame:
    """Cell-prefix hash join + exact ray-cast refine (both sides large).

    ``salt`` > 1 replicates each zone-cell row ``salt`` ways and spreads
    points across the replicas on a deterministic hash — the hot-cell
    (Zipf city) mitigation of the north rule.  Results are invariant to
    ``salt`` (tested).
    """
    if point_cols is None:
        point_cols = [c for c in points.columns if c not in (x, y)]
    # cache: the covering feeds both the level-collect and the join —
    # without it the polyfill UDF runs twice end-to-end
    zc = zone_cell_covering(zones, res, zone_id, geometry).cache()
    # distinct covering resolutions actually present (giant zones coarsen);
    # tiny collect on the small aggregated set — drives the prefix walk
    levels = sorted(
        r["r"]
        for r in zc.select(
            F.shiftright(F.col("cell"), 56).alias("r")
        ).distinct().collect()
    )
    pc = points.where(F.col(x).isNotNull() & F.col(y).isNotNull()).select(
        *point_cols, x, y
    )
    # each point emits its ancestor cell at every zone res level — the
    # cell-prefix join (a point has exactly one ancestor per level, so
    # candidate pairs stay unique)
    pc = pc.withColumn(
        "cell", F.explode(_ancestor_cells_udf(levels)(F.col(y), F.col(x)))
    )
    if salt > 1:
        zc = zc.withColumn(
            "__s", F.explode(F.array([F.lit(i) for i in range(salt)]))
        )
        pc = pc.withColumn(
            "__s", F.pmod(F.xxhash64(*[F.col(c) for c in point_cols]), F.lit(salt))
        ).withColumn("__s", F.col("__s").cast("int"))
        joined = pc.join(zc, ["cell", "__s"], "inner").drop("__s")
    else:
        joined = pc.join(zc, "cell", "inner")

    schema = _point_schema(points, point_cols)
    refine = (
        kernels.points_covered_by
        if predicate == "covers"
        else kernels.points_contained
    )

    def exact(batches):
        # mapInArrow: payload columns stay in Arrow buffers; zone WKB
        # decodes once per distinct geometry per worker (cache)
        import pyarrow as pa

        cache: dict[bytes, list] = {}
        for batch in batches:
            if batch.num_rows == 0:
                continue
            px = np.ascontiguousarray(
                batch.column(x).to_numpy(zero_copy_only=False), np.float64)
            py = np.ascontiguousarray(
                batch.column(y).to_numpy(zero_copy_only=False), np.float64)
            genc = pa.compute.dictionary_encode(batch.column(geometry))
            codes = genc.indices.to_numpy(zero_copy_only=False)
            hit = np.zeros(batch.num_rows, dtype=bool)
            for gi, buf in enumerate(genc.dictionary):
                key = buf.as_py()
                parts = cache.get(key)
                if parts is None:
                    parts = list(wkb.polygons_of(wkb.loads(key)))
                    if len(cache) > 4096:
                        cache.clear()
                    cache[key] = parts
                m = codes == gi
                sub = np.zeros(int(m.sum()), dtype=bool)
                for rings in parts:
                    sub |= refine(px[m], py[m], rings)
                hit[m] = sub
            idx = pa.array(np.nonzero(hit)[0])
            cols = [batch.column(c).take(idx) for c in point_cols]
            cols.append(batch.column(zone_id).take(idx).cast(pa.int64()))
            yield pa.RecordBatch.from_arrays(cols, point_cols + ["zone_id"])

    return joined.mapInArrow(exact, schema=schema)


def _cell_encode_udf(res: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            cells.latlon_to_cell(lat.to_numpy(np.float64), lon.to_numpy(np.float64), res)
        )

    return enc


def _ancestor_cells_udf(levels: list[int]):
    """UDF: per point, its cell id at each res in ``levels``."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(LongType()))
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(np.float64)
        lo = lon.to_numpy(np.float64)
        cols = [cells.latlon_to_cell(la, lo, r) for r in levels]
        stacked = np.column_stack(cols) if cols else np.empty((len(la), 0), np.int64)
        return pd.Series(list(stacked))

    return enc


def cell_encode(df: DataFrame, res: int, y: str = "lat", x: str = "lon",
                out: str = "cell") -> DataFrame:
    """Attach the res-``res`` cell id column (Arrow-batched UDF)."""
    return df.withColumn(out, _cell_encode_udf(res)(F.col(y), F.col(x)))
