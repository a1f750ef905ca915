"""From-scratch S2 cell index: cube-face + quadratic-ST + Hilbert curve.

The north rule names "batch-encode H3/S2 cells" explicitly; cells.py
carries the Z-order (Morton) tiling the join planner uses, this module
adds the genuine S2 construction (public algorithm: the S2 geometry
library's documented cell decomposition) as a second, curve-continuous
tiling — Hilbert locality beats Morton's quadrant jumps for range
scans, at the price of a state machine in the encoder.

Pipeline (all vectorized numpy, run inside Arrow-batched pandas UDFs —
zero per-row Python, no shuffle):

1. lat/lng → unit-sphere xyz (or take xyz directly — the cell only
   depends on the DIRECTION, so unnormalized vectors work and the
   oracle path can feed exact rationals with no trig at all);
2. face = axis of largest |component| (ties broken x ≥ y ≥ z), with
   (u, v) the gnomonic ratios of the two remaining components;
3. quadratic area-equalizing transform s = ½√(1+3u) (u ≥ 0) /
   1 − ½√(1−3u) (u < 0) — division, sqrt, and floor are exactly
   rounded IEEE ops, so engines agree bit-for-bit;
4. (i, j) = ⌊s·2^L⌋ clamped, then the Hilbert position via the
   classic 4-state curve automaton (tables derived below), MSB-first.

Cell key layout: ``fpos = face · 4^L + pos`` at a fixed level L.  Like
the Morton cells, a parent is an integer prefix: ``parent = fpos >>
2·(L−P)`` — the cell-prefix hash-join algebra carries over unchanged.
``canonical_id`` converts to the standard 64-bit S2CellId layout
(3 face bits · 2L position bits · trailing 1).

Reference parity: the reference has no spatial index at all — it
nested-loops feature pairs (/root/reference/SpaVectors.py:964-983);
this is north-rule scale machinery, not a port.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MAX_LEVEL = 30

# ---------------------------------------------------------------------------
# Hilbert curve automaton.
#
# Derivation: the level-1 curve in orientation 0 visits quadrants in the
# order (i,j) = (0,0) (0,1) (1,1) (1,0).  Sub-quadrant orientations are
# the standard Hilbert recursion: first child swaps axes, middle two keep
# the parent frame, last child swaps and inverts.  Encoding orientation
# as 2 bits (bit0 = swap i/j, bit1 = invert both), the four orientations
# give the tables below; the S2 library documents the same automaton.
# ---------------------------------------------------------------------------

_POS_TO_IJ = (
    (0, 1, 3, 2),  # orientation 0: canonical order
    (0, 2, 3, 1),  # orientation 1: axes swapped
    (3, 2, 0, 1),  # orientation 2: bits inverted
    (3, 1, 0, 2),  # orientation 3: swapped + inverted
)
# orientation delta applied entering child `pos`: swap, none, none,
# swap+invert
_POS_TO_ORIENT = (1, 0, 0, 3)

# inverse: ij -> pos per orientation
_IJ_TO_POS = tuple(
    tuple(row.index(ij) for ij in range(4)) for row in _POS_TO_IJ
)

# Flattened 16-entry tables packed 2 bits per entry into one integer so
# the lookup is a shift+mask — the same form the DuckDB oracle uses.
POS_PACKED = sum(
    _IJ_TO_POS[r][ij] << (2 * (r * 4 + ij)) for r in range(4) for ij in range(4)
)
NEXTR_PACKED = sum(
    (r ^ _POS_TO_ORIENT[_IJ_TO_POS[r][ij]]) << (2 * (r * 4 + ij))
    for r in range(4)
    for ij in range(4)
)


def hilbert_pos(face, i, j, level: int) -> np.ndarray:
    """Vectorized (face, i, j) → Hilbert position at ``level``.

    MSB-first walk of the automaton; initial orientation = face & 1
    (odd faces start axis-swapped so the curve is continuous across
    face edges in the canonical S2 face ordering).
    """
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    r = face & np.uint64(1)
    pos = np.zeros_like(i)
    posc = np.uint64(POS_PACKED)
    nxtc = np.uint64(NEXTR_PACKED)
    for k in range(level - 1, -1, -1):
        kk = np.uint64(k)
        ij = (((i >> kk) & np.uint64(1)) << np.uint64(1)) | (
            (j >> kk) & np.uint64(1)
        )
        idx = ((r << np.uint64(2)) | ij) << np.uint64(1)
        pos = (pos << np.uint64(2)) | ((posc >> idx) & np.uint64(3))
        r = (nxtc >> idx) & np.uint64(3)
    return pos


def hilbert_ij(face, pos, level: int):
    """Inverse walk: Hilbert position → (i, j) at ``level``."""
    face = np.asarray(face, dtype=np.uint64)
    pos = np.asarray(pos, dtype=np.uint64)
    r = face & np.uint64(1)
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    ij_packed = sum(
        _POS_TO_IJ[rr][p] << (2 * (rr * 4 + p))
        for rr in range(4)
        for p in range(4)
    )
    orient_packed = sum(_POS_TO_ORIENT[p] << (2 * p) for p in range(4))
    ijc = np.uint64(ij_packed)
    orc = np.uint64(orient_packed)
    for k in range(level - 1, -1, -1):
        p = (pos >> np.uint64(2 * k)) & np.uint64(3)
        idx = ((r << np.uint64(2)) | p) << np.uint64(1)
        ij = (ijc >> idx) & np.uint64(3)
        i = (i << np.uint64(1)) | (ij >> np.uint64(1))
        j = (j << np.uint64(1)) | (ij & np.uint64(1))
        r = r ^ ((orc >> (p << np.uint64(1))) & np.uint64(3))
    return i.astype(np.int64), j.astype(np.int64)


# ---------------------------------------------------------------------------
# Sphere → face/uv/st/ij
# ---------------------------------------------------------------------------


def xyz_to_face_uv(x, y, z):
    """Direction vector → (face 0..5, u, v).  Unnormalized input is
    fine (only ratios are used).  Tie-break order x ≥ y ≥ z matches the
    SQL oracle's CASE chain exactly."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    x_wins = (ax >= ay) & (ax >= az)
    y_wins = ~x_wins & (ay >= az)
    z_wins = ~x_wins & ~y_wins
    face = np.where(
        x_wins,
        np.where(x >= 0, 0, 3),
        np.where(y_wins, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    # zero vector → face 0 center (guarded, not meaningful)
    bad = (ax == 0) & (ay == 0) & (az == 0)
    u = np.where(bad, 0.0, u)
    v = np.where(bad, 0.0, v)
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic area-equalizing transform (S2's kQuadraticProjection)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # unselected branch of the where
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def st_to_ij(s: np.ndarray, level: int) -> np.ndarray:
    n = 1 << level
    i = np.floor(np.asarray(s, dtype=np.float64) * float(n)).astype(np.int64)
    return np.clip(i, 0, n - 1)


def latlng_to_xyz(lat, lng):
    """Degrees → unit-sphere direction."""
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lng = np.radians(np.asarray(lng, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)


# ---------------------------------------------------------------------------
# Cell ids
# ---------------------------------------------------------------------------


def cell_from_xyz(x, y, z, level: int) -> np.ndarray:
    """Direction vectors → fpos cell ids (face·4^L + Hilbert pos)."""
    if not 1 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [1, {MAX_LEVEL}], got {level}")
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u), level)
    j = st_to_ij(uv_to_st(v), level)
    pos = hilbert_pos(face, i, j, level)
    return (np.asarray(face, dtype=np.uint64) << np.uint64(2 * level) | pos).astype(
        np.int64
    )


def cell_from_latlng(lat, lng, level: int) -> np.ndarray:
    x, y, z = latlng_to_xyz(lat, lng)
    return cell_from_xyz(x, y, z, level)


def cell_parent(cell, level: int, parent_level: int) -> np.ndarray:
    """Prefix truncation — same algebra as cells.cell_to_parent."""
    if parent_level > level:
        raise ValueError("parent_level must be <= level")
    c = np.asarray(cell, dtype=np.int64)
    return c >> (2 * (level - parent_level))


def canonical_id(cell, level: int) -> np.ndarray:
    """fpos → standard 64-bit S2CellId bit layout (as wrapped int64):
    face in the top 3 bits, position left-aligned in the next 60,
    trailing 1 marking the level."""
    c = np.asarray(cell, dtype=np.uint64)
    face = c >> np.uint64(2 * level)
    pos = c & ((np.uint64(1) << np.uint64(2 * level)) - np.uint64(1))
    lsb_shift = np.uint64(2 * (MAX_LEVEL - level))
    out = (
        (face << np.uint64(61))
        | (pos << (lsb_shift + np.uint64(1)))
        | (np.uint64(1) << lsb_shift)
    )
    return out.view(np.int64) if out.shape else np.int64(out)


def token(cell, level: int):
    """S2 debug-string form "face/base4-digits" per cell."""
    c = np.asarray(cell, dtype=np.uint64)
    face = (c >> np.uint64(2 * level)).astype(np.int64)
    pos = c & ((np.uint64(1) << np.uint64(2 * level)) - np.uint64(1))
    out = []
    for f, p in zip(face.tolist(), pos.tolist()):
        digits = "".join(
            str((p >> (2 * (level - 1 - k))) & 3) for k in range(level)
        )
        out.append(f"{f}/{digits}")
    return out


# ---------------------------------------------------------------------------
# Spark wrappers (Arrow-batched pandas UDFs)
# ---------------------------------------------------------------------------


def s2_encode(df, y: str = "lat", x: str = "lon", level: int = 12,
              out: str = "s2_cell"):
    """Add an fpos S2 cell column from lat/lng degrees.  One Arrow
    batch → one numpy pass; no shuffle, no per-row Python."""
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def enc(lat: pd.Series, lng: pd.Series) -> pd.Series:
        return pd.Series(
            cell_from_latlng(lat.to_numpy(), lng.to_numpy(), level)
        )

    return df.withColumn(out, enc(F.col(y), F.col(x)))


def s2_encode_xyz(df, x: str = "x", y: str = "y", z: str = "z",
                  level: int = 12, out: str = "s2_cell"):
    """Add an fpos S2 cell column from (possibly unnormalized)
    direction vectors — the trig-free path the oracle twin replays."""
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def enc(xs: pd.Series, ys: pd.Series, zs: pd.Series) -> pd.Series:
        return pd.Series(
            cell_from_xyz(
                xs.to_numpy(), ys.to_numpy(), zs.to_numpy(), level
            )
        )

    return df.withColumn(out, enc(F.col(x), F.col(y), F.col(z)))


__all__ = [
    "MAX_LEVEL",
    "POS_PACKED",
    "NEXTR_PACKED",
    "hilbert_pos",
    "hilbert_ij",
    "xyz_to_face_uv",
    "uv_to_st",
    "st_to_ij",
    "latlng_to_xyz",
    "cell_from_xyz",
    "cell_from_latlng",
    "cell_parent",
    "canonical_id",
    "token",
    "s2_encode",
    "s2_encode_xyz",
]
