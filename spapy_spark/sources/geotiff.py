"""From-scratch GeoTIFF I/O (no GDAL) — reference raster Load/Save
(/root/reference/SpaRasters.py:687-752) re-expressed for the tile-table
engine.

Scope (documented): classic TIFF and BigTIFF, uncompressed
(Compression=1), LZW (5 — from-scratch TIFF §13 codec,
sources/tiff_lzw.py), Deflate (8/32946, stdlib zlib) or PackBits
(32773, sources/packbits.py) with optional Predictor=2, single- or
multi-band (chunky or planar), strip- OR tile-organized,
8/16/32/64-bit unsigned/signed/float samples, little- or big-endian.
Georeferencing from ModelPixelScaleTag + ModelTiepointTag (GeoTIFF
§2.6.1); nodata from the GDAL_NODATA ASCII tag.  Other compression
schemes (JPEG-in-TIFF) raise with a clear message.

Scale design: the driver parses only the IFD (a few KB); pixel data is
read on EXECUTORS as byte-range slices — one task per engine tile row,
each task seeking directly to its rows (uncompressed strips are
row-addressable: offset(r) = strip_offset + (r − strip_row0)·row_bytes).
A 100 GB GeoTIFF therefore scans fully parallel with no driver
materialization and no shuffle; the output is the engine's standard
(raster_id, band, tile_y, tile_x, …, pixels) table feeding map
algebra / terrain / sampling unchanged.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from . import packbits, tiff_lzw

# TIFF tag ids
_W, _H = 256, 257
_BITS, _COMP, _PHOTO = 258, 259, 262
_SOFF, _SPP, _RPS, _SCNT = 273, 277, 278, 279
_PLANAR = 284
_TILE_W, _TILE_H, _TOFF, _TCNT = 322, 323, 324, 325
_SFMT = 339
_MODEL_SCALE, _MODEL_TIE = 33550, 33922
_GDAL_NODATA = 42113
_JPEGTABLES = 347  # TIFF TechNote 2: shared abbreviated-JPEG tables

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q", 18: "Q"}


@dataclass
class TiffInfo:
    width: int
    height: int
    bits: int = 8
    sample_format: int = 1  # 1 uint, 2 int, 3 float
    endian: str = "<"
    compression: int = 1
    samples_per_pixel: int = 1
    planar: int = 1  # 1 chunky (interleaved), 2 planar (band-sequential)
    predictor: int = 1  # 1 none, 2 horizontal differencing
    rows_per_strip: int = 0
    strip_offsets: list = field(default_factory=list)
    strip_byte_counts: list = field(default_factory=list)
    tile_width: int = 0
    tile_height: int = 0
    tile_offsets: list = field(default_factory=list)
    tile_byte_counts: list = field(default_factory=list)
    nodata: float | None = None
    geotransform: tuple | None = None
    jpeg_tables: bytes | None = None

    @property
    def dtype(self) -> np.dtype:
        if self.sample_format == 6:  # COMPLEXIEEEFP: CFloat32/CFloat64
            return np.dtype(f"{self.endian}c{self.bits // 8}")
        if self.compression == 7 and self.bits == 12:
            # 12-bit JPEG strips decode to uint16 samples
            return np.dtype(f"{self.endian}u2")
        kind = {1: "u", 2: "i", 3: "f"}[self.sample_format]
        return np.dtype(f"{self.endian}{kind}{self.bits // 8}")

    @property
    def tiled(self) -> bool:
        return self.tile_width > 0


def _read_ifd_entries(f, endian: str, off: int, big: bool = False):
    """Seek-based IFD parse — touches only the IFD block and each
    entry's external value area (a 100 GB file costs a few KB of
    reads wherever its IFD lives).  ``big=True`` parses a BigTIFF
    (magic 43) IFD: 8-byte entry count, 20-byte entries, 8-byte
    inline value area and offsets — the layout GDAL emits for any
    raster past the classic 4 GB ceiling."""
    f.seek(off)
    if big:
        (n,) = struct.unpack(endian + "Q", f.read(8))
        esz, inline, ofmt = 20, 8, "Q"
    else:
        (n,) = struct.unpack(endian + "H", f.read(2))
        esz, inline, ofmt = 12, 4, "I"
    block = f.read(esz * n + (8 if big else 4))
    out = {}
    for i in range(n):
        tag, typ = struct.unpack_from(endian + "HH", block, esz * i)
        (cnt,) = struct.unpack_from(endian + ofmt, block, esz * i + 4)
        voff = esz * i + (12 if big else 8)
        val_raw = block[voff : voff + inline]
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size > inline:
            (data_off,) = struct.unpack_from(endian + ofmt, val_raw)
            f.seek(data_off)
            raw = f.read(size)
        else:
            raw = val_raw[:size]
        if typ == 2:  # ASCII
            out[tag] = raw.split(b"\0")[0].decode("ascii", "replace")
        elif typ == 5:  # RATIONAL
            vals = struct.unpack(endian + "I" * (2 * cnt), raw)
            out[tag] = [vals[2 * j] / max(vals[2 * j + 1], 1)
                        for j in range(cnt)]
        elif typ in _TYPE_FMT:
            out[tag] = list(struct.unpack(endian + _TYPE_FMT[typ] * cnt, raw))
        else:
            out[tag] = raw
    return out


def read_info(path: str) -> TiffInfo:
    """Parse header + first IFD (+ GeoTIFF/GDAL tags) — driver-cheap:
    reads at most a few hundred KB regardless of raster size."""
    with open(path, "rb") as f:
        head = f.read(8)
        if head[:2] == b"II":
            endian = "<"
        elif head[:2] == b"MM":
            endian = ">"
        else:
            raise ValueError(f"not a TIFF file: {path!r}")
        (magic,) = struct.unpack_from(endian + "H", head, 2)
        if magic == 43:  # BigTIFF: 8-byte offsets everywhere
            head += f.read(8)
            (osz, pad) = struct.unpack_from(endian + "HH", head, 4)
            if osz != 8 or pad != 0:
                raise ValueError(f"bad BigTIFF header ({osz}, {pad})")
            (ifd_off,) = struct.unpack_from(endian + "Q", head, 8)
            tags = _read_ifd_entries(f, endian, ifd_off, big=True)
        elif magic == 42:
            (ifd_off,) = struct.unpack_from(endian + "I", head, 4)
            tags = _read_ifd_entries(f, endian, ifd_off)
        else:
            raise ValueError(f"bad TIFF magic {magic}")

    def one(tag, default=None):
        v = tags.get(tag, default)
        return v[0] if isinstance(v, list) else v

    info = TiffInfo(
        width=int(one(_W)), height=int(one(_H)),
        bits=int(one(_BITS, 8)), sample_format=int(one(_SFMT, 1)),
        endian=endian, compression=int(one(_COMP, 1)),
        samples_per_pixel=int(one(_SPP, 1)),
        planar=int(one(_PLANAR, 1)), predictor=int(one(317, 1)),
    )
    if info.compression not in (1, 5, 7, 8, 32946, 32773):
        raise NotImplementedError(
            f"Compression={info.compression} not supported — only "
            "uncompressed (1), LZW (5), JPEG (7, TechNote 2), "
            "Deflate (8/32946) and PackBits (32773)"
        )
    if info.compression == 7:
        if info.bits not in (8, 12):
            raise NotImplementedError(
                "TIFF-JPEG needs 8- or 12-bit samples"
            )
        if info.planar != 1:
            raise NotImplementedError("TIFF-JPEG needs chunky planar")
        jt = tags.get(_JPEGTABLES)
        if jt is not None:
            info.jpeg_tables = bytes(jt)  # type 7 raw or type-1 ints
    if info.predictor not in (1, 2):
        raise NotImplementedError(f"TIFF Predictor={info.predictor}")
    if info.predictor == 2 and info.sample_format in (3, 6):
        raise NotImplementedError("Predictor=2 on float samples")
    if info.samples_per_pixel > 1:
        bl = tags.get(_BITS, [8])
        if isinstance(bl, list) and len(set(bl)) > 1:
            raise NotImplementedError(f"mixed BitsPerSample {bl}")
        if info.planar not in (1, 2):
            raise NotImplementedError(f"PlanarConfiguration={info.planar}")
    if info.sample_format == 6:
        # complex IEEE (CFloat32 = 64 bits, CFloat64 = 128 bits —
        # reference dtype table /root/reference/SpaRasters.py:678)
        if info.bits not in (64, 128):
            raise NotImplementedError(
                f"complex BitsPerSample={info.bits}"
            )
    elif info.bits == 12 and info.compression == 7:
        pass  # 12-bit JPEG strips decode to uint16
    elif info.bits not in (8, 16, 32, 64):
        raise NotImplementedError(f"BitsPerSample={info.bits}")
    if _TILE_W in tags:
        info.tile_width = int(one(_TILE_W))
        info.tile_height = int(one(_TILE_H))
        info.tile_offsets = [int(v) for v in tags[_TOFF]]
        info.tile_byte_counts = [int(v) for v in tags.get(_TCNT, [])]
    else:
        info.rows_per_strip = int(one(_RPS, info.height))
        info.strip_offsets = [int(v) for v in tags[_SOFF]]
        info.strip_byte_counts = [int(v) for v in tags.get(_SCNT, [])]
    if _GDAL_NODATA in tags:
        try:
            info.nodata = float(str(tags[_GDAL_NODATA]).strip())
        except ValueError:
            pass
    if _MODEL_SCALE in tags and _MODEL_TIE in tags:
        sx, sy = tags[_MODEL_SCALE][0], tags[_MODEL_SCALE][1]
        i, j, _k, x, y, _z = tags[_MODEL_TIE][:6]
        # tiepoint (i,j)->(x,y): origin = raster (0,0) in model space
        info.geotransform = (
            float(x - i * sx), float(sx), 0.0,
            float(y + j * sy), 0.0, float(-sy),
        )
    return info


def _unpredict(a: np.ndarray, spp: int) -> np.ndarray:
    """Undo Predictor=2 horizontal differencing: cumulative sum along
    x, per band channel, modular in the sample's own integer width
    (TIFF 6.0 §14 — each row restarts, so row-sliced reads stay
    independent)."""
    v = a.reshape(a.shape[0], -1, spp)
    return np.cumsum(v, axis=1, dtype=v.dtype).reshape(a.shape)


def _jpeg_merge(payload: bytes, tables: bytes | None) -> bytes:
    """TIFF TechNote 2 table merge: JPEGTables is an abbreviated
    stream (SOI…EOI) whose DQT/DHT segments prefix each strip/tile's
    abbreviated stream.  Strips that are full interchange JPEGs pass
    through unchanged."""
    if tables and len(tables) >= 4 and payload[:2] == b"\xff\xd8":
        t = bytes(tables)
        if t[:2] == b"\xff\xd8":
            t = t[2:]
        if t[-2:] == b"\xff\xd9":
            t = t[:-2]
        return b"\xff\xd8" + t + payload[2:]
    return payload


def _jpeg_chunk_bytes(comp: bytes, info: TiffInfo) -> bytes:
    """One JPEG strip/tile → raw interleaved sample bytes."""
    from . import jpeg as _jpeg

    img = _jpeg.decode_jpeg(_jpeg_merge(bytes(comp), info.jpeg_tables))
    a = np.asarray(img)
    if info.bits == 12:
        # 12-bit JPEG strips store uint16 samples (GDAL layout);
        # match the file's declared byte order
        a = a.astype(np.dtype(f"{info.endian}u2"))
    else:
        a = a.astype(np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    comps = 1 if a.ndim == 2 else a.shape[2]
    if comps != info.samples_per_pixel:
        raise ValueError(
            f"JPEG strip has {comps} components,"
            f" SamplesPerPixel={info.samples_per_pixel}"
        )
    return a.tobytes()


def _rows_bytes(info: TiffInfo, f, r0: int, r1: int,
                band: int = 0) -> np.ndarray:
    """Read pixel rows [r0, r1) of band ``band`` (0-based) of a
    STRIP-organized file via direct seeks.  Uncompressed strips are
    row-addressable; Deflate strips (Compression 8/32946) inflate
    whole — still executor-local and strip-parallel, the task just
    decodes the strips its rows span.  Multi-band: chunky
    (PlanarConfiguration=1) rows carry all samples interleaved and are
    sliced after decode; planar (=2) files store each band's strips as
    an independent plane, so only that band's bytes are touched."""
    import zlib

    spp = info.samples_per_pixel
    chunky = spp > 1 and info.planar == 1
    px_per_row = info.width * (spp if chunky else 1)
    row_bytes = px_per_row * info.dtype.itemsize
    strips_per_plane = (
        (info.height + info.rows_per_strip - 1) // info.rows_per_strip
    )
    plane = band if (spp > 1 and info.planar == 2) else 0
    all_bands = chunky and band is None  # one decode, all bands kept
    out = np.empty((r1 - r0, info.width, spp) if all_bands
                   else (r1 - r0, info.width), dtype=info.dtype)
    r = r0
    while r < r1:
        s_local = r // info.rows_per_strip
        s = plane * strips_per_plane + s_local
        strip_r0 = s_local * info.rows_per_strip
        take = min(r1, strip_r0 + info.rows_per_strip) - r
        if info.compression == 1:
            off = info.strip_offsets[s] + (r - strip_r0) * row_bytes
            f.seek(off)
            raw = f.read(take * row_bytes)
        else:
            f.seek(info.strip_offsets[s])
            comp = f.read(info.strip_byte_counts[s])
            if info.compression == 5:
                full = tiff_lzw.lzw_decode(comp)
            elif info.compression == 32773:
                full = packbits.packbits_decode(comp)
            elif info.compression == 7:
                full = _jpeg_chunk_bytes(comp, info)
            else:
                full = zlib.decompress(comp)
            skip = (r - strip_r0) * row_bytes
            raw = full[skip : skip + take * row_bytes]
        a = np.frombuffer(raw, dtype=info.dtype).reshape(take, px_per_row)
        if info.predictor == 2:
            a = _unpredict(a, spp if chunky else 1)
        if chunky:
            a = a.reshape(take, info.width, spp)
            if not all_bands:
                a = a[:, :, band]
        out[r - r0 : r - r0 + take] = a
        r += take
    return out


def _rows_from_tiles(info: TiffInfo, f, r0: int, r1: int,
                     band: int = 0) -> np.ndarray:
    """Read pixel rows [r0, r1) of band ``band`` (0-based) of a
    TILE-organized file (chunky or planar, optional predictor)."""
    tw, th = info.tile_width, info.tile_height
    spp = info.samples_per_pixel
    chunky = spp > 1 and info.planar == 1
    vals_per_tile = tw * th * (spp if chunky else 1)
    ntx = (info.width + tw - 1) // tw
    nty = (info.height + th - 1) // th
    plane = band if (spp > 1 and info.planar == 2) else 0
    all_bands = chunky and band is None  # one decode, all bands kept
    out = np.empty((r1 - r0, info.width, spp) if all_bands
                   else (r1 - r0, info.width), dtype=info.dtype)
    t0, t1 = r0 // th, (r1 - 1) // th
    import zlib

    for ty in range(t0, t1 + 1):
        for tx in range(ntx):
            ti = plane * (ntx * nty) + ty * ntx + tx
            f.seek(info.tile_offsets[ti])
            if info.compression == 1:
                raw = f.read(vals_per_tile * info.dtype.itemsize)
            elif info.compression == 5:
                raw = tiff_lzw.lzw_decode(f.read(info.tile_byte_counts[ti]))
            elif info.compression == 32773:
                raw = packbits.packbits_decode(
                    f.read(info.tile_byte_counts[ti])
                )
            elif info.compression == 7:
                raw = _jpeg_chunk_bytes(
                    f.read(info.tile_byte_counts[ti]), info
                )
            else:
                raw = zlib.decompress(f.read(info.tile_byte_counts[ti]))
            arr = np.frombuffer(raw, dtype=info.dtype)[:vals_per_tile]
            if chunky:
                arr = arr.reshape(th, tw * spp)
                if info.predictor == 2:
                    arr = _unpredict(arr, spp)
                arr = arr.reshape(th, tw, spp)
                if not all_bands:
                    arr = arr[:, :, band]
            else:
                arr = arr.reshape(th, tw)
                if info.predictor == 2:
                    arr = _unpredict(arr, 1)
            y0 = max(r0, ty * th)
            y1 = min(r1, (ty + 1) * th)
            x1 = min(info.width, (tx + 1) * tw)
            out[y0 - r0 : y1 - r0, tx * tw : x1] = arr[
                y0 - ty * th : y1 - ty * th, : x1 - tx * tw
            ]
    return out


def read_array(path: str, band: int = 0) -> tuple[np.ndarray, TiffInfo]:
    """Whole-raster single-band read (driver-side; tests + small
    files).  ``band`` is 0-based."""
    info = read_info(path)
    with open(path, "rb") as f:
        if info.tiled:
            a = _rows_from_tiles(info, f, 0, info.height, band)
        else:
            a = _rows_bytes(info, f, 0, info.height, band)
    return a, info


def geotiff_tiles(
    spark,
    path: str,
    tile: int = 64,
    raster_id: str | None = None,
    nodata: float | None = None,
    native_dtype: bool = False,
) -> "pyspark.sql.DataFrame":  # noqa: F821
    """Distributed GeoTIFF → engine tile table.

    One task per tile ROW (height ``tile``): each executor seeks
    straight to its rows and slices them into width-``tile`` tiles —
    full parallel scan, nothing driver-side but the IFD.  Pixels are
    float32 (the engine's compute cell type) by default;
    ``native_dtype=True`` keeps the file's own pixel type — the full
    GDAL zoo u1/i1/u2/i2/u4/i4/f4/f8 (reference dtype table at
    /root/reference/SpaRasters.py:665-685) — and emits a ``ptype``
    column tagging it, since byte width alone cannot distinguish
    u2 from i2 or i4/u4 from f4 (operators/raster._PTYPES).
    """
    from .synth import RASTER_SCHEMA

    info = read_info(path)
    rid = raster_id or path.rsplit("/", 1)[-1]
    nd = nodata if nodata is not None else (
        info.nodata if info.nodata is not None else -9999.0
    )
    n_ty = (info.height + tile - 1) // tile
    rows = spark.createDataFrame(
        [(ty,) for ty in range(n_ty)], "ty int"
    ).repartition(min(n_ty, spark.sparkContext.defaultParallelism * 2))
    bc = spark.sparkContext.broadcast(
        (info, path, tile, rid, float(nd), bool(native_dtype))
    )

    def gen(batches):
        info_, path_, tile_, rid_, nd_, native_ = bc.value
        spp = info_.samples_per_pixel
        chunky = spp > 1 and info_.planar == 1
        rows_fn = _rows_from_tiles if info_.tiled else _rows_bytes
        with open(path_, "rb") as f:
            for pdf in batches:
                out = []
                for ty in pdf["ty"]:
                    r0 = int(ty) * tile_
                    r1 = min(r0 + tile_, info_.height)
                    if chunky:  # one decode covers every band
                        allb = rows_fn(info_, f, r0, r1, None)
                        per_band = [allb[:, :, b] for b in range(spp)]
                    else:  # planar/single: each band an independent read
                        per_band = [rows_fn(info_, f, r0, r1, b)
                                    for b in range(spp)]
                    for b, band_rows in enumerate(per_band):
                        if native_:
                            # engine tile codec is little-endian
                            a = band_rows.astype(
                                band_rows.dtype.newbyteorder("<")
                            )
                        else:
                            a = band_rows.astype("<f4")
                        pt = f"{a.dtype.kind}{a.dtype.itemsize}"
                        for tx in range(0, info_.width, tile_):
                            sub = np.ascontiguousarray(a[:, tx : tx + tile_])
                            row = (
                                rid_, b + 1, int(ty), tx // tile_,
                                sub.shape[0], sub.shape[1], nd_,
                                sub.tobytes(),
                            )
                            out.append(row + (pt,) if native_ else row)
                cols = ["raster_id", "band", "tile_y", "tile_x", "height",
                        "width", "nodata", "pixels"] + (
                            ["ptype"] if native_ else [])
                yield pd.DataFrame(out, columns=cols)

    schema = RASTER_SCHEMA + (", ptype string" if native_dtype else "")
    return rows.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Writer (minimal single-band uncompressed GeoTIFF, little-endian)
# ---------------------------------------------------------------------------


def write_geotiff(
    path: str,
    arr: np.ndarray,
    geotransform: tuple | None = None,
    nodata: float | None = None,
    compress: str | None = None,
    dtype: str | None = None,
    bigtiff: bool = False,
    predictor: int = 1,
    jpeg_quality: int = 90,
) -> None:
    """Little-endian GeoTIFF writer (strip per 64 rows), optionally
    Deflate-compressed (``compress='deflate'`` → per-strip stdlib
    zlib, Compression tag 8 — the most common real DEM export) or
    LZW-compressed (``compress='lzw'`` → tag 5 via the from-scratch
    TIFF §13 codec in sources/tiff_lzw.py, GDAL's default).
    Mirrors reference Save (/root/reference/SpaRasters.py:752) for the
    formats the reader supports — lossless roundtrip without GDAL.

    ``arr`` 2-D writes a single band; 3-D ``(bands, h, w)`` writes a
    chunky (PlanarConfiguration=1) multi-band file — the GDAL band
    stack the reference's rasters carry (SpaRasters.py:62 TheBands).
    ``bigtiff=True`` emits the BigTIFF (magic 43) container with
    8-byte offsets — mandatory past classic TIFF's 4 GB ceiling.
    ``predictor=2`` applies horizontal differencing before Deflate
    (integer samples only) — GDAL's default for compressed DEMs.

    ``dtype=None`` (legacy) collapses to the engine's three transport
    types: float→f4, int→i4, else u1.  ``dtype='native'`` writes the
    array's own dtype faithfully — any of the GDAL zoo
    u1/i1/u2/i2/u4/i4/f4/f8 (SampleFormat + BitsPerSample tags per
    /root/reference/SpaRasters.py:665-685); other codes (e.g. 'u2')
    force that exact type, including complex c8/c16 (CFloat32/
    CFloat64, SampleFormat 6 — the reference's CFloat64 entry at
    /root/reference/SpaRasters.py:678).

    ``compress='jpeg'`` writes Compression=7 (TIFF TechNote 2): each
    strip is an independent baseline JFIF stream (uint8, 1 or 3
    bands, lossy at ``jpeg_quality``) — the layout Common-Crawl-era
    aerial mosaics actually ship."""
    import zlib

    if compress not in (None, "deflate", "lzw", "packbits", "jpeg"):
        raise ValueError(f"unsupported compress={compress!r}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor={predictor}")
    a = np.asarray(arr)
    if dtype is not None:
        want = a.dtype if dtype == "native" else np.dtype(dtype)
        if want.kind not in "uifc" or want.itemsize not in (1, 2, 4, 8, 16):
            raise ValueError(f"unsupported GeoTIFF dtype {want}")
        if want.kind == "f" and want.itemsize < 4:
            raise ValueError(f"unsupported GeoTIFF dtype {want}")
        if want.kind == "c" and want.itemsize not in (8, 16):
            raise ValueError(f"unsupported GeoTIFF dtype {want}")
        a = a.astype(want.newbyteorder("<"))
        sfmt = {"u": 1, "i": 2, "f": 3, "c": 6}[want.kind]
        bits = want.itemsize * 8
    elif a.dtype.kind == "f":
        a = a.astype("<f4")
        sfmt, bits = 3, 32
    elif a.dtype.kind == "i":
        a = a.astype("<i4")
        sfmt, bits = 2, 32
    else:
        a = a.astype("u1")
        sfmt, bits = 1, 8
    if predictor == 2 and sfmt in (3, 6):
        raise ValueError("predictor=2 requires integer samples")
    if compress == "jpeg":
        if sfmt != 1 or bits not in (8, 16):
            raise ValueError(
                "compress='jpeg' requires uint8 (8-bit JPEG) or "
                "uint16 (12-bit JPEG) samples"
            )
        if bits == 16:
            bits = 12  # 12-bit JPEG: BitsPerSample advertises 12
        if predictor == 2:
            raise ValueError("compress='jpeg' excludes predictor=2")
    if a.ndim == 2:
        spp = 1
        rows_view = a  # (h, w)
    elif a.ndim == 3:
        spp = a.shape[0]
        rows_view = np.ascontiguousarray(
            np.moveaxis(a, 0, 2)
        )  # (h, w, spp) interleaved
    else:
        raise ValueError(f"arr must be 2-D or (bands, h, w), got {a.shape}")
    h, w = rows_view.shape[0], rows_view.shape[1]
    rps = 64
    n_strips = (h + rps - 1) // rps

    header = 16 if bigtiff else 8
    strip_offsets, strip_counts = [], []
    strip_blobs = []
    off = header
    for s in range(n_strips):
        nrows = min(rps, h - s * rps)
        chunk = np.ascontiguousarray(rows_view[s * rps : s * rps + nrows])
        if predictor == 2:
            v = chunk.reshape(nrows, w, spp)
            d = v.copy()
            d[:, 1:, :] -= v[:, :-1, :]  # wraps in the native int width
            chunk = d
        blob = chunk.tobytes()
        if compress == "deflate":
            blob = zlib.compress(blob, 6)
        elif compress == "lzw":
            blob = tiff_lzw.lzw_encode(blob)
        elif compress == "packbits":
            blob = packbits.packbits_encode(
                blob, row_bytes=w * spp * bits // 8
            )
        elif compress == "jpeg":
            from . import jpeg as _jpeg

            if spp not in (1, 3):
                raise ValueError("compress='jpeg' needs 1 or 3 bands")
            blob = _jpeg.encode_jpeg(
                chunk, quality=jpeg_quality,
                precision=12 if bits == 12 else 8,
            )
        strip_blobs.append(blob)
        strip_offsets.append(off)
        strip_counts.append(len(blob))
        off += len(blob)
    ifd_off = off

    inline = 8 if bigtiff else 4
    cfmt = "Q" if bigtiff else "I"  # count + pointer width
    otyp = 16 if bigtiff else 4  # LONG8 vs LONG for offset arrays
    entries = []  # (tag, type, count, value_bytes_or_ptr)
    extra = b""
    extra_off = [0]  # patched after IFD size known

    def ent(tag, typ, cnt, values):
        nonlocal extra
        fmt = _TYPE_FMT[typ]
        raw = struct.pack("<" + fmt * cnt, *values)
        if len(raw) <= inline:
            entries.append((tag, typ, cnt, raw.ljust(inline, b"\0")))
        else:
            entries.append((tag, typ, cnt, ("ptr", len(extra))))
            extra += raw
        return None

    ent(_W, 4, 1, [w])
    ent(_H, 4, 1, [h])
    ent(_BITS, 3, spp, [bits] * spp)
    ent(_COMP, 3, 1,
        [{"deflate": 8, "lzw": 5, "packbits": 32773, "jpeg": 7,
          None: 1}[compress]])
    # JPEG strips store YCbCr for 3 bands (what the codec emits)
    ent(_PHOTO, 3, 1, [6 if (compress == "jpeg" and spp == 3) else 1])
    ent(_SOFF, otyp, n_strips, strip_offsets)
    ent(_SPP, 3, 1, [spp])
    ent(_RPS, 4, 1, [rps])
    ent(_SCNT, otyp, n_strips, strip_counts)
    ent(_PLANAR, 3, 1, [1])
    if predictor == 2:
        ent(317, 3, 1, [2])
    ent(_SFMT, 3, spp, [sfmt] * spp)
    if geotransform is not None:
        x0, pw, _, y0, _, ph = geotransform
        ent(_MODEL_SCALE, 12, 3, [abs(pw), abs(ph), 0.0])
        ent(_MODEL_TIE, 12, 6, [0.0, 0.0, 0.0, x0, y0, 0.0])
    if nodata is not None:
        nd = (f"{nodata:.10g}").encode("ascii") + b"\0"
        typ2 = 2
        if len(nd) <= inline:
            entries.append(
                (_GDAL_NODATA, typ2, len(nd), nd.ljust(inline, b"\0"))
            )
        else:
            entries.append((_GDAL_NODATA, typ2, len(nd), ("ptr", len(extra))))
            extra += nd
    entries.sort(key=lambda e: e[0])

    esz = 20 if bigtiff else 12
    ifd_size = (8 if bigtiff else 2) + esz * len(entries) + inline
    extra_off[0] = ifd_off + ifd_size

    with open(path, "wb") as f:
        if bigtiff:
            f.write(b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off))
            f.write(b"")
        else:
            f.write(b"II" + struct.pack("<HI", 42, ifd_off))
        for blob in strip_blobs:
            f.write(blob)
        f.write(struct.pack("<Q" if bigtiff else "<H", len(entries)))
        for tag, typ, cnt, val in entries:
            if isinstance(val, tuple):
                val = struct.pack("<" + cfmt, extra_off[0] + val[1])
            f.write(struct.pack("<HH" + cfmt, tag, typ, cnt) + val)
        f.write(struct.pack("<" + cfmt, 0))  # no next IFD
        f.write(extra)
