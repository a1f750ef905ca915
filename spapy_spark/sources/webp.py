"""WebP lossless (VP8L, RFC 9649) — stdlib+numpy, no libwebp.

The reference's raster stack reads WebP through GDAL/PIL; Common-Crawl
image columns carry it natively, so the engine needs at least the
lossless profile (the alpha/thumbnail/screenshot workhorse).  Decoder
covers the full VP8L bitstream: LSB-first bit packing, canonical
prefix codes (simple and code-length-coded, incl. the max_symbol
escape), color cache, meta-prefix images, LZ77 with the 120-entry
2-D plane-code distance map, and all four transforms (predictor,
color/cross-color, subtract-green, color-indexing incl. sub-byte
pixel bundling) applied in reverse read order.  Lossy VP8 stays a
documented seam (raises NotImplementedError) — it is a full
macroblock/DCT/bool-coder stack with marginal value for a data
pipeline that re-encodes anyway.

The plane-code distance map is DERIVED rather than transcribed: the
spec's 120 (dx, dy) near-offsets (dy 0..7, dx -7..8, excluding
non-causal dy=0,dx<1) listed in increasing (dx²+dy², |dx|, sign)
order — validated against the spec's published prefix of the table
and by encoder/decoder roundtrips through every code.

Encoder: minimal-but-conformant VP8L for roundtrip tests and parquet
fixtures — no transforms, optional color cache, optional greedy LZ77
(both linear and plane-coded distances), canonical prefix codes with
code-length coding.  Bit-exact lossless by construction.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_webp", "encode_webp_lossless"]

# ---------------------------------------------------------------------------
# Bit IO (LSB-first, DEFLATE-style)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Canonical prefix codes.  Codes are transmitted MSB-of-code-first in
# the LSB-first bitstream (DEFLATE convention): decode by extending
# one bit at a time.
# ---------------------------------------------------------------------------


class _PrefixCode:
    def __init__(self, lengths):
        self.table: dict[tuple[int, int], int] = {}
        self.max_len = 0
        self.single: int | None = None
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]  # zero-bit code
            return
        # RFC 1951 canonical assignment
        max_len = max(ln for ln, _ in nz)
        bl_count = [0] * (max_len + 1)
        for ln, _ in nz:
            bl_count[ln] += 1
        code = 0
        next_code = [0] * (max_len + 2)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        for ln, sym in sorted(nz):
            self.table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
        self.max_len = max_len

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.bits(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _code_lengths_to_codes(lengths) -> dict[int, tuple[int, int]]:
    """sym → (code, len) with the same canonical assignment (encoder)."""
    pc = _PrefixCode(lengths)
    if pc.single is not None:
        return {pc.single: (0, 0)}
    return {sym: (code, ln) for (ln, code), sym in pc.table.items()}


_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
              13, 14, 15]


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.bits(1):  # simple code
        num_symbols = br.bits(1) + 1
        if br.bits(1):  # first symbol is 8 bits
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = br.bits(8)
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1  # single-symbol marker
            pc = _PrefixCode.__new__(_PrefixCode)
            pc.table, pc.max_len, pc.single = {}, 0, sym0
            return pc
        return _PrefixCode(lengths)
    # code-length-coded
    num_clc = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _PrefixCode(clc_lengths)
    if br.bits(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = clc.decode(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev
                    symbol += 1
        elif cl == 17:
            symbol += 3 + br.bits(3)
        else:  # 18
            symbol += 11 + br.bits(7)
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix values + plane-code distance map
# ---------------------------------------------------------------------------


def _lz77_prefix_decode(br: _BitReader, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra
    return offset + br.bits(extra) + 1


def _lz77_prefix_encode(value: int) -> tuple[int, int, int]:
    """value → (prefix_code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + ((v >> extra) & 1) + 2, value - offset - 1, extra

#: 120 near (dx, dy) offsets: dy 0..7, dx -7..8 (dy=0 restricted to
#: dx≥1 — causal only), ordered by (dx²+dy², |dx|, positive-first).
_DIST_MAP = sorted(
    [(dx, dy) for dy in range(8) for dx in range(-7, 9)
     if dy > 0 or dx >= 1],
    key=lambda p: (p[0] * p[0] + p[1] * p[1], abs(p[0]), p[0] < 0),
)
assert len(_DIST_MAP) == 120
assert _DIST_MAP[:8] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2),
                         (2, 0), (1, 2), (-1, 2)]


def _plane_code_to_distance(width: int, code: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * width + dx
    return d if d >= 1 else 1


def _distance_to_plane_code(width: int, dist: int) -> int:
    dy, dx = divmod(dist, width)
    if dx > 8:  # also covers the negative-dx representation
        dx -= width
        dy += 1
    if -7 <= dx <= 8 and 0 <= dy <= 7:
        try:
            return _DIST_MAP.index((dx, dy)) + 1
        except ValueError:
            pass
    return dist + 120


# ---------------------------------------------------------------------------
# Entropy-coded image decode
# ---------------------------------------------------------------------------

_HASH_MUL = 0x1E35A7BD


def _cache_key(argb: int, bits: int) -> int:
    return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(br: _BitReader, w: int, h: int,
                          is_main: bool) -> np.ndarray:
    """→ uint32 ARGB array of shape (h, w)."""
    cache_bits = 0
    cache = None
    if br.bits(1):
        cache_bits = br.bits(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"bad color cache bits {cache_bits}")
        cache = [0] * (1 << cache_bits)

    meta = None
    meta_bits = 0
    n_groups = 1
    if is_main and br.bits(1):  # meta prefix codes
        meta_bits = br.bits(3) + 2
        mw = _sub_size(w, meta_bits)
        mh = _sub_size(h, meta_bits)
        meta_img = _decode_entropy_image(br, mw, mh, False)
        meta = (((meta_img >> 8) & 0xFFFF)).astype(np.int64)
        n_groups = int(meta.max()) + 1

    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_size),   # green+len+cache
            _read_prefix_code(br, 256),          # red
            _read_prefix_code(br, 256),          # blue
            _read_prefix_code(br, 256),          # alpha
            _read_prefix_code(br, 40),           # distance
        ))

    npix = w * h
    out = np.zeros(npix, dtype=np.uint32)
    pos = 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    last_meta_cell = -1
    while pos < npix:
        if meta is not None:
            cell = (pos // w >> meta_bits) * meta.shape[1] + (
                pos % w >> meta_bits
            )
            if cell != last_meta_cell:
                g_green, g_red, g_blue, g_alpha, g_dist = groups[
                    int(meta.flat[cell])
                ]
                last_meta_cell = cell
        s = g_green.decode(br)
        if s < 256:
            r = g_red.decode(br)
            b = g_blue.decode(br)
            a = g_alpha.decode(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = px
            if cache is not None:
                cache[_cache_key(px, cache_bits)] = px
            pos += 1
        elif s < 280:
            length = _lz77_prefix_decode(br, s - 256)
            dist_code = _lz77_prefix_decode(br, g_dist.decode(br))
            dist = _plane_code_to_distance(w, dist_code)
            if dist > pos or pos + length > npix:
                raise ValueError("VP8L backward reference out of range")
            for i in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache is not None:
                    cache[_cache_key(px, cache_bits)] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            px = cache[s - 280]
            out[pos] = px
            pos += 1
    return out.reshape(h, w)


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# Inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return ((a & 0xFF) + (b & 0xFF)) >> 1


def _argb_channels(p):
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a, r, g, b):
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (
        b & 0xFF
    )


def _clip255(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _pred(mode, L, T, TL, TR):
    la, lr, lg, lb = _argb_channels(L)
    ta, tr_, tg, tb = _argb_channels(T)
    tla, tlr, tlg, tlb = _argb_channels(TL)
    tra, trr, trg, trb = _argb_channels(TR)
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _pack(_avg2(_avg2(la, tra), ta), _avg2(_avg2(lr, trr), tr_),
                     _avg2(_avg2(lg, trg), tg), _avg2(_avg2(lb, trb), tb))
    if mode == 6:
        return _pack(_avg2(la, tla), _avg2(lr, tlr),
                     _avg2(lg, tlg), _avg2(lb, tlb))
    if mode == 7:
        return _pack(_avg2(la, ta), _avg2(lr, tr_),
                     _avg2(lg, tg), _avg2(lb, tb))
    if mode == 8:
        return _pack(_avg2(tla, ta), _avg2(tlr, tr_),
                     _avg2(tlg, tg), _avg2(tlb, tb))
    if mode == 9:
        return _pack(_avg2(ta, tra), _avg2(tr_, trr),
                     _avg2(tg, trg), _avg2(tb, trb))
    if mode == 10:
        return _pack(
            _avg2(_avg2(la, tla), _avg2(ta, tra)),
            _avg2(_avg2(lr, tlr), _avg2(tr_, trr)),
            _avg2(_avg2(lg, tlg), _avg2(tg, trg)),
            _avg2(_avg2(lb, tlb), _avg2(tb, trb)),
        )
    if mode == 11:  # Select(T, L, TL)
        s = 0
        for tc, lc, tlc in ((ta, la, tla), (tr_, lr, tlr),
                            (tg, lg, tlg), (tb, lb, tlb)):
            s += abs(lc - tlc) - abs(tc - tlc)
        return T if s <= 0 else L
    if mode == 12:  # ClampedAddSubtractFull(L, T, TL)
        return _pack(*(
            _clip255(lc + tc - tlc)
            for lc, tc, tlc in ((la, ta, tla), (lr, tr_, tlr),
                                (lg, tg, tlg), (lb, tb, tlb))
        ))
    if mode == 13:  # ClampedAddSubtractHalf(avg2(L,T), TL)
        vals = []
        for lc, tc, tlc in ((la, ta, tla), (lr, tr_, tlr),
                            (lg, tg, tlg), (lb, tb, tlb)):
            ave = (lc + tc) >> 1
            d = ave - tlc
            half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
            vals.append(_clip255(ave + half))
        return _pack(*vals)
    raise ValueError(f"bad predictor mode {mode}")


def _inv_predictor(img: np.ndarray, sub: np.ndarray,
                   size_bits: int) -> np.ndarray:
    h, w = img.shape
    modes = (sub >> 8) & 0xFF
    out = img.astype(np.int64).copy()
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                p = 0xFF000000
            elif y == 0:
                p = int(out[0, x - 1])
            elif x == 0:
                p = int(out[y - 1, 0])
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                L = int(out[y, x - 1])
                T = int(out[y - 1, x])
                TL = int(out[y - 1, x - 1])
                # buffer-linear top-right: wraps to (0, y) on the last
                # column (spec addressing quirk)
                TR = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                p = _pred(mode, L, T, TL, TR)
            v = int(out[y, x])
            pa, pr, pg, pb = _argb_channels(p)
            va, vr, vg, vb = _argb_channels(v)
            out[y, x] = _pack(va + pa, vr + pr, vg + pg, vb + pb)
    return out.astype(np.uint32)


def _inv_color_transform(img: np.ndarray, sub: np.ndarray,
                         size_bits: int) -> np.ndarray:
    h, w = img.shape
    ys = np.arange(h) >> size_bits
    xs = np.arange(w) >> size_bits
    cte = sub[np.ix_(ys, xs)]
    g2r = ((cte & 0xFF).astype(np.int64) ^ 0x80) - 0x80  # int8
    g2b = (((cte >> 8) & 0xFF).astype(np.int64) ^ 0x80) - 0x80
    r2b = (((cte >> 16) & 0xFF).astype(np.int64) ^ 0x80) - 0x80
    a = (img >> 24) & 0xFF
    r = ((img >> 16) & 0xFF).astype(np.int64)
    g = ((img >> 8) & 0xFF).astype(np.int64)
    b = (img & 0xFF).astype(np.int64)
    gs = (g ^ 0x80) - 0x80  # signed green
    r = (r + ((g2r * gs) >> 5)) & 0xFF
    rs = (r ^ 0x80) - 0x80
    b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
    return ((a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
            | (g.astype(np.uint32) << 8) | b.astype(np.uint32))


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _inv_color_indexing(img: np.ndarray, palette: np.ndarray,
                        width: int, width_bits: int) -> np.ndarray:
    h = img.shape[0]
    idx = (img >> 8) & 0xFF  # indices ride the green channel
    if width_bits:
        per = 1 << width_bits            # pixels per packed byte
        bpp = 8 >> width_bits            # bits per index
        unpacked = np.zeros((h, img.shape[1] * per), dtype=np.uint32)
        for k in range(per):
            unpacked[:, k::per] = (idx >> (k * bpp)) & ((1 << bpp) - 1)
        idx = unpacked[:, :width]
    lut = np.zeros(256, dtype=np.uint32)
    lut[: len(palette)] = palette  # out-of-range indices → 0 (spec)
    return lut[idx]


# ---------------------------------------------------------------------------
# Top-level decode
# ---------------------------------------------------------------------------


def _decode_vp8l(data: bytes) -> np.ndarray:
    if data[0] != 0x2F:
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(data, 1)
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")

    transforms = []  # (type, payload...) in read order
    seen = set()
    cur_w = w
    while br.bits(1):
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color transform
            sb = br.bits(3) + 2
            sub = _decode_entropy_image(
                br, _sub_size(cur_w, sb), _sub_size(h, sb), False
            )
            transforms.append((ttype, sb, sub))
        elif ttype == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            n_colors = br.bits(8) + 1
            pal = _decode_entropy_image(br, n_colors, 1, False)[0]
            # palette entries are per-channel delta-coded
            pal = np.cumsum(
                pal.view(np.uint8).reshape(n_colors, 4), axis=0,
                dtype=np.uint32,
            ).astype(np.uint8).reshape(-1).view(np.uint32).copy()
            width_bits = (3 if n_colors <= 2 else 2 if n_colors <= 4
                          else 1 if n_colors <= 16 else 0)
            transforms.append((3, pal, cur_w, width_bits))
            if width_bits:
                cur_w = _sub_size(cur_w, width_bits)

    img = _decode_entropy_image(br, cur_w, h, True)

    for t in reversed(transforms):
        if t[0] == 0:
            img = _inv_predictor(img, t[2], t[1])
        elif t[0] == 1:
            img = _inv_color_transform(img, t[2], t[1])
        elif t[0] == 2:
            img = _inv_subtract_green(img)
        else:
            img = _inv_color_indexing(img, t[1], t[2], t[3])

    a = ((img >> 24) & 0xFF).astype(np.uint8)
    r = ((img >> 16) & 0xFF).astype(np.uint8)
    g = ((img >> 8) & 0xFF).astype(np.uint8)
    b = (img & 0xFF).astype(np.uint8)
    if (a == 255).all():
        return np.stack([r, g, b], axis=-1)
    return np.stack([r, g, b, a], axis=-1)


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP container → (H, W, 3|4) uint8.  VP8L only; lossy VP8 (and
    VP8X-wrapped lossy) raises — documented seam."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return _decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 is a documented seam (bool-coder + DCT "
                "stack); re-encode sources as lossless or PNG"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L/VP8 chunk")


# ---------------------------------------------------------------------------
# Encoder (tests + fixtures): no transforms, optional cache/LZ77
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict:
    """Symbol → code length via package-merge-free heap huffman with a
    simple depth-cap retry (halving counts flattens the tree)."""
    import heapq
    import itertools

    syms = [s for s, f in freqs.items() if f > 0]
    if len(syms) == 1:
        return {syms[0]: 1}
    counts = {s: freqs[s] for s in syms}
    for _ in range(20):
        tie = itertools.count()
        heap = [(c, next(tie), s) for s, c in counts.items()]
        heapq.heapify(heap)
        parent: dict = {}
        while len(heap) > 1:
            c1, _, n1 = heapq.heappop(heap)
            c2, _, n2 = heapq.heappop(heap)
            node = ("n", next(tie))
            parent[n1] = node
            parent[n2] = node
            heapq.heappush(heap, (c1 + c2, next(tie), node))
        lengths = {}
        for s in syms:
            d = 0
            n = s
            while n in parent:
                n = parent[n]
                d += 1
            lengths[s] = d
        if max(lengths.values()) <= max_len:
            return lengths
        counts = {s: max(1, c // 2) for s, c in counts.items()}
    raise ValueError("cannot fit prefix code depth")


def _write_prefix_code(bw: _BitWriter, lengths_by_sym: dict,
                       alphabet_size: int) -> dict:
    """Emit the code description; → sym → (code, len) for the body."""
    syms = sorted(lengths_by_sym)
    # simple codes carry symbols as 1/8-bit literals — ≤255 only
    if max(syms) <= 255 and (
        len(syms) == 1
        or (len(syms) == 2 and max(lengths_by_sym.values()) == 1)
    ):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] > 1:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            return {syms[0]: (0, 1), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    bw.write(0, 1)  # code-length-coded
    lengths = [0] * alphabet_size
    for s, ln in lengths_by_sym.items():
        lengths[s] = ln
    # trim trailing zeros via max_symbol escape
    last = max(lengths_by_sym) + 1
    clc_freq: dict[int, int] = {}
    for ln in lengths[:last]:
        clc_freq[ln] = clc_freq.get(ln, 0) + 1
    clc_lengths = _huffman_lengths(clc_freq, max_len=7)
    if len(clc_lengths) == 1:
        (only,) = clc_lengths
        clc_lengths = {only: 1, (only + 1) % 16: 1}  # dummy 2nd symbol
    num_clc = max(
        i + 1 for i, s in enumerate(_CLC_ORDER) if s in clc_lengths
    )
    num_clc = max(num_clc, 4)
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_lengths.get(_CLC_ORDER[i], 0), 3)
    full = [0] * 19
    for s, ln in clc_lengths.items():
        full[s] = ln
    clc_codes = _code_lengths_to_codes(full)
    # max_symbol escape: 2 + value, using the smallest nbits that fits
    use_escape = last < alphabet_size
    bw.write(1 if use_escape else 0, 1)
    if use_escape:
        val = last - 2
        nbits = max(2, val.bit_length())
        nbits = min(((nbits + 1) // 2) * 2, 16)  # 2+2*ReadBits(3) shape
        bw.write((nbits - 2) // 2, 3)
        bw.write(val, nbits)
    for ln in lengths[:last]:
        code, cl = clc_codes[ln]
        bw.write(_revbits(code, cl), cl)
    return _code_lengths_to_codes(lengths)


def _revbits(code: int, n: int) -> int:
    """Prefix codes are written MSB-first into the LSB-first stream."""
    out = 0
    for _ in range(n):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


def _emit(bw: _BitWriter, codes: dict, sym: int):
    code, ln = codes[sym]
    bw.write(_revbits(code, ln), ln)


def _write_literal_entropy_image(bw: _BitWriter, argb, is_main: bool):
    """Emit one entropy-coded image as pure literals (no cache/LZ77/
    meta) — the building block tests use to hand-assemble transform
    bitstreams."""
    bw.write(0, 1)  # no color cache
    if is_main:
        bw.write(0, 1)  # no meta prefix codes
    chans = [
        [(int(px) >> 8) & 0xFF for px in argb],
        [(int(px) >> 16) & 0xFF for px in argb],
        [int(px) & 0xFF for px in argb],
        [(int(px) >> 24) & 0xFF for px in argb],
    ]
    codes = []
    for i, (vals, size) in enumerate(
        zip(chans, (256 + 24, 256, 256, 256))
    ):
        freq: dict[int, int] = {}
        for v in vals:
            freq[v] = freq.get(v, 0) + 1
        codes.append(_write_prefix_code(bw, _huffman_lengths(freq), size))
    _write_prefix_code(bw, {0: 1}, 40)  # unused distance tree
    cg, cr, cb, ca = codes
    for px in argb:
        px = int(px)
        _emit(bw, cg, (px >> 8) & 0xFF)
        _emit(bw, cr, (px >> 16) & 0xFF)
        _emit(bw, cb, px & 0xFF)
        _emit(bw, ca, (px >> 24) & 0xFF)


def encode_webp_lossless(
    img: np.ndarray, use_lz77: bool = True, cache_bits: int = 0
) -> bytes:
    """(H, W, 3|4) uint8 → lossless WebP (single prefix-code group, no
    transforms; greedy row-wise LZ77 when ``use_lz77``)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError("expected (H, W, 3|4) uint8")
    h, w = a.shape[:2]
    alpha = a[:, :, 3] if a.shape[2] == 4 else np.full((h, w), 255,
                                                       np.uint8)
    argb = ((alpha.astype(np.uint32) << 24)
            | (a[:, :, 0].astype(np.uint32) << 16)
            | (a[:, :, 1].astype(np.uint32) << 8)
            | a[:, :, 2].astype(np.uint32)).reshape(-1)

    # tokenize: (kind, payload) where kind ∈ lit/copy/cache
    tokens = []
    cache = [0] * (1 << cache_bits) if cache_bits else None
    npix = len(argb)
    pos = 0
    while pos < npix:
        if use_lz77 and pos >= 1:
            # greedy: try the run-length match one pixel back, plus
            # the row-above match (exercises both distance flavors)
            best_len, best_dist = 0, 0
            for dist in (1, w):
                if dist > pos:
                    continue
                ln = 0
                while (pos + ln < npix and ln < 4096
                       and argb[pos + ln - dist] == argb[pos + ln]):
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
            if best_len >= 3:
                tokens.append(("copy", best_len, best_dist))
                if cache is not None:
                    for i in range(best_len):
                        px = int(argb[pos + i])
                        cache[_cache_key(px, cache_bits)] = px
                pos += best_len
                continue
        px = int(argb[pos])
        if cache is not None:
            k = _cache_key(px, cache_bits)
            if cache[k] == px and pos > 0:
                tokens.append(("cache", k))
                pos += 1
                continue
            cache[k] = px
        tokens.append(("lit", px))
        pos += 1

    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    fg: dict[int, int] = {}
    fr: dict[int, int] = {}
    fb: dict[int, int] = {}
    fa: dict[int, int] = {}
    fd: dict[int, int] = {}

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            bump(fg, (px >> 8) & 0xFF)
            bump(fr, (px >> 16) & 0xFF)
            bump(fb, px & 0xFF)
            bump(fa, (px >> 24) & 0xFF)
        elif t[0] == "copy":
            lp, _, _ = _lz77_prefix_encode(t[1])
            bump(fg, 256 + lp)
            dp, _, _ = _lz77_prefix_encode(
                _distance_to_plane_code(w, t[2])
            )
            bump(fd, dp)
        else:
            bump(fg, 280 + t[1])
    for f in (fr, fb, fa, fd):
        if not f:
            f[0] = 1  # unused tree still needs one symbol

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if a.shape[2] == 4 else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta prefix codes
    cg = _write_prefix_code(bw, _huffman_lengths(fg), green_size)
    cr = _write_prefix_code(bw, _huffman_lengths(fr), 256)
    cb = _write_prefix_code(bw, _huffman_lengths(fb), 256)
    ca = _write_prefix_code(bw, _huffman_lengths(fa), 256)
    cd = _write_prefix_code(bw, _huffman_lengths(fd), 40)

    for t in tokens:
        if t[0] == "lit":
            px = t[1]
            _emit(bw, cg, (px >> 8) & 0xFF)
            _emit(bw, cr, (px >> 16) & 0xFF)
            _emit(bw, cb, px & 0xFF)
            _emit(bw, ca, (px >> 24) & 0xFF)
        elif t[0] == "copy":
            lp, lv, ln = _lz77_prefix_encode(t[1])
            _emit(bw, cg, 256 + lp)
            if ln:
                bw.write(lv, ln)
            pc = _distance_to_plane_code(w, t[2])
            dp, dv, dn = _lz77_prefix_encode(pc)
            _emit(bw, cd, dp)
            if dn:
                bw.write(dv, dn)
        else:
            _emit(bw, cg, 280 + t[1])
    body = bw.finish()

    riff_size = 4 + 8 + len(body) + (len(body) & 1)
    out = b"RIFF" + struct.pack("<I", riff_size) + b"WEBP"
    out += b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out
