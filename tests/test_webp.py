"""WebP lossless (VP8L, RFC 9649) — sources/webp.py.

Roundtrips cover the encoder's surface (literals, LZ77 with both
plane-coded and linear distances, color cache).  The four transforms
are covered by HAND-BUILT bitstreams: the test implements the FORWARD
transform from the spec and asserts the decoder's inverse restores the
original — a mirrored bug would need the same mistake written twice
from two different directions."""

import struct

import numpy as np
import pytest

from spapy_spark.sources import webp
from spapy_spark.sources.webp import (
    _BitWriter,
    _write_literal_entropy_image,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _to_argb(img):
    a = img[:, :, 3] if img.shape[2] == 4 else np.full(
        img.shape[:2], 255, np.uint8
    )
    return ((a.astype(np.uint32) << 24)
            | (img[:, :, 0].astype(np.uint32) << 16)
            | (img[:, :, 1].astype(np.uint32) << 8)
            | img[:, :, 2].astype(np.uint32))


def _container(body: bytes) -> bytes:
    out = b"RIFF" + struct.pack("<I", 12 + len(body) + (len(body) & 1))
    out += b"WEBP" + b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


# ---------------------------------------------------------------------------
# encoder/decoder roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("case", [
    ("random_rgb", (37, 53, 3), {}),
    ("random_rgba", (20, 31, 4), {}),
    ("no_lz77", (25, 25, 3), dict(use_lz77=False)),
    ("color_cache", (45, 33, 3), dict(cache_bits=6)),
    ("one_col", (300, 1, 4), {}),
    ("one_row", (1, 300, 3), {}),
])
def test_roundtrip(case):
    name, shape, kw = case
    img = _rng(hash(name) % 2**31).integers(0, 256, shape, dtype=np.uint8)
    if name == "color_cache":
        img = (img % 8) * 32  # few distinct colors → cache hits
    dec = webp.decode_webp(webp.encode_webp_lossless(img, **kw))
    np.testing.assert_array_equal(dec, img)


def test_roundtrip_lz77_both_distance_flavors():
    # repeated rows → plane code 1 (dist = width); runs → code 2
    row = _rng(3).integers(0, 256, (1, 64, 3), dtype=np.uint8)
    img = np.tile(row, (30, 1, 1))
    img[10:12] = 99  # a run region
    enc = webp.encode_webp_lossless(img)
    np.testing.assert_array_equal(webp.decode_webp(enc), img)
    assert len(enc) < 1200  # LZ77 actually engaged


def test_distance_plane_map_spec_prefix():
    # the first entries of the spec's distance table, transcribed
    assert webp._DIST_MAP[:24] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
        (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
        (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
        (-3, 2), (0, 4), (4, 0),
    ]
    assert len(set(webp._DIST_MAP)) == 120
    # roundtrip every plane code at a width where none degenerate
    for code in range(1, 121):
        d = webp._plane_code_to_distance(50, code)
        assert webp._distance_to_plane_code(50, d) == code


# ---------------------------------------------------------------------------
# transforms via hand-built bitstreams (forward in test, inverse in lib)
# ---------------------------------------------------------------------------


def _decode_body(body: bytes):
    return webp.decode_webp(_container(body))


def test_subtract_green_transform():
    img = _rng(7).integers(0, 256, (13, 17, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    res = img.astype(np.int64).copy()
    res[:, :, 0] = (res[:, :, 0] - res[:, :, 1]) % 256  # r -= g
    res[:, :, 2] = (res[:, :, 2] - res[:, :, 1]) % 256  # b -= g
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # a transform follows
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    _write_literal_entropy_image(
        bw, _to_argb(res.astype(np.uint8)).reshape(-1), True
    )
    np.testing.assert_array_equal(_decode_body(bw.finish()), img)


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_transform_every_mode(mode):
    img = _rng(100 + mode).integers(0, 256, (11, 19, 4), dtype=np.uint8)
    h, w = img.shape[:2]
    argb = _to_argb(img).astype(np.int64)
    res = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                p = 0xFF000000
            elif y == 0:
                p = int(argb[0, x - 1])
            elif x == 0:
                p = int(argb[y - 1, 0])
            else:
                L = int(argb[y, x - 1])
                T = int(argb[y - 1, x])
                TL = int(argb[y - 1, x - 1])
                TR = int(argb[y - 1, x + 1]) if x + 1 < w else int(
                    argb[y, 0]
                )
                p = webp._pred(mode, L, T, TL, TR)
            v = int(argb[y, x])
            out = 0
            for shift in (24, 16, 8, 0):
                out |= ((((v >> shift) & 0xFF) - ((p >> shift) & 0xFF))
                        % 256) << shift
            res[y, x] = out
    sb = 4  # 16-px blocks; sub image = ceil dims, constant mode
    sub_w = (w + 15) >> 4
    sub_h = (h + 15) >> 4
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(sb - 2, 3)
    _write_literal_entropy_image(
        bw, np.full(sub_w * sub_h, mode << 8, np.uint32), False
    )
    bw.write(0, 1)
    _write_literal_entropy_image(
        bw, res.astype(np.uint32).reshape(-1), True
    )
    np.testing.assert_array_equal(_decode_body(bw.finish()), img)


def test_color_transform():
    img = _rng(42).integers(0, 256, (14, 10, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    g2r, g2b, r2b = -17, 33, -90  # int8 multipliers

    def s8(v):
        return ((v & 0xFF) ^ 0x80) - 0x80

    res = img.astype(np.int64).copy()
    for y in range(h):
        for x in range(w):
            r, g, b = (int(img[y, x, 0]), int(img[y, x, 1]),
                       int(img[y, x, 2]))
            gs = s8(g)
            rs = s8(r)
            res[y, x, 0] = (r - ((g2r * gs) >> 5)) % 256
            res[y, x, 2] = (b - ((g2b * gs) >> 5)
                            - ((r2b * rs) >> 5)) % 256
    sb = 3
    sub_w = (w + 7) >> 3
    sub_h = (h + 7) >> 3
    cte = (((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8)
           | (g2r & 0xFF))
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR_TRANSFORM
    bw.write(sb - 2, 3)
    _write_literal_entropy_image(
        bw, np.full(sub_w * sub_h, cte, np.uint32), False
    )
    bw.write(0, 1)
    _write_literal_entropy_image(
        bw, _to_argb(res.astype(np.uint8)).reshape(-1), True
    )
    np.testing.assert_array_equal(_decode_body(bw.finish()), img)


@pytest.mark.parametrize("n_colors,width_bits", [
    (2, 3), (4, 2), (13, 1), (90, 0),
])
def test_color_indexing_transform(n_colors, width_bits):
    rng = _rng(n_colors)
    palette = rng.integers(0, 256, (n_colors, 4), dtype=np.uint8)
    palette[:, 3] = 255
    h, w = 9, 26
    idx = rng.integers(0, n_colors, (h, w))
    img = palette[idx][:, :, :3]
    pal_argb = ((palette[:, 3].astype(np.uint32) << 24)
                | (palette[:, 0].astype(np.uint32) << 16)
                | (palette[:, 1].astype(np.uint32) << 8)
                | palette[:, 2].astype(np.uint32))
    # forward: palette stream is byte-wise delta-coded
    pal_bytes = pal_argb.view(np.uint8).reshape(n_colors, 4).astype(
        np.int64
    )
    deltas = pal_bytes.copy()
    deltas[1:] = (pal_bytes[1:] - pal_bytes[:-1]) % 256
    pal_stream = deltas.astype(np.uint8).reshape(-1).view(
        np.uint32
    ).copy()
    # forward: pack indices into the green channel
    if width_bits:
        per = 1 << width_bits
        bpp = 8 >> width_bits
        packed_w = (w + per - 1) // per
        packed = np.zeros((h, packed_w), dtype=np.uint32)
        for k in range(per):
            cols = idx[:, k::per]
            packed[:, : cols.shape[1]] |= cols.astype(np.uint32) << (
                k * bpp
            )
        coded = packed << 8
    else:
        packed_w = w
        coded = idx.astype(np.uint32) << 8
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(n_colors - 1, 8)
    _write_literal_entropy_image(bw, pal_stream, False)
    bw.write(0, 1)
    _write_literal_entropy_image(bw, coded.reshape(-1), True)
    np.testing.assert_array_equal(_decode_body(bw.finish()), img)


def test_meta_prefix_groups():
    # two halves coded with two different prefix-code groups
    from spapy_spark.sources.webp import (
        _emit, _huffman_lengths, _write_prefix_code,
    )

    h, w = 8, 16
    img = np.zeros((h, w, 3), np.uint8)
    img[:, :8] = [10, 20, 30]
    img[:, 8:] = [200, 210, 220]
    argb = _to_argb(img)
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix codes
    mb = 3  # 8-px blocks → meta image 2x1
    bw.write(mb - 2, 3)
    # meta image: group index in (red<<8)|green → plain green channel
    _write_literal_entropy_image(
        bw, np.array([0 << 8, 1 << 8], np.uint32), False
    )
    for base in (argb[0, 0], argb[0, 8]):
        px = int(base)
        _write_prefix_code(
            bw, _huffman_lengths({(px >> 8) & 0xFF: 1}), 280)
        _write_prefix_code(
            bw, _huffman_lengths({(px >> 16) & 0xFF: 1}), 256)
        _write_prefix_code(
            bw, _huffman_lengths({px & 0xFF: 1}), 256)
        _write_prefix_code(bw, _huffman_lengths({255: 1}), 256)
        _write_prefix_code(bw, {0: 1}, 40)
    # zero-bit codes: the pixel loop reads nothing per pixel
    np.testing.assert_array_equal(_decode_body(bw.finish()), img)


# ---------------------------------------------------------------------------
# container handling + pipeline wiring
# ---------------------------------------------------------------------------


def test_lossy_vp8_raises():
    body = b"\x00" * 10
    payload = (b"RIFF" + struct.pack("<I", 12 + len(body)) + b"WEBP"
               + b"VP8 " + struct.pack("<I", len(body)) + body)
    with pytest.raises(NotImplementedError, match="VP8"):
        webp.decode_webp(payload)


def test_bad_container_raises():
    with pytest.raises(ValueError, match="WebP"):
        webp.decode_webp(b"RIFX" + b"\x00" * 20)
    with pytest.raises(ValueError, match="chunk"):
        webp.decode_webp(b"RIFF\x04\x00\x00\x00WEBP")


def test_multimodal_dispatch_decodes_webp():
    from spapy_spark.operators import multimodal

    img = _rng(5).integers(0, 256, (12, 18, 3), dtype=np.uint8)
    payload = webp.encode_webp_lossless(img)
    got = multimodal.decode_image(
        payload, {"width": 18, "height": 12, "channels": 3}, fake=False
    )
    np.testing.assert_array_equal(got, img)


def test_read_any_and_write_raster_webp(spark, tmp_path):
    from spapy_spark.sources import io

    img = _rng(6).integers(0, 256, (3, 20, 24), dtype=np.uint8)
    p = str(tmp_path / "r.webp")
    io.write_raster(p, img)
    df = io.read_any(spark, p)
    rows = df.collect()
    got = {}
    for b in range(1, 4):
        rs = [r for r in rows if r["band"] == b]
        n_tx = max(r["tile_x"] for r in rs) + 1
        grid = [[None] * n_tx]
        for r in rs:
            grid[r["tile_y"]][r["tile_x"]] = np.frombuffer(
                r["pixels"], np.float32
            ).reshape(r["height"], r["width"])
        got[b] = np.block(grid)
    for b in range(3):
        np.testing.assert_array_equal(got[b + 1], img[b].astype(np.float32))
