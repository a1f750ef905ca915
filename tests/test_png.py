"""From-scratch PNG codec (sources/png.py) + the multimodal
``fake=False`` real-decode path it unlocks."""

import numpy as np
import pytest

from spapy_spark.operators import multimodal
from spapy_spark.sources import png


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_all_filters(channels, filter_type):
    rng = np.random.default_rng(filter_type * 10 + channels)
    img = rng.integers(0, 256, (23, 37, channels), dtype=np.uint8)
    buf = png.encode_png(img, filter_type=filter_type)
    out = png.decode_png(buf)
    np.testing.assert_array_equal(out, img)


def test_gray_2d_input_and_signature():
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    buf = png.encode_png(img)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    out = png.decode_png(buf)
    assert out.shape == (8, 8, 1)
    np.testing.assert_array_equal(out[:, :, 0], img)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        png.decode_png(b"not a png at all")


def test_gradient_compresses():
    # a smooth gradient with the Up filter should deflate well —
    # sanity that the filter actually decorrelates
    yy, xx = np.mgrid[0:64, 0:64]
    img = ((xx + yy) % 256).astype(np.uint8)
    raw = png.encode_png(img, filter_type=0)
    up = png.encode_png(img, filter_type=2)
    assert len(up) < len(raw)


def test_decode_image_fake_false_real_png():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    buf = png.encode_png(img, filter_type=4)
    meta = {"width": 32, "height": 24, "channels": 3}
    out = multimodal.decode_image(buf, meta, fake=False)
    np.testing.assert_array_equal(out, img)
    with pytest.raises(ValueError):
        multimodal.decode_image(buf, {"channels": 4}, fake=False)


def test_image_features_and_resize_on_real_png(spark):
    media = multimodal.synth_media(spark, n=12, png=True)
    feats = multimodal.image_features(media, n_bins=8, fake=False).collect()
    assert len(feats) == 12
    # oracle: decode driver-side and recompute one histogram
    row = media.where("media_id = 5").collect()[0]
    img = png.decode_png(bytes(row["payload"]))
    got = np.array(
        [f["features"] for f in feats if f["media_id"] == 5][0],
        dtype=np.float32,
    ).reshape(3, 8)
    for ch in range(3):
        h = np.bincount(
            img[:, :, ch].ravel().astype(np.int64) * 8 // 256, minlength=8
        )
        np.testing.assert_allclose(got[ch], h / h.sum(), rtol=1e-6)
    # resize through the real decoder
    rs = multimodal.resize_images(media, 16, 12, fake=False).collect()
    r5 = [r for r in rs if r["media_id"] == 5][0]
    want = img[
        (np.arange(12) * img.shape[0] // 12)[:, None],
        (np.arange(16) * img.shape[1] // 16)[None, :],
        :,
    ]
    got_img = np.frombuffer(bytes(r5["payload"]), np.uint8).reshape(12, 16, 3)
    np.testing.assert_array_equal(got_img, want)


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_adam7_roundtrip_all_filters(channels, filter_type):
    rng = np.random.default_rng(100 + filter_type * 10 + channels)
    img = rng.integers(0, 256, (23, 37, channels), dtype=np.uint8)
    buf = png.encode_png(img, filter_type=filter_type, interlace=True)
    out = png.decode_png(buf)
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize(
    "shape", [(1, 1), (1, 9), (9, 1), (3, 5), (7, 7), (8, 8), (9, 10)]
)
def test_adam7_odd_sizes_and_empty_passes(shape):
    # small images leave some Adam7 passes empty; every size must
    # decode bit-equal to the sequential encode of the same pixels
    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    seq = png.decode_png(png.encode_png(img))
    inter = png.decode_png(png.encode_png(img, interlace=True))
    np.testing.assert_array_equal(inter, seq)
    np.testing.assert_array_equal(inter, img)


def test_adam7_header_flag():
    img = np.zeros((16, 16), dtype=np.uint8)
    buf = png.encode_png(img, interlace=True)
    # IHDR interlace byte (last of the 13-byte IHDR body) must be 1
    assert buf[8 + 8 + 12] == 1
    assert png.encode_png(img)[8 + 8 + 12] == 0


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_palette_roundtrip(filter_type):
    rng = np.random.default_rng(filter_type)
    pal = rng.integers(0, 256, (17, 3), dtype=np.uint8)
    idx = rng.integers(0, 17, (19, 23), dtype=np.uint8)
    buf = png.encode_png_palette(idx, pal, filter_type=filter_type)
    out = png.decode_png(buf)
    assert out.shape == (19, 23, 3)
    np.testing.assert_array_equal(out, pal[idx])


def test_palette_trns_alpha():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    trns = np.array([0, 128], np.uint8)  # shorter than PLTE: idx 2 opaque
    idx = np.array([[0, 1, 2]], np.uint8)
    out = png.decode_png(png.encode_png_palette(idx, pal, trns=trns))
    assert out.shape == (1, 3, 4)
    np.testing.assert_array_equal(out[0, :, 3], [0, 128, 255])
    np.testing.assert_array_equal(out[0, :, :3], pal)


def test_palette_missing_plte_rejected():
    pal = np.zeros((2, 3), np.uint8)
    idx = np.zeros((2, 2), np.uint8)
    buf = png.encode_png_palette(idx, pal)
    # strip the PLTE chunk: re-splice signature + IHDR + rest minus PLTE
    import struct as _s
    pos, parts = 8, [buf[:8]]
    while pos + 8 <= len(buf):
        (ln,) = _s.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        chunk = buf[pos : pos + 12 + ln]
        pos += 12 + ln
        if tag != b"PLTE":
            parts.append(chunk)
    with pytest.raises(ValueError, match="PLTE"):
        png.decode_png(b"".join(parts))


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_16bit_roundtrip_all_filters(channels, filter_type):
    rng = np.random.default_rng(200 + filter_type * 10 + channels)
    img = rng.integers(0, 65536, (13, 17, channels), dtype=np.uint16)
    out = png.decode_png(png.encode_png(img, filter_type=filter_type))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def test_16bit_adam7_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 65536, (11, 9, 3), dtype=np.uint16)
    out = png.decode_png(png.encode_png(img, interlace=True))
    np.testing.assert_array_equal(out, img)


def test_16bit_big_endian_in_stream():
    # one gray pixel 0x0102 must serialize as bytes 01 02 (network order)
    img = np.array([[0x0102]], dtype=np.uint16)
    buf = png.encode_png(img)
    import struct as _s, zlib as _z
    pos = 8
    while pos + 8 <= len(buf):
        (ln,) = _s.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        if tag == b"IDAT":
            raw = _z.decompress(buf[pos + 8 : pos + 8 + ln])
            assert raw == b"\x00\x01\x02"  # filter byte + BE sample
        pos += 12 + ln
    np.testing.assert_array_equal(png.decode_png(buf), img.reshape(1, 1, 1))


def test_decode_image_16bit_png_high_byte():
    img16 = np.array([[[0x1234, 0xFF00, 0x00FF]]], dtype=np.uint16)
    out = multimodal.decode_image(
        png.encode_png(img16), {"format": "png"}, fake=False
    )
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, [[[0x12, 0xFF, 0x00]]])


def test_decode_image_palette_png():
    pal = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    out = multimodal.decode_image(
        png.encode_png_palette(idx, pal), {"format": "png"}, fake=False
    )
    np.testing.assert_array_equal(out, pal[idx])
