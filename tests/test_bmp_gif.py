"""From-scratch BMP and GIF codec tests + decode_image dispatch."""

import struct

import numpy as np
import pytest

from spapy_spark.operators import multimodal as mm
from spapy_spark.sources import bmp, gif


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


# ---------------------------------------------------------------- BMP

@pytest.mark.parametrize("h,w", [(8, 8), (5, 7), (3, 2)])
def test_bmp_roundtrip_24bit(h, w):
    # odd widths exercise the 4-byte row padding
    img = _img(h, w, seed=h * 10 + w)
    got = bmp.decode_bmp(bmp.encode_bmp(img))
    np.testing.assert_array_equal(got, img)


def test_bmp_8bit_palette_and_topdown():
    # hand-build an 8-bit paletted, TOP-DOWN bmp
    h, w = 4, 6
    pal = np.arange(256 * 4, dtype=np.uint8).reshape(256, 4)
    idx = (np.arange(h * w, dtype=np.uint8) * 7).reshape(h, w)
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx
    off = 14 + 40 + 256 * 4
    head = b"BM" + struct.pack("<IHHI", off + rows.size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 8, 0,
                       rows.size, 0, 0, 256, 0)
    buf = head + info + pal.tobytes() + rows.tobytes()
    got = bmp.decode_bmp(buf)
    want = pal[:, [2, 1, 0]][idx]  # BGRX palette → RGB, rows as stored
    np.testing.assert_array_equal(got, want)


def test_bmp_32bit_rgba():
    h, w = 3, 3
    rgba = np.arange(h * w * 4, dtype=np.uint8).reshape(h, w, 4)
    bgra = rgba[:, :, [2, 1, 0, 3]]
    off = 14 + 40
    data = bgra[::-1].tobytes()  # bottom-up, stride = w*4 (already /4)
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0,
                       len(data), 0, 0, 0, 0)
    got = bmp.decode_bmp(head + info + data)
    np.testing.assert_array_equal(got, rgba)


def test_bmp_rejects():
    with pytest.raises(ValueError):
        bmp.decode_bmp(b"PNG whatever")


# ---------------------------------------------------------------- GIF

def test_gif_roundtrip_few_colors():
    # 4-color checkerboard-ish image
    h, w = 10, 13
    yy, xx = np.mgrid[0:h, 0:w]
    key = ((xx // 2 + yy // 3) % 4)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]],
                   np.uint8)
    img = pal[key]
    params, frames = gif.decode_gif(gif.encode_gif(img))
    assert params == {"width": w, "height": h, "n_frames": 1}
    np.testing.assert_array_equal(frames[0], img)


def test_gif_roundtrip_256_colors_lzw_growth():
    # every byte value appears → forces LZW code-size growth
    h, w = 32, 32
    v = (np.arange(h * w) % 256).astype(np.uint8).reshape(h, w)
    img = np.stack([v, 255 - v, (v * 3) % 256], axis=2).astype(np.uint8)
    _, frames = gif.decode_gif(gif.encode_gif(img))
    np.testing.assert_array_equal(frames[0], img)
    with pytest.raises(ValueError):
        gif.encode_gif(_img(20, 20, seed=1))  # >256 colors, no quantizer


def test_gif_interlaced():
    # re-encode, then flip the interlace bit and permute rows to match
    h, w = 16, 8
    img = np.repeat(
        np.arange(h, dtype=np.uint8)[:, None, None] * 15, w, axis=1
    ).repeat(3, axis=2)
    buf = bytearray(gif.encode_gif(img))
    # image descriptor starts after header(13) + GCT; find 0x2c
    pos = 13 + len(np.unique(img.reshape(-1, 3), axis=0)) * 0  # noqa
    i = buf.index(0x2C, 13)
    buf[i + 9] |= 0x40  # set interlace flag
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    # rows stored in interlace order should decode back to natural order
    img_inter = img[order]
    buf2 = bytearray(gif.encode_gif(img_inter))
    j = buf2.index(0x2C, 13)
    buf2[j + 9] |= 0x40
    _, frames = gif.decode_gif(bytes(buf2))
    np.testing.assert_array_equal(frames[0], img)


def test_gif_animation_transparency_disposal():
    """Two-frame hand-built animation: frame 2 is a transparent patch
    over frame 1, with disposal=2 (restore background) after frame 1."""
    w = h = 4
    pal = np.array([[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]],
                   np.uint8)
    gct = np.zeros((4, 3), np.uint8)
    gct[:4] = pal

    def image_block(idx, left=0, top=0):
        fh, fw = idx.shape
        mcs = 2
        lzw = gif._lzw_encode(idx.ravel(), mcs)
        blocks = b"".join(
            bytes([min(255, len(lzw) - i)]) + lzw[i:i + 255]
            for i in range(0, len(lzw), 255))
        return (b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
                + bytes([mcs]) + blocks + b"\x00")

    def gce(disposal, transparent=None):
        flags = (disposal << 2) | (1 if transparent is not None else 0)
        return (b"\x21\xf9\x04" + bytes([flags, 0, 0, transparent or 0])
                + b"\x00")

    f1 = np.full((h, w), 1, np.uint8)       # all red
    f2 = np.array([[2, 0], [0, 3]], np.uint8)  # green/blue + transparent 0
    buf = (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x81, 0, 0)
           + gct.tobytes()
           + gce(disposal=2) + image_block(f1)
           + gce(disposal=0, transparent=0) + image_block(f2, 1, 1)
           + b"\x3b")
    params, frames = gif.decode_gif(buf)
    assert params["n_frames"] == 2
    np.testing.assert_array_equal(frames[0], pal[f1])
    # after disposal=2 the canvas reverts to background (index 0 color),
    # then frame 2 draws at (1,1) with index 0 transparent (shows bg)
    want = np.zeros((h, w, 3), np.uint8)
    want[:] = pal[0]
    want[1, 1] = pal[2]
    want[2, 2] = pal[3]
    np.testing.assert_array_equal(frames[1], want)


# ------------------------------------------------------ dispatch

def test_decode_image_dispatches_bmp_and_gif(spark):
    img = _img(6, 5, seed=3)
    out = mm.decode_image(bmp.encode_bmp(img),
                          {"width": 5, "height": 6, "channels": 3},
                          fake=False)
    np.testing.assert_array_equal(out, img)

    pal_img = np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8)
    out2 = mm.decode_image(gif.encode_gif(pal_img),
                           {"width": 2, "height": 1, "channels": 3},
                           fake=False)
    np.testing.assert_array_equal(out2, pal_img)

    # lossless WebP now decodes (sources/webp.py); LOSSY VP8 is the
    # remaining documented seam
    import struct

    lossy = (b"RIFF" + struct.pack("<I", 16) + b"WEBP"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError):
        mm.decode_image(lossy, {"width": 1, "height": 1, "channels": 3},
                        fake=False)
