"""From-scratch WAV (RIFF/PCM) and Y4M (YUV4MPEG2) codec tests + the
real (fake=False) audio_features / frame_sample operator paths."""

import struct

import numpy as np
import pytest

from spapy_spark.operators import multimodal as mm
from spapy_spark.sources import wav, y4m


# ---------------------------------------------------------------- WAV

@pytest.mark.parametrize(
    "dtype",
    [np.uint8, np.int16, np.int32, np.float32, np.float64],
)
def test_wav_roundtrip_dtypes(dtype):
    rng = np.random.default_rng(7)
    if np.issubdtype(dtype, np.integer) or dtype == np.uint8:
        info = np.iinfo(dtype)
        x = rng.integers(info.min, info.max, size=(320, 2)).astype(dtype)
    else:
        x = (rng.random((320, 2)) * 2 - 1).astype(dtype)
    buf = wav.encode_wav(x, 16000)
    got, rate = wav.decode_wav(buf)
    assert rate == 16000
    assert got.dtype.kind == np.dtype(dtype).kind
    assert got.dtype.itemsize == np.dtype(dtype).itemsize
    np.testing.assert_array_equal(got, x)


def test_wav_mono_1d_and_24bit():
    # 1-D input becomes (n, 1)
    x = np.arange(-5, 5, dtype=np.int16)
    got, rate = wav.decode_wav(wav.encode_wav(x, 8000))
    assert got.shape == (10, 1)
    np.testing.assert_array_equal(got[:, 0], x)

    # 24-bit PCM: hand-build the data chunk (encoder has no 3-byte path)
    vals = np.array([0, 1, -1, (1 << 23) - 1, -(1 << 23)], dtype=np.int32)
    raw = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals.tolist()
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 3, 3, 24)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
            + (b"\x00" if len(raw) & 1 else b""))
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = wav.decode_wav(buf)
    assert rate == 44100
    np.testing.assert_array_equal(got[:, 0], vals)


def test_wav_skips_unknown_chunks_and_extensible():
    x = np.array([100, -200, 300], dtype=np.int16)
    buf = bytearray(wav.encode_wav(x, 22050))
    # splice a LIST chunk (odd size → word-aligned pad) before fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    buf2 = bytes(buf[:12]) + extra + bytes(buf[12:])
    buf2 = buf2[:4] + struct.pack("<I", len(buf2) - 8) + buf2[8:]
    got, rate = wav.decode_wav(buf2)
    np.testing.assert_array_equal(got[:, 0], x)

    # WAVE_FORMAT_EXTENSIBLE wrapping PCM: base(16) + cbSize(2) +
    # validBits(2) + channelMask(4) + GUID(16, leads with format id)
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    fmt += struct.pack("<HHI", 22, 16, 0x4) + struct.pack("<H", 1)
    fmt += b"\x00" * 14
    data = x.astype("<i2").tobytes()
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    buf3 = b"RIFF" + struct.pack("<I", len(body)) + body
    got3, _ = wav.decode_wav(buf3)
    np.testing.assert_array_equal(got3[:, 0], x)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        wav.decode_wav(b"not a wav at all")


# ---------------------------------------------------------------- Y4M

@pytest.mark.parametrize("cs", ["420jpeg", "422", "444", "mono"])
def test_y4m_roundtrip_colorspaces(cs):
    rng = np.random.default_rng(3)
    h, w = 8, 12
    cw, ch = y4m._plane_dims(cs, w, h)
    frames = []
    for _ in range(4):
        yp = rng.integers(0, 256, (h, w)).astype(np.uint8)
        if cw:
            u = rng.integers(0, 256, (ch, cw)).astype(np.uint8)
            v = rng.integers(0, 256, (ch, cw)).astype(np.uint8)
        else:
            u = v = None
        frames.append((yp, u, v))
    buf = y4m.encode_y4m(frames, fps=30.0, colorspace=cs)
    params, got = y4m.decode_y4m(buf)
    assert params["width"] == w and params["height"] == h
    assert params["fps"] == pytest.approx(30.0)
    assert params["n_frames"] == 4
    for (ya, ua, va), (yb, ub, vb) in zip(frames, got):
        np.testing.assert_array_equal(ya, yb)
        if cw:
            np.testing.assert_array_equal(ua, ub)
            np.testing.assert_array_equal(va, vb)
        else:
            assert ub is None and vb is None


def test_y4m_every_n_and_limit():
    frames = [
        (np.full((4, 4), k, np.uint8),
         np.full((2, 2), k, np.uint8), np.full((2, 2), k, np.uint8))
        for k in range(10)
    ]
    buf = y4m.encode_y4m(frames)
    params, got = y4m.decode_y4m(buf, every_n=3)
    assert [int(f[0][0, 0]) for f in got] == [0, 3, 6, 9]
    assert params["n_frames"] == 10  # total count still reported
    _, got1 = y4m.decode_y4m(buf, limit=1)
    assert len(got1) == 1 and int(got1[0][0][0, 0]) == 0


def test_y4m_yuv_to_rgb_gray_is_identity():
    # neutral chroma (128) → R=G=B=Y under BT.601 full-range
    yp = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    u = np.full((2, 2), 128, np.uint8)
    v = np.full((2, 2), 128, np.uint8)
    rgb = y4m.yuv_to_rgb(yp, u, v)
    for c in range(3):
        np.testing.assert_array_equal(rgb[:, :, c], yp)
    mono = y4m.yuv_to_rgb(yp, None, None)
    np.testing.assert_array_equal(mono[:, :, 0], yp)


# ------------------------------------------------- operator plumbing

def test_audio_features_real_wav(spark):
    media = mm.synth_media(spark, n=8, codec="wav")
    out = mm.audio_features(media, n_bands=8, fake=False).collect()
    assert len(out) == 8
    by_id = {r["media_id"]: np.array(r["features"]) for r in out}
    for i, f in by_id.items():
        assert f.shape == (4 + 8,)
        # duration = n_samples / rate exactly as synthesized
        assert f[0] == pytest.approx((8000 // 4 + i * 100) / 8000.0)
        # 0.5-amplitude sine: rms ≈ 0.5/sqrt(2), peak ≈ 0.5
        assert f[1] == pytest.approx(0.3535, abs=0.01)
        assert f[2] == pytest.approx(0.5, abs=0.01)
        assert 0.0 < f[3] < 0.5  # zcr of a few-hundred-Hz tone
        assert f[4:].sum() == pytest.approx(1.0, abs=1e-5)
        # a pure tone concentrates energy in one low band
        assert f[4:].max() > 0.9
    # deterministic
    out2 = mm.audio_features(media, n_bands=8, fake=False).collect()
    assert {r["media_id"]: r["features"] for r in out2} == {
        r["media_id"]: r["features"] for r in out
    }


def test_frame_sample_real_y4m(spark):
    vids = mm.synth_media(spark, n=3, codec="y4m")
    out = mm.frame_sample(vids, every_n=5, fake=False).collect()
    per = {}
    for r in out:
        per.setdefault(r["media_id"], []).append(r)
    for mid, rows in per.items():
        nf = 12 + (mid % 3)
        want_idx = list(range(0, nf, 5))
        assert sorted(r["frame_idx"] for r in rows) == want_idx
        for r in rows:
            # each emitted frame is itself a decodable 1-frame Y4M
            params, frames = y4m.decode_y4m(bytes(r["payload"]))
            assert params["n_frames"] == 1
            assert r["meta"]["width"] == params["width"]
            # plane content matches the synthesized frame exactly
            w, h = params["width"], params["height"]
            yy, xx = np.mgrid[0:h, 0:w]
            want_y = ((xx * (mid + 3) + yy + r["frame_idx"] * 7) % 256
                      ).astype(np.uint8)
            np.testing.assert_array_equal(frames[0][0], want_y)
            # and decode_image consumes it via the Y4M magic dispatch
            img = mm.decode_image(bytes(r["payload"]),
                                  r["meta"].asDict(), fake=False)
            assert img.shape == (h, w, 3)


def test_image_features_on_video_frames(spark):
    """Video → frame_sample → image_features: the full multimodal
    pipeline chain over real Y4M payloads."""
    vids = mm.synth_media(spark, n=2, codec="y4m")
    frames = mm.frame_sample(vids, every_n=7, fake=False)
    feats = mm.image_features(frames, n_bins=8, fake=False).collect()
    assert len(feats) == frames.count()
    for r in feats:
        f = np.array(r["features"])
        assert f.shape == (8 * 3,)
        assert f[:8].sum() == pytest.approx(1.0, abs=1e-5)
