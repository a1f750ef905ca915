"""Baseline JPEG codec tests (sources/jpeg.py).

No PIL/libjpeg in the container, so correctness is established by:
(a) closed-form cases (flat blocks → DC-only reconstruction),
(b) q=100 roundtrips (all quant divisors = 1 → error bounded by DCT
    rounding alone),
(c) an independent numpy reference pipeline (DCT→quant→dequant→IDCT)
    that must agree with encode→decode EXACTLY on aligned grayscale
    images — validating the entropy/bitstream layer separately from
    the transform math, and
(d) structural invariants (restart markers, subsampling, odd sizes).
"""

import numpy as np
import pytest

from spapy_spark.sources import jpeg


def _img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def _smooth(h, w, c=3):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0))
    chans = [np.clip(base + 20 * i, 0, 255) for i in range(c)]
    return np.stack(chans, -1).astype(np.uint8)


class TestClosedForm:
    def test_flat_gray_is_near_exact(self):
        # flat block → only DC survives; quantized DC reconstructs the
        # level to within half a quant step / 64 (< 1 here)
        for v in (0, 7, 128, 200, 255):
            img = np.full((16, 24, 1), v, np.uint8)
            out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
            assert out.shape == (16, 24, 1)
            assert int(np.abs(out.astype(int) - int(v)).max()) <= 1

    def test_flat_color(self):
        img = np.zeros((8, 8, 3), np.uint8)
        img[:] = (200, 30, 90)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_q100_gray_gradient_tight(self):
        # q=100 → every quant divisor is 1; error is DCT round-trip
        # rounding only
        yy, xx = np.mgrid[0:32, 0:40]
        img = ((xx * 3 + yy * 2) % 256).astype(np.uint8)[:, :, None]
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


class TestBitstreamExactness:
    """encode→decode must equal the independent numpy reference
    pipeline EXACTLY (grayscale, 8-aligned: no padding, no color
    transform, no subsampling — isolates Huffman/bit IO)."""

    def _reference(self, img, quality):
        qt, _ = jpeg._quality_tables(quality)
        plane = img[:, :, 0].astype(np.float64) - 128.0
        blk = jpeg._to_blocks(plane)
        coef = np.einsum("ux,ijxy,vy->ijuv", jpeg._C, blk, jpeg._C)
        qc = np.round(coef / qt)
        rec = np.einsum("xu,ijuv,yv->ijxy", jpeg._C.T, qc * qt, jpeg._C.T)
        out = jpeg._from_blocks(rec) + 128.0
        return np.clip(np.round(out), 0, 255).astype(np.uint8)

    @pytest.mark.parametrize("quality", [35, 75, 95])
    def test_gray_matches_reference_pipeline(self, quality):
        img = _img(40, 64, 1, seed=quality)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality))
        np.testing.assert_array_equal(out[:, :, 0],
                                      self._reference(img, quality))

    def test_restart_interval_identical_output(self):
        img = _img(48, 48, 1, seed=3)
        plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=80))
        with_rst = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=80, restart_interval=2)
        )
        np.testing.assert_array_equal(plain, with_rst)
        # and the RST path was actually exercised
        enc = jpeg.encode_jpeg(img, quality=80, restart_interval=2)
        assert any(
            enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7
            for i in range(2, len(enc) - 3)
        )


class TestColorAndSubsampling:
    def test_rgb_roundtrip_psnr(self):
        img = _smooth(64, 80)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
        err = out.astype(np.float64) - img.astype(np.float64)
        psnr = 10 * np.log10(255.0**2 / np.mean(err**2))
        assert psnr > 35.0

    def test_420_roundtrip(self):
        img = _smooth(64, 80)
        enc = jpeg.encode_jpeg(img, quality=90, subsampling="4:2:0")
        out = jpeg.decode_jpeg(enc)
        assert out.shape == img.shape
        err = out.astype(np.float64) - img.astype(np.float64)
        psnr = 10 * np.log10(255.0**2 / np.mean(err**2))
        assert psnr > 30.0
        # 4:2:0 stream is materially smaller on a chroma-smooth image
        assert len(enc) < len(jpeg.encode_jpeg(img, quality=90))

    def test_420_equals_444_when_chroma_flat(self):
        # constant chroma: subsampling loses nothing but block layout
        img = np.zeros((32, 32, 3), np.uint8)
        yy, xx = np.mgrid[0:32, 0:32]
        g = ((xx + yy) * 4 % 256).astype(np.uint8)
        img[..., 0] = g
        img[..., 1] = g
        img[..., 2] = g  # gray in RGB → Cb = Cr = 128 everywhere
        a = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=95))
        b = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=95, subsampling="4:2:0")
        )
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    def test_odd_sizes(self):
        for h, w in ((17, 23), (9, 8), (33, 31)):
            img = _smooth(h, w)
            out = jpeg.decode_jpeg(
                jpeg.encode_jpeg(img, quality=90, subsampling="4:2:0")
            )
            assert out.shape == (h, w, 3)
            out2 = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
            assert out2.shape == (h, w, 3)


class TestErrors:
    def test_not_jpeg(self):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg(b"\x89PNG\r\n")

    def test_arithmetic_sof_rejected(self):
        img = _img(16, 16, 1)
        enc = bytearray(jpeg.encode_jpeg(img))
        i = enc.find(b"\xff\xc0")
        enc[i + 1] = 0xC9  # SOF9 (arithmetic sequential)
        with pytest.raises(NotImplementedError):
            jpeg.decode_jpeg(bytes(enc))

    def test_zigzag_is_the_standard_sequence(self):
        # spot-check the canonical published order
        zz = jpeg._ZIGZAG
        assert zz[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
        assert zz[-4:].tolist() == [47, 55, 62, 63]
        assert sorted(zz.tolist()) == list(range(64))


class TestProgressive:
    """Progressive (SOF2) scans accumulate into the SAME quantized
    coefficients the baseline encoder writes, so decode(progressive)
    must equal decode(baseline) BIT-FOR-BIT on every visible pixel —
    a full cross-mode oracle with no external decoder."""

    @pytest.mark.parametrize("quality", [40, 85])
    def test_gray_bit_equal_to_baseline(self, quality):
        img = _img(40, 33, 1, seed=quality)  # odd width → edge blocks
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=quality))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=quality)
        )
        np.testing.assert_array_equal(prog, base)

    def test_rgb_444_bit_equal(self):
        img = _img(37, 29, 3, seed=7)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=80))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=80)
        )
        np.testing.assert_array_equal(prog, base)

    def test_rgb_420_bit_equal(self):
        # subsampled chroma: non-interleaved AC scans walk a smaller
        # component grid than luma; 24-high image makes the luma MCU
        # padding row differ from the ceil(h/8) scan grid
        img = _smooth(24, 40)
        base = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=85, subsampling="4:2:0")
        )
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=85,
                                         subsampling="4:2:0")
        )
        np.testing.assert_array_equal(prog, base)

    def test_flat_image_exercises_eob_runs(self):
        # constant image → every AC band scan is one long EOB run
        img = np.full((64, 64, 1), 130, np.uint8)
        enc = jpeg.encode_jpeg_progressive(img, quality=85)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85))
        np.testing.assert_array_equal(jpeg.decode_jpeg(enc), base)
        # and the run actually compressed: far fewer bytes than one
        # EOB symbol per block per AC scan would need
        assert len(enc) < 2200

    def test_restart_markers_in_progressive_scans(self):
        img = _img(48, 40, 1, seed=11)
        plain = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(img))
        enc = jpeg.encode_jpeg_progressive(img, restart_interval=3)
        np.testing.assert_array_equal(jpeg.decode_jpeg(enc), plain)
        assert any(
            enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7
            for i in range(2, len(enc) - 3)
        )

    def test_custom_scan_script_spectral_only(self):
        # spectral selection without successive approximation
        img = _img(32, 32, 1, seed=2)
        scans = [
            ([0], 0, 0, 0, 0),
            ([0], 1, 9, 0, 0),
            ([0], 10, 63, 0, 0),
        ]
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75))
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, quality=75, scans=scans)
        )
        np.testing.assert_array_equal(prog, base)

    def test_noninterleaved_dc_scan_subsampled_short_frame(self):
        # Ns=1 DC scans on a 4:2:0 frame 8 rows tall: the luma MCU
        # padding grid (2x6 blocks) exceeds the true ceil grid (1x5);
        # the decoder walks the true grid for single-component DC
        # scans, so the encoder must too (r4 ADVICE jpeg.py:587)
        img = _img(8, 40, 3, seed=5)
        scans = [
            ([0], 0, 0, 0, 1), ([1], 0, 0, 0, 1), ([2], 0, 0, 0, 1),
            ([0], 1, 63, 0, 0), ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0),
            ([0], 0, 0, 1, 0), ([1], 0, 0, 1, 0), ([2], 0, 0, 1, 0),
        ]
        base = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=80, subsampling="4:2:0")
        )
        prog = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(
                img, quality=80, subsampling="4:2:0", scans=scans
            )
        )
        np.testing.assert_array_equal(prog, base)

    def test_multimodal_decodes_progressive(self, spark):
        from spapy_spark.operators import multimodal

        img = _smooth(24, 24)
        payload = jpeg.encode_jpeg_progressive(img, quality=90)
        df = spark.createDataFrame(
            [(0, bytearray(payload), (24, 24, 3, 0, 1))],
            "media_id long, payload binary, "
            "meta struct<width:int,height:int,channels:int,"
            "sample_rate:int,n_frames:int>",
        )
        feats = multimodal.image_features(df, n_bins=4,
                                          fake=False).collect()
        assert len(feats) == 1
        dec = jpeg.decode_jpeg(payload)
        got = np.array(feats[0]["features"], np.float32).reshape(3, 4)
        for ch in range(3):
            h = np.bincount(
                dec[:, :, ch].ravel().astype(np.int64) * 4 // 256,
                minlength=4,
            )
            np.testing.assert_allclose(got[ch], h / h.sum(), rtol=1e-6)


class TestSparkPipeline:
    """image_features / resize_images over REAL JPEG payloads, plus
    mixed PNG+JPEG signature dispatch (mirrors
    test_png.test_image_features_and_resize_on_real_png)."""

    def test_image_features_and_resize_on_real_jpeg(self, spark):
        from spapy_spark.operators import multimodal

        media = multimodal.synth_media(spark, n=12, codec="jpeg")
        feats = multimodal.image_features(media, n_bins=8,
                                          fake=False).collect()
        assert len(feats) == 12
        row = media.where("media_id = 5").collect()[0]
        img = jpeg.decode_jpeg(bytes(row["payload"]))
        got = np.array(
            [f["features"] for f in feats if f["media_id"] == 5][0],
            dtype=np.float32,
        ).reshape(3, 8)
        for ch in range(3):
            h = np.bincount(
                img[:, :, ch].ravel().astype(np.int64) * 8 // 256,
                minlength=8,
            )
            np.testing.assert_allclose(got[ch], h / h.sum(), rtol=1e-6)
        rs = multimodal.resize_images(media, 16, 12, fake=False).collect()
        r5 = [r for r in rs if r["media_id"] == 5][0]
        want = img[
            (np.arange(12) * img.shape[0] // 12)[:, None],
            (np.arange(16) * img.shape[1] // 16)[None, :],
            :,
        ]
        got_img = np.frombuffer(bytes(r5["payload"]), np.uint8).reshape(
            12, 16, 3
        )
        np.testing.assert_array_equal(got_img, want)

    def test_mixed_container_dispatch(self, spark):
        from spapy_spark.operators import multimodal
        from spapy_spark.sources import png

        media = multimodal.synth_media(spark, n=8, codec="mixed")
        feats = multimodal.image_features(media, n_bins=4,
                                          fake=False).collect()
        assert len(feats) == 8
        # verify one of each container against a driver-side decode
        rows = {r["media_id"]: bytes(r["payload"])
                for r in media.collect()}
        assert rows[0][:8] == b"\x89PNG\r\n\x1a\n"
        assert rows[1][:2] == b"\xff\xd8"
        for mid, dec in ((0, png.decode_png), (1, jpeg.decode_jpeg)):
            img = dec(rows[mid])
            got = np.array(
                [f["features"] for f in feats if f["media_id"] == mid][0],
                dtype=np.float32,
            ).reshape(3, 4)
            for ch in range(3):
                h = np.bincount(
                    img[:, :, ch].ravel().astype(np.int64) * 4 // 256,
                    minlength=4,
                )
                np.testing.assert_allclose(got[ch], h / h.sum(), rtol=1e-6)


class Test12Bit:
    """T.81 extended sequential at 12-bit precision (r4 VERDICT codec
    seam): SOF1, Pq=1 quant tables, flat Huffman tables for the wider
    categories, uint16 pixels."""

    @staticmethod
    def _smooth12(h=40, w=56, bands=1):
        gy, gx = np.mgrid[0:h, 0:w]
        planes = [
            (2048 + 1500 * np.sin(gx / 17.0 + c)
             + 400 * np.cos(gy / 9.0)).clip(0, 4095)
            for c in range(bands)
        ]
        a = np.stack(planes, -1).astype(np.uint16)
        return a[:, :, 0] if bands == 1 else a

    def test_gray_roundtrip_quality(self):
        img = self._smooth12()
        enc = jpeg.encode_jpeg(img, quality=95, precision=12)
        dec = jpeg.decode_jpeg(enc)
        assert dec.dtype == np.uint16 and dec.shape == (40, 56, 1)
        err = np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max()
        assert err < 32  # ~0.8% of the 12-bit range at q95
        # SOF1 with precision byte 12 present; no SOF0
        assert b"\xff\xc1" in enc and b"\xff\xc0" not in enc
        i = enc.index(b"\xff\xc1")
        assert enc[i + 4] == 12

    def test_rgb_roundtrip_and_subsampling(self):
        img = self._smooth12(bands=3)
        for sub in ("4:4:4", "4:2:0"):
            enc = jpeg.encode_jpeg(img, quality=97, precision=12,
                                   subsampling=sub)
            dec = jpeg.decode_jpeg(enc)
            assert dec.dtype == np.uint16
            err = np.abs(dec.astype(int) - img.astype(int)).max()
            assert err < (40 if sub == "4:4:4" else 160)

    def test_dqt_is_16bit(self):
        img = self._smooth12()
        enc = jpeg.encode_jpeg(img, quality=85, precision=12)
        i = enc.index(b"\xff\xdb")
        assert enc[i + 4] >> 4 == 1  # Pq=1: 16-bit entries

    def test_restart_markers_12bit(self):
        img = self._smooth12(48, 40)
        plain = jpeg.decode_jpeg(jpeg.encode_jpeg(img, precision=12))
        enc = jpeg.encode_jpeg(img, precision=12, restart_interval=3)
        np.testing.assert_array_equal(jpeg.decode_jpeg(enc), plain)

    def test_guards(self):
        with pytest.raises(ValueError, match="uint16"):
            jpeg.encode_jpeg(np.zeros((8, 8), np.uint8), precision=12)
        with pytest.raises(ValueError, match="4096"):
            jpeg.encode_jpeg(np.full((8, 8), 5000, np.uint16),
                             precision=12)
        with pytest.raises(ValueError, match="8 or 12"):
            jpeg.encode_jpeg(np.zeros((8, 8), np.uint8), precision=10)

    def test_multimodal_display_conversion(self):
        from spapy_spark.operators import multimodal as mm

        img = self._smooth12(16, 24)
        enc = jpeg.encode_jpeg(img, quality=95, precision=12)
        out = mm.decode_image(enc, {"width": 24, "height": 16,
                                    "channels": 1}, fake=False)
        assert out.dtype == np.uint8
        # high-nibble conversion tracks the source
        exp = (jpeg.decode_jpeg(enc) >> 4).astype(np.uint8)
        np.testing.assert_array_equal(out, exp)
