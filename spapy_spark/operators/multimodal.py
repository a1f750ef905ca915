"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms.  With ``fake=False`` every modality
decodes REAL payloads through from-scratch codecs (no PIL/ffmpeg/
soundfile): PNG (sources/png.py), baseline JPEG (sources/jpeg.py),
GIF (sources/gif.py), BMP (sources/bmp.py), RIFF/WAVE audio
(sources/wav.py), and YUV4MPEG2 video (sources/y4m.py), dispatched
on the container signature.  ``fake=True`` keeps a deterministic
byte-tiling stand-in for synthetic pipelines.  WebP and compressed
video (H.264 …) are the remaining seams — each needs a real
VP8/H.264 decoder stack by design.

Schema conventions:

- media row: (media_id long, kind string, payload binary,
  meta struct<width int, height int, channels int, sample_rate int,
  n_frames int>)
- features: fixed-size array<float> per item (embedding-ready).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def _fake_decode(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → (H, W, C) uint8 array by
    tiling the payload (pure function of the payload bytes)."""
    raw = np.frombuffer(payload, dtype=np.uint8)
    need = width * height * channels
    if len(raw) == 0:
        raw = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(need / len(raw)))
    return np.tile(raw, reps)[:need].reshape(height, width, channels)


def _md(m) -> dict:
    return dict(m) if isinstance(m, dict) else dict(m._asdict())


def decode_image(payload: bytes, meta: dict, fake: bool = True) -> np.ndarray:
    """Decode one image payload → (H, W, C) uint8.

    ``fake=False`` decodes REAL payloads through the from-scratch
    codecs, dispatched on the container signature: PNG
    (sources/png.py — stdlib zlib + numpy, all five filter types),
    baseline JPEG (sources/jpeg.py — Huffman + IDCT + YCbCr, 4:4:4 /
    4:2:0), GIF (sources/gif.py — LZW + palettes, first composed
    frame), BMP (sources/bmp.py — BI_RGB 8/24/32-bit), and 1-frame
    YUV4MPEG2 (sources/y4m.py — BT.601 → RGB).  ``fake=True`` keeps
    the deterministic byte-tiling stand-in for synthetic
    pipelines/tests that don't carry encoded payloads.
    """
    if not fake:
        payload = bytes(payload)
        if payload[:2] == b"\xff\xd8":
            from ..sources import jpeg

            img = jpeg.decode_jpeg(payload)
            if img.dtype == np.uint16:
                # 12-bit extended sequential: high-nibble display
                # conversion, mirroring the 16-bit PNG branch
                img = (img >> 4).astype(np.uint8)
        elif payload[:8] == b"\x89PNG\r\n\x1a\n":
            from ..sources import png

            img = png.decode_png(payload)
            if img.dtype == np.uint16:
                # operator contract is uint8: take the high byte
                # (the standard 16→8-bit display conversion)
                img = (img >> 8).astype(np.uint8)
        elif payload[:9] == b"YUV4MPEG2":
            from ..sources import y4m

            _, frames = y4m.decode_y4m(payload, limit=1)
            img = y4m.yuv_to_rgb(*frames[0])
        elif payload[:4] == b"GIF8":
            from ..sources import gif

            _, frames = gif.decode_gif(payload, limit=1)
            img = frames[0]
        elif payload[:2] == b"BM":
            from ..sources import bmp

            img = bmp.decode_bmp(payload)
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from ..sources import webp

            img = webp.decode_webp(payload)  # VP8L; lossy VP8 raises
        else:
            raise ValueError(f"not an image payload ({payload[:4]!r})")
        if meta.get("channels") and img.shape[2] != meta["channels"]:
            raise ValueError(
                f"meta/channels mismatch: {img.shape[2]} != {meta['channels']}"
            )
        return img
    return _fake_decode(
        payload, meta["width"], meta["height"], meta["channels"]
    )


def decode_audio(payload: bytes, meta: dict,
                 fake: bool = True) -> tuple[np.ndarray, int]:
    """Decode one audio payload → ((n, channels) samples, sample_rate).

    ``fake=False`` decodes REAL RIFF/WAVE bytes through the
    from-scratch codec (sources/wav.py — PCM 8/16/24/32 + IEEE float);
    ``fake=True`` tiles the payload bytes into a deterministic mono
    signal, mirroring ``_fake_decode`` for images."""
    if not fake:
        from ..sources import wav

        return wav.decode_wav(bytes(payload))
    raw = np.frombuffer(bytes(payload), np.uint8)
    if len(raw) == 0:
        raw = np.zeros(1, np.uint8)
    return raw[:, None], int(meta.get("sample_rate") or 16000)


def _to_unit_float(x: np.ndarray) -> np.ndarray:
    """Samples of any supported dtype → float64 in [-1, 1]."""
    k, sz = x.dtype.kind, x.dtype.itemsize
    x = x.astype(np.float64)
    if k == "u":
        return (x - 128.0) / 128.0
    if k == "i":
        return x / float(1 << (8 * sz - 1))
    return x


def audio_features(
    df: DataFrame,
    n_bands: int = 8,
    payload: str = "payload",
    meta: str = "meta",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Per-clip feature vector: [duration_sec, rms, peak,
    zero_crossing_rate] + ``n_bands`` equal-width spectral-energy
    fractions (rfft power, L1-normalized) — the audio analog of
    ``image_features``.  Channels are averaged to mono first."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("features", ArrayType(FloatType()), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for p, m in zip(pdf[payload], pdf[meta]):
                samples, rate = decode_audio(bytes(p), _md(m), fake=fake)
                x = _to_unit_float(samples).mean(axis=1)
                n = len(x)
                dur = n / float(rate)
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                peak = float(np.abs(x).max()) if n else 0.0
                sgn = np.signbit(x)
                zcr = float(np.mean(sgn[1:] != sgn[:-1])) if n > 1 else 0.0
                spec = np.abs(np.fft.rfft(x)) ** 2
                edges = np.linspace(0, len(spec), n_bands + 1).astype(int)
                bands = np.add.reduceat(spec, edges[:-1])
                tot = bands.sum()
                bands = bands / tot if tot > 0 else bands
                feats.append(
                    np.concatenate([[dur, rms, peak, zcr], bands])
                    .astype(np.float32).tolist()
                )
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(run, schema=out_schema)


def image_features(
    df: DataFrame,
    n_bins: int = 16,
    payload: str = "payload",
    meta: str = "meta",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Per-image feature vector: channel-wise intensity histogram
    (n_bins per channel, L1-normalized) — the feature-extract stage of
    a multimodal training pipeline.  Decode + histogram are vectorized
    per batch; output is embedding-shaped (array<float>)."""
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("features", ArrayType(FloatType()), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            metas = [_md(m) for m in pdf[meta]]
            # decode is per-item (the codec seam); everything after is
            # ONE vectorized pass over the whole batch's pixels
            imgs = [
                decode_image(bytes(p), md, fake=fake)
                for p, md in zip(pdf[payload], metas)
            ]
            chans = np.array([im.shape[2] for im in imgs], dtype=np.int64)
            sizes = np.array([im.size for im in imgs], dtype=np.int64)
            # global histogram slot per pixel:
            #   img_base + channel·n_bins + val·n_bins//256
            base = np.concatenate([[0], np.cumsum(chans)]) * n_bins
            flat = np.concatenate([im.ravel() for im in imgs])  # C-fastest
            cidx = np.concatenate(
                [np.arange(sz) % c for sz, c in zip(sizes, chans)]
            )
            slot = (
                np.repeat(base[:-1], sizes)
                + cidx * n_bins
                + flat.astype(np.int64) * n_bins // 256
            )
            counts = np.bincount(slot, minlength=int(base[-1]))
            feats = []
            for j in range(len(imgs)):
                h = counts[base[j] : base[j + 1]].reshape(chans[j], n_bins)
                s = h.sum(axis=1, keepdims=True)
                norm = np.where(s > 0, h / np.maximum(s, 1), h)
                feats.append(norm.ravel().astype(np.float32).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload: str = "payload",
    meta: str = "meta",
    fake: bool = True,
) -> DataFrame:
    """Nearest-neighbor resize (integer-stride gather — the same kernel
    family as the reference's NN raster resample,
    /root/reference/SpaRasters.py:1390-1498); payload re-encoded as the
    raw resized buffer, meta updated."""
    schema = df.schema

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mds = [_md(m) for m in pdf[meta]]
            imgs = [
                decode_image(bytes(p), md, fake=fake)
                for p, md in zip(pdf[payload], mds)
            ]
            # one stacked gather per distinct input shape (images in a
            # crawl batch cluster into few shape groups; the gather is
            # a single vectorized fancy-index over the whole stack)
            payloads = [None] * len(imgs)
            groups: dict = {}
            for j, im in enumerate(imgs):
                groups.setdefault(im.shape, []).append(j)
            for (h, w, c), idxs in groups.items():
                stack = np.stack([imgs[j] for j in idxs])
                ys = np.arange(out_h) * h // out_h
                xs = np.arange(out_w) * w // out_w
                res = stack[:, ys[:, None], xs[None, :], :]
                for pos, j in enumerate(idxs):
                    payloads[j] = res[pos].tobytes()
            metas = []
            for md in mds:
                md = dict(md)
                md.update(width=out_w, height=out_h)
                metas.append(md)
            out = pdf.copy()
            out[payload] = payloads
            out[meta] = metas
            yield out

    return df.mapInPandas(run, schema=schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    payload: str = "payload",
    meta: str = "meta",
    id_col: str = "media_id",
    fake: bool = True,
) -> DataFrame:
    """Video → sampled frame rows (media_id, frame_idx, payload, meta).

    ``fake=False`` parses REAL YUV4MPEG2 payloads (sources/y4m.py):
    skipped frames are seeked over by size, kept frames re-emit as
    single-frame Y4M payloads that ``decode_image`` (and therefore
    ``image_features``/``resize_images``) accept directly.  The fake
    path treats the payload as n_frames equal byte slices.
    """
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("frame_idx", IntegerType(), False),
            StructField(payload, df.schema[payload].dataType, False),
            StructField(meta, df.schema[meta].dataType, False),
        ]
    )

    def run_real(batches):
        from ..sources import y4m

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, fidxs, pls, metas = [], [], [], []
            for mid, p, m in zip(pdf[id_col], pdf[payload], pdf[meta]):
                params, frames = y4m.decode_y4m(bytes(p), every_n=every_n)
                md = _md(m)
                for k, fr in enumerate(frames):
                    ids.append(mid)
                    fidxs.append(k * every_n)
                    pls.append(y4m.encode_y4m(
                        [fr], fps=params["fps"] or 25.0,
                        colorspace=params["colorspace"]))
                    metas.append(dict(
                        md, width=params["width"], height=params["height"],
                        n_frames=1))
            yield pd.DataFrame({
                id_col: ids, "frame_idx": np.array(fidxs, np.int32),
                payload: pls, meta: metas,
            })

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mds = [_md(m) for m in pdf[meta]]
            bufs = [bytes(b) for b in pdf[payload]]
            nf = np.array([md.get("n_frames") or 1 for md in mds], np.int64)
            steps = np.array(
                [max(1, len(b) // n) for b, n in zip(bufs, nf)], np.int64
            )
            per_row = (nf + every_n - 1) // every_n  # frames kept per row
            row_of = np.repeat(np.arange(len(pdf)), per_row)
            # frame index within each row: global arange minus the
            # row's running offset, times the stride
            offs = np.concatenate([[0], np.cumsum(per_row)])[:-1]
            fidx = (np.arange(len(row_of)) - offs[row_of]) * every_n
            pls = [
                bufs[j][fi * steps[j] : (fi + 1) * steps[j]]
                for j, fi in zip(row_of, fidx)
            ]
            metas = [dict(mds[j], n_frames=1) for j in row_of]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[row_of],
                    "frame_idx": fidx.astype(np.int32),
                    payload: pls,
                    meta: metas,
                }
            )

    return df.mapInPandas(run if fake else run_real, schema=out_schema)


def synth_media(
    spark, n: int = 50, kind: str = "image", png: bool = False,
    codec: str | None = None,
) -> DataFrame:
    """Deterministic media table for tests.  ``codec`` selects REAL
    payloads for the ``fake=False`` decode path: ``"png"`` (from-
    scratch encoder, one filter type per row cycled 0..4), ``"jpeg"``
    (baseline, 4:4:4/4:2:0 alternating), ``"mixed"`` (PNG/JPEG
    alternating — exercises the signature dispatch), ``"wav"`` (RIFF
    PCM int16, deterministic sine mixes), or ``"y4m"`` (YUV4MPEG2
    C420, deterministic planes).  ``png=True`` is the pre-JPEG
    spelling of ``codec="png"``."""
    if codec is None and png:
        codec = "png"
    rows = []
    for i in range(n):
        w, h, c = 32 + (i % 3) * 16, 24 + (i % 2) * 8, 3
        if codec == "wav":
            from ..sources import wav as _wav

            rate = 8000
            t = np.arange(rate // 4 + i * 100, dtype=np.float64)
            x = 0.5 * np.sin(2 * np.pi * (220.0 + 55.0 * (i % 4)) * t
                             / rate)
            payload = _wav.encode_wav(
                np.round(x * 32767.0).astype(np.int16), rate)
            rows.append((i, "audio", payload, (0, 0, 1, rate, 1)))
            continue
        if codec == "y4m":
            from ..sources import y4m as _y4m

            nf = 12 + (i % 3)
            frames = []
            yy, xx = np.mgrid[0:h, 0:w]
            for fr in range(nf):
                y = ((xx * (i + 3) + yy + fr * 7) % 256).astype(np.uint8)
                u = np.full((h // 2, w // 2), (fr * 11 + i) % 256,
                            np.uint8)
                v = np.full((h // 2, w // 2), (fr * 5 + 2 * i) % 256,
                            np.uint8)
                frames.append((y, u, v))
            payload = _y4m.encode_y4m(frames, fps=25.0)
            rows.append((i, "video", payload, (w, h, 3, 0, nf)))
            continue
        if codec is not None:
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [((xx * (i + 3) + yy * ch + ch) % 256) for ch in range(c)],
                axis=2,
            ).astype(np.uint8)
            use = codec if codec != "mixed" else ("png", "jpeg")[i % 2]
            if use == "png":
                from ..sources import png as _png

                payload = _png.encode_png(img, filter_type=i % 5)
            else:
                from ..sources import jpeg as _jpeg

                payload = _jpeg.encode_jpeg(
                    img, quality=90,
                    subsampling=("4:4:4", "4:2:0")[i % 2],
                )
        else:
            payload = bytes(
                ((np.arange(200, dtype=np.int64) * (i + 7)) % 251).astype(
                    np.uint8
                )
            )
        nf = 20 if kind == "video" else 1
        rows.append((i, kind, payload, (w, h, c, 0, nf)))
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("payload", BinaryType(), False),
            StructField("meta", META_SCHEMA, False),
        ]
    )
    return spark.createDataFrame(rows, schema)
