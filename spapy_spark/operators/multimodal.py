"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms.  The actual codec calls are STUBBED (no
PIL/ffmpeg in this environment): ``decode_image`` with
``fake=False`` raises NotImplementedError at the exact call site a
codec library would occupy, and the default deterministic fake decoder
exercises the full Spark-side contract — schema, batch shape, UDF
signature, partitioning — so swapping in a real codec is a one-function
change.

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


def decode_image(payload: bytes, meta: dict, fake: bool = True) -> np.ndarray:
    """Decode one image payload → (H, W, C) uint8.

    ``fake=False`` is the real-codec seam — PIL/turbojpeg goes here.
    """
    if not fake:
        raise NotImplementedError(
            "real image codec not available in this environment; "
            "plug PIL.Image.open/np.asarray here"
        )
    return _fake_decode(
        payload, meta["width"], meta["height"], meta["channels"]
    )


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
            ids, feats = [], []
            for r in pdf.itertuples(index=False):
                m = getattr(r, meta)
                md = m if isinstance(m, dict) else m._asdict()
                img = decode_image(bytes(getattr(r, payload)), md, fake=fake)
                hist = []
                for c in range(img.shape[2]):
                    h, _ = np.histogram(
                        img[:, :, c], bins=n_bins, range=(0, 256)
                    )
                    s = h.sum()
                    hist.append(h / s if s else h)
                ids.append(getattr(r, id_col))
                feats.append(
                    np.concatenate(hist).astype(np.float32).tolist()
                )
            yield pd.DataFrame({id_col: ids, "features": feats})

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
            payloads, metas = [], []
            for r in pdf.itertuples(index=False):
                m = getattr(r, meta)
                md = dict(m if isinstance(m, dict) else m._asdict())
                img = decode_image(bytes(getattr(r, payload)), md, fake=fake)
                ys = (np.arange(out_h) * md["height"] // out_h).astype(int)
                xs = (np.arange(out_w) * md["width"] // out_w).astype(int)
                res = img[np.ix_(ys, xs)]
                payloads.append(res.tobytes())
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

    The fake decoder treats the payload as n_frames stacked images;
    a real ffmpeg seam replaces ``decode_image`` per frame.
    """
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType, False),
            StructField("frame_idx", IntegerType(), False),
            StructField(payload, df.schema[payload].dataType, False),
            StructField(meta, df.schema[meta].dataType, False),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, idxs, pls, metas = [], [], [], []
            for r in pdf.itertuples(index=False):
                m = getattr(r, meta)
                md = dict(m if isinstance(m, dict) else m._asdict())
                n = md.get("n_frames") or 1
                buf = bytes(getattr(r, payload))
                step = max(1, len(buf) // n)
                for fi in range(0, n, every_n):
                    frame = buf[fi * step : (fi + 1) * step]
                    fm = dict(md)
                    fm["n_frames"] = 1
                    ids.append(getattr(r, id_col))
                    idxs.append(fi)
                    pls.append(frame)
                    metas.append(fm)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, payload: pls, meta: metas}
            )

    return df.mapInPandas(run, schema=out_schema)


def synth_media(spark, n: int = 50, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        w, h, c = 32 + (i % 3) * 16, 24 + (i % 2) * 8, 3
        payload = bytes(
            ((np.arange(200, dtype=np.int64) * (i + 7)) % 251).astype(np.uint8)
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
