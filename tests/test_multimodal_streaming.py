"""Multimodal plumbing + Structured Streaming demo tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spapy_spark.operators import multimodal as mm
from spapy_spark.streaming import events as ev


def test_image_features_shape_and_determinism(spark):
    media = mm.synth_media(spark, n=20)
    out = mm.image_features(media, n_bins=16).collect()
    assert len(out) == 20
    for r in out:
        f = np.array(r["features"])
        assert f.shape == (16 * 3,)
        # per-channel histograms are L1-normalized
        assert f[:16].sum() == pytest.approx(1.0, abs=1e-5)
    # deterministic: second run identical
    out2 = mm.image_features(media, n_bins=16).collect()
    a = {r["media_id"]: r["features"] for r in out}
    b = {r["media_id"]: r["features"] for r in out2}
    assert a == b


def test_real_codec_seam_decodes_png(spark):
    # the fake=False seam is now a REAL from-scratch PNG decoder
    # (sources/png.py); garbage payloads fail loudly
    from spapy_spark.sources import png as _png

    img = (np.arange(2 * 2 * 3, dtype=np.uint8)).reshape(2, 2, 3)
    buf = _png.encode_png(img)
    out = mm.decode_image(buf, {"width": 2, "height": 2, "channels": 3},
                          fake=False)
    np.testing.assert_array_equal(out, img)
    with pytest.raises(ValueError):
        mm.decode_image(b"xx", {"width": 2, "height": 2, "channels": 3},
                        fake=False)


def test_resize_updates_meta_and_payload(spark):
    media = mm.synth_media(spark, n=6)
    out = mm.resize_images(media, out_w=8, out_h=4).collect()
    for r in out:
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
        assert len(bytes(r["payload"])) == 8 * 4 * 3


def test_frame_sample(spark):
    vids = mm.synth_media(spark, n=3, kind="video")
    out = ev_frames = mm.frame_sample(vids, every_n=5).collect()
    per = {}
    for r in out:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in per.items():
        assert sorted(idxs) == [0, 5, 10, 15]  # 20 frames, every 5th


def test_streaming_windowed_counts(spark, tmp_path):
    import shutil

    # file streams read directories: stage the events file into one
    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                src_dir / "part-0.parquet")
    src = str(src_dir)
    stream = ev.read_events_stream(spark, src)
    assert stream.isStreaming
    agg = ev.windowed_counts(stream, window="1 hour", watermark="2 hours")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    ev.run_available_now(agg, ck_dir, out_dir)
    got = spark.read.parquet(out_dir)
    # batch oracle: same agg computed in plain batch mode (append mode
    # emits only watermark-closed windows — all but the tail here)
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = {(r["window_start"], r["event_type"]): r["n"] for r in got.collect()}
    b = {(r["window"]["start"], r["event_type"]): r["n"]
         for r in batch.collect()}
    assert len(g) > 0
    for k, v in g.items():
        assert b[k] == v  # every emitted window matches the batch truth


def test_streaming_pip_pipeline_matches_batch(spark, tmp_path):
    """The streaming flagship (geocode→PIP over arriving crawl files)
    must converge to the batch pipeline's exact zone counts, including
    across a resume (second drain picks up only new files)."""
    from pyspark.sql import functions as F

    from spapy_spark.operators import geocode, pip
    from spapy_spark.sources import synth
    from spapy_spark.streaming import pipeline as sp

    src = tmp_path / "crawl_in"
    src.mkdir()
    ledger = str(tmp_path / "ledger")
    ck = str(tmp_path / "ck")
    zones = synth.zones(spark)

    # wave 1: first crawl chunk arrives
    synth.webpages(spark, 3000, partitions=2).write.mode("append").parquet(
        str(src)
    )
    stream = sp.read_webpages_stream(spark, str(src))
    sp.run_pip_stream(stream, zones, ledger, ck)

    # wave 2: more files arrive; a NEW drain resumes from the checkpoint
    synth.webpages(spark, 2000, partitions=2).where(
        F.col("url").isNotNull()
    ).write.mode("append").parquet(str(src))
    stream2 = sp.read_webpages_stream(spark, str(src))
    sp.run_pip_stream(stream2, zones, ledger, ck)

    got = {r["zone_id"]: r["n_docs"]
           for r in sp.zone_totals(spark, ledger).collect()}

    # batch oracle over everything that arrived
    all_docs = spark.read.parquet(str(src))
    geo = geocode.geocode_coords(all_docs).where(
        F.col("lat").isNotNull()).select("lat", "lon")
    want = {r["zone_id"]: r["n_docs"]
            for r in pip.pip_count_by_zone(geo, zones).collect()}
    assert got == want and len(want) > 10


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """dedup_stream over arriving crawl files == batch exact dedup
    (first occurrence per fingerprint), exercised via availableNow."""
    from spapy_spark.sources import synth as sy
    from spapy_spark.streaming import events as sev

    src = str(tmp_path / "crawl")
    # two files with overlapping duplicate texts (ids repeat mod 50)
    ids1 = np.arange(0, 100)
    ids2 = np.arange(50, 150)  # 50..99 duplicate text of file 1? no —
    # webpages text is a function of id, so duplicate IDS duplicate text
    pdf1 = sy.webpages_pdf(ids1 % 60)     # collisions inside the file
    pdf2 = sy.webpages_pdf(ids2 % 60)     # and across files
    spark.createDataFrame(pdf1.assign(
        warc_ts=pdf1["warc_ts"].dt.to_pydatetime()), schema=sy.WEBPAGES_SCHEMA
    ).write.mode("overwrite").parquet(src)
    spark.createDataFrame(pdf2.assign(
        warc_ts=pdf2["warc_ts"].dt.to_pydatetime()), schema=sy.WEBPAGES_SCHEMA
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(sy.WEBPAGES_SCHEMA).parquet(src)
    dd = sev.dedup_stream(stream)
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    (
        dd.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.read.parquet(out_dir)
    batch = spark.read.parquet(src).select(F.md5("text").alias("fp")).distinct()
    assert got.select("fp").distinct().count() == batch.count()
    assert got.count() == batch.count()  # exactly one row per fingerprint
