"""WARC container (sources/warc.py): byte-exact roundtrips, the
Common-Crawl per-record-gzip layout, parser robustness, and the Spark
file-reader path."""

import os

import pytest

from spapy_spark.sources import warc


RECS = [
    ("http://a.example/1", "2024-01-01T00:00:00Z", b"hello world"),
    ("http://b.example/2", "2024-01-01T00:00:01Z", b""),
    # payload containing a fake record start must not desync the parser
    ("http://c.example/3", "2024-01-01T00:00:02Z",
     b"WARC/1.0\r\nContent-Length: 999\r\n\r\nnot a real record"),
    # arbitrary binary (not UTF-8)
    ("http://d.example/4", "2024-01-01T00:00:03Z", bytes(range(256))),
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    blob = warc.build_warc(RECS, gzip_records=gz)
    out = list(warc.parse_warc(blob))
    assert [(r["url"], r["date"], r["payload"]) for r in out] == RECS
    assert all(r["rec_type"] == "response" for r in out)


def test_gzip_members_are_independent():
    blob = warc.build_warc(RECS, gzip_records=True)
    # each record is its own gzip member: the blob contains one magic
    # per record and the FIRST member alone decodes to record 1
    assert blob.count(b"\x1f\x8b\x08") >= len(RECS)
    import zlib

    d = zlib.decompressobj(31)
    first = d.decompress(blob)
    rec = next(warc.parse_warc(first))
    assert rec["url"] == RECS[0][0]


def test_deterministic_bytes():
    assert warc.build_warc(RECS, gzip_records=True) == warc.build_warc(
        RECS, gzip_records=True
    )


def test_bad_start_raises():
    with pytest.raises(ValueError):
        list(warc.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n"))


def test_truncated_payload_raises():
    blob = warc.build_warc(RECS[:1])
    with pytest.raises(ValueError):
        list(warc.parse_warc(blob[:-10]))


def test_str_payload_rejected():
    with pytest.raises(TypeError):
        warc.build_record("u", "d", "not bytes")


def test_read_warc_spark(spark, tmp_path):
    d = tmp_path / "segs"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(
        warc.build_warc(RECS[:2], gzip_records=True)
    )
    (d / "b.warc").write_bytes(warc.build_warc(RECS[2:]))
    out = warc.read_warc(spark, str(d)).orderBy("url").collect()
    assert [(r["url"], bytes(r["payload"])) for r in out] == [
        (u, p) for u, _, p in RECS
    ]
    assert all(os.path.basename(r["path"]) in ("a.warc.gz", "b.warc")
               for r in out)


def test_records_df_batch(spark):
    blob1 = warc.build_warc(RECS[:2], gzip_records=True)
    blob2 = warc.build_warc(RECS[2:])
    df = spark.createDataFrame([(1, blob1), (2, blob2)], "gid int, warc binary")
    out = warc.records_df(df, "warc").orderBy("url").collect()
    assert [r["url"] for r in out] == [u for u, _, _ in RECS]
