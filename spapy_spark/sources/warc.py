"""From-scratch WARC (Web ARChive, ISO 28500) reader/writer.

Common Crawl ships its 10^12-page corpus as WARC files — the north
rule's "Common-Crawl-style web pages" input.  This module implements
the container with stdlib only, same pattern as the other from-scratch
codecs (png.py, geotiff.py, wav.py):

- records are ``WARC/1.0`` header blocks + a ``Content-Length``-
  delimited payload (length-delimited, so payload bytes are NEVER
  scanned or re-encoded — the input_hint's byte-identical-text
  invariant holds through a container roundtrip);
- the real Common-Crawl layout gzips each record as its own gzip
  member so readers can split files without decompressing everything;
  ``build_warc(gzip_records=True)`` / ``parse_warc`` handle
  multi-member streams via zlib (wbits=31, MTIME=0 → deterministic
  bytes);
- Spark integration parses whole files inside ``mapInArrow`` — one
  Arrow batch of (path, blob) in, one batch of records out.  Files are
  the parallel unit (Common Crawl publishes millions of ~1 GB
  segments), so record splitting never needs a cross-partition scan.

The reference has no web-archive IO at all (its loaders are GDAL/OGR
wrappers, /root/reference/SpaVectors.py:195); this is north-rule
surface, not a port.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterable, Iterator

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def build_record(
    url: str,
    date: str,
    payload: bytes,
    rec_type: str = "response",
    content_type: str = "text/html",
) -> bytes:
    """One uncompressed WARC record (version line, named headers,
    blank line, payload, two CRLFs)."""
    if isinstance(payload, str):  # defensive: payloads are bytes
        raise TypeError("payload must be bytes")
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode("ascii")
    return head + payload + _CRLF + _CRLF


def _gzip_member(raw: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip wrapper, MTIME=0
    return co.compress(raw) + co.flush()


def build_warc(
    records: Iterable[tuple[str, str, bytes]], gzip_records: bool = False
) -> bytes:
    """Concatenate records into one WARC blob.  ``gzip_records=True``
    emits the Common-Crawl layout: one gzip member per record."""
    out = []
    for url, date, payload in records:
        raw = build_record(url, date, payload)
        out.append(_gzip_member(raw) if gzip_records else raw)
    return b"".join(out)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a multi-member gzip stream to one byte string."""
    out = []
    rest = blob
    while rest[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(31)
        out.append(d.decompress(rest))
        out.append(d.flush())
        rest = d.unused_data
    if rest:
        raise ValueError(f"trailing non-gzip bytes: {len(rest)}")
    return b"".join(out)


def parse_warc(blob: bytes) -> Iterator[dict]:
    """Yield records as dicts (rec_type, url, date, headers, payload).

    Length-delimited walk: headers end at the first blank line, the
    payload is exactly ``Content-Length`` bytes — payload contents are
    never inspected, so arbitrary binary (and stray ``WARC/1.0``
    strings inside pages) cannot desynchronize the parser.
    """
    if blob[:2] == _GZIP_MAGIC:
        blob = _gunzip_members(bytes(blob))
    view = memoryview(blob)
    off = 0
    n = len(blob)
    while off < n:
        # tolerate inter-record padding CRLFs
        while off < n and blob[off : off + 2] == _CRLF:
            off += 2
        if off >= n:
            break
        if blob[off : off + 5] != b"WARC/":
            raise ValueError(f"bad record start at byte {off}")
        hdr_end = blob.index(b"\r\n\r\n", off)
        lines = bytes(view[off:hdr_end]).decode("ascii").split("\r\n")
        headers = {}
        for line in lines[1:]:
            k, _, val = line.partition(":")
            headers[k.strip().lower()] = val.strip()
        length = int(headers["content-length"])
        body_start = hdr_end + 4
        payload = bytes(view[body_start : body_start + length])
        if len(payload) != length:
            raise ValueError("truncated record payload")
        yield {
            "rec_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "headers": headers,
            "payload": payload,
        }
        off = body_start + length


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

RECORD_SCHEMA = (
    "path string, rec_type string, url string, warc_date string,"
    " payload binary"
)


def records_df(df, blob_col: str = "warc", path_col: str | None = None):
    """Explode a DataFrame of WARC blobs into one row per record.

    Arrow-batched: each batch of blobs is parsed in one pass and the
    records are emitted as one Arrow batch — no per-row Python round
    trips, no payload copies beyond the record slice.
    """
    import pyarrow as pa

    cols = ([path_col] if path_col else []) + [blob_col]
    src = df.select(*cols)
    has_path = path_col is not None

    def gen(batches):
        for batch in batches:
            paths = (
                batch.column(0).to_pylist()
                if has_path
                else [""] * batch.num_rows
            )
            blobs = batch.column(1 if has_path else 0).to_pylist()
            out = {k: [] for k in
                   ("path", "rec_type", "url", "warc_date", "payload")}
            for p, blob in zip(paths, blobs):
                for rec in parse_warc(blob):
                    out["path"].append(p)
                    out["rec_type"].append(rec["rec_type"])
                    out["url"].append(rec["url"])
                    out["warc_date"].append(rec["date"])
                    out["payload"].append(rec["payload"])
            yield pa.RecordBatch.from_pydict(
                {
                    "path": pa.array(out["path"], pa.string()),
                    "rec_type": pa.array(out["rec_type"], pa.string()),
                    "url": pa.array(out["url"], pa.string()),
                    "warc_date": pa.array(out["warc_date"], pa.string()),
                    "payload": pa.array(out["payload"], pa.binary()),
                }
            )

    return src.mapInArrow(gen, RECORD_SCHEMA)


def read_warc(spark, path: str):
    """Read .warc / .warc.gz files into one row per record.

    ``binaryFile`` gives (path, content) splits per file; parsing
    happens executor-side.  At Common-Crawl scale the source lists
    millions of segment files — Spark's file index parallelizes the
    listing and each task parses whole files locally.
    """
    files = spark.read.format("binaryFile").load(path)
    return records_df(
        files.selectExpr("path", "content as warc"), "warc", "path"
    )


__all__ = [
    "build_record",
    "build_warc",
    "parse_warc",
    "records_df",
    "read_warc",
    "RECORD_SCHEMA",
]
