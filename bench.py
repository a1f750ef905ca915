"""Benchmark harness (driver contract: prints ONE JSON line).

Headline = the north-rule flagship pipeline over synthetic Common-Crawl
-style web pages (sources/synth.py, input_hint schema): regex geocode →
Z-order cell encode → broadcast PIP join vs the zone layer → per-tile
counts.  Throughput is reported as docs/sec alongside the per-query
wall times over the driver's sf tables.

Env:
  SPARK_GRAFT_SF_DIR   table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] parallelism (default 32)
  SPARK_GRAFT_BENCH_DOCS  synthetic doc count for the flagship
                          (default 1_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from spapy_spark import entry_queries as eq  # noqa: E402
from spapy_spark.operators import geocode, pip  # noqa: E402
from spapy_spark.session import get_spark  # noqa: E402
from spapy_spark.sources import synth  # noqa: E402


def flagship_pipeline(spark, n_docs: int) -> tuple[int, int]:
    """Full north-rule pipeline; returns (docs_in, pip_rows)."""
    docs = synth.webpages(spark, n_docs)
    geo = geocode.geocode_coords(docs, text_col="text").where(
        F.col("lat").isNotNull()
    )
    zones = synth.zones(spark)
    hits = pip.pip_join_broadcast(
        geo, zones, x="lon", y="lat", point_cols=["url"]
    )
    tiles = hits.groupBy("zone_id").agg(F.count(F.lit(1)).alias("n_docs"))
    rows = tiles.agg(F.sum("n_docs")).collect()[0][0]
    return n_docs, int(rows or 0)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "1000000"))
    sf = 0.1 if "0.1" in sf_dir else (0.01 if "0.01" in sf_dir else 0.001)

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + python workers once (tiny run, not timed as headline)
    flagship_pipeline(spark, 10_000)

    t0 = time.time()
    docs_in, pip_rows = flagship_pipeline(spark, n_docs)
    flagship_sec = time.time() - t0

    per_q: dict[str, float] = {}
    queries = eq.build_queries()
    for name in (
        "pip_zones",
        "tiling_counts",
        "geocode_roundtrip",
        "knn_sites",
        "dedup_exact",
        "text_stats",
        "tpch_q1",
        "events_hourly",
    ):
        t = time.time()
        # count() forces full execution without driver-collecting results
        queries[name](spark, sf_dir).count()
        per_q[name] = round(time.time() - t, 3)

    out = {
        "metric": "flagship_pip_pipeline_wall",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": per_q,
        "sf": sf,
        "docs": docs_in,
        "docs_per_sec": round(docs_in / flagship_sec, 1),
        "pip_rows": pip_rows,
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
