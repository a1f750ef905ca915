"""Benchmark harness (driver contract: prints ONE JSON line).

Headline = the north-rule flagship pipeline over synthetic Common-Crawl
-style web pages (sources/synth.py, input_hint schema): parquet scan →
regex geocode (JVM) → broadcast PIP join (Arrow probe) → per-zone tile
counts.  The input table is materialized to parquet first (untimed —
table creation isn't the job; the 100 TB pipeline reads Iceberg), then
the timed job runs end-to-end, min of 3 repeats.

Per-query timings over the driver's sf tables follow.

Env:
  SPARK_GRAFT_SF_DIR            table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS              local[] parallelism (default 32)
  SPARK_GRAFT_BENCH_DOCS        synthetic doc count (default 2_000_000)
  SPARK_GRAFT_BENCH_ONLY_FLAGSHIP  skip the per-query section
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from spapy_spark import entry_queries as eq  # noqa: E402
from spapy_spark.operators import geocode, pip  # noqa: E402
from spapy_spark.session import get_spark  # noqa: E402
from spapy_spark.sources import synth  # noqa: E402

# single-machine bench tuning: modest heap + throughput GC keep kernel
# page churn down; small splits give even task waves on local cores
BENCH_CONF = {
    "spark.driver.memory": "8g",
    "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    "spark.sql.files.openCostInBytes": "0",
}


def materialize_docs(spark, n_docs: int, path: str) -> None:
    parts = max(64, n_docs // 62_500)
    synth.webpages(spark, n_docs, partitions=parts).write.mode(
        "overwrite"
    ).parquet(path)


def flagship_pipeline(spark, path: str):
    docs = spark.read.parquet(path)
    geo = geocode.geocode_coords(docs).where(
        F.col("lat").isNotNull()
    ).select("lat", "lon")
    # map-side-combined PIP counts: only ~|zones| partial rows per task
    # cross the Python→JVM boundary and the shuffle — the right plan
    # for a count aggregation (pip_join_broadcast materializes the 27M
    # pair stream nobody aggregates twice)
    return pip.pip_count_by_zone(geo, synth.zones(spark), x="lon", y="lat")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000000"))
    sf = 0.1 if "0.1" in sf_dir else (0.01 if "0.01" in sf_dir else 0.001)

    # split size tuned to give ~4 waves of tasks per core (≈220 parquet
    # bytes/doc measured; the old 90 under-estimate gave the high-core
    # run 4× more task waves than the low-core run)
    split = max(1, (n_docs * 220) // (4 * int(cpus))) if cpus.isdigit() else 3_000_000
    conf = dict(BENCH_CONF)
    conf["spark.sql.files.maxPartitionBytes"] = str(
        min(max(split, 1_000_000), 128 * 1024 * 1024)
    )
    spark = get_spark("bench", master=f"local[{cpus}]", extra=conf)
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="bench_docs_")
    docs_path = os.path.join(tmp, "docs")
    try:
        materialize_docs(spark, n_docs, docs_path)  # untimed input prep
        agg = flagship_pipeline(spark, docs_path)
        pip_rows = int(agg.agg(F.sum("n_docs")).collect()[0][0] or 0)  # warm
        runs = []
        for _ in range(3):
            t0 = time.time()
            agg.agg(F.sum("n_docs")).collect()
            runs.append(time.time() - t0)
        flagship_sec = min(runs)

        per_q: dict[str, float] = {}
        query_names = (
            ()
            if os.environ.get("SPARK_GRAFT_BENCH_ONLY_FLAGSHIP")
            else (
                "pip_zones",
                "pip_zones_cells",
                "tiling_counts",
                "geocode_roundtrip",
                "knn_sites",
                "knn_sites_grid",
                "within_dist",
                "overlay_boxes",
                "relate_counts",
                "buffer_area",
                "centroid_bounds",
                "crs_webmercator",
                "dedup_exact",
                "minhash_sigs",
                "simhash",
                "quality_scores",
                "doc_fingerprint",
                # production ANN plan (Arrow matmul); the posexplode
                # decimal twin stays contract-only as the oracle path
                "ann_cosine_arrow",
                "raster_sample",
                "raster_algebra_tiles",
                "text_stats",
                "lang_ngram",
                "events_sessions",
                "tpch_q1",
                "events_hourly",
                # round-3 operator families (terrain/raster-shape are
                # fixed-256² fixtures — cheap at any sf; the overlay
                # difference is the cell-pruned O(N·M) output)
                "overlay_boxes_general",
                "overlay_difference",
                "terrain_slope",
                "terrain_focal_stats",
                "resample_bilinear_stats",
                "polygonize_counts",
                "contour_counts",
                "crs_albers",
                "clip_bbox",
                "densify_counts",
                "streaming_hourly",
                # round-4 web-text + S2/WARC families
                "web_html_extract",
                "web_pii_redact",
                "web_doc_chunks",
                "web_tfidf_top",
                "web_geohash_tiles",
                "s2_tiles",
                "warc_extract",
                "doc_repetition",
                "lm_bigram_bits",
                "corpus_sample",
                "text_normalize",
                "inverted_index",
                "dup_spans",
                "contamination",
                "robots_wildcard",
                "robots_meta",
                "host_graph",
                # round-5 IO/datum families (fixed-size fixtures; the
                # vector roundtrips scale with sf via the orders keys)
                "crs_nad27",
                "geojson_roundtrip",
                "gpkg_roundtrip",
                "gpkg_bbox_window",
                "aaigrid_roundtrip",
                "png_raster_stats",
                "webp_raster_stats",
            )
        )
        queries = eq.build_queries()
        for name in query_names:
            # min of 2: the first call pays worker warmup + host drift;
            # the driver records these numbers, so report the stable one
            best = None
            for _ in range(2):
                t = time.time()
                queries[name](spark, sf_dir).count()
                dt = time.time() - t
                best = dt if best is None else min(best, dt)
            per_q[name] = round(best, 3)

        out = {
            "metric": "flagship_pip_pipeline_wall",
            "value": round(flagship_sec, 3),
            "unit": "sec",
            "queries": per_q,
            "sf": sf,
            "docs": n_docs,
            "docs_per_sec": round(n_docs / flagship_sec, 1),
            "pip_rows": pip_rows,
            "cpus": int(cpus) if cpus.isdigit() else cpus,
            "runs": [round(r, 3) for r in runs],
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
