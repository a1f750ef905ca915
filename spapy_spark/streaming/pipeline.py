"""Streaming flagship: the geocode → PIP → tile-count pipeline over a
web-pages *stream* (new crawl files arriving in a directory).

Composition is the whole point: the exact batch operators
(geocode_coords, pip_count_by_zone) run unchanged inside foreachBatch;
streaming adds incremental input tracking + exactly-once sink
bookkeeping via the checkpoint location.  Zone counts accumulate in a
parquet ledger of per-batch partials — readers aggregate
``sum(n_docs) GROUP BY zone_id`` (the same partial/final shape as the
batch plan, extended across time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_webpages_stream(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    if schema is None:
        from ..sources.synth import WEBPAGES_SCHEMA

        schema = WEBPAGES_SCHEMA
    return spark.readStream.schema(schema).parquet(path)


def run_pip_stream(
    docs_stream: DataFrame,
    zones: DataFrame,
    ledger_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain available crawl files through geocode→PIP, appending
    per-batch (zone_id, n_docs, batch_id) partials to the ledger."""
    from ..operators import geocode, pip

    def process(batch_df: DataFrame, batch_id: int) -> None:
        geo = geocode.geocode_coords(batch_df).where(
            F.col("lat").isNotNull()
        ).select("lat", "lon")
        counts = pip.pip_count_by_zone(geo, zones)
        # foreachBatch is at-least-once: a batch replayed after a crash
        # between sink write and checkpoint commit must not double-count.
        # Writing each batch to its own batch_id=<id> partition dir with
        # overwrite makes the replay idempotent (same path, same rows).
        counts.write.mode("overwrite").parquet(
            f"{ledger_dir}/batch_id={batch_id}"
        )

    (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def zone_totals(spark: SparkSession, ledger_dir: str) -> DataFrame:
    """Final per-zone totals from the partial ledger."""
    return (
        spark.read.parquet(ledger_dir)
        .groupBy("zone_id")
        .agg(F.sum("n_docs").alias("n_docs"))
    )
