"""Structured Streaming surface for the events table.

The reference is a pure batch library (no streams anywhere —
SURVEY.md §2.11); the north rule's *resumability* is handled by batch
checkpoints (plans/checkpoint.py).  This module is the optional
streaming demo over the driver's ``events`` table: windowed aggregates
with watermarked late-data handling, runnable as a one-shot
``availableNow`` micro-batch over the parquet files so tests need no
long-running query.

Everything is built-in Structured Streaming — zero custom operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_events_stream(
    spark: SparkSession, path: str, schema=None
) -> DataFrame:
    """Parquet-directory file stream of the events table."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-type tumbling-window counts + value sums with a watermark
    bounding state for late data."""
    # watermarks need TIMESTAMP (tz-aware); parquet NTZ is cast (UTC session)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_available_now(
    agg: DataFrame, checkpoint_dir: str, out_dir: str
) -> None:
    """Drain all available input as micro-batches, then stop — the
    deterministic test/bench harness for the streaming plan.  The
    checkpoint dir makes reruns resume from the last committed offset
    (streaming's own exactly-once bookkeeping)."""
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup over an arriving crawl: first occurrence
    of each text fingerprint wins; re-crawled duplicates within the
    watermark horizon are dropped with BOUNDED state (fingerprints
    older than the watermark age out — the standard watermarked-
    dropDuplicates contract for unbounded streams).

    Pure built-in plan: md5 fingerprint (JVM codegen) →
    ``withWatermark`` → ``dropDuplicates([fp])`` — state is one tiny
    row per distinct fingerprint in the horizon, not per document.
    """
    docs = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        docs.withColumn("fp", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["fp"])
    )
