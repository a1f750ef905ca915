"""Polymorphic input dispatch — the reference's ``SpaBase.GetInput``
(/root/reference/SpaBase.py:131-155) as a reader registry keyed by
extension.  Everything lands as a DataFrame; geometry is WKB."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_any(spark: SparkSession, path: str) -> DataFrame:
    """str path → DataFrame, dispatched on extension (GetInput parity:
    a string is dispatched on extension, anything unknown raises)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".shp":
        from . import shapefile

        return shapefile.read_spark(spark, path)
    if ext in ("", ".parquet"):
        return spark.read.parquet(path)
    if ext == ".csv":
        return spark.read.option("header", "true").option(
            "inferSchema", "true"
        ).csv(path)
    if ext == ".json":
        return spark.read.json(path)
    raise ValueError(f"unsupported input extension {ext!r} for {path}")
