"""Partitioned table layout — the engine's Iceberg-style storage story.

The north rule names Iceberg tables; Iceberg's runtime jars are not in
this sandbox, so the layout layer targets the equivalent Spark-native
mechanism: hive-partitioned parquet with directory-level partition
pruning (SURVEY §4.2 "partition layout by coarse cell + warc_ts
date").  The write path computes the partition columns the reader
prunes on:

- ``p_cell``  — coarse Z-order cell (default res 4: 256 world tiles),
  so spatial queries touch only the directories their query window
  covers;
- ``p_date`` — the warc_ts day, so time-bounded crawls prune the rest.

``read_documents`` returns the table with partition columns attached;
tests assert ``PartitionFilters`` (not just PushedFilters) appear in
the physical scan when filtering on these columns.  Swapping in real
Iceberg is a format-string change — the partition spec carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.pip import cell_encode

PARTITION_RES = 4


def write_documents(
    docs: DataFrame,
    path: str,
    lat: str = "lat",
    lon: str = "lon",
    ts: str = "warc_ts",
    mode: str = "overwrite",
) -> None:
    """Write the documents table partitioned by (p_cell, p_date).

    Rows without coordinates land in the p_cell=-1 partition (still
    prunable for spatial queries).
    """
    enc = cell_encode(
        docs.withColumn(lat, F.col(lat)), PARTITION_RES, y=lat, x=lon,
        out="p_cell",
    )
    enc = enc.withColumn(
        "p_cell",
        F.when(F.col(lat).isNotNull(), F.col("p_cell")).otherwise(
            F.lit(-1)
        ),
    ).withColumn("p_date", F.to_date(F.col(ts)))
    enc.write.mode(mode).partitionBy("p_cell", "p_date").parquet(path)


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def cells_for_bbox(lon_min, lat_min, lon_max, lat_max) -> list[int]:
    """Partition cells covering a query bbox — the pruning predicate
    for spatial reads: ``col('p_cell').isin(cells_for_bbox(...))``."""
    from .. import cells as c

    return c.cover_bbox(
        lon_min, lat_min, lon_max, lat_max, PARTITION_RES
    ).tolist()


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int,
    key: str,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed table (Spark-native Hive bucketing — the Iceberg
    ``bucket(N, key)`` transform's equivalent): data is pre-shuffled
    into ``n_buckets`` files by ``key`` AT WRITE TIME, so every later
    equi-join or aggregation on the key runs with NO exchange — the
    co-located-join storage story for the repeatedly-joined 100 TB
    fact tables (points × zones assignments, doc ↔ dedup-cluster maps).

    ``sort=True`` additionally sorts within buckets, removing the
    join's Sort as well (plan becomes scan → SortMergeJoin directly).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
