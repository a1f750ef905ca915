"""Deterministic corpus sampling for training-data pipelines.

Web-scale corpus construction needs REPRODUCIBLE subsets: the same
sample must come out of every run, every engine, every partitioning —
``df.sample()``'s RNG-per-partition gives none of that.  Everything
here derives the keep/drop decision from a cryptographic hash of the
row key, so the sample is a pure function of the data:

* ``hash_sample`` — Bernoulli-style p% sampling by md5 bucket.  No
  shuffle at all: a per-row filter that composes with predicate
  pushdown (Catalyst keeps the scan-side filter).
* ``stratified_cap`` — at most k rows per stratum (per-domain caps,
  the Common-Crawl-style balancing step), picked by hash order so the
  winners are stable under repartitioning.  One shuffle on the
  stratum key; the rank window is partial-aggregated by
  WindowGroupLimit before the exchange on Spark 3.5+/4.x.

These extend the reference's surface (SpaPy has no sampling ops,
/root/reference/SpaVectors.py) per the driver's
training-data-pipeline mandate; oracle rows live in
entry_queries4.py (``corpus_sample``).

Cross-engine contract: bucket = first 7 hex chars of md5(key-as-
string) read as an integer, mod ``buckets`` — DuckDB spells the same
thing ``('0x' || substr(md5(k), 1, 7))::BIGINT % buckets``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def hash_bucket_col(key: Column, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets) from md5 of the key's
    string form (salt prefix lets independent samples coexist)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % buckets
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    pct: int,
    buckets: int = 100,
    salt: str = "",
    out: str = "bucket",
) -> DataFrame:
    """Keep rows whose hash bucket < pct — a reproducible ~pct%
    Bernoulli sample, identical under any partitioning/engine."""
    if not (0 <= pct <= buckets):
        raise ValueError("pct must be in [0, buckets]")
    b = hash_bucket_col(F.col(key_col), buckets, salt)
    return df.withColumn(out, b).where(F.col(out) < pct)


def stratified_cap(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str,
    out: str = "rk",
) -> DataFrame:
    """At most k rows per stratum, chosen by (hash, id) order — the
    per-domain balancing cap.  Hash order ≈ uniform random but fully
    reproducible; the id tiebreak makes the pick total even on hash
    collisions."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket_col(F.col(id_col), 1 << 28), F.col(id_col)
    )
    return (
        df.withColumn(out, F.row_number().over(w))
        .where(F.col(out) <= k)
        .withColumn(out, F.col(out).cast("long"))
    )
