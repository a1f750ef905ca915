"""Approximate nearest-neighbor search over embedding columns.

Two strategies per the training-data-pipeline mandate:

- ``cosine_topk``    — exact brute-force baseline: broadcast the query
  set, dot products via posexplode + decimal-exact sums (JVM-side, no
  Python; bit-reproducible in the DuckDB oracle).
- ``lsh_cosine_topk``— scale path: deterministic random-hyperplane LSH.
  A vectorized pandas UDF projects each embedding onto ``n_planes``
  splitmix-generated hyperplanes → sign-bit bucket; candidates =
  bucket collisions (multi-probe over exact bucket + 1-bit flips);
  exact cosine re-rank inside buckets only.

At 10^9+ vectors the LSH path is one narrow projection + one
equi-join; the brute path is the correctness oracle at test scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType

from ..sources.synth import _mix


def _norms(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Decimal-exact L2 norms (deterministic across engines)."""
    e = df.select(id_col, F.posexplode(vec_col).alias("pos", "v"))
    return e.groupBy(id_col).agg(
        F.sqrt(
            F.sum(
                (F.col("v").cast("double") * F.col("v").cast("double")).cast(
                    "decimal(28,12)"
                )
            ).cast("double")
        ).alias("norm")
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).

    Dot products via position join + decimal-exact sum; ties broken by
    (cosine desc, vec_id).  Output: (query_id, vec_id, rank, cosine).
    """
    qe = queries.select(
        F.col(query_id), F.posexplode(vec_col).alias("pos", "qv")
    )
    ve = vectors.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "vv")
    )
    dots = (
        ve.join(F.broadcast(qe), "pos")
        .groupBy(query_id, id_col)
        .agg(
            F.sum(
                (F.col("qv").cast("double") * F.col("vv").cast("double"))
                .cast("decimal(28,12)")
            ).cast("double").alias("dot")
        )
    )
    qn = _norms(queries, query_id, vec_col).withColumnRenamed("norm", "qn")
    vn = _norms(vectors, id_col, vec_col).withColumnRenamed("norm", "vn")
    cos = (
        dots.join(F.broadcast(qn), query_id)
        .join(vn, id_col)
        .withColumn("cosine", F.col("dot") / (F.col("qn") * F.col("vn")))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        cos.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "rank", "cosine")
    )


def cosine_topk_arrow(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k — the PRODUCTION brute plan.

    ``cosine_topk`` is the decimal-exact oracle twin but posexplodes
    every vector into ``dim`` rows (dim× shuffle inflation — the r1
    perf audit's finding).  This variant broadcasts the small query
    block and does one float64 matmul per Arrow batch with a per-batch
    (cosine desc, vec_id) top-k, so only ``batches × q × k`` candidate
    rows ever leave the scan — no row inflation, no wide shuffle.
    Results are identical up to float64-vs-decimal summation order
    (≤1 ulp); ties (duplicate vectors) break identically by vec_id.
    """
    spark = vectors.sparkSession
    qrows = queries.select(query_id, vec_col).collect()
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qn = np.sqrt((Q * Q).sum(axis=1))
    bc = spark.sparkContext.broadcast((qids, Q, qn))
    src = vectors.select(id_col, vec_col)

    def probe(batches):
        import pyarrow as pa

        qids_, Q_, qn_ = bc.value
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            flat = batch.column(vec_col).flatten().to_numpy(
                zero_copy_only=False
            )
            E = flat.reshape(n, -1).astype(np.float64)
            vn = np.sqrt((E * E).sum(axis=1))
            cos = (E @ Q_.T) / (vn[:, None] * qn_[None, :])
            kk = min(k, n)
            out_q, out_v, out_c = [], [], []
            for j in range(len(qids_)):
                order = np.lexsort((ids, -cos[:, j]))[:kk]
                out_q.append(np.full(kk, qids_[j], dtype=np.int64))
                out_v.append(ids[order].astype(np.int64))
                out_c.append(cos[order, j])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_q), type=pa.int64()),
                    pa.array(np.concatenate(out_v), type=pa.int64()),
                    pa.array(np.concatenate(out_c), type=pa.float64()),
                ],
                [query_id, id_col, "cosine"],
            )

    cand = src.mapInArrow(
        probe, schema=f"{query_id} long, {id_col} long, cosine double"
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF scale path (coarse k-means quantizer + probed exact re-rank)
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    sample_n: int = 4096,
    iters: int = 10,
    vec_col: str = "embedding",
    seed: int = 1234,
) -> np.ndarray:
    """Deterministic spherical k-means on a bounded sample → L2-normal
    centroid matrix (n_centroids, dim).  The sample/driver step is
    O(sample_n·dim) regardless of corpus size; assignment and probing
    run distributed."""
    rows = vectors.select(vec_col).limit(sample_n).collect()
    X = np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    # deterministic init: splitmix-shuffled sample indices
    order = np.argsort(_mix(np.arange(len(X), dtype=np.uint64)
                            + np.uint64(seed)))
    C = X[order[:n_centroids]].copy()
    for _ in range(iters):
        a = np.argmax(X @ C.T, axis=1)
        for c in range(n_centroids):
            m = X[a == c]
            if len(m):
                v = m.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    vec_col: str = "embedding",
    out: str = "cluster",
) -> DataFrame:
    """Append the (top-``nprobe``) nearest-centroid cluster id(s) —
    one row per probe (nprobe=1 → plain partition assignment)."""
    from pyspark.sql.types import ArrayType

    bc = df.sparkSession.sparkContext.broadcast(np.asarray(centroids))

    @F.pandas_udf(ArrayType(LongType()))
    def enc(vs: pd.Series) -> pd.Series:
        C = bc.value
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if len(m) == 0:
            return pd.Series([], dtype=object)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ C.T
        top = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(top.astype(np.int64)))

    probed = df.withColumn("__probes", enc(F.col(vec_col)))
    return probed.withColumn(out, F.explode("__probes")).drop("__probes")


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    seed: int = 1234,
) -> DataFrame:
    """IVF approximate top-k: corpus bucketed by nearest centroid
    (ONE cluster per vector); queries probe their ``nprobe`` nearest
    centroids; candidates re-ranked by exact cosine computed JVM-SIDE
    via ``aggregate(zip_with(...))`` — no Python in the re-rank, and
    the candidate space is |corpus|·nprobe/n_centroids instead of
    |corpus| (the IVF scale contract).
    """
    C = train_ivf_centroids(
        vectors, n_centroids, vec_col=vec_col, seed=seed
    )
    v = ivf_assign(vectors, C, nprobe=1, vec_col=vec_col)
    q = ivf_assign(queries, C, nprobe=nprobe, vec_col=vec_col)
    cand = v.join(
        F.broadcast(q.select(query_id, "cluster",
                             F.col(vec_col).alias("__qv"))),
        "cluster",
    )
    # JVM-side dot + norms over the zipped float arrays (codegen)
    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    scored = cand.select(
        query_id,
        id_col,
        (
            dot(F.col(vec_col), F.col("__qv"))
            / (
                F.sqrt(dot(F.col(vec_col), F.col(vec_col)))
                * F.sqrt(dot(F.col("__qv"), F.col("__qv")))
            )
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# LSH scale path
# ---------------------------------------------------------------------------


def _planes(dim: int, n_planes: int, seed: int = 1234) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes via splitmix64 →
    uniform(-1, 1) (platform-stable, no RNG state)."""
    idx = np.arange(dim * n_planes, dtype=np.uint64) + np.uint64(
        seed * 1_000_003
    )
    u = (_mix(idx) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    return (u * 2.0 - 1.0).reshape(n_planes, dim)


def add_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "bucket",
    seed: int = 1234,
) -> DataFrame:
    """Append the sign-bit hyperplane bucket (vectorized matmul UDF)."""
    planes = _planes(dim, n_planes, seed)

    @F.pandas_udf(LongType())
    def enc(vs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if len(m) == 0:
            return pd.Series([], dtype="int64")
        signs = (m @ planes.T) > 0
        weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
        return pd.Series(signs @ weights)

    return df.withColumn(out, enc(F.col(vec_col)))


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    seed: int = 1234,
) -> DataFrame:
    """Approximate top-k: candidates from bucket collisions (with
    ``probes``-bit multi-probe flips on the query side), exact cosine
    re-rank within candidates.  Recall grows with probes/planes."""
    v = add_lsh_bucket(vectors, dim, n_planes, id_col, vec_col, seed=seed)
    q = add_lsh_bucket(queries, dim, n_planes, query_id, vec_col, seed=seed)
    # multi-probe: query also probes buckets at hamming distance ≤ probes
    probe_buckets = [F.col("bucket")]
    if probes >= 1:
        probe_buckets += [
            F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)
        ]
    q = q.withColumn("bucket", F.explode(F.array(probe_buckets)))
    cand = v.join(
        F.broadcast(q.select(query_id, "bucket",
                             F.col(vec_col).alias("__qv"))),
        "bucket",
    )
    qe = cand.select(
        query_id, id_col, F.posexplode("__qv").alias("pos", "qv"),
    )
    # (tiny candidate sets — reuse the exact machinery via a self join)
    ve = cand.select(query_id, id_col,
                     F.posexplode(vec_col).alias("pos", "vv"))
    dots = (
        ve.join(qe, [query_id, id_col, "pos"])
        .groupBy(query_id, id_col)
        .agg(
            F.sum(F.col("qv").cast("double") * F.col("vv").cast("double"))
            .alias("dot")
        )
    )
    qn = _norms(queries, query_id, vec_col).withColumnRenamed("norm", "qn")
    vn = _norms(vectors, id_col, vec_col).withColumnRenamed("norm", "vn")
    cos = (
        dots.join(F.broadcast(qn), query_id)
        .join(vn, id_col)
        .withColumn("cosine", F.col("dot") / (F.col("qn") * F.col("vn")))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        cos.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id, id_col, "rank", "cosine")
    )
