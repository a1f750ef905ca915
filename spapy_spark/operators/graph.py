"""Distributed graph operators for web corpora: connected components
(near-dup clustering) and PageRank (link-graph quality scoring).

Both are the canonical web-pipeline uses: dedup's pair ladder
(minhash/simhash/embedding bands) emits EDGES, but a pipeline needs
CLUSTERS with one canonical doc per cluster — that's connected
components; and a crawl needs a query-independent page prior — that's
PageRank over the link graph.

Scale design:
- connected_components is min-label propagation with pointer-doubling
  shortcuts, so convergence is O(log diameter) rounds, not O(diameter)
  — a 10^6-long chain closes in ~20 rounds.  Every round is one
  equi-join shuffle on the node key; labels are (node, label) int64
  pairs only, never payloads.  Each round MUST localCheckpoint: the
  doubling self-join embeds the previous plan twice, so without
  lineage truncation the logical plan doubles per round and the
  driver OOMs before round 20 (measured).  This is the one place the
  engine uses localCheckpoint by necessity (GraphX-style iterative
  fixpoint), unlike the grid-kNN wrapper where it was overhead.
- pagerank keeps ranks as integer micro-units (10^6 = 1.0) with floor
  divisions, so results are EXACTLY reproducible — no float summation
  order anywhere, which is what lets the driver's value-hash gate an
  iterative algorithm at all.  Per iteration: one join ranks→edges on
  src + one map-side-combined sum on dst.  Dangling-node mass is
  dropped (documented; both engines agree).

The reference has no graph ops (SpaPy is geometry-only); these are
north-rule pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RANK_UNIT = 1_000_000  # integer micro-rank: 10^6 == rank 1.0


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster) with cluster = min node id reachable.

    Alternates neighbor-min propagation with one pointer-doubling step
    (label := label-of-label), converging in O(log diameter) rounds;
    stops early when a round changes nothing.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = 0
    for _ in range(max_iter):
        # neighbor min: lbl'(v) = min(lbl(v), min_{u~v} lbl(u))
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        prop = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
        # pointer doubling: lbl''(v) = lbl'(lbl'(v))
        l2 = prop.select(
            F.col("node").alias("p_node"), F.col("lbl").alias("p_lbl")
        )
        doubled = (
            prop.join(l2, prop["lbl"] == l2["p_node"], "left")
            .select(
                "node",
                F.coalesce(F.col("p_lbl"), F.col("lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)  # truncate the doubling lineage
        )
        changed = (
            doubled.join(labels.withColumnRenamed("lbl", "old"), "node")
            .where(F.col("lbl") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = doubled
        if changed == 0:
            break
    if changed != 0:
        # every round halves the pointer-chain depth, so max_iter=25
        # covers diameters to ~2^25; exhausting it means the labels
        # are NOT a fixpoint — failing silently would hand wrong
        # clusters to dedup_clusters.
        raise RuntimeError(
            "connected_components did not converge in "
            f"{max_iter} iterations; raise max_iter"
        )
    return labels.select(F.col("node"), F.col("lbl").alias("cluster"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pair stream → (node, cluster, is_canonical): the
    pipeline keeps ``is_canonical`` rows and drops the rest."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.withColumn("is_canonical", F.col("node") == F.col("cluster"))


def pagerank_int(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    damping_pct: int = 85,
) -> DataFrame:
    """Integer-exact PageRank: (id, rank) in micro-units.

    r0 = RANK_UNIT; per iteration
    ``r' = (100-d)% · RANK_UNIT + d% · Σ_in floor(r_src / outdeg)``
    with every division a floor of non-negative integers — bit-exact
    across engines and partitionings (integer sums are order-free).
    """
    base = (100 - damping_pct) * RANK_UNIT // 100
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select(
        F.col(id_col).alias("node"), F.lit(RANK_UNIT).cast("long").alias("r")
    )
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    d = deg.select(F.col(src).alias("d_src"), "outdeg")
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e["e_src"] == ranks["node"])
            .join(d, e["e_src"] == d["d_src"])
            .select(
                F.col("e_dst").alias("node"),
                F.expr("r div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.select(F.col(id_col).alias("node"))
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(in_sum, 0)) div 100"
                    )
                ).cast("long").alias("r"),
            )
        )
    return ranks.select(F.col("node").alias(id_col), F.col("r").alias("rank"))


__all__ = [
    "RANK_UNIT",
    "connected_components",
    "dedup_clusters",
    "pagerank_int",
]
