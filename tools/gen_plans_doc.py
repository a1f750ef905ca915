"""Regenerate docs/PLANS.md from live explain() output."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spapy_spark.operators import geocode, pip  # noqa: E402
from spapy_spark.session import get_spark  # noqa: E402
from spapy_spark.sources import synth  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    spark = get_spark("plans", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    sections = []

    def cap(title, df, note):
        plan = df._jdf.queryExecution().executedPlan().toString()
        sections.append(f"## {title}\n\n{note}\n\n```\n{plan[:2600]}\n```\n")

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    geo = geocode.geocode_coords(docs.where(F.col("lang") == "en")).where(
        F.col("lat").isNotNull()
    ).select("doc_id", "lat", "lon")
    cap(
        "Geocode stage (JVM-only, pushdown)", geo,
        "The whole geocode stage is Catalyst codegen: the `lang='en'` "
        "filter is PUSHED to the parquet scan (`PushedFilters`), "
        "ReadSchema is pruned to the referenced columns, and there is "
        "**no Python node**.",
    )
    pts = geo.withColumnRenamed("doc_id", "point_id")
    hits = pip.pip_join_broadcast(pts, synth.zones(spark),
                                  point_cols=["point_id"])
    cap(
        "Broadcast PIP probe (mapInArrow, zero shuffle)", hits,
        "The flagship join: zones broadcast once, probed from "
        "`MapInArrow` directly over the pruned scan — a single narrow "
        "stage, no Exchange. Payload columns never materialize as "
        "Python objects; the hit gather is an Arrow C++ `take`.",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    cj = pip.pip_join_cells(pts.limit(10000), synth.zones(spark), res=7,
                            point_cols=["point_id"], salt=4)
    cap(
        "Cell-prefix hash join, salted (both sides large)", cj,
        "The big-big path: zones explode to covering cells, points emit "
        "ancestor cells per zone res level, Catalyst hash-partitions "
        "BOTH sides on `(cell, __s)` — the salt spreads Zipf-hot city "
        "cells; AQE skew-join remains as backstop.",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    agg = hits.groupBy("zone_id").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    cap(
        "Tile-count aggregate (partial+final, AQE coalesce)", agg,
        "`partial_count` combines map-side before the exchange; AQE "
        "coalesces the shuffle read at runtime (adaptive shuffle "
        "sizing, north rule).",
    )
    cnt = pip.pip_count_by_zone(pts, synth.zones(spark))
    cap(
        "Flagship count plan (map-side combine inside the probe)", cnt,
        "The bench flagship: per-zone partial counts are computed "
        "INSIDE the Arrow probe (np.bincount per batch), so only "
        "~|zones| rows per task cross the Python→JVM boundary and the "
        "final shuffle — the count-aggregation plan that bought the "
        "r2 scaling-efficiency gain (0.80 → 0.847).",
    )
    from spapy_spark.operators import knn  # noqa: E402

    wd = knn.within_distance(
        pts.limit(10000), synth.sites(spark, 64), 3.0, res=6
    )
    cap(
        "Distance-within join (pure Catalyst, both sides unbounded)", wd,
        "Range join via buffered cell covering: sites bucket to one "
        "cell, points explode to the (2rx+1)×(2ry+1) neighborhood, one "
        "hash join on the integer cell + exact distance filter — no "
        "Python node, no broadcast; the shuffle key is the cell.",
    )
    kg = knn.knn_join_grid(
        pts.limit(10000), synth.sites(spark, 64), k=3, res=3, ring=2
    )
    cap(
        "Distributed grid kNN (no broadcast, no Python)", kg,
        "Both sides quantize once; the Δ-sequence explode keeps the "
        "expression tree O(1) in the ring; per-point top-k is a "
        "sort-based window `row_number over (d2, site_id)` (spills "
        "gracefully — the earlier collect_list/array_sort "
        "ObjectHashAggregate held every candidate array on heap). "
        "`knn_join_grid_total` escalates the ring for the (shrinking) "
        "uncertain remainder, done-flags fused into the same window "
        "shuffle.",
    )
    from spapy_spark.operators import overlay  # noqa: E402
    from spapy_spark.geometry import wkb as _wkb  # noqa: E402
    import numpy as np  # noqa: E402

    rng = np.random.default_rng(0)
    x0 = rng.uniform(-100, 100, 4000)
    y0 = rng.uniform(-60, 60, 4000)
    lrows = [
        (int(i), _wkb.dumps(_wkb.box(x, y, x + 2, y + 2)))
        for i, (x, y) in enumerate(zip(x0, y0))
    ]
    left = spark.createDataFrame(lrows, "lid bigint, geometry binary")
    right = spark.createDataFrame(lrows[:50], "rid bigint, geometry binary")
    cand = overlay._candidates(left, right, 6, "lid", "rid")
    cap(
        "Overlay candidate generation (one shuffle for dedup + spread)",
        cand,
        "Both layers explode to covering cells (whole-batch rectangle "
        "fast path — no per-feature Python); the pair dedup's "
        "`repartition(4·cores, pair-key)` satisfies the aggregate's "
        "required distribution, so Catalyst inserts NO second "
        "exchange and the width is pinned for the Python refine (AQE "
        "would otherwise coalesce the small shuffle to one partition "
        "and serialize it).",
    )
    hdr = (
        "# Physical plans — the 100 TB checklist, evidenced\n\n"
        "Captured from live `explain` output (regenerate: "
        "`python tools/gen_plans_doc.py`).\n"
        "Each plan demonstrates one scale property the brief requires.\n"
    )
    with open(os.path.join(REPO, "docs", "PLANS.md"), "w") as f:
        f.write(hdr + "\n".join(sections))
    print("wrote docs/PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
