"""As-of (temporal) join — each left row matches the single right row
with the greatest time ≤ its own, per key.  The reference has no
temporal joins at all (its model is static layers); this is new engine
surface for the event/crawl-stream workloads the north rule targets,
oracle-checked against DuckDB's native ASOF JOIN.

Plan shape (scale rationale): union the two sides and run ONE ordered
window per key with an ignore-nulls last() carry-forward — a single
shuffle on the key, no range explode, no per-row search structure.
Both sides can be arbitrarily large; skewed keys behave exactly like
any other window partition (AQE skew handling applies to the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Backward inclusive as-of join (DuckDB `ASOF JOIN` / pandas
    `merge_asof` semantics): for every left row, the right row with
    the largest ``on`` ≤ left's ``on`` within the same ``by`` group.

    ``right_cols`` are the right-side payload columns to carry (default
    all except ``on``/``by``); they arrive suffixed.  ``how``:
    ``inner`` drops left rows with no prior right row, ``left`` keeps
    them with nulls.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by_cols, on)]
    out_rcols = [f"{c}{suffix}" for c in right_cols] + [f"{on}{suffix}"]

    lcols = left.columns
    l2 = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
        F.lit(None).cast(right.schema[on].dataType).alias("__r_on"),
    )
    r2 = right.select(
        *[F.col(c) for c in by_cols],
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (*by_cols, on)],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(on).alias("__r_on"),
    ).select(*l2.columns)  # align column order for the union
    u = l2.unionByName(r2)

    # right rows sort BEFORE left rows at equal ``on`` → inclusive ≤
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        F.last("__r_on", ignorenulls=True).over(w).alias(f"{on}{suffix}"),
    )
    out = carried.where(F.col("__side") == 1).select(*lcols, *out_rcols)
    if how == "inner":
        out = out.where(F.col(f"{on}{suffix}").isNotNull())
    elif how != "left":
        raise ValueError(how)
    return out
