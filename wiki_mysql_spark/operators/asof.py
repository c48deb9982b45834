"""As-of (most-recent-match) join — SURVEY.md J3, [absent] in the reference.

Batch Spark has no native as-of join. The classic scalable formulation is
union-and-fill: tag both sides, union them, and let a single window pass
carry the latest right-side values forward to each left row. ONE shuffle on
(key, time) total — versus the naive approach (inequality join + per-left-row
max) which is a quadratic non-equi join.

    left:  (key, t, ...)        right: (key, t, v...)
    union -> window partitionBy(key) orderBy(t, side) -> last(v, ignorenulls)
    -> keep left rows

At 100 TB this behaves like any keyed window: partitioned by the join key,
skew handled by AQE, state bounded per key-partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward (most recent right row with r.t <= l.t) as-of left join.

    Returns all ``left`` columns plus ``right_values`` (NULL when no prior
    right row exists, or when it is older than ``tolerance``).
    """
    lcols = left.columns
    l = left.withColumn("_t", F.col(left_time)).withColumn("_side", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in right_values],
    )
    # align schemas for the union: left lacks right_values, right lacks
    # left-only columns
    for c in right_values:
        l = l.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.unionByName(r.select(*l.columns))

    # right rows sort before left rows at equal t (side 0 < 1) => inclusive
    # (r.t <= l.t) semantics, matching DuckDB's ASOF JOIN.
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "_side",
        "_t",
        F.last(F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True)
        .over(w)
        .alias("_rt"),
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_f_{c}")
            for c in right_values
        ],
    ).where(F.col("_side") == 1)

    in_tol = (
        F.lit(True)
        if tolerance is None
        else (F.col("_t") - F.col("_rt")) <= tolerance
    )
    return filled.select(
        *lcols,
        *[
            F.when(in_tol, F.col(f"_f_{c}")).alias(c)
            for c in right_values
        ],
    )
