"""Change-data-capture / dimension-maintenance operators: batch MERGE
(upsert) and SCD type-2 history building.

(North-star extensions. Closest reference hook: the reference's sink is
insert-only with per-row commits — ``/root/reference/database.py:59-104`` —
and its redirect pass rewrites rows in place; these operators are the
set-based Spark replacements a warehouse actually runs: a full-outer merge
instead of row-at-a-time upserts, and windowed validity intervals instead
of destructive updates.)

Both are single-shuffle formulations: the merge shuffles once on the key
(and AQE broadcasts a small changes batch); SCD2 shuffles once for the
per-key window. No driver-side loops, no per-row writes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# per-column merge strategies for merge_upsert
_STRATEGIES = {
    "sum": lambda t, s: F.coalesce(t, F.lit(0)) + F.coalesce(s, F.lit(0)),
    "max": lambda t, s: F.greatest(F.coalesce(t, s), F.coalesce(s, t)),
    "source_wins": lambda t, s: F.coalesce(s, t),
}


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    *,
    on: str,
    strategies: dict[str, str],
) -> DataFrame:
    """Set-based MERGE of a changes batch into a keyed target (the batch
    equivalent of ``MERGE INTO``): full-outer join on the key, per-column
    resolution by strategy ('sum' | 'max' | 'source_wins'), plus an
    ``action`` column ('insert' — key only in source, 'update' — in both,
    'keep' — only in target).

    One shuffle (the join); when the changes batch is small relative to the
    target — the normal CDC case — AQE broadcasts it and even that shuffle
    disappears on the target side. Replaces the reference's per-row
    INSERT/commit loop (``database.py:75-85``) wholesale.
    """
    cols = list(strategies)
    t = target.select(on, F.lit(True).alias("_t"), *[F.col(c).alias(f"_t_{c}") for c in cols])
    s = source.select(on, F.lit(True).alias("_s"), *[F.col(c).alias(f"_s_{c}") for c in cols])
    j = t.join(s, on, "full_outer")
    merged: list[Column] = [F.col(on)]
    for c in cols:
        merged.append(
            _STRATEGIES[strategies[c]](F.col(f"_t_{c}"), F.col(f"_s_{c}")).alias(c)
        )
    merged.append(
        F.when(F.col("_t").isNull(), F.lit("insert"))
        .when(F.col("_s").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action")
    )
    return j.select(*merged)


def scd2_history(
    df: DataFrame,
    *,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event/change log:
    one row per (key, attr-value run) with ``valid_from`` / ``valid_to``
    validity interval and ``is_current`` on the open row.

    Two windows over the SAME partitioning+ordering (key, ts, tiebreak) —
    Catalyst plans them in one Window stage after one shuffle: lag() marks
    run starts, lead() over the run starts closes each interval. A run's
    valid_to is the NEXT version's valid_from (half-open intervals, the
    join-friendly convention for as-of lookups).
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    prev = F.lag(attr).over(w)
    starts = df.withColumn(
        "_chg", prev.isNull() | (prev != F.col(attr))
    ).where("_chg")
    w2 = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    return starts.select(
        key,
        F.col(attr),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
