"""As-of (most-recent-match) join — SURVEY.md J3, [absent] in the reference.

Batch Spark has no native as-of join. The classic scalable formulation is
union-and-fill: tag both sides, union them, and let a single window pass
carry the latest right-side values forward to each left row. ONE shuffle on
(key, time) total — versus the naive approach (inequality join + per-left-row
max) which is a quadratic non-equi join.

    left:  (key, t, ...)        right: (key, t, v...)
    union -> window partitionBy(key) orderBy(t, side) -> last(v, ignorenulls)
    -> keep left rows

Directions: ``backward`` (most recent r.t <= l.t — the default, and what
DuckDB's ``ASOF JOIN ... ON l.t >= r.t`` computes), ``forward`` (earliest
r.t >= l.t), ``nearest`` (the closer of the two; tie goes backward, like
pandas ``merge_asof(direction="nearest")``). Backward/forward are one
window pass each; nearest composes both (two passes, still linear).

At 100 TB this behaves like any keyed window: partitioned by the join key,
skew handled by AQE, state bounded per key-partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _asof_one_direction(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tolerance: Column | None,
    forward: bool,
    out_prefix: str = "",
) -> DataFrame:
    lcols = left.columns
    # order the union so the eligible right row is adjacent-inclusive:
    # backward -> right sorts BEFORE left at equal t (r.t <= l.t inclusive);
    # forward  -> right sorts AFTER  left at equal t (r.t >= l.t inclusive).
    r_ord, l_ord = (1, 0) if forward else (0, 1)
    l = left.withColumn("_t", F.col(left_time)).withColumn("_ord", F.lit(l_ord))
    r = right.select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(r_ord).alias("_ord"),
        *[F.col(c) for c in right_values],
    )
    for c in right_values:
        l = l.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.unionByName(r.select(*l.columns))

    # Ties: several right rows can share (key, t). (_t, _ord) alone leaves
    # their relative order physical — whichever row the shuffle happened to
    # place last won (hypothesis found the nondeterminism: two right rows at
    # the same instant returned either value run-to-run). Extend the order
    # with the right-value columns themselves so the winner is total-order
    # deterministic: the GREATEST value tuple among same-instant rows wins
    # in both directions (backward's last() takes the ascending tail,
    # forward's first() takes the descending head). Left rows carry null
    # value columns but are already separated from right rows by _ord.
    if forward:
        w = (
            Window.partitionBy(on)
            .orderBy("_t", "_ord", *[F.col(c).desc() for c in right_values])
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True)  # noqa: E731
    else:
        w = (
            Window.partitionBy(on)
            .orderBy("_t", "_ord", *[F.col(c).asc() for c in right_values])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True)  # noqa: E731

    is_right = F.col("_ord") == r_ord
    # ONE struct pick, not one pick per column: the struct is non-null for
    # every right row even when its FIELDS are null, so ignorenulls skips
    # only left rows and the whole winning ROW is taken atomically — the
    # per-column spelling back-filled a null value column from an OLDER
    # right row (last-non-null-per-column, not as-of-row semantics).
    row = F.struct(
        F.col("_t").alias("_rt"),
        *[F.col(c) for c in right_values],
    )
    filled = u.select(
        *lcols,
        "_ord",
        "_t",
        pick(F.when(is_right, row)).over(w).alias("_m"),
    ).select(
        *lcols,
        "_ord",
        "_t",
        F.col("_m._rt").alias("_rt"),
        *[F.col(f"_m.{c}").alias(f"_f_{c}") for c in right_values],
    ).where(F.col("_ord") == l_ord)

    gap = (F.col("_rt") - F.col("_t")) if forward else (F.col("_t") - F.col("_rt"))
    in_tol = F.lit(True) if tolerance is None else gap <= tolerance
    return filled.select(
        *lcols,
        F.when(in_tol, F.col("_rt")).alias(f"{out_prefix}_rt"),
        *[
            F.when(in_tol, F.col(f"_f_{c}")).alias(f"{out_prefix}{c}")
            for c in right_values
        ],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of left join: for each left row, the single matching right row in
    the requested ``direction`` (NULL ``right_values`` when none exists or
    the match is outside ``tolerance``).

    direction: ``backward`` (most recent r.t <= l.t), ``forward`` (earliest
    r.t >= l.t), or ``nearest`` (closer of the two, ties backward).

    Several right rows at the SAME (key, time) instant: the one with the
    greatest ``right_values`` tuple wins, deterministically (without an
    explicit tie order the winner was whichever row the shuffle placed
    last — run-to-run nondeterminism at any scale). This is a DELIBERATE
    divergence from pandas ``merge_asof``, whose tie rule is "last input
    row": input order is a physical accident after a distributed shuffle,
    so a value-based total order is the only reproducible rule. Because
    ties are broken by ORDERING the value columns, every ``right_values``
    column must be an orderable type — maps (anywhere in the type) are
    rejected loudly rather than failing downstream at analysis time.
    """
    rtypes = dict(right.dtypes)
    for c in right_values:
        if c not in rtypes:
            raise ValueError(f"asof_join: right_values column {c!r} not in right")
        if "map<" in rtypes[c]:
            raise ValueError(
                f"asof_join: right_values column {c!r} has unorderable type "
                f"{rtypes[c]} — same-instant ties are broken by ordering the "
                f"value tuple, and Spark cannot order maps. Project the map "
                f"to orderable columns (e.g. map_entries sorted) first."
            )
    lcols = left.columns
    if direction in ("backward", "forward"):
        out = _asof_one_direction(
            left, right, on=on, left_time=left_time, right_time=right_time,
            right_values=right_values, tolerance=tolerance,
            forward=(direction == "forward"),
        )
        return out.select(*lcols, *right_values)
    if direction != "nearest":
        raise ValueError(f"unknown direction: {direction!r}")

    back = _asof_one_direction(
        left, right, on=on, left_time=left_time, right_time=right_time,
        right_values=right_values, tolerance=tolerance, forward=False,
        out_prefix="_b_",
    )
    both = _asof_one_direction(
        back, right, on=on, left_time=left_time, right_time=right_time,
        right_values=right_values, tolerance=tolerance, forward=True,
        out_prefix="_w_",
    )
    lt = F.col(left_time)
    use_back = F.col("_b__rt").isNotNull() & (
        F.col("_w__rt").isNull()
        # tie -> backward, matching pandas merge_asof(direction="nearest")
        | ((lt - F.col("_b__rt")) <= (F.col("_w__rt") - lt))
    )
    return both.select(
        *lcols,
        *[
            F.when(use_back, F.col(f"_b_{c}"))
            .otherwise(F.col(f"_w_{c}"))
            .alias(c)
            for c in right_values
        ],
    )
