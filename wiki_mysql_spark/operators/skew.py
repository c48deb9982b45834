"""Skew mitigation by key salting (SURVEY.md / north-star scale posture).

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime; explicit salting remains necessary for (a) skewed AGGREGATIONS
(AQE doesn't split hot groupBy keys) and (b) engines/paths where AQE can't
see the skew. Both helpers are result-identical to their unsalted forms —
which is exactly what their oracle queries assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    *,
    n_salt: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max}. Phase 1 aggregates (key, salt) — spreading a hot
    key over ``n_salt`` reducers — phase 2 merges per key. count re-merges
    with sum; min/max/sum merge with themselves (all are commutative
    monoids; avg must be decomposed by the caller into sum+count).
    """
    mergers = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salt = F.pmod(
        F.xxhash64(salt_source if salt_source is not None else F.rand(seed=7)),
        F.lit(n_salt),
    )
    phase1 = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(
        *[
            getattr(F, fn)(col if fn != "count" else F.lit(1)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return phase1.groupBy(key).agg(
        *[
            getattr(F, mergers[fn])(out).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    n_salt: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Inner equi-join with the LEFT (large/skewed) side salted and the
    RIGHT side replicated across all salt values.

    A hot key's rows land in ``n_salt`` different shuffle partitions instead
    of one straggler; the right side pays a x``n_salt`` replication, so use
    this when right is much smaller (but too big / too skew-prone to
    broadcast outright). Result set is identical to a plain inner join.
    """
    salt = F.pmod(
        F.xxhash64(salt_source if salt_source is not None else F.rand(seed=7)),
        F.lit(n_salt),
    )
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(r, [key, "_salt"]).drop("_salt")
