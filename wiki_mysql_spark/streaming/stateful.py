"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.7 — reserved for custom state; this is the shape a bespoke
sessionizer/enricher takes when the built-in window operators can't express
the semantics).

Per-user running profile: event count, value sum, last-seen timestamp —
state is one tiny row per key, updated per micro-batch, emitted on every
update. At scale: state lives in the state store partitioned by user_id,
bounded by key cardinality (add a timeout for eviction in production).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)
STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _round_half_up(x: float, digits: int = 2) -> float:
    """Round like Spark's F.round / DuckDB's round (HALF_UP on the double's
    shortest decimal repr) — NOT Python's built-in round(), whose banker's
    half-to-even flips exact .xx5 ties (e.g. 2.125 -> 2.12 vs 2.13) and
    would diverge this operator from its SQL oracle on tie-valued sums."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def user_profiles_stateful(events: DataFrame) -> DataFrame:
    """events stream -> per-user running profile with explicit GroupState."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, total, last_ts = (state.get if state.exists else (0, 0.0, None))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        state.update((n, total, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [_round_half_up(total, 2)],
                "last_ts": [last_ts],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
