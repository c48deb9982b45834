"""Declarative data-quality expectations (dbt-test / Deequ-style).

A training-data pipeline gates every ingest on constraint checks; the
reference's only integrity mechanism is MySQL's PRIMARY KEY plus silently
dropping failed inserts (``/root/reference/database.py:87-104``). Here each
expectation is a tiny declarative plan producing ``(check_name,
n_violations)``; a suite is the union of its checks. Everything is a scan +
aggregate or an anti-join — no row ever leaves the JVM, each check reads
only the columns it tests (column pruning), and the suite parallelizes
check-wise since the union's branches are independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _named(name: str, n: F.Column) -> list[F.Column]:
    return [F.lit(name).alias("check_name"), n.cast("long").alias("n_violations")]


def check_not_null(df: DataFrame, col: str, *, name: str | None = None) -> DataFrame:
    return df.agg(
        *_named(name or f"not_null:{col}", F.count_if(F.col(col).isNull()))
    )


def check_unique(df: DataFrame, cols: list[str], *, name: str | None = None) -> DataFrame:
    """Violations = rows beyond the first per duplicated key (0 if unique)."""
    return df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n")).agg(
        *_named(
            name or f"unique:{','.join(cols)}",
            F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)),
        )
    )


def check_range(
    df: DataFrame, col: str, lo, hi, *, name: str | None = None
) -> DataFrame:
    bad = (F.col(col) < lo) | (F.col(col) > hi)
    return df.agg(
        *_named(name or f"range:{col}", F.count_if(bad & F.col(col).isNotNull()))
    )


def check_accepted_values(
    df: DataFrame, col: str, values: list, *, name: str | None = None
) -> DataFrame:
    bad = ~F.col(col).isin(values)
    return df.agg(
        *_named(
            name or f"accepted:{col}", F.count_if(bad & F.col(col).isNotNull())
        )
    )


def check_foreign_key(
    child: DataFrame, col: str, parent: DataFrame, pcol: str,
    *, name: str | None = None,
) -> DataFrame:
    """Orphan child rows (left-anti against the parent key). The anti-join
    shuffles on the key; AQE broadcasts a small parent side."""
    orphans = child.select(F.col(col)).where(F.col(col).isNotNull()).join(
        parent.select(F.col(pcol).alias(col)).distinct(), col, "left_anti"
    )
    return orphans.agg(
        *_named(name or f"fk:{col}", F.count(F.lit(1)))
    )


def run_expectations(checks: list[DataFrame]) -> DataFrame:
    """Union a suite of checks into one (check_name, n_violations) report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out
