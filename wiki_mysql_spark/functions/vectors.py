"""Vector math over ``array<float>`` columns — no UDFs.

Everything here is built from higher-order functions (``zip_with``,
``aggregate``, ``transform``) that execute JVM-side inside codegen; at 100 TB
this is the difference between a scan-speed operator and an Arrow round-trip
per row. Accumulation is forced to double (float32 folds drift and won't
match any oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance (no sqrt) — the PQ subvector metric; same
    sequential fold order as :func:`dot`/:func:`norm`."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
