"""Multi-dimensional data layout: z-order (Morton) clustering.

At 100 TB, scan cost is dominated by how well file/row-group min-max
statistics prune. A single-column sort gives perfect pruning on that column
and none on any other; interleaving the bits of several key columns into
one Morton code and range-partitioning on it gives every key column
locality simultaneously — each output file covers a small hyper-rectangle
of the key space, so predicates on ANY clustered column skip most files
(the technique Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``; public
literature: Morton 1966, the Databricks/Iceberg z-ordering docs).

Everything here is native bit arithmetic inside whole-stage codegen — the
Morton code is a pure per-row expression, the layout is one range
repartition (the same shuffle a plain sort would need).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, *, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit ``2i`` is ``x`` bit ``i``, bit ``2i+1`` is ``y`` bit ``i``."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = acc.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return acc


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, *, n_files: int, bits: int = 16
) -> DataFrame:
    """Physically cluster ``df`` for writing: range-partition + sort by the
    Morton code of (x_col, y_col). ``df.write`` after this produces
    ``n_files`` files each covering a compact rectangle of the key space,
    so min-max pruning works for predicates on either column."""
    z = morton_key(F.col(x_col), F.col(y_col), bits=bits)
    return (
        df.withColumn("_zkey", z)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


def zorder_bucket_stats(
    df: DataFrame, x_col: str, y_col: str, *, n_buckets: int, bits: int = 16
) -> DataFrame:
    """Deterministic view of the layout for verification: assign rows to
    ``n_buckets`` equal-size buckets by Morton order (exact ntile, unlike
    the sampling-based range partitioner) and report each bucket's key
    rectangle. Tight rectangles == good pruning; the oracle recomputes the
    identical arithmetic. The bucket assignment is a DISTRIBUTED exact
    ntile (range-partitioned rank + ANSI tile arithmetic,
    ``operators.ids.global_ntile``) — the naive global-window spelling
    funnels the whole frame through one task and dies at 100 TB."""
    from wiki_mysql_spark.operators.ids import global_ntile

    z = morton_key(F.col(x_col), F.col(y_col), bits=bits)
    keyed = df.withColumn("_zkey", z)
    tiled = global_ntile(
        keyed, ["_zkey", x_col, y_col], n_buckets, tile_col="bucket"
    ).withColumn("bucket", F.col("bucket").cast("int"))
    return (
        tiled
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
    )


def sql_morton(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The DuckDB mirror of :func:`morton_key` (for oracles)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(parts) + ")"
