"""Table catalog over the driver-generated parquet fixtures.

Replaces the reference's fixed two-table MySQL schema
(``/root/reference/sql/init.sql:1-19``) with a parquet-backed catalog: schemas
travel with the files, scans are columnar, and filters/projections push down
into the parquet reader (verify with ``df.explain()`` -> ``PushedFilters``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_mysql_spark.session import configure

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables whose size is bounded (constant or near-constant cardinality
# at any scale factor). These are always safe to broadcast-join: at 100 TB
# nation is still 25 rows. Everything else must be left to AQE / size stats.
BROADCAST_SAFE = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine-canonical column types.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects outright ([PARQUET_TYPE_ILLEGAL]); with
    ``spark.sql.legacy.parquet.nanosAsLong`` we read epoch nanoseconds as a
    long and truncate to microseconds — bit-identical to how DuckDB casts the
    same column to its microsecond TIMESTAMP.
    """
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def spread_small_scan(df: DataFrame, *, min_factor: int = 2) -> DataFrame:
    """Spread a narrow scan across the cluster before CPU-heavy per-row work.

    A small input (one file with one row group) arrives as a single scan
    partition; per-row regex / higher-order-function / Arrow work then runs
    on one core while the rest idle — the measured cost of e.g. the
    text-quality scorer at sf0.1 was ~5x its parallel runtime purely from
    this skew. Round-robin repartition when the scan has fewer than
    parallelism/min_factor partitions; no-op (no shuffle) on an
    already-parallel scan, which is the normal case at real scale where an
    input is thousands of files.

    Only worth it when downstream per-row work dominates the shuffle cost of
    the payload — apply at text/vector/UDF operators, not plain aggregates.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # .rdd is safe here: callers pass freshly-scanned frames with no shuffle
    # upstream, so the partition probe does not materialize prior stages.
    if df.rdd.getNumPartitions() * min_factor < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (for spark.sql queries)."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
