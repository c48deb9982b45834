"""SparkSession factory.

The reference pipeline hand-tunes parallelism with a process pool
(``/root/reference/dbfy.py:42,212-251``); here the equivalent knobs are
session-level SQL configs. Everything set below is also safe to apply to a
session we did not create (the driver hands us one), via :func:`configure`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to any session we run queries on. These are
# deliberately all *dynamic* SQL confs (no static spark.* core confs) so they
# work on a shared/driver-owned session too.
RUNTIME_CONFS: dict[str, str] = {
    # Deterministic timestamp rendering regardless of host TZ; matches the
    # DuckDB oracle's naive (UTC) timestamps.
    "spark.sql.session.timeZone": "UTC",
    # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized reader
    # rejects; read as epoch-nanos long and convert (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Runtime re-planning: coalesce tiny shuffle partitions, convert to
    # broadcast joins when a side turns out small, split skewed partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / mapInPandas / applyInPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be static on some builds; never fail a query for it.
            pass
    return spark


def get_session(app_name: str = "wiki_mysql_spark") -> SparkSession:
    """Build (or reuse) a local session sized from the environment.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    Shuffle partitions are pinned to the core count: at local scale the
    200-partition default just adds scheduling overhead, while on a real
    cluster this value should be raised to ~2-3x total executor cores (AQE
    coalescing makes over-provisioning cheap).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus if cpus != "*" else "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
