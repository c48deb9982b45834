"""Multi-format source/sink round-trips as an oracle-checked query.

The reference consumes exactly one input format (the bz2 XML dump) and one
sink (MySQL inserts). A Spark-native engine gets ORC / CSV / JSON readers
and writers from the same DataFrame API; this entry PROVES the round-trip
fidelity for each format — including timestamp serialization, the classic
CSV/JSON trap — by writing the orders table out, reading it back with an
explicit schema, and aggregating checksums that must equal what the oracle
computes directly off the parquet original for every format label.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import load_table

_FORMATS = ("orc", "csv", "json")

# the price checksum sums SCALED-TO-CENTS BIGINTs, not doubles: a double
# sum over 1.5M ~2.5e5-magnitude values differs across engines/partition
# orders in the 2nd decimal (caught by the r6 sf1 sweep — 375233912585.6
# vs .61); per-row round(x*100) is engine-identical (x*100 is within 1e-9
# of an integer, so rounding mode never matters) and the integer sum is
# order-independent
_AGG_SQL = """
    WITH agg AS (
        SELECT count(*)::BIGINT AS n_rows,
               count(DISTINCT o_orderkey)::BIGINT AS n_keys,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sum_price_cents,
               min(o_orderdate) AS min_date,
               max(o_orderdate) AS max_date,
               count(DISTINCT o_orderpriority)::BIGINT AS n_prios
        FROM orders
    )
    SELECT fmt, n_rows, n_keys, sum_price_cents, min_date, max_date, n_prios
    FROM (VALUES ('orc'), ('csv'), ('json')) f(fmt) CROSS JOIN agg
"""


@query("source_formats_roundtrip", _AGG_SQL)
def source_formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders to ORC, CSV (with header), and JSON-lines; read each
    back with the explicit schema; per-format aggregate checksums (row
    count, key cardinality, price sum, timestamp min/max) must match the
    parquet original — which is exactly what the oracle computes. The
    result is localCheckpoint-materialized so the temp files can be
    removed before returning (lazy frames would read deleted paths).

    Scratch location: ``spark.wiki_mysql_spark.scratchDir`` when set (on a
    real cluster this MUST be a shared filesystem — HDFS/S3/NFS — visible
    to every executor); otherwise a driver-local tempdir, which is correct
    only under a ``local[*]`` master where driver and executors share one
    filesystem (the sandbox/test configuration)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority"
    )
    scratch_root = spark.conf.get("spark.wiki_mysql_spark.scratchDir", None)
    if scratch_root:
        # uuid4, not just pid: pids recycle across crashed runs and collide
        # across hosts sharing the scratch filesystem — exactly the
        # deployment this conf targets
        tmp = os.path.join(
            scratch_root, f"fmt_roundtrip_{os.getpid()}_{uuid.uuid4().hex}"
        )
    else:
        tmp = tempfile.mkdtemp(prefix="fmt_roundtrip_")
    frames = []
    try:
        for fmt in _FORMATS:
            path = os.path.join(tmp, fmt)
            writer = orders.write.mode("overwrite")
            if fmt == "csv":
                writer = writer.option("header", True)
            getattr(writer, fmt)(path)
            reader = spark.read
            if fmt == "csv":
                reader = reader.schema(orders.schema).option("header", True)
            elif fmt == "json":
                reader = reader.schema(orders.schema)
            back = getattr(reader, fmt)(path)
            frames.append(
                back.agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.countDistinct("o_orderkey").alias("n_keys"),
                    F.sum(
                        F.round(F.col("o_totalprice") * 100).cast("long")
                    ).alias("sum_price_cents"),
                    F.min("o_orderdate").alias("min_date"),
                    F.max("o_orderdate").alias("max_date"),
                    F.countDistinct("o_orderpriority").alias("n_prios"),
                ).select(F.lit(fmt).alias("fmt"), "*")
            )
        return reduce(DataFrame.unionByName, frames).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
