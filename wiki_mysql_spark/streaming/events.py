"""Structured Streaming over the events table (SURVEY.md §2.7 — [absent] in
the reference, whose only streaming trait is bounded-memory iteration over
the dump, ``/root/reference/dbfy.py:188-191``).

The fixture is a static parquet file, so streams run with
``trigger(availableNow=True)``: a real micro-batch execution through the
streaming engine (stateful operators, watermarks, sinks all exercised) that
drains the source and stops — the batch-equivalent answer, which is exactly
what the DuckDB oracle can check. In production the same plans run unchanged
against a live source (Kafka/files) with the watermark actually discarding
late data.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from wiki_mysql_spark.session import configure

# events.parquet stores ts as TIMESTAMP(NANOS); the stream reads it as long
# (nanosAsLong) and converts, same as the batch path in sources/tables.py.
_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a streaming DataFrame with a proper timestamp."""
    configure(spark)
    # The streaming file source wants a directory; point it at sf_dir with a
    # glob filter so only the events file is listed.
    raw = (
        spark.readStream.schema(_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))


def run_stream_to_memory(
    out: DataFrame, *, output_mode: str = "complete", timeout_sec: int = 120
) -> DataFrame:
    """Execute a streaming plan to completion (availableNow) into a memory
    sink; returns the sink contents as a DataFrame."""
    name = f"stream_{uuid.uuid4().hex[:12]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    return out.sparkSession.table(name)
