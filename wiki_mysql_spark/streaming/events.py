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

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from wiki_mysql_spark.session import configure


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a streaming DataFrame with a proper TIMESTAMP `ts`.

    The streaming file source needs an explicit schema, so take it from a
    batch read of the same file — whatever the parquet actually stores —
    then normalize `ts` exactly like the batch path (sources/tables.py):
    epoch-nanos long (TIMESTAMP(NANOS) via nanosAsLong) becomes
    timestamp_micros, TIMESTAMP_NTZ casts to TIMESTAMP (session tz is UTC,
    so the instant is unchanged). Watermarks and time windows downstream
    require a true TIMESTAMP column either way.
    """
    configure(spark)
    path = os.path.join(sf_dir, "events.parquet")
    file_schema = spark.read.parquet(path).schema
    # The streaming file source wants a directory; point it at sf_dir with a
    # glob filter so only the events file is listed.
    raw = (
        spark.readStream.schema(file_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif ts_type != "timestamp":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


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
        finished = q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    if not finished:
        # a timed-out drain leaves PARTIAL aggregates in the sink — raising
        # beats returning them as if they were the complete answer
        raise TimeoutError(
            f"streaming drain did not finish within {timeout_sec}s "
            f"(query {name}); partial results discarded"
        )
    return out.sparkSession.table(name)
