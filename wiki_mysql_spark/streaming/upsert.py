"""Incremental streaming upsert sink: foreachBatch + MERGE per micro-batch.

The missing piece between streaming aggregation (memory/complete sinks) and
a real serving table: each micro-batch is aggregated and MERGED into a keyed
target, so the target is always a complete, queryable profile table — the
``foreachBatch`` idempotent-upsert pattern from the Structured Streaming
guide. The merge target is a VERSIONED PARQUET TABLE (read current version,
set-based merge, write next version, retire the old one) — i.e. the
copy-on-write half of what Delta's MERGE INTO does, minus the transaction
log. The profile rows never transit the driver, so the pattern scales with
executor count; swapping the target for Delta/Iceberg changes only the
read/write calls.

(SURVEY §2.7 extension; the closest reference hook is the per-page
INSERT+commit sink, ``/root/reference/database.py:75-85`` — this is its
streaming-era replacement.)
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_mysql_spark.operators.cdc import merge_upsert
from wiki_mysql_spark.sources.tables import load_table


def stage_events_as_files(
    spark: SparkSession, sf_dir: str, *, n_files: int = 4, scale: int = 1,
    shift_users: bool = False,
) -> tuple[str, DataFrame]:
    """Stage the events fixture as several parquet files so the file stream
    source (maxFilesPerTrigger=1) actually produces several micro-batches —
    one static file would collapse the whole run into a single batch and
    prove nothing about incrementality. Split by hash(event_id) so every
    batch holds an arbitrary time-slice (out-of-order arrival included).

    ``scale`` unions that many id-shifted copies of the fixture before
    staging (event_id offset by copy x (max+1); user/type/ts domains
    UNCHANGED): micro-batches grow by x scale while every state bound
    stays put — the knob the rate bench uses to size trigger time past
    the fixed per-batch cost without also inflating the state domain.

    ``shift_users=True`` additionally offsets user_id per copy, so the
    state KEY DOMAIN grows by exactly x scale (each copy carries the full
    original user set, disjoint from every other copy's) — the knob for
    benching stateful operators under big state (e.g. 100x the fixture's
    users = 1.5M state rows at sf1) with an exactly-known expected key
    count rather than a sampled approximation."""
    ev = load_table(spark, sf_dir, "events")
    if scale > 1:
        mx = ev.agg(F.max("event_id")).first()[0] or 0
        umx = (
            (ev.agg(F.max("user_id")).first()[0] or 0) if shift_users else 0
        )
        copies = [
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * (mx + 1)))
            for i in range(scale)
        ]
        if shift_users:
            copies = [
                c.withColumn(
                    "user_id", F.col("user_id") + F.lit(i * (umx + 1))
                )
                for i, c in enumerate(copies)
            ]
        scaled = copies[0]
        for c in copies[1:]:
            scaled = scaled.unionAll(c)
        ev = scaled
    staging = tempfile.mkdtemp(prefix="stream_upsert_src_")
    ev.repartition(n_files, F.col("event_id")).write.mode("overwrite").parquet(staging)
    return staging, ev


def run_stream_upsert(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_files: int = 4,
    timeout_sec: int = 180,
    staging: str | None = None,
) -> tuple[DataFrame, int]:
    """Drain the staged event stream one file per micro-batch, merging each
    batch's per-user aggregate into the running profile table. Returns the
    final target and the number of micro-batches that ran.

    The per-batch merge is the set-based ``merge_upsert`` (full-outer on
    user_id; additive counts/sums, greatest timestamp) — associative and
    commutative per key, so the final table equals the one-shot batch
    aggregate regardless of how rows landed in batches (the oracle's claim).

    Pass ``staging`` to reuse a directory already produced by
    ``stage_events_as_files`` (the caller then owns its lifetime — e.g. the
    rate bench, which must not time a second staging write); when omitted,
    this function stages and cleans up itself.
    """
    own_staging = staging is None
    if own_staging:
        staging, ev = stage_events_as_files(spark, sf_dir, n_files=n_files)
    else:
        ev = load_table(spark, sf_dir, "events")
    target_root = tempfile.mkdtemp(prefix="stream_upsert_tgt_")
    state: dict[str, object] = {"path": None, "batches": 0}

    def profile(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = profile(batch_df)
        if state["path"] is None:
            merged = delta.withColumn("action", F.lit("insert"))
        else:
            prev = spark.read.parquet(str(state["path"]))
            merged = merge_upsert(
                prev,
                delta,
                on="user_id",
                strategies={
                    "n_events": "sum",
                    "total_value": "sum",
                    "last_ts": "max",
                },
            )
        # copy-on-write MERGE: write version N+1 while version N is readable,
        # then retire N — rows never transit the driver. With a Delta/Iceberg
        # target these three lines are one MERGE INTO.
        new_path = os.path.join(target_root, f"v{batch_id}")
        merged.drop("action").write.mode("overwrite").parquet(new_path)
        old = state["path"]
        state["path"] = new_path
        if old is not None:
            shutil.rmtree(str(old), ignore_errors=True)
        state["batches"] = int(state["batches"]) + 1  # type: ignore[call-overload]

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .queryName(f"upsert_{uuid.uuid4().hex[:12]}")
        .trigger(availableNow=True)
        .start()
    )
    try:
        try:
            finished = q.awaitTermination(timeout_sec)
        finally:
            q.stop()
            if own_staging:
                shutil.rmtree(str(staging), ignore_errors=True)
        if not finished:
            # a timed-out drain means the target holds PARTIAL merges —
            # raise instead of returning half a profile table with an
            # understated batch count
            raise TimeoutError(
                f"stream upsert did not drain within {timeout_sec}s "
                f"({state['batches']} of the staged micro-batches merged)"
            )
        if state["path"] is None:
            # zero micro-batches (empty source): an empty profile table, not a
            # confusing read-from-None path error
            final = profile(ev).limit(0).localCheckpoint(eager=True)
        else:
            # materialize executor-side (localCheckpoint, not collect) so the
            # versioned target directory can be retired before returning —
            # otherwise every call leaks its final parquet version
            final = spark.read.parquet(str(state["path"])).localCheckpoint(eager=True)
    finally:
        # single outer finally: the versioned target is removed on EVERY
        # path, including a query exception mid-drain (was: a second
        # try/finally never reached on the exception path, leaking a
        # stream_upsert_tgt_* parquet tree per failed run)
        shutil.rmtree(target_root, ignore_errors=True)
    return final, int(state["batches"])  # type: ignore[call-overload]
