#!/usr/bin/env python
"""Streaming sustained-rate benchmark (r5 verdict #5).

The 10 streaming entries are correctness-proven (drained availableNow ==
batch oracle) but were never rate-benched. This harness stages the events
fixture as N parquet files, drains each benched plan ONE FILE PER
MICRO-BATCH (``maxFilesPerTrigger=1``) — a fixed micro-batch cadence — and
reports, per entry, from the engine's own StreamingQueryProgress records:

  * sustained rows/sec  = total input rows / Σ triggerExecution,
  * per-batch input rows and batch durations,
  * state-store rows + memory ACROSS batches (the bounded-state evidence:
    tumbling-window state is bounded by the window/key domain and the
    watermark horizon, stateful-profile state by |users| — neither grows
    with stream length).

Usage:
    python scripts/bench_streaming.py [out.json]
    # honors SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
    #        SPARK_GRAFT_CPUS, SPARK_GRAFT_STREAM_FILES (default 16),
    #        SPARK_GRAFT_STREAM_SCALE (default 1 — row-volume multiplier,
    #        key domains unchanged), SPARK_GRAFT_STREAM_USER_SCALE
    #        (default 0=off — big-state section: key domain x N exactly,
    #        run under both the HDFS-backed and RocksDB state stores)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _staged_stream(spark, staging: str, schema):
    from pyspark.sql import functions as F

    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    # staged parquet may carry TIMESTAMP_NTZ; watermarks need TIMESTAMP
    # (same normalization as streaming/events.py:read_events_stream)
    if dict(df.dtypes)["ts"] != "timestamp":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _drain(out_df, *, output_mode: str, timeout_sec: int = 600) -> dict:
    """Run a streaming plan to completion on the availableNow trigger and
    distill its progress records into rate + state-growth metrics."""
    name = f"bench_{uuid.uuid4().hex[:12]}"
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        finished = q.awaitTermination(timeout_sec)
    finally:
        q.stop()
    m = _progress_metrics(q)
    # a timed-out drain reports partial progress — flag it rather than let a
    # truncated run masquerade as a legitimate sustained-rate measurement
    m["truncated"] = not finished
    return m


def _progress_metrics(q) -> dict:
    batches = []
    for p in q.recentProgress:
        state = p.get("stateOperators") or []
        batches.append(
            {
                "rows": int(p.get("numInputRows") or 0),
                "trigger_ms": int(
                    (p.get("durationMs") or {}).get("triggerExecution") or 0
                ),
                "state_rows": sum(int(s.get("numRowsTotal") or 0) for s in state),
                "state_mb": round(
                    sum(int(s.get("memoryUsedBytes") or 0) for s in state) / 1e6,
                    2,
                ),
            }
        )
    data = [b for b in batches if b["rows"] > 0]
    total_rows = sum(b["rows"] for b in data)
    total_ms = sum(b["trigger_ms"] for b in data)
    return {
        "n_batches": len(data),
        "total_rows": total_rows,
        "total_trigger_sec": round(total_ms / 1000, 2),
        "rows_per_sec": round(total_rows / (total_ms / 1000), 1) if total_ms else None,
        "state_rows_per_batch": [b["state_rows"] for b in data],
        "state_mb_final": data[-1]["state_mb"] if data else 0.0,
        "batch_ms": [b["trigger_ms"] for b in data],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_files = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "16"))
    # r6 verdict #6: the 16-small-file cadence measured the ~0.7s/batch
    # fixed cost, not the per-row cost. scale>1 unions id-shifted fixture
    # copies (state-key domains unchanged) so each micro-batch is big
    # enough for trigger time >= 5s — the steady-state operating region.
    scale = int(os.environ.get("SPARK_GRAFT_STREAM_SCALE", "1"))

    from pyspark.sql import functions as F

    from wiki_mysql_spark.session import get_session
    from wiki_mysql_spark.streaming.stateful import user_profiles_stateful
    from wiki_mysql_spark.streaming.upsert import stage_events_as_files

    spark = get_session("wiki_mysql_spark-stream-bench")
    staging, ev = stage_events_as_files(
        spark, sf_dir, n_files=n_files, scale=scale
    )
    schema = ev.schema
    results: dict[str, dict] = {}
    try:
        # 1. watermarked tumbling-window aggregate (stream_tumbling_window's
        # plan over the staged micro-batched source)
        s = _staged_stream(spark, staging, schema)
        agg = (
            s.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )
        results["stream_tumbling_window"] = _drain(agg, output_mode="complete")

        # 2. custom stateful operator (applyInPandasWithState per-user
        # profiles — stream_stateful_profiles' plan)
        s = _staged_stream(spark, staging, schema)
        results["stream_stateful_profiles"] = _drain(
            user_profiles_stateful(s), output_mode="update"
        )

        # 3. foreachBatch copy-on-write upsert (stream_upsert_profiles'
        # plan). foreachBatch reports no state operator (state lives in the
        # versioned parquet target), so rate only. The staged source and the
        # input-row count are prepared OUTSIDE the timed window — the window
        # covers exactly the drain (stream read + per-batch merge writes).
        from wiki_mysql_spark.streaming.upsert import run_stream_upsert

        n_rows = ev.count()
        t0 = time.perf_counter()
        target, n_batches = run_stream_upsert(
            spark, sf_dir, n_files=n_files, staging=staging
        )
        elapsed = time.perf_counter() - t0
        results["stream_upsert_profiles"] = {
            "n_batches": n_batches,
            "total_rows": n_rows,
            "total_trigger_sec": round(elapsed, 2),
            "rows_per_sec": round(n_rows / elapsed, 1),
            "state_rows_per_batch": None,
            "note": "foreachBatch merge: state is the versioned target table",
        }
    finally:
        shutil.rmtree(staging, ignore_errors=True)

    # 4. BIG-STATE stateful run (r7 verdict #6): the flat-state proof at
    # 15k users bounds the state, it doesn't exercise it. user_scale
    # id-shifts the USER domain too, so the key count is exactly
    # user_scale x |fixture users| (1.5M at sf1 x100) — run once per
    # state-store provider: the default HDFSBackedStateStore keeps every
    # key heap-resident per partition (the thing that stops scaling), the
    # RocksDB provider keeps state off-heap/on-disk with block-cache reads
    # — the documented 100 TB posture for stateful streaming.
    user_scale = int(os.environ.get("SPARK_GRAFT_STREAM_USER_SCALE", "0"))
    if user_scale:
        ROCKSDB = (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
        staging, ev = stage_events_as_files(
            spark, sf_dir, n_files=n_files, scale=user_scale,
            shift_users=True,
        )
        n_keys = ev.select("user_id").distinct().count()
        try:
            for label, provider in (
                ("hdfs_backed", None),
                ("rocksdb", ROCKSDB),
            ):
                if provider:
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.providerClass",
                        provider,
                    )
                try:
                    s = _staged_stream(spark, staging, schema)
                    r = _drain(
                        user_profiles_stateful(s), output_mode="update",
                        timeout_sec=int(
                            os.environ.get(
                                "SPARK_GRAFT_STREAM_TIMEOUT", "3600"
                            )
                        ),
                    )
                    r["n_state_keys_expected"] = n_keys
                    r["state_store"] = label
                    results[f"stream_stateful_profiles_{user_scale}x_{label}"] = r
                finally:
                    if provider:
                        spark.conf.unset(
                            "spark.sql.streaming.stateStore.providerClass"
                        )
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    out = {
        "metric": "streaming_rows_per_sec",
        "value": {k: v["rows_per_sec"] for k, v in results.items()},
        "unit": "rows/sec",
        "sf_dir": sf_dir,
        "n_source_files": n_files,
        "fixture_scale": scale,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "entries": results,
    }
    print(json.dumps(out))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
