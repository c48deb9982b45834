#!/usr/bin/env python
"""Measure the persisted-LSH-index LIFECYCLE end to end: build -> N
incremental appends (per-bucket file-count growth is O(appends) — the
merge-on-read debt) -> tombstone delete -> compact (debt settled: ~one
file per bucket again, dead rows gone) -> atomic pointer swap; with the
partition-pruned QUERY latency measured at every stage.

This is the evidence artifact for the r10 lifecycle additions: the 100 TB
posture says appends are cheap (one file per touched bucket, nothing
rewritten), deletes are cheap (a tombstone append; queries pay one
broadcast anti-join), and compaction is the periodic job that keeps
per-bucket file counts from dominating scan open/footer cost. Usage:

    python scripts/bench_index_lifecycle.py [n_appends] [out.json]

Honors SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and
SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _count_files(root: str, sub: str) -> int:
    n = 0
    for _, _, files in os.walk(os.path.join(root, sub)):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _timed(fn, repeats: int = 3) -> tuple[float, object]:
    """min-of-N wall time (the least-contended observation) + last result."""
    best, out = float("inf"), None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4), out


def main() -> None:
    n_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from wiki_mysql_spark.operators.similarity import (
        index_current,
        index_publish,
        index_retire,
        lsh_index_append,
        lsh_index_build,
        lsh_index_compact,
        lsh_index_delete,
        lsh_index_query,
    )
    from wiki_mysql_spark.session import get_session
    from wiki_mysql_spark.sources.tables import load_table

    spark = get_session("index-lifecycle-bench")
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    n_corpus = emb.count()
    max_id = emb.agg(F.max("vec_id")).first()[0] or 0
    queries = emb.where(F.col("vec_id") < 5)

    def q_latency(root: str) -> tuple[float, int]:
        sec, df = _timed(
            lambda: lsh_index_query(spark, root, queries, k=10, probe_bits=1)
            .collect()
        )
        return sec, len(df)  # type: ignore[arg-type]

    root = tempfile.mkdtemp(prefix="idx_lifecycle_")
    stages: dict[str, object] = {}

    # --- BUILD on the base corpus
    t0 = time.perf_counter()
    lsh_index_build(emb, root, dim=64, n_planes=8, n_tables=2)
    stages["build_sec"] = round(time.perf_counter() - t0, 2)
    stages["files_after_build"] = _count_files(root, "buckets")
    sec, rows = q_latency(root)
    stages["query_sec_after_build"] = sec
    stages["query_rows"] = rows

    # --- N APPENDS of id-shifted slices (new vector ids, same geometry):
    # each append adds ~one file per touched bucket and rewrites nothing
    append_secs = []
    slice_rows = max(1, n_corpus // 10)
    for i in range(n_appends):
        delta = (
            emb.where(F.col("vec_id") % 10 == i % 10)
            .withColumn(
                "vec_id", F.col("vec_id") + F.lit((i + 1) * (max_id + 1))
            )
        )
        t0 = time.perf_counter()
        lsh_index_append(delta, root)
        append_secs.append(round(time.perf_counter() - t0, 2))
    stages["n_appends"] = n_appends
    stages["append_rows_each"] = slice_rows
    stages["append_secs"] = append_secs
    stages["files_after_appends"] = _count_files(root, "buckets")
    stages["query_sec_after_appends"] = q_latency(root)[0]

    # --- DELETE a third of the base corpus (merge-on-read tombstones)
    t0 = time.perf_counter()
    lsh_index_delete(
        spark, root, emb.where(F.col("vec_id") % 3 == 0).select("vec_id")
    )
    stages["delete_sec"] = round(time.perf_counter() - t0, 2)
    stages["query_sec_with_tombstones"] = q_latency(root)[0]

    # --- COMPACT to a new root (files back to ~one per bucket, deletes
    # physical, tombstones retired) + atomic pointer swap
    dst = tempfile.mkdtemp(prefix="idx_lifecycle_cmp_")
    t0 = time.perf_counter()
    lsh_index_compact(spark, root, dst)
    stages["compact_sec"] = round(time.perf_counter() - t0, 2)
    stages["files_after_compact"] = _count_files(dst, "buckets")
    pointer = os.path.join(tempfile.gettempdir(), "idx_lifecycle_current.json")
    t0 = time.perf_counter()
    index_publish(spark, pointer, dst)
    stages["publish_sec"] = round(time.perf_counter() - t0, 4)
    stages["query_sec_after_compact"] = q_latency(index_current(spark, pointer))[0]

    # --- RETIRE the pre-compaction generation (grace period elapsed);
    # the current generation must survive and stay queryable
    t0 = time.perf_counter()
    retired = index_retire(spark, pointer, [root, dst])
    stages["retire_sec"] = round(time.perf_counter() - t0, 4)
    stages["retired_roots"] = len(retired)
    assert retired == [root] and not os.path.exists(root)
    stages["query_sec_after_retire"] = q_latency(index_current(spark, pointer))[0]

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(dst, ignore_errors=True)
    try:
        os.remove(pointer)
    except OSError:
        pass

    print(json.dumps({
        "metric": "lsh_index_lifecycle",
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_corpus": n_corpus,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        **stages,
    }))
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as f:
            json.dump({"metric": "lsh_index_lifecycle", "unit": "sec",
                       "sf_dir": sf_dir, "n_corpus": n_corpus, **stages}, f)
    spark.stop()


if __name__ == "__main__":
    main()
