#!/usr/bin/env python
"""Per-entry job-count + wall profiler (guide §1: measure first).

For each named registry entry: run once to warm (codegen, index caches),
then measure `repeats` timed runs of construct + noop-sink action,
reporting wall seconds (min), the number of Spark JOBS the entry launched
(statusTracker job-id delta, warm run — the per-job ~0.2-0.3s scheduler
floor at local[32] is the fixed overhead the toy-SF bench actually pays),
and the construct-only wall (driver-side plan building).

Usage:
    python scripts/profile_entry.py dedup_minhash_incremental lsh_index_query \
        [--sf /root/testdata/sf0.1] [--repeats 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from wiki_mysql_spark.queries import QUERIES
    from wiki_mysql_spark.session import get_session

    spark = get_session("wiki_mysql_spark-profile")
    tracker = spark.sparkContext.statusTracker()

    def njobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else 0

    # classloader/codegen warm
    QUERIES[args.entries[0]](spark, "/root/testdata/sf0.001").collect()

    for name in args.entries:
        fn = QUERIES[name]
        # warm run (also populates _cached_index for index-backed entries)
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        best_total = best_construct = float("inf")
        jobs = 0
        for _ in range(args.repeats):
            j0 = njobs()
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs = njobs() - j0
            best_total = min(best_total, t2 - t0)
            best_construct = min(best_construct, t1 - t0)
        print(
            f"{name}: total={best_total:.3f}s construct={best_construct:.3f}s "
            f"jobs={jobs}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
