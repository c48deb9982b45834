#!/usr/bin/env python
"""Measure DuckDB peak RSS / anonymous-map pressure for one oracle entry.

Runs the named oracle's SQL in THIS process on a fresh connection with a
driver-like thread count (default: all cores, the pessimistic case the
round driver hits) and reports:

  * VmHWM (peak RSS) from /proc/self/status,
  * /proc/self/maps line count before, at peak (sampled), and after,
  * wall seconds and result row count.

Usage:
    python scripts/oracle_mem_probe.py ann_topk_ivf_trained \
        --sf /root/testdata/sf0.1 [--threads 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _status_kb(key: str) -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith(key):
                return int(line.split()[1])
    return -1


def _n_maps() -> int:
    with open("/proc/self/maps") as f:
        return sum(1 for _ in f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entry")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--threads", type=int, default=0, help="0 = duckdb default")
    args = ap.parse_args()

    import duckdb

    from wiki_mysql_spark.queries import ORACLE

    sql = ORACLE[args.entry]
    con = duckdb.connect()
    if args.threads:
        con.execute(f"SET threads TO {args.threads}")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{args.sf}/{name}.parquet'"
        )

    maps0 = _n_maps()
    rss0 = _status_kb("VmRSS")
    peak_maps = [maps0]
    stop = threading.Event()

    def sampler() -> None:
        while not stop.is_set():
            peak_maps[0] = max(peak_maps[0], _n_maps())
            time.sleep(0.02)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.perf_counter()
    rows = con.execute(sql).fetchall()
    wall = time.perf_counter() - t0
    stop.set()
    th.join()
    maps1 = _n_maps()
    hwm = _status_kb("VmHWM")
    print(
        f"{args.entry}: rows={len(rows)} wall={wall:.2f}s "
        f"threads={args.threads or 'default'} "
        f"VmHWM={hwm / 1024:.0f}MB rss_before={rss0 / 1024:.0f}MB "
        f"maps_before={maps0} maps_peak={peak_maps[0]} "
        f"maps_retained={maps1}"
    )


if __name__ == "__main__":
    main()
