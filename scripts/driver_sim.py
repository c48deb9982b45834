#!/usr/bin/env python
"""Full-registry driver-protocol correctness sweep (runnable artifact).

Replicates the round driver's correctness check over EVERY registered query
(the driver itself samples ~50): for each entry in
``__spark_entry__.queries()``, run the Spark DataFrame and the DuckDB oracle
SQL side-by-side on the same parquet fixtures and record

  * ``rows_match``   — same row count,
  * ``schema_match`` — same sorted column-name set,
  * ``hash_match``   — equal order-insensitive value hash: columns sorted by
    name, every cell rendered to a canonical string (floats rounded to 9
    digits with -0.0 folded, timestamps ISO-8601, NULL -> ""), rows sorted,
    sha256 over the whole rendering — the same sort-all-columns
    canonicalization the driver applies,

in the same per-query JSON shape the driver writes to CORRECTNESS_r{N}.json.
Entries with no oracle (genuinely non-SQL-expressible) are recorded as
rows-only with ``err: "no_oracle"``, exactly like the driver does.

Usage (from the repo root; artifact committed as CORRECTNESS_full_r{N}.json):

    python scripts/driver_sim.py --out CORRECTNESS_full_r3.json \
        --sf /root/testdata/sf0.01 --sf /root/testdata/sf0.001

The sweep runs in a vanilla session (local[32], shuffle partitions 32 — the
driver's shape) and a DuckDB connection whose views are registered straight
off the parquet files, so nothing from the engine's own session tuning can
mask a divergence.
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import hashlib
import json
import math
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build_spark(cpus: int = 32):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("driver_sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        # sizing only, not query tuning: the pyspark default 1g driver heap
        # OOMs a long sf0.1 sweep (the JVM dies -> py4j ConnectionRefused)
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def build_duck(sf_dir: str):
    """Fresh DuckDB connection per ENTRY (not per sweep) — root-caused fix
    for the mid-sweep "Failed to allocate block ... (bad allocation)" flake.

    The failures were never byte exhaustion (RSS ~1 GB when they hit): the
    big unrolled-expression oracles (ann_topk_*, dedup_semdedup) drive
    DuckDB's internal allocator to tens of thousands of distinct anonymous
    mmaps (measured: one ann_topk_ivfpq at 32 threads peaks >28k maps and
    RETAINS >30k on the connection), so a few heavy oracles on one
    long-lived connection cross the kernel's per-process vm.max_map_count
    (65530 default) and the next 1 MB malloc fails with free RAM to spare.
    Measured remedies, both applied here: ``threads=8`` cuts the peak ~5×
    (6.8k vs 28k at sf0.1 — and is FASTER, 2.2s vs 3.9s, since 32 DuckDB
    threads oversubscribe against the co-resident 32-thread JVM), and
    closing the connection releases every retained map (26.8k -> 892,
    reopen costs 8 ms)."""
    con = duckdb.connect()
    con.execute("SET threads TO 8")
    # memory cap: min() so it only ever TIGHTENS DuckDB's 80%-of-physical
    # default — co-residency with the 24g JVM (see tests/conftest.py)
    phys_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / 1e9
    con.execute(f"SET memory_limit='{min(24, max(1, int(phys_gb * 0.6)))}GB'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _cell(v) -> str:
    """Canonical string rendering of one value (engine-agnostic)."""
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return ""
        v = round(v, 9) + 0.0  # fold -0.0
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 9) + 0.0)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return str(v)
    if pd.api.types.is_scalar(v) and pd.isna(v):
        return ""
    return str(v)


def canonical_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for row in rows:
        h.update("\x1f".join(row).encode("utf-8", "surrogatepass"))
        h.update(b"\x1e")
    return h.hexdigest()


def run_sweep(sf_dir: str, cpus: int, only: list[str] | None = None) -> dict:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = build_spark(cpus)
    out: dict[str, dict] = {}
    names = [n for n in qs if (not only or n in only)]
    for i, name in enumerate(names):
        # per-entry connection: releases the retained mmaps of heavy
        # unrolled oracles before they accumulate (see build_duck)
        con = build_duck(sf_dir)
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            rec["spark_rows"] = int(len(sdf))
            sql = oracles.get(name)
            if sql is None:
                rec["err"] = "no_oracle"
                rec["rows_match"] = rec["spark_rows"] >= 0
            else:
                odf = con.execute(sql).fetchdf()
                rec["oracle_rows"] = int(len(odf))
                rec["rows_match"] = len(sdf) == len(odf)
                rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                rec["hash_match"] = (
                    rec["schema_match"]
                    and canonical_hash(sdf) == canonical_hash(odf)
                )
        except Exception:
            rec["err"] = traceback.format_exc(limit=3).strip().splitlines()[-1]
        finally:
            con.close()
        rec["sec"] = round(time.time() - t0, 2)
        out[name] = rec
        status = (
            "ROWS-ONLY" if rec["err"] == "no_oracle"
            else "PASS" if rec["hash_match"]
            else "FAIL"
        )
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({rec['sec']}s)",
              flush=True)
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", action="append", required=True,
                    help="fixture dir (repeatable)")
    ap.add_argument("--out", default=None, help="write combined JSON here")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to these query names")
    args = ap.parse_args()

    combined: dict[str, object] = {}
    ok = True
    for sf_dir in args.sf:
        print(f"=== sweep {sf_dir} ===", flush=True)
        res = run_sweep(sf_dir, args.cpus, args.only)
        n_pass = sum(1 for r in res.values() if r["hash_match"])
        n_rows_only = sum(1 for r in res.values() if r["err"] == "no_oracle")
        n_fail = len(res) - n_pass - n_rows_only
        combined[os.path.basename(sf_dir.rstrip("/"))] = {
            "results": res,
            "summary": {
                "total": len(res), "hash_pass": n_pass,
                "rows_only": n_rows_only, "fail": n_fail,
            },
        }
        print(f"=== {sf_dir}: {n_pass} pass / {n_rows_only} rows-only / "
              f"{n_fail} fail (of {len(res)}) ===", flush=True)
        ok = ok and n_fail == 0
    if args.out:
        with open(args.out, "w") as f:
            json.dump(combined, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
