#!/usr/bin/env python
"""Per-entry scaling ratios between two bench artifacts (r6 verdict #3).

The sf1 fixture is ~10x sf0.1, so for a scale-linear operator the
per-entry wall ratio should sit well under 10x on 32 cores (fixed
per-job cost amortizes; parallelism absorbs data growth) and NEVER far
above it — a super-linear ratio is the scalability red flag the sweep
exists to catch (quadratic pair blowup, driver collect growth, one-task
stages).

Usage:
    python scripts/scale_ratios.py BENCH_sf1_r7.json BENCH_local_r7.json \
        [--flag 10.0]
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d["parsed"] if "parsed" in d and isinstance(d["parsed"], dict) else d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("big")
    ap.add_argument("small")
    ap.add_argument("--flag", type=float, default=10.0,
                    help="flag entries whose ratio exceeds this")
    args = ap.parse_args()
    b, s = load(args.big), load(args.small)
    qb, qs = b["queries"], s["queries"]
    shared = sorted(set(qb) & set(qs), key=lambda k: -(qb[k] / qs[k]))
    print(f"| entry | {args.small} s | {args.big} s | ratio |")
    print("|---|---|---|---|")
    flagged = []
    for k in shared:
        r = qb[k] / qs[k]
        mark = " **<-- super-linear**" if r > args.flag else ""
        if r > args.flag:
            flagged.append(k)
        print(f"| {k} | {qs[k]:.2f} | {qb[k]:.2f} | {r:.2f}x{mark} |")
    tb = sum(qb[k] for k in shared)
    ts = sum(qs[k] for k in shared)
    print(f"| TOTAL ({len(shared)} shared) | {ts:.1f} | {tb:.1f} | "
          f"{tb / ts:.2f}x |")
    print()
    print(f"flagged (> {args.flag}x): {flagged if flagged else 'none'}")
    bw_b, bw_s = b.get("membw_gbps_start"), s.get("membw_gbps_start")
    if bw_b and bw_s:
        print(f"membw: big-run {bw_b} GB/s, small-run {bw_s} GB/s")


if __name__ == "__main__":
    main()
