#!/usr/bin/env python
"""Render the NOTES performance-summary block FROM the committed artifacts.

r3 and r4 both shipped NOTES paragraphs whose numbers drifted from the
committed BENCH/CORRECTNESS JSONs (stale narrative — r4 verdict item 5).
This renderer makes the numbers byte-derived: point it at the artifacts and
paste its output; any claim in NOTES that disagrees with this output is by
definition wrong.

Usage:
    python scripts/render_notes_bench.py BENCH_r04.json [--prev BENCH_r03.json]
        [--correctness CORRECTNESS_full_r4.json ...]
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("bench")
    ap.add_argument("--prev", default=None)
    ap.add_argument("--sf1", default=None,
                    help="BENCH_sf1_r{N}.json: renders the 10x-data scale "
                    "ratio table (r9 verdict item 6 — the worst-ratio "
                    "claim must be artifact-derived, not hand-written)")
    ap.add_argument("--correctness", nargs="*", default=[])
    args = ap.parse_args()

    def load_bench(path: str) -> dict:
        # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
        # (plus n/rc/cpus/sf/tail); a raw bench.py line is the dict itself
        with open(path) as f:
            d = json.load(f)
        if "parsed" in d and isinstance(d["parsed"], dict):
            inner = dict(d["parsed"])
            inner.setdefault("cpus", d.get("cpus"))
            inner.setdefault("sf", d.get("sf"))
            return inner
        return d

    b = load_bench(args.bench)
    q = b["queries"]
    lines = [
        f"<!-- rendered by scripts/render_notes_bench.py from {args.bench} -->",
        f"Bench ({args.bench}): **{len(q)}-entry headline "
        f"{b['value']:.2f}s** at sf={b.get('sf')} on "
        f"{b.get('cpus') or '?'} cpus; "
        f"calibration {b.get('calibration_sec', float('nan')):.2f}s, "
        f"load1 {b.get('load1_at_start', float('nan')):.2f}, "
        f"min-of-{b.get('repeats_per_entry_min_reported', '?')} per entry.",
    ]
    slow = sorted(q.items(), key=lambda kv: -kv[1])[:5]
    lines.append(
        "Slowest entries: "
        + ", ".join(f"{k} {v:.2f}s" for k, v in slow) + "."
    )
    if args.prev:
        p = load_bench(args.prev)
        shared = sorted(set(q) & set(p["queries"]))
        if shared:
            now = sum(q[k] for k in shared)
            before = sum(p["queries"][k] for k in shared)
            cal_now = b.get("calibration_sec")
            cal_prev = p.get("calibration_sec")
            lines.append(
                f"Like-for-like vs {args.prev} ({len(shared)} shared "
                f"entries): {now:.1f}s vs {before:.1f}s = "
                f"{now / before:.2f}x raw"
                + (
                    f"; calibration ratio {cal_now / cal_prev:.2f}x "
                    f"(drift-normalized {now / before / (cal_now / cal_prev):.2f}x)"
                    if cal_now and cal_prev
                    else ""
                )
                + "."
            )
            # bandwidth attribution (r6 verdict item 2): entry times on
            # unchanged code scale with the host's memory bandwidth, which
            # the CPU calibration probe can't see. When both rounds carry
            # the membw column, a slower entry is attributed to the
            # machine if its ratio is within the bandwidth ratio (x1.15
            # margin); anything beyond that needs a code-level look.
            bw_now = b.get("membw_gbps_start")
            bw_prev = p.get("membw_gbps_start")
            bw_ratio = (bw_prev / bw_now) if bw_now and bw_prev else None
            if bw_ratio:
                lines.append(
                    f"Memory bandwidth: {bw_now:.1f} GB/s now vs "
                    f"{bw_prev:.1f} GB/s then -> expected same-code "
                    f"slowdown up to {bw_ratio:.2f}x."
                )
            regressed = [
                k for k in shared
                if q[k] > p["queries"][k] * 1.3 and q[k] - p["queries"][k] > 0.5
            ]
            def attrib(k: str) -> str:
                r = q[k] / p["queries"][k]
                if bw_ratio is None:
                    return f"{k} {p['queries'][k]:.2f}->{q[k]:.2f}s ({r:.2f}x)"
                verdict = (
                    "within bandwidth drift"
                    if r <= bw_ratio * 1.15
                    else "EXCEEDS bandwidth drift - inspect code"
                )
                return (
                    f"{k} {p['queries'][k]:.2f}->{q[k]:.2f}s ({r:.2f}x, "
                    f"{verdict})"
                )
            lines.append(
                "Entries >1.3x slower than last round: "
                + (", ".join(attrib(k) for k in regressed)
                   if regressed else "none")
                + ("" if bw_ratio else
                   " [no membw column in prev round - attribution by "
                   "same-session re-run]")
                + "."
            )
    if args.sf1:
        s = load_bench(args.sf1)
        shared = sorted(set(q) & set(s["queries"]))
        if shared:
            now = sum(q[k] for k in shared)
            at1 = sum(s["queries"][k] for k in shared)
            ratios = sorted(
                ((s["queries"][k] / q[k], k) for k in shared if q[k] > 0),
                reverse=True,
            )
            lines.append(
                f"Scale ({args.sf1}, {len(shared)} shared entries): 10x "
                f"data -> {at1 / now:.2f}x wall ({at1:.1f}s vs {now:.1f}s); "
                f"{sum(1 for r, _ in ratios if r > 10)} entries "
                f"super-linear (>10x)."
            )
            lines.append(
                "Worst sf1/sf0.1 ratios: "
                + ", ".join(
                    f"{k} {r:.1f}x ({q[k]:.2f}s->{s['queries'][k]:.2f}s)"
                    for r, k in ratios[:5]
                )
                + "."
            )
            faster = [(r, k) for r, k in ratios if r < 1.0]
            if faster:
                lines.append(
                    "Entries FASTER at sf1 (cost is O(layout), not O(rows)): "
                    + ", ".join(f"{k} {r:.2f}x" for r, k in faster) + "."
                )
    for path in args.correctness:
        with open(path) as f:
            c = json.load(f)
        # driver shape: {name: {...}} possibly nested under sf keys
        def flat(d):
            if all(isinstance(v, dict) and "results" in v for v in d.values()):
                for sf, v in d.items():
                    yield sf, v["results"]
            else:
                yield "", d
        for sf, results in flat(c):
            n = len(results)
            ok = sum(1 for r in results.values() if r.get("hash_match"))
            rows_only = sum(
                1 for r in results.values()
                if r.get("err") == "no_oracle" and r.get("rows_match")
            )
            err = sum(
                1 for r in results.values()
                if r.get("err") not in (None, "no_oracle")
            )
            tag = f" [{sf}]" if sf else ""
            lines.append(
                f"Correctness ({path}{tag}): {ok}/{n} hash-match, "
                f"{rows_only} rows-only, {err} errored."
            )
    print("\n".join(lines))


if __name__ == "__main__":
    main()
