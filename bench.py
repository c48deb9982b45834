#!/usr/bin/env python
"""Headline benchmark: run the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Headline set: one per operator family, weighted toward the expensive shapes
# (fact-fact joins, wide aggs, windows, text/vector ops).
HEADLINE = [
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "q3_top_orders_by_segment",
    "q6_revenue_forecast",
    "join_theta_residual",
    "agg_count_distinct",
    "window_topk_per_group",
    "sort_topk_global",
    "pivot_events_by_type",
    "fn_json_suite",
    "wiki_clean_markup",
    "wiki_articles_bodies",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "dedup_ngram_jaccard",
    "dedup_substring_spans",
    "ann_topk_bruteforce",
    "text_quality",
    "text_tokens_fingerprint",
    "text_bm25_topk",
    "sessionize_events",
    "graph_pagerank",
    "multimodal_features_arrow",
    "stream_tumbling_window",
    # round-3 families: bloom-prefiltered decontam, compressed-codec decode,
    # rule-set quality filtering, z-order layout
    "decontam_bloom",
    "multimodal_decode_png",
    "text_gopher_quality",
    "layout_zorder_stats",
    # round-4: lossy transform-coding decode (DCT/Huffman JPEG), container
    # video decode (MJPEG-AVI), the distributed triangle count, iterative
    # BPE subword-vocabulary training
    "multimodal_decode_jpeg",
    "multimodal_decode_video",
    "graph_triangle_count",
    "tokenize_bpe_train",
    # round-4 late additions: PQ/ADC search, semantic dedup, importance
    # resampling, the composed RAG retrieval job, mergeable sketches
    "ann_topk_pq",
    "dedup_semdedup",
    "corpus_dsir_weights",
    "rag_retrieve_context",
    "agg_hll_merge_partitions",
    # round-6: the IVF+PQ composition (cell-bounded ADC), and the fuzzy
    # family's distinct-name contraction (the r5 scale-killer fix)
    "ann_topk_ivfpq",
    "ann_index_query",
    "dedup_fuzzy_clusters",
    # round-9: the persisted bucket-partitioned LSH index, plus both index
    # BUILD entries so persist cost is measured where it is paid — the
    # *_index_query entries reuse a once-per-process index (build-once,
    # query-many is the persisted index's semantics) and so measure the
    # partition-pruned query path
    "ann_index_build",
    "lsh_index_build",
    "lsh_index_query",
    # round-9: rank-fused hybrid retrieval (BM25 x embedding-cosine)
    "hybrid_search_rrf",
    # round-10: the same fusion with the vector pool served by the
    # persisted LSH index — the 100 TB path, measured
    "hybrid_search_rrf_indexed",
    # round-11: the lifecycle's publication + health surfaces — query
    # through the atomic CURRENT pointer, and the IVFADC occupancy stats
    "lsh_index_publish",
    "ivfpq_index_stats",
    # round-11: incremental dedup — today's batch vs the persisted
    # signature index, partition-pruned, text fetched only for candidates
    "dedup_minhash_incremental",
    # round-12: the dedup index's health surface (directory-columns-only
    # scan over the persisted signature index), and CCNet-style
    # perplexity filtering under a reference-trained bigram LM
    "minhash_index_stats",
    "text_perplexity_filter",
    # round-13: the IVFADC publication surface — the last index family's
    # publish->resolve->query composition (pointer read + pruned cell scan)
    "ivfpq_index_publish",
]

# Entries whose steady-state cost is the partition-pruned QUERY path over a
# once-per-process persisted index (_cached_index). Warmed UNTIMED before
# the timed loop so the reported number is repeat-count-independent — with
# SPARK_GRAFT_BENCH_REPEATS=1 (or a targeted SPARK_GRAFT_BENCH_ONLY rerun)
# the single timed run used to silently pay the cold index build
# (r9 advice item). Build cost stays measured where it is paid: the
# *_index_build entries.
INDEX_QUERY_WARMUP = {
    "ann_index_query",
    "lsh_index_query",
    "lsh_index_stats",
    "lsh_index_publish",
    "ivfpq_index_stats",
    "dedup_minhash_incremental",
    "minhash_index_stats",
    "hybrid_search_rrf_indexed",
    "ivfpq_index_publish",
}


def _concurrent_spark_jvms() -> int:
    """Count OTHER Spark JVMs on this host (run before our own session
    starts). A nonzero value means the numbers below shared the machine —
    recorded in the output so a slow run is attributable."""
    n = 0
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
            except OSError:
                continue
            if b"org.apache.spark" in cmd and int(pid) != os.getpid():
                n += 1
    except OSError:
        pass
    return n


def _cpu_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat. Steal is time the HYPERVISOR
    ran someone else while this VM wanted the cpu — the one contention
    source neither loadavg nor concurrent-JVM counting can see (observed:
    an idle-guest run 1.4x slower than the committed round artifact with
    calibration drifting in lockstep — host-level neighbors). Recording the
    per-run steal share makes that attribution mechanical."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def _membw_gbps() -> float:
    """STREAM-COPY memory-bandwidth probe (r6 verdict What's-wrong #2):
    the CPU-bound calibration probe stayed flat (within 7%) across
    host windows where per-entry times on UNCHANGED code swung up to
    ~1.8x — the shuffle/scan-heavy entries are bandwidth-bound, and
    noisy-neighbor bandwidth contention is invisible to a
    cache-resident CPU probe. The kernel is STREAM's COPY over 16M
    float64 (2 x 128 MB per pass — far past any LLC; 16 bytes/element,
    one read + one write, no temporaries, so the byte accounting is
    exact — numpy's triad would hide an unfused temp array), best of 5
    passes: 'best observed' is this window's bandwidth ceiling, so a
    depressed value vs another round's makes a same-code per-entry
    delta attributable to the machine, mechanically."""
    import numpy as np

    n = 16_000_000
    b = np.full(n, 1.5)
    a = np.empty(n)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.copyto(a, b)
        best = min(best, time.perf_counter() - t0)
    return round(16.0 * n / best / 1e9, 2)


def _calibration_sec(spark) -> float:
    """Fixed, fixture-independent workload (codegen hash + one shuffle +
    agg over a generated range): one untimed warm run (codegen compile +
    JIT), then min-of-4. Identical work every round, so the ratio between
    two rounds' calibration numbers measures MACHINE drift — divide a
    round-over-round entry comparison by it before calling a change a
    regression. (min-of-2 WITH the compile run included swung 14% between
    otherwise-identical rounds — enough to manufacture phantom
    drift-normalized regressions.)"""
    from pyspark.sql import functions as F

    def probe() -> None:
        (
            spark.range(0, 20_000_000)
            .select(((F.col("id") * 2654435761) % 1_000_003).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("s"))
            .write.format("noop").mode("overwrite").save()
        )

    probe()  # untimed: codegen compilation + JIT warmup
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        probe()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    from wiki_mysql_spark.queries import QUERIES
    from wiki_mysql_spark.session import get_session

    other_jvms = _concurrent_spark_jvms()
    load1 = os.getloadavg()[0]
    if other_jvms:
        print(
            f"# WARNING: {other_jvms} other Spark JVM(s) running — "
            "timings will include contention",
            file=sys.stderr,
        )

    spark = get_session("wiki_mysql_spark-bench")
    names = [n for n in HEADLINE if n in QUERIES]
    # Targeted re-runs (e.g. confirming a round-over-round drift is load
    # noise, not a plan change) without touching the headline set.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in QUERIES]
        if unknown:
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_ONLY names not in the registry: {unknown}"
            )
        # every requested registry entry runs, headline or not — a mixed
        # list must not silently drop the non-headline members
        names = wanted

    # Warm the JVM/codegen once on the smallest SF so per-query numbers
    # measure execution, not first-call classloading.
    QUERIES[names[0]](spark, "/root/testdata/sf0.001").collect()
    # Warm the per-process index cache for index-backed query entries so
    # their timed runs measure the pruned query path at ANY repeat count.
    for name in names:
        if name in INDEX_QUERY_WARMUP:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            print(
                f"# warmed index cache via {name} "
                f"({time.perf_counter() - t0:.1f}s, untimed)",
                file=sys.stderr,
            )
    calibration = _calibration_sec(spark)
    membw_start = _membw_gbps()
    print(f"# calibration: {calibration:.3f}s  membw: {membw_start} GB/s",
          file=sys.stderr)

    # Per-entry min over `repeats` runs: the min is the least-contended
    # observation — one GC pause / page-cache miss / cron neighbor no
    # longer reads as a query regression (VERDICT r3 What's-wrong #2).
    timings: dict[str, float] = {}
    # machine load snapshot alongside each entry: cross-round noise
    # attribution (r5's 7 phantom "regressions" were load drift) becomes
    # mechanical — compare the per-entry load columns, not the narrative
    load_at_entry: dict[str, float] = {}
    steal0, total0 = _cpu_jiffies()
    for name in names:
        best = float("inf")
        load_at_entry[name] = round(os.getloadavg()[0], 2)
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            # noop sink fully materializes every column (a bare .count()
            # would let the optimizer prune window/projection work).
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    membw_end = _membw_gbps()
    steal1, total1 = _cpu_jiffies()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (total1 - total0), 2)
        if total1 > total0
        else None
    )
    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # The round driver records only the LAST 2000 chars of stdout and
    # json-parses that tail; its "parsed" field was null for rounds 8-12
    # because the single stdout line exceeded the window (r12 moved
    # metric/value/unit last, which put the HEADLINE in the tail but the
    # tail was still a truncated fragment, not parseable JSON). Fix: the
    # window-diagnostics (the per-entry load1 samples are ~1.4 KB alone)
    # go to STDERR with the per-query progress lines, and the one stdout
    # line is compact-separator JSON — queries + window summary + headline
    # fit in ~1.7 KB, so the driver's tail capture IS the complete line.
    diagnostics = {
        "concurrent_spark_jvms": other_jvms,
        "load1_at_start": round(load1, 2),
        "load1_at_entry": load_at_entry,
        "host_steal_pct": steal_pct,
        "calibration_sec": calibration,
        "membw_gbps_start": membw_start,
        "membw_gbps_end": membw_end,
        "repeats_per_entry_min_reported": repeats,
    }
    print(f"# window: {json.dumps(diagnostics)}", file=sys.stderr)
    out = {
        "queries": timings,
        "sf": float(sf) if sf else None,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "concurrent_spark_jvms": other_jvms,
        "load1_at_start": round(load1, 2),
        "host_steal_pct": steal_pct,
        "calibration_sec": calibration,
        "membw_gbps_start": membw_start,
        "repeats_per_entry_min_reported": repeats,
        "metric": "headline_queries_total_sec",
        "unit": "sec",
        "value": total,
    }
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:
        # never let the stdout line outgrow the driver's 2000-char tail:
        # drop the window-summary keys first (they remain on stderr), then
        # as a last resort keep only the slowest-N query timings
        for k in ("membw_gbps_start", "calibration_sec", "host_steal_pct",
                  "load1_at_start", "concurrent_spark_jvms",
                  "repeats_per_entry_min_reported"):
            out.pop(k, None)
            line = json.dumps(out, separators=(",", ":"))
            if len(line) <= 1900:
                break
        while len(line) > 1900 and len(out["queries"]) > 1:
            keep = sorted(timings.items(), key=lambda kv: -kv[1])
            out["queries"] = dict(keep[: max(1, len(out["queries"]) - 5)])
            out["queries_truncated_to_slowest_n"] = len(out["queries"])
            line = json.dumps(out, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
