#!/usr/bin/env python
"""The DAILY incremental-dedup loop, composed end to end — the steady-state
cycle the persisted minhash signature index exists for (and the r11
verdict's item #1). `bench_wiki_to_index.py` proves the one-shot pipeline
(ETL -> quality -> BATCH self-join dedup -> embed -> index); this sibling
proves the operation a 100 TB crawl pipeline actually runs every day:

    day 0:  ETL -> quality -> within-batch dedup -> minhash_index_build
    day k:  ETL -> quality -> within-batch dedup
            -> minhash_index_query against YESTERDAY's index  (cross-day)
            -> drop matched docs
            -> minhash_index_append survivors                  (grow index)

with, per cycle: stage timings, EXACT accounting of injected cross-day
duplicates (a 1-in-DUP_EVERY slice of the previous day's survivors
re-enters under new ids — the re-crawl case — and must be removed exactly),
a plan assertion that the index scan keeps its literal (band, bk)
PartitionFilters in every cycle, and per-(band, bk) FILE-COUNT stats over
the live index root.

COMPACTION CADENCE (r12 verdict item #3): every ``compact_every`` days the
loop runs the full steady-state maintenance move — minhash_index_compact
to a new root, index_publish swaps the CURRENT pointer, index_retire
reclaims the old generation — and every read in the loop resolves the
root THROUGH the pointer, exactly as a fleet of daily jobs would. The
cycle records file counts before/after (appends add one file per touched
partition per day; compaction must reset them to ~1) and the next day's
query runs against the compacted generation under the same pruning and
exactness assertions — so the artifact shows the query staying pruned,
exact and flat ACROSS the compaction, and the per-partition file counts
sawtoothing instead of growing without bound (at the measured ~15 ms/file
metadata floor, an uncompacted year would otherwise carry ~365
files/partition). The closing counterfactual re-runs the
BATCH self-join over the final full corpus: the number incremental dedup
exists to avoid paying per day (the operator-level 2.16x-vs-5.76x sf1
claim, proven at the pipeline level). Usage:

    python scripts/bench_wiki_to_index_incr.py [pages_per_day] [days] \
        [out.json] [compact_every]

``compact_every`` defaults to 0 (never — the r12-compatible layout-growth
mode); pass N>0 to compact after the append of every Nth day.

Honors SPARK_GRAFT_CPUS. Stage boundaries are materialized the way a real
pipeline checkpoints between jobs — each stage's time is its own cost.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DUP_EVERY = 20      # 1-in-20 of yesterday's survivors re-crawled today
DAY_OFFSET = 100_000_000   # doc-id band per day: ETL ids land at day*OFFSET
REID_SHIFT = 150_000_000   # re-crawled copy of a day-(k-1) doc -> day-k band


def main() -> None:
    pages_per_day = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    days = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    compact_every = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    import bench_wiki_etl as gen

    # same vocabulary widening as bench_wiki_to_index.py (and for the same
    # reason): the ETL generator's 26-word corpus has one Gopher stopword,
    # so gopher_pass would reject everything; monkeypatched here, never in
    # the generator, so the ETL throughput bench keeps its frozen corpus
    gen.WORDS = tuple(gen.WORDS) + (
        "of", "and", "to", "that", "with", "have", "be",
    ) + tuple(f"term{i:03d}" for i in range(200))

    from pyspark.sql import functions as F

    from wiki_mysql_spark.functions.text import gopher_features
    from wiki_mysql_spark.operators.dedup import (
        minhash_index_append,
        minhash_index_build,
        minhash_index_compact,
        minhash_index_query,
        minhash_lsh_pairs,
    )
    from wiki_mysql_spark.operators.similarity import (
        index_current,
        index_publish,
        index_retire,
    )
    from wiki_mysql_spark.plans.wiki_pipeline import run_wiki_etl
    from wiki_mysql_spark.session import get_session

    spark = get_session("wiki-incremental-dedup-bench")
    work = tempfile.mkdtemp(prefix="wiki_incr_")
    corpus_root = os.path.join(work, "corpus")
    # the index root is always resolved THROUGH the CURRENT pointer — the
    # deployment shape; compaction publishes a new generation behind it
    pointer = os.path.join(work, "current.json")

    def _band_file_stats(root: str) -> dict:
        """Driver-side walk of the (band, bk) layout: data files per leaf
        partition — the append-accumulation the ~15 ms/file floor prices."""
        vals = []
        for dirpath, _dirnames, filenames in os.walk(
            os.path.join(root, "bands")
        ):
            n = sum(1 for f in filenames if f.endswith(".parquet"))
            if n and "band=" in dirpath:
                vals.append(n)
        if not vals:
            return {"n_partitions": 0, "max_files": 0, "avg_files": 0.0}
        return {
            "n_partitions": len(vals),
            "max_files": max(vals),
            "avg_files": round(sum(vals) / len(vals), 2),
        }

    cycles: list[dict] = []
    prev_survivors = None

    for day in range(days):
        c: dict = {"day": day}

        # --- ETL + quality: the day's crawl becomes clean scored docs ----
        dump = os.path.join(work, f"dump_d{day}")
        gen.gen_dump(dump, pages_per_day, seed=42 + day, shards=8)
        t0 = time.perf_counter()
        etl_out = os.path.join(work, f"etl_d{day}")
        run_wiki_etl(spark, dump, etl_out)
        c["etl_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        bodies = spark.read.parquet(os.path.join(etl_out, "bodies"))
        docs = bodies.select(
            (F.col("id") + F.lit(day * DAY_OFFSET)).alias("doc_id"),
            F.col("body").alias("text"),
        )
        kept = (
            docs.where(gopher_features(F.col("text"))["gopher_pass"])
            .localCheckpoint(eager=True)
        )
        c["quality_sec"] = round(time.perf_counter() - t0, 2)
        c["batch_fresh"] = kept.count()

        # --- inject the re-crawl: 1-in-DUP_EVERY of yesterday's survivors
        # re-enters under day-k ids (exact copies — the double-ingest case)
        if prev_survivors is not None:
            dup_slice = prev_survivors.where(
                F.col("doc_id") % DUP_EVERY == 0
            ).withColumn("doc_id", F.col("doc_id") + F.lit(REID_SHIFT))
            injected = {int(r["doc_id"]) for r in dup_slice.select("doc_id").collect()}
            batch = kept.unionByName(dup_slice).localCheckpoint(eager=True)
        else:
            injected = set()
            batch = kept
        c["injected_dups"] = len(injected)
        c["batch_total"] = batch.count() if injected else c["batch_fresh"]

        # --- within-batch dedup (batch-sized self-join; the fresh random
        # corpus has no internal near-dups, which the count verifies) ------
        t0 = time.perf_counter()
        intra = minhash_lsh_pairs(batch)
        intra_losers = intra.select(F.col("doc_b").alias("doc_id")).distinct()
        n_intra = intra_losers.count()
        batch = batch.join(
            F.broadcast(intra_losers), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        c["self_dedup_sec"] = round(time.perf_counter() - t0, 2)
        c["intra_day_dups"] = n_intra

        if day == 0:
            # --- bootstrap: the first corpus becomes the first index,
            # published behind the CURRENT pointer ------------------------
            t0 = time.perf_counter()
            gen0 = os.path.join(work, "mh_index_gen0")
            minhash_index_build(batch, gen0)
            index_publish(spark, pointer, gen0)
            c["index_build_sec"] = round(time.perf_counter() - t0, 2)
            survivors = batch
        else:
            # --- cross-day dedup: today's batch vs the persisted index.
            # First the candidate pass alone (plan-asserted: the index scan
            # must carry literal (band, bk) partition filters EVERY cycle —
            # pruning has to survive the composed lineage, not just the
            # unit test), then the verified query that the pipeline acts on.
            index_root = index_current(spark, pointer)
            t0 = time.perf_counter()
            cand = minhash_index_query(spark, index_root, batch)
            c["candidate_pairs"] = cand.count()
            c["cand_query_sec"] = round(time.perf_counter() - t0, 2)
            plan = cand._jdf.queryExecution().executedPlan().toString()
            pruned = (
                "PartitionFilters: [" in plan
                and "band#" in plan
                and "bk#" in plan
            )
            assert pruned, f"day {day}: index query lost partition pruning"
            c["query_plan_pruned"] = pruned

            corpus = spark.read.parquet(corpus_root)
            t0 = time.perf_counter()
            pairs = minhash_index_query(
                spark, index_root, batch,
                corpus_docs=corpus, jaccard_threshold=0.5,
            )
            losers = pairs.select(F.col("doc_new").alias("doc_id")).distinct()
            matched = {int(r["doc_id"]) for r in losers.collect()}
            c["index_query_sec"] = round(time.perf_counter() - t0, 2)

            # EXACT accounting: the cross-day dedup must remove precisely
            # the injected re-crawls — nothing missed, nothing invented
            assert matched == injected, (
                f"day {day}: cross-day dedup mismatch — "
                f"missed {sorted(injected - matched)[:5]}, "
                f"invented {sorted(matched - injected)[:5]}"
            )
            c["cross_day_dups_removed"] = len(matched)
            c["cross_day_exact"] = True

            survivors = batch.join(
                F.broadcast(losers), "doc_id", "left_anti"
            ).localCheckpoint(eager=True)

            # --- grow the index with today's survivors -------------------
            t0 = time.perf_counter()
            minhash_index_append(survivors, index_root)
            c["index_append_sec"] = round(time.perf_counter() - t0, 2)

        live_root = index_current(spark, pointer)
        c["index_files"] = _band_file_stats(live_root)

        # --- compaction cadence: the steady-state maintenance move -------
        if compact_every and day > 0 and day % compact_every == 0:
            pre = c["index_files"]
            t0 = time.perf_counter()
            new_root = os.path.join(work, f"mh_index_gen{day}")
            minhash_index_compact(spark, live_root, new_root)
            index_publish(spark, pointer, new_root)
            retired = index_retire(spark, pointer, [live_root])
            c["compact_sec"] = round(time.perf_counter() - t0, 2)
            post = _band_file_stats(new_root)
            c["compact_files_before"] = pre
            c["compact_files_after"] = post
            assert retired == [live_root.rstrip("/")], (
                f"day {day}: retire reclaimed {retired}, "
                f"expected [{live_root}]"
            )
            assert post["max_files"] < max(2, pre["max_files"]), (
                f"day {day}: compaction did not reset per-partition file "
                f"counts ({pre} -> {post})"
            )
            c["index_files"] = post

        c["survivors"] = survivors.count()
        # the corpus store a production loop keeps anyway: verification
        # fetches candidate text from it (semi-join — never a full scan)
        survivors.withColumn("day", F.lit(day)).write.mode("append").partitionBy(
            "day"
        ).parquet(corpus_root)
        c["corpus_rows"] = spark.read.parquet(corpus_root).count()
        prev_survivors = survivors
        cycles.append(c)
        print(f"# day {day}: {json.dumps(c)}", file=sys.stderr)

    # --- the counterfactual: what each day WOULD cost without the index —
    # re-pairing the final corpus with itself (the batch self-join the
    # incremental loop replaces; at 100 TB this is the non-starter)
    full = spark.read.parquet(corpus_root).select("doc_id", "text")
    t0 = time.perf_counter()
    n_full_pairs = minhash_lsh_pairs(full).count()
    counterfactual = round(time.perf_counter() - t0, 2)

    q1 = next(c for c in cycles if c["day"] == 1)
    qn = cycles[-1]
    total = round(
        sum(
            v for c in cycles for k, v in c.items()
            if isinstance(v, float) and k.endswith("_sec")
        ),
        2,
    )
    out = {
        "metric": "wiki_incremental_dedup_loop_sec",
        "value": total,
        "unit": "sec",
        "pages_per_day": pages_per_day,
        "days": days,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "cycles": cycles,
        # the scale claim, measured at the pipeline level: the per-cycle
        # cross-day query cost as the corpus grows (day 1 vs final day)
        # vs the counterfactual full-corpus self-join each day would pay
        "query_cost_day1_sec": q1["index_query_sec"],
        "query_cost_final_sec": qn["index_query_sec"],
        "query_cost_growth": round(
            qn["index_query_sec"] / q1["index_query_sec"], 2
        ),
        "corpus_growth_day1_to_final": round(
            qn["corpus_rows"] / q1["corpus_rows"], 2
        ),
        "counterfactual_full_selfjoin_sec": counterfactual,
        "counterfactual_pairs": n_full_pairs,
        # honest framing: at toy scale the indexed path's ABSOLUTE cost is
        # dominated by the 512-directory layout floor (~15 ms/file metadata
        # cost, measured in perf notes — it amortizes once partitions hold
        # real data), so the load-bearing comparison is the GROWTH LAW:
        # query_cost_growth stays ~flat while the corpus (and with it the
        # self-join's candidate work, the thing re-paired daily without an
        # index) keeps growing — the operator-level sf1 evidence is 2.16x
        # for the indexed path vs 5.76x for the self-join at 10x data
        "scale_claim": (
            "per-cycle query cost tracks the batch, not the corpus: "
            f"corpus grew {round(qn['corpus_rows'] / q1['corpus_rows'], 2)}x "
            f"day1->final while the cross-day query went "
            f"{round(qn['index_query_sec'] / q1['index_query_sec'], 2)}x"
        ),
        "compact_every": compact_every,
        # the cadence evidence: per-partition file counts sawtooth at each
        # compaction and the cross-day query stays flat across the swap
        "compactions": [
            {
                "day": c["day"],
                "compact_sec": c["compact_sec"],
                "files_before": c["compact_files_before"],
                "files_after": c["compact_files_after"],
                "query_sec_same_day": c.get("index_query_sec"),
                "query_sec_next_day": next(
                    (
                        d.get("index_query_sec")
                        for d in cycles
                        if d["day"] == c["day"] + 1
                    ),
                    None,
                ),
            }
            for c in cycles
            if "compact_sec" in c
        ],
        "all_cycles_pruned": all(
            c.get("query_plan_pruned", True) for c in cycles
        ),
        "all_cycles_exact": all(
            c.get("cross_day_exact", True) for c in cycles
        ),
    }
    print(json.dumps(out))
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(out, f, indent=1)

    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
