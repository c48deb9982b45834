"""Console progress reporting for the ETL — the reference's tqdm bars,
Spark-native (SURVEY §2 P4; ``/root/reference/dbfy.py:158,191,231-245``).

The reference wraps its per-row loops in ``tqdm`` so a long dump load shows
liveness and rate on the console. A Spark job has no driver-side row loop
to wrap — per-partition work happens on executors — so the equivalent
observable is the engine's own task telemetry: `SparkContext.statusTracker`
exposes, per active stage, how many tasks have completed out of how many.
`job_progress` polls it from a daemon thread and prints tqdm-style lines

    [wiki-etl] stage 12: 17/32 tasks (53%) | 3 stages done, 41.2s

to stderr at a fixed cadence, only while something is actually running —
idle polls print nothing, so interactive use stays quiet between actions.

This is deliberately a THIN console affordance over the engine's telemetry
(the Spark UI remains the rich view); it adds zero jobs, zero listeners on
the hot path, and nothing to the data plane. Python-side StatusTracker
polling is used instead of a JVM ``SparkListener`` subclass because the
listener would need py4j callback-server round-trips per event — per-TASK
overhead on a 100k-task job — while one poll per second is O(1).
"""

from __future__ import annotations

import sys
import threading
import time
from contextlib import contextmanager
from typing import Iterator


@contextmanager
def job_progress(
    spark,
    desc: str = "spark",
    *,
    interval_sec: float = 1.0,
    out=None,
) -> Iterator[None]:
    """Context manager: while the body runs, report active-stage task
    progress for this SparkContext to ``out`` (default: stderr) every
    ``interval_sec``. Thread-safe with concurrent actions; exits cleanly
    (the reporter is a daemon thread joined on ``__exit__``)."""
    sink = out if out is not None else sys.stderr
    tracker = spark.sparkContext.statusTracker()
    stop = threading.Event()
    t0 = time.time()
    done_stages: set[int] = set()
    # stages currently (or recently) seen active -> their task count; a
    # stage counts as DONE only on the active->inactive transition with
    # its completed-task count at the task count we saw — counting "in an
    # active job's stageIds but not active" (the old spelling) marked
    # never-submitted pending/skipped stages as done. Counted = stages
    # OBSERVED active in at least one poll: a stage that submits and
    # completes entirely inside one poll interval never enters `watching`
    # and is absent from the "N stages done" total (a progress-display
    # undercount only, acceptable at the 1 s default interval).
    watching: dict[int, int] = {}

    def poll() -> None:
        while not stop.wait(interval_sec):
            try:
                active = set(tracker.getActiveStageIds())
                lines = []
                for sid in sorted(active):
                    info = tracker.getStageInfo(sid)
                    if info is None or info.numTasks == 0:
                        continue
                    watching[sid] = info.numTasks
                    done = info.numCompletedTasks
                    pct = int(100 * done / info.numTasks)
                    lines.append(f"stage {sid}: {done}/{info.numTasks} tasks ({pct}%)")
                for sid in [s for s in watching if s not in active]:
                    info = tracker.getStageInfo(sid)
                    # info evicted after completion also means the stage
                    # ran to its end (failed stages re-appear as retries
                    # under a NEW stage attempt with the same id — still
                    # one logical stage done when it finally leaves)
                    if info is None or info.numCompletedTasks >= watching[sid]:
                        done_stages.add(sid)
                    watching.pop(sid)
                if lines:
                    el = time.time() - t0
                    print(
                        f"[{desc}] " + " | ".join(lines)
                        + f" | {len(done_stages)} stages done, {el:.1f}s",
                        file=sink,
                        flush=True,
                    )
            except Exception:
                # telemetry must never kill the job it narrates
                pass

    th = threading.Thread(target=poll, daemon=True, name=f"progress-{desc}")
    th.start()
    try:
        yield
    finally:
        stop.set()
        th.join(timeout=interval_sec * 2 + 1)
        el = time.time() - t0
        print(f"[{desc}] done in {el:.1f}s", file=sink, flush=True)
