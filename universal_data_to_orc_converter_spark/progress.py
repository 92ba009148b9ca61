"""Per-table conversion progress reporting.

The reference logs per-chunk progress while converting — e.g.
``Progress users: 500,000/10,458,327 rows`` (data_to_orc_converter.sh:249;
README.md:106-110 documents it as a feature) — because its pandas
loop owns a driver-side cursor. A Spark conversion is one distributed
write with no driver loop to hang a row counter on, so the honest
distributed analogs are:

* **in-flight**: task completion out of ``statusTracker()`` — a
  daemon thread polls the active stages under the write's job group
  and emits ``Progress <table>: K/N tasks`` lines whenever the count
  moves. Tasks, not rows: Spark cannot know the total row count
  before the scan finishes without paying a second pass, and at
  100 TB nobody should pay that pass for a log line.
* **per-table total**: an ``Observation`` (``df.observe``) riding the
  write plan counts rows *during* the single pass — exact, zero extra
  scan, and it works on any batch action. Emitted as
  ``<table>: 10,458,327 rows -> /out/users (2/14 tables)``.

``report=None`` (the default everywhere) keeps every conversion
silent and plan-identical — the hook adds an ``observe`` node only
when a callback is supplied.
"""

from __future__ import annotations

import threading
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_with_progress"]

#: seconds between statusTracker polls while a table writes
_POLL_SEC = 0.5


def _poll_tasks(
    spark: SparkSession,
    say: Callable[[str], None],
    name: str,
    group: str,
    stop: threading.Event,
) -> None:
    # scoped to the write's own job group so concurrent table
    # conversions (Spark schedules them freely — op_parallel_tables)
    # never mix their task counts into each other's narration
    tracker = spark.sparkContext.statusTracker()
    last = -1
    while not stop.wait(_POLL_SEC):
        try:
            done = total = 0
            for jid in tracker.getJobIdsForGroup(group):
                job = tracker.getJobInfo(jid)
                if job is None:
                    continue
                for sid in job.stageIds:
                    info = tracker.getStageInfo(sid)
                    if info is not None:
                        done += info.numCompletedTasks
                        total += info.numTasks
        except Exception:  # tracker races with job teardown — benign
            continue
        if total and done != last:
            last = done
            say(f"Progress {name}: {done}/{total} tasks")


def write_with_progress(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    index: int,
    total_tables: int,
    report: Callable[[str], None] | None,
    write: Callable[[DataFrame], None],
) -> None:
    """Run ``write(df)``, narrating per-table progress via ``report``.

    With ``report=None`` this is exactly ``write(df)`` — no observe
    node, no poller thread, byte-identical plan.

    Contract: ``write`` MUST execute at least one action on the frame
    it is handed — the row total comes from an ``Observation`` riding
    that action, and ``Observation.get`` blocks until some action
    materializes the observed plan. A ``write`` that never acts would
    hang here; the guard below converts that programming error into an
    immediate ValueError instead (r12 advice).
    """
    if report is None:
        write(df)
        return
    obs = Observation(f"convert_{name}_{index}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    report(f"Converting {name} ({index}/{total_tables}) ...")
    sc = spark.sparkContext
    group = f"convert_{name}_{index}"
    # save the CALLER's job group (thread-local) so a caller that wraps
    # multi-table conversions in its own group gets it back, instead of
    # the old unconditional clear wiping it after the first table
    # (r12 advice)
    prev_group = sc.getLocalProperty("spark.jobGroup.id")
    prev_desc = sc.getLocalProperty("spark.job.description")
    stop = threading.Event()
    poller = threading.Thread(
        target=_poll_tasks,
        args=(spark, report, name, group, stop),
        daemon=True,
    )
    poller.start()
    sc.setJobGroup(group, f"convert {name} -> ORC")
    ran_action = False
    try:
        write(observed)
        tracker = sc.statusTracker()
        ran_action = bool(tracker.getJobIdsForGroup(group))
    finally:
        sc.setJobGroup(prev_group, prev_desc)
        stop.set()
        poller.join(timeout=5)
    if not ran_action:
        raise ValueError(
            f"write callback for table {name!r} ran no Spark action; "
            "the observed row total would block forever"
        )
    rows = obs.get["rows"]
    report(f"{name}: {rows:,} rows written ({index}/{total_tables} tables)")
