"""Measure ACTUAL shuffle bytes for queries via the Spark event log.

The r9 int64 relabeling's "~3-4x fewer verify shuffle bytes" started
as a type-width argument (8-byte longs vs ~20-40-byte trigram
strings). This script turns it into a measured fact: one session with
spark.eventLog enabled runs every variant under its own job group;
the JSON event log is then parsed — JobStart events map stages to
job groups, StageCompleted events carry the shuffle byte/record
accumulators — and the per-group sums are printed.

Usage:
    PYTHONPATH=/root/repo python scripts/measure_shuffle_bytes.py \
        [sf_dir (default /tmp/sf1)]

Byte totals are whole-query (all stages), so compare variants of the
SAME logical op — the non-shuffle stages cancel.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"

_METRICS = {
    "internal.metrics.shuffle.write.bytesWritten": "write_bytes",
    "internal.metrics.shuffle.write.recordsWritten": "write_records",
    "internal.metrics.shuffle.read.localBytesRead": "read_bytes",
    "internal.metrics.shuffle.read.remoteBytesRead": "read_bytes",
}


def per_group_totals(log_dir: str) -> dict[str, dict[str, int]]:
    stage_group: dict[int, str] = {}
    totals: dict[str, dict[str, int]] = defaultdict(
        lambda: defaultdict(int)
    )
    files: list[str] = []
    for path in glob.glob(os.path.join(log_dir, "*")):
        files += (
            glob.glob(os.path.join(path, "events_*"))
            if os.path.isdir(path)
            else [path]
        )
    for f in files:
        with open(f, errors="replace") as fh:  # skip any binary junk
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get(
                        "spark.jobGroup.id", "<none>"
                    )
                    for sid in ev.get("Stage IDs", []):
                        stage_group[sid] = grp
                elif ev.get("Event") == "SparkListenerStageCompleted":
                    info = ev["Stage Info"]
                    grp = stage_group.get(info["Stage ID"], "<none>")
                    for acc in info.get("Accumulables", []):
                        key = _METRICS.get(acc.get("Name"))
                        val = acc.get("Value")
                        if key and isinstance(val, int):
                            totals[grp][key] += val
    return totals


def main() -> None:
    from bench_hashed_verify import (
        containment_strings,
        jaccard_prefix_strings,
    )

    from universal_data_to_orc_converter_spark.operators.dedup import (
        op_dedup_containment,
        op_dedup_jaccard_prefix,
    )
    from universal_data_to_orc_converter_spark.session import get_spark

    variants = [
        ("jaccard_strings_r8", jaccard_prefix_strings),
        ("jaccard_hashed_r9", op_dedup_jaccard_prefix),
        ("containment_strings_r8", containment_strings),
        ("containment_hashed_r9", op_dedup_containment),
    ]

    log_dir = tempfile.mkdtemp(prefix="elog_")
    spark = get_spark(
        "shuffle-bytes",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # plain JSON lines — this environment has no zstd module
            # to decompress a compressed log with
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    walls: dict[str, float] = {}
    try:
        for label, fn in variants:
            spark.sparkContext.setJobGroup(label, label)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            walls[label] = time.perf_counter() - t0
            spark.sparkContext.setJobGroup("<idle>", "")
    finally:
        spark.stop()  # flushes the event log
    totals = per_group_totals(log_dir)
    shutil.rmtree(log_dir, ignore_errors=True)
    for label, _ in variants:
        t = totals.get(label, {})
        print(
            f"{label:26s} wall={walls[label]:7.1f}s "
            f"shuffle_write={t.get('write_bytes', 0)/1e6:10.1f} MB "
            f"({t.get('write_records', 0)/1e6:8.1f} M records) "
            f"shuffle_read={t.get('read_bytes', 0)/1e6:10.1f} MB",
            flush=True,
        )


if __name__ == "__main__":
    main()
