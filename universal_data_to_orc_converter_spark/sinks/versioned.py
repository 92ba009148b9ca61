"""Versioned table snapshots with TIME-TRAVEL reads — the marquee
table-format feature (Delta/Iceberg `VERSION AS OF`) rebuilt from
filesystem primitives, completing the engine's
lakehouse-without-a-table-format tier (compaction, Z-order, CDC
merge, SCD2, snapshot diff, incremental maintenance all exist; this
adds the versioned read path).

Layout: ``<table>/v=<n>/`` parquet snapshot directories. A commit
writes the full snapshot to ``<table>/.tmp-<uuid>`` and publishes it
with ONE ``os.rename`` to ``v=<n>`` — readers can never observe a
half-written version because the only mutation visible to them is the
atomic directory rename (the same publish discipline as the Python
DataSource writer's task-temp protocol, one level up). A crashed
commit leaves only an orphaned ``.tmp-*`` dir, which readers ignore
and ``vacuum_versions`` sweeps once it is older than a grace period —
commits themselves never touch other writers' tmp dirs, so a sweep
can never delete a concurrent commit's in-progress staging directory
out from under it. Concurrent writers race on the rename:
the loser's target already exists, so it retries with the next
version number — last-writer-wins per version slot, never a torn mix
of two snapshots.

Scale notes: snapshots here are FULL rewrites (correct for dimension
/ rollup tables — the versioned-artifact case); for fact-scale data
the incremental ops (op_incremental_file_ingest, CDC merge) maintain
state and THIS layer versions the small serving rollup derived from
it. Reading version n costs exactly one snapshot scan; nothing is
ever read across versions.
"""

from __future__ import annotations

import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_V_RE = re.compile(r"^v=(\d+)$")


def list_versions(table_dir: str) -> list[int]:
    """Committed versions, ascending. A version counts only once its
    directory (the atomic-rename target) exists."""
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _V_RE.match(name)
        if m and os.path.isdir(os.path.join(table_dir, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def commit_version(df: DataFrame, table_dir: str) -> int:
    """Publish ``df`` as the next snapshot version; returns the
    version number. Crash-safe (tmp-dir + atomic rename) and
    race-safe (rename loser retries the next slot). Deliberately does
    NOT sweep ``.tmp-*`` orphans: a sweep here could rmtree a
    CONCURRENT commit's staging dir mid-write (failing that job, or
    worse letting it publish a partially-deleted directory). Orphans
    from crashed commits are reclaimed by ``vacuum_versions`` after a
    grace period instead."""
    os.makedirs(table_dir, exist_ok=True)
    tmp = os.path.join(table_dir, f".tmp-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(tmp)
    while True:
        versions = list_versions(table_dir)
        n = (versions[-1] + 1) if versions else 1
        target = os.path.join(table_dir, f"v={n}")
        try:
            os.rename(tmp, target)
            return n
        except OSError:
            if not os.path.isdir(target):
                raise  # not a lost race — surface it
            # lost the race for slot n: retry with the next number


#: Orphaned ``.tmp-*`` staging dirs younger than this are presumed to
#: belong to an in-flight commit and are left alone by the vacuum.
#: Generous on purpose: deleting a live writer's staging dir breaks
#: the torn-snapshot guarantee, while keeping a crashed commit's
#: orphan an extra day costs only disk.
TMP_GRACE_SECONDS = 24 * 3600


def vacuum_versions(
    table_dir: str,
    keep: int = 2,
    tmp_grace_seconds: float = TMP_GRACE_SECONDS,
) -> list[int]:
    """Retention: drop all but the newest ``keep`` versions; returns
    the versions removed. The newest version is never removable
    (keep >= 1 enforced), and removal is per-directory — a reader
    holding an older version's DataFrame keeps working until its
    files go, exactly the table-format VACUUM contract (readers of
    vacuumed history fail loudly on next access, current readers are
    untouched).

    Also reclaims ``.tmp-*`` staging dirs orphaned by crashed commits,
    but ONLY those whose mtime is older than ``tmp_grace_seconds`` —
    a younger tmp dir may be a concurrent writer's in-progress commit,
    and sweeping it would re-open the torn-snapshot window this layer
    exists to close."""
    import time

    keep = max(1, keep)
    removed = []
    for n in list_versions(table_dir)[:-keep]:
        shutil.rmtree(os.path.join(table_dir, f"v={n}"))
        removed.append(n)
    if os.path.isdir(table_dir):
        cutoff = time.time() - tmp_grace_seconds
        for name in os.listdir(table_dir):
            if not name.startswith(".tmp-"):
                continue
            path = os.path.join(table_dir, name)
            try:
                if os.path.getmtime(path) < cutoff:
                    shutil.rmtree(path, ignore_errors=True)
            except OSError:
                pass  # raced with its own writer's rename — fine
    return removed


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: ``version=None`` reads the latest snapshot."""
    versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no committed versions in {table_dir}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"version {version} not in {versions} at {table_dir}"
        )
    return spark.read.parquet(os.path.join(table_dir, f"v={version}"))
