"""op_incremental_file_ingest content tests: the manifest discovery,
no-op replay (idempotence), and crash-retry overwrite semantics. The
end-to-end hash-vs-oracle check runs in tests/test_oracle.py like every
oracle-backed query; these tests pin the incremental MECHANISM."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.catalog import load
from universal_data_to_orc_converter_spark.operators.maintenance import (
    ingest_new_files,
)

from .conftest import SF_DIR


def _setup_landing(spark, n_files=4):
    work = tempfile.mkdtemp(prefix="ingest_t_")
    landing = os.path.join(work, "landing")
    e = load(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    e.repartitionByRange(n_files, "event_id").write.parquet(landing)
    files = sorted(
        f for f in os.listdir(landing) if f.endswith(".parquet")
    )
    return work, landing, files


def _state_total(spark, state):
    df = spark.read.option("recursiveFileLookup", "true").parquet(state)
    return df.agg(F.sum("n_events")).collect()[0][0]


def test_ingest_is_incremental_and_idempotent(spark):
    work, landing, files = _setup_landing(spark)
    state = os.path.join(work, "state")
    manifest = os.path.join(work, "manifest")

    # wave 1: two files visible, both new
    assert ingest_new_files(spark, landing, files[:2], state, manifest) == 2
    t1 = _state_total(spark, state)
    # replay of wave 1: manifest filters everything — no-op
    assert ingest_new_files(spark, landing, files[:2], state, manifest) == 0
    assert _state_total(spark, state) == t1

    # wave 2: full listing visible, only the 2 unseen files process
    assert ingest_new_files(spark, landing, files, state, manifest) == 2
    total = _state_total(spark, state)
    # replay of wave 2: still a no-op
    assert ingest_new_files(spark, landing, files, state, manifest) == 0
    assert _state_total(spark, state) == total

    # nothing lost or double-counted across waves
    n_rows = (
        load(spark, SF_DIR, "events").count()
    )
    assert total == n_rows


def test_ingest_retry_overwrites_not_duplicates(spark):
    """Crash-retry path: a wave whose state write succeeded but whose
    manifest commit was lost re-runs against the OLD manifest. The
    deterministic per-file (fid=sha256(file)) destinations make the
    rewrite land on top of itself — no duplicate partials."""
    import shutil

    work, landing, files = _setup_landing(spark)
    state = os.path.join(work, "state")
    manifest = os.path.join(work, "manifest")

    ingest_new_files(spark, landing, files[:2], state, manifest)
    t1 = _state_total(spark, state)
    # simulate the lost manifest commit, then retry the same wave
    shutil.rmtree(manifest)
    again = ingest_new_files(spark, landing, files[:2], state, manifest)
    assert again == 2  # the retry re-processes the wave...
    assert _state_total(spark, state) == t1  # ...onto the same partitions


def test_ingest_retry_with_new_arrivals_not_double_counted(spark):
    """The r5-advice scenario a per-WAVE state destination could not
    survive: the manifest commit is lost AND new files land before the
    retry, so the retry wave is a superset of the crashed one. Per-file
    destinations make the old files overwrite themselves while the new
    ones add fresh partitions — nothing is orphaned or double-counted."""
    import shutil

    work, landing, files = _setup_landing(spark)
    state = os.path.join(work, "state")
    manifest = os.path.join(work, "manifest")

    ingest_new_files(spark, landing, files[:2], state, manifest)
    # lost manifest commit + a third file arrives before the retry
    shutil.rmtree(manifest)
    again = ingest_new_files(spark, landing, files[:3], state, manifest)
    assert again == 3
    paths = [os.path.join(landing, f) for f in files[:3]]
    expected = spark.read.parquet(*paths).count()
    assert _state_total(spark, state) == expected


def test_same_basename_in_subdirs_get_distinct_fids(spark):
    """The r6-advice collision: two landing files with the SAME
    basename in different subdirectories must hash to distinct fid
    partitions (fid is over the landing-RELATIVE path, not the
    basename) — otherwise one file's retry dynamic-partition-overwrite
    silently discards the other file's partial state."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="ingest_bn_")
    landing = os.path.join(work, "landing")
    e = load(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    half = e.filter(F.col("event_id") % 2 == 0)
    other = e.filter(F.col("event_id") % 2 == 1)
    # identical basename `part.parquet` under two subdirectories
    for sub, df in (("day=1", half), ("day=2", other)):
        d = os.path.join(landing, sub)
        os.makedirs(d)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(work, "stage")
        )
        src = next(
            f
            for f in os.listdir(os.path.join(work, "stage"))
            if f.endswith(".parquet")
        )
        shutil.copy(
            os.path.join(work, "stage", src),
            os.path.join(d, "part.parquet"),
        )
    files = ["day=1/part.parquet", "day=2/part.parquet"]
    state = os.path.join(work, "state")
    manifest = os.path.join(work, "manifest")

    # ingest file 1, then RETRY-style ingest file 2 alone: if both
    # hashed to one fid, the second write would overwrite the first
    assert ingest_new_files(spark, landing, files[:1], state, manifest) == 1
    assert ingest_new_files(spark, landing, files[1:], state, manifest) == 1
    assert _state_total(spark, state) == e.count()
    fids = [d for d in os.listdir(state) if d.startswith("fid=")]
    assert len(fids) == 2, f"expected 2 fid partitions, got {fids}"
    shutil.rmtree(work)
