"""Versioned-snapshot store (sinks/versioned.py): commit/read
round-trip, monotone version numbering, crash-orphan hygiene, and the
rename-race retry — the semantics op_time_travel_read's notes claim."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.sinks.versioned import (
    commit_version,
    list_versions,
    read_version,
)


def _df(spark, tag):
    return spark.range(5).select(
        "id", F.lit(tag).alias("tag")
    )


def test_commit_read_roundtrip_and_latest(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert commit_version(_df(spark, "a"), t) == 1
    assert commit_version(_df(spark, "b"), t) == 2
    assert list_versions(t) == [1, 2]
    assert read_version(spark, t, 1).select("tag").distinct().collect()[
        0
    ]["tag"] == "a"
    # latest == explicit v2
    latest = sorted(map(tuple, read_version(spark, t).collect()))
    v2 = sorted(map(tuple, read_version(spark, t, 2).collect()))
    assert latest == v2


def test_crashed_commit_leaves_no_visible_version(spark, tmp_path):
    """A commit that died between the snapshot write and the rename
    leaves only a .tmp orphan: readers ignore it, the version list is
    unchanged, later commits publish normally AND leave the orphan
    alone (it could be a concurrent writer's live staging dir — only
    the grace-period vacuum may reclaim it)."""
    from universal_data_to_orc_converter_spark.sinks.versioned import (
        vacuum_versions,
    )

    t = str(tmp_path / "tbl")
    commit_version(_df(spark, "a"), t)
    # simulate the crash artifact
    orphan = os.path.join(t, ".tmp-deadbeef")
    _df(spark, "torn").write.parquet(orphan)
    assert list_versions(t) == [1]
    latest = read_version(spark, t)
    assert latest.filter(F.col("tag") == "torn").count() == 0
    assert commit_version(_df(spark, "b"), t) == 2
    assert os.path.isdir(orphan), (
        "a commit must NOT sweep .tmp dirs — a concurrent writer may "
        "still be staging into one"
    )
    # within the grace period the vacuum leaves it alone too...
    vacuum_versions(t, keep=2)
    assert os.path.isdir(orphan)
    # ...and reclaims it once it has aged past the grace period
    vacuum_versions(t, keep=2, tmp_grace_seconds=0.0)
    assert not os.path.isdir(orphan)


def test_concurrent_writer_staging_survives_other_commit(spark, tmp_path):
    """The r6-advice race: writer A is mid-stage (its .tmp dir exists,
    rename not yet issued) while writer B commits. B's commit must not
    delete A's staging dir; A's subsequent publish must land intact."""
    import shutil
    import uuid

    t = str(tmp_path / "tbl")
    commit_version(_df(spark, "base"), t)
    # writer A stages (what commit_version does before its rename)
    a_tmp = os.path.join(t, f".tmp-{uuid.uuid4().hex}")
    _df(spark, "a").write.parquet(a_tmp)
    # writer B runs a full commit concurrently
    assert commit_version(_df(spark, "b"), t) == 2
    assert os.path.isdir(a_tmp), "B's commit deleted A's staging dir"
    # A now publishes: retries past the occupied slots, lands on v=3
    n = 3
    os.rename(a_tmp, os.path.join(t, f"v={n}"))
    got = read_version(spark, t, n)
    assert got.count() == 5
    assert got.select("tag").distinct().collect()[0]["tag"] == "a"
    shutil.rmtree(t)


def test_rename_race_retries_next_slot(spark, tmp_path):
    """A writer that loses the v=<n> rename race must land on the next
    slot, never overwrite or tear the winner's snapshot. The race
    window is forced: the loser's first version listing is STALE
    (doesn't see the winner's v=2), so its first rename attempt
    targets the occupied slot and must fall through the retry path."""
    from unittest import mock

    from universal_data_to_orc_converter_spark.sinks import versioned

    t = str(tmp_path / "tbl")
    commit_version(_df(spark, "a"), t)
    # the winner publishes v=2; the loser's first listing won't see it
    _df(spark, "winner").write.parquet(os.path.join(t, "v=2"))
    real = versioned.list_versions
    with mock.patch.object(
        versioned,
        "list_versions",
        side_effect=[[1], real(t)],
    ):
        n = versioned.commit_version(_df(spark, "loser"), t)
    assert n == 3
    assert read_version(spark, t, 2).select("tag").distinct().collect()[
        0
    ]["tag"] == "winner"
    assert read_version(spark, t, 3).select("tag").distinct().collect()[
        0
    ]["tag"] == "loser"


def test_vacuum_retains_newest_and_never_empties(spark, tmp_path):
    """vacuum_versions drops all but the newest `keep` snapshots,
    reports what it removed, refuses to remove the newest (keep is
    clamped to >= 1), and vacuumed history fails loudly on access
    while the retained versions read normally."""
    import pytest

    from universal_data_to_orc_converter_spark.sinks.versioned import (
        vacuum_versions,
    )

    t = str(tmp_path / "tbl")
    for tag in ("a", "b", "c", "d"):
        commit_version(_df(spark, tag), t)
    assert vacuum_versions(t, keep=2) == [1, 2]
    assert list_versions(t) == [3, 4]
    assert read_version(spark, t).select("tag").distinct().collect()[
        0
    ]["tag"] == "d"
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, 1)
    # keep=0 clamps to 1: the newest snapshot always survives
    assert vacuum_versions(t, keep=0) == [3]
    assert list_versions(t) == [4]
