"""Commit-protocol hygiene for the Python DataSource writer: the
round-trip hash check lives in test_oracle.py like every oracle query;
these tests pin the two-phase commit artifacts."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.catalog import load
from universal_data_to_orc_converter_spark.sources.eventdump_writer import (
    EventDumpSink,
)

from .conftest import SF_DIR


def test_commit_publishes_parts_and_manifest(spark):
    spark.dataSource.register(EventDumpSink)
    out = tempfile.mkdtemp(prefix="eventdump_t_")
    e = load(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    n = e.count()
    (
        e.repartition(4)
        .write.format("eventdump")
        .option("path", out)
        .mode("append")
        .save()
    )
    parts = sorted(glob.glob(os.path.join(out, "part-*.dump")))
    assert len(parts) == 4, "one published part per task expected"
    # driver commit is the ONLY publisher: no temp residue survives
    assert not os.path.isdir(os.path.join(out, "_tmp"))
    # the manifest's total (line 1) equals the source row count, and
    # its per-part ledger names exactly the published parts
    with open(os.path.join(out, "_SUCCESS")) as f:
        lines = f.read().splitlines()
    assert int(lines[0]) == n
    ledger = dict(ln.split("\t") for ln in lines[1:])
    assert sorted(ledger) == [os.path.basename(p) for p in parts]
    assert sum(int(v) for v in ledger.values()) == n
    # and the physical lines add up to the manifest
    lines = sum(1 for p in parts for _ in open(p))
    assert lines == n


def test_readback_row_identity(spark):
    """Not just aggregates: every (event_id) written must read back
    exactly once — the writer neither drops nor duplicates rows."""
    spark.dataSource.register(EventDumpSink)
    out = tempfile.mkdtemp(prefix="eventdump_t2_")
    e = load(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    (
        e.repartition(4)
        .write.format("eventdump")
        .option("path", out)
        .mode("append")
        .save()
    )
    back = (
        spark.read.schema("event_id bigint, event_type string, value double")
        .option("sep", ";")
        .option("quote", '"')
        .option("escape", '"')
        .csv(os.path.join(out, "part-*.dump"))
    )
    diff = (
        back.select("event_id")
        .exceptAll(e.select("event_id"))
        .unionAll(e.select("event_id").exceptAll(back.select("event_id")))
    )
    assert diff.count() == 0
    assert back.count() == e.count()


def test_stream_commit_is_idempotent_per_epoch(tmp_path):
    """A replayed epoch (checkpoint recovery re-delivers the batch
    whose commit never landed) must be a no-op: same parts, same
    _COMMITS log, no duplicates."""
    import os

    from universal_data_to_orc_converter_spark.sources.eventdump_writer import (
        _EventDumpStreamWriter,
        _PartCommit,
    )

    out = str(tmp_path / "out")
    os.makedirs(os.path.join(out, "_tmp"))
    w = _EventDumpStreamWriter({"path": out})

    def stage(name, lines):
        with open(os.path.join(out, "_tmp", name), "w") as f:
            f.write("".join(lines))
        return _PartCommit(tmp_name=name, rows=len(lines))

    msgs = [stage("a.part", ["1;x;0.5\n"]), stage("b.part", ["2;y;1.5\n"])]
    w.commit(msgs, batchId=7)
    parts = sorted(os.listdir(out))
    assert "part-00007-00000.dump" in parts
    assert "part-00007-00001.dump" in parts

    # replay of epoch 7: fresh temp files, same batchId
    os.makedirs(os.path.join(out, "_tmp"), exist_ok=True)
    msgs2 = [stage("c.part", ["1;x;0.5\n"]), stage("d.part", ["2;y;1.5\n"])]
    w.commit(msgs2, batchId=7)
    assert sorted(os.listdir(out)) == parts, "replayed epoch re-published"
    with open(os.path.join(out, "_COMMITS")) as f:
        assert f.read().count("7,") == 1

    # the NEXT epoch still commits normally
    os.makedirs(os.path.join(out, "_tmp"), exist_ok=True)
    w.commit([stage("e.part", ["3;z;2.5\n"])], batchId=8)
    assert "part-00008-00000.dump" in os.listdir(out)


def test_append_jobs_do_not_clobber_and_overwrite_clears(spark):
    """Two append saves to the same path must publish DISJOINT part
    names (per-job id) and a running-total manifest; an overwrite save
    must clear prior parts and reset the manifest (r5 advice — the
    old fixed part-00000... names made the second append silently
    os.replace the first's parts)."""
    spark.dataSource.register(EventDumpSink)
    out = tempfile.mkdtemp(prefix="eventdump_t3_")
    e = load(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    n = e.count()

    for _ in range(2):
        (
            e.repartition(2)
            .write.format("eventdump")
            .option("path", out)
            .mode("append")
            .save()
        )
    parts = sorted(glob.glob(os.path.join(out, "part-*.dump")))
    assert len(parts) == 4, "second append clobbered the first's parts"
    lines = sum(1 for p in parts for _ in open(p))
    assert lines == 2 * n
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.readline().strip()) == 2 * n

    (
        e.repartition(3)
        .write.format("eventdump")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    parts = sorted(glob.glob(os.path.join(out, "part-*.dump")))
    assert len(parts) == 3, "overwrite must clear previous parts"
    assert sum(1 for p in parts for _ in open(p)) == n
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.readline().strip()) == n


def test_append_recovers_true_total_after_crashed_manifest(spark):
    """The r6-advice drift case: a prior job crashed after renaming its
    parts but before writing _SUCCESS (simulated by deleting the
    manifest). The next append must recompute the destination total
    from the parts actually on disk — not silently under-count."""
    spark.dataSource.register(EventDumpSink)
    out = tempfile.mkdtemp(prefix="eventdump_t4_")
    e = load(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    n = e.count()

    (
        e.repartition(2)
        .write.format("eventdump")
        .option("path", out)
        .mode("append")
        .save()
    )
    # crash artifact: parts published, manifest lost
    os.remove(os.path.join(out, "_SUCCESS"))

    (
        e.repartition(2)
        .write.format("eventdump")
        .option("path", out)
        .mode("append")
        .save()
    )
    parts = sorted(glob.glob(os.path.join(out, "part-*.dump")))
    assert len(parts) == 4
    with open(os.path.join(out, "_SUCCESS")) as f:
        lines = f.read().splitlines()
    assert int(lines[0]) == 2 * n, (
        "manifest total must match the destination's actual contents "
        "even when the prior job's manifest commit was lost"
    )
    # and a deleted part's dangling ledger entry is dropped too
    os.remove(parts[0])
    (
        e.repartition(1)
        .write.format("eventdump")
        .option("path", out)
        .mode("append")
        .save()
    )
    live = sorted(glob.glob(os.path.join(out, "part-*.dump")))
    actual = sum(1 for p in live for _ in open(p))
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.readline().strip()) == actual


def test_delimiter_and_newline_values_roundtrip(spark):
    """Adversarial serialization: values containing the delimiter,
    quotes, and newlines must survive the dump round-trip byte-exact
    (review finding — unquoted ';' used to shift every subsequent
    column silently)."""
    spark.dataSource.register(EventDumpSink)
    out = tempfile.mkdtemp(prefix="eventdump_adv_")
    rows = [
        (1, "plain", 1.0),
        (2, "semi;colon", 2.0),
        (3, 'has"quote', 3.0),
        (4, "new\nline", 4.0),
        (5, "both;\"and\nmore", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    )
    df.coalesce(1).write.format("eventdump").option("path", out).mode(
        "append"
    ).save()
    back = (
        spark.read.schema("event_id bigint, event_type string, value double")
        .option("sep", ";")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(os.path.join(out, "part-*.dump"))
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_crash_orphan_recount_is_quote_aware(spark):
    """r7 advice: crash-orphan recovery used to recount a part's rows
    as PHYSICAL LINES — a quoted value with an embedded newline spans
    two lines but is one record, so the rebuilt manifest total drifted
    in exactly the crash path the ledger rebuild exists for."""
    spark.dataSource.register(EventDumpSink)
    out = tempfile.mkdtemp(prefix="eventdump_orph_")
    rows = [
        (1, "plain", 1.0),
        (2, "new\nline", 2.0),
        (3, "two\nbreaks\nhere", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    )
    df.coalesce(1).write.format("eventdump").option("path", out).mode(
        "append"
    ).save()
    # crash artifact: the 3-record part (spanning 6 physical lines)
    # becomes an orphan
    os.remove(os.path.join(out, "_SUCCESS"))

    more = spark.createDataFrame(
        [(4, "after", 4.0)], "event_id bigint, event_type string, value double"
    )
    more.coalesce(1).write.format("eventdump").option("path", out).mode(
        "append"
    ).save()
    with open(os.path.join(out, "_SUCCESS")) as f:
        total = int(f.readline().strip())
    assert total == 4, (
        f"manifest total {total} != 4 records — orphan recount must "
        f"parse records, not count physical lines"
    )
