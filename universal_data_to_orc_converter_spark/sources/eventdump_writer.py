"""Python batch DataSource WRITER (Spark 4 DataSource API) — the
third leg of the Python data-source surface: sqldump_datasource.py
covers distributed batch READ, replay_stream.py covers streaming read;
this module covers batch WRITE with a real two-phase commit.

``eventdump`` writes a DataFrame as line-oriented text dumps using the
task-temp + driver-commit protocol every distributed writer needs:

* each TASK (executor-side ``write``) serializes its partition to
  ``<path>/_tmp/<uuid>.part`` and returns a ``WriterCommitMessage``
  carrying the temp name and its row count — no task publishes
  directly to the final location;
* the DRIVER's ``commit`` renames every acknowledged part into place
  (``part-<i>.dump``) and writes a ``_SUCCESS`` manifest with the
  total row count — an atomic publish: a failed or speculative task
  attempt's file is simply never renamed;
* ``abort`` removes the temp dir, leaving the destination untouched.

This is the same job-commit design as Spark's own
HadoopMapReduceCommitProtocol (v1: task temp → driver rename),
re-expressed through the Python API. At 100 TB the rename-per-part
driver loop is the known v1 trade-off (object stores prefer v2 /
manifest commits); the protocol seam — WriterCommitMessage — is
deliberately where that swap happens, and the manifest written here
is exactly the v2-style artifact.

Reference parity: the reference emits one dump file per table from a
single process (data_to_orc_converter.sh conversion loop); this writer
is the distributed, crash-safe version of that emission.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PartCommit(WriterCommitMessage):
    tmp_name: str = ""
    rows: int = 0


class _EventDumpWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> _PartCommit:
        # runs on the EXECUTOR: serialize this partition to a task-temp
        # file; nothing becomes visible until the driver commits
        import uuid

        tmp_dir = os.path.join(self.path, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        name = f"{uuid.uuid4().hex}.part"
        n = 0
        with open(os.path.join(tmp_dir, name), "w") as f:
            for row in iterator:
                vals = ";".join("" if v is None else str(v) for v in row)
                f.write(vals + "\n")
                n += 1
        return _PartCommit(tmp_name=name, rows=n)

    def commit(self, messages) -> None:
        # runs on the DRIVER: atomic publish of acknowledged parts only
        import shutil

        tmp_dir = os.path.join(self.path, "_tmp")
        total = 0
        for i, m in enumerate(messages):
            os.replace(
                os.path.join(tmp_dir, m.tmp_name),
                os.path.join(self.path, f"part-{i:05d}.dump"),
            )
            total += m.rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            f.write(str(total) + "\n")
        shutil.rmtree(tmp_dir, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, "_tmp"), ignore_errors=True)


class EventDumpSink(DataSource):
    """df.write.format("eventdump").option("path", ...).save()"""

    @classmethod
    def name(cls) -> str:
        return "eventdump"

    def writer(self, schema, overwrite: bool):  # noqa: ARG002
        return _EventDumpWriter(self.options)


from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ..exprs import dsum, sql_dsum  # noqa: E402
from ..registry import query  # noqa: E402


@query(
    "op_python_datasource_writer",
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS n_events,
               {sql_dsum("value", "sum_value")}
        FROM events
        GROUP BY event_type
    """,
    notes="Batch WRITE through a user-defined PYTHON data source with "
    "a real two-phase commit (module docstring): every partition "
    "serializes executor-side to a task-temp file, the driver commit "
    "atomically renames acknowledged parts and writes a _SUCCESS "
    "manifest, abort leaves the destination untouched — the "
    "HadoopMapReduceCommitProtocol design through the Spark 4 Python "
    "writer API (completing the surface: sqldump_datasource = batch "
    "read, events_replay = streaming read). The query writes events "
    "through the sink, reads the dumps back (schema-applied CSV "
    "read over part-*.dump), and the aggregate must hash-match the "
    "original table's oracle — no row lost or duplicated by the "
    "distributed write. The manifest count and part/temp hygiene are "
    "separately asserted in tests/test_eventdump_writer.py.",
    tags=("io", "scale"),
)
def op_python_datasource_writer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """events -> Python-DataSource dump write -> read back ->
    aggregate (must equal the source table)."""
    import tempfile

    from ..catalog import load

    spark.dataSource.register(EventDumpSink)
    out = tempfile.mkdtemp(prefix="eventdump_")
    e = load(spark, sf_dir, "events").select(
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
        .csv(os.path.join(out, "part-*.dump"))
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"), dsum(F.col("value"), "sum_value")
    )
