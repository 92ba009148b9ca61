"""CSV source — SURVEY.md §2.A (src_csv_scan).

Reference parity: single file or a directory of ``*.csv``
(data_to_orc_converter.sh:449-456), configurable delimiter and header
(sh:468-471; wizard sh:151-155), schema inference. Quirk fixed
(SURVEY.md §1.2): the reference wizard asks "Infer schema?" but never
forwards the answer — inference is always on (sh:157-158 vs
sh:550-551). Here the knob works.

Spark-native: directory globbing, header handling, inference, and
malformed-row policies are reader options; the scan parallelizes per
file split instead of pandas' single-threaded parse (sh:468-471).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = True,
    infer_schema: bool = True,
    schema: StructType | None = None,
    null_value: str = "",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read one CSV file or a directory/glob of them as one table.

    Headerless files get Spark's ``_c0.._cN`` default names (the
    pandas-integer-column analogue of the reference's behavior).
    ``mode`` is the malformed-row policy: PERMISSIVE (null-fill),
    DROPMALFORMED, or FAILFAST.

    Scale note: with ``infer_schema`` and no explicit schema Spark
    scans the data once extra to infer — at 100 TB always pass
    ``schema`` (or sample first) so ingestion is single-pass."""
    reader = (
        spark.read.option("sep", delimiter)
        .option("header", str(header).lower())
        .option("nullValue", null_value)
        .option("mode", mode)
    )
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
