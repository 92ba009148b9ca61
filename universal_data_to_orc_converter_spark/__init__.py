"""universal_data_to_orc_converter_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
Tescan-group/Universal-Data-to-ORC-Converter (reference: an ETL wizard
converting MySQL / SQL dumps / CSV to Apache ORC;
``data_to_orc_converter.sh``), extended with the analytical query surface
that the reference exists to enable (filters, joins, aggregations,
windows — README.md:194-233 of the reference demonstrates Spark / PyArrow
/ Presto queries over its ORC output) plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns, streaming).

Architecture: everything is the PySpark DataFrame / SQL API so Catalyst
and Tungsten own optimization and physical execution. There are no RDDs
and no driver-side data loops; Python UDFs appear only where built-in
operators genuinely cannot express the semantics (and then always
Arrow-batched pandas UDFs).

Layout:
    session.py    SparkSession factory (AQE on, UTC, Arrow on)
    catalog.py    fixture-table loading / temp-view registration
    registry.py   query registry — the driver-facing correctness contract
    operators/    relational + LLM-pipeline operators (joins, aggs, dedup, ...)
    functions/    scalar-function query surface (string/date/json/array/...)
    sources/      ingestion: CSV, SQL dump, JDBC, ORC, Parquet
    sinks/        ORC writer (codec + chunking parity with the reference)
    plans/        plan-inspection helpers (pushdown / broadcast assertions)
    streaming/    Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"
