"""Sources — the reference's three ingestion paths (MySQL, SQL dump,
CSV; data_to_orc_converter.sh:84-92) plus the columnar read-back
formats (ORC, Parquet)."""
