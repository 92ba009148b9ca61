"""JDBC source unit tests (no database in this environment — option
construction + failure paths; the live path shares all downstream code
with the tested CSV/dump/parquet converters)."""

from __future__ import annotations

from universal_data_to_orc_converter_spark.sources.jdbc import JdbcConfig, ping


def test_jdbc_url_and_options():
    cfg = JdbcConfig("db.example.com", 3306, "shop", "reader", "s3cret")
    assert cfg.url == "jdbc:mysql://db.example.com:3306/shop"
    opts = cfg.reader_options(fetchsize=5000)
    assert opts["user"] == "reader"
    assert opts["password"] == "s3cret"
    assert opts["fetchsize"] == "5000"
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"


def test_jdbc_ping_unreachable_is_false(spark):
    cfg = JdbcConfig("127.0.0.1", 1, "nope", "u", "p")
    assert ping(spark, cfg) is False


def test_convert_dump_table_subset(spark, tmp_path):
    """op_table_subset: the comma-list table filter the reference
    wizard offers (sh:111-118, 332-333)."""
    from universal_data_to_orc_converter_spark.converter import convert_sql_dump

    p = tmp_path / "d.sql"
    p.write_text(
        "CREATE TABLE a (x INT); INSERT INTO a VALUES (1);"
        "CREATE TABLE b (y INT); INSERT INTO b VALUES (2);"
    )
    written = convert_sql_dump(spark, str(p), str(tmp_path / "o"), tables=["a"])
    assert set(written) == {"a"}
