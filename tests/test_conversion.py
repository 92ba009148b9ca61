"""Round-trip tests for the conversion surface (SURVEY.md §5.2-3):
CSV matrix, SQL-dump adversarial parsing, ORC codec matrix, chunking.
These mirror the reference's wizard options (delimiter/header at
data_to_orc_converter.sh:151-158, codec at sh:168-169, chunk size at
sh:192) and the exact string-literal cases its regex parser corrupts
(sh:357-363)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from universal_data_to_orc_converter_spark.converter import (
    convert_csv,
    convert_sql_dump,
)
from universal_data_to_orc_converter_spark.sinks.orc import read_orc, write_orc
from universal_data_to_orc_converter_spark.sources.csv import read_csv
from universal_data_to_orc_converter_spark.sources.sqldump import (
    mysql_type_to_spark,
    parse_create_table,
    parse_dump,
    parse_insert,
    split_statements,
)

from .conftest import SF_SMOKE


def rows_set(df):
    return {tuple(r) for r in df.collect()}


# ---------------------------------------------------------------------------
# CSV matrix (comma+header, pipe+header, headerless, nulls)
# ---------------------------------------------------------------------------

CSV_DATA = [
    ("alice", 30, 1000.5),
    ("bob", 25, 2000.25),
    ("carol", None, 3000.75),
]


def _write_csv(path, delim=",", header=True):
    lines = []
    if header:
        lines.append(delim.join(["name", "age", "balance"]))
    for n, a, b in CSV_DATA:
        lines.append(delim.join([n, "" if a is None else str(a), str(b)]))
    with open(path, "w") as f:
        f.write("\n".join(lines))


def test_csv_comma_header(spark, tmp_path):
    p = tmp_path / "t.csv"
    _write_csv(p)
    df = read_csv(spark, str(p))
    assert df.columns == ["name", "age", "balance"]
    assert df.count() == 3
    assert dict(df.dtypes)["age"] == "int"
    assert df.filter(F.col("age").isNull()).count() == 1


def test_csv_pipe_delimiter(spark, tmp_path):
    p = tmp_path / "t.csv"
    _write_csv(p, delim="|")
    df = read_csv(spark, str(p), delimiter="|")
    assert rows_set(df.select("name")) == {("alice",), ("bob",), ("carol",)}


def test_csv_headerless_default_names(spark, tmp_path):
    p = tmp_path / "t.csv"
    _write_csv(p, header=False)
    df = read_csv(spark, str(p), header=False)
    assert df.columns == ["_c0", "_c1", "_c2"]
    assert df.count() == 3


def test_csv_no_inference_all_strings(spark, tmp_path):
    p = tmp_path / "t.csv"
    _write_csv(p)
    df = read_csv(spark, str(p), infer_schema=False)
    assert all(t == "string" for _, t in df.dtypes)


def test_csv_dir_to_orc_roundtrip(spark, tmp_path):
    src = tmp_path / "csvs"
    out = tmp_path / "orc"
    src.mkdir()
    _write_csv(src / "users.csv")
    _write_csv(src / "accounts.csv", delim=",")
    written = convert_csv(spark, str(src), str(out))
    assert set(written) == {"users", "accounts"}
    back = read_orc(spark, written["users"])
    assert rows_set(back) == rows_set(read_csv(spark, str(src / "users.csv")))


# ---------------------------------------------------------------------------
# SQL dump: typed parsing + the adversarial literals the reference breaks on
# ---------------------------------------------------------------------------

DUMP = r"""
-- a comment; with a semicolon
/* block comment; also with ; */
CREATE TABLE users (
  id INT NOT NULL,
  name VARCHAR(100),
  bio TEXT,
  balance DECIMAL(10,2),
  joined DATE,
  last_seen DATETIME,
  PRIMARY KEY (id)
);
INSERT INTO users VALUES
  (1, 'Alice', 'likes (parens), commas, and; semicolons', 10.50, '2024-01-02', '2024-01-02 03:04:05'),
  (2, 'Bob ''the builder''', 'quote \' inside', 20.25, '2024-02-03', '2024-02-03 04:05:06'),
  (3, NULL, 'it''s fine', NULL, NULL, NULL);
CREATE TABLE tags (tag_id BIGINT, label VARCHAR(20));
INSERT INTO tags (label, tag_id) VALUES ('red', 10), ('blue, not green', 20);
"""


def test_split_statements_ignores_quoted_semicolons():
    stmts = list(split_statements(iter([DUMP])))
    assert len(stmts) == 4
    assert stmts[0].upper().startswith("CREATE TABLE USERS")
    assert "semicolons" in stmts[1]


def test_parse_create_table_types():
    td = parse_create_table(list(split_statements(iter([DUMP])))[0])
    assert td.name == "users"
    cols = dict(td.columns)
    assert isinstance(cols["id"], T.LongType)
    assert isinstance(cols["balance"], T.DecimalType)
    assert cols["balance"].precision == 10 and cols["balance"].scale == 2
    assert isinstance(cols["joined"], T.DateType)
    assert isinstance(cols["last_seen"], T.TimestampType)
    assert "PRIMARY" not in cols  # constraints skipped


def test_parse_insert_adversarial_literals():
    stmts = list(split_statements(iter([DUMP])))
    table, cols, rows = parse_insert(stmts[1])
    assert table == "users" and cols is None
    assert len(rows) == 3
    assert rows[0][2] == "likes (parens), commas, and; semicolons"
    assert rows[1][1] == "Bob 'the builder'"
    assert rows[2][1] is None


def test_parse_dump_typed_dataframes(spark, tmp_path):
    p = tmp_path / "d.sql"
    p.write_text(DUMP)
    dfs = parse_dump(spark, str(p))
    users = dfs["users"]
    assert [f.name for f in users.schema.fields] == [
        "id", "name", "bio", "balance", "joined", "last_seen",
    ]
    got = {r["id"]: r for r in users.collect()}
    assert got[1]["bio"] == "likes (parens), commas, and; semicolons"
    assert float(got[1]["balance"]) == 10.50
    assert got[3]["name"] is None and got[3]["balance"] is None
    assert got[1]["joined"].year == 2024
    # explicit column-list reordering honored
    tags = {r["tag_id"]: r["label"] for r in dfs["tags"].collect()}
    assert tags == {10: "red", 20: "blue, not green"}


def test_dump_to_orc_end_to_end(spark, tmp_path):
    p = tmp_path / "d.sql"
    p.write_text(DUMP)
    out = tmp_path / "orc"
    written = convert_sql_dump(spark, str(p), str(out))
    assert set(written) == {"users", "tags"}
    users = read_orc(spark, written["users"])
    assert users.count() == 3
    assert isinstance(users.schema["balance"].dataType, T.DecimalType)


def test_mysql_type_mapping():
    assert isinstance(mysql_type_to_spark("INT"), T.LongType)
    assert isinstance(mysql_type_to_spark("varchar(255)"), T.StringType)
    assert isinstance(mysql_type_to_spark("DECIMAL(18,4)"), T.DecimalType)
    assert isinstance(mysql_type_to_spark("datetime"), T.TimestampType)
    assert isinstance(mysql_type_to_spark("LONGBLOB"), T.BinaryType)
    assert isinstance(mysql_type_to_spark("double"), T.DoubleType)


# ---------------------------------------------------------------------------
# ORC sink: codec matrix + chunking (sh:168-169, sh:192)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("codec", ["snappy", "zlib", "none", "lzo", "lz4", "zstd"])
def test_orc_codec_roundtrip(spark, tmp_path, codec):
    src = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    out = str(tmp_path / f"orc_{codec}")
    write_orc(src, out, compression=codec)
    back = read_orc(spark, out)
    assert rows_set(back) == rows_set(src)
    assert back.schema == src.schema


def test_orc_bad_codec_rejected(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    with pytest.raises(ValueError, match="unsupported codec"):
        write_orc(src, str(tmp_path / "x"), compression="lzma")


def test_orc_compression_shrinks(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    sizes = {}
    for codec in ("none", "zlib"):
        out = str(tmp_path / f"c_{codec}")
        write_orc(src, out, compression=codec)
        sizes[codec] = sum(
            os.path.getsize(f) for f in glob.glob(f"{out}/*.orc")
        )
    assert sizes["zlib"] < sizes["none"]


def test_orc_max_records_per_file_chunking(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").coalesce(1)
    out = str(tmp_path / "chunked")
    write_orc(src, out, max_records_per_file=1000)
    files = glob.glob(f"{out}/*.orc")
    n = src.count()
    assert len(files) >= n // 1000  # ~one file per 1000-row chunk
    back = read_orc(spark, out)
    assert back.count() == n


def test_orc_partitioned_write(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    out = str(tmp_path / "parted")
    write_orc(src, out, partition_by=["c_mktsegment"])
    segs = {
        os.path.basename(d)
        for d in glob.glob(f"{out}/c_mktsegment=*")
    }
    assert len(segs) == 5
    # partition pruning: reading one segment touches only its dir
    one = read_orc(spark, out).filter(F.col("c_mktsegment") == "BUILDING")
    assert one.count() == src.filter(F.col("c_mktsegment") == "BUILDING").count()


def test_orc_schema_evolution_merge(spark, tmp_path):
    """The reference README promises schema evolution via ORC
    (reference README.md:26-29); Spark delivers it through mergeSchema:
    old part files simply lack the new column and read back as null."""
    out = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v1.write.orc(out)
    v2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    )
    v2.write.mode("append").orc(out)
    merged = spark.read.option("mergeSchema", "true").orc(out)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None
    assert rows[2]["score"] == 9.5


def test_csv_malformed_row_policies(spark, tmp_path):
    """The reference's 'auto-retry and error handling' claim, made
    concrete for bad rows: PERMISSIVE null-fills, DROPMALFORMED drops,
    FAILFAST raises."""
    p = tmp_path / "bad.csv"
    p.write_text("id,qty\n1,10\nnot_an_int,20\n3,30\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("qty", T.LongType(), True),
        ]
    )
    permissive = read_csv(spark, str(p), schema=schema, mode="PERMISSIVE")
    rows = {r["id"]: r["qty"] for r in permissive.collect()}
    assert rows == {1: 10, None: 20, 3: 30}

    dropped = read_csv(spark, str(p), schema=schema, mode="DROPMALFORMED")
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]

    failfast = read_csv(spark, str(p), schema=schema, mode="FAILFAST")
    with pytest.raises(Exception, match="Malformed|FAILFAST"):
        failfast.collect()


class TestOrcBloomFilters:
    def test_bloom_option_embeds_filters_and_preserves_data(
        self, spark, tmp_path
    ):
        """Bloom filters must actually land in the files (visible as a
        deterministic size increase — ~5% at fpp 0.05 on this table)
        and must not change query results: a point lookup on the
        bloom column returns identical rows from both copies."""
        import glob
        import os

        from pyspark.sql import functions as F

        from universal_data_to_orc_converter_spark.catalog import load
        from universal_data_to_orc_converter_spark.sinks.orc import (
            read_orc,
            write_orc,
        )

        from .conftest import SF_DIR

        li = load(spark, SF_DIR, "lineitem").coalesce(1)
        plain = str(tmp_path / "plain")
        bloom = str(tmp_path / "bloom")
        write_orc(li, plain, max_records_per_file=None)
        write_orc(
            li,
            bloom,
            max_records_per_file=None,
            bloom_filter_cols=["l_orderkey", "l_partkey"],
        )
        size = lambda p: sum(  # noqa: E731
            os.path.getsize(f) for f in glob.glob(p + "/*.orc")
        )
        assert size(bloom) > size(plain) * 1.01, (
            "bloom option produced no footprint — filters not written"
        )

        key = li.select("l_orderkey").first()[0]
        a = read_orc(spark, plain).filter(F.col("l_orderkey") == key)
        b = read_orc(spark, bloom).filter(F.col("l_orderkey") == key)
        assert rows_set(a) == rows_set(b)
        assert b.count() > 0


def test_fixed_width_layout_roundtrips_adversarial_values(spark, tmp_path):
    """The fixed-width layout must survive the values the fixture
    never exercises: NEGATIVE amounts (a zero-padded '-' inside the
    field casts back to NULL — hence the explicit sign byte), zero,
    half-cent rounding, and max-width magnitudes."""
    from pyspark.sql import functions as F

    from universal_data_to_orc_converter_spark.operators.io import (
        fixed_width_roundtrip,
    )

    rows = [
        (1, 10, "O", -1234.56, "1994-01-02"),
        (2, 20, "F", 0.0, "1995-12-31"),
        (3, 30, "P", 0.005, "1996-06-15"),       # rounds to 1 cent
        (4, 40, "O", -0.005, "1997-07-04"),      # floor(-0.5+0.5)=0
        (5, 50, "F", 999999999999.99, "1998-08-02"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    back = fixed_width_roundtrip(spark, df, str(tmp_path / "fw"))
    got = {
        r["o_orderkey"]: (
            r["o_custkey"],
            r["o_orderstatus"],
            r["total_cents"],
            str(r["o_orderdate"]),
        )
        for r in back.collect()
    }
    assert got[1] == (10, "O", -123456, "1994-01-02")
    assert got[2] == (20, "F", 0, "1995-12-31")
    assert got[3] == (30, "P", 1, "1996-06-15")
    assert got[4] == (40, "O", 0, "1997-07-04")
    assert got[5] == (50, "F", 99999999999999, "1998-08-02")
    assert back.filter(F.col("total_cents").isNull()).count() == 0
