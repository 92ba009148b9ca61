"""UDF surface — SURVEY.md §2.K (op_udf_scalar / op_udaf / op_udtf).

The reference's only "custom logic" is row-wise cell cleanup inside
its generated converters (data_to_orc_converter.sh:360-363) — here the
escape hatch is formalized as the full Spark Python-execution
surface, all Arrow-batched:

* scalar ``pandas_udf`` — vectorized column → column
* grouped-agg ``pandas_udf`` — column(s) → scalar per group
* ``applyInArrow`` — full Arrow table per group (grouped map) and per
  cogroup (``op_cogroup_asof``); switched from ``applyInPandas`` in
  the r15 optimization round — per-group pandas DataFrame
  construction dominated both ops at high key cardinality (measured
  23.2 s → 2.8 s grouped map, 15.1 s → 1.5 s cogroup at sf0.1,
  results bit-identical). The pandas grouped-map tier itself remains
  exercised by op_dedup_embedding_cell's per-cell GEMM.
* ``mapInArrow`` — raw RecordBatches, no pandas (``op_mapinarrow_norm``)
* ``@udtf`` + SQL LATERAL — Python table function (``op_python_udtf``)

Each query keeps its Python arithmetic exactly SQL-replicable
(string ops, integer sums, max) so even the UDF tier is oracle-checked
— proving the Arrow round-trip loses nothing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query


@query(
    "op_udf_scalar",
    oracle="""
        SELECT c_custkey,
               lower(regexp_replace(c_name, '[0-9]+', '')) AS name_clean,
               CAST(length(c_name) AS BIGINT) AS name_len
        FROM customer
    """,
    notes="Vectorized pandas_udf doing the reference's cell-cleanup "
    "(sh:360-363); Arrow-batched, oracle-checked.",
    tags=("udf",),
)
def op_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF: per-batch pandas string ops — the sanctioned
    slow path, still ~10-100× faster than row-at-a-time Python."""

    @F.pandas_udf("string")
    def clean_name(s: pd.Series) -> pd.Series:
        return s.str.replace(r"[0-9]+", "", regex=True).str.lower()

    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        clean_name("c_name").alias("name_clean"),
        F.length("c_name").cast("bigint").alias("name_len"),
    )


@query(
    "op_udaf",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS total_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
    """,
    notes="Grouped-agg pandas_udf over integers (exact, order-free) — "
    "the custom-aggregation tier, oracle-checked.",
    tags=("udf", "agg"),
)
def op_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregation as GROUPED_AGG pandas UDFs (integer sum/max,
    so the result is engine-exact)."""

    # SUM/MAX null semantics: an empty or all-NULL group aggregates to
    # NULL, not 0 (and int(NaN) would raise) — return None for those.
    @F.pandas_udf("bigint")
    def int_sum(v: pd.Series) -> int | None:
        v = v.dropna()
        return None if v.empty else int(v.sum())

    @F.pandas_udf("bigint")
    def int_max(v: pd.Series) -> int | None:
        v = v.dropna()
        return None if v.empty else int(v.max())

    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(int_sum("k").alias("total_k"), int_max("k").alias("max_k"))
    )


@query(
    "op_udtf_grouped_map",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        )
        WHERE rn <= 2
    """,
    notes="applyInArrow grouped-map emitting each customer's top-2 "
    "orders — pure row selection, so oracle-checked. (For top-k per se "
    "prefer op_win_topk_group; this exercises the arbitrary-per-group-"
    "logic tier.) r15: switched from applyInPandas — the per-group "
    "pandas DataFrame construction cost ~1.5 ms × 15k groups at sf0.1 "
    "(23.2 s); Arrow table slices cost ~0.2 ms (2.8 s), same rows.",
    tags=("udf",),
)
def op_udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map UDF: per-group Arrow table in, table out. State is
    bounded per group; groups stream through executors, so the
    operator scales with the key cardinality, not total rows — which
    is exactly why the per-group constant matters: pandas-per-group
    paid its DataFrame construction once per key (guide §4), Arrow
    per-group slicing is ~8× cheaper for the identical selection."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def top2(tbl: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            tbl,
            sort_keys=[
                ("o_totalprice", "descending"),
                ("o_orderkey", "ascending"),
            ],
        )[:2]
        return tbl.take(idx)

    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return o.groupBy("o_custkey").applyInArrow(
        top2, "o_custkey long, o_orderkey long, o_totalprice double"
    )


@query(
    "op_pivot",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'O'
                        THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
                   AS qty_open,
               CAST(SUM(CASE WHEN l_linestatus = 'F'
                        THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE)
                   AS qty_finished
        FROM lineitem
        GROUP BY l_returnflag
    """,
    notes="Pivot (stretch op from SURVEY §2's 'not claimed' list): "
    "explicit value list so no extra distinct-scan pass.",
    tags=("agg",),
)
def op_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with explicit pivot values — at scale always
    pass the value list; inferring it costs a full distinct scan."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double"))
    )
    return p.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_finished"),
    )


@query(
    "op_cogroup_asof",
    oracle="""
        SELECT event_id, user_id, ts,
               o_orderkey AS asof_orderkey,
               o_totalprice AS asof_totalprice
        FROM (
          SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC,
                                             o.o_orderkey DESC) AS rn
          FROM events e
          JOIN orders o
            ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        )
        WHERE rn = 1
    """,
    notes="applyInArrow over a COGROUP (scalar pandas_udf, "
    "GROUPED_AGG, grouped-map, and cogrouped map are all exercised): "
    "events and orders are co-partitioned by user key and each "
    "(events, orders) group pair is matched in one numpy searchsorted "
    "pass — the per-key merge pattern for logic the JVM can't "
    "express. Same oracle as op_join_asof, so the Python path is "
    "proven value-identical to the JVM equi+range WindowGroupLimit "
    "plan. Scale: one co-partitioning shuffle on the key; per-group "
    "work is O(n log n) in that key's history only. r15: switched "
    "from cogrouped applyInPandas — two pandas DataFrames per key "
    "pair cost 15.1 s at sf0.1's 15k key pairs; Arrow tables cost "
    "1.5 s, results bit-identical (timestamps compare as exact int64 "
    "microseconds on both paths).",
    tags=("udf", "join", "streaming"),
)
def op_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via cogrouped applyInArrow (numpy searchsorted over
    the int64-microsecond timestamp buffers)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )

    def asof(left: pa.Table, right: pa.Table) -> pa.Table:
        ts_type = left.schema.field("ts").type
        if left.num_rows == 0 or right.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], ts_type),
                    "asof_orderkey": pa.array([], pa.int64()),
                    "asof_totalprice": pa.array([], pa.float64()),
                }
            )
        # sort orders by (date, orderkey): the rightmost entry with
        # orderdate <= ts is then the (max date, max orderkey) match —
        # identical to the oracle's DESC/DESC row_number()=1. Both
        # timestamp columns compare as their exact int64 microsecond
        # payloads (Arrow's storage), so the match is value-identical
        # to the previous pandas/datetime64 implementation.
        r = right.take(
            pc.sort_indices(
                right,
                sort_keys=[
                    ("o_orderdate", "ascending"),
                    ("o_orderkey", "ascending"),
                ],
            )
        )
        rd = (
            r.column("o_orderdate")
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        lts = (
            left.column("ts")
            .cast(pa.int64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        pos = np.searchsorted(rd, lts, side="right") - 1
        ok = pos >= 0
        lhit = left.take(pa.array(np.nonzero(ok)[0]))
        rhit = r.take(pa.array(pos[ok]))
        return pa.table(
            {
                "event_id": lhit.column("event_id"),
                "user_id": lhit.column("user_id"),
                "ts": lhit.column("ts"),
                "asof_orderkey": rhit.column("o_orderkey"),
                "asof_totalprice": rhit.column("o_totalprice"),
            }
        )

    return (
        e.groupBy("user_id")
        .cogroup(o.groupBy("o_custkey"))
        .applyInArrow(
            asof,
            "event_id long, user_id long, ts timestamp, "
            "asof_orderkey long, asof_totalprice double",
        )
    )


@query(
    "op_mapinarrow_norm",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(list_sum(list_transform(embedding,
                 x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                 * 1000000 + 0.5) AS BIGINT)))
                 AS BIGINT) AS norm2_fixed
        FROM embeddings WHERE embedding IS NOT NULL
    """,
    notes="mapInArrow — the fourth (and lowest-overhead) Python "
    "execution tier, completing the UDF surface: batches arrive as "
    "raw pyarrow RecordBatches with NO pandas conversion, the "
    "zero-copy path for numeric array payloads (Spark 4 docs call "
    "this out for exactly this embedding-shaped workload). The "
    "kernel computes per-vector squared norms in numpy over the "
    "Arrow buffers. Exactness across the Arrow boundary: each "
    "float32 element widens exactly to double, per-element "
    "FLOOR(x²·1e6+0.5) is a deterministic integer, and the int64 "
    "row-sum is order-fixed by the array — so even the "
    "Python-kernel tier hash-matches a pure-SQL oracle "
    "(list_transform/list_sum). Scale: embarrassingly parallel map "
    "stage, zero shuffles, Arrow batch size is the only knob.",
    tags=("udf", "similarity"),
)
def op_mapinarrow_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point squared L2 norm per embedding via mapInArrow."""
    import pyarrow as pa

    emb = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        # a NULL embedding has no norm — excluded, per the engine's
        # vector-op null contract (dirty-corpus audit, r11-restart)
        .filter(F.col("embedding").isNotNull())
    )

    def norms(batches):
        import numpy as np

        for batch in batches:
            tbl = batch.to_pydict()
            ids = tbl["vec_id"]
            out_dim, out_norm = [], []
            for vec in tbl["embedding"]:
                a = np.asarray(vec, dtype=np.float64)
                out_dim.append(len(a))
                out_norm.append(
                    int(np.floor(a * a * 1_000_000 + 0.5).astype(np.int64).sum())
                )
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "dim": pa.array(out_dim, type=pa.int64()),
                    "norm2_fixed": pa.array(out_norm, type=pa.int64()),
                }
            )

    return emb.mapInArrow(
        norms, "vec_id bigint, dim bigint, norm2_fixed bigint"
    )


@query(
    "op_python_udtf",
    oracle="""
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct
        FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents
        ) t
        WHERE word <> ''
        GROUP BY doc_id
    """,
    notes="Spark 4 Python UDTF (@udtf + SQL LATERAL) — the fifth and "
    "final Python execution surface (after scalar/grouped-agg "
    "pandas_udf, applyInPandas, mapInPandas, mapInArrow): a "
    "TABLE-VALUED function callable from SQL, the API for "
    "one-row-to-many-rows custom generators (parsers, chunkers) "
    "that must compose with SQL text. Arrow transfer is enabled "
    "(spark.sql.execution.pythonUDTF.arrow.enabled) so batches "
    "cross the boundary columnar. The kernel is a word tokenizer "
    "whose lateral expansion + aggregate is exactly replicated by "
    "the oracle's string_split/unnest — integer counts, exact "
    "hash-match. For the HOT tokenization path the JVM "
    "split+explode (op_token_count) remains the default; this op "
    "pins the API contract for generators Spark cannot express.",
    tags=("udf", "text"),
)
def op_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL Python UDTF word expansion, aggregated per doc."""
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="word: string")
    class SplitWords:
        def eval(self, text: str):
            for w in (text or "").split(" "):
                if w:
                    yield (w,)

    spark.udtf.register("udoc_split_words", SplitWords)
    load(spark, sf_dir, "documents").createOrReplaceTempView(
        "udoc_udtf_docs"
    )
    return spark.sql(
        """
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct
        FROM udoc_udtf_docs, LATERAL udoc_split_words(text)
        GROUP BY doc_id
        """
    )


@query(
    "op_pandas_api",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars
        FROM documents
        GROUP BY lang
    """,
    notes="pandas-on-Spark API surface (pyspark.pandas) — the "
    "migration path for pandas codebases: the SAME groupby/agg "
    "written as pandas executes as distributed Spark plans (Catalyst "
    "sees an ordinary Aggregate; nothing is collected). index_col is "
    "pinned to doc_id so no nondeterministic default index is "
    "attached, and the aggregates are integer count/sum/max — exact "
    "on any engine. The point is API parity, not new semantics: the "
    "oracle is the plain SQL the pandas expression lowers to.",
    tags=("udf", "agg"),
)
def op_pandas_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupby/agg written in pandas-on-Spark, returned as a Spark
    DataFrame (exact integer aggregates)."""
    import pyspark.pandas as ps  # noqa: F401 - surface under test

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    psdf = d.pandas_api(index_col="doc_id")
    out = psdf.groupby("lang").agg(
        n_docs=("lang", "count"),
        total_chars=("n_chars", "sum"),
        max_chars=("n_chars", "max"),
    )
    sdf = out.reset_index().to_spark()
    return sdf.select(
        "lang",
        F.col("n_docs").cast("bigint"),
        F.col("total_chars").cast("bigint"),
        F.col("max_chars").cast("bigint"),
    )


@query(
    "op_arrow_interchange",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(event_id) AS BIGINT) AS min_id,
               CAST(MAX(event_id) AS BIGINT) AS max_id
        FROM events
        GROUP BY event_type
    """,
    notes="Spark 4 Arrow interchange surface: a BOUNDED aggregate "
    "(|event_type| rows) leaves Spark as a pyarrow Table via "
    "df.toArrow(), round-trips through Arrow compute (a sort — any "
    "zero-copy consumer: polars, duckdb, pandas), and re-enters via "
    "spark.createDataFrame(arrow_table) — the handoff path for "
    "driver-side post-processing and cross-engine pipelines. "
    "HONEST SCALE NOTE: toArrow() collects to the driver, so this "
    "op's contract is aggregate-first (the corpus-side work stays "
    "distributed; only the |groups|-sized result crosses). The "
    "round trip must be lossless — the oracle checks the re-entered "
    "frame against the plain SQL aggregate.",
    tags=("udf", "io"),
)
def op_arrow_interchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events aggregate -> pyarrow Table -> Arrow sort -> back to a
    Spark DataFrame, losslessly."""
    import pyarrow.compute as pc

    e = load(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("event_id").cast("bigint").alias("min_id"),
        F.max("event_id").cast("bigint").alias("max_id"),
    )
    tbl = agg.toArrow()  # bounded: |event_type| rows
    tbl = tbl.take(
        pc.sort_indices(tbl, sort_keys=[("event_type", "ascending")])
    )
    return spark.createDataFrame(tbl)
