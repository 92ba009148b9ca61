"""Semi-structured functions — SURVEY.md §2.H (json / array / map).

EXT surface driven by the fixtures: ``events.props`` is a JSON string,
``embeddings.embedding`` is ``array<float>``. All JVM built-ins; JSON
extraction and array ops stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..registry import query


@query(
    "op_json_funcs",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
               json_extract_string(props, '$.missing') AS missing_val
        FROM events
    """,
    tags=("json",),
)
def op_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the events.props JSON payload; missing paths
    yield NULL in both engines."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@query(
    "op_json_agg",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
                   AS sum_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
    """,
    tags=("json", "agg"),
)
def op_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over an extracted JSON field (integer sum — exact)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int"))
        .cast("bigint")
        .alias("sum_k"),
        F.count("*").alias("n"),
    )


@query(
    "op_array_funcs",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_val,
               CAST(embedding[64] AS DOUBLE) AS last_val,
               CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
        FROM embeddings
    """,
    tags=("array",),
)
def op_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / filter over the embedding arrays (both
    engines index arrays 1-based; float→double casts are exact)."""
    em = load(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", 64).cast("double").alias("last_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int").alias("n_positive"),
    )


@query(
    "op_array_explode",
    oracle="""
        SELECT vec_id,
               CAST(u.pos AS INT) AS pos,
               CAST(embedding[u.pos] AS DOUBLE) AS val
        FROM embeddings,
             LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS pos) u
        WHERE vec_id < 10
    """,
    tags=("array",),
)
def op_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → (position, value) rows. Spark posexplode is
    0-based, SQL ordinality is 1-based — normalized to 1-based."""
    em = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return em.select(
        "vec_id", F.posexplode("embedding").alias("pos0", "valf")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("int").alias("pos"),
        F.col("valf").cast("double").alias("val"),
    )


@query(
    "op_map_funcs",
    oracle="""
        SELECT event_id, u.k AS prop_key
        FROM events, LATERAL unnest(json_keys(props)) AS u(k)
    """,
    tags=("map",),
)
def op_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON string → MapType → exploded keys (from_json + map_keys +
    explode); the oracle walks the same keys via json_keys/unnest."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.StringType()))
    return e.select(
        "event_id", F.explode(F.map_keys(m)).alias("prop_key")
    )


@query(
    "op_posexplode_outer",
    oracle="""
        SELECT doc_id, n_tok, u.pos, u.tok
        FROM (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS BIGINT) AS n_tok,
                 CASE WHEN len(toks) = 0
                      THEN [{'pos': CAST(-1 AS BIGINT),
                             'tok': CAST(NULL AS VARCHAR)}]
                      ELSE [{'pos': CAST(i - 1 AS BIGINT),
                             'tok': toks[CAST(i AS INT)]}
                            FOR i IN generate_series(1, len(toks))]
                 END AS entries
          FROM (
            SELECT doc_id, text,
                   list_filter(string_split(lower(substr(text, 1, 40)), ' '),
                               x -> x <> '') AS toks
            FROM documents
          )
        ) d, LATERAL unnest(entries) AS t(u)
    """,
    notes="posexplode_outer: position-preserving explode that KEEPS "
    "rows whose array is empty (plain explode silently drops them — "
    "the classic lost-document bug in tokenize pipelines). Documents "
    "whose 40-char prefix has no tokens survive as a (pos=-1, "
    "tok=NULL) row. DuckDB lacks WITH ORDINALITY, so the oracle "
    "builds (pos, tok) structs with a list comprehension and unnests "
    "those; both sides use 0-based positions with -1 for the empty "
    "case.",
    tags=("semistructured",),
)
def op_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-tagged token explode that keeps empty documents."""
    from ..operators.textprep import tokens

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tok"),
        tokens(F.substring("text", 1, 40)).alias("toks"),
    )
    exploded = d.select(
        "doc_id",
        "n_tok",
        F.posexplode_outer("toks").alias("pos", "tok"),
    )
    return exploded.select(
        "doc_id",
        "n_tok",
        F.coalesce(F.col("pos").cast("bigint"), F.lit(-1)).alias("pos"),
        "tok",
    )


@query(
    "op_variant_extract",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k')
                             AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k')
                             AS BIGINT)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
    """,
    notes="Spark 4 VARIANT — the new semi-structured type the "
    "from_json/get_json_object ops (op_json_funcs) predate: "
    "parse_json() ingests the payload ONCE into the binary variant "
    "encoding, variant_get() then extracts typed paths without "
    "re-parsing text per access — the engine-native answer to "
    "schema-on-read at 100 TB (one parse amortized over N path "
    "reads, shredded columnar storage upstream when written). "
    "Extracted k is integer end-to-end, so sums are exact and the "
    "oracle (DuckDB's JSON path extraction) hash-matches.",
    tags=("semistructured",),
)
def op_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json → variant_get typed extraction → exact aggregate."""
    e = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )
