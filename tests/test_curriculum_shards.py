"""op_curriculum_shards content pins beyond the driver oracle."""

from __future__ import annotations

import duckdb


def test_ntile_formula_matches_sql_when_fewer_rows_than_tiles(spark):
    """The q_sz == 0 branch (corpus smaller than the shard count) —
    unreachable from the fixtures — must still reproduce SQL ntile:
    tile i holds exactly row i."""
    from pyspark.sql import functions as F

    from universal_data_to_orc_converter_spark.operators.sampling import (
        _N_CURRICULUM_SHARDS,
    )

    n = 5
    assert n < _N_CURRICULUM_SHARDS
    con = duckdb.connect()
    try:
        ref = con.sql(
            f"SELECT r, ntile({_N_CURRICULUM_SHARDS}) OVER (ORDER BY r) "
            f"FROM (SELECT unnest(generate_series(1, {n})) AS r)"
        ).fetchall()
    finally:
        con.close()
    # q_sz == 0 path in the op: shard = rank
    assert ref == [(r, r) for r in range(1, n + 1)]


def test_ranks_are_a_permutation_and_shards_contiguous(spark):
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )

    from .conftest import SF_DIR

    rows = (
        load_all_queries()["op_curriculum_shards"]
        .fn(spark, SF_DIR)
        .collect()
    )
    n = len(rows)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, n + 1)), "ranks must be a permutation"
    by_rank = sorted(rows, key=lambda r: r["rank"])
    # curriculum order: n_tokens non-decreasing along the rank order
    toks = [r["n_tokens"] for r in by_rank]
    assert toks == sorted(toks)
    # shards are contiguous rank ranges with ntile sizes
    shards = [r["shard"] for r in by_rank]
    assert shards == sorted(shards)
    from collections import Counter

    sizes = Counter(shards)
    q, rem = divmod(n, 16)
    assert sorted(sizes.values(), reverse=True) == [q + 1] * rem + [
        q
    ] * (16 - rem)
