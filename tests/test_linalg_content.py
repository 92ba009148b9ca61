"""Exact content checks for the linalg module: the distributed PCA
projection must reproduce a numpy replica bit-for-bit (the axes come
from the SAME driver-side eigensolve helper; the projections are
integer arithmetic on quantized values, so equality is exact, not
approximate)."""

from __future__ import annotations

import numpy as np

from universal_data_to_orc_converter_spark.operators.linalg import (
    op_embedding_covariance,
    op_pca_project,
    principal_axes,
)

from .conftest import SF_DIR


def test_pca_projection_matches_numpy_replica(spark, oracle):
    got = {
        r["vec_id"]: (r["label"], r["pc1_fp"], r["pc2_fp"])
        for r in op_pca_project(spark, SF_DIR).collect()
    }
    cells = op_embedding_covariance(spark, SF_DIR).collect()
    axes = np.array(principal_axes(cells, k=2), dtype=np.int64)
    rows = oracle.sql(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    assert len(got) == len(rows)
    for vec_id, label, emb in rows:
        q = np.floor(np.asarray(emb, dtype=np.float64) * 1000 + 0.5).astype(
            np.int64
        )
        p1 = int((q * axes[0]).sum())
        p2 = int((q * axes[1]).sum())
        assert got[vec_id] == (label, p1, p2), f"vec {vec_id} diverges"


def test_principal_axes_are_orthonormal(spark):
    cells = op_embedding_covariance(spark, SF_DIR).collect()
    axes = np.array(principal_axes(cells, k=2), dtype=np.float64) / 1e6
    # quantized to 1e-6, so orthonormality holds to ~1e-4
    assert abs(np.dot(axes[0], axes[0]) - 1.0) < 1e-4
    assert abs(np.dot(axes[1], axes[1]) - 1.0) < 1e-4
    assert abs(np.dot(axes[0], axes[1])) < 1e-4


def test_kmeans_empty_cluster_oracle_parity(spark, tmp_path):
    """An assignment round can empty a cluster (here: duplicate init
    vectors make every cid-1 candidate tiebreak to cid 0). The Spark
    side keeps the emptied cluster's PREVIOUS center as a candidate
    (``new.get(j, centers[j])``); the oracle mirrors it with a
    COALESCE against the prior round's centers over the c0 spine —
    without that, the engines' assignment sets silently diverge the
    moment any cluster empties (r5 advice)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from universal_data_to_orc_converter_spark.operators.linalg import (
        DIM,
        op_kmeans,
    )
    from universal_data_to_orc_converter_spark.registry import QUERIES

    from .conftest import assert_frames_match

    # first-dim-only vectors (quantized x1000): init centers land at
    # 0, 0(dup), 100k..600k; vec8 at 600 joins cid 0, whose round-1
    # centroid moves to 200 — so in round 2 the duplicates at 0 are
    # recaptured by the EMPTIED cid 1's kept center at 0.
    first = [0.0, 0.0, 100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 0.6]
    embs = [[x] + [0.0] * (DIM - 1) for x in first]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(first)), pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(first), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    got = op_kmeans(spark, str(tmp_path))
    rows = {
        r["center_id"]: (r["n_members"], r["inertia"])
        for r in got.collect()
    }
    # the emptied cluster must exist in the final assignment again
    assert rows[1] == (2, 0), rows
    assert rows[0] == (1, 0), rows

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{tmp_path}/embeddings.parquet'"
        )
        assert_frames_match(
            got,
            con.sql(QUERIES["op_kmeans"].oracle),
            "op_kmeans_empty_cluster",
        )
    finally:
        con.close()


def test_kmeans_arrow_assignment_equals_literal(spark):
    """kmeans_assignments' two implementations — literal-expression
    codegen (oracle path, small k) and Arrow-batched numpy (the
    hundreds-of-centers scale path) — must produce IDENTICAL
    (cid, dist) for every vector: same int64 arithmetic, same
    first-minimum (lowest-cid) tiebreak."""
    from universal_data_to_orc_converter_spark.catalog import load
    from universal_data_to_orc_converter_spark.operators.linalg import (
        _qv,
        kmeans_assignments,
    )

    from .conftest import SF_DIR

    em = load(spark, SF_DIR, "embeddings")
    q = em.select("vec_id", _qv().alias("qv")).cache()
    try:
        lit = sorted(
            (r["vec_id"], r["cid"], r["dist"])
            for r in kmeans_assignments(q, arrow=False).collect()
        )
        arr = sorted(
            (r["vec_id"], r["cid"], r["dist"])
            for r in kmeans_assignments(q, arrow=True).collect()
        )
        assert lit == arr
    finally:
        q.unpersist()


def test_semdedup_adaptive_k_matches_oracle_at_fixture(spark):
    """op_semdedup's adaptive default (k = max(8, n/64)) must resolve
    to exactly K_CENTERS at the oracle fixture cardinality, or the
    unrolled k=8 DuckDB CTE silently stops describing what the op
    runs — the same regime-guard pattern as the HLL sparse-mode
    tests."""
    from universal_data_to_orc_converter_spark.catalog import load
    from universal_data_to_orc_converter_spark.operators.linalg import (
        K_CENTERS,
    )

    from .conftest import SF_DIR

    n = load(spark, SF_DIR, "embeddings").count()
    assert max(K_CENTERS, n // 64) == K_CENTERS, (
        f"fixture has {n} vectors; adaptive k would diverge from the "
        f"k={K_CENTERS} oracle CTE — re-derive the oracle or pin _k"
    )


def test_kmeans_fewer_rows_than_k_clamps_instead_of_crashing(spark):
    """A corpus with fewer than k vectors seeds fewer centers; the
    M-step's centers[j] for j in range(k) used to raise IndexError
    (r7 advice). k must clamp to the seeded count, and an empty frame
    must return an EMPTY assignment with the kernel's schema (the
    r11-restart empty-corpus contract — tests/test_empty_corpus.py
    pins the same degradation op-level)."""
    from universal_data_to_orc_converter_spark.catalog import load
    from universal_data_to_orc_converter_spark.operators.linalg import (
        _qv,
        kmeans_assignments,
    )

    from .conftest import SF_DIR

    em = load(spark, SF_DIR, "embeddings")
    tiny = em.orderBy("vec_id").limit(3).select("vec_id", _qv().alias("qv"))
    out = kmeans_assignments(tiny, k=8, iters=1).collect()
    assert len(out) == 3
    assert all(0 <= r["cid"] < 3 for r in out)

    empty = tiny.filter("vec_id < 0")
    out = kmeans_assignments(empty, k=8, iters=1)
    assert out.columns == ["vec_id", "qv", "cid", "dist"]
    assert out.count() == 0


def test_kcenter_selection_distances_monotone_and_radius_bounded(spark):
    """Gonzalez greedy k-center invariants: selection distances are
    non-increasing (each new center is the farthest remaining point,
    and adding centers can only shrink min-distances), and the final
    coverage radius is <= the last selection distance."""
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )

    from .conftest import SF_DIR

    rows = {
        r["sel_round"]: r
        for r in load_all_queries()["op_kcenter_coreset"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert rows[1]["d2"] == 0
    d = [rows[i]["d2"] for i in range(2, 5)]
    assert d == sorted(d, reverse=True), "selection distances must fall"
    radius = rows[5]["d2"]
    assert rows[5]["vec_id"] is None
    assert radius <= d[-1], "radius cannot exceed the last selection"


def test_kcenter_empty_embeddings_returns_empty_coreset(spark, tmp_path):
    """Regression, twice over: collect() on an empty frame returns
    [], not [None], so the seed guard must check emptiness (the old
    `first is None` check was dead code and an empty table raised
    IndexError); and since the r11-restart empty-corpus contract the
    guard degrades to an EMPTY coreset with the op's schema instead
    of raising (tests/test_empty_corpus.py pins the same behavior
    through the full fixture)."""
    from universal_data_to_orc_converter_spark.catalog import load
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )

    from .conftest import SF_DIR

    em = load(spark, SF_DIR, "embeddings")
    em.filter("vec_id < 0").write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = load_all_queries()["op_kcenter_coreset"].fn(spark, str(tmp_path))
    assert out.columns == ["sel_round", "vec_id", "d2"]
    assert out.count() == 0
