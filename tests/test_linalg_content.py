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
