"""Exact content checks for the linalg module: the distributed PCA
projection must reproduce a numpy replica bit-for-bit (the axes come
from the SAME driver-side eigensolve helper; the projections are
integer arithmetic on quantized values, so equality is exact, not
approximate)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

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


def test_cov_partial_kernel_fallback_matches_fast_path():
    """r16 moved the covariance partials into a mapInArrow kernel; the
    uniform fast path (one int64 Q^T Q per batch) and the ragged/null
    fallback (element_at semantics per row) must agree wherever both
    apply, and the fallback must reproduce element_at's
    missing-coordinate behavior on out-of-contract rows."""
    import pyarrow as pa

    from universal_data_to_orc_converter_spark.operators.linalg import (
        DIM,
        _cov_partial_batches,
    )

    rng = np.random.default_rng(7)
    uniform = rng.normal(size=(5, DIM)).astype(np.float32).tolist()

    def cells(rows):
        batch = pa.RecordBatch.from_arrays(
            [pa.array(rows, type=pa.list_(pa.float32()))],
            names=["embedding"],
        )
        out = {}
        for b in _cov_partial_batches(iter([batch])):
            for i, j, p in zip(*(b.column(c).to_pylist()
                                 for c in ("i", "j", "p"))):
                out[(i, j)] = out.get((i, j), 0) + p
        return out

    # fast path == fallback on the same uniform rows (force the
    # fallback by appending, then removing, a short row's contribution)
    fast = cells(uniform)
    short = uniform[0][: DIM // 2]
    mixed = cells(uniform + [short])
    qs = np.floor(
        np.asarray(short, dtype=np.float64) * 1000.0 + 0.5
    ).astype(np.int64)
    # subtract the short row's expected element_at-style contribution
    assert mixed[(-1, -1)] == fast[(-1, -1)] + 1
    for i in range(DIM):
        exp = int(qs[i]) if i < len(short) else 0
        assert mixed[(i, -1)] == fast[(i, -1)] + exp
    for i in range(DIM):
        for j in range(i, DIM):
            exp = (
                int(qs[i]) * int(qs[j])
                if j < len(short)
                else 0
            )
            assert mixed[(i, j)] == fast[(i, j)] + exp


def test_principal_axes_are_orthonormal(spark):
    cells = op_embedding_covariance(spark, SF_DIR).collect()
    axes = np.array(principal_axes(cells, k=2), dtype=np.float64) / 1e6
    # quantized to 1e-6, so orthonormality holds to ~1e-4
    assert abs(np.dot(axes[0], axes[0]) - 1.0) < 1e-4
    assert abs(np.dot(axes[1], axes[1]) - 1.0) < 1e-4
    assert abs(np.dot(axes[0], axes[1])) < 1e-4


def _cells_from_matrix(m):
    """Upper-triangular Row-alike cells for principal_axes from a
    dense symmetric int matrix."""
    from universal_data_to_orc_converter_spark.operators.linalg import DIM

    return [
        {"i": i, "j": j, "cov_num_fp": int(m[i][j])}
        for i in range(DIM)
        for j in range(i, DIM)
    ]


def test_principal_axes_recover_clear_gap_spectrum():
    """On a spectrum with real eigengaps (1000, 500, then <=10) the
    fixed-point power iteration must recover BOTH eigh axes almost
    exactly — this pins that the r14 eigh->iteration rework is still
    PCA, not merely a self-consistent oracle pair."""
    from universal_data_to_orc_converter_spark.operators.linalg import DIM

    rng = np.random.default_rng(7)
    basis, _ = np.linalg.qr(rng.normal(size=(DIM, DIM)))
    lam = np.array([1000.0, 500.0] + list(np.linspace(10, 1, DIM - 2)))
    m = (basis * lam) @ basis.T * 1e12
    axes = np.array(principal_axes(_cells_from_matrix(m), k=2)) / 1e6
    _, vv = np.linalg.eigh(m)
    assert abs(axes[0] @ vv[:, -1]) > 0.999
    assert abs(axes[1] @ vv[:, -2]) > 0.999


def test_principal_axes_rayleigh_near_optimal(spark):
    """The fixture embedding corpus is nearly isotropic (adjacent
    eigenvalue ratios ~0.99), where axis-alignment against eigh is the
    wrong metric — ANY unit vector in the top eigenspace is an equally
    good PCA axis. The honest fidelity claim is variance captured:
    each returned axis's Rayleigh quotient must be >=97% of the
    corresponding eigenvalue (measured 0.9996/0.9945 at sf0.01)."""
    cells = op_embedding_covariance(spark, SF_DIR).collect()
    from universal_data_to_orc_converter_spark.operators.linalg import DIM

    m = np.zeros((DIM, DIM))
    for r in cells:
        m[r["i"], r["j"]] = m[r["j"], r["i"]] = r["cov_num_fp"]
    axes = np.array(principal_axes(cells, k=2), dtype=np.float64) / 1e6
    w = np.linalg.eigvalsh(m)
    if w[-1] <= 0:
        return  # degenerate corpus: nothing to capture
    assert (axes[0] @ m @ axes[0]) / (axes[0] @ axes[0]) >= 0.97 * w[-1]
    assert (axes[1] @ m @ axes[1]) / (axes[1] @ axes[1]) >= 0.97 * w[-2]


def test_principal_axes_zero_matrix_canonical():
    """Empty / single-vector corpora give an all-zero numerator matrix;
    both engines must agree on the canonical e_0/e_1 fallback axes (the
    oracle's CASE mx=0 branch)."""
    from universal_data_to_orc_converter_spark.operators.linalg import DIM

    axes = principal_axes([], k=2)
    e0 = [1_000_000] + [0] * (DIM - 1)
    e1 = [0, 1_000_000] + [0] * (DIM - 2)
    assert axes == [e0, e1]


def test_principal_axes_bounded_at_extreme_magnitudes():
    """Empirically pins the int64 overflow-bound argument in the
    principal_axes docstring: symmetric matrices with entries up to
    ±2^62 — far beyond any corpus numerator (sf0.1 is ~2^43) — must
    run the full iteration without tripping the 2^62 runtime assert
    (which would surface any wraparound long before it corrupts a
    result) and return 1e6-quantized near-unit axes. Matrices are
    intentionally NOT restricted to PSD: the bound argument is
    magnitude-only, so it must hold even for sign-alternating
    dominant eigenvalues the op itself never feeds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from universal_data_to_orc_converter_spark.operators.linalg import DIM

    @settings(max_examples=15, deadline=None)
    @given(
        seed=st.integers(0, 2**32 - 1),
        scale=st.sampled_from([1, 2**20, 2**40, 2**61, 2**62 - 1]),
    )
    def run(seed, scale):
        rng = np.random.default_rng(seed)
        up = rng.integers(-scale, scale, size=(DIM, DIM), dtype=np.int64)
        m = np.triu(up) + np.triu(up, 1).T  # symmetric, no +/2 overflow
        cells = [
            {"i": i, "j": j, "cov_num_fp": int(m[i, j])}
            for i in range(DIM)
            for j in range(i, DIM)
        ]
        axes = principal_axes(cells, k=2)
        for a in axes:
            assert len(a) == DIM
            assert max(abs(x) for x in a) <= 1_000_001
            n2 = sum((x / 1e6) ** 2 for x in a)
            assert abs(n2 - 1.0) < 1e-3, n2

    run()


def test_pca_oracle_parity_on_crafted_corpora(spark, tmp_path):
    """Cross-engine pins for the r14 power-iteration oracle's edge
    branches on NON-fixture data (the fixture differentials only ever
    exercise the generic path): (a) an anti-correlated corpus whose
    dominant axis has its largest-magnitude component NEGATIVE, so the
    sign-normalization negate branch fires on both engines; (b) a
    duplicate-vector corpus where n·Σxy − Σx·Σy is identically zero,
    so both engines must take the canonical e_0/e_1 fallback; (c) NULL
    embeddings interleaved, which must project to NULL on both sides."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from universal_data_to_orc_converter_spark.operators.linalg import (
        DIM,
        op_pca_project,
    )
    from universal_data_to_orc_converter_spark.registry import QUERIES

    from .conftest import assert_frames_match

    def corpus(rows):
        d = tmp_path / f"c{corpus.n}"
        corpus.n += 1
        d.mkdir()
        tbl = pa.table(
            {
                "vec_id": pa.array(range(len(rows)), pa.int64()),
                "embedding": pa.array(rows, pa.list_(pa.float32())),
                "label": pa.array([0] * len(rows), pa.int32()),
            }
        )
        pq.write_table(tbl, str(d / "embeddings.parquet"))
        return d

    corpus.n = 0

    def pad(head):
        return [list(head) + [0.0] * (DIM - len(head))]

    # (a) rank-1 loadings l = (3,-2,-2): dominant eigvec ∝ l, but the
    # all-ones start overlaps l NEGATIVELY (3-2-2-... = -1), so the
    # iteration converges to -l = (-3,2,2)/√17 whose largest-magnitude
    # component is negative → the sign-normalization negate branch
    # must fire on BOTH engines (asserted below: a1[0] comes out +)
    neg = sum(
        (
            pad([3.0 * x, -2.0 * x, -2.0 * x])
            for x in (-3.0, -1.0, 0.0, 2.0, 5.0, 9.0)
        ),
        [],
    )
    # (b) five identical vectors → zero numerator matrix
    dup = [[1.5] * DIM] * 5
    # (c) NULLs interleaved with the anti-correlated corpus
    nul = [r if i % 2 else None for i, r in enumerate(neg)]

    for name, rows in (("negate", neg), ("dup-zero", dup), ("nulls", nul)):
        d = corpus(rows)
        got = op_pca_project(spark, str(d))
        con = duckdb.connect()
        try:
            con.sql(
                "CREATE VIEW embeddings AS SELECT * FROM "
                f"'{d}/embeddings.parquet'"
            )
            assert_frames_match(
                got,
                con.sql(QUERIES["op_pca_project"].oracle),
                f"op_pca_project[{name}]",
            )
        finally:
            con.close()

    # the negate corpus really does exercise the sign branch: without
    # the flip the axis would be (-3,2,2)/√17 (the side the iteration
    # converges to), so a POSITIVE largest component proves the branch
    # ran — and it must equal 3/√17 · 1e6 on the rank-1 spectrum
    cells = op_embedding_covariance(spark, str(tmp_path / "c0")).collect()
    a1 = principal_axes(cells, k=2)[0]
    assert max(a1, key=abs) == a1[0] and a1[0] > 0
    assert abs(a1[0] - 727607) <= 2  # 3/√17 · 1e6


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


def test_semdedup_oracle_k_tracks_op():
    """Regime guard, r13 form: op_semdedup's oracle no longer pins the
    fixture-scale k=8 — it embeds _ADAPTIVE_K_SQL, whose GREATEST/
    ``//`` spelling must compute exactly Python's
    ``max(K_CENTERS, n // 64)`` at every corpus size, or the oracle
    silently describes a different clustering than the op runs (the
    pre-r13 version of this guard merely asserted the FIXTURE stayed
    inside the k=8 regime, which left the sf0.1 audit permanently
    red)."""
    import duckdb

    from universal_data_to_orc_converter_spark.operators.linalg import (
        _ADAPTIVE_K_SQL,
        K_CENTERS,
    )
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )

    assert _ADAPTIVE_K_SQL in load_all_queries()["op_semdedup"].oracle

    con = duckdb.connect()
    for n in (0, 1, 7, 8, 500, 511, 512, 576, 5000, 50000):
        got = con.sql(
            "WITH q AS (SELECT * FROM range({n})) SELECT {k}".format(
                n=n, k=_ADAPTIVE_K_SQL
            )
        ).fetchone()[0]
        assert got == max(K_CENTERS, n // 64), (
            f"n={n}: SQL k={got} != Python k={max(K_CENTERS, n // 64)}"
        )


def test_semdedup_oracle_matches_op_in_adaptive_k_regime(spark, tmp_path):
    """The un-pinned oracle must hash-match the op in a regime where
    the adaptive k EXCEEDS K_CENTERS (the case the pre-r13 oracle could
    never check): 4 shifted copies of the fixture's 500 embeddings
    give n=2000, k = max(8, 2000//64) = 31, so both the GREATEST seed
    and the op's adaptive branch are exercised off the fixture
    regime."""
    import duckdb

    from universal_data_to_orc_converter_spark.catalog import load
    from universal_data_to_orc_converter_spark.registry import (
        load_all_queries,
    )

    from .conftest import SF_DIR, assert_frames_match

    em = load(spark, SF_DIR, "embeddings")
    n = em.count()
    copies = [
        em.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            # perturb one coordinate per copy so the copies aren't
            # exact duplicates (dup counts stay nontrivial either way)
            F.concat(
                F.slice("embedding", 1, 63),
                F.array(
                    (F.element_at("embedding", 64) + F.lit(i * 0.01)).cast(
                        "float"
                    )
                ),
            ).alias("embedding"),
            *[c for c in em.columns if c not in ("vec_id", "embedding")],
        )
        for i in range(4)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    out_dir = str(tmp_path / "emb")
    big.coalesce(1).write.parquet(out_dir)

    sf_dir = str(tmp_path)
    import glob as _glob
    import os as _os

    part = _glob.glob(_os.path.join(out_dir, "part-*.parquet"))[0]
    _os.rename(part, _os.path.join(sf_dir, "embeddings.parquet"))

    spec = load_all_queries()["op_semdedup"]
    sdf = spec.fn(spark, sf_dir)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{_os.path.join(sf_dir, 'embeddings.parquet')}'"
    )
    assert_frames_match(sdf, con.sql(spec.oracle), "op_semdedup_adaptive")


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
