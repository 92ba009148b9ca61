"""Distributed linear algebra via tensor partial aggregation
(SURVEY.md §2.I extension, r5).

The covariance / Gram matrix of an embedding corpus is the input to
PCA, whitening, and OPQ-style rotation learning — and at 100 TB it is
the canonical example of an operation whose OUTPUT is tiny (d×d) while
its input is the whole corpus. The scale-correct plan is partial
aggregation of per-partition d×d blocks: every partition reduces its
rows to ≤ d(d+1)/2 partial sums BEFORE the shuffle (Spark's map-side
combine does this for free once the computation is phrased as
groupBy(i, j).sum), so the one exchange carries O(d²) rows per
partition regardless of corpus size. That is exactly how MLlib's
RowMatrix computes Gramians, re-expressed here in pure DataFrame ops.

Cross-engine exactness for a sum of float PRODUCTS: both engines
quantize each coordinate to 1e3 fixed-point first (floor(x·1e3+0.5) —
the identical FP op), so every product is an exact integer and the
accumulated co-moment is order-independent. The emitted statistic is
the covariance NUMERATOR n·Σxy − Σx·Σy — pure integer arithmetic, no
division, no epsilon. Accumulators are BIGINT end-to-end (r16: the
Arrow partial kernel emits int64 per-batch cells and the exchange sums
longs — ±9.2e18 of headroom, more than the decimal(18,0) the per-row
form carried); the final n·Σxy combine is widened to decimal(28,0) in
build(), and a 1e11-row corpus would move the batch partials into
decimal(38,0) territory too — that remains the documented switch (same
arithmetic, wider type).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

DIM = 64


def _cov_partial_batches(batches):
    """Per-batch covariance partials for op_embedding_covariance: each
    Arrow batch reduces to its own count/per-dim-sum/upper-triangle
    co-moment cells — ``(i, j, p)`` rows with the SAME sentinel layout
    as the former per-row JVM expansion (i=j=-1 count, j=-1 dim sums,
    i<=j pair cells) — so the downstream ``groupBy(i, j).sum`` plan
    (map-side partial aggregate, one exchange) is unchanged while the
    per-row work becomes one exact int64 ``Qᵀ @ Q`` per batch instead
    of a 2145-cell interpreted higher-order-function explode per ROW
    (guide §4.2; r15 measured the old shape at 3.1 s of the pca
    pipeline's 4.6 s).

    Exactness: quantization is ``floor(x·1000 + 0.5)`` on the exact
    float32→double widening — the identical IEEE op sequence as the
    JVM/_qv/DuckDB forms — and everything after is int64 (products
    exact, sums order-independent). Per-row contract unchanged from
    the decimal-fed original: |qv| must stay far inside int64 (true
    for any real embedding; a 1e11-row corpus moves the FINAL n·Σxy
    combine into decimal, which build() already does). Rows whose
    array length differs from DIM reproduce element_at semantics
    (coordinates beyond the row's length contribute nothing; the row
    still counts)."""
    import numpy as np
    import pyarrow as pa

    iu, ju = np.triu_indices(DIM)
    ii = np.concatenate(([-1], np.arange(DIM), iu)).astype(np.int32)
    jj = np.concatenate(([-1], np.full(DIM, -1), ju)).astype(np.int32)
    for batch in batches:
        n = batch.num_rows
        if n == 0:
            continue
        col = batch.column("embedding")
        lens = col.value_lengths().to_numpy(zero_copy_only=False)
        if col.null_count == 0 and (lens == DIM).all():
            x = (
                col.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(n, DIM)
            )
            q = np.floor(x * 1000.0 + 0.5).astype(np.int64)
            pmat = q.T @ q
            s = q.sum(axis=0)
            cnt = n
        else:
            # ragged/null fallback (out-of-contract corpora; the op's
            # isNotNull filter already dropped NULL rows): element_at
            # semantics — missing coordinates contribute no cells
            pmat = np.zeros((DIM, DIM), dtype=np.int64)
            s = np.zeros(DIM, dtype=np.int64)
            cnt = 0
            for emb in col.to_pylist():
                if emb is None:
                    continue
                cnt += 1
                d = min(len(emb), DIM)
                qv = np.floor(
                    np.asarray(emb[:d], dtype=np.float64) * 1000.0 + 0.5
                ).astype(np.int64)
                pmat[:d, :d] += np.outer(qv, qv)
                s[:d] += qv
        pp = np.concatenate(([cnt], s, pmat[iu, ju])).astype(np.int64)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ii, type=pa.int32()),
                pa.array(jj, type=pa.int32()),
                pa.array(pp, type=pa.int64()),
            ],
            names=["i", "j", "p"],
        )


@query(
    "op_embedding_covariance",
    oracle="""
        WITH q AS (
          SELECT list_transform(
                   embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                             AS BIGINT)) AS qv
          FROM embeddings WHERE embedding IS NOT NULL
        ),
        pairs AS (
          SELECT a.i AS i, b.j AS j, SUM(qv[a.i] * qv[b.j]) AS s
          FROM q,
               LATERAL (SELECT unnest(generate_series(1, 64)) AS i) a,
               LATERAL (SELECT unnest(generate_series(1, 64)) AS j) b
          WHERE b.j >= a.i
          GROUP BY 1, 2
        ),
        sums AS (
          SELECT u.i AS i, SUM(qv[u.i]) AS s1
          FROM q,
               LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
          GROUP BY 1
        ),
        n AS (SELECT COUNT(*) AS c FROM q)
        SELECT p.i - 1 AS i, p.j - 1 AS j,
               CAST(n.c * p.s - sa.s1 * sb.s1 AS BIGINT) AS cov_num_fp
        FROM pairs p
        JOIN sums sa ON sa.i = p.i
        JOIN sums sb ON sb.i = p.j
        CROSS JOIN n
    """,
    notes="Upper-triangular covariance numerator matrix "
    "(n*sum(x_i*x_j) - sum(x_i)*sum(x_j), exact 1e3-fixed-point "
    "integers) of the 64-dim embedding corpus — the PCA/whitening "
    "input, computed the RowMatrix-Gramian way in ONE corpus scan "
    "with ONE exchange (plan-asserted): each Arrow batch reduces to "
    "its d(d+1)/2 upper-triangle co-moments (one exact int64 Q^T Q "
    "matmul) PLUS d per-dim-sum sentinel cells (j=-1) and one "
    "row-count sentinel (i=j=-1) — all three statistics share the "
    "same groupBy(i,j), so map-side combine reduces every partition "
    "to <=2145 rows before the shuffle, whether the corpus is 500 "
    "vectors or 10^11. The 65 sentinel aggregates (n and the 64 "
    "sums) are pulled to the driver — metadata, not data — and "
    "applied to the 2080 pair cells as a literal map, so no join and "
    "no second scan exists anywhere in the plan. The oracle "
    "recomputes via DuckDB lateral index cross products; the "
    "integer-exact statistic makes a bitwise cross-engine match "
    "possible where float covariance never is. Output: 2080 (i<=j) "
    "cells.",
    tags=("similarity", "agg", "scale"),
)
def op_embedding_covariance(
    spark: SparkSession, sf_dir: str, _materialize: bool = True
) -> DataFrame:
    """Exact fixed-point covariance numerators for all 64x64 (i<=j)
    embedding coordinate pairs — one scan, one exchange.

    ``_materialize=False`` returns the lazy pipeline (the cached agg is
    NOT released — the caller owns the cache lifetime); used by plan
    tests that must inspect the pre-checkpoint physical plan."""
    # NULL embeddings carry no coordinates — excluded, per the
    # vector-op null contract (dirty-corpus audit, r11-restart)
    em = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    agg = (
        em.select("embedding")
        .mapInArrow(_cov_partial_batches, "i int, j int, p bigint")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("s"))
        .persist()
    )
    def build() -> DataFrame:
        # 65 sentinel rows to the driver: n and per-dim sums (metadata)
        head = agg.filter((F.col("i") == -1) & (F.col("j") == -1)).first()
        if head is None:
            # zero vectors -> zero sentinel rows AND zero pair cells;
            # the j>=0 filter below is already empty, but create_map()
            # with no entries types as map<void,void> and fails
            # analysis — return the empty frame with the op's schema
            # directly (empty-corpus audit, r11-restart)
            return agg.filter(F.col("j") >= 0).select(
                "i", "j", F.lit(None).cast("bigint").alias("cov_num_fp")
            )
        n = int(head["s"])
        sums = {
            r["i"]: int(r["s"])
            for r in agg.filter(
                (F.col("j") == -1) & (F.col("i") >= 0)
            ).collect()
        }
        sum_map = F.create_map(
            *[F.lit(v) for i in sorted(sums) for v in (i, sums[i])]
        )
        return agg.filter(F.col("j") >= 0).select(
            "i",
            "j",
            (
                # the exchange carries narrow BIGINT partials (r16);
                # the final n*Σxy − Σx*Σy combine is widened back to
                # decimal so the headroom of the old decimal-fed path
                # is preserved verbatim
                F.lit(n).cast("decimal(28,0)")
                * F.col("s").cast("decimal(28,0)")
                - sum_map[F.col("i")].cast("decimal(28,0)")
                * sum_map[F.col("j")].cast("decimal(28,0)")
            )
            .cast("bigint")
            .alias("cov_num_fp"),
        )

    if not _materialize:
        return build()
    try:
        # <= d(d+1)/2 = 2080 cells: eagerly materialize (truncating the
        # lineage off the cached agg) so the cache can be released even
        # though the caller consumes the result lazily — repeated calls
        # within a session must not accumulate cached partitions
        return build().localCheckpoint(eager=True)
    finally:
        agg.unpersist()


#: Power-iteration fixed-point scale. 2^18 keeps every intermediate
#: provably inside int64 (bounds at each step in principal_axes).
_PI_B = 1 << 18
#: Fixed iteration count — convergence factor (λ_{c+1}/λ_c)^96; on the
#: near-isotropic fixture spectrum the axes still capture ≥98% of the
#: optimal Rayleigh quotient (pinned in tests/test_linalg_content.py).
_PI_ITERS = 96


def _tdiv_vec(w, d):
    """Elementwise truncate-toward-zero division (the shared Spark
    ``div`` / DuckDB ``//`` semantic — see _tdiv) on an int64 array."""
    import numpy as np

    return np.sign(w) * (np.abs(w) // d)


def principal_axes(cells, k: int = 2) -> list[list[int]]:
    """Driver-side top-k axes of the d x d covariance-numerator matrix
    (a METADATA-sized object — d², not corpus-sized; the numerator
    n·Σxy − Σx·Σy shares eigenvectors with the covariance), via
    DETERMINISTIC fixed-point power iteration with integer Gram-Schmidt
    deflation. Returns unit axes quantized to 1e6 fixed-point ints,
    sign-normalized so the largest-magnitude component is positive
    (first index wins magnitude ties).

    Why not np.linalg.eigh (the r5–r13 implementation): eigh's output
    is LAPACK-build-dependent in the degenerate/near-degenerate case,
    so the eigensolve was the one float step that kept op_pca_project
    rows-only. The integer iteration is bit-reproducible on ANY
    engine with int64 truncating division — DuckDB replays it as a
    recursive CTE (op_pca_project's oracle below), the same unrolled-
    replay technique as the r13 BPE / r14 unigram oracle upgrades.
    The numerator matrix is PSD (n²·sample-covariance of integer
    vectors), so the dominant eigenvalue is the top one — power
    iteration needs no shifting.

    Exactness/overflow argument for the k=2 contract (B = 2^18,
    d = 64 = 2^6; int64 holds ±2^63; numpy int64 matmul is safe
    because integer sums are exact and order-independent):
      * Ms = M // max(1, maxabs(M)//B)        →  |Ms| ≤ 2B = 2^19
      * pc1 never deflates, so the stored a1 is post-normalize only
        →  |a1| ≤ 2B = 2^19
      * normalize: vn = w // max(1, maxabs(w)//B)  →  |vn| ≤ 2^19
      * deflation dots (both vectors ≤ 2^19):
        |dva|,|daa| ≤ 2^6·2^19·2^19 = 2^44; dva·B ≤ 2^62  ✓
      * coef = (dva·B)//daa ≤ ‖vn‖·B/‖a1‖ (Cauchy–Schwarz), so the
        subtracted term (coef·a1_i)//B ≤ ‖vn‖ ≤ 2^3·2^19 = 2^22
        →  post-deflation |v| ≤ 2^19 + 2^22 < 2^23
      * next matvec: |w| ≤ 2^6·2^19·2^23 = 2^48  ✓
      * norm2 = Σv² ≤ 2^6·2^46 = 2^52 < 2^53 — exactly representable
        as a double, as is x·1e6 with |x| ≤ 2^23.
    k > 2 would need a fresh bound (later raw axes are ≤ 2^23, not
    2^19); the runtime assert below fails loudly long before any
    wraparound if the contract is ever widened.
    The final unit quantization is the one float step — x·1e6/√(Σx²)
    with x ≤ 2^23 (the post-deflation bound above) and Σx² ≤ 2^52 both
    exactly representable, and *, /,
    sqrt, +0.5, floor all IEEE-correctly-rounded — so it is the SAME
    bits on every IEEE-754 engine, Python and DuckDB included."""
    import numpy as np

    m = np.zeros((DIM, DIM), dtype=np.int64)
    for r in cells:
        m[r["i"], r["j"]] = m[r["j"], r["i"]] = r["cov_num_fp"]
    mx = int(np.abs(m).max()) if cells else 0
    out: list[list[int]] = []
    if mx == 0:
        # zero matrix (empty or single-vector corpus): canonical basis
        # axes e_c — the same rule the oracle's CASE mx=0 branch takes
        for c in range(k):
            e = [0] * DIM
            e[c] = 1_000_000
            out.append(e)
        return out
    ms = _tdiv_vec(m, max(1, mx // _PI_B))
    raw_prev: list = []
    for c in range(k):
        v = np.full(DIM, _PI_B, dtype=np.int64)
        for _ in range(_PI_ITERS):
            w = ms @ v
            mw = int(np.abs(w).max())
            if mw == 0:
                v = w
                break
            v = _tdiv_vec(w, max(1, mw // _PI_B))
            for a in raw_prev:
                daa = int(a @ a)
                dva = int(v @ a)
                coef = _tdiv(dva * _PI_B, max(1, daa))
                v = v - _tdiv_vec(coef * a, _PI_B)
            assert int(np.abs(v).max()) < 1 << 62
        norm2 = int(v @ v)
        if norm2 == 0:
            v = np.zeros(DIM, dtype=np.int64)
            v[c] = _PI_B
            norm2 = _PI_B * _PI_B
        raw_prev.append(v)
        nrm = math.sqrt(float(norm2))
        u = [math.floor(float(x) * 1000000.0 / nrm + 0.5) for x in v]
        mabs = max(abs(x) for x in u)
        j = next(i for i in range(DIM) if abs(u[i]) == mabs)
        if u[j] < 0:
            u = [-x for x in u]
        out.append(u)
    return out


def _let(value_expr: str, var: str, body: str) -> str:
    """DuckDB let-binding: evaluate value_expr once, bind it as ``var``
    inside ``body`` via the single-element-list lambda trick
    (list_transform([v], var -> body)[1]). Needed because DuckDB 1.0
    lambdas cannot capture columns across a LATERAL boundary, so the
    power-iteration step below is one expression, not a lateral
    chain."""
    return f"list_transform([{value_expr}], {var} -> {body})[1]"


def _pca_iter_cte(name: str, prev_axis_cte: str | None) -> str:
    """One recursive power-iteration CTE over the scaled matrix CTE
    ``msc`` — the SQL replica of one ``principal_axes`` component
    loop. State row: (t, v bigint[64]). The deflation for pc2 joins
    the finished pc1 raw axis (``prev_axis_cte``)."""
    d, b, t = DIM, _PI_B, _PI_ITERS
    matvec = (
        f"list_transform(range(1,{d + 1}), i -> CAST(list_sum("
        f"list_transform(range(1,{d + 1}), j -> ms[i][j]*v[j])) AS BIGINT))"
    )
    norm = _let(
        matvec,
        "w",
        _let(
            "list_max(list_transform(w, x -> abs(x)))",
            "mw",
            f"CASE WHEN mw = 0 THEN w ELSE "
            f"list_transform(w, x -> x // GREATEST(1, mw // {b})) END",
        ),
    )
    if prev_axis_cte is None:
        vout, join = norm, ""
    else:
        coef = (
            f"CAST(list_sum(list_transform(range(1,{d + 1}), "
            f"p -> vn[p]*ax.av[p])) AS BIGINT) * {b} // GREATEST(1, "
            f"CAST(list_sum(list_transform(ax.av, x -> x*x)) AS BIGINT))"
        )
        vout = _let(
            norm,
            "vn",
            _let(
                coef,
                "coef",
                f"list_transform(range(1,{d + 1}), i -> "
                f"vn[i] - (coef * ax.av[i] // {b}))",
            ),
        )
        join = f", (SELECT v AS av FROM {prev_axis_cte}) ax"
    return f"""
        {name} AS (
          SELECT 0 AS t,
                 list_transform(range({d}), x -> CAST({b} AS BIGINT)) AS v
          UNION ALL
          SELECT t + 1, {vout}
          FROM {name}, msc{join}
          WHERE t < {t} AND ms IS NOT NULL
        )"""


def _pca_axis_ctes(c: int, it: str, raw: str, unit: str) -> str:
    """Raw-axis + unit-axis CTE pair for component ``c``: pick the
    final iteration row, substitute the canonical e_c raw axis if the
    iteration collapsed to zero (norm2 = 0), then unit-quantize to 1e6
    and sign-normalize (largest-|.|-component positive, first index on
    ties) — each step the literal SQL spelling of the principal_axes
    lines it replays."""
    d, b = DIM, _PI_B
    e_raw = "[" + ",".join(
        f"{b}::BIGINT" if i == c else "0::BIGINT" for i in range(d)
    ) + "]"
    e_unit = "[" + ",".join(
        "1000000::BIGINT" if i == c else "0::BIGINT" for i in range(d)
    ) + "]"
    quant = (
        "list_transform(r.v, x -> CAST(FLOOR("
        "CAST(x AS DOUBLE) * 1000000.0 / "
        "SQRT(CAST(CAST(list_sum(list_transform(r.v, y -> y*y)) "
        "AS BIGINT) AS DOUBLE)) + 0.5) AS BIGINT))"
    )
    signfix = _let(
        quant,
        "u",
        "CASE WHEN u[list_position(list_transform(u, x -> abs(x)), "
        "list_max(list_transform(u, x -> abs(x))))] < 0 "
        "THEN list_transform(u, x -> -x) ELSE u END",
    )
    return f"""
        {raw} AS MATERIALIZED (
          SELECT CASE WHEN n2 = 0 THEN {e_raw} ELSE v END AS v
          FROM (SELECT v, CAST(list_sum(list_transform(v, x -> x*x))
                            AS BIGINT) AS n2
                FROM {it} ORDER BY t DESC LIMIT 1)
        ),
        {unit} AS MATERIALIZED (
          SELECT CASE WHEN (SELECT mx FROM msc) = 0 THEN {e_unit}
                 ELSE {signfix} END AS u
          FROM {raw} r
        )"""


def _pca_oracle_sql() -> str:
    """The full op_pca_project oracle: covariance numerators (the
    op_embedding_covariance oracle verbatim) → matrix assembly →
    2 recursive power-iteration CTEs → projection. MATERIALIZED on
    every data-derived CTE is load-bearing: DuckDB inlines plain CTEs
    into each recursive iteration, which re-evaluates the O(n·d²)
    covariance ~192× (measured 21 min at sf0.01 vs 0.3 s
    materialized)."""
    d, b = DIM, _PI_B
    proj = (
        f"CAST(list_sum(list_transform(range(1,{d + 1}), i -> "
        f"CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000 + 0.5) "
        f"AS BIGINT) * x.{{ax}}[i])) AS BIGINT)"
    )
    return f"""
        WITH RECURSIVE q AS MATERIALIZED (
          SELECT list_transform(
                   embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                             AS BIGINT)) AS qv
          FROM embeddings WHERE embedding IS NOT NULL
        ),
        pairs AS MATERIALIZED (
          SELECT a.i AS i, b.j AS j, SUM(qv[a.i] * qv[b.j]) AS s
          FROM q,
               LATERAL (SELECT unnest(generate_series(1, {d})) AS i) a,
               LATERAL (SELECT unnest(generate_series(1, {d})) AS j) b
          WHERE b.j >= a.i
          GROUP BY 1, 2
        ),
        sums AS MATERIALIZED (
          SELECT u.i AS i, SUM(qv[u.i]) AS s1
          FROM q,
               LATERAL (SELECT unnest(generate_series(1, {d})) AS i) u
          GROUP BY 1
        ),
        nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM q),
        cells AS MATERIALIZED (
          SELECT p.i AS i, p.j AS j,
                 CAST(n.c * p.s - sa.s1 * sb.s1 AS BIGINT) AS m
          FROM pairs p
          JOIN sums sa ON sa.i = p.i
          JOIN sums sb ON sb.i = p.j
          CROSS JOIN nn n
        ),
        sym AS MATERIALIZED (
          SELECT i, j, m FROM cells
          UNION ALL
          SELECT j AS i, i AS j, m FROM cells WHERE i <> j
        ),
        mm AS MATERIALIZED (
          SELECT CASE WHEN COUNT(*) = 0 THEN NULL
                 ELSE list(r ORDER BY i) END AS m,
                 CASE WHEN COUNT(*) = 0 THEN 0 ELSE MAX(rmax) END AS mx
          FROM (SELECT i, list(m ORDER BY j) AS r, MAX(ABS(m)) AS rmax
                FROM sym GROUP BY i)
        ),
        msc AS MATERIALIZED (
          SELECT CASE WHEN mx = 0 THEN NULL ELSE
            list_transform(m, r -> list_transform(
              r, x -> x // GREATEST(1, mx // {b})))
          END AS ms, mx FROM mm
        ),{_pca_iter_cte("it1", None)},{_pca_axis_ctes(0, "it1", "a1raw", "a1unit")},{_pca_iter_cte("it2", "a1raw")},{_pca_axis_ctes(1, "it2", "a2raw", "a2unit")},
        axes AS (
          SELECT a1unit.u AS a1u, a2unit.u AS a2u FROM a1unit, a2unit
        )
        SELECT e.vec_id, e.label,
               CASE WHEN e.embedding IS NULL THEN NULL
                    ELSE {proj.format(ax="a1u")} END AS pc1_fp,
               CASE WHEN e.embedding IS NULL THEN NULL
                    ELSE {proj.format(ax="a2u")} END AS pc2_fp
        FROM embeddings e CROSS JOIN axes x
    """


@query(
    "op_pca_project",
    oracle=_pca_oracle_sql(),
    notes="PCA projection — the capstone of the linalg module: the "
    "single-scan covariance op produces the d x d matrix, "
    "principal_axes() reduces it ON THE DRIVER (d x d is metadata; "
    "O(d^2) driver math per iteration is how MLlib's own PCA treats "
    "the Gramian), and the projection onto the top-2 axes runs "
    "distributed as a JVM zip_with/aggregate integer dot product — "
    "quantized vector (1e3) x quantized axis (1e6), exact bigint "
    "arithmetic, no Python per row, no shuffle at all in the "
    "projection stage (a pure map). FULL oracle since r14 (was "
    "rows-only r5-r13 while the eigensolve was LAPACK eigh): the "
    "driver math is now deterministic fixed-point power iteration "
    "with integer deflation, which the oracle replays as two "
    "recursive CTEs over the covariance-numerator matrix — the "
    "unrolled-replay technique of the BPE/unigram upgrades. The one "
    "float step (unit quantization x*1e6/sqrt(sum x^2)) uses only "
    "IEEE-correctly-rounded ops on <=2^53 integers, so it is "
    "bit-identical across engines; everything else is int64 with "
    "truncate-toward-zero division (Spark div / DuckDB // / _tdiv). "
    "Axis quality vs eigh is pinned in tests/test_linalg_content.py "
    "(Rayleigh quotient >= 0.97 of optimal on the fixture; exact "
    "axis recovery on a clear-gap spectrum).",
    tags=("similarity", "scale"),
)
def op_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project embeddings onto the corpus' top-2 principal axes;
    exact fixed-point projections."""
    cells = op_embedding_covariance(spark, sf_dir).collect()
    axes = principal_axes(cells, k=2)
    em = load(spark, sf_dir, "embeddings")
    base = em.select("vec_id", "label", _qv().alias("qv"))
    for c, ax in enumerate(axes):
        lit = F.array(*[F.lit(a).cast("bigint") for a in ax])
        dot = F.aggregate(
            F.zip_with(F.col("qv"), lit, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        base = base.withColumn(f"pc{c + 1}_fp", dot)
    return base.select("vec_id", "label", "pc1_fp", "pc2_fp")


#: k-means configuration: k centers, ITERS assignment+update rounds,
#: then a final assignment that the output aggregates
K_CENTERS = 8
KMEANS_ITERS = 2


def _tdiv(s: int, c: int) -> int:
    """Integer division truncating toward zero — the semantic BOTH
    engines use (Spark ``div``, DuckDB ``//``), unlike Python's
    flooring ``//`` on negatives."""
    q = abs(s) // c
    return q if s >= 0 else -q


def _qv():
    """1e3 fixed-point quantization of the embedding column.

    The element is cast to DOUBLE before the arithmetic — explicitly,
    on BOTH engines: the parquet column is float32, and an engine that
    keeps `x * 1000 + 0.5` in float32 (DuckDB does; Spark promotes)
    floors a handful of edge values differently (2 of 320k at sf0.1 —
    caught by the sf0.1 oracle audit, invisible at sf0.01)."""
    return F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast(
            "bigint"
        ),
    )


#: Past this many centers the assignment defaults to the
#: Arrow-vectorized path (numpy int64 matmul per batch — the same
#: exact integers, MLlib's BLAS shape) instead of the
#: literal-expression form (k structs of zip_with/aggregate per row).
#: r15 A/B (warm end-to-end, one assignment over the 2k-vector
#: fixture): literal 6.7 s at k=8 / 20.8 s at k=31 vs Arrow 1.3 s /
#: 1.4 s — the literal path's cost is DRIVER-side (k·d F.lit py4j
#: calls + analysis + a codegen unit that grows with k), so the Arrow
#: kernel wins at every k and the threshold is now 0. The literal
#: implementation stays as the differential witness
#: (tests/test_linalg_content.py pins literal ≡ arrow on the fixture).
_ARROW_ASSIGN_MIN_K = 0


def kmeans_assignments(
    q: DataFrame,
    k: int = K_CENTERS,
    iters: int = KMEANS_ITERS,
    arrow: bool | None = None,
) -> DataFrame:
    """The deterministic integer Lloyd's loop shared by op_kmeans and
    op_semdedup: init from the k lowest vec_ids, ``iters`` assignment+
    update rounds, return the FINAL assignment
    ``(vec_id, qv, cid, dist)``. ``q`` must be a (cached) frame of
    ``(vec_id, qv)``. Per round: assignment is a zero-shuffle map;
    the update collects k*d partial rows (metadata); the driver
    carries centers only.

    Assignment has two equivalent implementations, both exact int64:
    literal center expressions in whole-stage codegen (unbeatable for
    the oracle-checked k=8, but O(k*d) expression nodes), and an
    Arrow-batched numpy path (``(Q²).1 - 2Q@Cᵀ + (C²).1`` with int64
    matmul, argmin = first minimum = lowest cid — identical tiebreak)
    that scales to the hundreds-of-centers regime SemDeDup needs at
    corpus size. ``arrow=None`` picks by k; a forced value is for the
    equivalence test."""
    centers = [
        list(r["qv"]) for r in q.orderBy("vec_id").limit(k).collect()
    ]
    # a corpus with fewer than k vectors seeds fewer centers; clamp
    # instead of letting the M-step's centers[j] raise IndexError
    # (r7 advice — reachable via op_kmeans/op_semdedup on tiny frames)
    if not centers:
        # k-means of an empty relation is an empty assignment, not an
        # error: at scale an upstream filter legitimately empties the
        # corpus, and every caller (groupBy, pair join) degrades
        # correctly from zero rows (empty-corpus audit, r11-restart)
        return q.select(
            "vec_id",
            "qv",
            F.lit(None).cast("int").alias("cid"),
            F.lit(None).cast("bigint").alias("dist"),
        )
    k = min(k, len(centers))
    use_arrow = (k >= _ARROW_ASSIGN_MIN_K) if arrow is None else arrow

    def assigned_literal() -> DataFrame:
        cands = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col("qv"),
                            F.array(
                                *[F.lit(v).cast("bigint") for v in c]
                            ),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    F.lit(j).cast("int").alias("cid"),
                )
                for j, c in enumerate(centers)
            ]
        )
        # struct ordering is field-by-field: min = (nearest, then
        # lowest center id) — the deterministic argmin
        m = F.array_min(cands)
        return q.select(
            "vec_id",
            "qv",
            m["cid"].alias("cid"),
            m["dist"].alias("dist"),
        )

    def assigned_arrow() -> DataFrame:
        import numpy as np

        C = np.asarray(centers, dtype=np.int64)
        c2 = (C * C).sum(axis=1)

        def assign(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    # empty partition: .tolist() gives a 1-D empty
                    # array the matmul below would reject (the KMV
                    # empty-partition crash class)
                    yield pdf.assign(
                        cid=np.array([], dtype="int32"),
                        dist=np.array([], dtype="int64"),
                    )
                    continue
                Q = np.asarray(pdf["qv"].tolist(), dtype=np.int64)
                # exact int64: entries bounded by d*max|q|² « 2^63
                d2 = (
                    (Q * Q).sum(axis=1)[:, None]
                    - 2 * (Q @ C.T)
                    + c2[None, :]
                )
                cid = d2.argmin(axis=1)  # first min = lowest cid
                pdf = pdf.assign(
                    cid=cid.astype("int32"),
                    dist=d2[np.arange(len(cid)), cid],
                )
                yield pdf

        return q.mapInPandas(
            assign,
            schema="vec_id bigint, qv array<bigint>, cid int, dist bigint",
        )

    assigned = assigned_arrow if use_arrow else assigned_literal

    for _ in range(iters):
        a = assigned().select("vec_id", "qv", "cid")
        stats = (
            a.select("cid", F.posexplode("qv").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(F.sum("x").alias("s"), F.count("*").alias("c"))
            .collect()
        )
        new = {}
        for r in stats:
            new.setdefault(r["cid"], [0] * DIM)[r["dim"]] = _tdiv(
                int(r["s"]), int(r["c"])
            )
        # an emptied cluster keeps its previous center
        centers[:] = [new.get(j, centers[j]) for j in range(k)]
    return assigned()



#: Shared DuckDB CTE chain replicating the deterministic integer
#: k-means loop (init c0 from the k lowest vec_ids, 2 assignment+
#: update rounds, final assignment a2) — used by both op_kmeans and
#: op_semdedup oracles. The chain is k-agnostic everywhere except the
#: c0 seed's LIMIT, so ``{k_sql}`` parameterizes k: op_kmeans pins the
#: literal K_CENTERS; op_semdedup substitutes a GREATEST() expression
#: that recomputes its ADAPTIVE k (max(K_CENTERS, n/64)) inside DuckDB
#: itself, so the oracle tracks the op across every scale instead of
#: silently describing only the fixture regime (the r12 verdict's
#: permanent-257/1 sf0.1 audit failure).
_KMEANS_CTES_TPL = """
        WITH q AS (
          SELECT vec_id,
                 list_transform(
                   embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                             AS BIGINT)) AS qv
          FROM embeddings WHERE embedding IS NOT NULL
        ),
        c0 AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                   AS cid,
                 qv AS cv
          FROM (SELECT * FROM q ORDER BY vec_id LIMIT {k_sql})
        ),
        a0 AS (
          SELECT vec_id, cid, dist FROM (
            SELECT vec_id, cid, dist,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM (
              SELECT q.vec_id, c.cid,
                     CAST(list_sum(list_transform(
                       generate_series(1, 64),
                       i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))
                       AS BIGINT) AS dist
              FROM q CROSS JOIN c0 c)
          ) WHERE rn = 1
        ),
        c1n AS (
          SELECT cid, list(CAST(m AS BIGINT) ORDER BY dim) AS cv FROM (
            SELECT a.cid, u.i AS dim,
                   SUM(q.qv[u.i]) // COUNT(*) AS m
            FROM a0 a JOIN q USING (vec_id),
                 LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
            GROUP BY a.cid, u.i
          ) GROUP BY cid
        ),
        -- a cid emptied by the assignment keeps its PREVIOUS center
        -- (mirrors the Spark side's new.get(j, centers[j]); c0 always
        -- carries all 8 cids, so it doubles as the spine)
        c1 AS (
          SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
          FROM c0 p LEFT JOIN c1n n USING (cid)
        ),
        a1 AS (
          SELECT vec_id, cid, dist FROM (
            SELECT vec_id, cid, dist,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM (
              SELECT q.vec_id, c.cid,
                     CAST(list_sum(list_transform(
                       generate_series(1, 64),
                       i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))
                       AS BIGINT) AS dist
              FROM q CROSS JOIN c1 c)
          ) WHERE rn = 1
        ),
        c2n AS (
          SELECT cid, list(CAST(m AS BIGINT) ORDER BY dim) AS cv FROM (
            SELECT a.cid, u.i AS dim,
                   SUM(q.qv[u.i]) // COUNT(*) AS m
            FROM a1 a JOIN q USING (vec_id),
                 LATERAL (SELECT unnest(generate_series(1, 64)) AS i) u
            GROUP BY a.cid, u.i
          ) GROUP BY cid
        ),
        c2 AS (
          SELECT p.cid, COALESCE(n.cv, p.cv) AS cv
          FROM c1 p LEFT JOIN c2n n USING (cid)
        ),
        a2 AS (
          SELECT vec_id, cid, dist FROM (
            SELECT vec_id, cid, dist,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM (
              SELECT q.vec_id, c.cid,
                     CAST(list_sum(list_transform(
                       generate_series(1, 64),
                       i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])))
                       AS BIGINT) AS dist
              FROM q CROSS JOIN c2 c)
          ) WHERE rn = 1
        )
"""

#: op_kmeans runs the fixed k = K_CENTERS loop at every scale.
_KMEANS_CTES = _KMEANS_CTES_TPL.format(k_sql=K_CENTERS)

#: op_semdedup's adaptive k, spelled in DuckDB: GREATEST mirrors
#: Python's max(); both engines' ``//`` truncate identically on the
#: non-negative COUNT(*). q is the same NULL-filtered relation the op
#: counts, so the two sides always derive the same k — guarded by
#: tests/test_linalg_content.py::test_semdedup_oracle_k_tracks_op.
_ADAPTIVE_K_SQL = f"GREATEST({K_CENTERS}, (SELECT COUNT(*) FROM q) // 64)"
_KMEANS_CTES_ADAPTIVE = _KMEANS_CTES_TPL.format(k_sql=_ADAPTIVE_K_SQL)


@query(
    "op_kmeans",
    oracle=_KMEANS_CTES
    + """
        SELECT cid AS center_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(dist) AS BIGINT) AS inertia
        FROM a2 GROUP BY cid
    """,
    notes="Distributed Lloyd's k-means, ORACLE-CHECKED — the thing "
    "float k-means can never be across engines: coordinates quantize "
    "to 1e3 fixed-point, distances are exact integer squared-L2, "
    "argmin tiebreaks on center id, and centroid updates use "
    "truncating integer division (the semantic Spark div and DuckDB "
    "// share), so 2 full assignment+update rounds later the "
    "(members, inertia) per center hash-match DuckDB's unrolled-CTE "
    "replica bit-for-bit (same technique as op_pagerank). Spark "
    "side is the MLlib shape: assignment is a ZERO-SHUFFLE map "
    "(k x d centers as literal expressions, JVM zip_with/aggregate "
    "distances, array_min struct argmin); the update is one "
    "map-side-combined groupBy(cid, dim) producing k x d = 512 rows "
    "collected to the driver (metadata, like the IVF centers); the "
    "driver loop carries centers only, never data. Init = the 8 "
    "lowest-vec_id vectors (deterministic; k-means++ would randomize "
    "across engines). Scale: per round, one exchange carrying <=512 "
    "partials per partition.",
    tags=("similarity", "iterative", "scale"),
)
def op_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact 2-round Lloyd's k-means over embeddings; per-
    center membership and inertia."""
    # NULL embeddings carry no coordinates — excluded, per the
    # vector-op null contract (dirty-corpus audit, r11-restart)
    em = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = em.select("vec_id", _qv().alias("qv")).cache()
    try:
        final = kmeans_assignments(q)
        return final.groupBy(F.col("cid").alias("center_id")).agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum("dist").cast("bigint").alias("inertia"),
        )
    finally:
        q.unpersist()


#: SemDeDup redundancy threshold, as an exact rational cos >= 3/10.
#: Production corpora use ~0.9+; the synthetic fixture's max pairwise
#: cosine is 0.51, so the threshold sits where the fixture actually
#: has structure — the integer-exact comparison is the point, not the
#: calibration.
_SEMDEDUP_NUM = 3
_SEMDEDUP_DEN = 10


@query(
    "op_semdedup",
    oracle=_KMEANS_CTES_ADAPTIVE
    + f"""
        , norms AS (
          SELECT vec_id,
                 CAST(list_sum(list_transform(
                   generate_series(1, 64),
                   i -> qv[i] * qv[i])) AS BIGINT) AS n2
          FROM q
        ),
        pairs AS (
          SELECT a.cid,
                 CASE WHEN a.dist > b.dist
                        OR (a.dist = b.dist AND a.vec_id > b.vec_id)
                      THEN a.vec_id ELSE b.vec_id END AS dup_id
          FROM a2 a
          JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
          JOIN q qa ON qa.vec_id = a.vec_id
          JOIN q qb ON qb.vec_id = b.vec_id
          JOIN norms na ON na.vec_id = a.vec_id
          JOIN norms nb ON nb.vec_id = b.vec_id
          WHERE CAST(list_sum(list_transform(
                  generate_series(1, 64),
                  i -> qa.qv[i] * qb.qv[i])) AS BIGINT) > 0
            AND {_SEMDEDUP_DEN ** 2} * CAST(list_sum(list_transform(
                  generate_series(1, 64),
                  i -> qa.qv[i] * qb.qv[i])) AS BIGINT)
                    * CAST(list_sum(list_transform(
                  generate_series(1, 64),
                  i -> qa.qv[i] * qb.qv[i])) AS BIGINT)
                >= {_SEMDEDUP_NUM ** 2} * na.n2 * nb.n2
        ),
        dups AS (
          SELECT cid, COUNT(DISTINCT dup_id) AS n_dups FROM pairs
          GROUP BY cid
        )
        SELECT m.cid AS center_id,
               CAST(m.n_members AS BIGINT) AS n_members,
               CAST(COALESCE(d.n_dups, 0) AS BIGINT) AS n_dups,
               CAST(m.n_members - COALESCE(d.n_dups, 0) AS BIGINT)
                 AS n_keep
        FROM (SELECT cid, COUNT(*) AS n_members FROM a2 GROUP BY cid) m
        LEFT JOIN dups d ON d.cid = m.cid
    """,
    notes="SemDeDup (Abbas et al. 2023) — semantic dedup via cluster-"
    "local pruning, FULLY ORACLE-CHECKED: k-means the embeddings "
    "(the shared deterministic integer Lloyd's loop), then inside "
    "each cluster mark the centroid-FARTHER member of every pair "
    "whose cosine clears the threshold (ties on distance break by "
    "vec_id); survivors are the per-cluster keep set. The all-pairs "
    "step is confined to clusters — Sigma|cluster|^2, never n^2 — and "
    "at 100 TB k grows with n so cluster size stays bounded: the "
    "exact trade the paper makes. Cosine threshold compares as pure "
    "integers (100*dot^2 >= 9*na*nb AND dot > 0 == cos >= 0.3 "
    "exactly), so no float drift anywhere: the kmeans CTE, the pair "
    "predicate, and the keep counts all hash-match DuckDB. Spark "
    "plan: assignment is the zero-shuffle kmeans map; the pair join "
    "exchanges on cid (k keys — cardinality scales WITH k at scale); "
    "output is k rows.",
    tags=("similarity", "dedup", "iterative", "scale"),
)
def op_semdedup(
    spark: SparkSession,
    sf_dir: str,
    _materialize: bool = True,
    _k: int | None = None,
) -> DataFrame:
    """Cluster-then-prune semantic dedup; per-cluster keep/dup counts.

    ``_materialize=False`` returns the lazy pipeline so plan tests can
    inspect the pair-join exchanges (the eager localCheckpoint that
    releases the input cache otherwise hides them — the standard
    escape hatch, see op_duplicate_ngram_spans)."""
    # NULL embeddings carry no coordinates — excluded, per the
    # vector-op null contract (dirty-corpus audit, r11-restart)
    em = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = em.select("vec_id", _qv().alias("qv"))
    if _materialize:
        # lazy path skips the cache: the Lloyd's-loop collects would
        # populate it and the caller has no handle to release it (the
        # r6-advice orphaned-cache leak, same fix as the text ops)
        q = q.cache()
    try:
        if _k is None:
            # SemDeDup's scale contract: k grows with n so cluster
            # size (and the quadratic pair stage) stays bounded.
            # Target ~64 vectors per cluster. The oracle recomputes
            # THIS formula in SQL (_ADAPTIVE_K_SQL), so the audit is
            # green at every sf, not just the fixture regime —
            # equivalence of the two spellings is pinned by
            # tests/test_linalg_content.py::test_semdedup_oracle_k_tracks_op.
            # Measured at sf1 (50k vectors): k=8 runs 95 s (pair
            # blow-up), adaptive k=781 with the Arrow assignment ~8 s.
            _k = max(K_CENTERS, q.count() // 64)
        a = kmeans_assignments(q, k=_k)
        n2 = F.aggregate(
            F.zip_with("qv", "qv", lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        side = a.withColumn("n2", n2)
        left = side.select(
            F.col("cid"),
            F.col("vec_id").alias("va"),
            F.col("qv").alias("qa"),
            F.col("dist").alias("da"),
            F.col("n2").alias("na"),
        )
        right = side.select(
            F.col("cid"),
            F.col("vec_id").alias("vb"),
            F.col("qv").alias("qb"),
            F.col("dist").alias("db"),
            F.col("n2").alias("nb"),
        )
        dot = F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        pairs = (
            left.join(right, ["cid"])
            .filter(F.col("va") < F.col("vb"))
            .withColumn("dot", dot)
            .filter(
                (F.col("dot") > 0)
                & (
                    F.lit(_SEMDEDUP_DEN**2) * F.col("dot") * F.col("dot")
                    >= F.lit(_SEMDEDUP_NUM**2) * F.col("na") * F.col("nb")
                )
            )
            .select(
                "cid",
                F.when(
                    (F.col("da") > F.col("db"))
                    | (
                        (F.col("da") == F.col("db"))
                        & (F.col("va") > F.col("vb"))
                    ),
                    F.col("va"),
                )
                .otherwise(F.col("vb"))
                .alias("dup_id"),
            )
        )
        dups = pairs.groupBy("cid").agg(
            F.countDistinct("dup_id").alias("n_dups")
        )
        members = a.groupBy("cid").agg(F.count("*").alias("n_members"))
        out = (
            members.join(dups, "cid", "left")
            .na.fill(0, ["n_dups"])
            .select(
                F.col("cid").alias("center_id"),
                F.col("n_members").cast("bigint"),
                F.col("n_dups").cast("bigint"),
                (F.col("n_members") - F.col("n_dups"))
                .cast("bigint")
                .alias("n_keep"),
            )
        )
        return out.localCheckpoint(eager=True) if _materialize else out
    finally:
        if _materialize:
            q.unpersist()


#: greedy k-center (Gonzalez) — small fixed k so the oracle's unrolled
#: CTE chain stays readable; the Spark loop itself takes any k.
K_CORESET = 4

_KC_DIST = """CAST(list_sum(list_transform(
                       generate_series(1, 64),
                       i -> (d.qv[i] - s.qv[i]) * (d.qv[i] - s.qv[i])))
                       AS BIGINT)"""


@query(
    "op_kcenter_coreset",
    oracle=f"""
        WITH q AS (
          SELECT vec_id,
                 list_transform(
                   embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                             AS BIGINT)) AS qv
          FROM embeddings WHERE embedding IS NOT NULL
        ),
        s1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
        d1 AS (
          SELECT d.vec_id, d.qv, {_KC_DIST} AS d2
          FROM q d CROSS JOIN s1 s
        ),
        s2 AS (SELECT vec_id, qv, d2 FROM d1
               ORDER BY d2 DESC, vec_id LIMIT 1),
        d2t AS (
          SELECT d.vec_id, d.qv, LEAST(d.d2, {_KC_DIST}) AS d2
          FROM d1 d CROSS JOIN s2 s
        ),
        s3 AS (SELECT vec_id, qv, d2 FROM d2t
               ORDER BY d2 DESC, vec_id LIMIT 1),
        d3t AS (
          SELECT d.vec_id, d.qv, LEAST(d.d2, {_KC_DIST}) AS d2
          FROM d2t d CROSS JOIN s3 s
        ),
        s4 AS (SELECT vec_id, qv, d2 FROM d3t
               ORDER BY d2 DESC, vec_id LIMIT 1),
        d4t AS (
          SELECT LEAST(d.d2, {_KC_DIST}) AS d2
          FROM d3t d CROSS JOIN s4 s
        )
        SELECT 1 AS sel_round, vec_id, CAST(0 AS BIGINT) AS d2 FROM s1
        UNION ALL SELECT 2, vec_id, d2 FROM s2
        UNION ALL SELECT 3, vec_id, d2 FROM s3
        UNION ALL SELECT 4, vec_id, d2 FROM s4
        UNION ALL SELECT 5, CAST(NULL AS BIGINT),
                   (SELECT MAX(d2) FROM d4t)
    """,
    notes="Greedy k-center coreset selection (Gonzalez 2-approx) — "
    "the DIVERSITY-sampling tier of training-data selection: where "
    "op_semdedup removes near-duplicates, k-center picks the k "
    "mutually-farthest exemplars (facility-location coresets, active-"
    "learning seed sets). Exact integer arithmetic on the shared 1e3 "
    "fixed-point quantization; ties broken (max distance, lowest "
    "vec_id) identically in both engines. Rows 1..k are the selected "
    "centers with their selection distance; row k+1 is the COVERAGE "
    "RADIUS (max over the corpus of min-distance to the selected "
    "set) — the k-center objective value. Scale shape: k rounds, "
    "each ONE corpus map (min-distance vs k literal centers, whole-"
    "stage codegen) + a top-1 TakeOrderedAndProject; the only "
    "driver-side data is the k selected vectors. At large k the "
    "assignment would switch to an Arrow matmul kernel like "
    "kmeans_assignments' (whose Arrow path is now the default at "
    "every k — r15; kcenter's own LEAST-chain keeps literals at its "
    "small fixed k); a 100 TB run batches rounds by over-selecting "
    "per pass, which changes the approximation constant, not the "
    "plan shape.",
    tags=("similarity", "sampling", "scale"),
)
def op_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gonzalez greedy k-center over quantized embeddings: k selected
    exemplars + the final coverage radius."""
    # NULL embeddings carry no coordinates — excluded, per the
    # vector-op null contract (dirty-corpus audit, r11-restart)
    em = load(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    q = em.select("vec_id", _qv().alias("qv"))

    def dist_to(center: list[int]):
        return F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.array(*[F.lit(v).cast("bigint") for v in center]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )

    def min_dist(centers):
        ds = [dist_to(c[3]) for c in centers]
        return ds[0] if len(ds) == 1 else F.least(*ds)

    seed = q.orderBy("vec_id").limit(1).collect()
    if not seed:  # collect() yields [], not [None], on an empty frame
        # no vectors -> no exemplars and no radius row; an empty
        # coreset with the op's schema, not an error (empty-corpus
        # audit, r11-restart)
        return spark.createDataFrame(
            [], "sel_round int, vec_id bigint, d2 bigint"
        )
    first = seed[0]
    selected = [(1, int(first["vec_id"]), 0, list(first["qv"]))]
    # d2 tracks min distance to the selected set; recomputed as a
    # LEAST chain over literal centers so each round is one stateless
    # corpus map (no growing lineage, no persist needed)
    for rnd in range(2, K_CORESET + 1):
        d2 = min_dist(selected)
        nxt = (
            q.select("vec_id", "qv", d2.alias("d2"))
            .orderBy(F.desc("d2"), F.asc("vec_id"))
            .limit(1)
            .collect()[0]
        )
        selected.append(
            (rnd, int(nxt["vec_id"]), int(nxt["d2"]), list(nxt["qv"]))
        )
    radius = q.select(F.max(min_dist(selected)).alias("r")).collect()[0][
        "r"
    ]
    rows = [(r, v, d) for r, v, d, _ in selected] + [
        (K_CORESET + 1, None, int(radius))
    ]
    return spark.createDataFrame(
        rows, "sel_round int, vec_id bigint, d2 bigint"
    )
