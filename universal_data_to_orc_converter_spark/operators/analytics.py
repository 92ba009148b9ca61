"""Product-analytics / retrieval-fusion composites — §2 extensions.

Two shapes every analytics-on-Spark deployment ends up writing:
reciprocal-rank fusion (combining heterogeneous retrieval signals —
the standard hybrid-search merge in RAG stacks) and A/B experiment
metrics (per-variant means with a Welch z statistic). Both are built
to the repo's exactness discipline: rank arithmetic is integer,
scores are a fixed-length sum of exact double terms, variances come
from wide-integer sums of squares — so both hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..exprs import sql_wide_to_double
from ..registry import query


@query(
    "op_rank_fusion",
    oracle="""
        WITH r AS (
          SELECT p_partkey, p_brand,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC,
                                             p_partkey) AS rk1,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY p_size DESC,
                                             p_partkey) AS rk2
          FROM part
        ),
        s AS (
          SELECT p_partkey, p_brand,
                 1.0 / (60 + rk1) + 1.0 / (60 + rk2) AS rrf_score
          FROM r
        ),
        t AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
                                       ORDER BY rrf_score DESC,
                                                p_partkey) AS rn
          FROM s
        )
        SELECT p_brand, p_partkey, rrf_score
        FROM t WHERE rn <= 3
    """,
    notes="Reciprocal-rank fusion (k=60) — the hybrid-search merge "
    "used to combine keyword (BM25-style) and embedding rankings in "
    "RAG retrieval, demonstrated over two orthogonal signals per "
    "brand group. Scale discipline: every ranking is PARTITIONED "
    "(per query group) — never a global empty-PARTITION ROW_NUMBER "
    "(the single-task trap op_surrogate_key exists to avoid) — and "
    "all three windows plus the top-3 keep cluster on p_brand, so "
    "Catalyst plans ONE exchange end-to-end with a WindowGroupLimit "
    "for the final cut (plan-asserted). Exactness: ranks are "
    "integers, the score is a 2-term sum of exact double "
    "reciprocals evaluated in the same order by both engines.",
    tags=("window", "text", "scale"),
)
def op_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF top-3 per brand from price- and size-rankings."""
    p = load(spark, sf_dir, "part")
    w1 = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), "p_partkey"
    )
    w2 = Window.partitionBy("p_brand").orderBy(
        F.desc("p_size"), "p_partkey"
    )
    scored = p.select(
        "p_partkey",
        "p_brand",
        (
            F.lit(1.0) / (F.lit(60) + F.row_number().over(w1))
            + F.lit(1.0) / (F.lit(60) + F.row_number().over(w2))
        ).alias("rrf_score"),
    )
    wt = Window.partitionBy("p_brand").orderBy(
        F.desc("rrf_score"), "p_partkey"
    )
    return (
        scored.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "rrf_score")
    )


@query(
    "op_ab_test",
    oracle="""
        WITH v AS (
          SELECT event_type,
                 user_id % 2 AS variant,
                 CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v6
          FROM events
        ),
        g AS (
          SELECT event_type, variant,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(v6) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean,
                 (CAST(SUM(v6 * v6) AS DOUBLE) / 1e12 / COUNT(*))
                   - POW(CAST(SUM(v6) AS DOUBLE) / 1000000.0
                         / COUNT(*), 2) AS var_pop
          FROM v GROUP BY event_type, variant
        )
        SELECT a.event_type,
               a.n AS n_a, b.n AS n_b,
               a.mean AS mean_a, b.mean AS mean_b,
               a.mean - b.mean AS mean_diff,
               (a.mean - b.mean)
                 / sqrt(a.var_pop / a.n + b.var_pop / b.n) AS welch_z
        FROM g a JOIN g b
          ON a.event_type = b.event_type
         AND a.variant = 0 AND b.variant = 1
    """,
    notes="A/B experiment readout: deterministic variant assignment "
    "(user_id parity — the hash-bucket split every experimentation "
    "platform uses), per-variant mean and population variance, and "
    "the Welch z statistic. One fact aggregation (map-side combined "
    "on (event_type, variant)) + a 2×|event_type|-row self-join — "
    "O(1) output at any scale. Exactness where it is usually "
    "impossible: means AND variances are derived from wide-integer "
    "sums (Σv6, Σv6² in decimal(38,0)/HUGEINT — v6 = 1e-6 fixed "
    "point), so even E[x²]−E[x]² and the final sqrt are the same "
    "double expression over identical operands in both engines.",
    tags=("agg", "scale"),
)
def op_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type two-variant comparison with Welch z."""
    e = load(spark, sf_dir, "events")
    v6 = F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    g = (
        e.select(
            "event_type",
            (F.col("user_id") % 2).alias("variant"),
            v6.alias("v6"),
        )
        .groupBy("event_type", "variant")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            (
                F.sum("v6").cast("double") / 1e6 / F.count("*")
            ).alias("mean"),
            (
                (F.sum(F.col("v6") * F.col("v6")).cast("double") / 1e12)
                / F.count("*")
                - F.pow(
                    F.sum("v6").cast("double") / 1e6 / F.count("*"),
                    F.lit(2),
                )
            ).alias("var_pop"),
        )
    )
    a = g.filter(F.col("variant") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"),
        F.col("var_pop").alias("var_a"),
    )
    b = g.filter(F.col("variant") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"),
        F.col("var_pop").alias("var_b"),
    )
    j = a.join(b, "event_type")
    diff = F.col("mean_a") - F.col("mean_b")
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        diff.alias("mean_diff"),
        (
            diff
            / F.sqrt(
                F.col("var_a") / F.col("n_a")
                + F.col("var_b") / F.col("n_b")
            )
        ).alias("welch_z"),
    )


@query(
    "op_trend_slope",
    oracle=f"""
        WITH based AS (
          SELECT user_id,
                 epoch_us(ts) // 1000000
                   - MIN(epoch_us(ts) // 1000000)
                       OVER (PARTITION BY user_id) AS x,
                 CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS y6
          FROM events
        ),
        g AS (
          SELECT user_id,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(x) AS sx, SUM(y6) AS sy,
                 SUM(x * y6) AS sxy, SUM(x * x) AS sxx
          FROM based GROUP BY user_id
        )
        SELECT user_id, n,
               {sql_wide_to_double("n * sxy - sx * sy")}
                 / {sql_wide_to_double("n * sxx - sx * sx")} / 1000000.0
                 AS slope_per_sec
        FROM g
        WHERE n * sxx - sx * sx > 0
    """,
    notes="Per-key least-squares trend (metric drift detection): the "
    "OLS slope from the four classical sums — every sum an exact "
    "wide integer (x = whole seconds since the key's FIRST "
    "observation, bounding x² and x·y6 far inside int64; y6 = 1e-6 "
    "fixed point), one double division at the end, so an actual "
    "REGRESSION hash-matches across engines. The MIN-over-key "
    "rebase window and the aggregate share one user_id exchange "
    "(the op_time_weighted_avg discipline). Degenerate keys (all "
    "observations at one second) are excluded by the same "
    "determinant>0 predicate on both sides. At 100 TB this replaces "
    "collect-and-numpy per entity — the standard anomaly-pipeline "
    "prefilter before expensive models.",
    tags=("timeseries", "agg", "scale"),
)
def op_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope of value-vs-time per user, exact integer sums."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t_s = (F.unix_micros("ts") / 1_000_000).cast("long")
    based = e.select(
        "user_id",
        (t_s - F.min(t_s).over(w)).alias("x"),
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("bigint")
        .alias("y6"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = based.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y6"))).alias("sy"),
        F.sum(dec(F.col("x") * F.col("y6"))).alias("sxy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return g.filter(det > 0).select(
        "user_id",
        "n",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / det.cast("double")
            / F.lit(1_000_000.0)
        ).alias("slope_per_sec"),
    )


@query(
    "op_event_transitions",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type AS a,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS b
          FROM events
        )
        SELECT a, b,
               CAST(COUNT(*) AS BIGINT) AS n_transitions,
               CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY a) AS p_transition
        FROM seq WHERE b IS NOT NULL
        GROUP BY a, b
    """,
    notes="First-order Markov transition matrix of per-user event "
    "sequences — the sequence-mining primitive under next-action "
    "prediction and journey analysis, and the categorical sibling "
    "of op_funnel (which checks ONE fixed path; this measures ALL "
    "adjacent pairs). LEAD over the user timeline (event_id "
    "tiebreak), pair counts, and row-normalization by source state "
    "via a window over the |states|² aggregate — the probability is "
    "one exact-integer division, bit-identical. Two exchanges "
    "(user_id for the sequence, state-pair for the matrix), output "
    "O(|states|²) regardless of corpus size.",
    tags=("timeseries", "agg"),
)
def op_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(from,to) transition counts and row-normalized probs."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    counts = seq.groupBy("a", "b").agg(
        F.count("*").cast("bigint").alias("n_transitions")
    )
    wa = Window.partitionBy("a")
    return counts.select(
        "a",
        "b",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wa)
        ).alias("p_transition"),
    )


@query(
    "op_cohort_retention",
    oracle="""
        WITH firsts AS (
          SELECT user_id, ts,
                 CAST(date_trunc('week', MIN(ts) OVER (PARTITION BY user_id))
                      AS DATE) AS cohort_week
          FROM events
        ),
        activity AS (
          SELECT DISTINCT user_id, cohort_week,
                 CAST(date_diff('day', cohort_week,
                                CAST(date_trunc('week', ts) AS DATE)) // 7
                      AS BIGINT) AS week_offset
          FROM firsts
        )
        SELECT cohort_week, week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM activity
        GROUP BY cohort_week, week_offset
    """,
    notes="Cohort retention matrix — the product-analytics staple "
    "(cohort = the ISO week of a user's FIRST event; each cell counts "
    "users from that cohort active in week offset k): computed with "
    "ZERO self-joins — the cohort week attaches as a MIN window over "
    "user_id (one exchange, the same pass that reads the activity), "
    "per-user-week activity dedups in the same keyed stage, and the "
    "matrix is one (cohort, offset) rollup. week_offset is pure "
    "integer date math (date_trunc to Monday on both engines, "
    "day-diff integer-divided by 7), so every cell is exact. At "
    "100 TB the user_id exchange carries (user, ts-week) pairs and "
    "the rollup |cohorts|x|offsets| cells — the naive formulation "
    "(first-event table self-joined back to events) pays a second "
    "corpus shuffle for the same answer.",
    tags=("analytics", "agg", "scale"),
)
def op_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort x week-offset active-user matrix over events."""
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    cohort = F.date_trunc(
        "week", F.min("ts").over(Window.partitionBy("user_id"))
    ).cast("date")
    act = (
        e.withColumn("cohort_week", cohort)
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .dropDuplicates(["user_id", "cohort_week", "week_offset"])
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("bigint").alias("n_active")
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "op_corr_matrix",
    oracle=f"""
        WITH q AS (
          SELECT CAST(FLOOR(l_quantity * 1000 + 0.5) AS BIGINT) AS c0,
                 CAST(FLOOR(l_extendedprice * 1000 + 0.5) AS BIGINT) AS c1,
                 CAST(FLOOR(l_discount * 1000 + 0.5) AS BIGINT) AS c2,
                 CAST(FLOOR(l_tax * 1000 + 0.5) AS BIGINT) AS c3
          FROM lineitem
        ),
        s AS (
          SELECT COUNT(*) AS n,
                 SUM(c0) AS s0, SUM(c1) AS s1,
                 SUM(c2) AS s2, SUM(c3) AS s3,
                 SUM(c0*c0) AS p00, SUM(c0*c1) AS p01,
                 SUM(c0*c2) AS p02, SUM(c0*c3) AS p03,
                 SUM(c1*c1) AS p11, SUM(c1*c2) AS p12,
                 SUM(c1*c3) AS p13, SUM(c2*c2) AS p22,
                 SUM(c2*c3) AS p23, SUM(c3*c3) AS p33
          FROM q
        )
        SELECT * FROM (
          SELECT 'l_quantity' AS col_a, 'l_quantity' AS col_b,
                 {sql_wide_to_double("n*p00 - s0*s0")} AS cov_num FROM s
          UNION ALL SELECT 'l_quantity', 'l_extendedprice',
                 {sql_wide_to_double("n*p01 - s0*s1")} FROM s
          UNION ALL SELECT 'l_quantity', 'l_discount',
                 {sql_wide_to_double("n*p02 - s0*s2")} FROM s
          UNION ALL SELECT 'l_quantity', 'l_tax',
                 {sql_wide_to_double("n*p03 - s0*s3")} FROM s
          UNION ALL SELECT 'l_extendedprice', 'l_extendedprice',
                 {sql_wide_to_double("n*p11 - s1*s1")} FROM s
          UNION ALL SELECT 'l_extendedprice', 'l_discount',
                 {sql_wide_to_double("n*p12 - s1*s2")} FROM s
          UNION ALL SELECT 'l_extendedprice', 'l_tax',
                 {sql_wide_to_double("n*p13 - s1*s3")} FROM s
          UNION ALL SELECT 'l_discount', 'l_discount',
                 {sql_wide_to_double("n*p22 - s2*s2")} FROM s
          UNION ALL SELECT 'l_discount', 'l_tax',
                 {sql_wide_to_double("n*p23 - s2*s3")} FROM s
          UNION ALL SELECT 'l_tax', 'l_tax',
                 {sql_wide_to_double("n*p33 - s3*s3")} FROM s
        )
    """,
    notes="Pairwise covariance/correlation numerators for the four "
    "lineitem numeric columns — the tabular sibling of "
    "op_embedding_covariance, and the BI profiling staple (corr "
    "matrix = cov_num(a,b)/sqrt(cov_num(a,a)*cov_num(b,b)), a "
    "driver-side O(d^2) division the caller applies): ONE scan, all "
    "10 upper-triangle co-moments + 4 sums + n as conditional "
    "aggregates in a single global agg — ZERO hash exchanges (a "
    "1-row partial per partition feeds the final agg), plan-asserted. "
    "Values quantize to 1e3 fixed-point and every co-moment "
    "accumulates as exact wide integers (the engines' raw corr()/"
    "covar_pop() would drift in the last double bits), so the matrix "
    "hash-matches exactly; the p11 co-moment reaches ~1e22 — above "
    "2^53, so the final CAST to DOUBLE rounds, and the oracle must "
    "route it through VARCHAR (DuckDB's direct HUGEINT→DOUBLE cast "
    "is NOT correctly rounded; its string parse and Spark's "
    "decimal→double both are — pinned adversarially in "
    "tests/test_oracle_types.py). At 100 TB adding a column adds "
    "aggregates, never a pass.",
    tags=("analytics", "agg", "scale"),
)
def op_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise covariance numerators over lineitem numerics."""
    li = load(spark, sf_dir, "lineitem")
    q = [
        F.floor(F.col(c) * 1000 + F.lit(0.5))
        .cast("decimal(18,0)")
        .alias(f"c{i}")
        for i, c in enumerate(_CORR_COLS)
    ]
    d = li.select(*q)
    aggs = [F.count("*").cast("decimal(28,0)").alias("n")]
    for i in range(4):
        aggs.append(F.sum(f"c{i}").cast("decimal(28,0)").alias(f"s{i}"))
    pairs = [(i, j) for i in range(4) for j in range(i, 4)]
    for i, j in pairs:
        aggs.append(
            F.sum(
                (F.col(f"c{i}") * F.col(f"c{j}")).cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias(f"p{i}{j}")
        )
    s = d.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(_CORR_COLS[i]).alias("col_a"),
                F.lit(_CORR_COLS[j]).alias("col_b"),
                (
                    F.col("n") * F.col(f"p{i}{j}")
                    - F.col(f"s{i}") * F.col(f"s{j}")
                )
                .cast("double")
                .alias("cov_num"),
            )
            for i, j in pairs
        ]
    )
    return s.select(F.explode(cells).alias("r")).select(
        "r.col_a", "r.col_b", "r.cov_num"
    )


@query(
    "op_attribution_last_touch",
    oracle="""
        WITH v AS (
          SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'view'
        ),
        p AS (
          SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase'
        ),
        cand AS (
          SELECT p.event_id AS purchase_id,
                 v.event_id AS view_id,
                 ROW_NUMBER() OVER (PARTITION BY p.event_id
                                    ORDER BY v.ts DESC,
                                             v.event_id DESC) AS rn
          FROM p JOIN v
            ON v.user_id = p.user_id
           AND v.ts <= p.ts
           AND v.ts >= p.ts - INTERVAL 7 DAY
        )
        SELECT p.event_id AS purchase_id,
               p.user_id,
               c.view_id
        FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
          ON c.purchase_id = p.event_id
    """,
    notes="LAST-TOUCH ATTRIBUTION — for every purchase, the most "
    "recent view by the same user within a 7-day lookback (ties on "
    "ts broken by event_id; unattributed purchases keep a NULL "
    "view_id). The Spark plan is the scalable as-of shape: ONE "
    "user_id exchange, views and purchases interleaved in event-time "
    "order within each user, and last(view_id, ignorenulls) over "
    "rows-between(unbounded, -1) carries the latest view forward — "
    "no self-join, so a user with V views and P purchases costs "
    "O(V+P), not O(V*P) like the oracle's join+rank formulation "
    "(correct but quadratic per user; at 100 TB the window plan is "
    "the difference between a sort-merge pass and a blown-up "
    "pair stream). The age cutoff applies AFTER the carry-forward: "
    "the globally-latest view IS the max-ts view, so nulling it when "
    "stale equals the oracle's windowed max. Views sort before "
    "purchases at equal ts (same-instant view attributes).",
    tags=("analytics", "windows", "scale"),
)
def op_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase last-touch view attribution, single-exchange."""
    e = load(spark, sf_dir, "events")
    vp = e.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("event_type") == "purchase").alias("is_p"),
    )
    # views order before purchases at the same ts -> rowsBetween
    # (unbounded, -1) still sees a same-instant view
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", F.col("is_p").cast("int"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view_id = F.last(
        F.when(~F.col("is_p"), F.col("event_id")), ignorenulls=True
    ).over(w)
    last_view_ts = F.last(
        F.when(~F.col("is_p"), F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        vp.withColumn("lv_id", last_view_id)
        .withColumn("lv_ts", last_view_ts)
        .filter(F.col("is_p"))
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.when(
                F.col("lv_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"),
                F.col("lv_id"),
            ).alias("view_id"),
        )
    )
