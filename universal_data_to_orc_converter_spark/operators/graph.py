"""Iterative graph algorithms on DataFrames — SURVEY.md §2 extension.

The dedup family already ships one fixed-point graph algorithm (label
propagation for connected components, operators/dedup.py); this module
adds the other canonical one — PageRank — as a driver-side loop of
pure DataFrame joins, the standard Spark formulation (edges ⋈ ranks →
contributions → groupBy dst → new ranks).

Cross-engine exactness for an ITERATIVE double algorithm is usually
hopeless (float error compounds per iteration, in engine-specific
order). Solved here by doing the whole thing in integer arithmetic:
ranks live in micro-units (1e6 = rank 1.0), each edge contribution is
``rank div outdeg`` (integer division), the damping step is
``(85 * incoming) div 100`` — every operation is exact and
order-independent, so 3 iterations later Spark and DuckDB agree to
the last bit. The price is ≤ outdeg micro-units of floor loss per
node per iteration — deterministic, identical in both engines, and
bounded by 1e-4 of a rank unit here.

Scale posture: per iteration, one shuffle (the groupBy dst; the
edges ⋈ ranks join co-partitions on src). Edges and degrees are
computed once and cached — the iteration loop never re-derives them.
Dangling mass (nodes below the co-occurrence threshold losing all
out-edges) is dropped identically in both engines — the usual
simplified-PageRank convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: damping factor as an exact rational (85/100)
DAMPING_NUM, DAMPING_DEN = 85, 100
ITERATIONS = 3
MICRO = 1_000_000


@query(
    "op_pagerank",
    oracle="""
        WITH pairc AS (
          SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
                 COUNT(*) AS cnt
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
          WHERE a.l_suppkey <> b.l_suppkey
          GROUP BY 1, 2
        ),
        edges AS (
          SELECT src, dst FROM pairc
          WHERE cnt >= (SELECT quantile_cont(cnt, 0.75) FROM pairc)
        ),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges
          ) u
        ),
        it0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        it1 AS (
          SELECT n.node,
                 150000 + (85 * COALESCE(SUM(p.r // d.outdeg), 0)) // 100
                   AS r
          FROM nodes n
          LEFT JOIN edges e ON e.dst = n.node
          LEFT JOIN it0 p ON p.node = e.src
          LEFT JOIN deg d ON d.src = e.src
          GROUP BY n.node
        ),
        it2 AS (
          SELECT n.node,
                 150000 + (85 * COALESCE(SUM(p.r // d.outdeg), 0)) // 100
                   AS r
          FROM nodes n
          LEFT JOIN edges e ON e.dst = n.node
          LEFT JOIN it1 p ON p.node = e.src
          LEFT JOIN deg d ON d.src = e.src
          GROUP BY n.node
        ),
        it3 AS (
          SELECT n.node,
                 150000 + (85 * COALESCE(SUM(p.r // d.outdeg), 0)) // 100
                   AS r
          FROM nodes n
          LEFT JOIN edges e ON e.dst = n.node
          LEFT JOIN it2 p ON p.node = e.src
          LEFT JOIN deg d ON d.src = e.src
          GROUP BY n.node
        )
        SELECT node AS suppkey, CAST(r AS BIGINT) AS rank_micro
        FROM it3
    """,
    notes="3-iteration PageRank over the supplier co-occurrence graph "
    "(suppliers sharing an order, sparsified to pairs above the p75 "
    "co-occurrence count so degrees vary). Ranks are exact integers "
    "in micro-units — rank div outdeg contributions, (85·in) div 100 "
    "damping — so the iterative result hash-matches DuckDB's "
    "3×-unrolled CTE bit-for-bit, something float PageRank can never "
    "do across engines. One shuffle per iteration (contribution "
    "groupBy dst); edges/degrees cached once; the driver loop carries "
    "only iteration COUNT, never data. The oracle's unrolled CTEs "
    "are the same dataflow Catalyst sees from the loop.",
    tags=("graph", "iterative"),
)
def op_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact PageRank of suppliers by order co-occurrence."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("src")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("dst")
    )
    pairc = (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
    )
    pairc = pairc.persist()
    thresh = pairc.agg(F.expr("percentile(cnt, 0.75)")).first()[0]
    edges = pairc.filter(F.col("cnt") >= thresh).select("src", "dst").persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.withColumn("r", F.lit(MICRO).cast("bigint"))
    for _ in range(ITERATIONS):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                "dst", F.expr("r div outdeg").alias("contrib")
            )
        )
        incoming = contrib.groupBy("dst").agg(
            F.sum("contrib").alias("inc")
        )
        ranks = nodes.join(
            incoming, nodes.node == incoming.dst, "left"
        ).select(
            "node",
            (
                F.lit(150_000).cast("bigint")
                + F.expr(
                    f"({DAMPING_NUM} * coalesce(inc, CAST(0 AS BIGINT)))"
                    f" div {DAMPING_DEN}"
                )
            ).alias("r"),
        )
    return ranks.select(
        F.col("node").alias("suppkey"), F.col("r").alias("rank_micro")
    )


@query(
    "op_graph_triangles",
    oracle="""
        WITH pairc AS (
          SELECT a.l_suppkey AS src, b.l_suppkey AS dst,
                 COUNT(*) AS cnt
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey
          WHERE a.l_suppkey <> b.l_suppkey
          GROUP BY 1, 2
        ),
        und AS (
          SELECT src AS u, dst AS v FROM pairc
          WHERE cnt >= (SELECT quantile_cont(cnt, 0.5) FROM pairc)
            AND src < dst
        ),
        tri AS (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM und e1
          JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT u AS node FROM und UNION ALL SELECT v FROM und
          ) x
        ),
        pernode AS (
          SELECT node, COUNT(*) AS t FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
          ) y GROUP BY node
        )
        SELECT n.node AS suppkey,
               CAST(COALESCE(p.t, 0) AS BIGINT) AS n_triangles
        FROM nodes n LEFT JOIN pernode p ON p.node = n.node
    """,
    notes="Per-node triangle counting on the supplier co-occurrence "
    "graph (same construction as op_pagerank, sparsified at the "
    "median co-occurrence count so triangles exist). The Spark plan "
    "uses DEGREE-BASED edge orientation — every undirected edge "
    "points from its lower-(degree, id) endpoint to the higher — so "
    "wedge enumeration happens at each edge's LOW-degree end: the "
    "out-degree of any node under this orientation is O(sqrt(m)), "
    "which is what keeps the wedge join from exploding on hub nodes "
    "at 100 TB (a celebrity node with 10^6 neighbors generates 10^12 "
    "id-ordered wedges but only ~m oriented ones). The oracle uses "
    "the naive a<b<c id-ordered triple join — a DIFFERENT enumeration "
    "of the IDENTICAL triangle set, so the hash match also proves the "
    "orientation trick loses nothing. Two self-joins (wedge + "
    "closure), both equi-joins on node ids; per-node counts via one "
    "explode+groupBy.",
    tags=("graph", "scale"),
)
def op_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count triangles per supplier via degree-oriented wedge join.

    r16: the co-occurrence join generates each UNORDERED supplier pair
    once (``src < dst`` pushed below the aggregate) instead of both
    directions — half the join output, half the aggregated stream. The
    per-pair count is unchanged (cnt(a,b) = Σ_orders n_a·n_b is
    symmetric), and the median threshold is unchanged because the
    directed multiset duplicated every count exactly twice and
    percentile interpolation is invariant under uniform duplication
    (dup[i] = x[i//2] ⇒ the p=0.5 interpolation endpoints are the same
    order statistics in both multisets — the equivalence obligation
    sketched in r15's checklist). The oracle keeps its directed
    enumeration; the driver hash proves the identity."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("src")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("dst")
    )
    pairc = (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cnt"))
        .persist()
    )
    thresh = pairc.agg(F.expr("percentile(cnt, 0.5)")).first()[0]
    und = (
        pairc.filter(F.col("cnt") >= thresh)
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .persist()
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    # orient each edge from its lower-(degree, id) endpoint: lo -> hi,
    # carrying hi's (degree, id) rank for the wedge ordering below
    e = (
        und.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("d", "du")
        .join(
            deg.select(
                F.col("node").alias("v"), F.col("d").alias("dv")
            ),
            "v",
        )
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dhi"),
    ).persist()
    # wedges at the low end: two out-neighbors of lo, ordered by the
    # SAME (degree, id) rank so each candidate pair appears once and
    # matches the closure edge's own orientation
    w1 = o.select(
        F.col("lo").alias("pivot"),
        F.col("hi").alias("x"),
        F.col("dhi").alias("dx"),
    )
    w2 = o.select(
        F.col("lo").alias("pivot"),
        F.col("hi").alias("y"),
        F.col("dhi").alias("dy"),
    )
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    wedges = w1.join(w2, "pivot").filter(x_first)
    closure = o.select(
        F.col("lo").alias("x"), F.col("hi").alias("y")
    )
    tri = wedges.join(closure, ["x", "y"]).select(
        F.col("pivot").alias("a"), F.col("x").alias("b"), F.col("y").alias("c")
    )
    nodes = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .distinct()
    )
    pernode = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("t"))
    )
    return nodes.join(pernode, "node", "left").select(
        F.col("node").alias("suppkey"),
        F.coalesce("t", F.lit(0)).cast("bigint").alias("n_triangles"),
    )


def _star_contraction(
    edges: DataFrame,
    max_rounds: int = 30,
    rounds_out: list | None = None,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") — converges in O(log n) rounds on ANY graph, where
    min-label propagation needs O(diameter) rounds (a path graph of
    length 600 defeats a 20-round propagation cap; see
    tests/test_graph_cc.py). ``edges`` is an undirected pair frame
    (u, v); returns (node, root) for every non-root node, edges all
    pointing at their component minimum.

    Each round is two aggregate+join passes over the EDGE set (which
    only shrinks toward a star forest); convergence is checked with a
    count + xxhash checksum — bounded driver metadata, never edge
    data."""

    def sym(e: DataFrame) -> DataFrame:
        return e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def star(e: DataFrame, large: bool) -> DataFrame:
        from pyspark.sql import Window as W

        s = sym(e)
        # per-node neighborhood minimum as a WINDOW over the symmetric
        # edge frame (r16): the former groupBy(u).min + join-back
        # spelling shuffled the edge frame TWICE per star pass (the agg
        # exchange and the join's probe-side exchange); the window
        # attaches min(v) to every row with ONE exchange on u. With
        # AQE each exchange materializes as its own job, so a 10-round
        # contraction drops ~20 jobs. Output sets are identical: m is
        # the same per-u value, and the small-star self-edges (u, m) —
        # duplicated here once per neighbor — collapse in the trailing
        # distinct() that both branches already need.
        withm = s.withColumn(
            "m", F.least(F.col("u"), F.min("v").over(W.partitionBy("u")))
        )
        if large:
            # neighbors larger than u link to u's minimum
            out = withm.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        else:
            # neighbors ≤ u (and u itself) link to u's minimum
            small_n = withm.filter(F.col("v") <= F.col("u")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
            self_e = withm.select("u", F.col("m").alias("v"))
            out = small_n.unionByName(self_e)
        return out.filter(F.col("u") != F.col("v")).distinct()

    def checksum(e: DataFrame):
        # bit_xor, not sum: order-independent AND overflow-free under
        # ANSI mode (a SUM of 64-bit hashes overflows long)
        row = e.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = None
    for rnd in range(max_rounds):
        edges = star(edges, large=True)
        # LAZY local checkpoint: the checksum aggregate is the round's
        # ONLY action — it materializes the checkpoint partitions as a
        # side effect of the same job (r16; the eager form ran a
        # materialization job AND a checksum job per round, ~10 extra
        # jobs over the edge frame per invocation). Lineage truncation
        # is identical, so per-round planning stays O(1).
        edges = star(edges, large=False).localCheckpoint(eager=False)
        cur = checksum(edges)
        if cur == prev:
            break
        prev = cur
    if rounds_out is not None:
        rounds_out.append(rnd + 1)
    return edges.select(F.col("u").alias("node"), F.col("v").alias("root"))


@query(
    "op_connected_components_star",
    oracle="""
        SELECT CAST(MIN(event_id) AS BIGINT) AS component_id,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM events
        GROUP BY user_id
        HAVING COUNT(*) >= 2
    """,
    notes="Connected components by LARGE-STAR/SMALL-STAR contraction "
    "(Kiveris et al.) — the O(log n)-ROUNDS algorithm the repo's "
    "label-propagation CC (op_dedup_clusters) is not: propagation "
    "needs O(diameter) rounds, fine for tiny near-dup clusters but "
    "broken for chain-shaped graphs (its 20-round cap fails a "
    "600-node path; demonstrated head-to-head in "
    "tests/test_graph_cc.py). The input graph is built ADVERSARIALLY "
    "high-diameter: each user's events chained consecutively in "
    "(ts, event_id) order — paths of length ~n_events/user (67 at "
    "sf0.01, ~670 at sf0.1), which star contraction collapses in "
    "~7 alternations. The algorithm never sees user_id; the oracle "
    "knows each chain IS one user, so per-component (min event_id, "
    "size) must equal the per-user aggregate — an exact external "
    "answer for an iterative graph algorithm. Scale: every round is "
    "two aggregate+join passes over the shrinking EDGE frame; "
    "convergence checks collect a (count, checksum) pair only. "
    "Round count is the log of the LONGEST component, not corpus "
    "size.",
    tags=("graph", "iterative", "scale"),
)
def op_connected_components_star(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CC over per-user event chains; component stats must equal the
    per-user truth the algorithm never saw."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    chain = (
        e.withColumn("nxt", F.lead("event_id").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("event_id").alias("u"), F.col("nxt").alias("v"))
    )
    assign = _star_contraction(chain)
    # at fixpoint every NON-ROOT node appears exactly once in assign,
    # so component size = per-root row count + 1 (the root itself) —
    # one aggregate, no node-set distinct/join (review finding: the
    # earlier union+distinct+join form added two exchanges over the
    # largest frame to compute the same number)
    return (
        assign.groupBy(F.col("root").alias("component_id"))
        .agg((F.count("*") + 1).cast("bigint").alias("n_nodes"))
        .select(F.col("component_id").cast("bigint"), "n_nodes")
    )
