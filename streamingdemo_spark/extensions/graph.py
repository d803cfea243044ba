"""Graph analytics over relational data: iterative PageRank on the
customer↔supplier co-purchase graph.

The reference's unrestricted SQL entry point (``SparkOperator.java``
C1 surface) lets users run relational queries; iterative graph
algorithms are the canonical workload *beyond* one-shot SQL, and the
pattern here — edge-list DataFrame, per-iteration join + aggregate,
eager ``localCheckpoint`` to truncate lineage — is the same loop
discipline as the connected-components labeller in
``extensions/dedup.py`` (min_label_components).

Portability discipline: ranks are kept as integer *nano-units*
(1 rank = 1e9 units) through every iteration, so every sum is an
exact, order-insensitive integer and the DuckDB oracle replays the
whole fixed-point computation bit-for-bit — no float accumulation
anywhere. Integer division drops at most 1e-9 of mass per edge per
iteration, which is far below any ranking-relevant difference and is
identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamingdemo_spark.io import load_tables
from streamingdemo_spark.registry import query

# One rank unit = 1e-9; damping 0.85 expressed as the exact integer
# pair (85, 100) so both engines do the same integer arithmetic.
_UNIT = 1_000_000_000
_ITERATIONS = 3


@query(
    "ext_graph_pagerank",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    edges AS (
      SELECT c AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, c AS dst FROM pairs
    ),
    deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    base AS (
      SELECT d.node, d.outdeg,
             CAST(15000000000 AS BIGINT) // (100 * nn.n) AS b,
             CAST({_UNIT} AS BIGINT) // nn.n AS r
      FROM deg d CROSS JOIN nn
    ),
    s1 AS (SELECT e.dst AS node, CAST(SUM(r.r // r.outdeg) AS BIGINT) AS s
           FROM edges e JOIN base r ON e.src = r.node GROUP BY e.dst),
    r1 AS (SELECT b.node, b.outdeg, b.b,
                  b.b + (85 * COALESCE(s1.s, 0)) // 100 AS r
           FROM base b LEFT JOIN s1 ON b.node = s1.node),
    s2 AS (SELECT e.dst AS node, CAST(SUM(r.r // r.outdeg) AS BIGINT) AS s
           FROM edges e JOIN r1 r ON e.src = r.node GROUP BY e.dst),
    r2 AS (SELECT b.node, b.outdeg, b.b,
                  b.b + (85 * COALESCE(s2.s, 0)) // 100 AS r
           FROM r1 b LEFT JOIN s2 ON b.node = s2.node),
    s3 AS (SELECT e.dst AS node, CAST(SUM(r.r // r.outdeg) AS BIGINT) AS s
           FROM edges e JOIN r2 r ON e.src = r.node GROUP BY e.dst),
    r3 AS (SELECT b.node, b.b + (85 * COALESCE(s3.s, 0)) // 100 AS r
           FROM r2 b LEFT JOIN s3 ON b.node = s3.node)
    SELECT node AS node_id,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_type,
           r AS rank_nano
    FROM r3
    """,
)
def ext_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 iterations, damping 0.85) over the
    undirected customer↔supplier co-purchase graph.

    Graph construction: one distinct-pair projection of
    ``lineitem ⋈ orders`` (customer bought from supplier), node ids
    disambiguated by parity (customer → 2k, supplier → 2k+1), each
    pair emitted in both directions so every node has out-degree ≥ 1
    (no dangling-mass correction needed).

    Scale shape: each iteration is ONE shuffle join (edges ⋈ ranks on
    src — both sides hash-partitioned on the same key, so AQE reuses
    the exchange) plus one aggregate with map-side partial combine;
    state between iterations is an eagerly local-checkpointed
    node-sized DataFrame, so lineage stays O(1) regardless of
    iteration count — the loop that works at 3 iterations works at 30.
    Rank state is node-count-sized, edges dominate: at 100 TB
    pre-partition the edge list once by src and persist it; every
    iteration then shuffles only the node-sized rank relation.

    Fixed iteration count (PageRank is itself an approximation); the
    convergence-probed variant of this loop lives in
    ``min_label_components`` (extensions/dedup.py) and applies here
    unchanged if a tolerance stop is wanted.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    pairs = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    # Materialize the edge list once: it is reused by all iterations
    # (and by the degree count), so re-deriving it from the base scan
    # every pass would re-run the distinct 4 times.
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = (
        deg.withColumnRenamed("src", "node")
        .crossJoin(F.broadcast(nn))
        .select(
            "node",
            "outdeg",
            F.expr("CAST(15000000000 AS BIGINT) div (100 * n)").alias("b"),
            F.expr(f"CAST({_UNIT} AS BIGINT) div n").alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(_ITERATIONS):
        contribs = edges.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), F.expr("r div outdeg").alias("contrib"))
        sums = contribs.groupBy("node").agg(F.sum("contrib").alias("s"))
        ranks = (
            ranks.drop("r")
            .join(sums, "node", "left")
            .select(
                "node",
                "outdeg",
                "b",
                (
                    F.col("b")
                    + F.expr("85 * coalesce(s, CAST(0 AS BIGINT)) div 100")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        F.col("node").alias("node_id"),
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.col("r").alias("rank_nano"),
    )
