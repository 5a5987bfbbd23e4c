"""Iterative graph analytics: PageRank as synchronous rounds of
DataFrame joins — the canonical BSP workload.

The reference is a Pregel-family BSP framework (master aggregates,
workers iterate — guagua-core/src/main/java/ml/shifu/guagua/master/
MasterComputable.java:30-45, worker/WorkerComputable.java:30-44); its
shipped examples are ML trainers, but the iteration contract is exactly
the vertex-program loop. This module shows the Spark-first translation
for the graph case: the per-round superstep is a JOIN (ranks ⋈ weighted
edges) plus a partial-aggregated groupBy — Catalyst plans it, AQE sizes
it — rather than per-vertex message queues. The engine's
master/worker path (engine.py) remains the right tool when the model is
driver-sized; a rank vector is node-sized, so it must stay distributed,
which is why this family is DataFrame-iterative like
dedup.connected_components rather than engine-based.

100 TB notes: per round, 3 exchanges over node-sized relations — the
rank ⋈ weighted-edges equi-join on src (AQE skew-splits a hot source),
the partial-aggregated groupBy on dst (a celebrity node's millions of
in-contributions collapse map-side before the shuffle — contribution
sums are decomposable, the same argument as salted_agg's), and the
rank-update left join against the node list. The weighted edge list
AND the node list are computed once, persisted, and force-materialized
before the loop (an unforced persist would cache nothing until the
caller's first action); rank lineage is localCheckpoint-truncated every
``checkpoint_every`` rounds exactly like connected_components, so long
runs neither replan O(rounds)-deep trees nor re-execute from the scan,
and the final vector is materialized so the caches can be released at
return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from guagua_spark.functions.supersteps import dataframe_supersteps
from guagua_spark.sources.tables import load_table

PR_DAMPING = 0.85
PR_ITERATIONS = 3


def pagerank(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    iterations: int = PR_ITERATIONS,
    checkpoint_every: int = 5,
    _return_lazy: bool = False,
) -> DataFrame:
    """Synchronous PageRank over a directed edge list (src, dst).

    r_{t+1}(v) = (1−d)/N + d·Σ_{u→v} r_t(u)/outdeg(u), from the
    uniform vector. Nodes are the UNION of both endpoint columns;
    dangling nodes (out-degree 0) keep their base-rank term but leak
    their mass — standard for the plain formulation; feed symmetric
    edges (both directions) if the graph should conserve mass, as
    graph_pagerank below does."""
    src, dst = edges.columns[0], edges.columns[1]
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    outdeg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    w = (
        edges.join(outdeg, src)
        .select(
            F.col(src).alias("__src"),
            F.col(dst).alias("__dst"),
            (F.lit(1.0) / F.col("__deg")).alias("__wt"),
        )
        .persist()
    )
    w.count()  # materialize NOW — every superstep reads the cache, not
    # the edge scan + out-degree join (an unforced persist caches
    # nothing until the first action, which here would be the CALLER's)
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        w.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, rank double"
        )
    base = (1.0 - damping) / n

    def step(ranks: DataFrame, _i: int) -> DataFrame:
        contribs = (
            w.join(ranks, w["__src"] == ranks["node"])
            .groupBy("__dst")
            .agg(F.sum(F.col("rank") * F.col("__wt")).alias("__in"))
        )
        # left join: a node with no in-edges keeps the base term
        return nodes.join(
            contribs, nodes["node"] == contribs["__dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
            ).alias("rank"),
        )

    ranks, _, _ = dataframe_supersteps(
        nodes.withColumn("rank", F.lit(1.0 / n)),
        step,
        iterations,
        checkpoint_every=checkpoint_every,
    )
    if _return_lazy:
        # plan-inspection hook (tests/test_plans.py): return the raw
        # superstep plan; the edge/node caches stay pinned — callers of
        # this mode own their release via the attached handles
        ranks._pinned_relations = (nodes, w)
        return ranks
    # materialize the final vector (node-sized) so the caches can be
    # dropped before returning — the returned frame carries no lineage
    # into the unpersisted relations
    ranks = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    w.unpersist()
    return ranks


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric customer↔supplier trade graph: an edge per DISTINCT
    purchase link (orders ⋈ lineitem), both directions, node ids
    prefixed 'c'/'s' so the two key spaces can't collide."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    return pairs.union(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query entry: PR_ITERATIONS rounds of PageRank on the symmetric
    trade graph — (node, rank) for every node."""
    return pagerank(_trade_edges(spark, sf_dir)).select("node", "rank")


def _pagerank_oracle() -> str:
    """Recursive-CTE replay: identical edge weights (1/outdeg as a
    window count — equals the groupBy-join), identical update rule,
    same iteration count. The symmetric graph means every node appears
    as a join src, so the inner-join regroup keeps all nodes."""
    d = PR_DAMPING
    return f"""
WITH RECURSIVE e AS (
  SELECT a, b FROM (
    SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                    's' || CAST(l_suppkey AS VARCHAR) AS b
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  ) p
  UNION ALL
  SELECT b, a FROM (
    SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                    's' || CAST(l_suppkey AS VARCHAR) AS b
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  ) p
),
w AS (
  SELECT a AS src, b AS dst,
         1.0 / (COUNT(*) OVER (PARTITION BY a)) AS wt
  FROM e
),
n AS (SELECT DISTINCT src AS node FROM w),
cnt AS (SELECT COUNT(*) AS c FROM n),
pr AS (
  SELECT 0 AS i, node, 1.0 / c AS rank FROM n CROSS JOIN cnt
  UNION ALL
  SELECT i + 1, dst,
         (1.0 - {d}) / MAX(c) + {d} * SUM(rank * wt)
  FROM (
    SELECT pr.i, w.dst, pr.rank, w.wt, cnt.c
    FROM pr, w, cnt
    WHERE pr.node = w.src AND pr.i < {PR_ITERATIONS}
  ) s
  GROUP BY i, dst
)
SELECT node, rank FROM pr WHERE i = {PR_ITERATIONS}
""".strip()


#: oracle-tested locally (tests/test_graph.py); 50-slot contract full
LOCAL_QUERIES = {"graph_pagerank": graph_pagerank}
LOCAL_ORACLE_SQL = {"graph_pagerank": _pagerank_oracle()}
