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
    _prebuilt: tuple | None = None,
) -> DataFrame:
    """Synchronous PageRank over a directed edge list (src, dst).

    r_{t+1}(v) = (1−d)/N + d·Σ_{u→v} r_t(u)/outdeg(u), from the
    uniform vector. Nodes are the UNION of both endpoint columns;
    dangling nodes (out-degree 0) keep their base-rank term but leak
    their mass — standard for the plain formulation; feed symmetric
    edges (both directions) if the graph should conserve mass, as
    graph_pagerank below does.

    ``_prebuilt=(nodes, w, n)`` hands in already-persisted node /
    weighted-edge relations (the session memo ``_graph_relations``
    builds for the static trade graph — round 13: the cert build and
    the LOCAL entry each rebuilt them per invocation, ~4.5 s of
    repeated distinct+join at sf0.1). Ownership rule: prebuilt
    relations belong to their cache and are NOT unpersisted here."""
    src, dst = edges.columns[0], edges.columns[1]
    owns_relations = _prebuilt is None
    if _prebuilt is not None:
        nodes, w, n = _prebuilt
    else:
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
        w.count()  # materialize NOW — every superstep reads the cache,
        # not the edge scan + out-degree join (an unforced persist
        # caches nothing until the first action, which here would be
        # the CALLER's)
        n = nodes.count()
    if n == 0:
        if owns_relations:
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
        # this mode own their release via the attached handles (empty
        # when a session memo owns the relations)
        ranks._pinned_relations = (nodes, w) if owns_relations else ()
        return ranks
    # materialize the final vector (node-sized) so the caches can be
    # dropped before returning — the returned frame carries no lineage
    # into the unpersisted relations
    final = ranks
    ranks = final.localCheckpoint(eager=True)
    from guagua_spark.metrics import record_plan

    # checkpoint executed the final-round plan; snapshot for the bench
    # plan tripwire (the returned frame is a stub)
    record_plan("graph_pagerank", final)
    if owns_relations:
        nodes.unpersist()
        w.unpersist()
    return ranks


#: session-scoped persisted trade-edge relations, keyed by sf_dir →
#: (fingerprint, DataFrame) — the _FEATURE_CACHE pattern from
#: operators/iterative.py: FOUR consumers build this identical graph
#: per session (graph_pagerank, graph_bfs_depth, and the pr_*/bfs_*
#: certificate builds that both ride q4), and the join+distinct is by
#: far their dominant cost. Build cost self-reports as
#: ``_index:trade_edges`` in the bench cold lane; stale fingerprints
#: unpersist on replace; clear_caches() drops everything.
_EDGE_CACHE: dict = {}

#: session memos of the trade graph's derived relations — sf_dir →
#: (fingerprint, nodes DF, node count) and sf_dir → (fingerprint,
#: weighted-edge DF). Four consumers per session (LOCAL pagerank/BFS +
#: their cert builds) each rebuilt the node distinct (and pagerank the
#: out-degree join) per invocation before round 13; build costs
#: self-report as ``_index:graph_nodes`` / ``_index:pr_weights``. BFS
#: touches only the node memo — it never pays for pagerank's weights.
_NODE_CACHE: dict = {}
_WEIGHT_CACHE: dict = {}


def clear_caches() -> None:
    for _, df in _EDGE_CACHE.values():
        df.unpersist()
    _EDGE_CACHE.clear()
    for _, nodes, _n in _NODE_CACHE.values():
        nodes.unpersist()
    _NODE_CACHE.clear()
    for _, w in _WEIGHT_CACHE.values():
        w.unpersist()
    _WEIGHT_CACHE.clear()
    for _, df in _AFF_CACHE.values():
        df.unpersist()
    _AFF_CACHE.clear()


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric customer↔supplier trade graph: an edge per DISTINCT
    purchase link (orders ⋈ lineitem), both directions, node ids
    prefixed 'c'/'s' so the two key spaces can't collide.

    The distinct runs on the INTEGER key pair and the string node ids
    are built after it (and after the union): the wide exchange
    carries 2 ints/row instead of 2 strings, and the concat runs once
    per surviving edge instead of once per corpus row (guide: shuffle
    fewer bytes / project cheap expressions after the exchange)."""
    from guagua_spark.sources.tables import table_fingerprint

    fp = table_fingerprint(sf_dir, "lineitem")
    hit = _EDGE_CACHE.get(sf_dir)
    if hit is not None:
        if hit[0] == fp:
            return hit[1]
        hit[1].unpersist()
    import time as _time

    from guagua_spark.metrics import record_index_build

    t0 = _time.monotonic()
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = pairs.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("a"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("b"),
    )
    edges = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    edges.count()
    record_index_build("trade_edges", _time.monotonic() - t0)
    _EDGE_CACHE[sf_dir] = (fp, edges)
    return edges


def _graph_nodes(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int]:
    """(nodes, node count) of the symmetric trade graph,
    session-memoized and persisted — the pagerank node derivation
    verbatim (union of both endpoint columns, distinct), built ONCE
    per (sf_dir, lineitem fingerprint) instead of once per
    pagerank/BFS invocation. An index of a static corpus, the
    `_trade_edges` contract: never precomputed across runs; a fresh
    process pays the build in its cold lane (``_index:graph_nodes``)."""
    from guagua_spark.sources.tables import table_fingerprint

    fp = table_fingerprint(sf_dir, "lineitem")
    hit = _NODE_CACHE.get(sf_dir)
    if hit is not None:
        if hit[0] == fp:
            return hit[1], hit[2]
        hit[1].unpersist()
    import time as _time

    from guagua_spark.metrics import record_index_build

    edges = _trade_edges(spark, sf_dir)
    t0 = _time.monotonic()
    src, dst = edges.columns[0], edges.columns[1]
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    record_index_build("graph_nodes", _time.monotonic() - t0)
    _NODE_CACHE[sf_dir] = (fp, nodes, n)
    return nodes, n


def _pr_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pagerank weighted-edge relation (1/outdeg per directed
    edge), session-memoized and persisted — same contract and
    derivation as before, shared by the LOCAL pagerank entry and the
    pr_* certificate build (``_index:pr_weights``)."""
    from guagua_spark.sources.tables import table_fingerprint

    fp = table_fingerprint(sf_dir, "lineitem")
    hit = _WEIGHT_CACHE.get(sf_dir)
    if hit is not None:
        if hit[0] == fp:
            return hit[1]
        hit[1].unpersist()
    import time as _time

    from guagua_spark.metrics import record_index_build

    edges = _trade_edges(spark, sf_dir)
    t0 = _time.monotonic()
    src, dst = edges.columns[0], edges.columns[1]
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
    w.count()
    record_index_build("pr_weights", _time.monotonic() - t0)
    _WEIGHT_CACHE[sf_dir] = (fp, w)
    return w


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query entry: PR_ITERATIONS rounds of PageRank on the symmetric
    trade graph — (node, rank) for every node."""
    nodes, n = _graph_nodes(spark, sf_dir)
    w = _pr_weights(spark, sf_dir)
    return pagerank(
        _trade_edges(spark, sf_dir), _prebuilt=(nodes, w, n)
    ).select("node", "rank")


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


# -- triangle counting (round 10) -------------------------------------------

#: strongest co-occurrence links kept as the motif graph's edge set — a
#: deterministic top-m selection by (support DESC, a, b) rather than a
#: fixed support threshold, because absolute co-order counts shrink as
#: the supplier universe grows (sf0.01: every pair co-occurs ≥10×;
#: sf0.1: the median pair co-occurs twice) — a fixed cut is complete at
#: one scale and empty at another, while "the m strongest links" is a
#: meaningful affinity graph at every scale.
TRI_EDGES = 1500
#: suppliers returned by the query entry, by triangle participation
TRI_TOPK = 20


def supplier_affinity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier co-purchase affinity graph: one undirected edge {a, b}
    per supplier pair appearing in the same order, weighted by co-order
    support, pruned to the TRI_EDGES strongest links.

    Shape at scale: the per-order distinct pass and the self-join both
    shuffle on l_orderkey (one exchange, reused for both join sides),
    and pair fan-out per order is C(items, 2) — bounded by order size,
    never by corpus size. Support aggregation is a partial-agg groupBy
    on the (a, b) pair key. The top-m prune is orderBy().limit() —
    Spark plans TakeOrderedAndProject (per-partition bounded heaps, no
    global sort), so the strongest-m selection never materializes or
    sorts the full pair relation. (sup DESC, a, b) is a total order,
    so the kept set is deterministic under any partitioning."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    left = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("a")
    )
    right = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("b")
    )
    pairs = (
        left.join(right, "o")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    return (
        pairs.orderBy(F.col("sup").desc(), "a", "b")
        .limit(TRI_EDGES)
        .select("a", "b")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over an undirected edge list given as
    canonical (a < b) distinct pairs — degree-ordered edge orientation
    (Suri & Vassilvitskii, WWW'11 MapReduce triangle counting; also
    Cohen's graph-twiddling): orient every edge from its (degree, id)-
    smaller endpoint to the larger, emit wedges only between a node's
    oriented out-neighbors, close each wedge against the oriented edge
    list. Every triangle is produced exactly once (its (deg, id)-
    minimum vertex is the only apex whose two sides both point out),
    and out-degrees are O(√m)-bounded, so wedge fan-out — the only
    super-linear term — is m^1.5 worst-case instead of Σ deg², which
    is what makes the shape survive celebrity nodes at 100 TB.

    Returns (node, n_tri) for every node in ≥1 triangle; Σ n_tri is
    exactly 3 × the triangle total.

    The edge list is read by FOUR subtrees (both union directions, the
    degree joins, the wedge self-join's closing side); Spark reuses
    exchanges but NOT arbitrary common subtrees, so callers with a
    non-trivial edge plan should pass a PERSISTED relation (as
    graph_triangles does — and unpersist it after materializing, the
    pagerank discipline)."""
    und = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    e = edges.join(
        deg.select(F.col("a"), F.col("deg").alias("da")), "a"
    ).join(
        deg.select(F.col("a").alias("b"), F.col("deg").alias("db")), "b"
    )
    # a < b always holds in canonical pairs, so ties orient a → b
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    x, y = oriented.alias("x"), oriented.alias("y")
    # wedge (p, q) with p strictly (deg, id)-below q — the closing
    # edge, if present, is oriented p → q by construction
    wedges = (
        x.join(y, F.col("x.u") == F.col("y.u"))
        .filter(
            (F.col("x.dv") < F.col("y.dv"))
            | (
                (F.col("x.dv") == F.col("y.dv"))
                & (F.col("x.v") < F.col("y.v"))
            )
        )
        .select(
            F.col("x.u").alias("apex"),
            F.col("x.v").alias("p"),
            F.col("y.v").alias("q"),
        )
    )
    closing = oriented.select(
        F.col("u").alias("p"), F.col("v").alias("q")
    )
    tris = wedges.join(closing, ["p", "q"])
    nodes = tris.select(
        F.explode(F.array("apex", "p", "q")).alias("node")
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


#: session memo of the TRI_EDGES-row affinity edge list — sf_dir →
#: (fingerprint, DataFrame). Two consumers per session (LOCAL
#: graph_triangles + the tri_* cert build riding q5) each re-ran the
#: corpus-sized pair join + top-m prune before round 13; the kept
#: relation is ≤ TRI_EDGES rows whatever the corpus. Build cost
#: self-reports as ``_index:affinity_edges``.
_AFF_CACHE: dict = {}


def _affinity_edges_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from guagua_spark.sources.tables import table_fingerprint

    fp = table_fingerprint(sf_dir, "lineitem")
    hit = _AFF_CACHE.get(sf_dir)
    if hit is not None:
        if hit[0] == fp:
            return hit[1]
        hit[1].unpersist()
    import time as _time

    from guagua_spark.metrics import record_index_build

    t0 = _time.monotonic()
    edges = supplier_affinity_edges(spark, sf_dir).persist()
    edges.count()
    record_index_build("affinity_edges", _time.monotonic() - t0)
    _AFF_CACHE[sf_dir] = (fp, edges)
    return edges


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query entry: the TRI_TOPK most triangle-embedded suppliers of
    the top-TRI_EDGES affinity graph — (s_suppkey, n_tri, tri_total),
    n_tri the supplier's triangle participation and tri_total the
    graph-wide triangle count (identical on every row; Σ n_tri over
    ALL nodes = 3·tri_total). Motif density is the classic community
    / collusion signal over a trade network.

    The per-node count relation is ≤ 2·TRI_EDGES rows by construction
    (only triangle members appear), so it persists for the two reads
    (global total + top-k) at a fixed cost independent of corpus size;
    the top-k is again TakeOrderedAndProject and the 1-row total
    attaches via an explicit broadcast (a bare 1-row cross join plans
    a CartesianProduct — the round-10 retention-certificate lesson).
    The ≤ TRI_TOPK-row result is materialized eagerly so both interim
    caches unpersist before return — the pagerank discipline (repeated
    invocations must not accumulate block-manager entries). The edge
    list itself is the session-memoized ``_affinity_edges_cached``
    relation (≤ TRI_EDGES rows, owned by its cache, not unpersisted
    here)."""
    edges = _affinity_edges_cached(spark, sf_dir)
    cnt = triangle_counts(edges).persist()
    lazy = _triangles_result_plan(cnt)
    out = lazy.localCheckpoint(eager=True)
    from guagua_spark.metrics import record_plan

    record_plan("graph_triangles", lazy)
    cnt.unpersist()
    return out


def _triangles_result_plan(cnt: DataFrame) -> DataFrame:
    """The (top-k ⨯ broadcast total) result shape over a per-node
    count relation — factored out so tests can pin the LAZY plan
    (graph_triangles materializes through localCheckpoint, which
    collapses the executed plan to an ExistingRDD scan)."""
    tot = cnt.agg(
        F.expr(
            "CAST(COALESCE(SUM(n_tri), 0) DIV 3 AS BIGINT)"
        ).alias("tri_total")
    )
    top = (
        cnt.orderBy(F.col("n_tri").desc(), "node")
        .limit(TRI_TOPK)
        .select(F.col("node").alias("s_suppkey"), "n_tri")
    )
    return top.crossJoin(F.broadcast(tot)).orderBy(
        F.col("n_tri").desc(), "s_suppkey"
    )


def _triangles_oracle() -> str:
    """Canonical a < b < c triple-join replay — counts every triangle
    once without orientation (the oracle may be O(n³); the Spark side
    may not), then the same explode / group / top-k."""
    return f"""
WITH li AS MATERIALIZED (
  -- referenced twice by the pair join: materialize, or DuckDB inlines
  -- a full distinct per reference
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
),
p AS (
  SELECT l1.l_suppkey AS a, l2.l_suppkey AS b, COUNT(*) AS sup
  FROM li l1
  JOIN li l2 ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_suppkey < l2.l_suppkey
  GROUP BY 1, 2
),
e AS MATERIALIZED (
  -- referenced THREE times by the triangle join: inlined, each copy
  -- recomputes the corpus-sized pair join — 3 concurrent spills
  -- filled a 60 GB disk at sf10 (round 12); materialized it is
  -- TRI_EDGES rows
  SELECT a, b FROM p ORDER BY sup DESC, a, b LIMIT {TRI_EDGES}
),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (
  SELECT x AS node FROM t
  UNION ALL SELECT y FROM t
  UNION ALL SELECT z FROM t
),
cnt AS (SELECT node, COUNT(*) AS n_tri FROM nodes GROUP BY node),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tri_total FROM t)
SELECT CAST(node AS BIGINT) AS s_suppkey,
       CAST(n_tri AS BIGINT) AS n_tri,
       tri_total
FROM cnt CROSS JOIN tot
ORDER BY n_tri DESC, s_suppkey
LIMIT {TRI_TOPK}
""".strip()


def tri_cert_cols(spark: SparkSession, sf_dir: str) -> list:
    """``tri_*`` certificate as memoized literal columns for the q5
    contract host (certmemo): graph-wide triangle total, top-k row
    count, and the Σ-safe binder over (s_suppkey, n_tri) — a miscount
    of any node's triangle participation, a wrong total, or a wrong
    top-k selection flips it. Puts the LOCAL wedge-join triangle
    operator behind the driver's value-hash gate (round 12: the last
    graph family outside the certificate pattern)."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.certmemo import cached_cert_cols

    def _build() -> DataFrame:
        t = graph_triangles(spark, sf_dir)
        return t.agg(
            F.min("tri_total").cast("bigint").alias("tri_total"),
            F.count(F.lit(1)).cast("bigint").alias("tri_topk_rows"),
            F.sum(
                binder_hash_col("tri", F.col("s_suppkey"), F.col("n_tri"))
            )
            .cast("bigint")
            .alias("tri_binder"),
        )

    return cached_cert_cols(
        spark,
        sf_dir,
        "tri",
        ("lineitem",),
        "tri_total bigint, tri_topk_rows bigint, tri_binder bigint",
        _build,
    )


def sql_tri_cert_cte() -> str:
    """``tric`` 1-row CTE wrapping the canonical triple-join oracle
    verbatim — the DuckDB twin of tri_cert_cols."""
    from guagua_spark.functions.scale import binder_hash_sql

    binder = binder_hash_sql(
        "tri", "CAST(s_suppkey AS VARCHAR)", "CAST(n_tri AS VARCHAR)"
    )
    return (
        "tric AS MATERIALIZED (\n"
        "  SELECT CAST(MIN(tri_total) AS BIGINT) AS tri_total,\n"
        "         CAST(COUNT(*) AS BIGINT) AS tri_topk_rows,\n"
        f"         CAST(SUM({binder}) AS BIGINT) AS tri_binder\n"
        f"  FROM ({_triangles_oracle()}) tq)"
    )


#: oracle-tested locally (tests/test_graph.py); 50-slot contract full
LOCAL_QUERIES = {
    "graph_pagerank": graph_pagerank,
    "graph_triangles": graph_triangles,
}
LOCAL_ORACLE_SQL = {
    "graph_pagerank": _pagerank_oracle(),
    "graph_triangles": _triangles_oracle(),
}


# ---------------------------------------------------------------------------
# BFS hop distance (iterative frontier expansion)


#: hop cap for the BFS query — the symmetric trade graph is bipartite
#: and near-connected, so every reachable node appears within a few
#: hops; the cap bounds BOTH the Spark loop and the oracle's recursion
BFS_MAX_DEPTH = 6


def bfs_depths(
    edges: DataFrame,
    source: str,
    max_depth: int,
    n_nodes: int | None = None,
) -> DataFrame:
    """Minimum hop distance from ``source`` over a directed edge list
    ``(a, b)`` — Pregel BFS collapsed to the Spark-idiomatic loop
    (SURVEY.md §2.3 note: the superstep IS a join + distinct): each
    round joins the frontier against the edges, anti-joins the visited
    set, and unions the newly discovered nodes at depth d.

    100 TB shape: per round one equi-join on the node key (AQE
    skew-splits a celebrity node) and one LEFT ANTI against the visited
    set — both key-only relations (~tens of bytes/row); exactly ONE
    action per round (the frontier count, which doubles as its persist
    materialization). The visited set is the union of the persisted
    per-depth layers (every leaf cached, so the anti-join never
    recomputes a prior round) and never leaves the cluster (no driver
    collect). The result is ``localCheckpoint``-ed before every layer
    is unpersisted: the caller gets materialized, lineage-free data
    whose executor blocks the ContextCleaner reclaims on GC — nothing
    stays pinned in the cache for the session's lifetime.

    ``n_nodes`` (optional): the graph's total node count, when the
    caller already owns it (the session-memoized ``_graph_relations``).
    Once the cumulative visited count reaches it no undiscovered node
    exists, so the loop stops WITHOUT running the final empty round —
    the round that exists only to observe an empty frontier (round 13:
    ~1–3 s per invocation at sf0.1, twice per bench session). Result
    is identical by construction: the skipped round could only ever
    return 0 new nodes."""
    spark = edges.sparkSession
    src_col, dst_col = edges.columns[0], edges.columns[1]
    seed = spark.createDataFrame(
        [(source, 0)], "node string, depth int"
    ).persist()
    layers = [seed]  # per-depth (node, depth) layers, each persisted
    visited = seed
    frontier = seed.select("node")
    n_visited = 1
    try:
        seed.count()
        for d in range(1, max_depth + 1):
            if n_nodes is not None and n_visited >= n_nodes:
                break
            # anti-join BEFORE distinct: the visited prune is a
            # broadcast (map-side) join of key-only layers, so running
            # it first means the distinct's exchange carries only the
            # NEWLY discovered nodes — in the dense middle rounds of a
            # near-connected graph that is a tiny fraction of the raw
            # candidate multiset (same set either way: left_anti keeps
            # every non-matching row, distinct collapses after).
            nxt = (
                frontier.join(edges, frontier["node"] == edges[src_col])
                .select(F.col(dst_col).alias("node"))
                .join(visited, "node", "left_anti")
                .distinct()
                .withColumn("depth", F.lit(d))
                .persist()
            )
            c = nxt.count()  # the round's ONLY action
            if d == 1:
                from guagua_spark.metrics import record_plan

                # snapshot the FIRST round's executed layer plan (the
                # returned frame is a checkpoint stub the bench
                # tripwire can't see). Round 1, not the last: the
                # final round's anti-join sits near the AQE broadcast
                # threshold and flips BHJ↔SMJ run-to-run (observed
                # shuffles 6↔7 on identical code), which would
                # false-alarm the plan diff; round 1's relations are
                # far from any threshold, and a code change that adds
                # a shuffle to the per-round layer shows up in round 1
                # all the same
                record_plan("graph_bfs_depth", nxt)
            if c == 0:
                nxt.unpersist()
                break
            n_visited += c
            layers.append(nxt)
            visited = visited.union(nxt)
            frontier = nxt.select("node")
        return visited.localCheckpoint(eager=True)
    finally:
        for layer in layers:
            layer.unpersist()


def graph_bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query entry: BFS hop distances on the symmetric trade graph from
    the lexicographically-smallest customer node — (node, depth) for
    every node within BFS_MAX_DEPTH hops."""
    edges = _trade_edges(spark, sf_dir)  # session-persisted shared build
    _nodes, n = _graph_nodes(spark, sf_dir)
    source = edges.agg(
        F.min(
            F.when(F.col("a").startswith("c"), F.col("a"))
        ).alias("src")
    ).first()["src"]
    return bfs_depths(edges, source, BFS_MAX_DEPTH, n_nodes=n)


def _bfs_oracle() -> str:
    """Recursive replay with UNION (not UNION ALL): the recursion
    carries (node, depth) PAIRS and the set-union dedups them, so the
    row count is bounded by nodes x depth — path enumeration under
    UNION ALL would be combinatorial on this dense bipartite graph.
    MIN(depth) per node is exactly the frontier BFS's first-discovery
    depth."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
e AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
walk(node, depth) AS (
  SELECT (SELECT MIN(a) FROM e WHERE a LIKE 'c%') AS node, 0 AS depth
  UNION
  SELECT e.b, w.depth + 1
  FROM walk w JOIN e ON e.a = w.node
  WHERE w.depth < {BFS_MAX_DEPTH}
)
SELECT node, CAST(MIN(depth) AS INT) AS depth FROM walk GROUP BY node
""".strip()


LOCAL_QUERIES["graph_bfs_depth"] = graph_bfs_depth
LOCAL_ORACLE_SQL["graph_bfs_depth"] = _bfs_oracle()


def bfs_cert_cols(spark: SparkSession, sf_dir: str) -> list:
    """``bfs_*`` certificate as memoized literal columns for the q4
    contract host (certmemo pattern, same ride as ``pr_*`` — the two
    graph certificates share the `_trade_edges` build): reachable node
    count, Σ first-discovery depth, and the Σ-safe binder over
    (node, depth) — a node discovered at the wrong hop, dropped, or
    double-counted flips it. Puts the LOCAL frontier-BFS operator
    behind the driver's value-hash gate inside the 50-slot cap."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.certmemo import cached_cert_cols

    def _build() -> DataFrame:
        d = graph_bfs_depth(spark, sf_dir)
        return d.agg(
            F.count(F.lit(1)).cast("bigint").alias("bfs_n_nodes"),
            F.sum("depth").cast("bigint").alias("bfs_depth_sum"),
            F.sum(binder_hash_col("bfs", F.col("node"), F.col("depth")))
            .cast("bigint")
            .alias("bfs_binder"),
        )

    return cached_cert_cols(
        spark,
        sf_dir,
        "bfs",
        ("orders", "lineitem"),
        "bfs_n_nodes bigint, bfs_depth_sum bigint, bfs_binder bigint",
        _build,
    )


def sql_bfs_cert_cte() -> str:
    """``bfsc`` 1-row CTE wrapping the standalone recursive-CTE BFS
    oracle verbatim — the DuckDB twin of bfs_cert_cols, spliced into
    the q4 contract oracle."""
    from guagua_spark.functions.scale import binder_hash_sql

    binder = binder_hash_sql("bfs", "node", "CAST(depth AS VARCHAR)")
    return (
        "bfsc AS MATERIALIZED (\n"
        "  SELECT CAST(COUNT(*) AS BIGINT) AS bfs_n_nodes,\n"
        "         CAST(SUM(depth) AS BIGINT) AS bfs_depth_sum,\n"
        f"         CAST(SUM({binder}) AS BIGINT) AS bfs_binder\n"
        f"  FROM ({_bfs_oracle()}) bq)"
    )
