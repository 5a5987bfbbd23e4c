"""Phase probe for the graph family at sf0.1: where do LOCAL
graph_pagerank / graph_bfs_depth seconds go — the per-invocation
nodes/weighted-edge builds, or the superstep loop itself? (guide §1.1:
decide empirically before restructuring).

Usage: python scripts/r13_probe_graph.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from guagua_spark.operators.graph import (  # noqa: E402
    BFS_MAX_DEPTH,
    PR_DAMPING,
    PR_ITERATIONS,
    _trade_edges,
    bfs_depths,
    graph_bfs_depth,
    graph_pagerank,
    pagerank,
)
from guagua_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r13_probe_graph", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    edges = _trade_edges(spark, sf_dir)
    print(f"trade_edges build+persist: {time.monotonic()-t0:.2f}s "
          f"({edges.count()} edges)")

    # whole-entry laps (edges already cached — the LOCAL-lane shape
    # when the cert build ran first)
    for name, fn in (("pagerank", graph_pagerank), ("bfs", graph_bfs_depth)):
        laps = []
        for _ in range(3):
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            laps.append(round(time.monotonic() - t0, 2))
        print(f"{name} entry laps: {laps}")

    # pagerank phase split
    src, dst = edges.columns[0], edges.columns[1]
    for lap in range(2):
        t0 = time.monotonic()
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
            .persist()
        )
        n = nodes.count()
        t1 = time.monotonic()
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
        t2 = time.monotonic()
        base = (1.0 - PR_DAMPING) / n
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
        for _i in range(PR_ITERATIONS):
            contribs = (
                w.join(ranks, w["__src"] == ranks["node"])
                .groupBy("__dst")
                .agg(F.sum(F.col("rank") * F.col("__wt")).alias("__in"))
            )
            ranks = nodes.join(
                contribs, nodes["node"] == contribs["__dst"], "left"
            ).select(
                "node",
                (
                    F.lit(base)
                    + F.lit(PR_DAMPING)
                    * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
        ranks = ranks.localCheckpoint(eager=True)
        t3 = time.monotonic()
        nodes.unpersist()
        w.unpersist()
        print(
            f"pr lap{lap}: nodes {t1-t0:.2f}s  w {t2-t1:.2f}s  "
            f"{PR_ITERATIONS}-round job {t3-t2:.2f}s (n={n})"
        )

    # bfs round split
    source = edges.agg(
        F.min(F.when(F.col("a").startswith("c"), F.col("a"))).alias("s")
    ).first()["s"]
    t0 = time.monotonic()
    seed = spark.createDataFrame([(source, 0)], "node string, depth int").persist()
    seed.count()
    layers, visited, frontier = [seed], seed, seed.select("node")
    print(f"bfs seed: {time.monotonic()-t0:.2f}s")
    for d in range(1, BFS_MAX_DEPTH + 1):
        t0 = time.monotonic()
        nxt = (
            frontier.join(edges, frontier["node"] == edges["a"])
            .select(F.col("b").alias("node"))
            .join(visited, "node", "left_anti")
            .distinct()
            .withColumn("depth", F.lit(d))
            .persist()
        )
        c = nxt.count()
        print(f"bfs round {d}: {time.monotonic()-t0:.2f}s ({c} new)")
        if c == 0:
            nxt.unpersist()
            break
        layers.append(nxt)
        visited = visited.union(nxt)
        frontier = nxt.select("node")
    t0 = time.monotonic()
    out = visited.localCheckpoint(eager=True)
    print(f"bfs checkpoint: {time.monotonic()-t0:.2f}s ({out.count()} rows)")
    for lyr in layers:
        lyr.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
