"""PageRank vs the DuckDB recursive-CTE replay, plus structural
properties (mass conservation on the symmetric graph, hand-computed
tiny-graph values, lineage truncation on long runs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from guagua_spark.operators.graph import (
    LOCAL_ORACLE_SQL,
    LOCAL_QUERIES,
    pagerank,
)

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


def test_pagerank_matches_oracle(spark, oracle_sf_dir, duck):
    df = LOCAL_QUERIES["graph_pagerank"](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["graph_pagerank"])


def test_pagerank_conserves_mass_on_symmetric_graph(spark, oracle_sf_dir):
    rows = LOCAL_QUERIES["graph_pagerank"](spark, oracle_sf_dir).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-9  # no dangling nodes → Σrank = 1
    assert all(r["rank"] > 0 for r in rows)


def test_pagerank_tiny_graph_hand_values(spark):
    """Directed triangle a→b→c→a: every node's rank stays exactly 1/3
    at every iteration (the uniform vector is the fixed point)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    rows = pagerank(edges, iterations=4).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r["rank"] - 1.0 / 3.0) < 1e-12


def test_pagerank_dangling_and_star(spark):
    """Star a→b, a→c (b, c dangling): after 1 iteration from uniform,
    b = c = (1−d)/3 + d·(1/3)·(1/2) and a = (1−d)/3."""
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    got = {
        r["node"]: r["rank"] for r in pagerank(edges, iterations=1).collect()
    }
    d = 0.85
    assert abs(got["a"] - (1 - d) / 3) < 1e-12
    expected_bc = (1 - d) / 3 + d / 6
    assert abs(got["b"] - expected_bc) < 1e-12
    assert abs(got["c"] - expected_bc) < 1e-12


def test_pagerank_long_run_truncates_lineage(spark):
    """12 iterations crosses two checkpoint boundaries — the run must
    stay fast/planable (smoke: completes, ranks still sum to 1 on a
    symmetric pair)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    rows = pagerank(edges, iterations=12).collect()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9


# -- triangle counting -------------------------------------------------------


def test_triangles_matches_oracle(spark, oracle_sf_dir, duck):
    df = LOCAL_QUERIES["graph_triangles"](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["graph_triangles"])


def test_triangle_counts_k4(spark):
    """K4 has 4 triangles; every node sits in C(3,2) = 3 of them."""
    from guagua_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4, "a long, b long")
    got = {r["node"]: r["n_tri"] for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_pendant_excluded(spark):
    """Triangle 1-2-3 plus pendant edge 3-4: the pendant node is in no
    triangle and must be absent from the counts."""
    from guagua_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
    )
    got = {r["node"]: r["n_tri"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_path_graph_empty(spark):
    from guagua_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    assert triangle_counts(edges).count() == 0


def test_triangles_total_consistency(spark, sf_dir):
    """Σ n_tri over ALL nodes = 3 × tri_total (each triangle has three
    members), and the query's tri_total column agrees."""
    from guagua_spark.operators.graph import (
        graph_triangles,
        supplier_affinity_edges,
        triangle_counts,
    )

    cnt = triangle_counts(supplier_affinity_edges(spark, sf_dir))
    total3 = cnt.agg(F.sum("n_tri")).first()[0] or 0
    assert total3 % 3 == 0
    rows = graph_triangles(spark, sf_dir).collect()
    assert rows and all(r["tri_total"] == total3 // 3 for r in rows)


def test_triangles_plan_has_no_cartesian_and_bounded_topk(spark, sf_dir):
    """The 1-row total attaches by broadcast (no CartesianProduct) and
    both global selections (edge prune, top-k) plan as
    TakeOrderedAndProject — never a full global Sort + Limit. Pins the
    LAZY result plan (the query entry materializes + unpersists, which
    collapses its executed plan to an ExistingRDD scan)."""
    from guagua_spark.operators.graph import (
        _triangles_result_plan,
        supplier_affinity_edges,
        triangle_counts,
    )

    cnt = triangle_counts(supplier_affinity_edges(spark, sf_dir))
    p = _plan(_triangles_result_plan(cnt))
    assert "CartesianProduct" not in p, p
    assert "TakeOrderedAndProject" in p, p


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bfs_depth_matches_oracle(spark, oracle_sf_dir, duck):
    df = LOCAL_QUERIES["graph_bfs_depth"](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["graph_bfs_depth"])


def test_bfs_tiny_graph_hand_depths(spark):
    """Path a-b-c-d plus a detour a-x-c: min-hop semantics must pick
    depth 2 for c (through either parent), and the depth cap must
    truncate discovery."""
    from guagua_spark.operators.graph import bfs_depths

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "x"), ("x", "c")],
        "a string, b string",
    )
    got = {r["node"]: r["depth"] for r in bfs_depths(edges, "a", 6).collect()}
    assert got == {"a": 0, "b": 1, "x": 1, "c": 2, "d": 3}
    capped = {
        r["node"]: r["depth"] for r in bfs_depths(edges, "a", 2).collect()
    }
    assert capped == {"a": 0, "b": 1, "x": 1, "c": 2}


def test_bfs_unreachable_nodes_absent(spark):
    """Disconnected component never appears (BFS emits reached nodes
    only — the oracle's recursive walk has the same property)."""
    from guagua_spark.operators.graph import bfs_depths

    edges = spark.createDataFrame(
        [("a", "b"), ("p", "q")], "a string, b string"
    )
    got = {r["node"] for r in bfs_depths(edges, "a", 6).collect()}
    assert got == {"a", "b"}
