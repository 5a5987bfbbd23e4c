"""PageRank vs the DuckDB recursive-CTE replay, plus structural
properties (mass conservation on the symmetric graph, hand-computed
tiny-graph values, lineage truncation on long runs)."""

from __future__ import annotations

import pytest

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
