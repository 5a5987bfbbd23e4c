"""PageRank property tests: the distributed superstep loop must agree
with an independent dense numpy power iteration (same update rule,
same dangling semantics) on random graphs, including self-loops,
duplicate edges, and dangling nodes."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from guagua_spark.operators.graph import PR_DAMPING, pagerank

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _numpy_pagerank(edges, iterations, d=PR_DAMPING):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, _ in edges:
        outdeg[idx[a]] += 1  # duplicate edges count like the DataFrame
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1.0 - d) / n)
        for a, b in edges:
            nxt[idx[b]] += d * r[idx[a]] / outdeg[idx[a]]
        r = nxt
    return dict(zip(nodes, r))


_edge = st.tuples(st.integers(0, 7), st.integers(0, 7))


@given(
    edges=st.lists(_edge, min_size=1, max_size=25),
    iterations=st.integers(1, 4),
)
@_SETTINGS
def test_pagerank_matches_numpy_power_iteration(spark, edges, iterations):
    names = [(f"n{a}", f"n{b}") for a, b in edges]
    df = spark.createDataFrame(names, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=iterations).collect()
    }
    want = _numpy_pagerank(names, iterations)
    assert set(got) == set(want)
    for v, rank in want.items():
        assert abs(got[v] - rank) < 1e-9, (v, got[v], rank)
