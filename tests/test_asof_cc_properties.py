"""Property-based checks: asof_join and connected_components vs
pure-Python reference implementations on randomized inputs.

Few examples, Spark-job-per-example — the value is the randomized edge
cases (empty sides, all-tied timestamps, disconnected singletons), not
volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from guagua_spark.operators.dedup import connected_components
from guagua_spark.operators.events import asof_join

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, ts) pairs; right side deduped per (key, ts) so the as-of pick is
# unambiguous
_row = st.tuples(st.integers(0, 3), st.integers(0, 20))


@_SETTINGS
@given(
    left=st.lists(_row, min_size=0, max_size=12),
    right=st.lists(_row, min_size=0, max_size=12, unique=True),
)
def test_asof_join_matches_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k long, ts long, rid long",
    )
    rdf = spark.createDataFrame(
        [(k, t, float(k * 100 + t)) for (k, t) in right],
        "k long, ts long, v double",
    )
    got = {
        (r.rid, r.asof_ts, r.asof_v)
        for r in asof_join(ldf, rdf, on="k", right_cols=("v",)).collect()
    }
    want = set()
    for i, (k, t) in enumerate(left):
        cands = [(rt, rv) for (rk, rt), rv in
                 [((rk, rt), float(rk * 100 + rt)) for (rk, rt) in right]
                 if rk == k and rt <= t]
        if cands:
            bt, bv = max(cands)
            want.add((i, bt, bv))
        else:
            want.add((i, None, None))
    assert got == want


def _cc_reference(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=20,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_connected_components_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        (r.node, r.label)
        for r in connected_components(df, "a", "b").collect()
    }
    assert got == set(_cc_reference(edges).items())


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=20,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_star_components_matches_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        (r.node, r.label)
        for r in connected_components(
            df, "a", "b", algorithm="star"
        ).collect()
    }
    assert got == set(_cc_reference(edges).items())


def test_adversarial_path_graph(spark):
    """10k-node path graph: diameter-bound propagation must
    AUTO-ESCALATE to the large-star/small-star contraction (Kiveris et
    al., SoCC'14) rather than fail or return partial labels — the
    caller passes nothing and still gets exact components."""
    import math

    import pyspark.sql.functions as F

    from guagua_spark.operators.dedup import star_components

    n = 10_000
    path = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    # default propagation, tiny budget → transparent star escalation
    rows = connected_components(path, "a", "b", max_rounds=8).collect()
    assert len(rows) == n
    assert all(r.label == 0 for r in rows)

    labels, rounds = star_components(path, "a", "b")
    # measured 15 rounds at n=10k (≈ log2 n + 2); 2·log2(n) is the
    # regression ceiling, far under the O(log² n) worst-case bound
    assert rounds <= 2 * math.ceil(math.log2(n))
    rows = labels.collect()
    assert len(rows) == n
    assert all(r.label == 0 for r in rows)


def test_star_raises_on_round_budget(spark):
    """Like propagation, star must REFUSE rather than return labels
    from a partially-contracted edge set."""
    import pyspark.sql.functions as F
    import pytest

    from guagua_spark.operators.dedup import star_components

    path = spark.range(500).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    with pytest.raises(RuntimeError, match="converge"):
        star_components(path, "a", "b", max_rounds=2)


def test_star_on_clique_heavy_graph(spark):
    """Dense cliques are the common near-dup component shape AND the
    worst case for the large-star stage's skipped distinct (every
    neighbor of v emits the same (v, component-min) edge — multiplicity
    O(degree), ≤|E| total rows). The contraction must stay exact
    there, not just on sparse Hypothesis graphs."""
    import itertools

    from guagua_spark.operators.dedup import star_components

    edges = []
    for c in range(4):  # 4 cliques of 25 nodes: 4 × 300 edges
        nodes = range(c * 100, c * 100 + 25)
        edges += list(itertools.combinations(nodes, 2))
    df = spark.createDataFrame(edges, "a long, b long")
    labels, _ = star_components(df, "a", "b")
    got = {(r.node, r.label) for r in labels.collect()}
    want = {
        (n, c * 100) for c in range(4) for n in range(c * 100, c * 100 + 25)
    }
    assert got == want


def test_star_labels_self_loop_only_nodes(spark):
    """A node whose only edge is a self-pair must appear (labeled with
    itself) from BOTH algorithms — row-identical outputs."""
    df = spark.createDataFrame([(5, 5), (1, 2)], "a long, b long")
    prop = {
        (r.node, r.label)
        for r in connected_components(df, "a", "b").collect()
    }
    star = {
        (r.node, r.label)
        for r in connected_components(
            df, "a", "b", algorithm="star"
        ).collect()
    }
    assert prop == star == {(1, 1), (2, 1), (5, 5)}
