"""Driver-contract smoke: entry() runs, queries()/oracle_sql() keys align."""

from __future__ import annotations

import importlib.util
import os

import pytest

_ENTRY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location("__spark_entry__", _ENTRY)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.fieldNames() == [
        "n_name",
        "revenue",
        "pr_n_nodes",  # PageRank certificate rides the flagship row
        "pr_rank_wsum",
        "bfs_n_nodes",  # BFS hop-distance certificate (round 12)
        "bfs_depth_sum",
        "bfs_binder",
    ]


def test_oracle_keys_subset_of_queries(entry_mod):
    q = entry_mod.queries()
    s = entry_mod.oracle_sql()
    assert q, "queries() must not be empty"
    missing = set(s) - set(q)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_all_queries_run_at_smoke_sf(spark, entry_mod, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
        df.limit(5).collect()


def test_every_oracle_sql_parses_in_duckdb(entry_mod, oracle_sf_dir):
    """EXPLAIN every oracle (contract + LOCAL) against the fixture
    views — catches SQL typos/binding errors in seconds, without
    executing the heavy recursive CTEs (the value comparisons live in
    the per-module oracle tests and the driver sweep)."""
    import importlib

    from oracle import duck_connection

    con = duck_connection(oracle_sf_dir)
    oracles = dict(entry_mod.oracle_sql())
    for mod_name in (
        "relational_ext",
        "dedup",
        "similarity",
        "text",
        "pipeline",
        "packing",
        "iterative",
        "inference",
        "graph",
        "features",
    ):
        mod = importlib.import_module(f"guagua_spark.operators.{mod_name}")
        for key, sql in getattr(mod, "LOCAL_ORACLE_SQL", {}).items():
            oracles[f"LOCAL:{key}"] = sql
    bad = []
    for name, sql in oracles.items():
        if sql is None:
            continue
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:
            bad.append(f"{name}: {type(e).__name__}: {str(e)[:80]}")
    con.close()
    assert not bad, "\n".join(bad)
    assert len(oracles) >= 60  # 50 contract + the LOCAL surface
