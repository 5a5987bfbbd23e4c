"""Extended relational operators vs the DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from guagua_spark.operators.relational_ext import ORACLE_SQL, QUERIES

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_relational_ext_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ORACLE_SQL[name], rtol=1e-6)


def test_approx_distinct_within_tolerance(spark, oracle_sf_dir, duck):
    row = QUERIES["rx_approx_distinct"](spark, oracle_sf_dir).collect()[0]
    exact_n, = duck.execute(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders"
    ).fetchone()
    assert abs(row.n_customers - exact_n) / exact_n < 0.05
    exact_q = [
        duck.execute(
            f"SELECT quantile_disc(o_totalprice, {q}) FROM orders"
        ).fetchone()[0]
        for q in (0.5, 0.9, 0.99)
    ]
    for got, want in zip((row.p50, row.p90, row.p99), exact_q):
        assert abs(got - want) / want < 0.05, (got, want)


def test_semi_join_plan_has_no_duplicating_join(spark, oracle_sf_dir):
    plan = (
        QUERIES["rx_semi_join_customers"](spark, oracle_sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan, plan
