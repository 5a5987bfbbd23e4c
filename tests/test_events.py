"""Event analytics operators vs the DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from guagua_spark.operators.events import ORACLE_SQL, QUERIES

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_events_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ORACLE_SQL[name], rtol=1e-6)


def test_asof_join_tie_and_miss_semantics(spark):
    """A right row at EXACTLY the left ts matches (≤); a left row
    before any right row gets nulls; the latest preceding right row
    wins (not the first)."""
    from guagua_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 20, "b"), (2, 10, "c")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (2, 11, 300.0)],
        "k long, ts long, v double",
    )
    got = {
        (r.k, r.ts, r.asof_ts, r.asof_v)
        for r in asof_join(
            left, right, on="k", right_cols=("v",)
        ).collect()
    }
    assert got == {
        (1, 5, 5, 100.0),     # tie: right row at equal ts included
        (1, 20, 15, 200.0),   # latest preceding, not earliest
        (2, 10, None, None),  # nothing at or before → nulls
    }


def test_sessionize_single_exchange(spark, oracle_sf_dir):
    """Both window passes must reuse ONE exchange+sort on user_id."""
    plan = (
        QUERIES["events_sessionize"](spark, oracle_sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(user_id") <= 1, plan
