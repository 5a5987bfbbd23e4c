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


def test_sessionize_single_exchange(spark, oracle_sf_dir):
    """Both window passes must reuse ONE exchange+sort on user_id."""
    plan = (
        QUERIES["events_sessionize"](spark, oracle_sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(user_id") <= 1, plan
