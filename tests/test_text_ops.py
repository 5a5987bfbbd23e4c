"""Text-analysis operators vs DuckDB oracle."""

from __future__ import annotations

import pytest

from guagua_spark.operators.text import ORACLE_SQL, QUERIES

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_text_op_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ORACLE_SQL[name])
