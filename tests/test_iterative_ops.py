"""Iterative-workload query entries vs oracle (single-step math) and
rows-only sanity for the full engine runs."""

from __future__ import annotations

import pytest

from guagua_spark.operators.iterative import (
    LOCAL_ORACLE_SQL,
    LOCAL_QUERIES,
    ORACLE_SQL,
    QUERIES,
)

from oracle import assert_matches_oracle, duck_connection

ALL_QUERIES = {**QUERIES, **LOCAL_QUERIES}
ALL_ORACLE_SQL = {**ORACLE_SQL, **LOCAL_ORACLE_SQL}


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL_ORACLE_SQL))
def test_step_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = ALL_QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ALL_ORACLE_SQL[name])


def test_nn_train_rows(spark, oracle_sf_dir):
    # retired from the driver contract (rows-only by design); the RPROP
    # engine path stays exercised here
    df = LOCAL_QUERIES["nn_train"](spark, oracle_sf_dir)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["iterations"] == 5
    assert 0.0 <= rows[0]["train_error"] <= 1.0


def test_lr_train_rows(spark, oracle_sf_dir):
    df = QUERIES["lr_train"](spark, oracle_sf_dir)
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["iterations"] == 5
    assert abs(rows[0]["w_qty"]) > 0  # learned something


def test_kmeans_train_rows(spark, oracle_sf_dir):
    df = QUERIES["kmeans_train"](spark, oracle_sf_dir)
    rows = df.collect()
    assert len(rows) == 4  # k centroids
    tags = sorted(r["tag"] for r in rows)
    assert tags == [0, 1, 2, 3]
