"""Iterative-workload query entries vs oracle (single-step math) and
rows-only sanity for the full engine runs."""

from __future__ import annotations

import pytest

from guagua_spark.operators.iterative import ORACLE_SQL, QUERIES

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_step_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ORACLE_SQL[name])


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
