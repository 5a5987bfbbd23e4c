"""Feature binning / WOE / IV / KS vs the DuckDB oracle plus
statistical sanity (bins partition the table, KS in [0,1], IV ≥ 0 is
NOT required — smoothing can nudge a useless feature slightly)."""

from __future__ import annotations

import math

import pytest

from guagua_spark.operators.features import (
    LOCAL_ORACLE_SQL,
    LOCAL_QUERIES,
    N_BINS,
)

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(LOCAL_ORACLE_SQL))
def test_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = LOCAL_QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL[name])


def test_bins_partition_the_table(spark, oracle_sf_dir):
    from guagua_spark.sources.tables import load_table

    rows = LOCAL_QUERIES["feature_woe_bins"](spark, oracle_sf_dir).collect()
    total = load_table(spark, oracle_sf_dir, "lineitem").count()
    assert sum(r["n"] for r in rows) == total
    assert 2 <= len(rows) <= N_BINS
    # equal-frequency: no bin should dwarf the others (ties can skew)
    assert max(r["n"] for r in rows) < total
    for r in rows:
        assert math.isfinite(r["woe"])  # smoothing keeps WOE finite


def test_iv_ks_shapes(spark, oracle_sf_dir):
    rows = {
        r["feature"]: r
        for r in LOCAL_QUERIES["feature_iv_ks"](spark, oracle_sf_dir).collect()
    }
    assert set(rows) == {"l_extendedprice", "l_quantity"}
    for r in rows.values():
        assert 0.0 <= r["ks"] <= 1.0
        assert math.isfinite(r["iv"])


def test_psi_near_zero_on_random_split(spark, oracle_sf_dir):
    """An even/odd orderkey split draws both slices from the same
    distribution, so PSI must be tiny (well under the 0.1 'no drift'
    convention) but still finite and non-negative-ish."""
    row = LOCAL_QUERIES["feature_psi"](spark, oracle_sf_dir).first()
    assert row["n_bins"] >= 2
    assert math.isfinite(row["psi"])
    assert abs(row["psi"]) < 0.1


def test_correlation_single_scan_and_bounds(spark, oracle_sf_dir):
    """All C(k,2) cells from ONE scan (single Exchange for the global
    agg) and every corr in [-1, 1]."""
    df = LOCAL_QUERIES["feature_correlation"](spark, oracle_sf_dir)
    rows = df.collect()
    assert len(rows) == 6
    assert all(-1.0 <= r["corr"] <= 1.0 for r in rows)
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]  # AQE repeats the tree
    )
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_corr" in plan, plan
