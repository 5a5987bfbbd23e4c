"""Pins bench.py's plan-diff alarm (round-9 verdict nit): a genuine
shuffle/sort increase must trip the REGRESSIONS banner, while the
durable-store shape — scans up, shuffles down — must stay info-only.
Pure-dict unit tests: no SparkSession."""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(__file__), os.pardir, "bench.py"),
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _m(shuffles=0, sorts=0, scans=0, broadcasts=0):
    return {
        "shuffles": shuffles,
        "sorts": sorts,
        "scans": scans,
        "broadcasts": broadcasts,
    }


def test_shuffle_increase_is_a_regression():
    reg, info = bench._plan_diff(
        {"q": _m(shuffles=2, scans=1)}, {"q": _m(shuffles=3, scans=1)}
    )
    assert "q" in reg
    assert reg["q"]["now"]["shuffles"] == 3
    assert info == {}


def test_sort_increase_is_a_regression():
    reg, _ = bench._plan_diff(
        {"q": _m(sorts=1)}, {"q": _m(sorts=2)}
    )
    assert "q" in reg


def test_scans_up_shuffles_down_is_info_only():
    # the durable-store shape: a stored index table replaces a rebuilt
    # subtree — more parquet scans, fewer exchanges (the r8 false alarm)
    reg, info = bench._plan_diff(
        {"q": _m(shuffles=4, scans=1, broadcasts=4)},
        {"q": _m(shuffles=2, scans=2, broadcasts=2)},
    )
    assert reg == {}
    assert info == {"q": {"scans": [1, 2], "broadcasts": [4, 2]}}


def test_new_query_without_baseline_is_silent():
    reg, info = bench._plan_diff({}, {"q": _m(shuffles=9)})
    assert reg == {} and info == {}


def test_unchanged_plan_is_silent():
    reg, info = bench._plan_diff(
        {"q": _m(shuffles=2, sorts=1, scans=3, broadcasts=1)},
        {"q": _m(shuffles=2, sorts=1, scans=3, broadcasts=1)},
    )
    assert reg == {} and info == {}


def test_plan_snapshot_defers_stringify_and_drains(spark):
    """record_plan stores only the DataFrame ref (stringifying the
    executed plan per call cost ~0.1 s driver-side — BFS records once
    per ROUND, measured +0.9 s before the deferral); the structural
    counts are computed once per name at drain time, last-wins, and
    the registry clears."""
    from guagua_spark import metrics

    metrics.drain_plan_snapshots()
    df = spark.range(100).selectExpr("id % 7 AS k").groupBy("k").count()
    df.collect()
    metrics.record_plan("probe", spark.range(3))  # overwritten below
    metrics.record_plan("probe", df)  # last-wins
    snaps = metrics.drain_plan_snapshots()
    assert set(snaps) == {"probe"}
    m = snaps["probe"]
    assert set(m) == {"shuffles", "broadcasts", "sorts", "scans"}
    assert m["shuffles"] >= 1  # the groupBy exchange
    assert metrics.drain_plan_snapshots() == {}  # drained
