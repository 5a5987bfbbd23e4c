"""Shared fixtures: one SparkSession per test session, testdata paths."""

from __future__ import annotations

import os

import pytest

from guagua_spark.session import get_spark

SF_SMOKE = os.environ.get("GUAGUA_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("GUAGUA_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # Hermetic durable tier: a fresh per-run store so the oracle sweep
    # always re-derives certificates/indexes from the raw tables — a
    # stale entry in the shared repo store can never mask a test
    # (guagua_spark.durable invalidation contract).
    os.environ["GUAGUA_CACHE_DIR"] = str(
        tmp_path_factory.mktemp("guagua_durable")
    )
    # Make test modules importable inside forked Python workers (classes
    # defined in tests pickle by reference).
    tests_dir = os.path.dirname(os.path.abspath(__file__))
    repo_dir = os.path.dirname(tests_dir)
    extra = f"{tests_dir}:{repo_dir}"
    prev = os.environ.get("PYTHONPATH")
    os.environ["PYTHONPATH"] = f"{extra}:{prev}" if prev else extra
    # Small parallelism for tiny test data: 4 cores / 8 shuffle partitions
    # keeps per-test latency low; production defaults live in session.py.
    s = get_spark(
        app_name="guagua_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
            "spark.sql.warehouse.dir": "/tmp/guagua-test-warehouse",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return SF_ORACLE
