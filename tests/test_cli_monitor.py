"""CLI launcher end-to-end + ComputableMonitor timeout semantics."""

from __future__ import annotations

import pickle
import subprocess
import sys
import time

from guagua_spark.monitor import ComputeTimeout, computable_monitor


def test_cli_runs_sum_end_to_end(tmp_path, sf_dir):
    out = tmp_path / "result.pkl"
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "guagua_spark",
            "-i",
            f"{sf_dir}/lineitem.parquet",
            "-m",
            "guagua_spark.algorithms.sum_.SumMaster",
            "-w",
            "guagua_spark.algorithms.sum_.SumWorker",
            "-c",
            "1",
            "-D",
            "sum.column=l_quantity",
            "--spark-master",
            "local[2]",
            "--output",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    result = pickle.loads(out.read_bytes())
    assert result.value > 0  # one pass = plain sum of l_quantity


def test_monitor_soft_timeout_returns_none():
    @computable_monitor(0.2, is_soft=True)
    def slow():
        time.sleep(5)
        return 42

    assert slow() is None


def test_monitor_hard_timeout_raises():
    @computable_monitor(0.2, is_soft=False)
    def slow():
        time.sleep(5)
        return 42

    try:
        slow()
    except ComputeTimeout:
        pass
    else:
        raise AssertionError("expected ComputeTimeout")


def test_monitor_fast_path_passthrough():
    @computable_monitor(5.0)
    def fast(x):
        return x * 2

    assert fast(21) == 42
