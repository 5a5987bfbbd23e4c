"""Partial barrier (min_workers_ratio): stragglers dropped, loop proceeds.

Reference semantics: BasicCoordinator.java:649-662 — master proceeds when
arrived/total >= ratio after the timeout, dropping late workers' results
for that iteration.
"""

from __future__ import annotations

import time
from typing import Any, Iterator

import pyarrow as pa

from guagua_spark.api import (
    HaltableResult,
    MasterComputable,
    MasterContext,
    WorkerComputable,
    WorkerContext,
)
from guagua_spark.engine import IterativeEngine


class _CountResult(HaltableResult):
    def __init__(self, n: int) -> None:
        super().__init__()
        self.n = n


class SlowPartitionWorker(WorkerComputable):
    """Partition 0 sleeps far past the barrier timeout; others are fast."""

    def compute(
        self, context: WorkerContext, batches: Iterator[pa.RecordBatch]
    ) -> Any:
        n = sum(b.num_rows for b in batches)
        if context.partition_id == 0:
            time.sleep(30)
        return _CountResult(n)


class CountMaster(MasterComputable):
    def __init__(self) -> None:
        self.arrived_history: list[int] = []

    def compute(self, context: MasterContext) -> Any:
        self.arrived_history.append(context.arrived_workers)
        total = sum(r.n for r in context.worker_results)
        out = _CountResult(total)
        if context.current_iteration >= 2:
            out.halt = True
        return out


class FastWorker(WorkerComputable):
    def compute(
        self, context: WorkerContext, batches: Iterator[pa.RecordBatch]
    ) -> Any:
        return _CountResult(sum(b.num_rows for b in batches))


def _df(spark, partitions: int = 4, rows_per: int = 10):
    data = [(i,) for i in range(partitions * rows_per)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(data, partitions), "value long"
    )


def test_straggler_dropped_and_loop_completes(spark):
    master = CountMaster()
    result = IterativeEngine(spark).run(
        master,
        SlowPartitionWorker(),
        _df(spark),
        total_iteration=2,
        min_workers_ratio=0.5,
        min_workers_timeout=3.0,
    )
    # partition 0 (10 rows) was cancelled both iterations: only 3 of 4
    # partitions contributed
    assert master.arrived_history == [3, 3]
    assert result.n == 30


def test_many_partitions_batched_into_bounded_jobs(spark):
    """256 partitions flow through ≤64 batched job groups with the same
    semantics as the per-partition path (reference scale: thousands of
    workers per job, GuaguaMapReduceClient split planning)."""
    master = CountMaster()
    result = IterativeEngine(spark).run(
        master,
        FastWorker(),
        _df(spark, partitions=256, rows_per=2),
        total_iteration=1,
        min_workers_ratio=0.5,
        min_workers_timeout=120.0,
    )
    # every partition contributed exactly once
    assert master.arrived_history == [256]
    assert result.n == 512


def test_full_barrier_when_all_fast(spark):
    master = CountMaster()
    result = IterativeEngine(spark).run(
        master,
        FastWorker(),
        _df(spark),
        total_iteration=2,
        min_workers_ratio=0.5,
        min_workers_timeout=30.0,
    )
    # nobody straggles ⇒ identical to the default path
    assert master.arrived_history == [4, 4]
    assert result.n == 40
