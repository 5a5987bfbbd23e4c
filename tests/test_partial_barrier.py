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
from guagua_spark.algorithms.sum_ import SumMaster, SumWorker
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


class SlowPartitionSumWorker(SumWorker):
    """The reference SUM worker, with partition 0 sleeping far past the
    barrier deadline — the straggler-self-kill shape
    (GuaguaWorkerService.java:304-316) on the golden workload."""

    def compute(
        self, context: WorkerContext, batches: Iterator[pa.RecordBatch]
    ) -> Any:
        if context.partition_id == 0:
            time.sleep(30)
        return super().compute(context, batches)


class RecordingSumMaster(SumMaster):
    def __init__(self) -> None:
        super().__init__()
        self.arrived_history: list[int] = []

    def compute(self, context: MasterContext) -> Any:
        self.arrived_history.append(context.arrived_workers)
        return super().compute(context)


def test_sum_golden_under_real_timeout_drop(spark):
    """End-to-end §2.5 drop semantics on the REFERENCE workload: with
    the SumTest partitions {1,2,3} / {2,3,4} and partition 0 cancelled
    at the deadline every iteration, each round the master sees ONE
    result carrying prev_sum + 9, so Mₙ = Mₙ₋₁ + 9 — the golden under
    drop is 9·iterations, not the full-barrier 15·(2ⁿ−1)."""
    from guagua_spark.engine import IterativeEngine

    rdd = spark.sparkContext.parallelize(
        [(1,), (2,), (3,), (2,), (3,), (4,)], 2
    )
    df = spark.createDataFrame(rdd, "value long")
    master = RecordingSumMaster()
    result = IterativeEngine(spark).run(
        master,
        SlowPartitionSumWorker(),
        df,
        total_iteration=3,
        min_workers_ratio=0.5,
        min_workers_timeout=2.0,
    )
    assert master.arrived_history == [1, 1, 1]
    assert result.value == 27  # 9 * 3 iterations


def test_straggler_at_bench_scale_converges_close(spark):
    """Bench-scale measurement (round-9 verdict #7): a REAL training
    run (LR over sf0.1 lineitem, 600k rows) with an induced straggler
    sleeping past the barrier timeout. Asserts (a) at least one
    iteration actually dropped workers, (b) the converged weights stay
    close to the no-straggler run — the SSP-lite contract: losing one
    partition's gradient for a couple of rounds perturbs, not breaks,
    convergence. The measured wall-times/drop counts are recorded in
    BENCH_NOTES.md."""
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from guagua_spark.algorithms.gradient import (
        GradientDescentMaster,
        LogisticGradientWorker,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = (
        spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
        .select(
            "l_quantity",
            "l_discount",
            F.when(F.col("l_returnflag") == "R", 1.0)
            .otherwise(0.0)
            .alias("label"),
        )
        .repartition(8)
        .persist()
    )
    li.count()

    class StragglerLR(LogisticGradientWorker):
        def compute_prepared(self, context, data):
            if context.partition_id == 0 and context.current_iteration in (2, 3):
                time.sleep(8)
            return super().compute_prepared(context, data)

    class RecordingMaster(GradientDescentMaster):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.arrived: list[int] = []

        def compute(self, context):
            self.arrived.append(context.arrived_workers)
            return super().compute(context)

    t0 = time.monotonic()
    base = IterativeEngine(spark).run(
        GradientDescentMaster(dim=2, learning_rate=0.5),
        LogisticGradientWorker(("l_quantity", "l_discount"), "label"),
        li,
        total_iteration=5,
        persist=False,
    )
    base_secs = time.monotonic() - t0

    master = RecordingMaster(dim=2, learning_rate=0.5)
    t0 = time.monotonic()
    strag = IterativeEngine(spark).run(
        master,
        StragglerLR(("l_quantity", "l_discount"), "label"),
        li,
        total_iteration=5,
        persist=False,
        min_workers_ratio=0.8,
        min_workers_timeout=2.0,
    )
    strag_secs = time.monotonic() - t0
    li.unpersist()

    dropped_iters = [a for a in master.arrived if a < 8]
    print(
        f"\nstraggler-bench: base {base_secs:.2f}s, straggler "
        f"{strag_secs:.2f}s, arrived per iter {master.arrived}"
    )
    assert len(dropped_iters) >= 1, master.arrived
    bw, sw = np.asarray(base.weights), np.asarray(strag.weights)
    # dropping <=1/8 of the gradient for <=2 of 5 rounds: small,
    # bounded drift
    assert np.all(np.abs(bw - sw) <= 0.15 * (np.abs(bw) + 1.0)), (
        bw,
        sw,
    )
