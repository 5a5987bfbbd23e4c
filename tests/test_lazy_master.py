"""Non-combinable master path above the result-size budget: partials
stream through toLocalIterator into a one-shot lazy worker_results
(reference lazy master-side consumption with spill,
AbstractMasterCoordinator.java:243-310 / NettyMasterCoordinator.java:
252-268) — driver memory stays bounded by O(one partition result)
while the golden Sum value is unchanged."""

from __future__ import annotations

import gc

import pyarrow as pa
import pyarrow.compute as pc

from guagua_spark import IterativeEngine
from guagua_spark.api import MasterComputable, WorkerComputable
from guagua_spark.algorithms.sum_ import SumMaster, SumState, SumWorker

PAYLOAD = 1 << 20  # 1 MiB per worker result


class BigState:
    """Worker result with a fat payload and a DRIVER-side liveness
    counter: __setstate__ marks each driver unpickle, __del__ the
    release — ``peak`` records how many results the driver ever held
    simultaneously (executor-side __init__ runs in forked worker
    processes and never touches the driver's counters)."""

    alive = 0
    peak = 0
    halt = False

    def __init__(self, value: int) -> None:
        self.value = value
        self.payload = b"x" * PAYLOAD
        self._mark()

    def _mark(self) -> None:
        BigState.alive += 1
        BigState.peak = max(BigState.peak, BigState.alive)

    def __setstate__(self, state) -> None:
        self.__dict__.update(state)
        self._mark()

    def __del__(self) -> None:
        BigState.alive -= 1


class BigWorker(WorkerComputable):
    def compute(self, context, batches):
        total = 0
        for batch in batches:
            s = pc.sum(batch.column("value")).as_py()
            total += s or 0
        return BigState(total)


class StreamSumMaster(MasterComputable):
    """Single-pass consumer recording the liveness peak per iteration."""

    def __init__(self) -> None:
        self.peaks: list[int] = []

    def compute(self, context) -> SumState:
        total = 0
        for r in context.worker_results:
            if r is not None:
                total += r.value
        gc.collect()
        self.peaks.append(BigState.peak)
        return SumState(value=total)


def _df(spark, n_partitions: int):
    rows = [(i,) for i in range(1, 9)]  # sum 36
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_partitions), "value long"
    )


def test_golden_sum_unchanged_on_lazy_path(spark, caplog):
    """budget=0 forces streaming for ANY result size; the reference's
    golden SumTest value must be bit-identical to the collect path."""
    import logging

    rows = [(1,), (2,), (3,), (2,), (3,), (4,)]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), "value long"
    )
    with caplog.at_level(logging.INFO, logger="guagua_spark.engine"):
        r = IterativeEngine(spark).run(
            SumMaster(),
            SumWorker(),
            df,
            total_iteration=10,
            result_bytes_budget=0,
        )
    assert r.value == 15345  # golden from reference SumTest.java:45-67
    assert any("streaming partials" in m for m in caplog.messages)


def test_driver_holds_one_result_at_a_time_when_over_budget(spark):
    """P×result_size (8 × 1 MiB) over a 2 MiB budget → the driver's
    simultaneously-alive results stay O(1), not O(P)."""
    BigState.alive = 0
    BigState.peak = 0
    master = StreamSumMaster()
    r = IterativeEngine(spark).run(
        master,
        BigWorker(),
        _df(spark, 8),
        total_iteration=2,
        result_bytes_budget=2 * PAYLOAD,
    )
    assert r.value == 36
    # loop-variable rebinding holds at most the current + next result;
    # prefetched partitions buffer raw BYTES, not unpickled objects
    assert max(master.peaks) <= 3, master.peaks


def test_collect_path_below_budget_is_unchanged(spark):
    """Control: under the default budget the eager collect materializes
    all P results at once (and the counter mechanism demonstrably
    measures that), so the lazy test's bound is meaningful."""
    BigState.alive = 0
    BigState.peak = 0
    master = StreamSumMaster()
    r = IterativeEngine(spark).run(
        master, BigWorker(), _df(spark, 8), total_iteration=1
    )
    assert r.value == 36
    assert max(master.peaks) == 8
