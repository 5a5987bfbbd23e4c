"""User-facing computation API: the guagua extension surface, in Python.

Reproduces the reference's extension points (SURVEY.md §2.8):

- ``WorkerComputable.compute``  ← worker/WorkerComputable.java:60-72
- ``MasterComputable.compute``  ← master/MasterComputable.java:51-61
- ``Combinable.combine``        ← io/Combinable.java:24-29
- ``HaltableResult.halt``       ← io/HaltBytable.java:36-77
- ``MasterContext``/``WorkerContext`` ← master/MasterContext.java,
  worker/WorkerContext.java (props, attachment, current/total iteration,
  worker_results / last_master_result)

Differences from the reference, by design (Spark-first):

- No ``Bytable``/serializer layer: results are arbitrary picklable Python
  objects; Spark handles the wire format (reference io/BytableSerializer.java
  and the GZIP/Bzip2 variants disappear).
- Workers receive their partition as an iterator of **pyarrow RecordBatches**
  (columnar, zero-copy from the JVM) instead of a line-record reader
  (reference hadoop/io/GuaguaLineRecordReader.java). Convert with
  ``batch.to_pandas()`` for numpy work.
- Spark tasks are stateless between iterations; anything a guagua worker
  kept in instance fields across iterations must live in the broadcast
  master result or be recomputed (SURVEY.md §7 "hard parts" #2).
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field
from typing import Any, Iterable, Iterator, Protocol, runtime_checkable

import pyarrow as pa


@runtime_checkable
class Combinable(Protocol):
    """Associative partial-merge of two worker results.

    If a worker result implements this, the engine merges results
    executor-side (treeReduce) before they reach the driver — the Spark
    analogue of the reference's merge-on-arrival combiner
    (master/NettyMasterCoordinator.java:160-200, threshold
    guagua.master.result.merge.threshold=10). Must be associative and
    order-insensitive: results arrive unordered (SURVEY.md §4 last row).
    """

    def combine(self, other: "Combinable") -> "Combinable": ...


@dataclass
class HaltableResult:
    """Master result base carrying the convergence flag.

    The engine stops iterating when the master result's ``halt`` attribute
    is truthy (reference io/HaltBytable.java:41-77; loop break at
    master/GuaguaMasterService.java:196).
    """

    halt: bool = False


def is_halt(result: Any) -> bool:
    """True if a master result signals convergence (duck-typed)."""
    return bool(getattr(result, "halt", False))


@dataclass
class MasterContext:
    """Driver-side per-iteration context (reference master/MasterContext.java).

    ``worker_results`` is the iterable of (possibly pre-combined)
    worker results for this iteration; with a Combinable result and
    executor-side reduction it holds a single element. Usually a list;
    on the non-combinable path above the engine's result-size budget it
    is a lazy stream (reference lazy master consumption,
    AbstractMasterCoordinator.java:243-310) that is RE-ITERABLE — like
    the reference's disk-backed iterable, a second pass replays the
    driver-local spill (engine._LazyWorkerResults), so list semantics
    hold except that ``len()`` is defined only after a full pass.

    Lazy-mode flag timing: in the streamed path the halt votes arrive
    WITH the results, so ``all_workers_halted`` reads False during
    ``master.compute`` and is recomputed from the drained votes after
    compute returns (the engine still applies the halt to this
    iteration's result). A master that must branch on the flag INSIDE
    compute should force the drain first — ``list(ctx.worker_results)``
    — after which the engine's post-compute value is what the eager
    path would have shown pre-compute.
    """

    current_iteration: int
    total_iteration: int
    worker_results: Iterable[Any]
    master_result: Any = None  # previous iteration's result
    props: dict[str, Any] = field(default_factory=dict)
    attachment: Any = None
    num_workers: int = 0
    #: worker-voted halt (guagua.worker.halt.enable): True when every
    #: worker result this iteration carried halt=True
    #: (reference AbstractMasterCoordinator.java:311-350).
    all_workers_halted: bool = False
    #: how many workers' results actually arrived this iteration — equals
    #: num_workers except under the partial barrier (min_workers_ratio),
    #: where stragglers' results are dropped for the iteration
    #: (reference BasicCoordinator.java:649-662).
    arrived_workers: int = 0


@dataclass
class WorkerContext:
    """Executor-side per-iteration context (reference worker/WorkerContext.java)."""

    current_iteration: int
    total_iteration: int
    last_master_result: Any
    props: dict[str, Any] = field(default_factory=dict)
    partition_id: int = -1
    attachment: Any = None


class MasterComputable(abc.ABC):
    """Global merge + model update, runs on the driver once per iteration.

    Reference contract: master/MasterComputable.java:51-61 (compute) and
    master/AbstractMasterComputable.java:28-62 (init-once template).
    """

    def init(self, context: MasterContext) -> None:  # noqa: B027
        """Called once before iteration 1 (optional override)."""

    @abc.abstractmethod
    def compute(self, context: MasterContext) -> Any:
        """Merge ``context.worker_results`` into the next master result."""


class WorkerComputable(abc.ABC):
    """Per-partition fold over the partition's data, once per iteration.

    Reference contract: worker/WorkerComputable.java:60-72 and the
    load-once template AbstractWorkerComputable.java:66-144. On Spark the
    "load-once, iterate many" protocol is the persisted DataFrame: the
    engine persists the input before the loop, so every iteration's scan
    hits the block-manager cache, and ``compute`` sees fresh Arrow batches
    each round.

    Implementations MUST handle an empty batch iterator (a partition can
    be empty) and MUST NOT rely on instance state surviving between
    iterations.

    LOAD-ONCE FAST PATH: a worker may additionally override ``prepare``
    (one-time Arrow→anything conversion per partition) and
    ``compute_prepared``. The engine then scans the input ONCE, persists
    each partition's prepared object (pickled, block manager,
    MEMORY_AND_DISK), and every iteration calls ``compute_prepared``
    with that object instead of re-decoding rows→Arrow→numpy per round.
    This is the faithful analogue of the reference's load-once worker
    cache (worker/AbstractWorkerComputable.java:66-104,
    util/MemoryDiskList.java): data crosses the JVM→Python boundary as
    one opaque blob per round (memcpy-speed pickle of e.g. numpy
    arrays), not as rows to re-convert.
    """

    def init(self, context: WorkerContext) -> None:  # noqa: B027
        """Called once per task before compute (optional override)."""

    @abc.abstractmethod
    def compute(
        self, context: WorkerContext, batches: Iterator[pa.RecordBatch]
    ) -> Any:
        """Fold the partition's record batches into one worker result."""

    #: sentinel: engine detects an overridden prepare by identity
    def prepare(self, batches: Iterator[pa.RecordBatch]) -> Any:
        """One-time per-partition conversion for the load-once fast
        path (optional override; must be picklable and handle an empty
        iterator). Return the partition's data in whatever form
        ``compute_prepared`` wants (e.g. numpy matrices)."""
        raise NotImplementedError

    def compute_prepared(self, context: WorkerContext, data: Any) -> Any:
        """Per-iteration fold over the ``prepare``-converted partition
        data (required iff ``prepare`` is overridden)."""
        raise NotImplementedError


class MasterInterceptor:
    """Lifecycle hooks around the master loop.

    Reference: master/MasterInterceptor.java:57-81. ``pre_*`` hooks run
    FIFO, ``post_*`` hooks run FILO (ordering contract at
    GuaguaMasterService.java:63-65,281-284).
    """

    def pre_application(self, context: MasterContext) -> None:  # noqa: B027
        pass

    def pre_iteration(self, context: MasterContext) -> None:  # noqa: B027
        pass

    def post_iteration(self, context: MasterContext) -> None:  # noqa: B027
        pass

    def post_application(self, context: MasterContext) -> None:  # noqa: B027
        pass


class WorkerInterceptor:
    """Lifecycle hooks around worker computation, run ON EXECUTORS.

    Reference: worker/WorkerInterceptor.java:49-81 — four hooks with
    FIFO ``pre_*`` / FILO ``post_*`` ordering (the call-stack contract
    described at WorkerInterceptor.java:33-38, same as the master side
    at GuaguaMasterService.java:63-65).

    Spark mapping (tasks are stateless between iterations, see module
    docstring): a worker's "application" span is tied to the iteration
    counter — ``pre_application`` fires in the first iteration's task
    (before ``pre_iteration``), ``post_application`` in the
    ``total_iteration``-th task (after ``post_iteration``). When the
    master halts the loop EARLY, executor-side ``post_application``
    cannot fire (a task can't see the future); guaranteed end-of-run
    cleanup belongs in a driver-side ``MasterInterceptor``. Interceptors
    are pickled into the task closure — keep them small and stateless
    (state written to instance fields does not survive the task).
    """

    def pre_application(self, context: WorkerContext) -> None:  # noqa: B027
        pass

    def pre_iteration(self, context: WorkerContext) -> None:  # noqa: B027
        pass

    def post_iteration(self, context: WorkerContext) -> None:  # noqa: B027
        pass

    def post_application(self, context: WorkerContext) -> None:  # noqa: B027
        pass


def combine_all(results: Iterable[Any]) -> Any:
    """Left-fold a sequence of Combinable results into one."""
    it = iter(results)
    try:
        acc = next(it)
    except StopIteration:
        return None
    for r in it:
        acc = acc.combine(r)
    return acc
