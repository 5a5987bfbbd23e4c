"""Concurrent multi-job runner — the reference client's bagging surface.

GuaguaMapReduceClient lets a caller ``addJob`` several guagua jobs (e.g.
a bagged ensemble), runs them concurrently, and re-submits failed jobs
(`guagua-mapreduce/.../GuaguaMapReduceClient.java` — bagging retry noted
in SURVEY.md §3.1 step 8). On Spark, concurrent jobs are driver threads
submitting to the same scheduler; a fair pool keeps one long job from
starving the rest.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any

from guagua_spark.engine import IterativeEngine


@dataclass
class BaggingJob:
    """One (master, worker, df) job plus its engine kwargs."""

    master: Any
    worker: Any
    df: Any
    name: str = "job"
    run_kwargs: dict[str, Any] = field(default_factory=dict)


def run_bagging(
    spark,
    jobs: list[BaggingJob],
    max_retries: int = 1,
    parallelism: int | None = None,
    props: dict[str, Any] | None = None,
) -> list[Any]:
    """Run jobs concurrently; retry each failed job up to ``max_retries``
    times (client-parity). Returns results in job order; a job that
    exhausts retries yields its exception object in that slot so one bad
    ensemble member doesn't sink the rest."""

    def run_one(job: BaggingJob) -> Any:
        last: Exception | None = None
        for _ in range(1 + max_retries):
            try:
                spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", job.name
                )
                return IterativeEngine(spark, props=props).run(
                    job.master, job.worker, job.df, **job.run_kwargs
                )
            except Exception as e:  # noqa: BLE001 — retried, then surfaced
                last = e
        return last

    n = parallelism or min(len(jobs), 8)
    with ThreadPoolExecutor(max_workers=n) as ex:
        return list(ex.map(run_one, jobs))
