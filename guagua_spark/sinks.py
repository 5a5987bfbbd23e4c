"""Output sinks — the analogue of the reference's postApplication writers.

The reference engine itself has NO output operator (its MR output format
is a no-op — GuaguaOutputFormat.java:31, GuaguaRecordWriter.java:27
``write`` throws); all real output happens in user interceptors at
postApplication (SURVEY.md §2.2). Two shapes exist there:

1. driver-side model writes — SumOutput.java:37-60, NNOutput.java:38-60,
   LogisticRegressionOutput / LinearRegressionOutput,
   KMeansCentriodsOutput: one small final artifact → one file;
2. ONE distributed write — KMeansDataOutput.java:36-80: every worker
   writes its rows tagged with the model's verdict (cluster id), one
   file per worker.

Here (1) is ``save_model``/``load_model`` (pickle — the engine's results
are plain Python objects) and (2) is ``write_tagged``: a real
``df.write`` so at 100 TB the tagged output is written by the executors
in parallel, partitioned however downstream wants to read it.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Sequence

from pyspark.sql import DataFrame


def save_model(result: Any, path: str) -> None:
    """Persist a final master result (model) — driver-side, atomic."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(result, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_model(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def write_tagged(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Distributed tagged-row write (KMeansDataOutput parity): executors
    write in parallel; ``partition_by`` (e.g. the cluster tag) lays the
    output out for partition-pruned reads downstream. The reference's
    one-file-per-worker layout is an artifact of MR — here the layout is
    a first-class choice."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


class ModelOutputInterceptor:
    """postApplication model writer as an interceptor — the exact shape
    of the reference's SumOutput/NNOutput (MasterInterceptor subclasses
    writing at postApplication, FILO)."""

    def __init__(self, path: str) -> None:
        self.path = path

    def pre_application(self, context) -> None:  # noqa: D401
        pass

    def pre_iteration(self, context) -> None:
        pass

    def post_iteration(self, context) -> None:
        pass

    def post_application(self, context) -> None:
        save_model(context.master_result, self.path)
