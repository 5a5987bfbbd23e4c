"""Distributed gradient descent: linear + logistic regression.

Re-expresses the reference workloads (guagua-examples):
- logistic: worker per-record sigmoid/gradient loop
  (lr/LogisticRegressionWorker.java:108-139 — sigmoid at :133-139),
  master element-wise gradient sum + ``w -= lr·g``
  (lr/LogisticRegressionMaster.java:78-100); a constant bias feature 1.0
  is prepended so weights have input_num+1 entries
  (lr/LogisticRegressionWorker.java:147-163).
- linear: lnr/LinearRegressionWorker.java / LinearRegressionMaster.java,
  same shape with identity link.

Spark-first design: the per-partition fold is numpy over Arrow batches
(vectorized — the reference's per-record Java loop becomes one matrix
multiply per batch), the AllReduce is the engine's Combinable treeReduce,
and the model rides the broadcast. Gradients are dense ``float64[d+1]``;
at 1000 executors a 10k-feature gradient is 80 KB per partition — far
below any transport limit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Sequence

import numpy as np
import pyarrow as pa

from guagua_spark.api import (
    MasterComputable,
    MasterContext,
    WorkerComputable,
    WorkerContext,
)


@dataclass
class GradientState:
    """Accumulated gradient + loss over a data subset (Combinable)."""

    gradient: np.ndarray
    loss: float = 0.0
    count: int = 0
    halt: bool = False

    def combine(self, other: "GradientState") -> "GradientState":
        return GradientState(
            gradient=self.gradient + other.gradient,
            loss=self.loss + other.loss,
            count=self.count + other.count,
            halt=self.halt and other.halt,
        )


@dataclass
class ModelState:
    """Master result: current weights + previous loss (broadcast down)."""

    weights: np.ndarray
    loss: float = float("inf")
    halt: bool = False
    iteration: int = 0


def _features_matrix(
    batches: Iterator[pa.RecordBatch],
    feature_cols: Sequence[str],
    label_col: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate Arrow batches into X (with bias column) and y.

    Direct column→numpy (no pandas hop): measured ~0.1 s/iteration off
    the lr_train loop at sf0.1 — per-round latency is the engine's
    whole cost model, so the hot path avoids DataFrame construction."""
    xs: list[np.ndarray] = []
    ys: list[np.ndarray] = []
    for batch in batches:
        cols = [
            batch.column(c).to_numpy(zero_copy_only=False)
            for c in feature_cols
        ]
        xs.append(np.column_stack(cols).astype(np.float64, copy=False))
        ys.append(
            batch.column(label_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64, copy=False)
        )
    if not xs:
        return np.zeros((0, len(feature_cols) + 1)), np.zeros(0)
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    bias = np.ones((x.shape[0], 1))
    return np.concatenate([bias, x], axis=1), y


def sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically-stable split form (reference sigmoid:
    # lr/LogisticRegressionWorker.java:133-139 uses 1/(1+e^-z); the naive
    # form overflows float64 for |z|>709)
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


class LogisticGradientWorker(WorkerComputable):
    """Per-partition logistic gradient: Xᵀ(σ(Xw) − y), loss = squared error
    (the reference accumulates squared error, not log-loss —
    lr/LogisticRegressionWorker.java:120-126).

    Implements the load-once fast path: ``prepare`` converts the
    partition to (X, y) numpy matrices ONCE; every iteration's
    ``compute_prepared`` is then pure BLAS over the cached matrices
    (exactly the reference's MemoryDiskList iterate-many contract)."""

    def __init__(self, feature_cols: Sequence[str], label_col: str) -> None:
        self.feature_cols = tuple(feature_cols)
        self.label_col = label_col

    def prepare(
        self, batches: Iterator[pa.RecordBatch]
    ) -> tuple[np.ndarray, np.ndarray]:
        return _features_matrix(batches, self.feature_cols, self.label_col)

    def compute_prepared(
        self, context: WorkerContext, data: tuple[np.ndarray, np.ndarray]
    ) -> GradientState:
        x, y = data
        w = context.last_master_result.weights
        if x.shape[0] == 0:
            return GradientState(np.zeros_like(w))
        pred = sigmoid(x @ w)
        err = pred - y
        return GradientState(
            gradient=x.T @ err,
            loss=float(np.sum(err * err)),
            count=x.shape[0],
        )

    def compute(
        self, context: WorkerContext, batches: Iterator[pa.RecordBatch]
    ) -> GradientState:
        return self.compute_prepared(context, self.prepare(batches))


class LinearGradientWorker(WorkerComputable):
    """Per-partition linear-regression gradient: Xᵀ(Xw − y)."""

    def __init__(self, feature_cols: Sequence[str], label_col: str) -> None:
        self.feature_cols = tuple(feature_cols)
        self.label_col = label_col

    def prepare(
        self, batches: Iterator[pa.RecordBatch]
    ) -> tuple[np.ndarray, np.ndarray]:
        return _features_matrix(batches, self.feature_cols, self.label_col)

    def compute_prepared(
        self, context: WorkerContext, data: tuple[np.ndarray, np.ndarray]
    ) -> GradientState:
        x, y = data
        w = context.last_master_result.weights
        if x.shape[0] == 0:
            return GradientState(np.zeros_like(w))
        err = x @ w - y
        return GradientState(
            gradient=x.T @ err,
            loss=float(np.sum(err * err)),
            count=x.shape[0],
        )

    def compute(
        self, context: WorkerContext, batches: Iterator[pa.RecordBatch]
    ) -> GradientState:
        return self.compute_prepared(context, self.prepare(batches))


class GradientDescentMaster(MasterComputable):
    """Sum worker gradients, step weights, halt on loss convergence.

    ``w ← w − lr·g/n`` (mean gradient; the reference uses raw sum with a
    tiny lr — mean form keeps lr scale-free, an intentional improvement
    documented here for parity review).
    """

    def __init__(
        self,
        dim: int,
        learning_rate: float = 0.1,
        tolerance: float = 0.0,
        init_weights: np.ndarray | None = None,
    ) -> None:
        self.dim = dim  # number of features EXCLUDING bias
        self.learning_rate = learning_rate
        self.tolerance = tolerance
        self.init_weights = init_weights

    def initial_result(self, context: MasterContext) -> ModelState:
        """Initial weights, broadcast before the first worker pass."""
        w0 = (
            np.array(self.init_weights, dtype=np.float64)
            if self.init_weights is not None
            else np.zeros(self.dim + 1)
        )
        return ModelState(weights=w0)

    def compute(self, context: MasterContext) -> ModelState:
        prev: ModelState = context.master_result
        if prev is None:
            prev = self.initial_result(context)
        total = GradientState(np.zeros_like(prev.weights))
        for r in context.worker_results:
            if r is not None:
                total = total.combine(r)
        if total.count == 0:
            return ModelState(prev.weights, prev.loss, halt=True)
        step = self.learning_rate * total.gradient / total.count
        new_w = prev.weights - step
        loss = total.loss / total.count
        halt = (
            self.tolerance > 0
            and prev.loss != float("inf")
            and abs(prev.loss - loss) < self.tolerance
        )
        return ModelState(
            weights=new_w,
            loss=loss,
            halt=halt,
            iteration=context.current_iteration,
        )
