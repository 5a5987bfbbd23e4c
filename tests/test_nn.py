"""NN training: fixed-seed determinism (first-5-iteration error sequence),
error decrease, optimizer strategies (FIXTURES.md §5)."""

from __future__ import annotations

import numpy as np
import pytest

from guagua_spark.algorithms.nn import (
    NNMaster,
    NNWorker,
    OPTIMIZERS,
    backprop,
    forward,
    init_weights,
)
from guagua_spark.api import MasterInterceptor
from guagua_spark.engine import IterativeEngine


@pytest.fixture(scope="module")
def xor_df(spark):
    """Noisy XOR in 4-d — learnable by a small MLP, fixed seed."""
    rng = np.random.default_rng(42)
    n = 400
    x = rng.uniform(0, 1, size=(n, 4))
    y = ((x[:, 0] > 0.5) ^ (x[:, 1] > 0.5)).astype(float)
    rows = [
        (float(a), float(b), float(c), float(d), float(t))
        for (a, b, c, d), t in zip(x, y)
    ]
    return spark.createDataFrame(
        rows, "f1 double, f2 double, f3 double, f4 double, target double"
    ).repartition(4)


class ErrorTracker(MasterInterceptor):
    def __init__(self):
        self.errors = []

    def post_iteration(self, ctx):
        self.errors.append(ctx.master_result.train_error)


def _train(spark, df, algorithm, iters=30, learning_rate=1.0, **kw):
    tracker = ErrorTracker()
    model = IterativeEngine(spark).run(
        NNMaster([4, 8, 1], learning_rate=learning_rate, algorithm=algorithm, **kw),
        NNWorker(("f1", "f2", "f3", "f4"), "target", validation_rate=0.2),
        df,
        total_iteration=iters,
        interceptors=[tracker],
    )
    return model, tracker.errors


def test_nn_resilient_learns_xor(spark, xor_df):
    model, errors = _train(spark, xor_df, "resilient", iters=150)
    assert errors[-1] < 0.08, f"final train error {errors[-1]}"
    assert model.test_error < 0.12


def test_nn_deterministic_error_sequence(spark, xor_df):
    _, e1 = _train(spark, xor_df, "resilient", iters=5)
    _, e2 = _train(spark, xor_df, "resilient", iters=5)
    np.testing.assert_allclose(e1, e2, rtol=1e-9)
    assert len(e1) == 5


@pytest.mark.parametrize(
    ("algorithm", "lr"),
    [("backprop", 1.0), ("manhattan", 0.005), ("quickprop", 1.0)],
)
def test_nn_other_optimizers_reduce_error(spark, xor_df, algorithm, lr):
    _, errors = _train(spark, xor_df, algorithm, iters=30, learning_rate=lr)
    assert errors[-1] < errors[0], f"{algorithm}: {errors[0]} -> {errors[-1]}"


def test_nn_scg_learns_xor(spark, xor_df):
    """SCG's probe/candidate state machine across engine iterations:
    150 evaluations ≈ 75 SCG steps must beat the initial error decisively
    and produce usable best weights."""
    from guagua_spark.algorithms.nn import forward, scg_best_weights

    model, errors = _train(spark, xor_df, "scg", iters=150)
    assert errors[-1] < errors[0] * 0.5, f"scg: {errors[0]} -> {errors[-1]}"
    # best weights come from the accepted point, not the last probe
    best = scg_best_weights(model)
    assert forward(best, np.zeros((1, 4)))[-1].shape == (1, 1)


def test_nn_scg_deterministic(spark, xor_df):
    _, e1 = _train(spark, xor_df, "scg", iters=8)
    _, e2 = _train(spark, xor_df, "scg", iters=8)
    np.testing.assert_allclose(e1, e2, rtol=1e-9)


def test_nn_halt_on_tolerance(spark, xor_df):
    model, errors = _train(
        spark, xor_df, "backprop", iters=200, learning_rate=0.3,
        tolerance=1e-5,
    )
    assert model.halt is True
    assert len(errors) < 200


def test_backprop_numeric_gradient():
    """Analytic gradient matches finite differences (pure numpy)."""
    rng = np.random.default_rng(0)
    w = init_weights([3, 4, 1], seed=0)
    x = rng.normal(size=(10, 3))
    y = rng.uniform(size=(10, 1))
    grads, _ = backprop(w, x, y)

    def loss(weights):
        out = forward(weights, x)[-1]
        return 0.5 * np.sum((out - y) ** 2)

    eps = 1e-6
    for li in range(len(w)):
        gw_num = np.zeros_like(w[li][0])
        for i in range(w[li][0].shape[0]):
            for j in range(w[li][0].shape[1]):
                wp = [(a.copy(), b.copy()) for a, b in w]
                wp[li][0][i, j] += eps
                wm = [(a.copy(), b.copy()) for a, b in w]
                wm[li][0][i, j] -= eps
                gw_num[i, j] = (loss(wp) - loss(wm)) / (2 * eps)
        # backprop returns the gradient of ½·SSE (delta = err·σ′)
        np.testing.assert_allclose(grads[li][0], gw_num, atol=1e-5)
