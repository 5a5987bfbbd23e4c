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


def test_nn_resilient_matches_serial_replay(spark, xor_df):
    """VALUE oracle for resilient propagation — the reference's DEFAULT
    NN update (guagua-examples nn/NNMaster.java:109 dispatching
    Weight.java:74-86's RESILIENTPROPAGATION), which the driver contract
    can only rows-check (its validation split is worker-local): the
    distributed engine run (per-partition backprop folds, gradient
    AllReduce, driver-side adaptive steps) must equal an INDEPENDENT
    single-process numpy replay — forward, backward, split rule, and
    the RPROP step rule all re-implemented here, sharing only the
    seeded init constants with the library."""
    import pyspark.sql.functions as F

    layers, rounds, vrate = [4, 8, 1], 5, 0.2

    # learn the exact per-partition row order the engine's workers see
    rows = xor_df.withColumn("pid", F.spark_partition_id()).collect()
    parts: dict[int, list] = {}
    for r in rows:
        parts.setdefault(r.pid, []).append(
            ([r.f1, r.f2, r.f3, r.f4], r.target)
        )

    # -- independent serial replay -----------------------------------
    def sig(z):
        return 1.0 / (1.0 + np.exp(-z))

    weights = [(w.copy(), b.copy()) for w, b in init_weights(layers, 42)]
    flat = lambda prs: [a for p in prs for a in p]  # noqa: E731
    steps = prev = None
    train_error = test_error = None
    for _ in range(rounds):
        g_tot = [(np.zeros_like(w), np.zeros_like(b)) for w, b in weights]
        tr_sse = te_sse = 0.0
        tr_n = te_n = 0
        for pdata in parts.values():
            X = np.array([x for x, _ in pdata])
            y = np.array([t for _, t in pdata]).reshape(-1, 1)
            idx = np.arange(len(X))
            is_te = (idx * 2654435761 % 1000) < vrate * 1000
            Xtr, ytr, Xte, yte = X[~is_te], y[~is_te], X[is_te], y[is_te]
            # forward
            a1 = sig(Xtr @ weights[0][0] + weights[0][1])
            out = sig(a1 @ weights[1][0] + weights[1][1])
            e = out - ytr
            tr_sse += float((e * e).sum())
            tr_n += len(Xtr)
            d2 = e * out * (1 - out)
            d1 = (d2 @ weights[1][0].T) * a1 * (1 - a1)
            for gi, (ga, da) in enumerate(((Xtr, d1), (a1, d2))):
                g_tot[gi] = (
                    g_tot[gi][0] + ga.T @ da,
                    g_tot[gi][1] + da.sum(axis=0),
                )
            if len(Xte):
                o = sig(sig(Xte @ weights[0][0] + weights[0][1])
                        @ weights[1][0] + weights[1][1])
                te_sse += float(((o - yte) ** 2).sum())
                te_n += len(Xte)
        mean_g = flat([(gw / tr_n, gb / tr_n) for gw, gb in g_tot])
        if steps is None:
            steps = [np.full_like(g, 0.1) for g in mean_g]
            prev = [np.zeros_like(g) for g in mean_g]
        flat_w = flat(weights)
        for i, g in enumerate(mean_g):
            agree = np.sign(g * prev[i])
            steps[i] = np.clip(
                np.where(agree > 0, steps[i] * 1.2,
                         np.where(agree < 0, steps[i] * 0.5, steps[i])),
                1e-6, 50.0,
            )
            g_eff = np.where(agree < 0, 0.0, g)
            flat_w[i] = flat_w[i] - steps[i] * np.sign(g_eff)
            prev[i] = g_eff
        weights = [(flat_w[0], flat_w[1]), (flat_w[2], flat_w[3])]
        train_error = tr_sse / tr_n
        test_error = te_sse / te_n

    # -- distributed engine run ---------------------------------------
    model, _ = _train(spark, xor_df, "resilient", iters=rounds)
    np.testing.assert_allclose(model.train_error, train_error, rtol=1e-9)
    np.testing.assert_allclose(model.test_error, test_error, rtol=1e-9)
    for (gw, gb), (ww, wb) in zip(model.weights, weights):
        np.testing.assert_allclose(gw, ww, rtol=1e-9)
        np.testing.assert_allclose(gb, wb, rtol=1e-9)


def _partition_rows(xor_df):
    """The exact per-partition row order the engine's workers see."""
    import pyspark.sql.functions as F

    rows = xor_df.withColumn("pid", F.spark_partition_id()).collect()
    parts: dict[int, list] = {}
    for r in rows:
        parts.setdefault(r.pid, []).append(
            ([r.f1, r.f2, r.f3, r.f4], r.target)
        )
    return parts


def _serial_round(parts, weights, vrate=0.2):
    """One engine round replayed serially: per-partition validation
    split + backprop gradient accumulation over a [4, 8, 1] sigmoid
    MLP — forward, backward, and split rule re-implemented
    independently of the library. Returns (mean flat gradients,
    train_error, test_error)."""

    def sig(z):
        return 1.0 / (1.0 + np.exp(-z))

    g_tot = [(np.zeros_like(w), np.zeros_like(b)) for w, b in weights]
    tr_sse = te_sse = 0.0
    tr_n = te_n = 0
    for pdata in parts.values():
        X = np.array([x for x, _ in pdata])
        y = np.array([t for _, t in pdata]).reshape(-1, 1)
        idx = np.arange(len(X))
        is_te = (idx * 2654435761 % 1000) < vrate * 1000
        Xtr, ytr, Xte, yte = X[~is_te], y[~is_te], X[is_te], y[is_te]
        a1 = sig(Xtr @ weights[0][0] + weights[0][1])
        out = sig(a1 @ weights[1][0] + weights[1][1])
        e = out - ytr
        tr_sse += float((e * e).sum())
        tr_n += len(Xtr)
        d2 = e * out * (1 - out)
        d1 = (d2 @ weights[1][0].T) * a1 * (1 - a1)
        for gi, (ga, da) in enumerate(((Xtr, d1), (a1, d2))):
            g_tot[gi] = (
                g_tot[gi][0] + ga.T @ da,
                g_tot[gi][1] + da.sum(axis=0),
            )
        if len(Xte):
            o = sig(
                sig(Xte @ weights[0][0] + weights[0][1]) @ weights[1][0]
                + weights[1][1]
            )
            te_sse += float(((o - yte) ** 2).sum())
            te_n += len(Xte)
    mean_g = [a for gw, gb in g_tot for a in (gw / tr_n, gb / tr_n)]
    return mean_g, tr_sse / tr_n, (te_sse / te_n if te_n else 0.0)


@pytest.mark.parametrize(
    ("algorithm", "lr"),
    [("backprop", 1.0), ("manhattan", 0.005), ("quickprop", 1.0)],
)
def test_nn_optimizers_match_serial_replay(spark, xor_df, algorithm, lr):
    """VALUE oracles for the remaining weight-update strategies the
    reference dispatches (guagua-examples nn/Weight.java:74-86:
    BACKPROPAGATION with momentum, MANHATTANPROPAGATION,
    QUICKPROPAGATION — RPROP has its own replay above, SCG a
    determinism + convergence pair): the distributed engine run must
    equal an independent single-process numpy replay of the update
    rule to 1e-9, not merely reduce error."""
    layers, rounds, momentum, mu = [4, 8, 1], 5, 0.5, 1.75
    parts = _partition_rows(xor_df)

    weights = [(w.copy(), b.copy()) for w, b in init_weights(layers, 42)]
    train_error = test_error = None
    vel = qp_pg = qp_pd = None
    for _ in range(rounds):
        mean_g, train_error, test_error = _serial_round(parts, weights)
        flat_w = [a for w, b in weights for a in (w, b)]
        if algorithm == "backprop":
            if vel is None:
                vel = [np.zeros_like(g) for g in mean_g]
            for i, g in enumerate(mean_g):
                vel[i] = momentum * vel[i] - lr * g
                flat_w[i] = flat_w[i] + vel[i]
        elif algorithm == "manhattan":
            for i, g in enumerate(mean_g):
                flat_w[i] = flat_w[i] - lr * np.sign(g)
        else:  # quickprop: parabola-fit step from consecutive gradients
            if qp_pg is None:
                deltas = [-lr * g for g in mean_g]
            else:
                deltas = []
                for g, pg, pd in zip(mean_g, qp_pg, qp_pd):
                    denom = pg - g
                    with np.errstate(divide="ignore", invalid="ignore"):
                        step = np.where(
                            np.abs(denom) > 1e-12, pd * g / denom, -lr * g
                        )
                    limit = mu * np.abs(pd)
                    step = np.clip(
                        step, -np.maximum(limit, lr), np.maximum(limit, lr)
                    )
                    deltas.append(step)
            for i, d in enumerate(deltas):
                flat_w[i] = flat_w[i] + d
            qp_pg, qp_pd = mean_g, deltas
        weights = [(flat_w[0], flat_w[1]), (flat_w[2], flat_w[3])]

    model, _ = _train(
        spark, xor_df, algorithm, iters=rounds, learning_rate=lr
    )
    np.testing.assert_allclose(model.train_error, train_error, rtol=1e-9)
    np.testing.assert_allclose(model.test_error, test_error, rtol=1e-9)
    for (gw, gb), (ww, wb) in zip(model.weights, weights):
        np.testing.assert_allclose(gw, ww, rtol=1e-9)
        np.testing.assert_allclose(gb, wb, rtol=1e-9)


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


def test_scg_matches_serial_replay(spark, xor_df):
    """VALUE oracle for the fifth Weight.java strategy (SCG): the
    distributed engine run must equal an independent single-process
    transcription of Møller's scaled-conjugate-gradient state machine
    (probe/candidate phases, PD-forcing lambda, restart every N steps)
    driven by the same serially-replayed gradient evaluations — to
    1e-9, for the reported errors, the accepted point, AND the next
    evaluation point. Completes optimizer-family replay parity
    (backprop/manhattan/RPROP/quickprop above)."""
    from guagua_spark.algorithms.nn import scg_best_weights

    rounds, sigma0 = 9, 1e-4
    parts = _partition_rows(xor_df)

    init = init_weights([4, 8, 1], 42)
    shapes = [(w.shape, b.shape) for w, b in init]

    def unflat(v):
        out, i = [], 0
        for ws, bs in shapes:
            nw, nb = int(np.prod(ws)), int(np.prod(bs))
            out.append(
                (
                    v[i : i + nw].reshape(ws),
                    v[i + nw : i + nw + nb].reshape(bs),
                )
            )
            i += nw + nb
        return out

    eval_w = [(w.copy(), b.copy()) for w, b in init]
    st = None
    reported = []
    for _ in range(rounds):
        mean_g, E, _te = _serial_round(parts, eval_w)
        gv = np.concatenate([g.ravel() for g in mean_g])
        if st is None:
            w0 = np.concatenate(
                [np.concatenate([w.ravel(), b.ravel()]) for w, b in eval_w]
            )
            p = -gv
            sigma = sigma0 / max(float(np.linalg.norm(p)), 1e-12)
            st = dict(
                w=w0, E=E, g=gv, p=p, lam=1e-6, lam_bar=0.0, k=1,
                sigma=sigma, phase="probe",
            )
            nxt = w0 + sigma * p
        elif st["phase"] == "probe":
            pn2 = float(st["p"] @ st["p"])
            s = (gv - st["g"]) / st["sigma"]
            delta = float(st["p"] @ s) + (st["lam"] - st["lam_bar"]) * pn2
            if delta <= 0:
                st["lam_bar"] = 2.0 * (st["lam"] - delta / pn2)
                delta = -delta + st["lam"] * pn2
                st["lam"] = st["lam_bar"]
            mu = float(st["p"] @ (-st["g"]))
            st.update(delta=delta, mu=mu, alpha=mu / delta, phase="candidate")
            nxt = st["w"] + st["alpha"] * st["p"]
        else:
            pn2 = float(st["p"] @ st["p"])
            delta, mu, alpha = st["delta"], st["mu"], st["alpha"]
            comp = 2.0 * delta * (st["E"] - E) / (mu * mu)
            if comp >= 0:
                r_new, r_old = -gv, -st["g"]
                beta = float(r_new @ r_new - r_new @ r_old) / mu
                st["w"] = st["w"] + alpha * st["p"]
                st["E"], st["g"] = E, gv
                st["k"] += 1
                st["p"] = (
                    r_new
                    if st["k"] % st["w"].size == 0
                    else r_new + beta * st["p"]
                )
                st["lam_bar"] = 0.0
                if comp >= 0.75:
                    st["lam"] *= 0.25
            else:
                st["lam_bar"] = st["lam"]
            if comp < 0.25:
                st["lam"] = min(st["lam"] + delta * (1.0 - comp) / pn2, 1e10)
            st["sigma"] = sigma0 / max(float(np.linalg.norm(st["p"])), 1e-12)
            st["phase"] = "probe"
            nxt = st["w"] + st["sigma"] * st["p"]
        reported.append(st["E"])
        eval_w = unflat(nxt)

    model, errors = _train(spark, xor_df, "scg", iters=rounds)
    np.testing.assert_allclose(errors, reported, rtol=1e-9)
    for (gw, gb), (rw, rb) in zip(model.weights, eval_w):
        np.testing.assert_allclose(gw, rw, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(gb, rb, rtol=1e-9, atol=1e-12)
    for (gw, gb), (rw, rb) in zip(scg_best_weights(model), unflat(st["w"])):
        np.testing.assert_allclose(gw, rw, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(gb, rb, rtol=1e-9, atol=1e-12)
