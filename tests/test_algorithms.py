"""Algorithm workloads: fixed-seed convergence goldens (FIXTURES.md §2-4)
and equivalence between the engine-based and DataFrame-native k-means."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from guagua_spark.algorithms.gradient import (
    GradientDescentMaster,
    LinearGradientWorker,
    LogisticGradientWorker,
    sigmoid,
)
from guagua_spark.algorithms.kmeans import (
    KMeansMaster,
    KMeansWorker,
    assign_to_centroids,
    kmeans_dataframe,
)
from guagua_spark.engine import IterativeEngine


@pytest.fixture(scope="module")
def lr_df(spark):
    """Fixed-seed 2-feature binary classification data (FIXTURES.md §2)."""
    rng = np.random.default_rng(42)
    n = 400
    x = rng.normal(0, 2, size=(n, 2))
    true_w = np.array([0.5, 1.5, -2.0])
    z = true_w[0] + x @ true_w[1:]
    y = (rng.random(n) < sigmoid(z)).astype(float)
    rows = [(float(a), float(b), float(c)) for (a, b), c in zip(x, y)]
    return spark.createDataFrame(
        rows, "f1 double, f2 double, label double"
    ).repartition(4)


def test_logistic_regression_converges(spark, lr_df):
    engine = IterativeEngine(spark)
    model = engine.run(
        GradientDescentMaster(dim=2, learning_rate=1.0),
        LogisticGradientWorker(("f1", "f2"), "label"),
        lr_df,
        total_iteration=60,
    )
    # recovers the generating weights' signs and rough magnitudes
    assert model.weights[1] > 0.5
    assert model.weights[2] < -1.0
    assert model.loss < 0.15  # mean squared error on probabilities


def test_logistic_regression_deterministic(spark, lr_df):
    def run():
        return IterativeEngine(spark).run(
            GradientDescentMaster(dim=2, learning_rate=1.0),
            LogisticGradientWorker(("f1", "f2"), "label"),
            lr_df,
            total_iteration=10,
        )

    w1, w2 = run().weights, run().weights
    np.testing.assert_allclose(w1, w2, rtol=1e-9)


def test_logistic_halt_on_tolerance(spark, lr_df):
    engine = IterativeEngine(spark)
    model = engine.run(
        GradientDescentMaster(dim=2, learning_rate=1.0, tolerance=1e-7),
        LogisticGradientWorker(("f1", "f2"), "label"),
        lr_df,
        total_iteration=500,
    )
    assert model.halt is True
    assert len(engine.iteration_seconds) < 500


def test_linear_regression_recovers_weights(spark):
    rng = np.random.default_rng(7)
    n = 300
    x = rng.normal(0, 1, size=(n, 2))
    y = 2.0 + 3.0 * x[:, 0] - 1.5 * x[:, 1] + rng.normal(0, 0.01, n)
    rows = [(float(a), float(b), float(c)) for (a, b), c in zip(x, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double").repartition(3)
    model = IterativeEngine(spark).run(
        GradientDescentMaster(dim=2, learning_rate=0.5, tolerance=1e-12),
        LinearGradientWorker(("x1", "x2"), "y"),
        df,
        total_iteration=200,
    )
    np.testing.assert_allclose(
        model.weights, [2.0, 3.0, -1.5], atol=0.02
    )


@pytest.fixture(scope="module")
def cluster_df(spark):
    """4 well-separated gaussian blobs in 8-d, fixed seed."""
    rng = np.random.default_rng(42)
    centers = rng.uniform(-10, 10, size=(4, 8))
    pts = np.concatenate(
        [c + rng.normal(0, 0.3, size=(50, 8)) for c in centers]
    )
    rng.shuffle(pts)
    rows = [([float(v) for v in p],) for p in pts]
    # parallelize = contiguous slices: a KNOWN deterministic partition
    # layout (repartition's round-robin depends on scan chunking), so the
    # reference-parity init samples a reproducible candidate set
    rdd = spark.sparkContext.parallelize(rows, 4)
    return (
        spark.createDataFrame(rdd, "embedding array<double>"),
        centers,
    )


def test_kmeans_engine_finds_blobs(spark, cluster_df):
    df, centers = cluster_df
    model = IterativeEngine(spark).run(
        KMeansMaster(k=4, tolerance=1e-8),
        KMeansWorker(k=4),
        df,
        total_iteration=30,
    )
    assert model.halt is True
    # each true center has a found centroid within 0.2
    found = model.centroids
    for c in centers:
        d = np.min(np.linalg.norm(found - c, axis=1))
        assert d < 0.2, f"no centroid near {c[:3]}..., min dist {d}"


def test_kmeans_dataframe_matches_engine(spark, cluster_df):
    df, _ = cluster_df
    engine_model = IterativeEngine(spark).run(
        KMeansMaster(k=4, tolerance=1e-8),
        KMeansWorker(k=4),
        df,
        total_iteration=30,
    )
    # seed the DataFrame loop with the engine's converged centroids: one
    # more round must be a fixed point (assignment+means agree across the
    # two formulations)
    centroids, iters = kmeans_dataframe(
        df,
        k=4,
        dim=8,
        max_iterations=5,
        tolerance=1e-6,
        init_centroids=engine_model.centroids,
    )
    assert iters == 1
    np.testing.assert_allclose(
        np.sort(centroids, axis=0),
        np.sort(engine_model.centroids, axis=0),
        rtol=1e-6,
    )


def test_kmeans_reference_init_golden(spark):
    """DataFrame-native AND engine init must equal a local simulation of
    the reference scheme (KMeansWorker.java:116-137 stride sampling,
    KMeansMaster.java:60-96 norm-sort + pick k evenly) on data with a
    KNOWN partition layout (sc.parallelize contiguous slices)."""
    from guagua_spark.algorithms.kmeans import kmeans_reference_init

    k, dim, n, parts = 4, 6, 103, 4
    rng = np.random.default_rng(11)
    pts = rng.uniform(-5, 5, size=(n, dim))
    rows = [([float(v) for v in p],) for p in pts]
    rdd = spark.sparkContext.parallelize(rows, parts)
    df = spark.createDataFrame(rdd, "embedding array<double>")

    # --- local simulation, faithful to the Java: the reference defines
    # init per worker SPLIT, so feed the sim the actual partition
    # contents (glom), whatever pyspark's batching produced ---
    splits = df.rdd.glom().collect()
    assert len(splits) == parts and sum(len(s) for s in splits) == n
    cands = []
    for split in splits:
        chunk = np.array([r.embedding for r in split])
        m = max(1, len(chunk) // k)
        cands.extend(chunk[i] for i in range(0, len(chunk)) if i % m == 0)
    cands = np.array(cands)
    order = np.argsort(np.linalg.norm(cands, axis=1), kind="stable")
    cands = cands[order]
    step = max(1, len(cands) // k)
    want = cands[[i * step for i in range(k)]]

    got = kmeans_reference_init(df, k)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    engine_model_init = IterativeEngine(spark).run(
        KMeansMaster(k=k, tolerance=1e-8),
        KMeansWorker(k=k),
        df,
        total_iteration=1,
    )
    np.testing.assert_allclose(
        engine_model_init.centroids, want, rtol=0, atol=0
    )


def test_assign_to_centroids_tags(spark, cluster_df):
    df, _ = cluster_df
    centroids = np.zeros((2, 8))
    centroids[1] += 100.0  # everything is nearer c0
    tagged = assign_to_centroids(df, centroids)
    tags = [r.tag for r in tagged.select("tag").distinct().collect()]
    assert tags == [0]
