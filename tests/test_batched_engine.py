"""iterations_per_job: K iterations per barrier-mode Spark job with the
master update applied by identical executor replicas (allGather
AllReduce). Values must MATCH the per-iteration path exactly — same
partition-order fold — including optimizer state carried across batch
boundaries and the golden halt semantics."""

from __future__ import annotations

import numpy as np
import pytest

from guagua_spark import IterativeEngine
from guagua_spark.algorithms.sum_ import SumMaster, SumWorker


def _sum_df(spark, n_partitions=2):
    rows = [(1,), (2,), (3,), (2,), (3,), (4,)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_partitions), "value long"
    )


def test_golden_sum_batched_equals_eager(spark):
    df = _sum_df(spark)
    r = IterativeEngine(spark).run(
        SumMaster(), SumWorker(), df, total_iteration=10,
        iterations_per_job=5,
    )
    assert r.value == 15345  # reference SumTest golden


def test_halt_inside_a_batch_stops_exactly_like_k1(spark):
    """50 rounds halts at 17 (value 1,966,065); with K=7 the halt falls
    mid-batch and every replica must break at the same inner round."""
    df = _sum_df(spark)
    r = IterativeEngine(spark).run(
        SumMaster(), SumWorker(), df, total_iteration=50,
        iterations_per_job=7,
    )
    assert r.value == 1966065
    assert bool(getattr(r, "halt", False))


def test_lr_batched_weights_bit_equal_to_per_iteration(spark):
    """Gradient fold is partition order on BOTH paths, so the trained
    weights must be bit-identical, not merely close."""
    from guagua_spark.algorithms.gradient import (
        GradientDescentMaster,
        LogisticGradientWorker,
    )

    rows = [
        (float(q % 13), float((q * 7) % 5) / 10.0, float(q % 2))
        for q in range(200)
    ]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 4), "q double, d double, y double"
    )
    def train(k):
        return IterativeEngine(spark).run(
            GradientDescentMaster(dim=2, learning_rate=0.5),
            LogisticGradientWorker(("q", "d"), "y"),
            df,
            total_iteration=6,
            iterations_per_job=k,
        )

    m1, m3 = train(1), train(3)
    assert np.array_equal(m1.weights, m3.weights)
    assert m1.loss == m3.loss


def test_nn_momentum_state_survives_batch_boundary(spark):
    """Backprop momentum lives in the master object; the driver adopts
    task 0's evolved replica between batches, so a K=2 run over 5
    rounds must equal the K=1 run bit-for-bit (and a K=5 single batch
    likewise)."""
    from guagua_spark.algorithms.nn import NNMaster, NNWorker

    rows = [
        (
            float(i % 11) / 11.0,
            float((i * 3) % 7) / 7.0,
            float((i * 5) % 13) / 13.0,
            float((i * 2) % 9) / 9.0,
            float(i % 2),
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3),
        "f1 double, f2 double, f3 double, f4 double, target double",
    )

    def train(k):
        return IterativeEngine(spark).run(
            NNMaster([4, 4, 1], learning_rate=0.1, algorithm="backprop"),
            NNWorker(("f1", "f2", "f3", "f4"), "target", validation_rate=0.0),
            df,
            total_iteration=5,
            iterations_per_job=k,
        )

    m1, m2, m5 = train(1), train(2), train(5)
    for (wa, ba), (wb, bb) in zip(m1.weights, m2.weights):
        assert np.array_equal(wa, wb) and np.array_equal(ba, bb)
    for (wa, ba), (wb, bb) in zip(m1.weights, m5.weights):
        assert np.array_equal(wa, wb) and np.array_equal(ba, bb)


def test_oversubscribed_partitions_fall_back(spark, caplog):
    """More partitions than slots cannot barrier-schedule: the engine
    must log and fall back to the per-iteration loop, same result."""
    import logging

    slots = spark.sparkContext.defaultParallelism
    df = _sum_df(spark, n_partitions=slots + 2)
    # Sum's recurrence is v_t = 15 + P*v_{t-1}: partition-count
    # dependent, so the control is a K=1 run at the SAME partitioning
    r1 = IterativeEngine(spark).run(
        SumMaster(), SumWorker(), df, total_iteration=10
    )
    with caplog.at_level(logging.WARNING, logger="guagua_spark.engine"):
        r = IterativeEngine(spark).run(
            SumMaster(), SumWorker(), df, total_iteration=10,
            iterations_per_job=5,
        )
    assert r.value == r1.value
    assert any("falling back" in m for m in caplog.messages)
