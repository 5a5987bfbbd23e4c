"""Bagging runner + hypothesis property tests (beyond-reference testing
per SURVEY.md §5: the reference has no property-based tests at all).
"""

from __future__ import annotations

from typing import Any, Iterator

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from guagua_spark.algorithms import SumMaster, SumState, SumWorker
from guagua_spark.algorithms.kmeans import KMeansPartial
from guagua_spark.api import (
    MasterComputable,
    WorkerComputable,
)
from guagua_spark.bagging import BaggingJob, run_bagging

# -- pure combine-law properties (no Spark) ---------------------------------


@given(st.lists(st.integers(-(10**9), 10**9), min_size=3, max_size=3))
def test_sumstate_combine_associative(vals):
    a, b, c = (SumState(v) for v in vals)
    left = a.combine(b).combine(c)
    right = a.combine(b.combine(c))
    assert left.value == right.value


@given(
    st.lists(
        st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=2),
        min_size=2,
        max_size=2,
    ),
    st.lists(st.integers(0, 1000), min_size=2, max_size=2),
)
def test_kmeans_partial_combine_commutative(sums, counts):
    import numpy as np

    a = KMeansPartial(sums=np.array(sums), counts=np.array(counts))
    b = KMeansPartial(sums=np.array(sums) * 2, counts=np.array(counts))
    ab, ba = a.combine(b), b.combine(a)
    assert np.allclose(ab.sums, ba.sums)
    assert (ab.counts == ba.counts).all()


# -- engine recurrence property (Spark-backed, few examples) -----------------


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(st.integers(1, 100), min_size=4, max_size=12),
    iters=st.integers(1, 4),
)
def test_engine_sum_matches_closed_form(spark, data, iters):
    """With W workers re-adding the prior master sum, Mₙ = W·Mₙ₋₁ + D
    ⇒ Mₙ = D·(Wⁿ−1)/(W−1). The engine must reproduce the closed form
    for arbitrary data and iteration counts (reference recurrence,
    SumTest.java:45-67)."""
    from guagua_spark.engine import IterativeEngine

    partitions = 2
    df = spark.createDataFrame(
        spark.sparkContext.parallelize([(v,) for v in data], partitions),
        "value long",
    )
    result = IterativeEngine(spark).run(
        SumMaster(), SumWorker(), df, total_iteration=iters
    )
    d = sum(data)
    want = d * (partitions**iters - 1) // (partitions - 1)
    assert result.value == want


# -- bagging ----------------------------------------------------------------


class FlakyOnceWorker(WorkerComputable):
    """Fails the whole job on its first attempt (attempt count rides the
    broadcast-free props dict — driver-side, like a submit counter)."""

    def compute(
        self, context, batches: Iterator[pa.RecordBatch]
    ) -> SumState:
        if context.props.get("fail.once") == "arm":
            raise RuntimeError("injected failure")
        return SumState(sum(b.num_rows for b in batches))


class ArmThenDisarmMaster(MasterComputable):
    def compute(self, context) -> Any:
        return SumState(sum(r.value for r in context.worker_results))


def test_bagging_runs_jobs_and_retries(spark):
    df = spark.createDataFrame(
        spark.sparkContext.parallelize([(i,) for i in range(10)], 2),
        "value long",
    )
    jobs = [
        BaggingJob(SumMaster(), SumWorker(), df, name="a",
                   run_kwargs={"total_iteration": 1}),
        BaggingJob(SumMaster(), SumWorker(), df, name="b",
                   run_kwargs={"total_iteration": 2}),
    ]
    r = run_bagging(spark, jobs)
    assert [x.value for x in r] == [45, 135]  # M1=45, M2=2*45+45


def test_bagging_surfaces_exhausted_failure(spark):
    df = spark.createDataFrame([(1,)], "value long")
    jobs = [
        BaggingJob(
            ArmThenDisarmMaster(),
            FlakyOnceWorker(),
            df,
            run_kwargs={"total_iteration": 1},
        )
    ]
    r = run_bagging(spark, jobs, max_retries=0,
                    props={"fail.once": "arm"})
    assert isinstance(r[0], Exception)
