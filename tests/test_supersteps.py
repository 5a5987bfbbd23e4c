"""dataframe_supersteps: the shared iterate-join-aggregate discipline
behind pagerank, min-label propagation, and the star contraction."""

from pyspark.sql import functions as F

from guagua_spark.functions.supersteps import dataframe_supersteps


def _state(spark):
    return spark.createDataFrame([(0,)], "v long")


def test_fixed_rounds_runs_exactly_max(spark):
    st, rounds, converged = dataframe_supersteps(
        _state(spark),
        lambda s, i: s.select((F.col("v") + 1).alias("v")),
        5,
        checkpoint_every=2,
    )
    assert (rounds, converged) == (5, True)
    assert st.collect()[0].v == 5


def test_convergence_stops_early_and_returns_checkpointed_state(spark):
    # v saturates at 3: the first round with an unchanged sum converges
    mem = {"prev": None}

    def conv(_prev, nxt, _i):
        cur = nxt.agg(F.sum("v")).collect()[0][0]
        if cur == mem["prev"]:
            return True
        mem["prev"] = cur
        return False

    st, rounds, converged = dataframe_supersteps(
        _state(spark),
        lambda s, i: s.select(F.least(F.col("v") + 1, F.lit(3)).alias("v")),
        50,
        conv,
    )
    assert converged and rounds == 4  # 1,2,3 then the unchanged round
    assert st.collect()[0].v == 3


def test_budget_exhaustion_reports_not_converged(spark):
    st, rounds, converged = dataframe_supersteps(
        _state(spark),
        lambda s, i: s.select((F.col("v") + 1).alias("v")),
        3,
        lambda p, n, i: False,
    )
    assert (rounds, converged) == (3, False)
    # the partial state is still the budget's last round, for callers
    # that escalate to another algorithm rather than failing
    assert st.collect()[0].v == 3
