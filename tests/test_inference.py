"""Batch inference + evaluation ops vs the DuckDB oracle (training
replayed inside every oracle via the shared recursive CTE) plus value
sanity on the eval statistics themselves."""

from __future__ import annotations

import pytest

from guagua_spark.operators.inference import (
    LOCAL_ORACLE_SQL,
    LOCAL_QUERIES,
    trained_lr_weights,
)

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(LOCAL_ORACLE_SQL))
def test_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = LOCAL_QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL[name])


def test_weights_memoized(spark, oracle_sf_dir):
    w1 = trained_lr_weights(spark, oracle_sf_dir)
    w2 = trained_lr_weights(spark, oracle_sf_dir)
    assert w1 is w2  # second call is the memo hit, not a re-train
    assert len(w1) == 3


def test_auc_in_range_and_consistent(spark, oracle_sf_dir):
    row = LOCAL_QUERIES["infer_auc"](spark, oracle_sf_dir).first()
    assert 0.0 <= row["auc"] <= 1.0
    assert row["n_pos"] > 0 and row["n_neg"] > 0


def test_deciles_partition_the_input(spark, oracle_sf_dir):
    rows = LOCAL_QUERIES["infer_deciles"](spark, oracle_sf_dir).collect()
    total = sum(r["n"] for r in rows)
    stats = LOCAL_QUERIES["infer_score_stats"](
        spark, oracle_sf_dir
    ).collect()
    assert total == sum(r["n"] for r in stats)
    deciles = [r["decile"] for r in rows]
    assert deciles == sorted(deciles)
    assert all(0 <= d <= 9 for d in deciles)
    # gains monotonicity is data-dependent; partitioning is not
    assert len(rows) >= 2


def test_scoring_plan_is_map_side(spark, oracle_sf_dir):
    """The scored relation must add NO exchange over the feature scan —
    weights travel as plan literals, scoring fuses into the scan."""
    from guagua_spark.operators.inference import _lr_features, _scored

    base = _lr_features(spark, oracle_sf_dir)
    scored = _scored(spark, oracle_sf_dir)
    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")
    assert n_exchanges(scored) == n_exchanges(base)


def test_stored_model_round_trip(spark, oracle_sf_dir):
    """train → save_lr_model → load in 'another session' (memo
    cleared) → scoring plan and results identical to fresh-trained."""
    from guagua_spark.operators import inference as inf

    spark.sql("DROP TABLE IF EXISTS t_lr_model")
    inf.save_lr_model(spark, "t_lr_model", oracle_sf_dir)
    fresh = inf.trained_lr_weights(spark, oracle_sf_dir)
    inf.clear_caches()  # a new session has no memo
    stored = inf.load_lr_model(spark, "t_lr_model")
    assert stored == fresh
    spark.sql("DROP TABLE IF EXISTS t_lr_model")


def test_nn_scores_match_serial_numpy_replay(spark, oracle_sf_dir):
    """The unrolled Catalyst forward pass must agree with an
    independent serial-numpy forward over the same collected features
    (same oracle style as the optimizer value replays in test_nn.py),
    and the plan must contain no Python eval."""
    import numpy as np

    from guagua_spark.algorithms.nn import forward
    from guagua_spark.operators.inference import (
        infer_nn_scores,
        trained_nn_model,
    )
    from guagua_spark.operators.iterative import _nn_features

    got = {r["label"]: r for r in infer_nn_scores(spark, oracle_sf_dir).collect()}
    w = trained_nn_model(spark, oracle_sf_dir)
    pdf = _nn_features(spark, oracle_sf_dir).toPandas()
    x = pdf[["f1", "f2", "f3", "f4"]].to_numpy(dtype=float)
    scores = forward(w, x)[-1][:, 0]
    labels = pdf["target"].to_numpy(dtype=int)
    for lab in np.unique(labels):
        m = labels == lab
        row = got[int(lab)]
        assert row["n"] == int(m.sum())
        assert abs(row["avg_score"] - float(scores[m].mean())) < 1e-9
        assert row["n_flagged"] == int((scores[m] >= 0.5).sum())
    plan = (
        infer_nn_scores(spark, oracle_sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_auc_stable_across_repeated_runs(spark, oracle_sf_dir):
    """Regression guard for the range-sampling nondeterminism fixed in
    round 6 (unpinned dense ids produced duplicate ranks ~1 in 4
    runs): four consecutive evaluations must return the identical
    bit-exact AUC."""
    from guagua_spark.operators.inference import infer_auc

    vals = {
        infer_auc(spark, oracle_sf_dir).first()["auc"] for _ in range(4)
    }
    assert len(vals) == 1, vals


def test_tie_ranked_groups_equal_per_row_ranks(spark):
    """Round-10 rank-pin removal: the group-by-score prefix-sum
    avg_rank (cum − n + (n+1)/2) must equal the classical per-row
    tie-averaged rank (numpy replay) for every tie group, including
    all-tied and no-tie extremes."""
    import numpy as np

    from guagua_spark.operators.inference import _tie_ranked_groups

    scores = [0.1, 0.3, 0.3, 0.3, 0.7, 0.7, 0.9, 0.1, 0.5, 0.5]
    labels = [0.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0]
    df = spark.createDataFrame(
        list(zip(labels, scores)), "label double, score double"
    )
    got = {
        r["score"]: (r["n"], r["np"], r["avg_rank"])
        for r in _tie_ranked_groups(df).collect()
    }
    a = np.asarray(scores)
    order = np.argsort(a, kind="stable")
    ranks = np.empty(len(a), dtype=np.float64)
    sorted_a = a[order]
    i = 0
    while i < len(a):
        j = i
        while j < len(a) and sorted_a[j] == sorted_a[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        i = j
    for s in set(scores):
        idx = [k for k, v in enumerate(scores) if v == s]
        n, np_, avg = got[s]
        assert n == len(idx)
        assert np_ == sum(labels[k] for k in idx)
        assert avg == ranks[idx[0]]


def test_auc_plan_has_no_corpus_materialization(spark, oracle_sf_dir):
    """The round-10 AUC shape: no localCheckpoint scan (the old pin
    showed up as Scan ExistingRDD) and no range repartition — the only
    exchanges are the group-by-score shuffle and the domain-bounded
    SinglePartition window above the AGGREGATED relation."""
    from guagua_spark.operators.inference import infer_auc

    plan = (
        infer_auc(spark, oracle_sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ExistingRDD" not in plan
    assert "rangepartitioning" not in plan.lower()


def test_stored_nn_model_round_trip(spark, oracle_sf_dir):
    """save_nn_model/load_nn_model: the catalog round trip must
    reproduce the trained weights bit-exactly, so the reconstructed
    unrolled scoring plan equals the fresh-trained one."""
    import numpy as np

    from guagua_spark.operators.inference import (
        load_nn_model,
        save_nn_model,
        trained_nn_model,
    )

    save_nn_model(spark, "t_nn_model", oracle_sf_dir)
    save_nn_model(spark, "t_nn_model", oracle_sf_dir)  # overwrite ok
    got = load_nn_model(spark, "t_nn_model")
    want = trained_nn_model(spark, oracle_sf_dir)
    assert len(got) == len(want)
    for (gw, gb), (ww, wb) in zip(got, want):
        assert np.array_equal(gw, ww) and np.array_equal(gb, wb)
    spark.sql("DROP TABLE IF EXISTS t_nn_model")


def test_pr_auc_matches_numpy_replay(spark):
    """_pr_auc_from_scored vs an independent numpy implementation of
    step-wise average precision (Σ ΔR·P over descending distinct
    scores) and KS = max|TPR−FPR| — tie blocks included."""
    import numpy as np

    from guagua_spark.operators.inference import _pr_auc_from_scored

    scores = [0.9, 0.8, 0.8, 0.7, 0.6, 0.6, 0.6, 0.4, 0.3, 0.3]
    labels = [1.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0]
    df = spark.createDataFrame(
        list(zip(labels, scores)), "label double, score double"
    )
    row = _pr_auc_from_scored(df).first()

    s, y = np.asarray(scores), np.asarray(labels)
    p_total, n_total = y.sum(), (1 - y).sum()
    ap, ks, prev_r = 0.0, 0.0, 0.0
    ctp = cn = 0
    for v in sorted(set(scores), reverse=True):
        blk = s == v
        ctp += y[blk].sum()
        cn += blk.sum()
        prec = ctp / cn
        r = ctp / p_total
        ap += (r - prev_r) * prec
        prev_r = r
        ks = max(ks, abs(ctp / p_total - (cn - ctp) / n_total))
    assert row["pr_auc"] == round(ap, 6), (row["pr_auc"], ap)
    assert row["ks"] == round(ks, 6), (row["ks"], ks)
    assert row["n_pos"] == int(p_total) and row["n_neg"] == int(n_total)
