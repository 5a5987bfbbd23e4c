"""Event analytics operators vs the DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from guagua_spark.operators.events import ORACLE_SQL, QUERIES

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_events_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ORACLE_SQL[name], rtol=1e-6)


def test_asof_join_tie_and_miss_semantics(spark):
    """A right row at EXACTLY the left ts matches (≤); a left row
    before any right row gets nulls; the latest preceding right row
    wins (not the first)."""
    from guagua_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 20, "b"), (2, 10, "c")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 15, 200.0), (2, 11, 300.0)],
        "k long, ts long, v double",
    )
    got = {
        (r.k, r.ts, r.asof_ts, r.asof_v)
        for r in asof_join(
            left, right, on="k", right_cols=("v",)
        ).collect()
    }
    assert got == {
        (1, 5, 5, 100.0),     # tie: right row at equal ts included
        (1, 20, 15, 200.0),   # latest preceding, not earliest
        (2, 10, None, None),  # nothing at or before → nulls
    }


def test_sessionize_single_exchange(spark, oracle_sf_dir):
    """Both window passes must reuse ONE exchange+sort on user_id."""
    plan = (
        QUERIES["events_sessionize"](spark, oracle_sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning(user_id") <= 1, plan


def test_audience_overlap_matches_oracle(spark, oracle_sf_dir, duck):
    from guagua_spark.operators.events import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    df = LOCAL_QUERIES["events_audience_overlap"](spark, oracle_sf_dir)
    assert_matches_oracle(
        df, duck, LOCAL_ORACLE_SQL["events_audience_overlap"], rtol=1e-6
    )


def test_audience_overlap_estimates_behave(spark, oracle_sf_dir):
    """Sketch set algebra sanity on the deterministic corpus: the
    union estimate dominates both operands (register-wise MAX only
    grows a sketch), every corrected estimate lands within 10% of its
    exact cardinality at this fill, and the derived intersection
    estimate is both consistent (a + b − u identically) and accurate."""
    from guagua_spark.operators.events import LOCAL_QUERIES

    r = LOCAL_QUERIES["events_audience_overlap"](
        spark, oracle_sf_dir
    ).first()
    assert r["u_est"] >= max(r["a_est"], r["b_est"])
    for est, exact in [
        ("a_est", "exact_a"),
        ("b_est", "exact_b"),
        ("u_est", "exact_union"),
        ("inter_est", "exact_inter"),
    ]:
        assert abs(r[est] - r[exact]) / r[exact] < 0.10, (est, r)
    assert abs(
        r["inter_est"] - round(r["a_est"] + r["b_est"] - r["u_est"], 6)
    ) < 1e-9


def test_gapfill_matches_oracle(spark, oracle_sf_dir, duck):
    from guagua_spark.operators.events import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    df = LOCAL_QUERIES["events_gapfill_hourly"](spark, oracle_sf_dir)
    assert_matches_oracle(
        df, duck, LOCAL_ORACLE_SQL["events_gapfill_hourly"], rtol=1e-6
    )


def test_gapfill_grid_and_locf_semantics(spark, oracle_sf_dir):
    """Dense grid invariants on the real corpus: per user exactly
    (last−first)+1 hourly rows, gap rows carry n_events = 0 with the
    LOCF value equal to the most recent real hour's max, and the
    first row of every user is never a gap (the grid starts at an
    observed hour)."""
    from guagua_spark.operators.events import LOCAL_QUERIES

    rows = LOCAL_QUERIES["events_gapfill_hourly"](
        spark, oracle_sf_dir
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user) > 1
    gaps = 0
    for seq in by_user.values():
        seq.sort(key=lambda r: r["hour"])
        span = int(
            (seq[-1]["hour"] - seq[0]["hour"]).total_seconds() // 3600
        )
        assert len(seq) == span + 1, "grid must be dense"
        assert seq[0]["n_events"] > 0
        last_real = None
        for r in seq:
            if r["n_events"] == 0:
                gaps += 1
                assert r["hmax"] is None
                assert r["ffill_value"] == last_real
            else:
                last_real = r["hmax"]
                assert r["ffill_value"] == r["hmax"]
    assert gaps > 0, "corpus must exercise the fill"


def test_session_bigrams_match_oracle(spark, oracle_sf_dir, duck):
    from guagua_spark.operators.events import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    df = LOCAL_QUERIES["events_session_bigrams"](spark, oracle_sf_dir)
    assert_matches_oracle(
        df, duck, LOCAL_ORACLE_SQL["events_session_bigrams"]
    )


def test_session_bigrams_agree_with_sessionize(spark, oracle_sf_dir):
    """Transition totals are tied to events_sessionize's own session
    inventory: Σ n_transitions = Σ (session length − 1) — every event
    but each session's first is the target of exactly one in-session
    transition. Proves the two operators share session boundaries."""
    from guagua_spark.operators.events import LOCAL_QUERIES, QUERIES

    trans = LOCAL_QUERIES["events_session_bigrams"](
        spark, oracle_sf_dir
    ).collect()
    sess = QUERIES["events_sessionize"](spark, oracle_sf_dir).collect()
    assert sum(r["n_transitions"] for r in trans) == sum(
        r["n_events"] - 1 for r in sess
    )
    assert all(r["n_sessions"] <= r["n_transitions"] for r in trans)


def test_session_bigrams_single_user_exchange(spark, oracle_sf_dir):
    """Both window passes (session cumsum + pairing lag) must ride ONE
    user_id exchange — the per-(user, session) second exchange is the
    regression this pins."""
    import re

    from guagua_spark.operators.events import LOCAL_QUERIES

    df = LOCAL_QUERIES["events_session_bigrams"](spark, oracle_sf_dir)
    p = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    n = len(re.findall(r"Exchange hashpartitioning\(user_id", p))
    assert n == 1, f"{n} user_id exchanges:\n{p}"


def test_join_size_cm_matches_oracle(spark, oracle_sf_dir, duck):
    from guagua_spark.operators.events import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    df = LOCAL_QUERIES["events_join_size_cm"](spark, oracle_sf_dir)
    assert_matches_oracle(
        df, duck, LOCAL_ORACLE_SQL["events_join_size_cm"]
    )


def test_join_size_cm_one_sided(spark, oracle_sf_dir):
    """The inner-product estimate NEVER underestimates the true join
    size (collision cross-terms are non-negative)."""
    from guagua_spark.operators.events import LOCAL_QUERIES

    r = LOCAL_QUERIES["events_join_size_cm"](spark, oracle_sf_dir).first()
    assert r["est_join"] >= r["exact_join"] > 0


def test_join_size_cm_exact_on_tiny_keys(spark):
    """With key sets small enough that no CM buckets collide, the
    inner product is EXACTLY the join size."""
    from guagua_spark.functions.sketch import cm_counters
    from guagua_spark.operators.events import cm_join_size

    a = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 3]], "k long"
    )
    b = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 4]], "k long"
    )
    est = cm_join_size(
        cm_counters(a, "k"), cm_counters(b, "k")
    ).first()["est_join"]
    # true join size: key 1 -> 3*1, key 2 -> 1*2, keys 3/4 unmatched
    assert est == 5


def test_join_size_cm_zero_on_disjoint_keys(spark):
    """Disjoint key sets: some depth row almost surely shares no
    bucket, and an empty intersection certifies join size 0 — the
    estimate must be 0 (never NULL, never collision-inflated): the
    inner-product rows left-join a depth spine with COALESCE 0."""
    from guagua_spark.functions.sketch import cm_counters
    from guagua_spark.operators.events import cm_join_size

    a = spark.createDataFrame([(1,)], "k long")
    b = spark.createDataFrame([(2,)], "k long")
    est = cm_join_size(
        cm_counters(a, "k"), cm_counters(b, "k")
    ).first()["est_join"]
    assert est == 0


def test_retention_planted_window_and_dedup_semantics(spark, tmp_path):
    """Planted-semantics pin for the round-12 shape change (window
    filter BEFORE the distinct, cohorts straight off the stream): a
    user with MANY duplicate events per day still counts once per
    cell, activity past the window contributes nothing, and the
    cohort day is the true minimum even when it arrives last in the
    file. A regression to distinct-then-filter OR a lost distinct
    (duplicates double-counted) both flip these assertions."""
    import datetime

    from guagua_spark.operators.events import (
        RETENTION_MAX_DAYS,
        events_retention,
    )

    day0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, day, typ="click"):
        return (
            eid,
            day0 + datetime.timedelta(days=day, minutes=eid % 7),
            uid,
            typ,
            float(eid % 5),
            "{}",
        )

    rows = []
    eid = 0
    # user 1: five duplicate events on day 0 and day 2, plus day 9 and
    # day 30 activity (both beyond the 7-day window)
    for day in (0, 0, 0, 0, 0, 2, 2, 2, 2, 2, 9, 30):
        eid += 1
        rows.append(ev(eid, 1, day))
    # user 2: same cohort, active day 0 and day 7 (the boundary: IN)
    for day in (0, 7):
        eid += 1
        rows.append(ev(eid, 2, day))
    # user 3: later cohort day 2, active day 2 only; its cohort MIN
    # arrives as the LAST file row (order must not matter)
    eid += 1
    rows.append(ev(eid, 3, 5))
    eid += 1
    rows.append(ev(eid, 3, 2))
    # one purchase so the blm_* certificate build has a buyer
    eid += 1
    rows.append(ev(eid, 1, 0, typ="purchase"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "planted")
    df.coalesce(1).write.parquet(sf + "/events.parquet")
    got = {
        (r["cohort_day"].date().isoformat(), r["day_offset"]): r["n_users"]
        for r in events_retention(spark, sf).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # users 1+2 once each, duplicates folded
        ("2024-01-01", 2): 1,  # user 1 once despite 5 duplicate events
        ("2024-01-01", 7): 1,  # user 2: boundary day IS in the window
        ("2024-01-03", 0): 1,  # user 3: min-day cohort, file order moot
        ("2024-01-03", 3): 1,  # user 3 active day 5 = offset 3
    }
    assert RETENTION_MAX_DAYS == 7  # the boundary the test plants against
