"""Extended relational operators vs the DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from guagua_spark.operators.relational_ext import ORACLE_SQL, QUERIES

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_relational_ext_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ORACLE_SQL[name], rtol=1e-6)


def test_approx_distinct_certificate_flags(spark, oracle_sf_dir, duck):
    row = QUERIES["rx_approx_distinct"](spark, oracle_sf_dir).collect()[0]
    exact_n, = duck.execute(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders"
    ).fetchone()
    assert row.n_customers_exact == exact_n
    assert row.hll_ok and row.p50_ok and row.p90_ok and row.p99_ok


def test_semi_join_plan_has_no_duplicating_join(spark, oracle_sf_dir):
    plan = (
        QUERIES["rx_semi_join_customers"](spark, oracle_sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan, plan


def test_latest_per_key_matches_oracle_and_plan(spark, oracle_sf_dir, duck):
    """The CDC latest-record compaction must match the window-based
    oracle AND plan as a partial-aggregated max_by (two HashAggregate
    levels, no Window, no per-key sort)."""
    from guagua_spark.operators.relational_ext import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    df = LOCAL_QUERIES["rx_latest_per_key"](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["rx_latest_per_key"])
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p, p
    assert p.count("HashAggregate") >= 2 or p.count("SortAggregate") >= 2, p


@pytest.mark.parametrize("name", ["rx_pivot_status", "rx_unpivot_status"])
def test_pivot_family_matches_oracle(spark, oracle_sf_dir, duck, name):
    from guagua_spark.operators.relational_ext import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    assert_matches_oracle(
        LOCAL_QUERIES[name](spark, oracle_sf_dir),
        duck,
        LOCAL_ORACLE_SQL[name],
    )


def test_pivot_is_single_scan_single_exchange(spark, oracle_sf_dir):
    """Pinned-values pivot must plan as one scan + one partial-agg
    exchange (CASE expansion), never one pass per pivot value."""
    from guagua_spark.operators.relational_ext import rx_pivot_status

    p = (
        rx_pivot_status(spark, oracle_sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("Scan parquet") == 1, p
    assert p.count("HashAggregate") >= 2, p


def test_grouping_sets_matches_oracle_and_plans_one_scan(
    spark, oracle_sf_dir, duck
):
    from guagua_spark.operators.relational_ext import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    df = LOCAL_QUERIES["rx_grouping_sets"](spark, oracle_sf_dir)
    # inspect the plan BEFORE executing: after a collect, AQE's
    # toString prints Final + Initial plans and every node twice
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in p, p
    assert p.count("Scan parquet") == 1, p
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["rx_grouping_sets"])


def test_association_rules_match_oracle(spark, oracle_sf_dir, duck):
    from guagua_spark.operators.relational_ext import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    df = LOCAL_QUERIES["rx_association_rules"](spark, oracle_sf_dir)
    assert_matches_oracle(
        df, duck, LOCAL_ORACLE_SQL["rx_association_rules"]
    )


def test_association_rules_invariants(spark, oracle_sf_dir):
    """Confidences are valid probabilities, sup_ab never exceeds either
    item support, and a rule's lift agrees with its confidences:
    lift = conf_ab / (sup_b / N) exactly."""
    from guagua_spark.operators.relational_ext import (
        LOCAL_QUERIES,
        RULES_TOPK,
    )

    rows = LOCAL_QUERIES["rx_association_rules"](
        spark, oracle_sf_dir
    ).collect()
    assert len(rows) == RULES_TOPK
    for r in rows:
        assert 0 < r["conf_ab"] <= 1 and 0 < r["conf_ba"] <= 1
        assert r["sup_ab"] <= min(r["sup_a"], r["sup_b"])
        assert r["lift"] > 0


def test_quality_audit_matches_oracle(spark, oracle_sf_dir, duck):
    from guagua_spark.operators.relational_ext import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    df = LOCAL_QUERIES["rx_quality_audit"](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["rx_quality_audit"])


def test_quality_audit_detects_planted_violations(spark):
    """Each constraint check fires on planted defects: a duplicated
    order key, a NULL customer FK, a non-positive price, an orphan
    order, and an orphan lineitem — so a green production audit means
    the checks ran and passed, not that they are vacuous."""
    import datetime

    from guagua_spark.operators.relational_ext import quality_audit_df

    d = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, d, "x"),
            (1, 10, "O", 5.0, d, "x"),      # dup key
            (2, None, "O", 5.0, d, "x"),    # null FK
            (3, 99, "O", -1.0, d, "x"),     # orphan + bad price
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    lineitem = spark.createDataFrame(
        [(1,), (7,)], "l_orderkey long"  # 7 is an orphan
    )
    r = quality_audit_df(orders, customer, lineitem).first()
    assert r["orders_rows"] == 4
    assert r["orders_dup_keys"] == 1
    assert r["orders_null_cust"] == 1
    assert r["orders_bad_price"] == 1
    # a NULL FK matches no parent, so it is BOTH a null-FK violation
    # and an orphan (LEFT ANTI keeps NULL keys; the oracle's NOT IN is
    # widened with IS NULL to match — plain SQL NOT IN would silently
    # drop NULL keys and under-count)
    assert r["orders_orphans"] == 2
    assert r["lineitem_orphans"] == 1


def test_interval_join_matches_oracle_and_plan(spark, oracle_sf_dir, duck):
    """Bin-join interval overlap must match DuckDB's native theta join
    AND plan as an equi hash/sort-merge join — no nested-loop or
    cartesian fallback (the whole point of the bucket strategy)."""
    from guagua_spark.operators.relational_ext import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    df = LOCAL_QUERIES["rx_interval_join"](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["rx_interval_join"])
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in p and "Cartesian" not in p, p


def test_interval_join_dedup_rule_counts_each_pair_once(spark):
    """Planted intervals that straddle a bucket boundary: the pair
    appears in BOTH buckets' join output without the dedup rule; the
    GREATEST(s, w_start)-bucket rule must keep exactly one copy."""
    import datetime

    from pyspark.sql import functions as F

    from guagua_spark.operators.relational_ext import _IVJ_BIN_DAYS

    day0 = datetime.date(1992, 1, 1)
    # window and interval both spanning the bucket-0/bucket-1 boundary
    boundary = day0 + datetime.timedelta(days=_IVJ_BIN_DAYS)
    w = spark.createDataFrame(
        [(0, boundary - datetime.timedelta(days=5),
          boundary + datetime.timedelta(days=5))],
        "window_id int, w_start date, w_end date",
    )
    iv = spark.createDataFrame(
        [(boundary - datetime.timedelta(days=3),
          boundary + datetime.timedelta(days=3))],
        "s date, e date",
    )

    def bkt(c):
        return F.floor(
            F.datediff(c, F.to_date(F.lit("1992-01-01"))) / _IVJ_BIN_DAYS
        ).cast("int")

    wb = w.withColumn("bkt", F.explode(F.sequence(bkt(F.col("w_start")),
                                                  bkt(F.col("w_end")))))
    ib = iv.withColumn("bkt", F.explode(F.sequence(bkt(F.col("s")),
                                                   bkt(F.col("e")))))
    joined = ib.join(wb, "bkt").where(
        (F.col("s") <= F.col("w_end")) & (F.col("e") >= F.col("w_start"))
    )
    assert joined.count() == 2  # both buckets see the pair...
    deduped = joined.where(
        F.col("bkt") == bkt(F.greatest(F.col("s"), F.col("w_start")))
    )
    assert deduped.count() == 1  # ...the rule keeps exactly one


def test_bucketed_join_matches_oracle_and_is_shuffle_free(
    spark, oracle_sf_dir, duck
):
    """Both sides pre-bucketed on the join key: the SortMergeJoin must
    plan with NO exchange on either join input (the only exchange in
    the query is the final groupBy's) and still match the plain-join
    oracle. Broadcast is disabled so the bucketed path is what's
    actually exercised."""
    from guagua_spark.operators.relational_ext import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = LOCAL_QUERIES["rx_bucketed_join"](spark, oracle_sf_dir)
        assert_matches_oracle(
            df, duck, LOCAL_ORACLE_SQL["rx_bucketed_join"]
        )
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in p, p
        assert "Bucketed: true" in p, p
        # no shuffle on either JOIN key — the groupBy exchange is on
        # o_orderpriority, which is fine and expected
        assert "Exchange hashpartitioning(o_orderkey" not in p, p
        assert "Exchange hashpartitioning(l_orderkey" not in p, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_twin_is_memoized_and_invalidates_by_name(spark, oracle_sf_dir):
    """Second call with unchanged inputs reuses the catalog table
    (same name); the name embeds the fingerprint+code hash so a data
    or code change misses to a rebuild."""
    from guagua_spark.operators.relational_ext import _bucketed_twin

    a = _bucketed_twin(
        spark, oracle_sf_dir, "orders", "o_orderkey",
        ["o_orderkey", "o_orderpriority"],
    )
    b = _bucketed_twin(
        spark, oracle_sf_dir, "orders", "o_orderkey",
        ["o_orderkey", "o_orderpriority"],
    )
    assert a == b
    assert spark.catalog.tableExists(a)


_SMB_SESSION_SCRIPT = """
import json, os, sys
sys.path.insert(0, {repo!r})
from guagua_spark.session import get_spark
from guagua_spark.operators.relational_ext import LOCAL_QUERIES
spark = get_spark(master="local[4]", shuffle_partitions=8,
                  extra_conf={{"spark.ui.enabled": "false",
                               "spark.sql.warehouse.dir": {wh!r},
                               "spark.sql.autoBroadcastJoinThreshold": "-1"}})
spark.sparkContext.setLogLevel("ERROR")
df = LOCAL_QUERIES["rx_bucketed_join"](spark, {sf!r})
rows = sorted((r["o_orderpriority"], r["n_lines"], round(r["revenue"], 2))
              for r in df.collect())
plan = df._jdf.queryExecution().executedPlan().toString()
mtimes = {{}}
for d in os.listdir({wh!r}):
    if d.startswith("g_smb_"):
        p = os.path.join({wh!r}, d)
        mtimes[d] = max(os.path.getmtime(os.path.join(p, f))
                        for f in os.listdir(p) if f.endswith(".parquet"))
with open({out!r}, "w") as f:
    json.dump({{"rows": rows,
                "bucketed": plan.count("Bucketed: true"),
                "key_exchange": ("Exchange hashpartitioning(o_orderkey" in plan
                                 or "Exchange hashpartitioning(l_orderkey" in plan),
                "mtimes": mtimes}}, f)
spark.stop()
"""


def test_bucketed_twin_reattaches_across_sessions(tmp_path):
    """Session B (a separate process — the in-memory catalog has
    forgotten everything) must RE-REGISTER the surviving twin
    directories as external bucketed tables instead of rebuilding:
    identical results, still no join-key exchange, and the parquet
    part files untouched (same mtimes — a rebuild would rewrite
    them)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf = os.environ.get("GUAGUA_TEST_SF_DIR", "/root/testdata/sf0.001")
    wh = str(tmp_path / "wh")
    results = []
    for tag in ("a", "b"):
        out = str(tmp_path / f"smb_{tag}.json")
        script = _SMB_SESSION_SCRIPT.format(repo=repo, wh=wh, sf=sf, out=out)
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True, text=True, timeout=600, cwd=repo,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        with open(out) as f:
            results.append(json.load(f))
    a, b = results
    assert a["rows"] == b["rows"] and len(a["rows"]) == 5
    assert b["bucketed"] >= 2 and not b["key_exchange"]
    assert a["mtimes"] == b["mtimes"], "session B rewrote the twin files"
