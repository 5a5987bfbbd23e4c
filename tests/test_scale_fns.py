"""Skew salting correctness + bucketed-join exchange elimination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from guagua_spark.functions.scale import (
    bucketed_join,
    salted_agg,
    write_bucketed,
)


@pytest.fixture(scope="module")
def skewed_df(spark):
    # 90% of rows share one key — the shape that breaks plain groupBy
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("key"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    return df.persist()


def test_salted_agg_equals_plain_agg(spark, skewed_df):
    got = salted_agg(
        skewed_df,
        ["key"],
        {
            "total": ("v", "sum"),
            "n": ("v", "count"),
            "lo": ("v", "min"),
            "hi": ("v", "max"),
        },
        n_salts=8,
    )
    want = skewed_df.groupBy("key").agg(
        F.sum("v").alias("total"),
        F.count("v").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    cols = ("key", "total", "n", "lo", "hi")
    g = sorted(tuple(r[c] for c in cols) for r in got.collect())
    w = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert g == w


def test_salted_agg_spreads_hot_key(spark, skewed_df):
    # phase-1 output must hold multiple partial rows for the hot key —
    # mirror salted_agg's mono-id salt (retry-stable, immune to the
    # identical-rows collapse a content hash would suffer, and spreads
    # even a key confined to one input partition)
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(8))
    partial = (
        skewed_df.withColumn("__salt", salt).groupBy("key", "__salt").count()
    )
    hot_partials = partial.filter(F.col("key") == "hot").count()
    assert hot_partials > 1


def test_salted_agg_spreads_identical_duplicate_rows(spark):
    """The count-duplicates shape: the hot key's rows are ALL identical
    (a content-derived salt would collapse them onto one reducer).
    Mono-id salting must still produce several phase-1 partials
    and the exact aggregate."""
    df = spark.range(0, 40000, 1, 16).select(
        F.lit("hot").alias("key"), F.lit(1.0).alias("v")
    )
    got = salted_agg(df, ["key"], {"n": ("v", "count")}, n_salts=8).collect()
    assert [(r.key, r.n) for r in got] == [("hot", 40000)]
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(8))
    partials = (
        df.withColumn("__salt", salt).groupBy("key", "__salt").count().count()
    )
    assert partials > 1


def test_salted_agg_spreads_single_partition_hot_key(spark):
    """A hot key confined to ONE input partition (sorted/bucketed-
    by-key inputs, one big gzip scanning as a single split): the
    partition-id salt degraded this to a plain groupBy; the mono-id
    salt must still fan it across all n_salts reducers AND stay
    exact."""
    df = spark.range(0, 30000, 1, 1).select(
        F.lit("hot").alias("key"), (F.col("id") % 5).cast("double").alias("v")
    )
    assert df.rdd.getNumPartitions() == 1
    got = salted_agg(
        df,
        ["key"],
        {"n": ("v", "count"), "total": ("v", "sum"), "hi": ("v", "max")},
        n_salts=8,
    ).collect()
    assert [(r.key, r.n, r.total, r.hi) for r in got] == [
        ("hot", 30000, float(sum(i % 5 for i in range(30000))), 4.0)
    ]
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(8))
    partials = (
        df.withColumn("__salt", salt).groupBy("key", "__salt").count().count()
    )
    assert partials == 8, "single-partition hot key must use every salt"


def test_salted_agg_rejects_non_decomposable(skewed_df):
    with pytest.raises(ValueError):
        salted_agg(skewed_df, ["key"], {"m": ("v", "median")})


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    import shutil

    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bkt_left", "bkt_right"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    left = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "bkt_left", ["k"], n_buckets=8)
    write_bucketed(right, "bkt_right", ["k"], n_buckets=8)
    # force the shuffle-join path: tiny test tables would otherwise be
    # broadcast (the right call for small dims — bucketing pays off on
    # two LARGE sides, which is what this asserts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bkt_left", "bkt_right", ["k"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _skewed_events(spark):
    """6k events, user 0 holding 5/6 of all rows — the one-user-
    dominates shape the window-family escape exists for."""
    from pyspark.sql import functions as F

    return spark.range(6000).select(
        F.when(F.col("id") < 5000, 0)
        .otherwise((F.col("id") % 20) + 1)
        .alias("user_id"),
        # ~1-minute cadence with a 2h jump every 97 rows → several
        # gap-sessions per user
        F.timestamp_seconds(
            F.lit(1700000000)
            + F.col("id") * 60
            + (F.col("id") / 97).cast("int") * 7200
        ).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
        F.col("id").alias("event_id"),
    )


def test_bucketed_running_sum_matches_naive_and_plan(spark):
    import re

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from guagua_spark.functions.scale import bucketed_running_sum

    ev = _skewed_events(spark)
    safe = bucketed_running_sum(
        ev,
        "user_id",
        "ts",
        "value",
        F.date_trunc("hour", F.col("ts")),
        ["ts", "event_id"],
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = ev.withColumn("running_value", F.sum("value").over(w))
    key = lambda r: (r.user_id, r.event_id)
    got = {key(r): r.running_value for r in safe.collect()}
    want = {key(r): r.running_value for r in naive.collect()}
    # integer-valued doubles → order-independent summation → exact
    assert got == want
    # the hazard is a window partitioned by the key ALONE over the
    # event-level relation; every event-level window here must carry
    # __bucket in its partition spec
    plan = safe._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"windowspecdefinition\(user_id#\d+L?, ts#", plan), plan
    assert re.search(
        r"windowspecdefinition\(user_id#\d+L?, __bucket#", plan
    ), plan


def test_bucketed_sessionize_matches_naive_and_plan(spark):
    import re

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from guagua_spark.functions.scale import bucketed_sessionize

    ev = _skewed_events(spark)
    gap_min = 30
    safe = bucketed_sessionize(
        ev, "user_id", "ts", "value", gap_min, F.date_trunc("day", F.col("ts"))
    )
    by_user = Window.partitionBy("user_id").orderBy("ts")
    naive = (
        ev.withColumn(
            "new_session",
            F.when(
                F.col("ts") - F.lag("ts").over(by_user)
                > F.expr(f"INTERVAL {gap_min} MINUTES"),
                1,
            ).otherwise(0),
        )
        .withColumn("session_seq", F.sum("new_session").over(by_user) + 1)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )
    key = lambda r: (r.user_id, r.session_seq)
    got = {
        key(r): (r.session_start, r.session_end, r.n_events, r.total_value)
        for r in safe.collect()
    }
    want = {
        key(r): (r.session_start, r.session_end, r.n_events, r.total_value)
        for r in naive.collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        gs, ge, gn, gv = got[k]
        ws, we, wn, wv = want[k]
        assert (gs, ge, gn) == (ws, we, wn), k
        assert abs(gv - wv) < 1e-6, k  # summation order may differ
    # no event-level window partitioned by the key alone: the only
    # per-key windows run over the condensed session-interval relation
    plan = safe._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"windowspecdefinition\(user_id#\d+L?, ts#", plan), plan


def test_assign_dense_ids(spark):
    """Dense, unique, 0..n−1, all original columns preserved, and
    deterministic across invocations on the same deterministic plan."""
    from guagua_spark.functions.scale import assign_dense_ids

    df = spark.range(0, 5000, 1, 8).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = assign_dense_ids(df, "rid")
    rows = out.collect()
    ids = sorted(r.rid for r in rows)
    assert ids == list(range(5000))
    assert {r.k for r in rows} == set(range(5000))
    again = {r.k: r.rid for r in assign_dense_ids(df, "rid").collect()}
    assert all(again[r.k] == r.rid for r in rows)


def test_assign_dense_ids_pinned_nondeterministic_input(spark):
    """pin=True must yield dense unique ids even when the upstream
    plan is non-deterministic between jobs (simulated with an
    unseeded sample — each evaluation draws different rows)."""
    from guagua_spark.functions.scale import assign_dense_ids

    df = (
        spark.range(0, 20000, 1, 8)
        .select(F.col("id").alias("k"))
        .sample(0.5)
    )
    out = assign_dense_ids(df, "rid", pin=True)
    rows = out.collect()
    ids = sorted(r.rid for r in rows)
    assert ids == list(range(len(rows))), "gapped or duplicate ids"


def test_rollup_maintenance_equals_full_recompute(spark, sf_dir):
    """save_rollup on an old slice + merge_rollup over two delta
    batches must equal the one-shot rollup of the full table — for
    every decomposable aggregate kind at once."""
    from guagua_spark.functions.scale import merge_rollup, save_rollup
    from guagua_spark.sources.tables import load_table

    spark.sql("DROP TABLE IF EXISTS t_rollup")
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    aggs = {
        "n_docs": ("doc_id", "count"),
        "total_chars": ("n_chars", "sum"),
        "min_chars": ("n_chars", "min"),
        "max_chars": ("n_chars", "max"),
    }
    old = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter(F.col("doc_id") % 3 == 2)
    save_rollup("t_rollup", old, ["lang"], aggs)
    merge_rollup(spark, "t_rollup", b1, ["lang"], aggs)
    merge_rollup(spark, "t_rollup", b2, ["lang"], aggs)
    got = {
        r["lang"]: (r["n_docs"], r["total_chars"], r["min_chars"], r["max_chars"])
        for r in spark.table("t_rollup").collect()
    }
    want = {
        r["lang"]: (r["n_docs"], r["total_chars"], r["min_chars"], r["max_chars"])
        for r in docs.groupBy("lang")
        .agg(
            F.count("doc_id").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .collect()
    }
    assert got == want
    spark.sql("DROP TABLE IF EXISTS t_rollup")


def test_rollup_maintenance_rejects_non_decomposable(spark, sf_dir):
    import pytest as _pytest

    from guagua_spark.functions.scale import save_rollup
    from guagua_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    with _pytest.raises(ValueError):
        save_rollup(
            "t_bad", docs, ["lang"], {"m": ("n_chars", "median")}
        )


def test_weighted_sample_negative_weights_ineligible(spark):
    """w < 0 must not outrank valid rows (u^(1/w) > 1 without the
    guard); w ≤ 0 rows only appear when positives run out."""
    from guagua_spark.operators.pipeline import weighted_sample

    df = spark.createDataFrame(
        [(i, -1 if i < 50 else 10) for i in range(100)], "id long, w long"
    )
    got = {r["id"] for r in weighted_sample(df, "w", "id", 30).collect()}
    assert all(i >= 50 for i in got), got


def test_deterministic_shuffle_null_keys_stable(spark):
    """NULL keys must hash deterministically and distinctly from empty
    and from swapped columns (concat_ws would collapse these)."""
    from guagua_spark.operators.packing import deterministic_shuffle

    df = spark.createDataFrame(
        [("x", None), (None, "x"), ("", "x"), ("x", "")],
        "a string, b string",
    )
    runs = [
        {
            (r["a"], r["b"]): r["pos"]
            for r in deterministic_shuffle(df, ["a", "b"], seed="s").collect()
        }
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
    assert sorted(runs[0].values()) == [0, 1, 2, 3]


def test_rollup_maintenance_property_random_splits(spark):
    """Any partition of any small frame into merge batches must equal
    the one-shot rollup — hypothesis over batch boundaries and data."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from guagua_spark.functions.scale import merge_rollup, save_rollup

    @given(
        vals=st.lists(
            st.tuples(st.integers(0, 3), st.integers(-50, 50)),
            min_size=1,
            max_size=30,
        ),
        cut=st.integers(0, 29),
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(vals, cut):
        cut = min(cut, len(vals) - 1)
        df = spark.createDataFrame(vals, "k int, v long")
        aggs = {
            "n": ("v", "count"),
            "s": ("v", "sum"),
            "lo": ("v", "min"),
            "hi": ("v", "max"),
        }
        spark.sql("DROP TABLE IF EXISTS t_prop_rollup")
        head = spark.createDataFrame(vals[: cut + 1], "k int, v long")
        save_rollup("t_prop_rollup", head, ["k"], aggs)
        if vals[cut + 1 :]:
            tail = spark.createDataFrame(vals[cut + 1 :], "k int, v long")
            merge_rollup(spark, "t_prop_rollup", tail, ["k"], aggs)
        got = sorted(tuple(r) for r in spark.table("t_prop_rollup").collect())
        want = sorted(
            tuple(r)
            for r in df.groupBy("k")
            .agg(
                F.count("v").alias("n"),
                F.sum("v").alias("s"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
            )
            .collect()
        )
        assert got == want
        spark.sql("DROP TABLE IF EXISTS t_prop_rollup")

    check()


def test_salted_topk_equals_plain_window(spark):
    """salted_topk must equal the single-window top-k for any data
    under a total order — including a hot key holding half the rows
    and k larger than some groups."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from guagua_spark.functions.scale import salted_topk

    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 2 == 0, "hot")
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("key"),
        (F.col("id") * 2654435761 % 1000003).alias("score"),
        F.col("id"),
    )
    order = [F.col("score").desc(), F.col("id")]
    got = sorted(
        tuple(r)
        for r in salted_topk(df, ["key"], order, 25).collect()
    )
    w = Window.partitionBy("key").orderBy(*order)
    want = sorted(
        tuple(r)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 25)
        .collect()
    )
    assert got == want


def test_salted_unpinned_shuffle_input_warns(spark):
    """Round-8 contract surfacing: a shuffle-rooted input without
    pin=True warns (the record-index salt is retry-unstable there);
    pin=True and scan/range-rooted inputs stay silent."""
    import warnings

    from guagua_spark.functions.scale import salted_agg, salted_topk

    base = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("key"), F.col("id").alias("v")
    )
    # groupBy("key") genuinely shuffles (grouping by the unique v=id
    # column plans exchange-free — Spark proves partition-local groups)
    shuffled = base.groupBy("key").agg(F.sum("v").alias("v"))
    with pytest.warns(UserWarning, match="shuffle-rooted"):
        salted_agg(shuffled, ["key"], {"n": ("v", "count")})
    with pytest.warns(UserWarning, match="shuffle-rooted"):
        salted_topk(shuffled, ["key"], [F.col("v").desc()], 3)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # range-rooted: silent
        salted_agg(base, ["key"], {"n": ("v", "count")})
        salted_topk(base, ["key"], [F.col("v").desc()], 3)
        # shuffle-rooted but pinned: silent
        salted_agg(shuffled, ["key"], {"n": ("v", "count")}, pin=True)
        salted_topk(
            shuffled, ["key"], [F.col("v").desc()], 3, pin=True
        )


def test_orphan_clear_handles_qualified_and_current_db(spark, tmp_path):
    """Round-9 advice: the orphan guard must resolve db-qualified names
    to <warehouse>/<db>.db/<table> (and unqualified names under the
    CURRENT database), not <warehouse>/<table> — otherwise it silently
    no-ops and saveAsTable fails with LOCATION_ALREADY_EXISTS."""
    import os

    from guagua_spark.functions.scale import save_table

    df = spark.range(3).withColumnRenamed("id", "v")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    spark.sql("CREATE DATABASE IF NOT EXISTS t_orphdb")
    try:
        # plant an orphaned location with NO catalog entry
        orphan = os.path.join(wh, "t_orphdb.db", "t_orph")
        os.makedirs(orphan, exist_ok=True)
        open(os.path.join(orphan, "junk"), "w").write("x")
        save_table(df, "t_orphdb.t_orph")  # must clear + succeed
        assert spark.table("t_orphdb.t_orph").count() == 3
        spark.sql("DROP TABLE t_orphdb.t_orph")

        # unqualified name under a non-default CURRENT database
        spark.catalog.setCurrentDatabase("t_orphdb")
        orphan2 = os.path.join(wh, "t_orphdb.db", "t_orph2")
        os.makedirs(orphan2, exist_ok=True)
        open(os.path.join(orphan2, "junk"), "w").write("x")
        save_table(df, "t_orph2")
        assert spark.table("t_orph2").count() == 3
        spark.sql("DROP TABLE t_orph2")
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP DATABASE IF EXISTS t_orphdb CASCADE")


def test_binder_hash_matches_sql_twin(spark):
    """binder_hash_col and binder_hash_sql must produce the identical
    residue per row (the Σ-safe certificate binder that replaced the
    weighted-id sums which overflowed BIGINT at sf100), and every
    value must sit under BINDER_MOD so a bigint Σ holds to ~9e12
    rows."""
    import duckdb

    from guagua_spark.functions.scale import (
        BINDER_MOD,
        binder_hash_col,
        binder_hash_sql,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, i * 37 % 11, i * 1_000_003) for i in range(50)],
        "a bigint, b bigint, c bigint",
    )
    got = {
        r["a"]: r["h"]
        for r in df.select(
            "a",
            binder_hash_col(
                "t", F.col("a"), F.col("b"), F.col("c")
            ).alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    sql = binder_hash_sql(
        "t",
        "CAST(a AS VARCHAR)",
        "CAST(b AS VARCHAR)",
        "CAST(c AS VARCHAR)",
    )
    rows = con.execute(
        f"SELECT a, {sql} AS h FROM (SELECT unnest(range(50)) AS a,"
        f" unnest(range(50)) * 37 % 11 AS b,"
        f" unnest(range(50)) * 1000003 AS c)"
    ).fetchall()
    for a, h in rows:
        assert got[a] == h, (a, got[a], h)
        assert 0 <= h < BINDER_MOD
