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
    # phase-1 output must hold multiple partial rows for the hot key
    partial = (
        skewed_df.withColumn(
            "__salt", (F.rand(seed=42) * 8).cast("int")
        )
        .groupBy("key", "__salt")
        .count()
    )
    hot_partials = partial.filter(F.col("key") == "hot").count()
    assert hot_partials > 1


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
