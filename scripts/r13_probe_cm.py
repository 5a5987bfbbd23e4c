"""A/B probe: current cm_counters (CM_DEPTH-way md5 fan per input
occurrence) vs a value-pre-aggregated form (groupBy(value).count()
first, fan md5s over the DISTINCT-value domain with SUM(n) weights —
the qcm_counters round-13 construction applied to the flat CM sketch).
Also A/Bs the full text_probe_freq_cm shape: the current query
tokenizes the corpus TWICE (once for the CM fan, once for the exact
probe counts); the candidate derives both from one per-token count
relation, so the second tokenize pass collapses into a ReusedExchange.

Asserts counter tables and query outputs identical row-for-row and
times with the noop sink (guide §1.4).

Usage: python scripts/r13_probe_cm.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from guagua_spark.functions.sketch import (  # noqa: E402
    CM_DEPTH,
    cm_bucket_col,
    cm_counters,
    cm_estimates,
)
from guagua_spark.session import get_spark  # noqa: E402
from guagua_spark.sources.tables import load_table  # noqa: E402


def cm_counters_preagg(df: DataFrame, col: str) -> DataFrame:
    """Candidate: aggregate per distinct value first, then fan md5s
    over the distinct domain with SUM(n) weights. Counters identical
    by sum associativity: bucket_j(v) is a pure function of v."""
    v = F.col(col).cast("string")
    per_value = (
        df.filter(v.isNotNull())
        .groupBy(v.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    fan = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    cm_bucket_col(j, F.col("_v")).alias("bucket"),
                )
                for j in range(CM_DEPTH)
            ]
        )
    ).alias("cell")
    return (
        per_value.select(fan, "_n")
        .groupBy(
            F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket")
        )
        .agg(F.sum("_n").alias("n"))
    )


def probe_freq_current(spark, sf_dir):
    from guagua_spark.operators.text import (
        BM25_QUERIES,
        _tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens()).alias("tok"))
    counters = cm_counters(toks, "tok")
    all_terms = sorted({t for _, ts in BM25_QUERIES for t in ts})
    probes = spark.createDataFrame([(t,) for t in all_terms], "tok string")
    est = cm_estimates(counters, probes, "tok")
    exact = (
        toks.filter(F.col("tok").isin(all_terms))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    ex = F.coalesce(F.col("exact_n"), F.lit(0))
    return (
        est.join(exact, "tok", "left")
        .select(
            "tok",
            F.col("cm_est").cast("bigint").alias("cm_est"),
            ex.cast("bigint").alias("exact_n"),
            (F.col("cm_est") - ex).cast("bigint").alias("overcount"),
        )
        .orderBy("tok")
    )


def probe_freq_candidate(spark, sf_dir):
    """One per-token count relation feeds BOTH the CM fan and the
    exact probe counts — the corpus tokenize+explode+partial-agg
    subtree is shared (ReusedExchange), and md5s run once per distinct
    token instead of once per occurrence."""
    from guagua_spark.operators.text import BM25_QUERIES, _tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens()).alias("tok"))
    tok_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_n"))
    fan = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    cm_bucket_col(j, F.col("tok").cast("string")).alias(
                        "bucket"
                    ),
                )
                for j in range(CM_DEPTH)
            ]
        )
    ).alias("cell")
    counters = (
        tok_counts.select(fan, "_n")
        .groupBy(
            F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket")
        )
        .agg(F.sum("_n").alias("n"))
    )
    all_terms = sorted({t for _, ts in BM25_QUERIES for t in ts})
    probes = spark.createDataFrame([(t,) for t in all_terms], "tok string")
    est = cm_estimates(counters, probes, "tok")
    exact = tok_counts.filter(F.col("tok").isin(all_terms)).select(
        "tok", F.col("_n").alias("exact_n")
    )
    ex = F.coalesce(F.col("exact_n"), F.lit(0))
    return (
        est.join(exact, "tok", "left")
        .select(
            "tok",
            F.col("cm_est").cast("bigint").alias("cm_est"),
            ex.cast("bigint").alias("exact_n"),
            (F.col("cm_est") - ex).cast("bigint").alias("overcount"),
        )
        .orderBy("tok")
    )


def noop_time(df: DataFrame, laps: int = 5) -> list:
    out = []
    for _ in range(laps):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.monotonic() - t0, 3))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="r13_probe_cm", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    from guagua_spark.operators.text import _tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens()).alias("tok"))
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    clicks = ev.filter(F.col("event_type") == "click")

    spark.sparkContext.setJobDescription("cm: counter equality (tokens)")
    cur = sorted(tuple(r) for r in cm_counters(toks, "tok").collect())
    new = sorted(tuple(r) for r in cm_counters_preagg(toks, "tok").collect())
    assert cur == new, (len(cur), len(new))
    print(f"token counters identical: {len(cur)} rows")

    spark.sparkContext.setJobDescription("cm: counter equality (user_id)")
    cur = sorted(tuple(r) for r in cm_counters(clicks, "user_id").collect())
    new = sorted(
        tuple(r) for r in cm_counters_preagg(clicks, "user_id").collect()
    )
    assert cur == new, (len(cur), len(new))
    print(f"user_id counters identical: {len(cur)} rows")

    spark.sparkContext.setJobDescription("probe_freq: output equality")
    a_rows = [tuple(r) for r in probe_freq_current(spark, sf_dir).collect()]
    b_rows = [tuple(r) for r in probe_freq_candidate(spark, sf_dir).collect()]
    assert a_rows == b_rows, next(
        (x, y) for x, y in zip(a_rows, b_rows) if x != y
    )
    print(f"probe_freq outputs identical: {len(a_rows)} rows")

    spark.sparkContext.setJobDescription("cm tokens: A current")
    a = noop_time(cm_counters(toks, "tok"))
    spark.sparkContext.setJobDescription("cm tokens: B preagg")
    b = noop_time(cm_counters_preagg(toks, "tok"))
    print("counters(tok)  A current:", a)
    print("counters(tok)  B preagg :", b)

    spark.sparkContext.setJobDescription("probe_freq: A current")
    a = noop_time(probe_freq_current(spark, sf_dir))
    spark.sparkContext.setJobDescription("probe_freq: B candidate")
    b = noop_time(probe_freq_candidate(spark, sf_dir))
    a2 = noop_time(probe_freq_current(spark, sf_dir), laps=3)
    b2 = noop_time(probe_freq_candidate(spark, sf_dir), laps=3)
    print("probe_freq A current  :", a, a2)
    print("probe_freq B candidate:", b, b2)

    spark.sparkContext.setJobDescription("jcm user_id: A current")
    a = noop_time(cm_counters(clicks, "user_id"))
    spark.sparkContext.setJobDescription("jcm user_id: B preagg")
    b = noop_time(cm_counters_preagg(clicks, "user_id"))
    print("counters(uid)  A current:", a)
    print("counters(uid)  B preagg :", b)
    spark.stop()


if __name__ == "__main__":
    main()
