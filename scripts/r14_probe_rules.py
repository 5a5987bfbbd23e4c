"""Round-14 A/B: rx_association_rules join form (r13, five lineitem
scans / five distincts) vs basket form (r14, one scan + reused basket
exchange) — back-to-back in ONE session, rows compared for equality,
noop sink timing (guide §1.4).

Usage: python scripts/r14_probe_rules.py [sf_dir] [laps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def old_form(spark, sf_dir):
    from pyspark.sql import functions as F

    from guagua_spark.operators.relational_ext import RULES_TOPK
    from guagua_spark.sources.tables import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    left = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a")
    )
    right = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_b")
    )
    pair_sup = (
        left.join(right, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("sup_ab"))
    )
    top = pair_sup.orderBy(
        F.col("sup_ab").desc(), "part_a", "part_b"
    ).limit(RULES_TOPK)
    item_sup = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("sup_item")
    )
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    rules_a = item_sup.join(
        F.broadcast(top),
        item_sup["l_partkey"] == top["part_a"],
    ).select(
        "part_a", "part_b", "sup_ab", F.col("sup_item").alias("sup_a")
    )
    return (
        item_sup.withColumnRenamed("l_partkey", "part_b")
        .withColumnRenamed("sup_item", "sup_b")
        .join(F.broadcast(rules_a), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "sup_ab",
            "sup_a",
            "sup_b",
            (F.col("sup_ab") / F.col("sup_a")).alias("conf_ab"),
            (F.col("sup_ab") / F.col("sup_b")).alias("conf_ba"),
            (
                F.col("n_orders").cast("double")
                * F.col("sup_ab")
                / (F.col("sup_a") * F.col("sup_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("sup_ab").desc(), "part_a", "part_b")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    laps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from guagua_spark.session import get_spark

    spark = get_spark(
        app_name="r14_probe_rules", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    from guagua_spark.operators.relational_ext import rx_association_rules

    a = sorted(map(tuple, old_form(spark, sf_dir).collect()))
    b = sorted(map(tuple, rx_association_rules(spark, sf_dir).collect()))
    assert a == b, f"row mismatch: {len(a)} vs {len(b)}\n{a[:3]}\n{b[:3]}"
    print(f"rows identical ({len(a)} rules)")

    def bench(label, fn):
        samples = []
        for _ in range(laps):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.monotonic() - t0)
        print(
            f"{label:10s} median {statistics.median(samples):6.2f} s"
            f"  laps {['%.2f' % s for s in samples]}"
        )

    # interleave to be drift-fair
    for _ in range(2):
        bench("old(join)", old_form)
        bench("new(bask)", rx_association_rules)
    spark.stop()


if __name__ == "__main__":
    main()
