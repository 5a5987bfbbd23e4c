"""Round-13 probe: where do events_gapfill_hourly's LOCAL 20+ s and
the 12.7 s cold `_index:cert:gapfill` actually go?

Phases timed back-to-back in ONE session (drift-immune A/B):
  1. grid compute only          — noop sink (guide §1.4)
  2. grid compute + collect()   — the LOCAL-lane methodology
  3. cert aggregate (binder md5 over the grid, 4-int result)
  4. grid compute again         — is the 2nd compute cheaper (codegen/JIT)?

Usage: python scripts/r13_probe_gapfill.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from guagua_spark.session import get_spark

    spark = get_spark(
        app_name="r13_probe_gapfill", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.events import events_gapfill_hourly

    sc = spark.sparkContext

    def lap(label, fn):
        sc.setJobDescription(f"probe_gapfill: {label}")
        t0 = time.monotonic()
        out = fn()
        dt = time.monotonic() - t0
        print(f"{label:40s} {dt:7.2f} s")
        sc.setJobDescription(None)
        return out

    g = events_gapfill_hourly(spark, sf_dir)
    lap("grid noop (1st, cold codegen)", lambda: g.write.format("noop").mode("overwrite").save())
    g2 = events_gapfill_hourly(spark, sf_dir)
    lap("grid noop (2nd, warm)", lambda: g2.write.format("noop").mode("overwrite").save())
    g3 = events_gapfill_hourly(spark, sf_dir)
    n = lap("grid collect (LOCAL methodology)", lambda: len(g3.collect()))
    print(f"   grid rows: {n}")

    def cert_agg():
        gg = events_gapfill_hourly(spark, sf_dir)
        binder = binder_hash_col(
            "gfl",
            F.col("user_id"),
            F.col("hour").cast("date").cast("string"),
            F.hour("hour"),
            F.col("n_events"),
            F.coalesce(
                F.round(F.col("ffill_value") * 100).cast("bigint"), F.lit(-1)
            ),
        )
        return gg.agg(
            F.count(F.lit(1)).alias("gfl_rows"),
            F.sum("n_events").alias("gfl_events_total"),
            F.sum(F.when(F.col("n_events") == 0, 1).otherwise(0)).alias(
                "gfl_gaps"
            ),
            F.sum(binder).alias("gfl_binder"),
        ).collect()

    lap("cert aggregate (grid + binder md5)", cert_agg)
    lap("cert aggregate again (warm)", cert_agg)
    spark.stop()


if __name__ == "__main__":
    main()
