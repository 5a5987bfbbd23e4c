"""Round-14 probe: where do gbt_train's ~8 s LOCAL go?

Splits the cost three ways in ONE session (guide §1):
  1. engine.run per-superstep wall times (engine.iteration_seconds)
  2. a serial numpy replay of the EXACT worker compute over the full
     corpus (bin/predict/route/histogram per superstep) — the
     theoretical single-core compute; divided by partitions it bounds
     the per-task numpy time
  3. the model/partial freight sizes per superstep

Usage: python scripts/r14_probe_gbt.py [sf_dir] [laps]
"""

from __future__ import annotations

import os
import pickle
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    laps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from guagua_spark.session import get_spark

    spark = get_spark(
        app_name="r14_probe_gbt", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np
    from pyspark.sql import functions as F

    from guagua_spark.algorithms.gbt import (
        GBT_TREES,
        GbtMaster,
        GbtWorker,
        gbt_serial_replay,
    )
    from guagua_spark.engine import IterativeEngine
    from guagua_spark.operators.iterative import (
        GBT_ITER_BUDGET,
        _cached_persisted,
    )
    from guagua_spark.sources.tables import load_table

    rows_df = _cached_persisted(
        "gbt",
        sf_dir,
        lambda: load_table(spark, sf_dir, "lineitem").select(
            F.col("l_quantity").cast("double").alias("f0"),
            F.col("l_discount").cast("double").alias("f1"),
            F.col("l_tax").cast("double").alias("f2"),
            F.month("l_shipdate").cast("double").alias("f3"),
            (F.col("l_extendedprice") / F.lit(1000.0)).alias("y"),
        ),
    )
    n_parts = rows_df.rdd.getNumPartitions()
    n_rows = rows_df.count()
    print(f"rows {n_rows}, partitions {n_parts}")

    for lap in range(laps):
        engine = IterativeEngine(spark)
        t0 = time.monotonic()
        model = engine.run(
            GbtMaster(n_features=4),
            GbtWorker(n_features=4),
            rows_df,
            total_iteration=GBT_ITER_BUDGET,
            persist=False,
        )
        wall = time.monotonic() - t0
        its = ["%.2f" % s for s in engine.iteration_seconds]
        print(f"lap {lap}: wall {wall:.2f} s, supersteps {its}")
        print(f"  rmse {model.rmse:.6f}, trees {len(model.trees)}")
        payload = pickle.dumps(model, protocol=pickle.HIGHEST_PROTOCOL)
        print(f"  final model pickle: {len(payload)} B")

    # serial replay timing: the full-corpus worker compute, one core
    pdf = rows_df.toPandas()
    x = pdf[[f"f{j}" for j in range(4)]].to_numpy(dtype=np.float64)
    y = pdf["y"].to_numpy(dtype=np.float64)
    t0 = time.monotonic()
    m = gbt_serial_replay(x, y)
    t_serial = time.monotonic() - t0
    print(
        f"serial replay (1 core, {len(y)} rows, {GBT_TREES} trees):"
        f" {t_serial:.2f} s  -> per-partition bound"
        f" ~{t_serial / max(n_parts, 1):.2f} s/superstep-chain"
    )
    print(f"  serial rmse {m.rmse:.6f}")
    spark.stop()


if __name__ == "__main__":
    main()
