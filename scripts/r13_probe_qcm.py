"""A/B probe: current qcm_counters (64-way md5 fan per distinct vq)
vs the dyadic-cascade form (dedupe (lvl, cell) BEFORE the md5 fan —
CM_DEPTH md5s per distinct dyadic cell instead of LEVELS*CM_DEPTH per
distinct value). Asserts the counter tables are identical row-for-row
and times both with the noop sink (guide §1.4).

Usage: python scripts/r13_probe_qcm.py [sf_dir]
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
    CM_WIDTH,
    QCM_LEVELS,
    qcm_counters,
    qcm_quantize_col,
)
from guagua_spark.session import get_spark  # noqa: E402
from guagua_spark.sources.tables import load_table  # noqa: E402


def qcm_counters_cascade(df: DataFrame, col: str) -> DataFrame:
    """Candidate: pre-aggregate the dyadic (lvl, cell) domain before
    the CM_DEPTH md5 fan. Counters bit-identical by sum associativity:
    bucket(lvl, j, cell) is a pure function of (lvl, j, cell)."""
    vq = qcm_quantize_col(F.col(col))
    per_value = (
        df.filter(F.col(col).isNotNull())
        .groupBy(vq.alias("vq"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lvl_fan = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lvl).alias("lvl"),
                    F.shiftright(F.col("vq"), lvl).alias("cell"),
                )
                for lvl in range(QCM_LEVELS)
            ]
        )
    ).alias("lc")
    per_cell = (
        per_value.select(lvl_fan, "n")
        .groupBy(
            F.col("lc.lvl").alias("lvl"), F.col("lc.cell").alias("cell")
        )
        .agg(F.sum("n").alias("n"))
    )
    j_col = F.explode(
        F.array(*[F.lit(j) for j in range(CM_DEPTH)])
    ).alias("j")
    fanned = per_cell.select("lvl", "cell", "n", j_col)
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("qcm"),
                        F.col("lvl").cast("string"),
                        F.lit("_"),
                        F.col("j").cast("string"),
                        F.lit("|"),
                        F.col("cell").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % CM_WIDTH
    )
    return (
        fanned.withColumn("bucket", bucket)
        .groupBy("lvl", "j", "bucket")
        .agg(F.sum("n").alias("n"))
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
    spark = get_spark(app_name="r13_probe_qcm", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")

    spark.sparkContext.setJobDescription("qcm: equality check")
    cur = sorted(tuple(r) for r in qcm_counters(ev, "value").collect())
    cas = sorted(tuple(r) for r in qcm_counters_cascade(ev, "value").collect())
    assert cur == cas, (
        f"counter mismatch: {len(cur)} vs {len(cas)} rows; "
        f"first diff {next((a, b) for a, b in zip(cur, cas) if a != b)}"
    )
    print(f"counters identical: {len(cur)} rows")

    spark.sparkContext.setJobDescription("qcm: A (current 64-fan)")
    a = noop_time(qcm_counters(ev, "value"))
    spark.sparkContext.setJobDescription("qcm: B (cascade)")
    b = noop_time(qcm_counters_cascade(ev, "value"))
    # interleave a second set to expose drift
    spark.sparkContext.setJobDescription("qcm: A2")
    a2 = noop_time(qcm_counters(ev, "value"), laps=3)
    spark.sparkContext.setJobDescription("qcm: B2")
    b2 = noop_time(qcm_counters_cascade(ev, "value"), laps=3)
    print("A current :", a, a2)
    print("B cascade :", b, b2)
    spark.stop()


if __name__ == "__main__":
    main()
