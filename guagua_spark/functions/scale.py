"""Scale utilities: skew salting and bucketed co-located joins.

Neither exists in the reference (its only aggregation is the BSP
AllReduce), but both are load-bearing at 100 TB:

- ``salted_agg`` breaks a hot grouping key across ``n_salts`` reducers:
  phase 1 aggregates (key, salt) partials — the hot key's rows land on
  n_salts different tasks — phase 2 merges the ≤ n_salts partial rows
  per key. Only decomposable aggregates are offered (sum/count/min/max;
  avg = sum/count composed at the end). AQE's skew handling covers
  JOINS; a single monster groupBy key still needs salting.
- ``write_bucketed`` / bucketed tables: pre-shuffle both sides of a
  recurring equi-join ONCE at write time; every subsequent join on the
  bucket key plans with zero Exchange on either side (asserted in
  tests/test_scale_fns.py). This is the Spark analogue of co-located
  joins in MPP warehouses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def ensure_parallelism(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Repartition ONLY when the plan yields fewer partitions than cores.

    Projections (including pandas UDFs) execute below any later
    exchange, so per-row-heavy compute over a small file's single scan
    partition runs serially. At production scale a 100 TB table scans as
    thousands of splits and this is a no-op — no shuffle is added; the
    check reads the planned partitioning, it does not execute the plan.
    """
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts add up across salt partials
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}. Equivalent to
    ``df.groupBy(keys).agg(...)`` for any data, but a key holding 50%
    of all rows is processed by ``n_salts`` tasks instead of one.
    """
    for out, (_, fn) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"{out}: non-decomposable aggregate {fn!r}")
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            _PARTIAL[fn](col).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](f"__p_{out}").alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) managed table — the
    one-time shuffle that makes every later join/agg on ``bucket_cols``
    exchange-free."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    plan contains no Exchange (verify with .explain)."""
    return spark.table(left_table).join(spark.table(right_table), on)
