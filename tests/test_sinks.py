"""Sinks: model save/load, interceptor write, distributed tagged write."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from guagua_spark.algorithms import SumMaster, SumWorker
from guagua_spark.engine import IterativeEngine
from guagua_spark.sinks import (
    ModelOutputInterceptor,
    load_model,
    save_model,
    write_tagged,
)


def test_model_roundtrip(tmp_path):
    path = str(tmp_path / "m" / "model.pkl")
    save_model({"w": [1.0, 2.0]}, path)
    assert load_model(path) == {"w": [1.0, 2.0]}


def test_interceptor_writes_final_model(spark, tmp_path):
    path = str(tmp_path / "sum.pkl")
    df = spark.createDataFrame([(1,), (2,), (3,)], "value long")
    result = IterativeEngine(spark).run(
        SumMaster(),
        SumWorker(),
        df,
        total_iteration=3,
        interceptors=[ModelOutputInterceptor(path)],
    )
    saved = load_model(path)
    assert saved.value == result.value > 0


def test_write_tagged_partitioned(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tagged = docs.withColumn("tag", (F.col("doc_id") % 3).cast("int"))
    out = str(tmp_path / "tagged")
    write_tagged(tagged, out, partition_by=["tag"])
    # partition-pruned layout on disk
    assert sorted(
        d for d in os.listdir(out) if d.startswith("tag=")
    ) == ["tag=0", "tag=1", "tag=2"]
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
