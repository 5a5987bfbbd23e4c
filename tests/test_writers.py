"""Dataset sinks: partition pruning on read-back, stats-sized
compaction, exactly-once streaming file sink."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from guagua_spark.sources.tables import load_table
from guagua_spark.sources.writers import (
    read_partitioned,
    write_compacted,
    write_partitioned,
    write_stream_parquet,
)


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, ["event_type"])

    # hive layout: one directory per value, one file per value
    dirs = sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(out, "event_type=*"))
    )
    types = sorted(
        r.event_type for r in ev.select("event_type").distinct().collect()
    )
    assert dirs == [f"event_type={t}" for t in types]
    for d in dirs:
        files = glob.glob(os.path.join(out, d, "*.parquet"))
        assert len(files) == 1, f"{d}: small-files explosion ({len(files)})"

    back = read_partitioned(spark, out).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "filter did not reach partition pruning"
    want = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == want


def test_partitioned_write_salted_file_count(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_salted")
    write_partitioned(ev, out, ["event_type"], files_per_partition=3)
    for d in glob.glob(os.path.join(out, "event_type=*")):
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert 1 <= len(files) <= 3
    assert read_partitioned(spark, out).count() == ev.count()


def test_compacted_write_uses_plan_stats(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "lineitem_compact")
    # small target → multiple files sized from the parquet statistic
    n = write_compacted(li, out, target_file_bytes=64 * 1024)
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert len(files) == n > 1
    assert spark.read.parquet(out).count() == li.count()


def test_streaming_parquet_sink_exactly_once(spark, sf_dir, tmp_path):
    from guagua_spark.streaming.stream_ops import _events_stream

    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = write_stream_parquet(
        _events_stream(spark, sf_dir).select("event_id", "ts", "value"),
        out,
        ckpt,
    )
    q.awaitTermination(120)
    batch_n = load_table(spark, sf_dir, "events").count()
    assert spark.read.parquet(out).count() == batch_n
    # re-running against the same checkpoint must be a no-op (offsets
    # already committed), not an append of duplicates
    q2 = write_stream_parquet(
        _events_stream(spark, sf_dir).select("event_id", "ts", "value"),
        out,
        ckpt,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == batch_n
