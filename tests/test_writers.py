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


def test_zordered_write_skips_files_on_both_dims(spark, tmp_path):
    """Z-order clustering must make per-file min/max stats selective in
    BOTH z dimensions: for a point-ish predicate on either column, the
    fraction of output files whose [min, max] overlaps the predicate
    must be far below the round-robin layout's (where nearly every file
    overlaps everything)."""
    import pyspark.sql.functions as F

    from guagua_spark.sources.writers import write_zordered

    df = spark.range(20_000).select(
        (F.col("id") % 141).alias("x"),
        ((F.col("id") * 7919) % 131).alias("y"),
    )
    zpath, rpath = str(tmp_path / "zo"), str(tmp_path / "rr")
    n = write_zordered(df, zpath, ["x", "y"], n_files=16)
    assert n == 16
    df.repartition(16).write.parquet(rpath)

    import glob

    def overlap_fraction(path, col, lo, hi):
        files = sorted(glob.glob(f"{path}/part-*.parquet"))
        hit = 0
        for f in files:
            r = (
                spark.read.parquet(f)
                .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
                .collect()[0]
            )
            if r.mn <= hi and r.mx >= lo:
                hit += 1
        return hit / len(files)

    for col in ("x", "y"):
        zf = overlap_fraction(zpath, col, 10, 19)
        rf = overlap_fraction(rpath, col, 10, 19)
        assert rf > 0.9, f"round-robin should not skip ({col}: {rf})"
        assert zf <= 0.5, f"z-order must skip most files ({col}: {zf})"

    # clustering must not lose or duplicate rows
    assert spark.read.parquet(zpath).count() == 20_000


def test_zorder_value_bounds():
    import pytest as _pytest

    from guagua_spark.sources.writers import zorder_value

    import pyspark.sql.functions as F

    with _pytest.raises(ValueError):
        zorder_value([F.col("a")] * 8, [0] * 8, [1] * 8, bits=8)


def test_zorder_value_matches_python_reference(spark):
    """The codegen'd interleave must equal a pure-Python Z-curve on
    randomized domains (including negative and constant columns)."""
    import random

    import pyspark.sql.functions as F

    from guagua_spark.sources.writers import zorder_value

    rng = random.Random(11)
    rows = [
        (rng.randint(-50, 50), rng.randint(0, 1000), 7) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    mins = [min(r[i] for r in rows) for i in range(3)]
    maxs = [max(r[i] for r in rows) for i in range(3)]
    bits = 6
    out = df.withColumn(
        "z",
        zorder_value(
            [F.col("a"), F.col("b"), F.col("c")],
            [float(m) for m in mins],
            [float(m) for m in maxs],
            bits,
        ),
    ).collect()
    top = (1 << bits) - 1

    def ref(vals):
        z = 0
        for i, (v, mn, mx) in enumerate(zip(vals, mins, maxs)):
            span = (mx - mn) or 1.0
            r = int((v - mn) / span * top)  # cast("long") truncates
            r = max(0, min(top, r))
            for b in range(bits):
                z |= ((r >> b) & 1) << (b * 3 + i)
        return z

    for r in out:
        assert r.z == ref((r.a, r.b, r.c)), (r.a, r.b, r.c, r.z)


def test_zordered_write_null_domain_column_keeps_parallelism(
    spark, tmp_path
):
    """A NON-empty dataset with one all-NULL z column must NOT funnel
    through a single write task: the NULL column drops out of the z key
    and the write still clusters on the remaining column at the
    requested file count."""
    import pyspark.sql.functions as F

    from guagua_spark.sources.writers import write_zordered

    df = spark.range(20_000).select(
        (F.col("id") % 141).alias("x"),
        F.lit(None).cast("long").alias("y"),
    )
    path = str(tmp_path / "null_col_zo")
    n = write_zordered(df, path, ["x", "y"], n_files=8)
    assert n == 8
    files = glob.glob(os.path.join(path, "part-*.parquet"))
    assert len(files) == 8, f"single-task funnel: {len(files)} files"
    assert spark.read.parquet(path).count() == 20_000
    # still clustered on the surviving column: x point predicates skip
    hit = 0
    for f in sorted(files):
        r = (
            spark.read.parquet(f)
            .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
            .collect()[0]
        )
        if r.mn <= 19 and r.mx >= 10:
            hit += 1
    assert hit / len(files) <= 0.5, "x clustering lost with NULL y"


def test_zordered_write_all_null_domain_keeps_parallelism(spark, tmp_path):
    """Every z column all-NULL on non-empty input: unclustered write at
    the requested parallelism, never coalesce(1)."""
    import pyspark.sql.functions as F

    from guagua_spark.sources.writers import write_zordered

    df = spark.range(5_000).select(
        F.lit(None).cast("long").alias("x"),
        F.lit(None).cast("long").alias("y"),
        F.col("id").alias("v"),
    )
    path = str(tmp_path / "all_null_zo")
    n = write_zordered(df, path, ["x", "y"], n_files=4)
    assert n == 4
    assert len(glob.glob(os.path.join(path, "part-*.parquet"))) == 4
    assert spark.read.parquet(path).count() == 5_000


def test_zordered_write_string_column_skips(spark, tmp_path):
    """Rank-domain z-order on (numeric, string): point predicates on
    EITHER column must skip most files — the string column goes through
    the lexicographic byte-pack ranking."""
    import pyspark.sql.functions as F

    from guagua_spark.sources.writers import write_zordered

    df = spark.range(20_000).select(
        (F.col("id") % 141).alias("x"),
        F.format_string("user_%03d", (F.col("id") * 7919) % 131).alias("s"),
    )
    zpath = str(tmp_path / "zo_str")
    n = write_zordered(df, zpath, ["x", "s"], n_files=16)
    assert n == 16
    files = sorted(glob.glob(os.path.join(zpath, "part-*.parquet")))

    def overlap(col, lo, hi):
        hit = 0
        for f in files:
            r = (
                spark.read.parquet(f)
                .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
                .collect()[0]
            )
            if r.mn <= hi and r.mx >= lo:
                hit += 1
        return hit / len(files)

    assert overlap("x", 10, 19) <= 0.5
    assert overlap("s", "user_010", "user_019") <= 0.5
    assert spark.read.parquet(zpath).count() == 20_000


def test_lex_rank_is_monotone(spark):
    """_lex_rank_col must preserve lexicographic order (UTF-8 byte
    order) for arbitrary strings, with NULL → NULL."""
    from guagua_spark.sources.writers import _lex_rank_col

    import pyspark.sql.functions as F

    vals = ["", "a", "aa", "ab", "abcdefgh", "b", "user_001", "user_100",
            "zzz", "Ω"]
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)], "s string")
    rows = df.select("s", _lex_rank_col(F.col("s")).alias("r")).collect()
    got = {r.s: r.r for r in rows}
    assert got[None] is None
    ordered = sorted(vals, key=lambda v: v.encode("utf-8"))
    ranks = [got[v] for v in ordered]
    assert ranks == sorted(ranks), list(zip(ordered, ranks))


def test_zordered_write_handles_empty_input(spark, tmp_path):
    """A legitimate no-data partition must write an empty dataset, not
    crash on NULL domain stats."""
    import pyspark.sql.functions as F

    from guagua_spark.sources.writers import write_zordered

    empty = spark.range(0).select(
        F.col("id").alias("x"), F.col("id").alias("y")
    )
    path = str(tmp_path / "empty_zo")
    assert write_zordered(empty, path, ["x", "y"]) == 1
    assert spark.read.parquet(path).count() == 0
