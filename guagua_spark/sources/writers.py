"""Dataset sinks: partitioned / compacted parquet writers and the
streaming file sink.

The reference's only output surface is driver-side model files plus the
tagged-row KMeansDataOutput (guagua-examples/.../kmeans/
KMeansDataOutput.java) — sinks.py covers those. This module is the
extension for DATASET output, the half a training-data pipeline needs:

- ``write_partitioned`` — hive-style ``partitionBy`` layout so later
  reads prune whole directories (PartitionFilters in the scan, verified
  in tests/test_writers.py). One shuffle on the partition columns keeps
  writers-per-partition-value at 1 instead of #tasks (the classic
  small-files explosion: T tasks × P partition values = T·P files
  without it).
- ``write_compacted`` — sizes output file count from Catalyst relation
  statistics (no count job) so files land near a target size; the
  100 TB knob for downstream scan parallelism.
- ``write_stream_parquet`` — exactly-once file sink for the streaming
  twins: parquet + checkpointed offsets, availableNow-drainable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: default target bytes per output file — a comfortable scan split
TARGET_FILE_BYTES = 128 * 1024 * 1024


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimated size of the relation (bytes) — parquet file
    bytes for scans, propagated estimates above them. Returns the
    unknown-size default (~8 EiB) for in-memory relations; callers
    must treat absurd values as 'no statistic'."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write a hive-partitioned parquet dataset.

    Repartitions on the partition columns first so each partition value
    is written by ``files_per_partition`` tasks — without this, every
    task holding rows of a value opens its own file and a 10k-task job
    over 100 partition values emits up to a million files. For skewed
    partition values raise ``files_per_partition`` (splits each value
    across that many writers via a salt).
    """
    if files_per_partition > 1:
        # Deterministic, content-derived salt: rand() inside a
        # repartition expression re-rolls on task retry, the classic
        # duplicate/lost-row mechanism during shuffle recovery
        # (SPARK-23207). hash(*columns) is stable per row across
        # attempts, so retried maps re-produce identical shuffle blocks.
        salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(files_per_partition))
        df = df.repartition(
            *[F.col(c) for c in partition_cols], salt.alias("__salt")
        )
    else:
        df = df.repartition(*[F.col(c) for c in partition_cols])
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_compacted(
    df: DataFrame,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    mode: str = "overwrite",
) -> int:
    """Write parquet with file count sized from plan statistics —
    ceil(estimated bytes / target) files. Returns the file count used.

    Uses coalesce (no shuffle) when shrinking the partition count and
    repartition (one round-robin shuffle) when growing it; the estimate
    falls back to the current partition count when the plan carries no
    statistic (in-memory relations report ~8 EiB).
    """
    current = df.rdd.getNumPartitions()
    est = plan_size_bytes(df)
    if est < (1 << 50):
        n_files = max(1, math.ceil(est / target_file_bytes))
    else:
        n_files = current
    if n_files < current:
        df = df.coalesce(n_files)
    elif n_files > current:
        df = df.repartition(n_files)
    df.write.mode(mode).parquet(path)
    return n_files


def zorder_value(
    cols: "list[F.Column]",
    mins: list[float],
    maxs: list[float],
    bits: int = 8,
) -> "F.Column":
    """Bit-interleaved Z-curve key over numeric columns, as a pure
    codegen expression: each column is scaled to a ``bits``-bit integer
    rank over [min, max], then bit b of column i lands at position
    b·ncols + i. Rows close on the curve are close in EVERY dimension,
    which is what makes per-file min/max stats tight (``bits``·ncols
    must stay ≤ 63)."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits({bits})×cols({n}) must be ≤ 63")
    top = (1 << bits) - 1
    ranks = []
    for c, mn, mx in zip(cols, mins, maxs):
        span = (mx - mn) or 1.0
        scaled = (c.cast("double") - F.lit(mn)) / F.lit(span) * F.lit(
            float(top)
        )
        ranks.append(
            F.least(
                F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top)
            )
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int | None = None,
    bits: int = 8,
    mode: str = "overwrite",
) -> int:
    """Z-order-clustered parquet write — the multi-dimensional
    data-skipping layout (the same recipe as lakehouse OPTIMIZE
    ZORDER): rows are range-partitioned AND sorted by the interleaved
    Z-curve key, so each output file covers a tight hyper-rectangle in
    ALL the z columns and selective filters on ANY of them skip most
    files via row-group min/max stats (a single-column sort only helps
    filters on that column). Returns the file count used.

    Column domains come from one tiny min/max aggregate — a full pass
    at this layer; at deployment feed the mins/maxs from catalog/table
    statistics instead (zorder_value takes them as arguments). The
    range partitioner samples the z key, so file boundaries adapt to
    the data distribution (no empty/overfull files on skew).

    STRING z columns are rank-domained the way lakehouse OPTIMIZE
    ZORDER handles them: a monotone numeric ranking (_lex_rank_col
    packs the leading UTF-8 bytes big-endian) is quantile-binned into
    ≤2^bits EQUI-POPULATED bins (one approx-quantile pass per string
    column; min/max scaling would collapse under shared prefixes —
    'user_000'…'user_099' all land in one bin of a min/max domain) and
    the bin index joins the interleave through a ≤2^bits-literal array
    comparison, fully codegen'd. Timestamps/dates rank via epoch
    seconds with min/max scaling (temporal domains don't share
    prefixes). Exactness of bin EDGES is irrelevant to correctness:
    any monotone binning yields a valid clustering, only
    skip-tightness varies.

    Degenerate domains degrade safely: an EMPTY input writes one empty
    file; a NON-empty input with an all-NULL z column drops that
    column from the key and clusters on the rest — and if every z
    column is all-NULL, writes unclustered at the stats-sized file
    count. Never a single-task funnel of a non-empty dataset."""
    # one monotone numeric rank source per z column (typed dispatch);
    # quantile[i] marks columns needing equi-populated binning
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    srcs, quantile = [], []
    for c in zorder_cols:
        t = types.get(c, "string")
        if (
            t in ("byte", "short", "integer", "long", "float", "double")
            or t.startswith("decimal")
        ):
            srcs.append(F.col(c).cast("double"))
            quantile.append(False)
        elif t == "timestamp":
            srcs.append(F.col(c).cast("double"))  # epoch seconds
            quantile.append(False)
        elif t == "date":
            srcs.append(F.col(c).cast("timestamp").cast("double"))
            quantile.append(False)
        else:
            srcs.append(
                _lex_rank_col(F.col(c).cast("string")).cast("double")
            )
            quantile.append(True)
    stats = df.agg(
        *[F.min(s).alias(f"mn_{i}") for i, s in enumerate(srcs)],
        *[F.max(s).alias(f"mx_{i}") for i, s in enumerate(srcs)],
    ).collect()[0]
    if n_files is None:
        est = plan_size_bytes(df)
        n_files = (
            max(1, math.ceil(est / TARGET_FILE_BYTES))
            if est < (1 << 50)
            else df.rdd.getNumPartitions()
        )
    # drop all-NULL z columns: no domain to cluster on
    live = [
        i for i in range(len(zorder_cols)) if stats[f"mn_{i}"] is not None
    ]
    if not live:
        if df.isEmpty():
            df.coalesce(1).write.mode(mode).parquet(path)
            return 1
        # non-empty but nothing to cluster on: unclustered at natural
        # file count — NOT coalesce(1), which would funnel a large
        # dataset through one write task
        df.repartition(n_files).write.mode(mode).parquet(path)
        return n_files
    if bits * len(live) > 63:
        raise ValueError(f"bits({bits})×live cols({len(live)}) must be ≤ 63")
    top = (1 << bits) - 1
    ranks = []
    for i in live:
        if quantile[i]:
            probs = [(q + 1) / (1 << bits) for q in range((1 << bits) - 1)]
            edges = df.select(srcs[i].alias("__zr")).approxQuantile(
                "__zr", probs, 0.01
            )
            uniq = sorted(set(edges))
            arr = F.array(*[F.lit(float(e)) for e in uniq])
            src = srcs[i]
            # bin = #quantile edges ≤ value: equi-populated by
            # construction, one codegen'd array pass per row. Low
            # cardinality leaves few distinct bins, so stretch the bin
            # index across the FULL bits range — otherwise this
            # column's high interleave bits are constant zero and the
            # file split degenerates to the other columns.
            bin_c = F.size(F.filter(arr, lambda e: e <= src)).cast("long")
            ranks.append(
                F.floor(bin_c * F.lit(top) / F.lit(max(1, len(uniq)))).cast(
                    "long"
                )
            )
        else:
            mn = float(stats[f"mn_{i}"])
            mx = float(stats[f"mx_{i}"])
            span = (mx - mn) or 1.0
            scaled = (srcs[i] - F.lit(mn)) / F.lit(span) * F.lit(float(top))
            ranks.append(
                F.least(
                    F.greatest(scaled.cast("long"), F.lit(0)), F.lit(top)
                )
            )
    n = len(ranks)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
    return n_files


def _lex_rank_col(s: "F.Column") -> "F.Column":
    """Order-preserving numeric rank of a string: the first 7 bytes of
    its UTF-8 form packed big-endian into a non-negative long, NULL for
    NULL input. Monotone in the string's byte order (values equal in
    the first 7 bytes collapse to one rank — harmless for skip stats,
    which only need a monotone coarsening; write_zordered quantile-bins
    this rank, so shared prefixes cost resolution only past the 7th
    byte, not bin balance)."""
    b = F.encode(s, "UTF-8")
    out = F.lit(0).cast("long")
    for k in range(1, 8):
        out = out * 256 + F.coalesce(
            F.conv(F.hex(F.substring(b, k, 1)), 16, 10).cast("long"),
            F.lit(0),
        )
    return F.when(s.isNull(), F.lit(None).cast("long")).otherwise(out)


def write_stream_parquet(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Start an exactly-once parquet file sink for a streaming
    DataFrame; returns the StreamingQuery. With ``available_now`` the
    query drains the current backlog and stops (deterministic, used by
    tests); without it, it runs continuously. The checkpoint directory
    carries source offsets + the file-sink metadata log that makes
    re-runs idempotent."""
    writer = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a hive-partitioned dataset (partition columns inferred
    from directory names; equality filters on them prune directories —
    check .explain for PartitionFilters)."""
    return spark.read.parquet(path)
