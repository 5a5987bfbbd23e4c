"""Canonical testdata tables (TPC-H-ish star schema + events/documents/
embeddings), loaded as DataFrames with pushdown-friendly parquet scans.

The reference's input layer (GuaguaInputFormat split planning +
record readers, guagua-mapreduce/.../GuaguaInputFormat.java:78-166,
hadoop/io/GuaguaLineRecordReader.java) collapses into ``spark.read``:
partition planning is ``spark.sql.files.maxPartitionBytes``, small-file
combining is built in, codecs are built in, and columnar pruning comes
free with parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any scale factor —
#: nation/region are fixed-size in TPC-H-style schemas.
BROADCAST_TABLES = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Plain parquet scan: filters/projections pushed by
    Catalyst (verify with .explain → PushedFilters/ReadSchema).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader refuses ([PARQUET_TYPE_ILLEGAL]); read it as raw
    nanos and convert with integer division — ``ts div 1000`` stays in
    long arithmetic (a double round-trip would lose precision at ~1e18).
    """
    from guagua_spark.shipping import ensure_shipped

    ensure_shipped(spark.sparkContext)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _footer_token(path: str, size: int) -> int:
    """crc32 of the file's last 64 bytes — for parquet that covers the
    footer length + metadata tail, which moves whenever row groups,
    stats, or values change. Defends the fingerprint against
    regenerated files with a PRESERVED (size, mtime) stat (cp -p, tar
    extraction, some syncs), where stale derived state would otherwise
    survive across sessions via the durable store (round-8 advice).
    Deliberately NOT memoized on (size, mtime) — that would reopen the
    exact blind spot it closes; the 64-byte read costs the same order
    as the stat beside it."""
    import zlib

    try:
        with open(path, "rb") as f:
            f.seek(max(size - 64, 0))
            return zlib.crc32(f.read(64))
    except OSError:
        return -1


def table_fingerprint(sf_dir: str, name: str) -> tuple:
    """Cheap content signature of a table's parquet files — sorted
    (relpath, size, mtime_ns, footer_crc) tuples. Memo caches (k-means
    init, IVF quantizer centroids, persisted feature inputs, the MinHash
    pair graph, media assets) key on this so that regenerating the
    testdata under an unchanged path invalidates them instead of
    silently serving stale derived state.

    Deployment note (object stores): (size, mtime_ns) is a LOCAL-FS
    contract — S3/GCS-style stores don't expose a stable mtime across
    overwrites (multipart copies can preserve it) and some emulate
    directories. Replace the stat triple with the listing's
    (key, size, ETag/generation or version-id) per object — the same
    sorted-tuple shape, so every memo's invalidation contract carries
    over unchanged. On Hadoop-FS paths, `FileStatus.getModificationTime`
    + length is the equivalent; checksum-bearing stores should prefer
    the checksum. See SCALE.md (memo invalidation row)."""
    root = os.path.join(sf_dir, f"{name}.parquet")
    sig = []
    if os.path.isdir(root):
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                rel = os.path.relpath(p, root)
                sig.append(
                    (
                        rel,
                        st.st_size,
                        st.st_mtime_ns,
                        _footer_token(p, st.st_size),
                    )
                )
    elif os.path.exists(root):
        st = os.stat(root)
        sig.append(
            (
                os.path.basename(root),
                st.st_size,
                st.st_mtime_ns,
                _footer_token(root, st.st_size),
            )
        )
    return tuple(sorted(sig))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register each table as a temp view for spark.sql use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
