"""Input readers — the Spark collapse of the reference's input layer.

Reference inventory (SURVEY.md §2.1):
- GuaguaInputFormat.getSplits: split enumeration + small-split combining
  (guagua-mapreduce/.../GuaguaInputFormat.java:78-166) → here it is
  ``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes``; the
  "master split" concept vanishes because the driver is the master.
- GuaguaLineRecordReader (text + compression codecs,
  hadoop/io/GuaguaLineRecordReader.java:57-113) → ``read_text`` /
  ``read_csv``; gzip/bzip2/zstd are built into Spark's file sources.
- GuaguaSequenceRecordReader / AsText / AsBinary
  (hadoop/io/GuaguaSequence*.java) → ``read_sequence_kv`` (RDD API —
  SequenceFiles are a Hadoop-era niche) and ``read_binary_files``.

Everything returns a DataFrame so downstream operators stay declarative;
``line_number`` reproduces the reference's (LongWritable offset, Text
line) record shape where user code needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Partition-planning knobs, the analogue of the reference's split
#: combining (guagua.split.maxCombinedSplitSize). Applied per-read via
#: options is not possible — these are session confs; expose a helper.
SPLIT_CONF_KEYS = (
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.files.openCostInBytes",
)


def configure_splits(
    spark: SparkSession,
    max_partition_bytes: int = 128 * 1024 * 1024,
    open_cost_bytes: int = 4 * 1024 * 1024,
) -> None:
    """Small-file combining / large-file splitting — GuaguaInputFormat's
    Pig-style bin packing (GuaguaInputFormat.java:149-420) as two confs.
    A 100 TB input with 10 MB files plans ~1 file-group per 128 MB, not
    10 million tasks."""
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_partition_bytes))
    spark.conf.set("spark.sql.files.openCostInBytes", str(open_cost_bytes))


def read_text(
    spark: SparkSession, path: str, with_line_numbers: bool = False
) -> DataFrame:
    """Line-oriented text (gzip/bzip2/zstd transparent, like the
    reference's CompressionCodecFactory). ``with_line_numbers`` adds a
    per-file line index — the analogue of the (offset, line) record pair
    the reference's record reader produced; note it forces a window per
    file, so leave it off unless the workload needs record ids."""
    df = spark.read.text(path).withColumnRenamed("value", "line")
    if with_line_numbers:
        from pyspark.sql.window import Window

        df = (
            df.withColumn("file", F.input_file_name())
            .withColumn(
                "line_number",
                F.row_number().over(
                    Window.partitionBy("file").orderBy(F.monotonically_increasing_id())
                )
                - 1,
            )
            .drop("file")
        )
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = False,
    sep: str = ",",
) -> DataFrame:
    """CSV with explicit schema (schema-on-read, but TYPED — the
    reference forced every workload to hand-split lines,
    lr/LogisticRegressionWorker.java:147-163). Always pass a schema in
    production: inference costs an extra full scan."""
    reader = spark.read.option("header", str(header).lower()).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON-lines with optional explicit schema."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Whole-file binary payloads + metadata (path, modificationTime,
    length, content) — the analogue of GuaguaSequenceAsBinaryRecordReader
    and the input side of the multimodal column pattern
    (operators/multimodal.py). Each file is one row; pair with
    ``configure_splits`` sanity — binaryFile never splits a file."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_sequence_kv(spark: SparkSession, path: str) -> DataFrame:
    """Hadoop SequenceFile of (K, V) as a two-column DataFrame —
    GuaguaSequenceRecordReader parity (rarely needed; prefer parquet)."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, "key string, value string")
