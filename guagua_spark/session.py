"""SparkSession construction tuned for the engine.

Defaults are chosen for scale-out behavior (AQE on, adaptive skew-join,
Arrow transfer for the Python boundary) so the same code that runs on
``local[32]`` in tests behaves sanely on a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # Adaptive execution: runtime shuffle-partition coalescing, skew-join
    # splitting, and dynamic broadcast-join conversion. This is the
    # load-bearing config for 100 TB: static shuffle.partitions can never
    # be right for every stage.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every Python<->JVM hop (mapInArrow / pandas UDF / toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Pin the session timezone: results must not depend on whatever tz
    # the driver/executor hosts happen to run in (and it keeps LTZ
    # streaming wall-clocks equal to the batch reader's NTZ values).
    "spark.sql.session.timeZone": "UTC",
    # Parquet pushdown is on by default; be explicit so a config regression
    # is visible in diffs.
    "spark.sql.parquet.filterPushdown": "true",
    # Don't let tiny test files explode into thousands of partitions,
    # and don't let one partition exceed a comfortable in-memory size.
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB
    "spark.sql.autoBroadcastJoinThreshold": "67108864",  # 64 MiB
    # Iterative jobs re-run many small stages; speculation papers over
    # stragglers the way guagua's self-kill/reattempt did
    # (reference: worker/GuaguaWorkerService.java:304-316).
    "spark.speculation": "false",  # no-op on local mode; enable on clusters
}


def get_spark(
    app_name: str = "guagua_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    persistent_catalog: bool = False,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured — mirroring the driver harness.

    ``persistent_catalog=True`` switches the catalog to Hive with a
    Derby metastore stored UNDER the warehouse directory, so tables
    written by ``saveAsTable`` (the stored LSH/IVF indexes, models,
    rollups) survive session restarts — the local-mode stand-in for the
    real metastore/Glue/Unity catalog a cluster deployment has anyway.
    The default stays the in-memory catalog: Derby allows ONE process
    at a time (a lock collision with a concurrently running test suite
    or bench would be a confusing failure mode for the common path),
    and the cross-session DERIVED-state tier (guagua_spark.durable)
    needs no catalog at all. Round-trip across a real session boundary
    is proven in tests/test_durable.py.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Driver heap must be fixed BEFORE the gateway JVM forks —
    # spark.driver.memory via builder.config is silently ignored in
    # client/local mode once the JVM exists. Local mode puts all
    # executor threads in the driver JVM, so the 1g default is far too
    # small for 32 threads + broadcasts; 8g here, overridable via env.
    from pyspark import SparkContext

    if SparkContext._active_spark_context is None and (
        "PYSPARK_SUBMIT_ARGS" not in os.environ
    ):
        mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f"--driver-memory {mem} pyspark-shell"
        )
    # Worker Python processes must be able to import this package (engine
    # closures pickle classes by reference). Exporting PYTHONPATH before
    # the JVM forks its Python workers covers local mode; on a cluster,
    # ship the package with --py-files or a pip install instead.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in prev.split(":"):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}:{prev}" if prev else pkg_parent
        )
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if persistent_catalog:
        wh = (extra_conf or {}).get(
            "spark.sql.warehouse.dir", os.path.abspath("spark-warehouse")
        )
        conf["spark.sql.catalogImplementation"] = "hive"
        conf["spark.hadoop.javax.jdo.option.ConnectionURL"] = (
            f"jdbc:derby:;databaseName={wh}/_metastore_db;create=true"
        )
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    else:
        conf.setdefault("spark.sql.shuffle.partitions", cpus)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
