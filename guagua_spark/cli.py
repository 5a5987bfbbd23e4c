"""CLI launcher — the analogue of the reference's ``guagua`` shell client.

Reference: guagua-client/src/main/bash/guagua:48 +
GuaguaMapReduceClient option surface (GuaguaOptionsParser.java:378-399):
``-i`` input, ``-m``/``-w`` master/worker classes, ``-c`` iterations,
``-n`` job name, ``-D k=v`` props. Options that existed only because of
Hadoop plumbing have no analogue here: ``-z`` (ZooKeeper — the driver is
the master), ``-mr``/``-wr`` result classes (results are plain Python
objects), YARN memory flags (Spark submit handles resources).

Usage::

    python -m guagua_spark -i data.parquet \
        -m guagua_spark.algorithms.sum_.SumMaster \
        -w guagua_spark.algorithms.sum_.SumWorker \
        -c 10 -n my-job -D key=value --output /tmp/result.pkl
"""

from __future__ import annotations

import argparse
import importlib
import pickle
import sys
from typing import Any


def _load_class(dotted: str) -> Any:
    """Instantiate ``pkg.module.ClassName`` — the reflective construction
    of guagua.master.computable.class / guagua.worker.computable.class
    (GuaguaConstants.java:53-55, GuaguaMasterService.java:353-357)."""
    mod_name, _, cls_name = dotted.rpartition(".")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    return cls()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="guagua_spark",
        description="Run an iterative (master, worker) computation on Spark",
    )
    p.add_argument("-i", "--input", required=True, help="input path")
    p.add_argument(
        "--format",
        default="parquet",
        choices=("parquet", "csv", "text", "json"),
        help="input format (default parquet)",
    )
    p.add_argument("--schema", default=None, help="explicit input schema (csv/json)")
    p.add_argument("-m", "--master-class", required=True, help="dotted MasterComputable")
    p.add_argument("-w", "--worker-class", required=True, help="dotted WorkerComputable")
    p.add_argument("-c", "--iterations", type=int, default=50,
                   help="max iterations (reference default 50)")
    p.add_argument("-n", "--name", default="guagua_spark", help="job name")
    p.add_argument("-D", dest="props", action="append", default=[],
                   metavar="K=V", help="engine property (repeatable)")
    p.add_argument("--spark-master", default=None, help="Spark master URL")
    p.add_argument("--output", default=None,
                   help="pickle the final master result here")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-interval", type=int, default=0)
    p.add_argument("--min-workers-ratio", type=float, default=1.0)
    p.add_argument("--min-workers-timeout", type=float, default=60.0)
    p.add_argument("--worker-halt", action="store_true",
                   help="enable worker-voted halt (guagua.worker.halt.enable)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    props = dict(kv.split("=", 1) for kv in args.props)

    from guagua_spark.engine import IterativeEngine
    from guagua_spark.session import get_spark
    from guagua_spark.sources.readers import read_csv, read_json, read_text

    spark = get_spark(app_name=args.name, master=args.spark_master)
    if args.format == "parquet":
        df = spark.read.parquet(args.input)
    elif args.format == "csv":
        df = read_csv(spark, args.input, schema=args.schema)
    elif args.format == "json":
        df = read_json(spark, args.input, schema=args.schema)
    else:
        df = read_text(spark, args.input)

    engine = IterativeEngine(
        spark,
        props=props,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_interval=args.checkpoint_interval,
    )
    result = engine.run(
        _load_class(args.master_class),
        _load_class(args.worker_class),
        df,
        total_iteration=args.iterations,
        worker_halt_enable=args.worker_halt,
        min_workers_ratio=args.min_workers_ratio,
        min_workers_timeout=args.min_workers_timeout,
    )
    if args.output:
        with open(args.output, "wb") as f:
            pickle.dump(result, f)
        print(f"result written to {args.output}")
    else:
        print(repr(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
