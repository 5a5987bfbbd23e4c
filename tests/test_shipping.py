"""The package must reach executor workers even when the host app built
its own SparkSession before importing us (no PYTHONPATH export)."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import os, sys
# simulate a host app: NO guagua_spark on PYTHONPATH for workers
os.environ.pop("PYTHONPATH", None)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .appName("hostile-host")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# only NOW does the host import the package (driver-side only)
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
qs = m.queries()
sf = "/root/testdata/sf0.001"
# iterative query: engine closures pickle classes by reference
print("LR_TRAIN_ROWS", qs["lr_train"](spark, sf).count())
# pandas-UDF query: module-global helper pickled by reference
print("SIMHASH_ROWS", qs["dedup_simhash"](spark, sf).count())
print("SHIP_OK")
"""


def test_queries_survive_hostile_session():
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/tmp",  # not the repo — workers can't rely on cwd either
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k != "PYTHONPATH"
        },
    )
    assert "SHIP_OK" in r.stdout, (r.stdout[-1000:], r.stderr[-3000:])
