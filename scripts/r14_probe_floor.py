"""Round-14 probe: decompose the engine's ~0.45 s/superstep floor
(gbt_train at sf0.1: worker numpy is ~0.13 s parallel of a 5.3 s
11-superstep run — everything else is per-superstep overhead).

Measured in ONE session:
  1. bare empty-job floor: parallelize(3).mapPartitions(noop).collect
  2. the same over a PERSISTED python RDD (the marker shape)
  3. a job whose tasks read an 8 MB pickle file and unpickle it
     (the file-cache read path without the worker compute)
  4. a job running the real GbtWorker.compute_prepared on that data

Usage: python scripts/r14_probe_floor.py [laps]
"""

from __future__ import annotations

import os
import pickle
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    laps = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    import numpy as np

    from guagua_spark.session import get_spark

    spark = get_spark(
        app_name="r14_probe_floor", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def bench(label, fn, n=laps):
        fn()  # warm
        samples = []
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            samples.append(time.monotonic() - t0)
        med = statistics.median(samples)
        print(
            f"{label:44s} median {med*1000:7.1f} ms"
            f"  (min {min(samples)*1000:6.1f}, max {max(samples)*1000:6.1f})"
        )
        return med

    bare = sc.parallelize(range(3), 3)
    bench("1. bare 3-task job", lambda: bare.mapPartitions(lambda it: [1]).collect())

    marker = sc.parallelize(range(3), 3).map(lambda x: x).persist()
    marker.count()
    bench("2. persisted-marker 3-task job", lambda: marker.mapPartitions(lambda it: [1]).collect())

    # 8 MB prepared file per partition (the gbt shape)
    rows = 200_000
    x = np.random.default_rng(0).normal(size=(rows, 4))
    y = np.random.default_rng(1).normal(size=rows)
    paths = []
    for pid in range(3):
        p = f"/tmp/r14_floor_{pid}.pkl"
        with open(p, "wb") as f:
            pickle.dump((x, y), f, protocol=pickle.HIGHEST_PROTOCOL)
        paths.append(p)

    def read_task(it):
        for pid in it:
            with open(f"/tmp/r14_floor_{pid}.pkl", "rb") as f:
                data = pickle.load(f)
            yield data[0].shape[0]

    bench("3. read+unpickle 8 MB file per task", lambda: marker.mapPartitions(read_task).collect())

    from guagua_spark.algorithms.gbt import GbtWorker, GbtStatsPartial

    worker = GbtWorker(n_features=4)

    class _Ctx:
        last_master_result = None

    def compute_task(it):
        for pid in it:
            with open(f"/tmp/r14_floor_{pid}.pkl", "rb") as f:
                data = pickle.load(f)
            part = worker.compute_prepared(_Ctx(), data)
            yield len(pickle.dumps(part, protocol=pickle.HIGHEST_PROTOCOL))

    bench("4. + real stats-pass compute + pickle partial", lambda: marker.mapPartitions(compute_task).collect())

    # driver-side compute cost for scale (no Spark)
    t0 = time.monotonic()
    worker.compute_prepared(_Ctx(), (x, y))
    print(f"   (driver-side stats compute alone: {(time.monotonic()-t0)*1000:.1f} ms)")
    spark.stop()


if __name__ == "__main__":
    main()
