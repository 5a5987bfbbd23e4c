"""Round-14 trainer probe v2: probe v1 CONFIRMED a real memo-state
effect (lr_train 2.07 -> 3.74 -> 2.15 median across A1/B/A2, kmeans
+20%, nn +14%) but the pinned bytes are trivial (48 MB / 19 RDDs in
an 8 GB heap), so v2 separates the candidate mechanisms:

  A1   no memos (after warm-up)                 5 laps
  M    populate session memos ONLY (direct builder calls)
  B1   memos pinned, no cold-lane side state    5 laps
  C    run the full contract cold lane
  B2   memos + cold-lane session state          5 laps
  GC   force a full JVM GC
  B3   memos still pinned, post-GC              5 laps
  X    clear_all_caches()
  A2   cleared                                  5 laps

JVM GC time/count (all collectors) is sampled per phase. If B1 is
slow -> the pinned memo RDDs themselves; if only B2 -> cold-lane
side state that clear_all_caches happens to also drop; if B3 fixes
it -> old-gen/fragmentation pressure a forced GC clears.

Usage: python scripts/r14_probe_trainers2.py [sf_dir] [laps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TRAINERS = ("lr_train", "kmeans_train", "nn_train_gd")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    laps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from guagua_spark.session import get_spark

    spark = get_spark(
        app_name="r14_probe_trainers2",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    def gc_totals() -> tuple[float, int]:
        beans = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        t = sum(b.getCollectionTime() for b in beans) / 1000.0
        n = sum(b.getCollectionCount() for b in beans)
        return t, n

    def storage_info() -> tuple[int, int]:
        infos = sc._jsc.sc().getRDDStorageInfo()
        return len(infos), sum(i.memSize() for i in infos)

    def lap(name: str) -> float:
        t0 = time.monotonic()
        queries[name](spark, sf_dir).collect()
        return time.monotonic() - t0

    def phase(label: str) -> dict[str, float]:
        g0, c0 = gc_totals()
        t_open = time.monotonic()
        out = {}
        for name in TRAINERS:
            samples = [lap(name) for _ in range(laps)]
            out[name] = statistics.median(samples)
            print(
                f"  {label:4s} {name:14s} median {out[name]:6.2f}"
                f"   laps {['%.2f' % s for s in samples]}",
                flush=True,
            )
        g1, c1 = gc_totals()
        wall = time.monotonic() - t_open
        nrdd, mem = storage_info()
        print(
            f"  {label:4s} GC {g1 - g0:6.2f} s / {c1 - c0} collections"
            f" over {wall:.1f} s wall; storage {nrdd} RDDs"
            f" {mem/1e6:.1f} MB"
        )
        return out

    print("== warm-up")
    for name in TRAINERS:
        print(f"  warm-up {name}: {lap(name):.2f} s", flush=True)
    res = {}
    res["A1"] = phase("A1")

    print("== M: populate session memos only", flush=True)
    t0 = time.monotonic()
    from guagua_spark.operators import dedup, events, graph
    from guagua_spark.operators import similarity as sim

    dedup._minhash_pair_df(spark, sf_dir)
    graph._trade_edges(spark, sf_dir)
    graph._graph_nodes(spark, sf_dir)
    graph._pr_weights(spark, sf_dir)
    graph._affinity_edges_cached(spark, sf_dir)
    events._bloom_buyers(spark, sf_dir)
    sim.quantize_cert_df(spark, sf_dir).collect()
    print(f"  memo population: {time.monotonic() - t0:.1f} s")
    res["B1"] = phase("B1")

    print("== C: full contract cold lane", flush=True)
    t0 = time.monotonic()
    for name, fn in queries.items():
        fn(spark, sf_dir).collect()
    print(f"  cold lane: {time.monotonic() - t0:.1f} s")
    res["B2"] = phase("B2")

    print("== forced full GC")
    sc._jvm.System.gc()
    time.sleep(2)
    res["B3"] = phase("B3")

    import guagua_spark

    guagua_spark.clear_all_caches()
    for name in TRAINERS:
        print(f"  rebuild {name}: {lap(name):.2f} s", flush=True)
    res["A2"] = phase("A2")

    print("== summary (median s)")
    cols = ["A1", "B1", "B2", "B3", "A2"]
    print(f"{'trainer':14s} " + " ".join(f"{c:>7s}" for c in cols))
    for name in TRAINERS:
        print(
            f"{name:14s} "
            + " ".join(f"{res[c][name]:7.2f}" for c in cols)
        )
    spark.stop()


if __name__ == "__main__":
    main()
