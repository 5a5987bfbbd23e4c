"""Round-14 probe: adjudicate the round-13 trainer warm regression
(driver lane: lr_train 2.85->4.71, nn_train_gd 1.88->2.79,
kmeans_train 1.26->1.68 — untouched code, zero plan change).

Hypothesis under test (VERDICT.md item 1): round 13 pinned more
block-manager state during the warm lane than any prior round
(trade edges, graph nodes, pr weights, bloom buyers, affinity edges,
quantize rows, feature bounds — on top of the pre-existing
minhash/IVF/feature memos) inside an 8 GB heap shared with 32
executor threads; GC/memory pressure on the most scheduling-sensitive
rows would be a *real* mechanism rather than box noise.

Design — one session, quiet box, A1/B/A2 ordering so monotonic box
drift cannot masquerade as a memo effect:
  warm-up   one lap per trainer (codegen + the trainers' own feature
            memos; discarded)
  A1        N laps per trainer, session memos NOT populated
  populate  the full contract cold lane (queries() once each) — the
            exact block-manager state the bench warm lane runs under;
            pinned bytes/entries recorded via getRDDStorageInfo
  B         N laps per trainer, memos populated
  clear     guagua_spark.clear_all_caches(); one discard lap per
            trainer (rebuilds their own inputs)
  A2        N laps per trainer, memos cleared again

If B >> A1 and A2 drops back: memo pressure is real -> demote
cold-only memos (DISK_ONLY / post-cert release). If A1 ~ B ~ A2: the
driver-lane regression was box contention, recorded as adjudicated.

Usage: python scripts/r14_probe_trainers.py [sf_dir] [laps]
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
        app_name="r14_probe_trainers",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    def storage_info() -> tuple[int, int, int]:
        infos = sc._jsc.sc().getRDDStorageInfo()
        mem = sum(i.memSize() for i in infos)
        disk = sum(i.diskSize() for i in infos)
        return len(infos), mem, disk

    def lap(name: str) -> float:
        sc.setJobDescription(f"probe_trainers: {name}")
        t0 = time.monotonic()
        queries[name](spark, sf_dir).collect()
        dt = time.monotonic() - t0
        sc.setJobDescription(None)
        return dt

    def phase(label: str) -> dict[str, float]:
        out = {}
        for name in TRAINERS:
            samples = [lap(name) for _ in range(laps)]
            out[name] = statistics.median(samples)
            print(
                f"  {label:10s} {name:14s} median {out[name]:6.2f} s"
                f"   laps {['%.2f' % s for s in samples]}",
                flush=True,
            )
        return out

    print("== warm-up (codegen + trainer feature memos; discarded)")
    for name in TRAINERS:
        print(f"  warm-up {name}: {lap(name):.2f} s", flush=True)
    n, mem, disk = storage_info()
    print(f"  storage after warm-up: {n} RDDs, mem {mem/1e6:.1f} MB, disk {disk/1e6:.1f} MB")

    print("== A1: memos NOT populated")
    a1 = phase("A1")

    print("== populate: full contract cold lane", flush=True)
    t0 = time.monotonic()
    for name, fn in queries.items():
        fn(spark, sf_dir).collect()
    print(f"  cold lane: {time.monotonic() - t0:.1f} s")
    n, mem, disk = storage_info()
    print(f"  storage populated: {n} RDDs, mem {mem/1e6:.1f} MB, disk {disk/1e6:.1f} MB")

    print("== B: memos populated (bench warm-lane state)")
    b = phase("B")

    import guagua_spark

    guagua_spark.clear_all_caches()
    n, mem, disk = storage_info()
    print(f"  storage after clear_all_caches: {n} RDDs, mem {mem/1e6:.1f} MB, disk {disk/1e6:.1f} MB")
    for name in TRAINERS:
        print(f"  rebuild {name}: {lap(name):.2f} s", flush=True)

    print("== A2: memos cleared again")
    a2 = phase("A2")

    print("== summary (median s)")
    print(f"{'trainer':14s} {'A1':>7s} {'B':>7s} {'A2':>7s}  B/mean(A)")
    for name in TRAINERS:
        base = (a1[name] + a2[name]) / 2
        print(
            f"{name:14s} {a1[name]:7.2f} {b[name]:7.2f} {a2[name]:7.2f}"
            f"  {b[name] / base:8.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
