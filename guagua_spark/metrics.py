"""Build-time attribution for session index memos.

Several operators build a shared per-corpus index on first touch (the
MinHash pair graph, the IVF quantizer, the media asset table, the
LR/NN feature inputs — see SCALE.md's memo inventory). Whichever query
happens to run first pays that build, which made bench.py's per-query
COLD lane misattribute index cost to an arbitrary query (e.g. the
~3 s pair-graph build landing inside pipeline_clean_corpus while
dedup_minhash_pairs showed a 0.18 s "cold" cache hit).

Memo builders call :func:`record_index_build` on a MISS; the bench
cold lane drains the registry after each query and reports each build
as its own ``_index:*`` entry, subtracted from the triggering query's
cold time — so per-query cold numbers are independent and cold_total
still adds up to real wall time.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

INDEX_BUILD_TIMES: dict[str, float] = {}

#: per-open-build accumulator of nested build time — builds can nest
#: (the inference certificate build runs infer_auc, which builds the
#: ranked-relation memo; a cert build can populate the feature memo),
#: and each build must record only its SELF time or the bench cold
#: lane double-subtracts the nested seconds from the triggering query
#: (observed as a clamped-to-zero lr_train cold entry in round 7).
_CHILD_STACK: list[float] = []


def record_index_build(name: str, seconds: float) -> None:
    """Attribute ``seconds`` of LEAF memo work (no nested builds —
    durable-store loads, straight collects) to ``_index:<name>``; the
    time is also charged to the enclosing open build, if any, so that
    build records only its self time."""
    key = f"_index:{name}"
    INDEX_BUILD_TIMES[key] = INDEX_BUILD_TIMES.get(key, 0.0) + seconds
    if _CHILD_STACK:
        _CHILD_STACK[-1] += seconds


@contextmanager
def timed_index_build(name: str):
    """Time a build that MAY trigger nested builds: records wall time
    minus the nested builds' wall time (self time) under
    ``_index:<name>``, and charges its full wall time to the parent
    build, if any. Total across all entries always sums to real
    wall-clock once."""
    _CHILD_STACK.append(0.0)
    t0 = time.monotonic()
    try:
        yield
    finally:
        dt = time.monotonic() - t0
        child = _CHILD_STACK.pop()
        key = f"_index:{name}"
        INDEX_BUILD_TIMES[key] = INDEX_BUILD_TIMES.get(key, 0.0) + max(
            dt - child, 0.0
        )
        if _CHILD_STACK:
            _CHILD_STACK[-1] += dt


def drain_index_builds() -> dict[str, float]:
    """Return and clear all recorded build times."""
    out = dict(INDEX_BUILD_TIMES)
    INDEX_BUILD_TIMES.clear()
    return out


# -- executed-plan capture for checkpointing operators -----------------------
#
# Five operators (events_bloom_semijoin, dedup_spans, graph_pagerank /
# graph_bfs_depth / graph_triangles) return an eager localCheckpoint,
# so the DataFrame the bench lane sees is an ExistingRDD stub and the
# drift-immune plan-metrics tripwire recorded nothing for them
# (VERDICT r13 item 3). The checkpoint call itself EXECUTES the real
# plan, so the operators snapshot their pre-checkpoint DataFrame here
# right after checkpointing; bench.py drains the registry per LOCAL
# entry. Iterative operators (pagerank/BFS) record once per round —
# last-wins keeps the FINAL round's plan, the stable shape.

PLAN_SNAPSHOTS: dict[str, object] = {}


def record_plan(name: str, df) -> None:
    """Snapshot ``df`` for plan-metrics capture (call after an action
    — e.g. right after ``df.localCheckpoint(True)`` — so AQE's final
    plan is what gets counted at drain time). Only the DataFrame ref
    is stored here — stringifying the executed plan costs ~0.1 s per
    call driver-side (measured +0.9 s on BFS, which records once per
    ROUND), so the expensive toString happens once per drained name
    in drain_plan_snapshots, last-wins. Never raises: plan capture
    must not break a query path."""
    try:
        PLAN_SNAPSHOTS[name] = df
    except Exception:
        pass


def drain_plan_snapshots() -> dict[str, dict[str, int]]:
    """Stringify, return and clear all recorded plan snapshots."""
    import re

    out: dict[str, dict[str, int]] = {}
    for name, df in PLAN_SNAPSHOTS.items():
        try:
            p = df._jdf.queryExecution().executedPlan().toString()
            p = p.split("== Initial Plan ==")[0]
            out[name] = {
                "shuffles": len(re.findall(r"\bExchange\b", p)),
                "broadcasts": p.count("BroadcastExchange"),
                "sorts": len(re.findall(r"\bSort\b", p)),
                "scans": p.count("Scan parquet"),
            }
        except Exception:
            pass
    PLAN_SNAPSHOTS.clear()
    return out
