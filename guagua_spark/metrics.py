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

INDEX_BUILD_TIMES: dict[str, float] = {}


def record_index_build(name: str, seconds: float) -> None:
    """Attribute ``seconds`` of memo-build work to ``_index:<name>``."""
    key = f"_index:{name}"
    INDEX_BUILD_TIMES[key] = INDEX_BUILD_TIMES.get(key, 0.0) + seconds


def drain_index_builds() -> dict[str, float]:
    """Return and clear all recorded build times."""
    out = dict(INDEX_BUILD_TIMES)
    INDEX_BUILD_TIMES.clear()
    return out
