"""Shared fingerprint-keyed persisted-DataFrame memo.

One implementation of the session-index policy every per-corpus index
memo follows (MinHash pair graph, IVF cell assignment, LSH bucket
table, media assets): keyed on the input table fingerprint so
regenerated data invalidates, ONE live entry total (caching a new
sf_dir unpersists every other — a session touching several scale dirs
must not pin several corpus-sized tables in the block manager),
persist(MEMORY_AND_DISK) + count to materialize, and the build wall
time reported as an ``_index:<name>`` entry for the bench cold lane
(guagua_spark.metrics). Centralized here so a policy change lands in
one place instead of drifting across hand-rolled copies.

The LR/NN feature memo (operators/iterative._cached_persisted) stays
separate by design: it retains one entry PER (workload, sf_dir) —
several small feature projections may be live at once — rather than
one entry total.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame


def unpersist_all(cache: dict) -> None:
    """Unpersist every cached DataFrame and empty the cache."""
    for _, df in cache.values():
        try:
            df.unpersist()
        except Exception:
            pass
    cache.clear()


def session_index(
    cache: dict,
    sf_dir: str,
    fingerprint,
    index_name: str,
    build,
) -> DataFrame:
    """persisted_index minus the durable tier: the same session-memo
    policy (fingerprint check, one-live-entry eviction,
    persist(MEMORY_AND_DISK) + count, build time attributed via
    timed_index_build as ``_index:<name>``) with NO cross-process
    write-through. For relations that must stay session-only — e.g.
    an audit relation that IS (modulo sort) some query's own output,
    where serving it across processes would cross the result-caching
    line (round 13's quantize_rows). Centralized here so the policy
    cannot drift across hand-rolled copies (ADVICE r13)."""
    from pyspark.storagelevel import StorageLevel

    from guagua_spark.metrics import timed_index_build

    hit = cache.get(sf_dir)
    if hit is not None and hit[0] == fingerprint:
        return hit[1]
    unpersist_all(cache)
    with timed_index_build(index_name):
        df = build().persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
    cache[sf_dir] = (fingerprint, df)
    return df


def persisted_index(
    cache: dict,
    sf_dir: str,
    fingerprint,
    index_name: str,
    build,
) -> DataFrame:
    """Return the cached persisted DataFrame for ``sf_dir`` when its
    fingerprint matches; otherwise evict everything, build + persist +
    materialize, record the build under ``_index:<index_name>``, and
    cache the result.

    Cross-session tier (round 7): a process-cache miss consults the
    durable parquet store first — a fresh session on an unchanged
    corpus pays one parquet scan (recorded ``_index:<name>:load``)
    instead of the index build's full job graph; full builds
    write through (recorded ``_index:<name>:save``) so the NEXT
    session skips them. See guagua_spark.durable for the
    fingerprint-keyed invalidation contract."""
    from pyspark.storagelevel import StorageLevel

    from guagua_spark.metrics import record_index_build, timed_index_build

    hit = cache.get(sf_dir)
    if hit is not None and hit[0] == fingerprint:
        return hit[1]
    unpersist_all(cache)
    from pyspark.sql import SparkSession

    from guagua_spark import durable

    spark = SparkSession.getActiveSession()
    dkey = (index_name, sf_dir, fingerprint)
    t0 = time.monotonic()
    df = None
    try:
        stored = (
            durable.load_frame(spark, index_name, dkey) if spark else None
        )
        if stored is not None:
            df = stored.persist(StorageLevel.MEMORY_AND_DISK)
            df.count()
            record_index_build(
                f"{index_name}:load", time.monotonic() - t0
            )
    except Exception:
        # the module's concurrency contract: a torn read (e.g. a
        # concurrent store_frame replacing the directory mid-scan —
        # surfaces as a Spark analysis/IO error, not OSError) degrades
        # to a rebuild, never an aborted query
        try:
            if df is not None:
                df.unpersist()
        except Exception:
            pass
        df = None
    if df is None:
        # timed: build() may trigger nested memo builds (the IVF cell
        # table builds the quantizer), which must record self-time only
        with timed_index_build(index_name):
            df = build().persist(StorageLevel.MEMORY_AND_DISK)
            df.count()
        t1 = time.monotonic()
        if spark and durable.store_frame(spark, index_name, dkey, df):
            record_index_build(
                f"{index_name}:save", time.monotonic() - t1
            )
            # serve the READ-BACK of the stored table, not the build
            # lineage: a build session would otherwise memoize a plan
            # (repartition exchanges, UDF stages) that differs from
            # what every warm session serves — the bench plan-diff
            # flip-flopped on exactly this (multimodal shuffles 1↔2
            # on every code edit), and the stored scan is also the
            # cheaper frame to keep pinned
            reloaded = None
            try:
                t2 = time.monotonic()
                reloaded = durable.load_frame(spark, index_name, dkey)
                if reloaded is not None:
                    reloaded = reloaded.persist(
                        StorageLevel.MEMORY_AND_DISK
                    )
                    reloaded.count()
                    df.unpersist()
                    df = reloaded
                    record_index_build(
                        f"{index_name}:reload", time.monotonic() - t2
                    )
            except Exception:
                # torn read → keep serving the built frame; the next
                # session will load the stored copy. Drop the
                # half-persisted reload so it can't leak in the block
                # manager (same discipline as the load path above).
                try:
                    if reloaded is not None and reloaded is not df:
                        reloaded.unpersist()
                except Exception:
                    pass
    cache[sf_dir] = (fingerprint, df)
    return df
