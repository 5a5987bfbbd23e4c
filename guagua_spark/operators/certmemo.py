"""Session memo for 1-row certificate aggregates.

Several contract rows carry corpus-level CERTIFICATE columns that bind
a LOCAL operator's math into a driver-hash-checked row (the 50-slot
cap workaround — see SURVEY.md §7). Each certificate is a pure
function of static input tables, so recomputing its subtree on every
invocation of the host query is repeated work a real pipeline would
never do — corpus-level statistics are computed once per corpus
version and stored (the same argument as the MinHash pair graph / IVF
assignment memos, and the move the round-4 advice prescribed for the
semantic-dedup certificate).

:func:`cached_cert_row` collects the certificate scalars once per
(name, sf_dir, input-table fingerprints), re-emits them as a 1-row
literal DataFrame on hits, reports the miss cost as a
``_index:cert:<name>`` entry in the bench cold lane, and keeps ONE
live entry per name (multi-dir sessions don't accumulate). The values
stay fully oracle-checked: the driver's correctness run computes them
for real on first touch.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

_CERT_CACHE: dict = {}


def clear_caches() -> None:
    """Drop all memoized certificate scalars (data-regen hook)."""
    _CERT_CACHE.clear()


def _cert_vals(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    tables: tuple[str, ...],
    schema: str,
    build,
    max_rows: int = 1024,
) -> tuple:
    """The memoized row tuples behind every cached_cert_* entry point —
    single lookup by the FULL (name, sf_dir, fingerprints) key, so a
    caller can never be handed another dataset's certificate (the
    name-only rescan the round-6 advice flagged is gone).

    Cross-session tier: misses consult the durable store first (key
    additionally embeds the SCHEMA, so a widened certificate misses
    cleanly) — a fresh session on an unchanged corpus replays the
    scalars with zero Spark jobs instead of re-running the build
    (guagua_spark.durable; invalidation contract documented there).
    Durable hits self-report as ``_index:certload:<name>`` so the
    bench cold lane stays honestly attributed."""
    from guagua_spark import durable
    from guagua_spark.metrics import record_index_build, timed_index_build
    from guagua_spark.sources.tables import table_fingerprint

    key = (
        name,
        sf_dir,
        tuple(table_fingerprint(sf_dir, t) for t in tables),
    )
    vals = _CERT_CACHE.get(key)
    if vals is None:
        t0 = time.monotonic()
        stored = durable.load_json(spark, f"cert:{name}", key + (schema,))
        if stored is not None:
            vals = tuple(tuple(r) for r in stored)
            record_index_build(
                f"certload:{name}", time.monotonic() - t0
            )
        else:
            # timed (not leaf-recorded): cert builds trigger nested
            # memo builds (ranked relation, feature inputs) that must
            # not be double-counted
            with timed_index_build(f"cert:{name}"):
                rows = build().collect()
                if not (1 <= len(rows) <= max_rows):
                    raise ValueError(
                        f"certificate {name!r} must yield 1..{max_rows} "
                        f"rows (bounded domain), got {len(rows)}"
                    )
                vals = tuple(tuple(r) for r in rows)
                durable.store_json(
                    spark,
                    f"cert:{name}",
                    key + (schema,),
                    [list(r) for r in vals],
                )
        for k in [k for k in _CERT_CACHE if k[0] == name]:
            del _CERT_CACHE[k]  # one live entry per certificate
        _CERT_CACHE[key] = vals
    return vals


def cached_cert_df(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    tables: tuple[str, ...],
    schema: str,
    build,
    max_rows: int = 1024,
) -> DataFrame:
    """Memoized BOUNDED-DOMAIN certificate: ``build()`` must return a
    DataFrame matching ``schema`` whose cardinality is bounded by a
    data-independent domain (an enum of statuses/priorities, never a
    data-proportional key set — ``max_rows`` is the tripwire, not a
    truncation). Collected rows are replayed as a literal relation
    until any of ``tables``' fingerprints change."""
    vals = _cert_vals(
        spark, sf_dir, name, tables, schema, build, max_rows
    )
    return spark.createDataFrame(list(vals), schema)


def cached_cert_row(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    tables: tuple[str, ...],
    schema: str,
    build,
) -> DataFrame:
    """Memoized 1-row certificate: ``build()`` must return a 1-row
    DataFrame matching ``schema``; its collected scalars are replayed
    as literals until any of ``tables``' fingerprints change."""
    return cached_cert_df(
        spark, sf_dir, name, tables, schema, build, max_rows=1
    )


def cached_cert_cols(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    tables: tuple[str, ...],
    schema: str,
    build,
) -> list:
    """cached_cert_row's scalars as typed literal COLUMNS — attach with
    ``df.select("*", *cols)`` instead of a crossJoin(broadcast(...)).
    Identical values and column names, leaner plan: no BroadcastExchange
    / BroadcastNestedLoopJoin node per host query, the certificate
    constant-folds into whatever stage produces the host row. Warm
    calls submit NO Spark job: the literals come straight from the
    memoized tuple and the parsed schema (the 1-row DataFrame detour
    would run a collect per host-query construction)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType, _parse_datatype_string

    # full-key memo lookup (runs build() only on a miss) — no
    # DataFrame action on warm calls, the literals come from the tuple
    (vals,) = _cert_vals(
        spark, sf_dir, name, tables, schema, build, max_rows=1
    )
    parsed = _parse_datatype_string(schema)
    assert isinstance(parsed, StructType)
    return [
        F.lit(v).cast(f.dataType).alias(f.name)
        for f, v in zip(parsed.fields, vals)
    ]
