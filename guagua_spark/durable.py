"""Cross-session durable tier for per-corpus derived state.

Every session memo in the repo (certificate scalars, the MinHash pair
graph, the IVF quantizer + cell table, trained model weights, the
k-means init) is a pure function of fingerprinted input tables — yet
until round 7 each one was rebuilt from scratch in every NEW process,
~38 s of a 100 s cold lane at sf0.1. That is the reference's load-once
philosophy (AbstractWorkerComputable.java:66-104 loads training data
ONCE per container, not once per iteration) left unapplied to derived
state: corpus-level indexes and certificates should be computed once
per CORPUS VERSION, not once per session.

This module is the storage half: a small content-addressed store under
the Spark warehouse directory with three tiers —

- ``load_json``/``store_json`` — scalar payloads (certificate row
  tuples, model weights, quantizer centroids) as JSON files. Floats
  round-trip exactly (json uses repr = shortest round-trip); numpy
  arrays go through :func:`np_to_jsonable`. Loads cost zero Spark jobs.
- ``load_frame``/``store_frame`` — DataFrame payloads (the MinHash
  pair graph, IVF cells, media assets) as parquet directories with a
  key sidecar. Loads are one parquet scan instead of the build's jobs.

INVALIDATION CONTRACT. Keys always embed the input tables'
``table_fingerprint`` (content signature: per-file size + mtime +
footer sample), the payload's schema string where one exists,
``DURABLE_FORMAT``, and — since round 8 — :func:`code_version`, a
hash of every ``guagua_spark`` source file. A builder-semantics
change that keeps the same schema therefore misses automatically:
editing ANY module's math changes the package hash and every stored
key with it (deliberately coarse — the store is a cache; a spurious
full rebuild after an unrelated edit costs one cold lane, while a
stale certificate served to the driver's correctness sweep corrupts
the hard signal everything rests on). ``DURABLE_FORMAT`` remains as
a manual escape hatch for layout changes to the store itself.
The pytest suite pins GUAGUA_CACHE_DIR to a fresh tmpdir (conftest),
so its DuckDB oracle sweep always re-derives from the raw tables and
can never be masked by a stale store.

CONCURRENCY. Writes are atomic (tempfile + os.replace for JSON;
write-to-temp-dir + rename for parquet); a lost race or a torn read
degrades to a rebuild, never a wrong answer. The local-FS layout
mirrors what an object store deployment would do with a manifest
object per key (see table_fingerprint's object-store note).

Disable with ``GUAGUA_DURABLE_CACHE=0``; point elsewhere with
``GUAGUA_CACHE_DIR`` (tests use a tmpdir so suite runs stay hermetic).
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

log = logging.getLogger("guagua_spark.durable")

#: bump when changing any durable builder's semantics in place (same
#: schema, different math) — see the invalidation contract above.
DURABLE_FORMAT = 1

#: entries kept per (tier, name): sf0.001 / sf0.01 / sf0.1 coexist
#: during a round plus one spare; older keys are evicted by mtime.
MAX_PER_NAME = 4


def enabled() -> bool:
    return os.environ.get("GUAGUA_DURABLE_CACHE", "1") != "0"


def cache_root(spark: SparkSession) -> str:
    """$GUAGUA_CACHE_DIR, else <spark.sql.warehouse.dir>/_guagua_cache
    — beside the stored LSH/IVF index tables, so one directory holds
    all per-corpus derived state."""
    d = os.environ.get("GUAGUA_CACHE_DIR")
    if d:
        return d
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", os.path.abspath("spark-warehouse")
    )
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    return os.path.join(wh, "_guagua_cache")


_CODE_VERSION: str | None = None


def hash_package_source(pkg_dir: str) -> str:
    """sha256 over every ``*.py`` under ``pkg_dir`` (sorted relpaths,
    path + content both hashed) — the builder-version component of
    every durable key. Pure function of the source tree, so two
    processes running the same code agree and any edit disagrees."""
    h = hashlib.sha256()
    for dirpath, dirnames, files in os.walk(pkg_dir):
        dirnames[:] = sorted(
            d for d in dirnames if d != "__pycache__"
        )
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            h.update(os.path.relpath(path, pkg_dir).encode())
            h.update(b"\0")
            with open(path, "rb") as fh:
                h.update(fh.read())
            h.update(b"\0")
    return h.hexdigest()[:16]


def code_version() -> str:
    """Package-source hash mixed into every durable key (round-8 fix
    for the invalidation blind spot: a same-schema builder-math change
    used to require a manual DURABLE_FORMAT bump; now it is a
    guaranteed miss). Computed once per process (~5 ms)."""
    global _CODE_VERSION
    if _CODE_VERSION is None:
        _CODE_VERSION = hash_package_source(os.path.dirname(__file__))
    return _CODE_VERSION


def _key_repr(key) -> str:
    return repr((DURABLE_FORMAT, code_version(), key))


def _key_hash(key) -> str:
    return hashlib.sha256(_key_repr(key).encode()).hexdigest()[:24]


def _evict_old(dirpath: str, keep_basename: str) -> None:
    """Keep the newest MAX_PER_NAME entries in a name directory (the
    just-written one always survives)."""
    try:
        entries = [
            (os.path.getmtime(os.path.join(dirpath, e)), e)
            for e in os.listdir(dirpath)
            if not e.endswith(".tmp")
        ]
    except OSError:
        return
    entries.sort(reverse=True)
    for _, e in entries[MAX_PER_NAME:]:
        if e == keep_basename:
            continue
        p = os.path.join(dirpath, e)
        try:
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        except OSError:
            pass


def clear(spark: SparkSession) -> None:
    """Wipe the durable store (data-regen / semantics-change hook)."""
    shutil.rmtree(cache_root(spark), ignore_errors=True)


# -- JSON scalar tier --------------------------------------------------------

_SAFE_LEAF = (type(None), bool, int, float, str)


def _jsonable(obj) -> bool:
    if isinstance(obj, _SAFE_LEAF):
        return True
    if isinstance(obj, (list, tuple)):
        return all(_jsonable(x) for x in obj)
    if isinstance(obj, dict):
        return all(
            isinstance(k, str) and _jsonable(v) for k, v in obj.items()
        )
    return False


def np_to_jsonable(arr) -> dict:
    """float64 numpy array → nested-list payload (exact round-trip)."""
    return {"__nd__": list(arr.shape), "data": arr.ravel().tolist()}


def np_from_jsonable(obj):
    import numpy as np

    return np.array(obj["data"], dtype=np.float64).reshape(
        obj["__nd__"]
    )


def load_json(spark: SparkSession, name: str, key):
    """Stored payload for (name, key), or None. Zero Spark jobs."""
    if not enabled():
        return None
    path = os.path.join(
        cache_root(spark), "json", name, _key_hash(key) + ".json"
    )
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return None
    if doc.get("key") != _key_repr(key):
        return None  # hash collision or format skew — treat as miss
    return doc["data"]


def store_json(spark: SparkSession, name: str, key, data) -> bool:
    """Write-through a payload; returns False (and skips) for payloads
    JSON can't round-trip exactly (Decimal/date/binary leaves — those
    certificates simply stay session-memoized)."""
    if not enabled() or not _jsonable(data):
        return False
    dirpath = os.path.join(cache_root(spark), "json", name)
    try:
        os.makedirs(dirpath, exist_ok=True)
        fname = _key_hash(key) + ".json"
        fd, tmp = tempfile.mkstemp(dir=dirpath, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"key": _key_repr(key), "data": data}, f)
        os.replace(tmp, os.path.join(dirpath, fname))
        _evict_old(dirpath, fname)
    except OSError:
        return False
    return True


def durable_model(
    spark: SparkSession,
    store_name: str,
    metric_name: str,
    key,
    build,
    encode=lambda v: v,
    decode=lambda v: v,
):
    """The load-else-build-and-store contract every driver-side model
    artifact (LR/NN weights, quantizer centroids, PQ codebooks, k-means
    init) shares — ONE implementation so a change to the invalidation
    or attribution rules lands everywhere at once (round-7 review):
    durable hit → decode + ``_index:<metric>:load``; miss → build
    inside timed_index_build (nested builds record self-time) +
    write-through. Callers keep only their thin process-memo layer."""
    import time as _time

    from guagua_spark.metrics import record_index_build, timed_index_build

    t0 = _time.monotonic()
    stored = load_json(spark, store_name, key)
    if stored is not None:
        val = decode(stored)
        record_index_build(
            f"{metric_name}:load", _time.monotonic() - t0
        )
        return val
    with timed_index_build(metric_name):
        val = build()
        store_json(spark, store_name, key, encode(val))
    return val


# -- parquet frame tier ------------------------------------------------------


def load_frame(spark: SparkSession, name: str, key) -> DataFrame | None:
    """Stored DataFrame for (name, key) as a fresh parquet scan, or
    None. The sidecar key file is checked before the scan so a stale
    or foreign directory can never be served."""
    if not enabled():
        return None
    base = os.path.join(cache_root(spark), "frames", name)
    h = _key_hash(key)
    dirpath = os.path.join(base, h)
    sidecar = os.path.join(base, h + ".key.json")
    try:
        with open(sidecar) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return None
    if doc.get("key") != _key_repr(key) or not os.path.isdir(dirpath):
        return None
    return spark.read.parquet(dirpath)


def store_frame(
    spark: SparkSession, name: str, key, df: DataFrame
) -> bool:
    """Write-through a (typically already-persisted) DataFrame as
    parquet + key sidecar. The data directory lands first, the sidecar
    last — a reader that sees the sidecar sees complete data."""
    if not enabled():
        return False
    base = os.path.join(cache_root(spark), "frames", name)
    h = _key_hash(key)
    dirpath = os.path.join(base, h)
    sidecar = os.path.join(base, h + ".key.json")
    tmp = dirpath + f".tmp-{os.getpid()}"
    try:
        os.makedirs(base, exist_ok=True)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(sidecar):
            os.remove(sidecar)
        shutil.rmtree(dirpath, ignore_errors=True)
        os.rename(tmp, dirpath)
        fd, ktmp = tempfile.mkstemp(dir=base, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"key": _key_repr(key)}, f)
        os.replace(ktmp, sidecar)
        _evict_frames(base, h)
    except Exception:
        # not just OSError: df.write.parquet surfaces failures as Py4J
        # / Spark exceptions (AnalysisException, wrapped Java IO
        # errors). The module contract is that a failed CACHE write
        # degrades to a rebuild next session, never an abort of the
        # caller's query — the result df is already built at this
        # point (round-8 advice). Logged at WARNING so a persistent
        # store regression (e.g. a driver-side bug in _evict_frames)
        # is observable instead of silently re-building every session
        # (round-9 advice).
        log.warning("durable store_frame(%s) failed; degrading to"
                    " rebuild next session", name, exc_info=True)
        shutil.rmtree(tmp, ignore_errors=True)
        return False
    return True


def _evict_frames(base: str, keep_stem: str) -> None:
    """Frame entries are (data dir, sidecar) PAIRS sharing a hash stem
    — evict whole pairs beyond MAX_PER_NAME, newest sidecars first."""
    try:
        stems = [
            (os.path.getmtime(os.path.join(base, e)), e[: -len(".key.json")])
            for e in os.listdir(base)
            if e.endswith(".key.json")
        ]
    except OSError:
        return
    stems.sort(reverse=True)
    for _, stem in stems[MAX_PER_NAME:]:
        if stem == keep_stem:
            continue
        try:
            os.remove(os.path.join(base, stem + ".key.json"))
        except OSError:
            pass
        shutil.rmtree(os.path.join(base, stem), ignore_errors=True)
