"""Cross-session durable tier (guagua_spark.durable) + the stored-index
fresh-session round trip the round-6 verdict asked for.

Fast tests exercise the store in-process (fresh tmp roots per test);
the slow one proves the real claim: TWO separate python processes,
each its own SparkSession/JVM, sharing only the on-disk store — the
second session must serve certificates, models, and index memos from
disk with ZERO rebuild jobs, and must read the stored LSH/IVF catalog
tables written by the first (persistent_catalog=True)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

import pytest

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def droot(tmp_path, monkeypatch):
    monkeypatch.setenv("GUAGUA_CACHE_DIR", str(tmp_path / "dstore"))
    return str(tmp_path / "dstore")


def test_json_roundtrip_exact_and_key_mismatch(spark, droot):
    from guagua_spark import durable

    data = [[1, 0.1 + 0.2, "x", None, True], [2, 5.0, "y", None, False]]
    assert durable.store_json(spark, "cert:t", ("k", 1), data)
    got = durable.load_json(spark, "cert:t", ("k", 1))
    assert got == data  # float round-trips exactly (repr-based json)
    assert got[0][1] == 0.1 + 0.2
    assert durable.load_json(spark, "cert:t", ("k", 2)) is None


def test_json_skips_unsafe_payloads(spark, droot):
    from decimal import Decimal

    from guagua_spark import durable

    assert not durable.store_json(spark, "cert:t", "k", [Decimal("1")])
    assert durable.load_json(spark, "cert:t", "k") is None


def test_disabled_env_is_full_bypass(spark, droot, monkeypatch):
    from guagua_spark import durable

    monkeypatch.setenv("GUAGUA_DURABLE_CACHE", "0")
    assert not durable.store_json(spark, "cert:t", "k", [1])
    monkeypatch.delenv("GUAGUA_DURABLE_CACHE")
    assert durable.store_json(spark, "cert:t", "k", [1])
    monkeypatch.setenv("GUAGUA_DURABLE_CACHE", "0")
    assert durable.load_json(spark, "cert:t", "k") is None


def test_numpy_codec_roundtrip():
    import numpy as np

    from guagua_spark import durable

    a = np.arange(12, dtype=np.float64).reshape(3, 4) / 7.0
    b = durable.np_from_jsonable(
        json.loads(json.dumps(durable.np_to_jsonable(a)))
    )
    assert b.shape == a.shape and (a == b).all()


def test_frame_roundtrip_and_eviction(spark, droot):
    from guagua_spark import durable

    for i in range(durable.MAX_PER_NAME + 2):
        df = spark.range(i, i + 3).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        )
        assert durable.store_frame(spark, "idx", ("key", i), df)
    # newest MAX_PER_NAME keys survive, oldest two evicted as pairs
    assert durable.load_frame(spark, "idx", ("key", 0)) is None
    assert durable.load_frame(spark, "idx", ("key", 1)) is None
    last = durable.load_frame(
        spark, "idx", ("key", durable.MAX_PER_NAME + 1)
    )
    assert last is not None
    assert sorted(tuple(r) for r in last.collect()) == [
        (i, 2 * i)
        for i in range(durable.MAX_PER_NAME + 1, durable.MAX_PER_NAME + 4)
    ]
    base = os.path.join(droot, "frames", "idx")
    assert len(os.listdir(base)) == 2 * durable.MAX_PER_NAME


def test_cert_memo_durable_hit_skips_build(spark, sf_dir, droot):
    from guagua_spark.operators import certmemo

    calls = []

    def build():
        calls.append(1)
        return spark.createDataFrame([(7, 1.5)], "a bigint, b double")

    args = (spark, sf_dir, "t_dur", ("nation",), "a bigint, b double", build)
    cols1 = certmemo.cached_cert_cols(*args)
    assert calls == [1]
    # simulate a fresh session: the process memo is gone, the store isn't
    certmemo.clear_caches()
    cols2 = certmemo.cached_cert_cols(*args)
    assert calls == [1], "second session must not rebuild"
    r1 = spark.range(1).select(*cols1).collect()
    r2 = spark.range(1).select(*cols2).collect()
    assert r1 == r2 == [type(r1[0])(a=7, b=1.5)]


def test_cert_schema_change_invalidates(spark, sf_dir, droot):
    from guagua_spark.operators import certmemo

    calls = []

    def build(schema, vals):
        def _b():
            calls.append(schema)
            return spark.createDataFrame([vals], schema)

        return _b

    certmemo.cached_cert_cols(
        spark, sf_dir, "t_sch", ("nation",), "a bigint", build("a bigint", (1,))
    )
    certmemo.clear_caches()
    # widened certificate (new schema) must MISS and rebuild
    certmemo.cached_cert_cols(
        spark,
        sf_dir,
        "t_sch",
        ("nation",),
        "a bigint, c bigint",
        build("a bigint, c bigint", (1, 2)),
    )
    assert calls == ["a bigint", "a bigint, c bigint"]


def test_persisted_index_durable_hit(spark, sf_dir, droot):
    from guagua_spark.memo import persisted_index, unpersist_all

    cache: dict = {}
    build_calls = []

    def build():
        build_calls.append(1)
        return spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )

    df1 = persisted_index(cache, sf_dir, ("fp", 1), "t_frame", build)
    assert build_calls == [1]
    rows1 = sorted(tuple(r) for r in df1.collect())
    unpersist_all(cache)  # fresh-session simulation

    def explode():
        raise AssertionError("must load from durable store, not rebuild")

    df2 = persisted_index(cache, sf_dir, ("fp", 1), "t_frame", explode)
    assert sorted(tuple(r) for r in df2.collect()) == rows1
    # changed fingerprint: durable store must MISS
    unpersist_all(cache)
    persisted_index(cache, sf_dir, ("fp", 2), "t_frame", build)
    assert build_calls == [1, 1]


_SESSION_SCRIPT = textwrap.dedent(
    """
    import json, os, sys
    sys.path.insert(0, {repo!r})
    from guagua_spark.session import get_spark
    from guagua_spark.metrics import INDEX_BUILD_TIMES

    sf = {sf!r}
    spark = get_spark(
        app_name="durable_session",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={{
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": {wh!r},
        }},
        persistent_catalog=True,
    )
    out = {{}}

    from guagua_spark.operators.iterative import lr_train
    out["lr"] = [repr(tuple(r)) for r in lr_train(spark, sf).collect()]

    from guagua_spark.operators.dedup import (
        minhash_pairs_from_index, save_lsh_index,
    )
    from guagua_spark.sources.tables import load_table
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    if {first!r} == "yes":
        save_lsh_index(docs, "dur_lsh")
    out["lsh_pairs"] = sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in minhash_pairs_from_index(spark, "dur_lsh").collect()
    )

    from guagua_spark.operators.similarity import (
        ann_ivf_topk_from_index, save_ivf_index,
    )
    if {first!r} == "yes":
        save_ivf_index(spark, sf, "dur_ivf")
    out["ivf"] = [
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann_ivf_topk_from_index(spark, sf, "dur_ivf")
        .select("query_id", "neighbor_id", "rank").collect()
    ]

    from guagua_spark.operators.dedup import dedup_minhash_pairs
    out["mh"] = sorted(
        (r.doc_a, r.doc_b) for r in dedup_minhash_pairs(spark, sf).collect()
    )

    out["builds"] = sorted(INDEX_BUILD_TIMES)
    with open({out!r}, "w") as f:
        json.dump(out, f)
    spark.stop()
    """
)


def test_fresh_session_round_trip(tmp_path):
    """The end-to-end claim: session B (a SEPARATE process/JVM) serves
    the inference certificate, the LR model, and the MinHash pair-graph
    memo from the durable store with zero rebuilds, and probes the
    stored LSH/IVF catalog tables session A wrote."""
    sf = os.environ.get("GUAGUA_TEST_SF_DIR", "/root/testdata/sf0.001")
    env = dict(os.environ)
    env["GUAGUA_CACHE_DIR"] = str(tmp_path / "store")
    env.pop("GUAGUA_DURABLE_CACHE", None)

    results = []
    for first in ("yes", "no"):
        out = str(tmp_path / f"out_{first}.json")
        script = _SESSION_SCRIPT.format(
            repo=REPO,
            sf=sf,
            wh=str(tmp_path / "wh"),
            first=first,
            out=out,
        )
        proc = subprocess.run(
            [sys.executable, "-c", script],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
            cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        with open(out) as f:
            results.append(json.load(f))
    a, b = results
    # identical results across the session boundary
    assert a["lr"] == b["lr"]
    assert a["lsh_pairs"] == b["lsh_pairs"]
    assert a["ivf"] == b["ivf"]
    assert a["mh"] == b["mh"]
    # session A built; session B loaded — certificates, model-backed
    # cert block, and the pair-graph frame all come from the store
    assert "_index:cert:inference" in a["builds"]
    assert "_index:minhash_pairs" in a["builds"]
    assert "_index:minhash_pairs:save" in a["builds"]
    assert "_index:cert:inference" not in b["builds"]
    assert "_index:certload:inference" in b["builds"]
    assert "_index:minhash_pairs" not in b["builds"]
    assert "_index:minhash_pairs:load" in b["builds"]


def test_frame_torn_read_degrades_to_rebuild(spark, sf_dir, droot):
    """Concurrency contract: a torn frame entry (sidecar present, data
    directory gutted — what a reader can observe mid-replacement) must
    degrade to a rebuild, never abort the query."""
    import glob

    from guagua_spark.memo import persisted_index, unpersist_all

    cache: dict = {}
    builds = []

    def build():
        builds.append(1)
        return spark.range(0, 50).select(
            F.col("id"), (F.col("id") + 1).alias("v")
        )

    df1 = persisted_index(cache, sf_dir, ("fp", 9), "t_torn", build)
    rows = sorted(tuple(r) for r in df1.collect())
    unpersist_all(cache)
    # gut the stored data dir but keep the sidecar: load_frame's
    # sidecar check passes, the parquet read then fails mid-flight
    for part in glob.glob(os.path.join(droot, "frames", "t_torn", "*", "*")):
        os.remove(part)
    df2 = persisted_index(cache, sf_dir, ("fp", 9), "t_torn", build)
    assert builds == [1, 1]
    assert sorted(tuple(r) for r in df2.collect()) == rows


def test_code_version_invalidates_builder_math_change(
    spark, droot, monkeypatch
):
    """Round-8 fix for the invalidation blind spot: a builder-semantics
    change (simulated by a different package-source hash) must miss the
    store — no manual DURABLE_FORMAT bump, no clear()."""
    from guagua_spark import durable

    assert durable.store_json(spark, "cert:cv", ("k",), [[42]])
    assert durable.load_json(spark, "cert:cv", ("k",)) == [[42]]
    # same key, different code version — as after editing any module
    monkeypatch.setattr(durable, "_CODE_VERSION", "deadbeef00000000")
    assert durable.load_json(spark, "cert:cv", ("k",)) is None
    # the new version's write does not clobber the old version's entry
    assert durable.store_json(spark, "cert:cv", ("k",), [[43]])
    assert durable.load_json(spark, "cert:cv", ("k",)) == [[43]]


def test_hash_package_source_sees_any_edit(tmp_path):
    """The version hash moves on content edits, new files, and renames
    — the properties the auto-invalidation rests on."""
    from guagua_spark import durable

    pkg = tmp_path / "pkg"
    (pkg / "sub").mkdir(parents=True)
    (pkg / "a.py").write_text("X = 1\n")
    (pkg / "sub" / "b.py").write_text("def f():\n    return 2\n")
    (pkg / "notes.txt").write_text("ignored\n")
    v0 = durable.hash_package_source(str(pkg))
    assert v0 == durable.hash_package_source(str(pkg))  # deterministic
    (pkg / "sub" / "b.py").write_text("def f():\n    return 3\n")
    v1 = durable.hash_package_source(str(pkg))
    assert v1 != v0
    (pkg / "c.py").write_text("")
    v2 = durable.hash_package_source(str(pkg))
    assert v2 != v1
    (pkg / "notes.txt").write_text("still ignored, edited\n")
    assert durable.hash_package_source(str(pkg)) == v2


def test_fingerprint_footer_token_sees_content_change(tmp_path):
    """Regenerating a file with PRESERVED size+mtime (cp -p / tar) must
    still change the fingerprint — the footer crc carries it."""
    from guagua_spark.sources import tables

    root = tmp_path / "t.parquet"
    root.write_bytes(b"A" * 200)
    st = os.stat(root)
    fp0 = tables.table_fingerprint(str(tmp_path), "t")
    assert len(fp0) == 1 and len(fp0[0]) == 4  # (name, size, mtime, crc)
    # same size, same mtime, different tail bytes
    root.write_bytes(b"A" * 136 + b"B" * 64)
    os.utime(root, ns=(st.st_atime_ns, st.st_mtime_ns))
    fp1 = tables.table_fingerprint(str(tmp_path), "t")
    assert fp1 != fp0 and fp1[0][:3] == fp0[0][:3]


_SMB_CATALOG_SCRIPT = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from guagua_spark.session import get_spark

    sf = {sf!r}
    spark = get_spark(
        app_name="smb_catalog",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={{
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": {wh!r},
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }},
        persistent_catalog=True,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {{}}

    # instrument: every DDL goes through spark.sql in _bucketed_twin
    ddl = []
    orig_sql = spark.sql
    def traced_sql(q, *a, **k):
        ddl.append(q)
        return orig_sql(q, *a, **k)
    spark.sql = traced_sql

    from guagua_spark.operators.relational_ext import (
        LOCAL_QUERIES, _bucketed_twin,
    )
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    ot = _bucketed_twin(
        spark, sf, "orders", "o_orderkey",
        ["o_orderkey", "o_orderpriority"],
    )
    lt = _bucketed_twin(
        spark, sf, "lineitem", "l_orderkey",
        ["l_orderkey", "l_extendedprice", "l_discount"],
    )
    after = set(tracker.getJobIdsForGroup(None))
    out["twin_jobs"] = len(after - before)
    out["twin_ddl"] = [q for q in ddl if "CREATE" in q.upper()]

    df = LOCAL_QUERIES["rx_bucketed_join"](spark, sf)
    out["rows"] = sorted(
        (r["o_orderpriority"], r["n_lines"], round(r["revenue"], 2))
        for r in df.collect()
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    out["bucketed_scans"] = final.count("Bucketed: true")
    out["key_exchange"] = (
        "Exchange hashpartitioning(o_orderkey" in final
        or "Exchange hashpartitioning(l_orderkey" in final
    )
    with open({out!r}, "w") as f:
        json.dump(out, f)
    spark.stop()
    """
)


def test_bucketed_twin_is_pure_lookup_with_persistent_catalog(tmp_path):
    """Round-12 stretch: with the Hive/Derby catalog the bucketed twin
    survives the process boundary IN THE CATALOG, so session B's
    _bucketed_twin is a pure tableExists lookup — ZERO Spark jobs and
    ZERO DDL (the in-memory-catalog path re-issues CREATE TABLE per
    session), while the join still plans bucketed scans with no
    join-key exchange and returns identical rows."""
    sf = os.environ.get("GUAGUA_TEST_SF_DIR", "/root/testdata/sf0.001")
    env = dict(os.environ)
    env["GUAGUA_CACHE_DIR"] = str(tmp_path / "store")
    results = []
    for tag in ("a", "b"):
        out = str(tmp_path / f"smbcat_{tag}.json")
        script = _SMB_CATALOG_SCRIPT.format(
            repo=REPO, sf=sf, wh=str(tmp_path / "wh"), out=out
        )
        proc = subprocess.run(
            [sys.executable, "-c", script],
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
            cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        with open(out) as f:
            results.append(json.load(f))
    a, b = results
    assert a["rows"] == b["rows"]
    for r in results:
        assert r["bucketed_scans"] == 2, r
        assert not r["key_exchange"], r
    # session A builds (jobs + possibly a reattach CREATE are fine);
    # session B must be a pure catalog lookup
    assert b["twin_jobs"] == 0, b
    assert b["twin_ddl"] == [], b
