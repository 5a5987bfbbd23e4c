"""Stored LSH index round trip: write bucketed index datasets → probe
from the catalog (no recompute, no session memo) → equality with the
recompute-from-text paths, plus the zero-Exchange bucketed self-join
the write pays for once."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from guagua_spark.operators.dedup import (
    INC_SPLIT,
    minhash_pairs_against_index,
    minhash_pairs_between,
    minhash_pairs_for,
    minhash_pairs_from_index,
    save_lsh_index,
)
from guagua_spark.sources.tables import load_table


def _drop(spark, name: str) -> None:
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for suffix in ("_docs", "_buckets"):
        spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")
        shutil.rmtree(f"{wh}/{name}{suffix}", ignore_errors=True)


@pytest.fixture(scope="module")
def lsh_index(spark, sf_dir):
    """The standing corpus's stored index (old side of the incremental
    fixture), written once for the module."""
    _drop(spark, "t_lshidx")
    old = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < INC_SPLIT)
        .select("doc_id", "text")
    )
    save_lsh_index(old, "t_lshidx")
    yield "t_lshidx"
    _drop(spark, "t_lshidx")


def _pairs(df, a="new_id", b="old_id"):
    return sorted(
        (r[a], r[b], round(r.jaccard, 9)) for r in df.collect()
    )


def test_stored_index_probe_equals_recompute_path(spark, sf_dir, lsh_index):
    """Probing a fresh batch against the STORED index must yield
    exactly the pairs minhash_pairs_between computes from text. The
    probe touches no session memo and no corpus text — a new session
    (or another job) gets the same result from the catalog alone."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.filter(F.col("doc_id") >= INC_SPLIT)
    old = docs.filter(F.col("doc_id") < INC_SPLIT)
    got = minhash_pairs_against_index(new, lsh_index)
    want = minhash_pairs_between(new, old)
    assert _pairs(got) == _pairs(want)
    assert len(_pairs(got)) > 0, "fixture must produce cross pairs"


def test_stored_index_self_pairs_equal_and_exchange_free(
    spark, sf_dir, lsh_index
):
    """Pair generation from the stored index alone must (a) equal
    minhash_pairs_for over the original text and (b) plan the posting
    table's candidate self-join with ZERO Exchange — the shuffle was
    paid once by write_bucketed."""
    old = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < INC_SPLIT)
        .select("doc_id", "text")
        .repartition(4)
    )
    got = minhash_pairs_from_index(spark, lsh_index)
    want = minhash_pairs_for(old)
    assert _pairs(got, "doc_a", "doc_b") == _pairs(want, "doc_a", "doc_b")

    # force the shuffle-join path: the tiny fixture index would
    # otherwise broadcast (the right call at this size — bucketing
    # pays off when both sides are LARGE, which is what this asserts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        b = spark.table(f"{lsh_index}_buckets")
        cand = b.alias("a").join(
            b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_append_to_index_completes_ingest_loop(spark, sf_dir):
    """probe → merge survivors → the grown index answers pair queries
    exactly as a from-scratch index over the union would (and the
    posting table's bucket spec survives the append: the self-join
    stays Exchange-free)."""
    from guagua_spark.operators.dedup import append_to_lsh_index

    _drop(spark, "t_growidx")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < INC_SPLIT)
    new = docs.filter(F.col("doc_id") >= INC_SPLIT)
    save_lsh_index(old, "t_growidx")
    append_to_lsh_index(new, "t_growidx")
    got = minhash_pairs_from_index(spark, "t_growidx")
    want = minhash_pairs_for(docs.repartition(4))
    assert _pairs(got, "doc_a", "doc_b") == _pairs(want, "doc_a", "doc_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        b = spark.table("t_growidx_buckets")
        cand = b.alias("a").join(
            b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    _drop(spark, "t_growidx")


def test_stored_ivf_index_probe_equals_memo_path(spark, sf_dir):
    """save_ivf_index → clear the session memos (a new session has
    none) → probing the stored tables must reproduce the memo path's
    top-k exactly (quantizer + assignment come from the catalog, and
    no rebuild happens — asserted via the _index build metrics)."""
    from guagua_spark.metrics import drain_index_builds
    from guagua_spark.operators import similarity as sim

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for suffix in ("_cells", "_centroids"):
        spark.sql(f"DROP TABLE IF EXISTS t_ivfidx{suffix}")
        shutil.rmtree(f"{wh}/t_ivfidx{suffix}", ignore_errors=True)

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < sim.NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    want = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cosine, 9))
        for r in sim.exact_rescore_topk(
            sim.ivf_candidates(spark, sf_dir), emb, q
        ).collect()
    )
    sim.save_ivf_index(spark, sf_dir, "t_ivfidx")
    sim.clear_caches()  # new-session semantics: no memos survive
    drain_index_builds()
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cosine, 9))
        for r in sim.ann_ivf_topk_from_index(
            spark, sf_dir, "t_ivfidx"
        ).collect()
    )
    assert got == want and len(got) > 0
    rebuilt = drain_index_builds()
    assert not rebuilt, f"stored path rebuilt session indexes: {rebuilt}"
    for suffix in ("_cells", "_centroids"):
        spark.sql(f"DROP TABLE IF EXISTS t_ivfidx{suffix}")
        shutil.rmtree(f"{wh}/t_ivfidx{suffix}", ignore_errors=True)


def test_streaming_static_side_reads_stored_index(spark, sf_dir, lsh_index):
    """The streaming twin pointed at the stored index must drain to the
    same per-doc rollup as the batch incremental operator (and as its
    own recompute-from-text form)."""
    from guagua_spark.operators.dedup import dedup_incremental
    from guagua_spark.streaming import run_available_now
    from guagua_spark.streaming.stream_ops import (
        streaming_dedup_incremental,
    )

    got = run_available_now(
        streaming_dedup_incremental(spark, sf_dir, index_table=lsh_index),
        "s_inc_idx",
        "complete",
    )
    want = dedup_incremental(spark, sf_dir)

    def rows(df):
        return sorted(
            (r.doc_id, r.dup_of, r.n_matches, round(r.best_jaccard, 9))
            for r in df.collect()
        )

    assert rows(got) == rows(want)


def test_stored_text_index_bm25_equals_recompute_path(spark, sf_dir):
    """The stored full-text index (postings/lengths/stats tables) must
    reproduce the on-the-fly BM25 pipeline exactly — same top-k rows,
    same 6dp scores."""
    from guagua_spark.operators.text import (
        bm25_topk,
        bm25_topk_from_index,
        save_text_index,
    )
    from guagua_spark.sources.tables import load_table

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for suffix in ("_postings", "_lengths", "_stats"):
        spark.sql(f"DROP TABLE IF EXISTS s_text_idx{suffix}")
        shutil.rmtree(f"{wh}/s_text_idx{suffix}", ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    save_text_index(docs, "s_text_idx")

    def rows(df):
        return [
            (r.query_id, r.rnk, r.doc_id, round(r.score, 9))
            for r in df.collect()
        ]

    assert rows(bm25_topk_from_index(spark, "s_text_idx")) == rows(
        bm25_topk(spark, sf_dir)
    )


def test_stored_pq_index_probe_equals_memo_path(spark, sf_dir):
    """Round 8: save_pq_index → clear the session memos (new-session
    semantics) → probing the stored catalog tables must reproduce the
    memo path's IVF-PQ top-k exactly, with NO session-index rebuild
    (quantizer, codebooks, and codes all come from the catalog; only
    the query batch and the exact rescore touch the embeddings)."""
    from guagua_spark.metrics import drain_index_builds
    from guagua_spark.operators import similarity as sim

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for suffix in ("_codes", "_centroids", "_books"):
        spark.sql(f"DROP TABLE IF EXISTS t_pqidx{suffix}")
        shutil.rmtree(f"{wh}/t_pqidx{suffix}", ignore_errors=True)

    want = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cosine, 9))
        for r in sim.ann_ivfpq_topk(spark, sf_dir).collect()
    )
    sim.save_pq_index(spark, sf_dir, "t_pqidx")
    sim.clear_caches()  # new-session semantics: no memos survive
    drain_index_builds()
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, round(r.cosine, 9))
        for r in sim.ann_ivfpq_topk_from_index(
            spark, sf_dir, "t_pqidx"
        ).collect()
    )
    assert got == want and len(got) > 0
    rebuilt = drain_index_builds()
    assert not rebuilt, f"stored path rebuilt session indexes: {rebuilt}"
    for suffix in ("_codes", "_centroids", "_books"):
        spark.sql(f"DROP TABLE IF EXISTS t_pqidx{suffix}")
        shutil.rmtree(f"{wh}/t_pqidx{suffix}", ignore_errors=True)


def test_append_to_pq_index_completes_ingest_loop(spark, sf_dir):
    """Round 8: the ANN ingest loop — new vectors encoded against the
    STORED (frozen) quantizer + codebooks and inserted into the codes
    table; the grown index must answer queries exactly as the shared
    probe/score stage does over a direct encode of the union with the
    same models, and the appended vectors must actually surface (the
    batch duplicates corpus vectors, so ties put the new ids into the
    top-k)."""
    from guagua_spark.operators import similarity as sim

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for suffix in ("_codes", "_centroids", "_books"):
        spark.sql(f"DROP TABLE IF EXISTS t_pqgrow{suffix}")
        shutil.rmtree(f"{wh}/t_pqgrow{suffix}", ignore_errors=True)

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    sim.save_pq_index(spark, sf_dir, "t_pqgrow")
    # new batch: shifted-id copies of vectors 100..149 (exact
    # duplicates — cosine ties force them into results when present)
    batch = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 150)
    ).select((F.col("vec_id") + n).alias("vec_id"), "embedding")
    sim.append_to_pq_index(batch, "t_pqgrow")

    # the ingest loop grows the corpus dataset alongside the index —
    # the rescore can only return vectors whose embeddings it can join
    centroids, books = sim._load_pq_models(spark, "t_pqgrow")
    union = emb.unionByName(batch)
    got = sim.ann_ivfpq_topk_from_index(
        spark, sf_dir, "t_pqgrow", emb=union
    )
    # expected: the same frozen models over a direct encode of the
    # union, through the same shared probe/score stage
    idx = union.select(
        "vec_id",
        sim._encode_udf(books)(F.col("embedding")).alias("codes"),
        sim._cell_udf(centroids)(F.col("embedding")).alias("cell"),
    )
    q = emb.filter(F.col("vec_id") < sim.NUM_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    want = sim._ivfpq_topk_of(spark, union, q, centroids, books, idx)

    def rows(df):
        return sorted(
            (r.query_id, r.rank, r.neighbor_id, round(r.cosine, 9))
            for r in df.collect()
        )

    g, w = rows(got), rows(want)
    assert g == w and len(g) > 0
    # the grown index actually holds the batch
    stored = spark.table("t_pqgrow_codes")
    assert stored.count() == n + 50
    assert stored.filter(F.col("vec_id") >= n).count() == 50
    for suffix in ("_codes", "_centroids", "_books"):
        spark.sql(f"DROP TABLE IF EXISTS t_pqgrow{suffix}")
        shutil.rmtree(f"{wh}/t_pqgrow{suffix}", ignore_errors=True)
