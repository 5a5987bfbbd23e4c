"""Round-4 extension operators vs their DuckDB oracles: fixed-token
chunking, deterministic sequence packing, and LSH-bucketed semantic
dedup (plus the LSH recall bound the bucket construction promises)."""

from __future__ import annotations

import pytest

from guagua_spark.operators.packing import (
    CHUNK_TOKENS,
    LOCAL_ORACLE_SQL,
    LOCAL_QUERIES,
    SEQ_TOKENS,
)

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(LOCAL_ORACLE_SQL))
def test_packing_matches_oracle(spark, oracle_sf_dir, duck, name):
    assert_matches_oracle(
        LOCAL_QUERIES[name](spark, oracle_sf_dir),
        duck,
        LOCAL_ORACLE_SQL[name],
    )


def test_chunks_cover_every_token(spark, oracle_sf_dir, duck):
    """Σ chunk_toks per doc == doc token count, every non-final chunk
    full — the chunking must be a partition of the token stream."""
    rows = (
        LOCAL_QUERIES["pipeline_doc_chunks"](spark, oracle_sf_dir)
        .groupBy("doc_id")
        .agg(
            {"chunk_toks": "sum", "chunk_id": "max"},
        )
        .collect()
    )
    want = dict(
        duck.execute(
            "SELECT doc_id, len(string_split(text, ' ')) FROM documents"
        ).fetchall()
    )
    assert len(rows) == len(want)
    for r in rows:
        total, last = r["sum(chunk_toks)"], r["max(chunk_id)"]
        assert total == want[r.doc_id]
        assert total > last * CHUNK_TOKENS  # all non-final chunks full


def test_packing_fills_sequences(spark, oracle_sf_dir):
    """Concatenate-and-split invariant: within a bucket, the cumulative
    token total through sequence k must land in [(k+1)·B, (k+2)·B) for
    every non-final k — i.e. sequence k+1's first doc starts exactly
    where k's window ends (no gap, no overlap, every window full up to
    one doc of slack). Also: dense seq_ids and no doc lost."""
    import collections

    rows = LOCAL_QUERIES["pipeline_pack_sequences"](
        spark, oracle_sf_dir
    ).collect()
    by_bucket = collections.defaultdict(list)
    for r in rows:
        by_bucket[r.bucket].append(r)
    n_docs = sum(r.n_docs for r in rows)
    # every document must be packed exactly once — derive the expected
    # count from the fixture itself (a regenerated fixture of another
    # size must fail at the data layer, not trip a misleading
    # invariant-violation here)
    from guagua_spark.sources.tables import load_table

    assert n_docs == load_table(spark, oracle_sf_dir, "documents").count()
    for bucket, seqs in by_bucket.items():
        seqs.sort(key=lambda r: r.seq_id)
        assert [s.seq_id for s in seqs] == list(range(len(seqs)))
        prefix = 0
        for k, s in enumerate(seqs):
            prefix += s.seq_toks
            if k < len(seqs) - 1:
                assert (k + 1) * SEQ_TOKENS <= prefix < (k + 2) * SEQ_TOKENS


def test_pack_docs_default_buckets_from_parallelism(spark, oracle_sf_dir):
    """Without an explicit B, pack_docs must scale its window
    parallelism off the cluster (defaultParallelism), not the pinned
    fixture constant — the 100 TB contract."""
    from guagua_spark.operators.packing import pack_docs
    from guagua_spark.sources.tables import load_table

    docs = load_table(spark, oracle_sf_dir, "documents").select(
        "doc_id", "text"
    )
    par = spark.sparkContext.defaultParallelism
    buckets = {r.bucket for r in pack_docs(docs).collect()}
    # md5 % par spreads 500 docs over every bucket w.h.p.
    assert buckets == set(range(par))


def test_semantic_dedup_drops_and_recall(spark, oracle_sf_dir, duck):
    """The dedup must actually drop rows on the fixture, and the
    OR-construction must catch ≥ 50% of the true τ-pairs (the
    analytical recall at τ=0.35 with 8 tables × 4 bits is ≈ 0.7)."""
    import numpy as np

    from guagua_spark.operators.dedup import SEM_TAU, semantic_dedup

    kept = semantic_dedup(spark, oracle_sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert 0 < len(kept) < total, "must drop some rows, not all"

    # true τ-pairs (exact all-pairs, fine at fixture scale)
    rows = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    m = np.array([r[1] for r in rows], dtype=np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = mn @ mn.T
    np.fill_diagonal(cos, -2.0)
    ids = np.array([r[0] for r in rows])
    has_lower_neighbor = {
        int(ids[i])
        for i, j in zip(*np.nonzero(cos >= SEM_TAU))
        if ids[j] < ids[i]
    }
    kept_ids = {r.vec_id for r in kept}
    true_dropped = has_lower_neighbor
    found_dropped = set(ids.tolist()) - kept_ids
    # every dropped row must be a TRUE τ-neighbor casualty (no false
    # positives — cosine is exact on candidates) ...
    assert found_dropped <= true_dropped
    # ... and the LSH candidate generation catches most of them
    assert len(found_dropped) >= 0.5 * len(true_dropped)


def test_chunk_dedup_stats_matches_oracle_and_finds_shared(
    spark, oracle_sf_dir, duck
):
    """Span-level dedup: oracle equality plus a fixture-sanity check
    that cross-document repeated chunks actually exist (near-dup docs
    share verbatim 32-token spans)."""
    df = LOCAL_QUERIES["chunk_dedup_stats"](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["chunk_dedup_stats"])
    assert df.filter("n_shared_chunks > 0").count() > 0


def test_deterministic_shuffle_is_seeded_permutation(spark, oracle_sf_dir):
    """pos is a 0..n−1 permutation; a different seed yields a different
    permutation; the same seed reproduces it exactly; and the plan has
    no Window (global rank without the SinglePartition sort)."""
    from guagua_spark.operators.packing import deterministic_shuffle
    from guagua_spark.sources.tables import load_table

    docs = load_table(spark, oracle_sf_dir, "documents").select("doc_id")
    n = docs.count()
    a = deterministic_shuffle(docs, ["doc_id"], seed="epoch-1")
    rows = {r["doc_id"]: r["pos"] for r in a.collect()}
    assert sorted(rows.values()) == list(range(n))
    again = {
        r["doc_id"]: r["pos"]
        for r in deterministic_shuffle(
            docs, ["doc_id"], seed="epoch-1"
        ).collect()
    }
    assert again == rows
    other = {
        r["doc_id"]: r["pos"]
        for r in deterministic_shuffle(
            docs, ["doc_id"], seed="epoch-2"
        ).collect()
    }
    assert other != rows  # a new epoch is a new permutation
    assert sorted(other.values()) == list(range(n))
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_corpus_shuffle_stable_across_repeated_runs(spark, oracle_sf_dir):
    """Same regression guard as the AUC one: four drains of the
    epoch-0 permutation must be identical (pinned dense ids)."""
    from guagua_spark.operators.packing import LOCAL_QUERIES

    runs = [
        tuple(
            sorted(
                (r["pos"], r["doc_id"])
                for r in LOCAL_QUERIES["corpus_shuffle"](
                    spark, oracle_sf_dir
                ).collect()
            )
        )
        for _ in range(4)
    ]
    assert len(set(runs)) == 1
