"""Dedup operators vs DuckDB oracle + LSH recall vs the all-pairs truth."""

from __future__ import annotations

import pytest

from guagua_spark.operators.dedup import ORACLE_SQL, QUERIES

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_dedup_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ORACLE_SQL[name])


def test_minhash_finds_near_dups(spark, oracle_sf_dir):
    """The data contains true near-dup pairs (shingle jaccard ≈ 0.99);
    LSH must surface them."""
    pairs = QUERIES["dedup_minhash_pairs"](spark, oracle_sf_dir).collect()
    assert len(pairs) > 0
    assert all(p.jaccard >= 0.5 for p in pairs)


def test_lsh_recall_vs_allpairs(spark, oracle_sf_dir):
    """Every (well-separated) true pair should be found by LSH: with
    b=6,r=2 the miss probability at j≥0.8 is (1−j²)⁶ < 0.3% per pair."""
    truth = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, oracle_sf_dir)
        .filter("jaccard >= 0.8")
        .collect()
    }
    found = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_pairs"](spark, oracle_sf_dir).collect()
    }
    assert truth, "fixture should contain high-jaccard pairs"
    missed = truth - found
    assert not missed, f"LSH missed {len(missed)}/{len(truth)}: {missed}"


def test_ngram_jaccard_hot_shingle_adversarial(spark):
    """A shingle present in EVERY doc must not blow up the prefix join:
    with df-ordered (rarest-first) prefixes the hot shingle sits at the
    end of every doc's ordering and outside every prefix here. The
    result must still equal the naive all-pairs truth."""
    import pytest as _pytest

    from guagua_spark.operators.dedup import ngram_jaccard_pairs_for

    docs = []
    for i in range(40):
        # the "aa bb cc" shingle is common to all docs; tails are unique
        docs.append((i, " ".join(["aa", "bb", "cc"] + [f"w{i}x{j}" for j in range(8)])))
    docs.append((100, "aa bb cc dd ee ff gg"))
    docs.append((101, "aa bb cc dd ee ff gg hh"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs_for(df, 8).collect()
    }

    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    truth = {}
    for i, (ida, ta) in enumerate(docs):
        for idb, tb in docs[i + 1 :]:
            a, b = shingles(ta), shingles(tb)
            j = len(a & b) / len(a | b)
            if j >= 0.5:
                truth[(min(ida, idb), max(ida, idb))] = j
    assert truth, "fixture must contain at least one true pair"
    assert set(got) == set(truth)
    for k, v in truth.items():
        assert got[k] == _pytest.approx(v)


def test_embedding_pairs_tiling_invariant(spark):
    """The block-tiled all-pairs matmul must return identical pairs
    regardless of block count — the tiling is a pure execution detail.
    (The testdata embeddings contain no cos ≥ 0.95 pairs, so build a
    corpus with planted near-dups: base vectors + tiny perturbations.)"""
    import random

    from guagua_spark.operators.dedup import embedding_pairs_for

    rng = random.Random(7)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i * 2, base))
        # id 2i+1 is a near-dup of 2i; every third pair is far instead
        if i % 3:
            rows.append((i * 2 + 1, [x + rng.uniform(-1e-3, 1e-3) for x in base]))
        else:
            rows.append((i * 2 + 1, [rng.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one = embedding_pairs_for(emb, block_rows=1_000_000).collect()
    tiled = embedding_pairs_for(emb, block_rows=25).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in tiled]
    assert len(one) >= 30  # the planted near-dups must all surface


def test_connected_components_chain_and_island(spark):
    """Min-label propagation must traverse a 5-node chain (diameter 4 >
    one propagation round — exercises the fixpoint loop) and keep a
    disjoint island separate."""
    from guagua_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "a long, b long"
    )
    got = {
        (r.node, r.label)
        for r in connected_components(pairs, "a", "b").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1), (10, 10), (11, 10)}


def test_simhash_near_dups_have_close_hashes(spark, oracle_sf_dir):
    """Hamming distance of simhashes for a true near-dup pair is small."""
    near = QUERIES["dedup_ngram_jaccard"](spark, oracle_sf_dir).filter(
        "jaccard >= 0.9"
    ).collect()
    if not near:
        pytest.skip("no jaccard>=0.9 pairs at this sf")
    sims = {
        r.doc_id: r.simhash
        for r in QUERIES["dedup_simhash"](spark, oracle_sf_dir).collect()
    }
    a, b = near[0].doc_a, near[0].doc_b
    ham = bin((sims[a] ^ sims[b]) & (2**64 - 1)).count("1")
    assert ham <= 12, f"hamming {ham} too large for near-dup pair"


def test_clusters_prop_matches_oracle(spark, oracle_sf_dir, duck):
    """The propagation path must reproduce dedup_clusters (which runs
    the star interior in the contract) against the same recursive-CTE
    oracle — both interiors stay certified."""
    from guagua_spark.operators.dedup import LOCAL_ORACLE_SQL, LOCAL_QUERIES

    assert_matches_oracle(
        LOCAL_QUERIES["dedup_clusters_prop"](spark, oracle_sf_dir),
        duck,
        LOCAL_ORACLE_SQL["dedup_clusters_prop"],
    )


def test_pair_cache_invalidates_on_fingerprint_change(spark, oracle_sf_dir):
    """The session pair-graph memo must rebuild when the documents
    table fingerprint changes (regenerated data under the same path),
    and must serve the same DataFrame object on a clean hit."""
    from unittest import mock

    from guagua_spark.operators import dedup

    dedup.clear_caches()
    try:
        a = dedup._minhash_pair_df(spark, oracle_sf_dir)
        b = dedup._minhash_pair_df(spark, oracle_sf_dir)
        assert a is b, "clean hit must not rebuild"
        with mock.patch(
            "guagua_spark.sources.tables.table_fingerprint",
            return_value=("changed", 0, 0),
        ):
            c = dedup._minhash_pair_df(spark, oracle_sf_dir)
        assert c is not a, "fingerprint change must rebuild"
    finally:
        dedup.clear_caches()


@pytest.mark.parametrize(
    "name",
    sorted(
        __import__(
            "guagua_spark.operators.dedup", fromlist=["LOCAL_ORACLE_SQL"]
        ).LOCAL_ORACLE_SQL
    ),
)
def test_local_queries_match_oracle(spark, oracle_sf_dir, duck, name):
    """Every LOCAL dedup query vs its oracle — auto-covers new entries."""
    from guagua_spark.operators.dedup import LOCAL_ORACLE_SQL, LOCAL_QUERIES

    assert_matches_oracle(
        LOCAL_QUERIES[name](spark, oracle_sf_dir),
        duck,
        LOCAL_ORACLE_SQL[name],
    )


def test_incremental_dedup_flags_known_documents(spark, oracle_sf_dir):
    """The synthetic corpus carries exact duplicates across the id
    split, so the incremental pass must flag at least one new doc, and
    every flagged doc's best match must be at or above the Jaccard
    threshold with dup_of strictly on the old side."""
    from guagua_spark.operators.dedup import (
        INC_SPLIT,
        JACCARD_THRESHOLD,
        dedup_incremental,
    )

    rows = dedup_incremental(spark, oracle_sf_dir).collect()
    assert rows, "must flag at least one incoming near-dup"
    for r in rows:
        assert r.doc_id >= INC_SPLIT and r.dup_of < INC_SPLIT
        assert r.best_jaccard >= JACCARD_THRESHOLD


@pytest.mark.parametrize(
    "name", ["dedup_ngram_jaccard", "dedup_embedding_pairs"]
)
def test_sampled_sweep_twins_match_their_oracles(
    spark, oracle_sf_dir, duck, name
):
    """The scale-feasible sweep twins (fixed-TARGET md5-selected
    subsets) must match their own oracles. At the small test sf the
    rate saturates at 1.0 (twin == full run); the subset arithmetic is
    pinned separately below."""
    from guagua_spark.operators.dedup import SWEEP_SAMPLED

    fn, sql, rule = SWEEP_SAMPLED[name]
    assert "samp" in rule
    assert_matches_oracle(fn(spark, oracle_sf_dir), duck, sql)


def test_sampled_twin_rate_rule_is_engine_identical(duck):
    """rate = min(1, target/count): the Python double and the DuckDB
    LEAST/division must agree bit-for-bit, and the u32 threshold rule
    must keep a nonempty strict subset once count > target."""
    from guagua_spark.operators.dedup import NGRAM_SAMPLE_TARGET

    for n in (499, 5_000, 50_000, 500_000, 7_777_777):
        py_rate = min(1.0, NGRAM_SAMPLE_TARGET / max(n, 1))
        (sql_rate,) = duck.execute(
            f"SELECT LEAST(1.0, {float(NGRAM_SAMPLE_TARGET)!r}"
            f" / GREATEST({n}, 1))"
        ).fetchone()
        assert py_rate == sql_rate, (n, py_rate, sql_rate)
    # strict-subset behavior at a corpus larger than the target
    n_kept = duck.execute(
        "SELECT COUNT(*) FROM (SELECT unnest(range(50000)) AS doc_id)"
        " WHERE CAST(('0x' || substr(md5('ngsamp' || '|' ||"
        " CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)"
        f" < 0.1 * 4294967296.0"
    ).fetchone()[0]
    assert 0 < n_kept < 50000 and abs(n_kept - 5000) < 500


def test_edit_verified_pairs_tiny_graph(spark):
    """Two docs one character apart verify at edit_dist 1; an unrelated
    doc never pairs (different shingles → different buckets; even a
    band collision would fail the tau verify)."""
    from guagua_spark.operators.dedup import edit_verified_pairs

    base = "the quick brown fox jumps over the lazy dog again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("dog", "dot")),
            (3, "colorless green ideas sleep furiously under warm rain"),
        ],
        "doc_id long, text string",
    )
    rows = edit_verified_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"], r["edit_dist"]) for r in rows] == [
        (1, 2, 1)
    ]


def test_edit_pairs_within_tau_and_below_candidates(spark, oracle_sf_dir):
    """Every verified pair is ≤ EDIT_TAU, and the verify genuinely
    prunes (the corpus has band collisions at distance ≫ tau)."""
    from guagua_spark.operators.dedup import EDIT_TAU, LOCAL_QUERIES

    rows = LOCAL_QUERIES["dedup_edit_pairs"](spark, oracle_sf_dir).collect()
    assert rows, "synthetic corpus plants near-dups"
    assert all(0 <= r["edit_dist"] <= EDIT_TAU for r in rows)
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


def test_edit_clusters_cover_exactly_the_pair_nodes(spark, oracle_sf_dir):
    """Every doc in ≥1 verified edit pair gets exactly one entity
    label; the label is the component minimum (≤ the doc's own id);
    and both endpoints of every pair share a label (transitive
    resolution)."""
    from guagua_spark.operators.dedup import LOCAL_QUERIES

    pairs = LOCAL_QUERIES["dedup_edit_pairs"](spark, oracle_sf_dir).collect()
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in LOCAL_QUERIES["dedup_edit_clusters"](
            spark, oracle_sf_dir
        ).collect()
    }
    nodes = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    assert set(labels) == nodes
    assert all(lbl <= d for d, lbl in labels.items())
    assert all(labels[p["doc_a"]] == labels[p["doc_b"]] for p in pairs)


@pytest.mark.parametrize(
    "name",
    [
        "dedup_exact_stats",
        "dedup_minhash_pairs",
        "dedup_clusters",
        "lr_train",
        "kmeans_train",
        "nn_train_gd",
        "pipeline_clean_corpus",
        "events_sessionize",
        "events_asof_purchase",
        "text_tfidf_top_terms",
        "multimodal_frame_sample",
    ],
)
def test_round11_sampled_twins_match_their_oracles(
    spark, oracle_sf_dir, duck, name
):
    """The sf100 twins added in round 11 (md5-subset engine trainers,
    MinHash pairs/clusters, the clean-corpus composition) must match
    their own oracles. At the small test sf the rate saturates at 1.0,
    so each twin also regression-pins the full operator's interior."""
    import importlib

    entry = importlib.import_module("__spark_entry__")
    fn, sql, rule = entry.sweep_sampled()[name]
    assert "samp" in rule
    assert_matches_oracle(fn(spark, oracle_sf_dir), duck, sql, rtol=1e-6)
