"""ANN operators: brute force vs oracle; LSH/IVF recall vs brute force."""

from __future__ import annotations

import pytest

from guagua_spark.operators.similarity import ORACLE_SQL, QUERIES, TOP_K

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ORACLE_SQL[name])


@pytest.fixture(scope="module")
def truth(spark, oracle_sf_dir):
    rows = QUERIES["ann_bruteforce_topk"](spark, oracle_sf_dir).collect()
    return {(r.query_id, r.neighbor_id) for r in rows}


@pytest.mark.parametrize("name", ["ann_lsh_topk", "ann_ivf_topk"])
def test_approx_variants_recall(spark, oracle_sf_dir, truth, name):
    rows = QUERIES[name](spark, oracle_sf_dir).collect()
    found = {(r.query_id, r.neighbor_id) for r in rows}
    # every query answered with k results
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 5
    # approximate methods on random gaussian-ish embeddings: require
    # recall >= 0.4 overall (partition-of-space methods legitimately miss
    # cross-boundary neighbors; the point is the plumbing + determinism)
    recall = len(found & truth) / len(truth)
    assert recall >= 0.4, f"{name} recall {recall}"


@pytest.mark.parametrize("name", ["ann_lsh_topk", "ann_ivf_topk"])
def test_rescoring_stage_matches_oracle(spark, oracle_sf_dir, duck, name):
    """The EXACT part of the approximate paths: given the candidate set
    the Spark pipeline actually generated, DuckDB's rescoring (cosine +
    window top-k) must hash-match the full Spark query output — i.e.
    only candidate GENERATION is approximate, nothing downstream."""
    from guagua_spark.operators.similarity import (
        RESCORE_ORACLE_SQL,
        ivf_candidates,
        lsh_candidates,
    )

    gen = lsh_candidates if name == "ann_lsh_topk" else ivf_candidates
    cand_pdf = gen(spark, oracle_sf_dir).toPandas()
    duck.register("cand", cand_pdf)
    try:
        df = QUERIES[name](spark, oracle_sf_dir)
        # the IVF row carries the balanced-sampling certificate columns
        # (bal_*) on top of the rescore output — certified against the
        # full merged oracle elsewhere; this test pins the rescore stage
        df = df.select("query_id", "neighbor_id", "rank", "cosine")
        assert_matches_oracle(df, duck, RESCORE_ORACLE_SQL)
    finally:
        duck.unregister("cand")


@pytest.mark.parametrize("name", ["ann_lsh_topk", "ann_ivf_topk"])
def test_approx_variants_deterministic(spark, oracle_sf_dir, name):
    a = QUERIES[name](spark, oracle_sf_dir).collect()
    b = QUERIES[name](spark, oracle_sf_dir).collect()
    assert [(r.query_id, r.neighbor_id) for r in a] == [
        (r.query_id, r.neighbor_id) for r in b
    ]


def test_balanced_sample_matches_oracle(spark, oracle_sf_dir, duck):
    from guagua_spark.operators.similarity import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    from oracle import assert_matches_oracle

    assert_matches_oracle(
        LOCAL_QUERIES["embedding_balanced_sample"](spark, oracle_sf_dir),
        duck,
        LOCAL_ORACLE_SQL["embedding_balanced_sample"],
    )


def test_balanced_sample_caps_cells(spark, oracle_sf_dir):
    """Every cell's kept count must respect the budget up to binomial
    noise, and at least one cell must actually be down-sampled."""
    import math

    from guagua_spark.operators.similarity import (
        BALANCE_BUDGET,
        embedding_balanced_sample,
    )

    rows = embedding_balanced_sample(spark, oracle_sf_dir).collect()
    assert any(r.n_kept < r.n_total for r in rows), "must down-sample"
    for r in rows:
        if r.n_total <= BALANCE_BUDGET:
            assert r.n_kept == r.n_total  # sparse cells kept whole
        else:
            sigma = math.sqrt(BALANCE_BUDGET)
            assert r.n_kept <= BALANCE_BUDGET + 4 * sigma + 1


def test_quantize_stats_match_oracle_and_error_bound(
    spark, oracle_sf_dir, duck
):
    """int8 quantization audit vs DuckDB, plus the theoretical
    guarantee: worst reconstruction error ≤ scale/2 (+ float noise)."""
    from guagua_spark.operators.similarity import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    from oracle import assert_matches_oracle

    df = LOCAL_QUERIES["embedding_quantize_stats"](spark, oracle_sf_dir)
    assert_matches_oracle(
        df, duck, LOCAL_ORACLE_SQL["embedding_quantize_stats"]
    )
    for r in df.collect():
        scale = (r["mx"] - r["mn"]) / 255.0 if r["mx"] != r["mn"] else 1.0
        assert r["max_err"] <= scale / 2 * (1 + 1e-9) + 1e-15, r


def test_pq_topk_matches_numpy_replay(spark, oracle_sf_dir):
    """Full-pipeline value oracle for ann_pq_topk: encoding, the ADC
    tables, candidate selection, and the exact rescore are replayed in
    single-process numpy — with the DIRECT squared-distance form where
    the UDF uses the expanded matmul identity, so a formulation bug
    can't hide (same discipline as the quantizer-oracle divergence
    note). No SQL oracle exists for PQ: the codebooks come from the
    sampled driver-side Lloyd loop, shared by construction."""
    import os

    import numpy as np
    import pandas as pd

    from guagua_spark.operators import similarity as sim

    got = [
        (r.query_id, r.rank, r.neighbor_id, r.cosine)
        for r in sim.LOCAL_QUERIES["ann_pq_topk"](
            spark, oracle_sf_dir
        ).collect()
    ]

    df = pd.read_parquet(os.path.join(oracle_sf_dir, "embeddings.parquet"))
    order = np.argsort(df["vec_id"].to_numpy())
    vid = df["vec_id"].to_numpy()[order]
    M = np.stack(df["embedding"].to_numpy()[order]).astype(np.float64)
    dsub = sim.DIM // sim.PQ_M
    sample = M[vid < sim.QUANT_SAMPLE]
    books = np.stack(
        [
            sim._sample_kmeans(sample[:, j * dsub : (j + 1) * dsub], sim.PQ_KS)
            for j in range(sim.PQ_M)
        ]
    )
    codes = np.empty((len(vid), sim.PQ_M), dtype=np.int64)
    for j in range(sim.PQ_M):
        xj = M[:, j * dsub : (j + 1) * dsub]
        codes[:, j] = (
            ((xj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        ).argmin(axis=1)

    want = []
    for qid in range(sim.NUM_QUERIES):
        qv = M[vid == qid][0]
        table = np.stack(
            [
                ((books[j] - qv[j * dsub : (j + 1) * dsub][None, :]) ** 2).sum(
                    axis=1
                )
                for j in range(sim.PQ_M)
            ]
        )
        adist = table[np.arange(sim.PQ_M)[:, None], codes.T].sum(axis=0)
        mask = vid != qid
        cand = sorted(zip(adist[mask], vid[mask]))[: sim.PQ_CAND]
        scored = []
        for _, v in cand:
            x = M[vid == v][0]
            cos = float(
                np.dot(qv, x)
                / (np.linalg.norm(qv) * np.linalg.norm(x))
            )
            scored.append((-cos, v))
        for rnk, (negcos, v) in enumerate(sorted(scored)[: sim.TOP_K], 1):
            want.append((qid, rnk, int(v), -negcos))

    assert [(g[0], g[1], g[2]) for g in got] == [
        (w[0], w[1], w[2]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 1e-9, (g, w)


def test_pq_recall_vs_bruteforce(spark, oracle_sf_dir, truth):
    from guagua_spark.operators.similarity import LOCAL_QUERIES

    rows = LOCAL_QUERIES["ann_pq_topk"](spark, oracle_sf_dir).collect()
    found = {(r.query_id, r.neighbor_id) for r in rows}
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 5
    recall = len(found & truth) / len(truth)
    assert recall >= 0.4, f"ann_pq_topk recall {recall}"


def test_ivfpq_topk_matches_numpy_replay(spark, oracle_sf_dir):
    """Full-pipeline value oracle for the combined IVF-PQ path: coarse
    cell assignment + probing, PQ encoding, ADC over the probed cells
    only, and the exact rescore — all replayed in single-process numpy
    with direct distance forms."""
    import os

    import numpy as np
    import pandas as pd

    from guagua_spark.operators import similarity as sim

    got = [
        (r.query_id, r.rank, r.neighbor_id)
        for r in sim.LOCAL_QUERIES["ann_ivfpq_topk"](
            spark, oracle_sf_dir
        ).collect()
    ]

    df = pd.read_parquet(os.path.join(oracle_sf_dir, "embeddings.parquet"))
    order = np.argsort(df["vec_id"].to_numpy())
    vid = df["vec_id"].to_numpy()[order]
    M = np.stack(df["embedding"].to_numpy()[order]).astype(np.float64)
    sample = M[vid < sim.QUANT_SAMPLE]
    cents = sim._sample_kmeans(sample, sim.IVF_CELLS)
    cells = (
        ((M[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    ).argmin(axis=1)
    dsub = sim.DIM // sim.PQ_M
    books = np.stack(
        [
            sim._sample_kmeans(sample[:, j * dsub : (j + 1) * dsub], sim.PQ_KS)
            for j in range(sim.PQ_M)
        ]
    )
    codes = np.empty((len(vid), sim.PQ_M), dtype=np.int64)
    for j in range(sim.PQ_M):
        xj = M[:, j * dsub : (j + 1) * dsub]
        codes[:, j] = (
            ((xj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        ).argmin(axis=1)

    want = []
    for qid in range(sim.NUM_QUERIES):
        qv = M[vid == qid][0]
        d = np.linalg.norm(cents - qv, axis=1)
        probed = set(np.argsort(d, kind="stable")[: sim.IVF_NPROBE])
        table = np.stack(
            [
                ((books[j] - qv[j * dsub : (j + 1) * dsub][None, :]) ** 2).sum(
                    axis=1
                )
                for j in range(sim.PQ_M)
            ]
        )
        adist = table[np.arange(sim.PQ_M)[:, None], codes.T].sum(axis=0)
        mask = (vid != qid) & np.isin(cells, list(probed))
        cand = sorted(zip(adist[mask], vid[mask]))[: sim.PQ_CAND]
        scored = []
        for _, v in cand:
            x = M[vid == v][0]
            cos = float(
                np.dot(qv, x) / (np.linalg.norm(qv) * np.linalg.norm(x))
            )
            scored.append((-cos, v))
        for rnk, (_, v) in enumerate(sorted(scored)[: sim.TOP_K], 1):
            want.append((qid, rnk, int(v)))
    assert got == want


def test_ivfpq_recall_vs_bruteforce(spark, oracle_sf_dir, truth):
    from guagua_spark.operators.similarity import LOCAL_QUERIES

    rows = LOCAL_QUERIES["ann_ivfpq_topk"](spark, oracle_sf_dir).collect()
    found = {(r.query_id, r.neighbor_id) for r in rows}
    assert len({r.query_id for r in rows}) == 5
    recall = len(found & truth) / len(truth)
    assert recall >= 0.4, f"ann_ivfpq_topk recall {recall}"


def test_pq_topk_matches_sql_oracle(spark, oracle_sf_dir, duck):
    """Round 8: ann_pq_topk's FULL SQL replay (per-subspace Lloyd
    codebooks → corpus encoding → ADC candidate cut → exact rescore)
    — the same CTE blocks the pq_* certificate splices into the
    ann_lsh_topk contract row."""
    from guagua_spark.operators.similarity import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    from oracle import assert_matches_oracle

    assert_matches_oracle(
        LOCAL_QUERIES["ann_pq_topk"](spark, oracle_sf_dir),
        duck,
        LOCAL_ORACLE_SQL["ann_pq_topk"],
    )


def test_ivfpq_topk_matches_sql_oracle(spark, oracle_sf_dir, duck):
    """Round 8: ann_ivfpq_topk's FULL SQL replay — coarse-quantizer
    Lloyd + cell probing composed with the PQ codebook replays, ADC
    over the probed cells only, exact rescore."""
    from guagua_spark.operators.similarity import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    from oracle import assert_matches_oracle

    assert_matches_oracle(
        LOCAL_QUERIES["ann_ivfpq_topk"](spark, oracle_sf_dir),
        duck,
        LOCAL_ORACLE_SQL["ann_ivfpq_topk"],
    )


def test_quant_sample_requires_dense_ids(spark):
    """The quantizer sample's positional numpy init and the oracle's
    value-strided SQL init coincide only on dense 0..n-1 ids — a gapped
    corpus must fail at build time, not flip a contract row."""
    import pytest as _pytest

    from guagua_spark.operators.similarity import _quant_sample

    dense = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    assert _quant_sample(dense).shape == (10, 4)
    gapped = spark.createDataFrame(
        [(i * 2, [float(i)] * 4) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="dense 0..n-1"):
        _quant_sample(gapped)


def test_lsh_sampled_twin_matches_its_oracle(spark, oracle_sf_dir, duck):
    """The round-12 sf>=100 twin for the LSH row (full oracle measured
    1758 s of an 1800 s watchdog at sf100): same planes/bucketing/
    rescore over the md5 vector subset, pq_*/apq_* certificates
    omitted. At the test sf the rate saturates at 1.0, so the twin
    also regression-pins the full LSH interior minus the certs."""
    import importlib

    from oracle import assert_matches_oracle

    entry = importlib.import_module("__spark_entry__")
    fn, sql, rule = entry.sweep_sampled()["ann_lsh_topk"]
    assert "vecsamp" in rule
    df = fn(spark, oracle_sf_dir)
    assert not [c for c in df.columns if c.startswith(("pq_", "apq_"))]
    assert_matches_oracle(df, duck, sql, rtol=1e-6)


def test_quantize_rows_memo_cert_only(spark, sf_dir):
    """Round 14 redraws the round-13 memo line (VERDICT item 7): the
    LOCAL entry embedding_quantize_stats RECOMPUTES its audit relation
    per call (its lane must time operator work, not a cache read —
    the rows are the query's own output), while the qnt_* certificate
    aggregate keeps the session memo (built once, attributed as
    ``_index:quantize_rows``, session-only — never served across
    processes). Values from the two paths are identical."""
    from guagua_spark.metrics import drain_index_builds
    from guagua_spark.operators import similarity as sim

    sim.clear_caches()
    drain_index_builds()
    first = sorted(
        map(tuple, sim.embedding_quantize_stats(spark, sf_dir).collect())
    )
    # the LOCAL entry must NOT build (or be served by) the memo
    assert not drain_index_builds(), "LOCAL entry touched the memo"
    cert = sim.quantize_cert_df(spark, sf_dir).collect()
    built = drain_index_builds()
    assert "_index:quantize_rows" in built, built
    assert cert[0]["qnt_rows"] == len(first) > 0
    cert2 = sim.quantize_cert_df(spark, sf_dir).collect()
    assert not drain_index_builds(), "cert aggregate rebuilt the relation"
    assert cert2 == cert
    # memoized cert rows aggregate the same relation the entry computes
    qsum = sum(r[3] for r in first)
    assert cert[0]["qnt_code_sum"] == qsum
    sim.clear_caches()
    again = sorted(
        map(tuple, sim.embedding_quantize_stats(spark, sf_dir).collect())
    )
    assert again == first
