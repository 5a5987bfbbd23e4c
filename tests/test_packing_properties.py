"""Property-based checks: chunking, sequence packing, and semantic
dedup vs pure-Python references on randomized inputs.

Few examples, Spark-job-per-example — the value is the randomized edge
cases (empty corpus, 1-token docs, exact-budget docs, zero vectors,
identical vectors), not volume.
"""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from guagua_spark.operators.packing import (
    CHUNK_TOKENS,
    PACK_BUCKETS,
    SEQ_TOKENS,
    chunk_docs,
    pack_docs,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# documents as token counts; text is "t0 t1 t2 ..." so token identity
# is deterministic and md5-checkable
_doc = st.integers(min_value=1, max_value=3 * CHUNK_TOKENS + 1)


def _text(n_toks: int) -> str:
    return " ".join(f"t{i}" for i in range(n_toks))


def _docs_df(spark, sizes):
    return spark.createDataFrame(
        [(i, _text(n)) for i, n in enumerate(sizes)],
        "doc_id long, text string",
    )


@_SETTINGS
@given(sizes=st.lists(_doc, min_size=1, max_size=10))
def test_chunking_matches_reference(spark, sizes):
    got = {
        (r.doc_id, r.chunk_id, r.chunk_toks, r.chunk_md5)
        for r in chunk_docs(_docs_df(spark, sizes)).collect()
    }
    want = set()
    for doc_id, n in enumerate(sizes):
        toks = _text(n).split(" ")
        for k in range(-(-n // CHUNK_TOKENS)):
            piece = toks[k * CHUNK_TOKENS : (k + 1) * CHUNK_TOKENS]
            want.add(
                (
                    doc_id,
                    k,
                    len(piece),
                    hashlib.md5(" ".join(piece).encode()).hexdigest(),
                )
            )
    assert got == want


def _u32_ref(tag: str, key: str) -> int:
    return int(hashlib.md5(f"{tag}|{key}".encode()).hexdigest()[:8], 16)


@_SETTINGS
@given(
    sizes=st.lists(st.integers(1, 2 * SEQ_TOKENS), min_size=1, max_size=12),
    n_buckets=st.sampled_from([1, 3, PACK_BUCKETS, 32]),
)
def test_packing_matches_reference(spark, sizes, n_buckets):
    """The packing rule must match the pure-Python replay at ANY bucket
    count — B is the window-parallelism knob (defaulting from the
    cluster's parallelism at scale) and the (bucket, seq) output is a
    function of B, so per-bucket packing must stay internally
    consistent whatever B a caller picks."""
    got = {
        (r.bucket, r.seq_id, r.n_docs, r.seq_toks, r.id_sum)
        for r in pack_docs(_docs_df(spark, sizes), n_buckets).collect()
    }
    # reference: per bucket, docs in (hash, doc_id) order, capped
    # cumsum, seq = start // B
    by_bucket: dict[int, list] = {}
    for doc_id, n in enumerate(sizes):
        h = _u32_ref("pack", str(doc_id))
        by_bucket.setdefault(h % n_buckets, []).append(
            (h, doc_id, min(n, SEQ_TOKENS))
        )
    want_rows: dict[tuple, list] = {}
    for bucket, docs in by_bucket.items():
        running = 0
        for h, doc_id, n in sorted(docs):
            seq = running // SEQ_TOKENS
            running += n
            key = (bucket, seq)
            want_rows.setdefault(key, [0, 0, 0])
            want_rows[key][0] += 1
            want_rows[key][1] += n
            want_rows[key][2] += doc_id
    want = {
        (b, s, nd, toks, ids)
        for (b, s), (nd, toks, ids) in want_rows.items()
    }
    assert got == want


@_SETTINGS
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(2, 24))
def test_semantic_dedup_matches_reference(spark, seed, n):
    """Random 64-dim integer vectors (plus forced duplicate and zero
    vectors) — kept set must equal the pure-numpy replay of the bucket
    + τ-neighbor rule."""
    from guagua_spark.operators.dedup import (
        SEM_BITS,
        SEM_TABLES,
        SEM_TAU,
        semantic_dedup_df,
    )
    from guagua_spark.operators.similarity import DIM, _planes

    rng = np.random.RandomState(seed)
    vecs = rng.randint(-3, 4, size=(n, DIM)).astype(np.float64)
    vecs[n // 2] = vecs[0]  # force an exact duplicate (cos = 1)
    if n >= 4:
        vecs[1] = 0.0  # zero vector: NaN cosine must never drop a row
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    kept = {r.vec_id for r in semantic_dedup_df(df).collect()}

    planes = _planes(SEM_TABLES, SEM_BITS, "sem")
    flat = planes.reshape(SEM_TABLES * SEM_BITS, DIM).T
    bits = (vecs @ flat) > 0
    weights = 1 << np.arange(SEM_BITS)
    cells = (bits.reshape(n, SEM_TABLES, SEM_BITS) * weights).sum(axis=2)
    # integer-valued vectors ⇒ dots and squared norms are exact
    # integers in doubles (order-independent), and the reference
    # divides by sqrt(n2i·n2j) exactly like cosine_expr — so the τ
    # comparison is bit-identical, no tolerance needed
    import math

    norms2 = (vecs**2).sum(axis=1)
    dropped = set()
    for j in range(n):
        for i in range(j):
            if not (cells[i] == cells[j]).any():
                continue
            denom = math.sqrt(norms2[i] * norms2[j])
            if denom == 0.0:
                continue  # NaN cosine: comparison is false
            if float(vecs[i] @ vecs[j]) / denom >= SEM_TAU:
                dropped.add(j)
                break
    assert kept == set(range(n)) - dropped


@_SETTINGS
@given(sizes=st.lists(st.integers(1, 40), min_size=2, max_size=10))
def test_unigram_logprob_matches_reference(spark, sizes):
    """Unigram LM scoring vs a pure-Python replay on randomized docs
    drawn from a tiny token space (so vocab truncation and OOV paths
    both exercise). Float compare at 1e-9 — the per-doc average sums
    logs in engine partition order."""
    import math

    from guagua_spark.operators.text import (
        OOV_FLOOR,
        VOCAB_K,
        unigram_logprob,
    )
    from guagua_spark.operators import text as text_mod
    from guagua_spark.sources import tables as tables_mod

    # build docs over a 30-token space: "w0".."w29"
    rng_texts = [
        " ".join(f"w{(i * 7 + j * 13) % 30}" for j in range(n))
        for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rng_texts)],
        "doc_id long, text string",
    )
    # route the operator at the in-memory docs: monkeypatch load_table
    orig = tables_mod.load_table
    text_mod.load_table = lambda spark_, sf_, name_: df
    try:
        rows = {r.doc_id: r for r in unigram_logprob(spark, "ignored").collect()}
    finally:
        text_mod.load_table = orig

    # pure-Python reference
    toks = {i: t.split(" ") for i, t in enumerate(rng_texts)}
    tc: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            tc[t] = tc.get(t, 0) + 1
    total = sum(tc.values())
    vocab = dict(
        sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_K]
    )
    for i, ts in toks.items():
        n_oov = sum(1 for t in ts if t not in vocab)
        logs = [
            math.log((vocab.get(t, OOV_FLOOR) if t in vocab else OOV_FLOOR) / total)
            for t in ts
        ]
        want = round(sum(logs) / len(logs), 6)
        r = rows[i]
        assert r.n_tokens == len(ts) and r.n_oov == n_oov
        assert abs(r.avg_logprob - want) <= 1e-6
