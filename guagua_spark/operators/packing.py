"""Sequence construction for LLM training: fixed-token document
chunking and deterministic greedy sequence packing.

These are the two steps between a cleaned corpus and a training run
(reference has nothing like them — beyond-reference extension layer,
SURVEY.md §7 phase 4):

- **chunking** splits every document into fixed-token-budget pieces
  (the "context-length split" step). Pure map-side: one codegen'd pass
  of split + per-chunk slice/join, no shuffle except the presentation
  sort. The explode factor is bounded by doc_tokens/CHUNK_TOKENS, so a
  100 TB corpus chunks in one scan with no skew hazard (a giant doc
  fans out to many rows of the SAME task; downstream repartition
  spreads them).

- **packing** assigns documents to fixed-budget training sequences by
  the concatenate-and-split rule (the GPT-style data loader): order
  docs by a deterministic md5 hash (the "global shuffle" a training
  run wants, reproducible engine-to-engine), take a running token
  cumsum, and place each doc in the sequence containing its start
  offset, ``seq = floor((cumsum − n_toks) / SEQ_TOKENS)``.

  100 TB design: a single global window would funnel the corpus
  through ONE sort partition — instead the hash's low bits split docs
  into PACK_BUCKETS independent streams and the window partitions by
  bucket (the same per-(key, coarse-bucket) decomposition as
  functions/scale.py's hot-key escapes), so the cumsum runs as
  PACK_BUCKETS parallel sorted partitions and sequence ids are
  (bucket, seq-within-bucket) pairs. Buckets scale with the cluster
  (thousands at real scale); each stream's packing stays exactly
  reproducible because membership and order derive from md5(doc_id),
  not from partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# the shared deterministic uniform hash, imported from its home module
# (not via operators.pipeline — pipeline's oracle splices this module's
# CTE blocks, and a top-level import in both directions would make the
# module init order matter)
from guagua_spark.functions.scale import u32_hash as _u32
from guagua_spark.sources.tables import load_table

CHUNK_TOKENS = 32
SEQ_TOKENS = 256
#: bucket count PINNED BY THE CONTRACT ROWS + their DuckDB oracles
#: (text_token_counts' pack columns, pipeline_pack_sequences, the
#: training-set build). Library callers should NOT inherit this
#: fixture-scale constant: pack_docs defaults its bucket count from
#: defaultParallelism, and at 100 TB the right B is thousands (each
#: bucket is one sorted window partition carrying ~1/B of the corpus).
#: NB the output is a FUNCTION of B — membership derives from
#: md5(doc_id) % B — so two runs only reproduce each other at equal B.
PACK_BUCKETS = 8


def chunk_docs(docs: DataFrame, ordered: bool = True) -> DataFrame:
    """Core chunking transform over a (doc_id, text) DataFrame — one
    row per (doc, fixed-token chunk): chunk ordinal, token count, and
    the md5 of the reassembled chunk text (binds the VALUE of every
    chunk, not just its size, into the oracle comparison).
    ``ordered=False`` skips the presentation sort (required on an
    unbounded stream — streaming/stream_ops.streaming_doc_chunks)."""
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK_TOKENS)))
    chunked = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_id"
        ),
    )
    piece = F.slice(
        F.col("toks"), F.col("chunk_id") * CHUNK_TOKENS + 1, CHUNK_TOKENS
    )
    out = chunked.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(piece).alias("chunk_toks"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )
    return out.orderBy("doc_id", "chunk_id") if ordered else out


def pipeline_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token chunking of the documents table (see chunk_docs)."""
    return chunk_docs(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


def chunk_certificate_cols(text_col: str = "text"):
    """Per-doc chunk certificate WITHOUT the explode: (chunk count,
    Σ u32(chunk_md5)) — the md5 expression is chunk_docs' own (slice →
    array_join → md5), so the sum binds the VALUE of every chunk into a
    doc-grain column pair and the chunking operator certifies inside a
    per-doc contract row (text_token_counts; the exploded per-chunk
    form stays in LOCAL_QUERIES under the 50-slot cap). Pure map-side
    transform + aggregate — zero shuffle, rides any existing scan."""
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK_TOKENS))).cast(
        "bigint"
    )
    md5s = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda c: F.md5(
            F.array_join(
                F.slice(toks, c * CHUNK_TOKENS + 1, CHUNK_TOKENS), " "
            )
        ),
    )
    hash_sum = F.aggregate(
        md5s,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.conv(F.substring(x, 1, 8), 16, 10).cast("bigint"),
    )
    return n_chunks, hash_sum


def sql_chunk_certificate(text_col: str = "text") -> tuple[str, str]:
    """DuckDB replay of chunk_certificate_cols — (n_chunks expr,
    hash-sum expr) over the same slice/join/md5 chunk values."""
    toks = f"string_split({text_col}, ' ')"
    n = f"CAST(ceil(len({toks}) / {float(CHUNK_TOKENS)!r}) AS BIGINT)"
    piece = (
        f"array_to_string({toks}[c * {CHUNK_TOKENS} + 1 : "
        f"LEAST((c + 1) * {CHUNK_TOKENS}, len({toks}))], ' ')"
    )
    hash_sum = (
        f"CAST(list_sum(list_transform(range({n}), "
        f"c -> CAST(('0x' || substr(md5({piece}), 1, 8)) AS UBIGINT))) "
        "AS BIGINT)"
    )
    return n, hash_sum


def _chunks_ctes(source: str = "documents") -> str:
    """``t`` → ``c`` CTE block + shared final SELECT (below) replaying
    chunk_docs over any (doc_id, text) source — the standalone oracle
    uses ``documents``, the incremental-chunks oracle (pipeline.py)
    splices a diff-derived ``todo`` relation."""
    return f"""t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM {source}
),
c AS (
  SELECT doc_id, toks,
         unnest(range(CAST(ceil(len(toks) / {float(CHUNK_TOKENS)!r})
                           AS BIGINT))) AS chunk_id
  FROM t
)"""


#: per-chunk row expressions over the ``c`` relation — shared by the
#: ordered standalone select and the rch_* certificate rollup
#: (pipeline._diff_cert_ctes), so the two can't drift
_CHUNKS_ROW_EXPRS = f"""doc_id, chunk_id,
       CAST(len(toks[chunk_id * {CHUNK_TOKENS} + 1 :
                LEAST((chunk_id + 1) * {CHUNK_TOKENS}, len(toks))])
            AS INT) AS chunk_toks,
       md5(array_to_string(
             toks[chunk_id * {CHUNK_TOKENS} + 1 :
                  LEAST((chunk_id + 1) * {CHUNK_TOKENS}, len(toks))],
             ' ')) AS chunk_md5"""

_CHUNKS_SELECT = f"""SELECT {_CHUNKS_ROW_EXPRS}
FROM c ORDER BY doc_id, chunk_id"""


def _chunks_oracle(source: str = "documents") -> str:
    return f"WITH {_chunks_ctes(source)}\n{_CHUNKS_SELECT}".strip()


def pack_assignment(doc_id_col, raw_toks_col, n_buckets: int = PACK_BUCKETS):
    """THE packing rule as three columns (bucket, seq_id, capped token
    count) over a doc-grain relation — single definition shared by
    pack_docs and the ``text_token_counts`` contract row's
    certification columns so the two can never drift. ``raw_toks_col``
    is the uncapped whitespace token count; docs over the budget are
    capped at SEQ_TOKENS (a real pipeline chunks them first).

    ``n_buckets`` is the window-parallelism knob: each bucket is one
    independently-sorted window partition holding ~1/B of the corpus,
    and the (bucket, seq_id) output is a function of B (membership is
    md5(doc_id) % B). The default pins the oracle-replayable fixture
    constant; scale callers should come through pack_docs, which
    defaults B from the cluster's parallelism."""
    h = _u32("pack", doc_id_col.cast("string"))
    bucket = h % n_buckets
    capped = F.least(raw_toks_col, F.lit(SEQ_TOKENS))
    w = (
        Window.partitionBy(bucket)
        .orderBy(h, doc_id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(capped).over(w)
    seq = F.floor((running - capped) / F.lit(float(SEQ_TOKENS)))
    return bucket.cast("bigint"), seq, capped


def pack_docs(docs: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Core packing transform over a (doc_id, text) DataFrame —
    per-sequence packing stats: how many docs and tokens each
    fixed-budget training sequence receives under the deterministic
    concatenate-and-split rule. ``id_sum`` binds WHICH docs landed in
    each sequence, not just how many.

    ``n_buckets`` defaults to the session's defaultParallelism (one
    sorted window partition per core; at 1000 executors that is
    thousands of independent streams — the scale-correct default).
    Pass an explicit B to reproduce a specific packing: the contract
    rows pin ``PACK_BUCKETS`` so their DuckDB oracles can replay the
    assignment; per-bucket packing is internally consistent at ANY B
    (property-tested across several values in
    tests/test_packing_properties.py)."""
    if n_buckets is None:
        n_buckets = docs.sparkSession.sparkContext.defaultParallelism
    raw = F.size(F.split(F.col("text"), " "))
    bucket, seq, capped = pack_assignment(F.col("doc_id"), raw, n_buckets)
    placed = docs.select(
        "doc_id",
        bucket.alias("bucket"),
        seq.alias("seq_id"),
        capped.alias("n_toks"),
    )
    return (
        placed.groupBy("bucket", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("seq_toks"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("bucket", "seq_id")
    )


def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing of the documents table (see
    pack_docs). Pins B=PACK_BUCKETS — the oracle replays that B."""
    return pack_docs(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        n_buckets=PACK_BUCKETS,
    )


def _pack_ctes(source: str = "documents") -> str:
    """``base`` → ``placed`` CTE block replaying pack_docs over any
    (doc_id, text) source relation — shared by the standalone oracle
    and the clean-corpus training-set build."""
    u32 = (
        "CAST(('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 8))"
        " AS UBIGINT)"
    )
    return f"""base AS (
  SELECT doc_id,
         LEAST(len(string_split(text, ' ')), {SEQ_TOKENS}) AS n_toks,
         {u32} AS h,
         {u32} % {PACK_BUCKETS} AS bucket
  FROM {source}
),
placed AS (
  SELECT bucket, doc_id, n_toks,
         SUM(n_toks) OVER (PARTITION BY bucket ORDER BY h, doc_id
                           ROWS UNBOUNDED PRECEDING) AS running
  FROM base
)"""


_PACK_SELECT = f"""
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(FLOOR((running - n_toks) / {float(SEQ_TOKENS)!r}) AS BIGINT)
         AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS seq_toks,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM placed
GROUP BY 1, 2 ORDER BY 1, 2
""".strip()


def _pack_oracle() -> str:
    return f"WITH {_pack_ctes()}\n{_PACK_SELECT}"


def pipeline_build_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end training-set build, one plan: quality filter →
    LSH near-dup removal (cluster representatives kept) → deterministic
    sequence packing of the surviving corpus — i.e. what a real
    pipeline runs between raw documents and a training run, composed
    from the same shared subtrees the standalone operators certify
    (_clean_docs from the clean-corpus rollup, pack_docs from the
    packing operator; the DuckDB oracle splices the same two CTE
    blocks). Scale properties are inherited: predicate at the scan, LSH
    on survivors, broadcast drop-list, salt-bucketed packing windows."""
    from guagua_spark.operators.pipeline import _clean_docs

    clean, filtered = _clean_docs(spark, sf_dir)
    out = pack_docs(
        clean.select("doc_id", "text"), n_buckets=PACK_BUCKETS
    ).localCheckpoint(eager=True)
    filtered.unpersist()
    return out


def _build_training_set_oracle() -> str:
    from guagua_spark.operators.pipeline import _pipeline_oracle

    clean_ctes = _pipeline_oracle().split("\nrates AS")[0].rstrip().rstrip(",")
    assert clean_ctes.startswith("WITH RECURSIVE") and "clean AS" in clean_ctes
    return f"{clean_ctes},\n{_pack_ctes(source='clean')}\n{_PACK_SELECT}"


#: oracle-tested locally (tests/test_packing.py), not in the 50-slot
#: driver contract
LOCAL_QUERIES = {
    "pipeline_doc_chunks": pipeline_doc_chunks,
    "pipeline_pack_sequences": pipeline_pack_sequences,
    "pipeline_build_training_set": pipeline_build_training_set,
}

LOCAL_ORACLE_SQL = {
    "pipeline_doc_chunks": _chunks_oracle(),
    "pipeline_pack_sequences": _pack_oracle(),
    "pipeline_build_training_set": _build_training_set_oracle(),
}


def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUB-DOCUMENT (span-level) dedup signal: per document, how many
    of its fixed-token chunks also appear verbatim in ANOTHER document
    — the paragraph-dedup analogue on deterministic chunk boundaries
    (real pipelines drop or rewrite spans shared across many docs:
    boilerplate headers, licenses, templated passages that whole-doc
    dedup never catches).

    Plan: chunk explode (map-side) → per-md5 (min_doc, max_doc)
    partial-aggregated groupBy — a chunk appears in ≥2 DISTINCT docs
    iff min ≠ max, and the partial agg collapses a corpus-hot chunk to
    one row per map task (a window over the md5 would funnel the hot
    chunk's rows through one sort task — the window-family hazard) —
    → join back on the 16-byte md5 → per-doc rollup.

    Skew guard on the join-back: occurrences are pre-aggregated to ONE
    row per (doc_id, chunk_md5) before probing ``spread``, so a
    corpus-hot chunk (a license paragraph in millions of docs) fans in
    at most #docs rows — never #occurrences — and both that aggregate
    and the join hash on chunk_md5, so the exchange is reused. Verified
    against an every-doc-shares-one-chunk corpus in
    tests/test_packing.py."""
    from pyspark.sql import functions as F

    chunks = chunk_docs(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        ordered=False,
    ).select("doc_id", "chunk_md5")
    spread = chunks.groupBy("chunk_md5").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("shared")
    )
    per_doc = chunks.groupBy("doc_id", "chunk_md5").agg(
        F.count(F.lit(1)).alias("occ")
    )
    return (
        per_doc.join(spread, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.sum("occ").alias("n_chunks"),
            F.sum(F.when(F.col("shared"), F.col("occ")).otherwise(0)).alias(
                "n_shared_chunks"
            ),
        )
        .withColumn(
            "shared_ratio",
            F.round(F.col("n_shared_chunks") / F.col("n_chunks"), 6),
        )
        .orderBy("doc_id")
    )


def _chunk_dedup_ctes(source: str = "documents") -> str:
    """``cdt`` → ``cd_doc`` CTE block replaying chunk_dedup_stats'
    per-doc rollup over any (doc_id, text) source — shared by the
    standalone oracle and the text_token_counts certificate splice."""
    return f"""cdt AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM {source}
),
cdc AS (
  SELECT doc_id, toks,
         unnest(range(CAST(ceil(len(toks) / {float(CHUNK_TOKENS)!r})
                           AS BIGINT))) AS k
  FROM cdt
),
cdh AS (
  SELECT doc_id,
         md5(array_to_string(
               toks[k * {CHUNK_TOKENS} + 1 :
                    LEAST((k + 1) * {CHUNK_TOKENS}, len(toks))], ' ')) AS m
  FROM cdc
),
cd_spread AS (
  SELECT m, MIN(doc_id) <> MAX(doc_id) AS shared FROM cdh GROUP BY m
),
cd_doc AS (
  SELECT cdh.doc_id, COUNT(*) AS n_chunks,
         CAST(SUM(CASE WHEN s.shared THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_chunks
  FROM cdh JOIN cd_spread s ON s.m = cdh.m
  GROUP BY cdh.doc_id
)"""


def _chunk_dedup_oracle() -> str:
    return f"""
WITH {_chunk_dedup_ctes()}
SELECT doc_id, n_chunks, n_shared_chunks,
       ROUND(CAST(n_shared_chunks AS DOUBLE) / n_chunks, 6)
         AS shared_ratio
FROM cd_doc ORDER BY doc_id
""".strip()


def sql_chunk_dedup_cert_cte(source: str = "documents") -> str:
    """CTE block ending in ``cd_cert`` — the 1-row integer certificate
    of chunk_dedup_stats (corpus shared-occurrence total, count of docs
    holding any shared chunk, doc_id-weighted shared-occurrence sum —
    the weighting binds WHICH doc carries WHICH shared count)."""
    return f"""{_chunk_dedup_ctes(source)},
cd_cert AS (
  SELECT CAST(SUM(n_shared_chunks) AS BIGINT) AS cds_shared_total,
         CAST(SUM(CASE WHEN n_shared_chunks > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS cds_docs_shared,
         CAST(SUM(doc_id * n_shared_chunks) AS BIGINT) AS cds_id_wsum
  FROM cd_doc
)"""


LOCAL_QUERIES["chunk_dedup_stats"] = chunk_dedup_stats
LOCAL_ORACLE_SQL["chunk_dedup_stats"] = _chunk_dedup_oracle()


#: epoch tag folded into the shuffle hash — a new seed is a new
#: independent permutation (epoch reshuffling), same engine, same code
SHUFFLE_SEED = "epoch-0"


def deterministic_shuffle(
    df: DataFrame,
    key_cols: list[str],
    seed: str = SHUFFLE_SEED,
    n_partitions: int | None = None,
) -> DataFrame:
    """Seeded TOTAL-ORDER corpus shuffle: adds ``pos`` = the row's rank
    in the md5(seed:key) permutation — the "shuffle the corpus before
    training, reproducibly" step (epoch reshuffles = new seed).

    Pack_docs' bucketed hash order randomizes WITHIN streams; this is
    the stronger primitive a sharded training-data writer needs: one
    explicit global position per row, stable across engines and
    cluster layouts because it derives only from (seed, key).

    100 TB plan — no SinglePartition anywhere: range-repartition on the
    hash (the TeraSort shape: a driver-side boundary sample, then a
    fully parallel range exchange) + in-partition sort gives global
    hash order across ordered partitions; dense ids turn that into
    ranks via per-partition counts + a driver prefix sum (no second
    data shuffle — functions/scale.assign_dense_ids). A
    row_number() OVER (ORDER BY hash) window would sort the corpus in
    ONE task. Hash ties are impossible for distinct keys (md5) and
    harmless for duplicate keys (any tie order yields a valid
    permutation of identical rows)."""
    from guagua_spark.functions.scale import assign_dense_ids

    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    # NOT concat_ws: it silently SKIPS null columns, so ('x', NULL) and
    # (NULL, 'x') would hash identically and their positions would then
    # depend on shuffle arrival order — the exact nondeterminism this
    # helper exists to rule out. Each key is null-coalesced to a \x00
    # sentinel (outside any normal key alphabet) so null keys stay
    # deterministic and distinct from empty strings.
    parts = [F.lit(seed)]
    for c in key_cols:
        parts.append(F.lit(":"))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00")))
    h = F.md5(F.concat(*parts))
    ordered = (
        df.withColumn("__shuffle_h", h)
        .repartitionByRange(n, "__shuffle_h")
        .sortWithinPartitions("__shuffle_h")
    )
    # pin=True is REQUIRED: repartitionByRange's boundary sampling
    # depends on the child's row arrival order, which can differ
    # between assign_dense_ids' two jobs and yield duplicate/gapped
    # positions (observed on the AUC twin of this pattern) — the pin
    # materializes one layout for both jobs
    return assign_dense_ids(ordered, "pos", pin=True).drop("__shuffle_h")


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query entry: the epoch-0 permutation of the documents table as
    (pos, doc_id) — oracle = ROW_NUMBER over the same md5 order."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, ["doc_id"]).select("pos", "doc_id")


def _corpus_shuffle_oracle() -> str:
    return f"""
SELECT CAST(ROW_NUMBER() OVER (
         ORDER BY md5('{SHUFFLE_SEED}:' || CAST(doc_id AS VARCHAR))
       ) - 1 AS BIGINT) AS pos,
       doc_id
FROM documents
""".strip()


LOCAL_QUERIES["corpus_shuffle"] = corpus_shuffle
LOCAL_ORACLE_SQL["corpus_shuffle"] = _corpus_shuffle_oracle()
