"""Deduplication operators over ``documents`` — exact, MinHash+LSH,
n-gram Jaccard, SimHash, embedding-cosine near-dup.

Design for 100 TB:
- exact dedup groups by a 128-bit fingerprint (md5), never by full text —
  the shuffle moves 16-byte keys + ids, not documents;
- MinHash-LSH is the scale path for near-dup: cost is O(n·k) signature
  computation (one pass, codegen'd) + a shuffle on (band, band_hash)
  whose buckets are tiny by construction; only candidates within a
  bucket are verified with true Jaccard — never an n² cross join;
- the all-pairs n-gram Jaccard operator is the small-data oracle used to
  validate LSH recall; at scale you'd only ever run the LSH path;
- SimHash shows the sanctioned escape hatch: per-bit majority votes
  don't fit built-ins cleanly, so it's an Arrow-batched mapInPandas;
- embedding-cosine near-dup reuses the explicit arithmetic pattern
  (plan literals, no UDF) shared with operators/similarity.

MinHash here is the salted-hash variant: component j of a signature is
``min over shingles of md5(j || '|' || shingle)`` — one independent
uniform permutation per salt, reproducible in any engine with md5
(which is exactly what makes the full LSH pipeline oracle-checkable in
DuckDB, a property a seeded xxhash64 implementation wouldn't have).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from guagua_spark.functions.supersteps import dataframe_supersteps
from guagua_spark.sources.tables import load_table

SHINGLE_WIDTH = 3
NUM_HASHES = 12
LSH_BANDS = 6  # × LSH_ROWS = NUM_HASHES
LSH_ROWS = 2
JACCARD_THRESHOLD = 0.5


# -- shared shingle/signature expressions -----------------------------------


def shingles_col(text_col: str = "text") -> Column:
    """Distinct word-3-gram shingles; empty array for docs under 3 tokens
    (F.sequence(1, 0) would count DOWN — guard it)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (SHINGLE_WIDTH - 1))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, SHINGLE_WIDTH), " ")
    )
    return F.array_distinct(
        F.when(n >= SHINGLE_WIDTH, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


def minhash_component(shingles: Column, salt: int) -> Column:
    """MIN(md5(salt|shingle)) — one permutation of the shingle space."""
    return F.array_min(
        F.transform(
            shingles, lambda s: F.md5(F.concat(F.lit(f"{salt}|"), s))
        )
    )


def with_signature(
    df: DataFrame, text_col: str = "text", num_hashes: int = NUM_HASHES
) -> DataFrame:
    sh = shingles_col(text_col).alias("__shingles")
    out = df.withColumn("__shingles", sh)
    for j in range(num_hashes):
        out = out.withColumn(
            f"__mh{j}", minhash_component(F.col("__shingles"), j)
        )
    return out


# -- query entries ----------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept doc ids after exact dedup (min doc_id per identical text).

    Groups on md5(text): at scale the shuffle key is 16 bytes. Collision
    risk 2⁻⁶⁴-ish at trillions of docs — acceptable for dedup; switch to
    sha2-256 where it isn't.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .orderBy("doc_id")
    )


#: bounded subset for the semantic-dedup certificate columns merged
#: into dedup_exact_stats: the pushed-down ``vec_id < SEM_CERT_VECS``
#: filter keeps the certificate O(1) at any scale factor while still
#: hash-certifying the full algorithm (planes → buckets → grouped
#: matmul → τ rule → keep set) on real data in the driver contract
SEM_CERT_VECS = 500


def _sem_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (sem_kept, sem_kept_hash) certificate of semantic_dedup
    over the first SEM_CERT_VECS embeddings — the certificate is O(1)
    by construction but costs two applyInPandas stages, so it is
    memoized per embeddings fingerprint (certmemo — recomputing it per
    dedup_exact_stats call measured ~1.1 s of repeated work); NULL
    columns when the dataset dir has no embeddings table
    (documents-only datasets must not fail the whole stats row)."""
    import os

    from guagua_spark.operators.certmemo import cached_cert_row

    schema = "sem_kept bigint, sem_kept_hash bigint"
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        return spark.createDataFrame([(None, None)], schema)

    def build() -> DataFrame:
        emb = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < SEM_CERT_VECS)
            .select("vec_id", "embedding")
        )
        from guagua_spark.functions.scale import binder_hash_col

        return semantic_dedup_df(emb).agg(
            F.count(F.lit(1)).alias("sem_kept"),
            # Σ-safe binder (ex sem_kept_id_sum — bounded here by the
            # vec_id < SEM_CERT_VECS slice, migrated anyway to close
            # the plain-id-sum class; SCALE.md binder audit)
            F.sum(binder_hash_col("semb", F.col("vec_id")))
            .cast("bigint")
            .alias("sem_kept_hash"),
        )

    return cached_cert_row(
        spark, sf_dir, "semantic", ("embeddings",), schema, build
    )


def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: total docs, distinct texts, removed count — plus two
    merged certificates binding round-4 LOCAL operators into this
    contract row (50-slot cap):

    - ``inc_*``: the incremental-ingest dedup rollup
      (dedup_incremental) — flagged-new-doc count, total matches,
      dup_of id sum, and the integer sum of per-doc
      ROUND(best_jaccard·10⁶). Computed from the SESSION PAIR INDEX
      restricted to (old, new) endpoints, which equals
      minhash_pairs_between exactly (bucket membership and the Jaccard
      verify are per-doc/per-pair — the same argument the oracle
      replays); per-pair jaccard is an int/int division, so the
      rounded integers are engine-exact.
    - ``sem_*``: the semantic-dedup certificate (kept-row count and
      kept-id sum over the first SEM_CERT_VECS embeddings; memoized
      per table fingerprint, NULL when embeddings are absent).
    - ``edt_*`` (round 11): the edit-distance block→verify→resolve
      certificate (_edit_cert_df) — verified pair count, a Σ-safe
      binder over (doc_a, doc_b, edit_dist), linked-node and entity
      counts of the resolved components — promoting the record-linkage
      pipeline (dedup_edit_pairs / dedup_edit_clusters) into the
      hash-certified tier inside the 50-slot cap."""
    docs = load_table(spark, sf_dir, "documents")
    cross = _minhash_pair_df(spark, sf_dir).filter(
        (F.col("doc_a") < INC_SPLIT) & (F.col("doc_b") >= INC_SPLIT)
    )
    per_new = cross.groupBy("doc_b").agg(
        F.min("doc_a").alias("dup_of"),
        F.count(F.lit(1)).alias("n_matches"),
        F.max("jaccard").alias("best_jaccard"),
    )
    inc = per_new.agg(
        F.count(F.lit(1)).alias("inc_flagged"),
        F.coalesce(F.sum("n_matches"), F.lit(0))
        .cast("bigint")
        .alias("inc_match_total"),
        F.coalesce(F.sum("dup_of"), F.lit(0))
        .cast("bigint")
        .alias("inc_dup_of_sum"),
        F.coalesce(
            F.sum(F.round(F.col("best_jaccard") * 1e6).cast("bigint")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("inc_jac_musum"),
    )
    return (
        docs.agg(
            F.count(F.lit(1)).alias("total"),
            F.countDistinct("text").alias("distinct_texts"),
            (F.count(F.lit(1)) - F.countDistinct("text")).alias("removed"),
        )
        .crossJoin(F.broadcast(inc))
        .crossJoin(F.broadcast(_sem_cert_df(spark, sf_dir)))
        .crossJoin(F.broadcast(_spans_cert_df(spark, sf_dir)))
        .crossJoin(F.broadcast(_edit_cert_df(spark, sf_dir)))
    )


def _band_buckets(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) rows from a signature table — one row per
    (doc, band) with the band's bucket hash. Shared by the self-join
    (minhash_pairs_for) and cross-corpus (minhash_pairs_between)
    candidate generators."""
    bands = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"__mh{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    return sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")


def minhash_pairs_between(new_docs: DataFrame, old_docs: DataFrame) -> DataFrame:
    """Cross-corpus MinHash near-dup pairs (new_id, old_id, jaccard) —
    the INCREMENTAL-INGEST primitive: dedup a freshly-crawled batch
    against the standing corpus without re-pairing the corpus with
    itself. Candidates come only from new×old bucket collisions (no
    new×new, no old×old), so per-batch cost is O(|batch| signatures +
    collisions) however large the standing corpus is; at 100 TB the old
    side's bucket table is the stored LSH index (SCALE.md), re-read not
    rebuilt. Verification is exact pairwise Jaccard, same as the
    self-join path."""
    def _sig(docs: DataFrame) -> DataFrame:
        # ensure_parallelism (a no-op when the input already has ≥cores
        # partitions, e.g. dedup_incremental's pre-repartitioned scan):
        # the k·|shingles| md5 signature pass runs below the first
        # exchange, and a small single-partition parquet scan would run
        # it serially — the exact trap the module comments warn about
        from guagua_spark.functions.scale import ensure_parallelism

        return with_signature(
            ensure_parallelism(docs, docs.sparkSession)
        ).select(
            "doc_id",
            "__shingles",
            *[F.col(f"__mh{j}") for j in range(NUM_HASHES)],
        ).localCheckpoint()

    sig_n, sig_o = _sig(new_docs), _sig(old_docs)
    bn = _band_buckets(sig_n).withColumnRenamed("doc_id", "new_id")
    bo = _band_buckets(sig_o).withColumnRenamed("doc_id", "old_id")
    cand = (
        bn.join(bo, ["band", "bucket"]).select("new_id", "old_id").distinct()
    )
    inter = F.size(F.array_intersect(F.col("sh_n"), F.col("sh_o")))
    jac = inter.cast("double") / (
        F.size("sh_n") + F.size("sh_o") - inter
    )
    return (
        cand.join(
            sig_n.select(
                F.col("doc_id").alias("new_id"),
                F.col("__shingles").alias("sh_n"),
            ),
            "new_id",
        )
        .join(
            sig_o.select(
                F.col("doc_id").alias("old_id"),
                F.col("__shingles").alias("sh_o"),
            ),
            "old_id",
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("new_id", "old_id", "jaccard")
    )


# -- stored LSH index (write-once, probe-many) ------------------------------
#
# The session memos (_minhash_pair_df, similarity's bucket/cell tables)
# are the SINGLE-SESSION analogue of what a deployment materializes as
# datasets next to the corpus. This section is that deployment form:
# save_lsh_index writes the index as bucketed parquet tables via
# functions/scale.write_bucketed, and the probe paths below read the
# STORED tables — no recompute-from-text, no session cache — so a new
# session (or another team's job) dedups an incoming batch against a
# corpus it never scanned.

#: bucket count for the stored index tables. At 100 TB size this to the
#: cluster (thousands); it must match across tables that join (both
#: writers below use the same value, which is what makes the posting
#: table's self-join Exchange-free).
LSH_INDEX_BUCKETS = 16


def bucket_array_col(prefix: str = "__mh") -> Column:
    """Ordered per-band bucket hashes as ONE array column (index =
    band) over a signature table's __mh columns — shared by the stored
    index writer and the streaming twin's first-band rule."""
    out = []
    for b in range(LSH_BANDS):
        cols = [F.col(f"{prefix}{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
        out.append(F.md5(F.concat_ws("|", *cols)))
    return F.array(*out)


def save_lsh_index(
    docs: DataFrame, name: str, n_buckets: int = LSH_INDEX_BUCKETS
) -> None:
    """Materialize the MinHash-LSH index of a (doc_id, text) corpus as
    TWO stored bucketed tables — the classic inverted + forward layout:

    - ``<name>_docs`` — forward index, ONE row per doc
      (doc_id, shingles, buckets array; bucketed by doc_id): feeds
      verification join-backs and the streaming twin's static side.
    - ``<name>_buckets`` — posting table, one row per (doc, band)
      (doc_id, band, bucket; bucketed by (band, bucket)): feeds
      collision probing, and self-joins with ZERO Exchange because the
      write pre-shuffled it on exactly the probe key.

    The signature pass runs ONCE (localCheckpoint) and feeds both
    writes. Overwrites any previous index of the same name — an
    overwrite is the corpus re-index, picked up lazily by catalog
    readers (see streaming_dedup_incremental's index_table mode)."""
    from guagua_spark.functions.scale import (
        ensure_parallelism,
        write_bucketed,
    )

    sig = (
        with_signature(ensure_parallelism(docs, docs.sparkSession))
        .select(
            "doc_id",
            F.col("__shingles").alias("shingles"),
            bucket_array_col().alias("buckets"),
        )
        .localCheckpoint()
    )
    write_bucketed(sig, f"{name}_docs", ["doc_id"], n_buckets)
    write_bucketed(
        sig.select(
            "doc_id", F.posexplode("buckets").alias("band", "bucket")
        ),
        f"{name}_buckets",
        ["band", "bucket"],
        n_buckets,
    )


def append_to_lsh_index(docs: DataFrame, name: str) -> None:
    """Index MAINTENANCE: merge a new batch into a stored LSH index —
    the step after minhash_pairs_against_index dropped the batch's
    near-duplicates, completing the ingest loop (probe → drop dups →
    merge survivors). Appends sign the batch ONCE and insert into both
    tables; Spark keeps the bucket spec on insert, so the posting
    table's Exchange-free join property survives the merge. Caller
    owns dedup between batch and corpus ids (the probe step)."""
    from guagua_spark.functions.scale import ensure_parallelism

    # same guard as the save/probe paths: a one-split batch file must
    # not run the NUM_HASHES-md5 signature pass in a single task
    docs = ensure_parallelism(docs, docs.sparkSession)
    sig = (
        with_signature(docs)
        .select(
            "doc_id",
            F.col("__shingles").alias("shingles"),
            bucket_array_col().alias("buckets"),
        )
        .localCheckpoint()
    )
    sig.write.insertInto(f"{name}_docs")
    sig.select(
        "doc_id", F.posexplode("buckets").alias("band", "bucket")
    ).write.insertInto(f"{name}_buckets")


def minhash_pairs_against_index(
    new_docs: DataFrame, name: str
) -> DataFrame:
    """minhash_pairs_between with the OLD side read from the stored
    index: only the incoming batch is signed; the standing corpus
    contributes its posting table (collision probe) and forward table
    (shingle verification) as catalog reads. Per-batch cost is
    O(|batch| signatures + collisions) and the corpus text is never
    rescanned — the stored-index deployment story, round-trip-tested
    for equality with the recompute-from-text path."""
    spark = new_docs.sparkSession
    from guagua_spark.functions.scale import ensure_parallelism

    sig_n = (
        with_signature(ensure_parallelism(new_docs, spark))
        .select(
            "doc_id",
            "__shingles",
            *[F.col(f"__mh{j}") for j in range(NUM_HASHES)],
        )
        .localCheckpoint()
    )
    bn = _band_buckets(sig_n).withColumnRenamed("doc_id", "new_id")
    bo = spark.table(f"{name}_buckets").withColumnRenamed(
        "doc_id", "old_id"
    )
    cand = (
        bn.join(bo, ["band", "bucket"]).select("new_id", "old_id").distinct()
    )
    sh_o = spark.table(f"{name}_docs").select(
        F.col("doc_id").alias("old_id"), F.col("shingles").alias("sh_o")
    )
    inter = F.size(F.array_intersect(F.col("sh_n"), F.col("sh_o")))
    jac = inter.cast("double") / (F.size("sh_n") + F.size("sh_o") - inter)
    return (
        cand.join(
            sig_n.select(
                F.col("doc_id").alias("new_id"),
                F.col("__shingles").alias("sh_n"),
            ),
            "new_id",
        )
        .join(sh_o, "old_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("new_id", "old_id", "jaccard")
    )


def minhash_pairs_from_index(spark: SparkSession, name: str) -> DataFrame:
    """Near-dup pairs of the indexed corpus itself, computed ENTIRELY
    from the stored tables: the candidate stage self-joins the posting
    table on its own bucketing key (band, bucket), so the plan carries
    ZERO Exchange under that join — the shuffle was paid once at index
    write time (asserted in tests/test_index_store.py). Equal to
    minhash_pairs_for over the original text by construction."""
    b = spark.table(f"{name}_buckets")
    cand = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sh = spark.table(f"{name}_docs")
    joined = cand.join(
        sh.select(
            F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
        ),
        "doc_a",
    ).join(
        sh.select(
            F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
        ),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    return joined.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


def _candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct LSH candidate pairs (doc_a < doc_b) from a
    (doc_id, band, bucket) relation — THE candidate generation, shared
    by the Jaccard verifier (minhash_pairs_for) and the edit-distance
    verifier (edit_verified_pairs) so a band/bucket change can never
    make the two diverge."""
    return (
        buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def minhash_pairs_for(docs: DataFrame) -> DataFrame:
    """Unordered MinHash-LSH near-dup pairs (doc_a, doc_b, jaccard) for
    an arbitrary (doc_id, text) DataFrame — shared by
    dedup_minhash_pairs (adds the presentation sort), dedup_clusters
    (feeds connected components), and pipeline_clean_corpus (dedups the
    quality-filtered corpus). Callers should repartition small inputs
    first; signature hashing runs below the first exchange.

    The signature table is localCheckpoint'ed: it feeds FOUR plan
    branches (both sides of the bucket self-join + both verify
    join-backs), and without materialization each branch re-evaluates
    the k·|shingles| md5 folds — AQE reuses the scan Exchange but not
    expressions above it (measured ~30%% warm win at sf0.1, and the gap
    grows with k). Compute-once-store-the-sketch is also the 100 TB
    play; storage is the signature table, freed when the RDD is GC'd.
    On a multi-node cluster prefer persist(MEMORY_AND_DISK) + explicit
    unpersist where lineage-free blocks would forfeit task retry."""
    sig = with_signature(docs).select(
        "doc_id",
        "__shingles",
        *[F.col(f"__mh{j}") for j in range(NUM_HASHES)],
    ).localCheckpoint()
    buckets = _band_buckets(sig)
    cand = _candidate_pairs(buckets)
    sh = sig.select("doc_id", "__shingles")
    joined = (
        cand.join(
            sh.select(
                F.col("doc_id").alias("doc_a"),
                F.col("__shingles").alias("sh_a"),
            ),
            "doc_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("doc_b"),
                F.col("__shingles").alias("sh_b"),
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (
        F.size("sh_a") + F.size("sh_b") - inter
    )
    return joined.select("doc_a", "doc_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    )


#: session memo of the verified MinHash pair graph per sf_dir — the
#: LSH index of a static corpus (the k·|shingles| md5 signature pass is
#: the dominant cost of every near-dup query; a real pipeline
#: materializes this index once and reuses it, which is exactly WHY LSH
#: is the scale path). Same contract as iterative._FEATURE_CACHE /
#: similarity._IVF_CENTROID_CACHE: keyed on the table fingerprint so
#: regenerated data invalidates, ONE live entry total (caching a new
#: sf_dir evicts + unpersists every other — a session touching several
#: scale dirs must not pin several corpus-sized pair graphs in the
#: block manager), clear_caches() drops everything;
#: first-build cost stays visible in the bench cold lane.
_PAIR_CACHE: dict = {}


def clear_caches() -> None:
    """Unpersist and drop the pair-graph memo (data-regen hook; the
    semantic certificate scalars live in operators.certmemo and clear
    with it / clear_all_caches)."""
    from guagua_spark.memo import unpersist_all

    unpersist_all(_PAIR_CACHE)
    unpersist_all(_EDIT_PAIR_CACHE)


def _minhash_pair_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from guagua_spark.memo import persisted_index
    from guagua_spark.sources.tables import table_fingerprint

    # repartition the raw text BEFORE computing signatures: the
    # k·|shingles| md5 calls are the dominant cost and projections run
    # below the exchange — on the single scan partition of a small file
    # they would run serially, and once per join branch (see
    # dedup_ngram_jaccard)
    return persisted_index(
        _PAIR_CACHE,
        sf_dir,
        table_fingerprint(sf_dir, "documents"),
        "minhash_pairs",
        lambda: minhash_pairs_for(
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .repartition(spark.sparkContext.defaultParallelism)
        ),
    )


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH, Jaccard-verified.

    Pipeline: signature (k=12 salted-md5 mins) → 6 bands × 2 rows →
    bucket-join on (band, band_hash) → distinct candidate pairs →
    verify true shingle-Jaccard ≥ 0.5. Output (doc_a, doc_b, jaccard).
    """
    return _minhash_pair_df(spark, sf_dir).orderBy("doc_a", "doc_b")


def connected_components(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    max_rounds: int = 50,
    algorithm: str = "propagate",
) -> DataFrame:
    """Connected components of an undirected pair graph → (node, label)
    where label is the smallest node id reachable from node.

    ``algorithm="propagate"`` (default) — distributed min-label
    propagation: labels start as each node's own id; every round each
    node takes the min of its label and its neighbors' labels, until a
    fixpoint. Per round that is one edges⋈labels shuffle join + a
    groupBy min — no driver-side graph. Labels decrease monotonically,
    so SUM(label) is a convergence certificate: an unchanged sum IS the
    fixpoint (collected as one scalar per round, O(1) driver traffic).
    Rounds = graph diameter; near-dup components are tiny cliques, so
    2-3 rounds in practice. localCheckpoint truncates the per-round
    lineage growth that would otherwise make round N replan rounds
    1..N-1. If the diameter exceeds ``max_rounds``, the call
    AUTO-ESCALATES to the star contraction (never returns partial
    labels, never fails on a legal graph).

    ``algorithm="star"`` — alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): converges in O(log² n) rounds on ANY graph
    (~log n observed on paths), the scale path for adversarial
    diameters where propagation would need O(diameter) shuffles.
    """
    if algorithm == "star":
        labels, _ = star_components(pairs, a_col, b_col, max_rounds)
        return labels
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    def step(labels: DataFrame, _i: int) -> DataFrame:
        prop = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        return labels.join(prop, "node", "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce("nbr_label", "label")
            ).alias("label"),
        )

    mem = {"prev_sum": None}

    def converged_fn(_prev: DataFrame, nxt: DataFrame, _i: int) -> bool:
        # 1-row collect per round (O(1) driver traffic); this action
        # also materializes the helper's lazy per-round checkpoint
        cur_sum = nxt.agg(F.sum("label")).collect()[0][0]
        if cur_sum == mem["prev_sum"]:
            return True
        mem["prev_sum"] = cur_sum
        return False

    labels, _, converged = dataframe_supersteps(
        labels, step, max_rounds, converged_fn
    )
    edges.unpersist()
    if not converged:
        # Auto-escalate instead of failing: the graph's diameter
        # exceeded the propagation budget (adversarial chain shapes a
        # near-dup workload can still produce). Restart with the star
        # contraction, which converges in O(log² n) rounds on ANY
        # graph — identical (node, min-reachable-id) output contract,
        # so callers never see the difference beyond latency.
        labels, _ = star_components(pairs, a_col, b_col)
        return labels
    return labels


def star_components(
    pairs: DataFrame, a_col: str, b_col: str, max_rounds: int = 60
) -> tuple[DataFrame, int]:
    """Large-star/small-star connected components (Kiveris et al.,
    SoCC'14) → ((node, label) DataFrame, rounds used).

    Each round rewires edges toward local minima while preserving
    connectivity:

    - large-star: every neighbor v > u is re-linked to
      m(u) = min(Γ(u) ∪ {u});
    - small-star: every neighbor v ≤ u, and u itself, is re-linked
      to m(u).

    The edge set converges in O(log² n) rounds to a star forest whose
    centers are the component minima, so label(u) = min(u, min Γ(u)).
    Everything is equi-join + groupBy (shuffle-friendly, no driver
    graph); the canonical edge set is localCheckpoint'd per round to
    truncate lineage. Convergence is detected EXACTLY (count equality +
    empty anti-join), not by fingerprint.
    """
    und = (
        pairs.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    prev_cnt = und.count()

    def _sym(e: DataFrame) -> DataFrame:
        return e.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).unionByName(e.select(F.col("b").alias("u"), F.col("a").alias("v")))

    def _mins(sym: DataFrame) -> DataFrame:
        return (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        )

    def _canon(e: DataFrame, dedupe: bool = True) -> DataFrame:
        out = e.select(
            F.least(F.col("x"), F.col("y")).alias("a"),
            F.greatest(F.col("x"), F.col("y")).alias("b"),
        ).filter(F.col("a") != F.col("b"))
        return out.distinct() if dedupe else out

    def step(und: DataFrame, _i: int) -> DataFrame:
        # large-star: for each edge (u,v), v > u, emit (v, m(u)).
        # No distinct on this INTERMEDIATE set: each input edge emits
        # exactly one output edge (v joins a single m(u)), so the
        # un-deduped set never exceeds |E| rows TOTAL — but duplicate
        # multiplicity of a single (v, m) edge is O(degree(v)), not a
        # constant: in a clique every neighbor u < v shares the same
        # m(u), so all of v's edges collapse onto one output pair.
        # That's safe (the small-star distinct + min-aggs absorb
        # duplicates, and each round rebuilds from the deduped edge
        # set, so there is no round-over-round growth) and still a
        # win: skipping the exchange removes one full shuffle stage
        # per round at the cost of shipping ≤|E| rows instead of
        # ≤|distinct| into the small-star stage — equality-tested on a
        # clique-heavy graph in tests/test_asof_cc_properties.py.
        sym = _sym(und)
        large = (
            _canon(
                sym.filter(F.col("v") > F.col("u"))
                .join(_mins(sym), "u")
                .select(F.col("v").alias("x"), F.col("m").alias("y")),
                dedupe=False,
            )
            # mid-step lazy checkpoint: the convergence count()
            # materializes both stars in one job
        ).localCheckpoint(eager=False)
        # small-star: for each u emit (u, m(u)) and (v, m(u)) ∀ v < u
        sym2 = _sym(large)
        mins2 = _mins(sym2)
        return _canon(
            sym2.filter(F.col("v") < F.col("u"))
            .join(mins2, "u")
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .unionByName(
                mins2.select(F.col("u").alias("x"), F.col("m").alias("y"))
            )
        )

    mem = {"prev_cnt": prev_cnt}

    def converged_fn(prev: DataFrame, nxt: DataFrame, _i: int) -> bool:
        # EXACT convergence: count equality + empty anti-join, never a
        # fingerprint; the count also materializes the round's
        # checkpointed edge set
        cnt = nxt.count()
        if cnt == mem["prev_cnt"] and nxt.join(
            prev, ["a", "b"], "left_anti"
        ).isEmpty():
            return True
        mem["prev_cnt"] = cnt
        return False

    und, rounds, converged = dataframe_supersteps(
        und, step, max_rounds, converged_fn
    )
    if not converged:
        # same contract as the propagation path: never return labels
        # from a partially-contracted edge set
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds "
            f"(O(log² n) expected — raise max_rounds)"
        )
    labels = (
        _sym(und)
        .groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("mn"))
        .select(
            "node", F.least(F.col("node"), F.col("mn")).alias("label")
        )
    )
    # nodes whose only edges are self-pairs are dropped by the a != b
    # canonicalization but ARE labeled (with themselves) by the
    # propagation path — keep the two algorithms row-identical
    iso = (
        pairs.filter(F.col(a_col) == F.col(b_col))
        .select(F.col(a_col).alias("node"))
        .distinct()
        .join(labels, "node", "left_anti")
        .select("node", F.col("node").alias("label"))
    )
    return labels.unionByName(iso), rounds


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    MinHash pair graph — each linked document labeled with the smallest
    doc_id reachable through near-dup edges (the cluster representative
    a dedup pipeline would keep).

    Runs the large-star/small-star contraction interior
    (``algorithm="star"``, the O(log² n)-round path that survives ANY
    graph shape) so the driver's oracle certifies the star algorithm on
    the hard signal; the min-label propagation variant produces
    identical labels and stays oracle-tested locally
    (``dedup_clusters_prop``, tests/test_dedup.py).
    """
    # the pair graph comes persisted from the session index memo
    # (_minhash_pair_df) — do NOT unpersist it here
    pairs = _minhash_pair_df(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b", algorithm="star")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs shingle-Jaccard ≥ threshold via prefix filtering
    (Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06).

    Not a nested loop: under any global token order, a pair with
    |∩| ≥ α must share its SMALLEST common token within the first
    n−α+1 tokens of both sets (everything before it is non-common,
    and there are at most n−|∩| ≤ n−α such tokens). J ≥ t gives
    α = ⌈t·n⌉ per side, so exploding only each doc's sorted-hash
    prefix and equi-joining on the token turns O(n²) row pairs into a
    shuffle join on shingle hash — the same plan shape at 5k docs and
    at 10⁹ docs. Candidates are then verified with the true Jaccard.
    Results are identical to the naive cross join (the oracle SQL).

    Skew hardening: tokens are globally ordered by DOCUMENT FREQUENCY
    (rarest first, ties by token value) rather than by hash value, so a
    globally-hot shingle sits at the END of every doc's ordering and
    enters a prefix only for docs whose prefix spans nearly the whole
    set — its join bucket stays linear in the few docs that genuinely
    need it instead of quadratic in the corpus (PPJoin's standard df
    ordering). Any total order preserves exactness; df-ordering only
    changes WHICH n−⌈t·n⌉+1 tokens each doc exposes. Costs one extra
    shuffle pair (tok-count + re-group); both shuffle on the token,
    i.e. the same key distribution the join itself uses, and the hot
    token's count bucket is linear, never quadratic.
    """
    return ngram_jaccard_pairs_for(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        spark.sparkContext.defaultParallelism,
    )


def ngram_jaccard_pairs_for(raw_docs: DataFrame, par: int) -> DataFrame:
    """Exact all-pairs shingle-Jaccard for a (doc_id, text) DataFrame —
    see dedup_ngram_jaccard for the algorithm notes."""
    # Set sizes are invariant under (collision-free) hashing, so compare
    # long-hashed shingles instead of strings — array_intersect on
    # fixed-width longs, not variable-length UTF8. The oracle compares
    # raw strings; jaccard values agree because only SIZES matter.
    #
    # Repartition the RAW text before computing shingles: projections
    # run below the exchange, and a small parquet file scans as one
    # partition — shingling there would run serially (and once per join
    # branch). Post-shuffle, the identical shingle subplans also share
    # one ReusedExchange instead of rescanning.
    hashed = (
        raw_docs.repartition(par)
        .select(
            "doc_id",
            F.transform(shingles_col(), lambda s: F.xxhash64(s)).alias("shr"),
        )
    )
    # re-assemble each doc's tokens ordered by (df, tok): array_sort on
    # array<struct> compares fields left-to-right, giving the global
    # rarest-first total order. Document frequency comes from a window
    # count over the SAME exploded set (one shuffle on tok + one on
    # doc_id) rather than a groupBy(tok) + join back (three shuffles of
    # the exploded set) — measured ~25% faster with the same skew story:
    # a hot token's window group is linear and spillable, exactly like
    # its join bucket would be.
    from pyspark.sql.window import Window as _W

    docs = (
        hashed.select("doc_id", F.explode("shr").alias("tok"))
        .withColumn("df", F.count(F.lit(1)).over(_W.partitionBy("tok")))
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("p")
        )
        .select(
            "doc_id",
            F.transform("p", lambda s: s["tok"]).alias("sh"),
        )
    )
    # NOT materialized, unlike the minhash signature table: `sized`
    # also feeds four branches, but an A/B at sf0.1 showed no win
    # (2.93 s vs 3.01 s, within noise) — here the join+verify dominates
    # and AQE's ReusedExchange already covers the shuffled prefix data,
    # so a checkpoint would only pin executor memory.
    sized = docs.select("doc_id", "sh", F.size("sh").alias("n"))
    # prefix length n − ⌈t·n⌉ + 1 (0 for empty sets — no tokens, no pairs)
    plen = F.when(
        F.col("n") > 0,
        F.col("n") - F.ceil(F.col("n") * F.lit(JACCARD_THRESHOLD)) + 1,
    ).otherwise(F.lit(0))
    toks = sized.select(
        "doc_id",
        "n",
        F.posexplode(F.slice("sh", F.lit(1), plen)).alias("pos", "tok"),
    )
    # equi-join on the prefix token + two EXACT prunes evaluated before
    # the distinct:
    #  - size: J ≥ t implies min(n_a,n_b)/max(n_a,n_b) ≥ t;
    #  - positional (PPJoin, Xiao et al. WWW'08): at the smallest common
    #    token (0-based pos), |∩| ≤ 1 + min(n_a−pos_a−1, n_b−pos_b−1);
    #    J ≥ t needs |∩| ≥ ⌈t·(n_a+n_b)/(1+t)⌉. Dropping a row for a
    #    non-smallest common token is safe — the smallest one's row
    #    survives and the pair reaches distinct anyway.
    # The All-Pairs indexing-prefix asymmetry (smaller side only needs
    # its first n − ⌈(2t/(1+t))·n⌉ + 1 tokens) was implemented and
    # A/B'd in round 14: REJECTED — under the df (rarest-first) global
    # order the prune removed 0 of 131,507 join rows at sf0.1 (row-set
    # proven identical first), because candidates only ever collide on
    # rare tokens at the very FRONT of both prefixes; the deep-prefix
    # collisions the asymmetry targets are exactly what df-ordering
    # already starves. Wall was flat (2.87 vs 2.80 s median). See
    # OPTIMIZATION_r14.md.
    inv_t = 1.0 / JACCARD_THRESHOLD
    t_frac = JACCARD_THRESHOLD / (1.0 + JACCARD_THRESHOLD)
    min_overlap = F.ceil((F.col("a.n") + F.col("b.n")) * F.lit(t_frac))
    ubound = F.lit(1) + F.least(
        F.col("a.n") - F.col("a.pos") - 1, F.col("b.n") - F.col("b.pos") - 1
    )
    cand = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n") <= F.col("b.n") * inv_t)
            & (F.col("b.n") <= F.col("a.n") * inv_t)
            & (ubound >= min_overlap),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        # AQE coalesces the tiny (16-byte-row) post-distinct shuffle to a
        # few partitions, but the verify below is COMPUTE-heavy per row
        # (hash-set intersect of ~50-element arrays) — rebalance by CPU,
        # not by bytes
        .repartition(par)
    )
    sh = sized.select("doc_id", "sh", "n")
    verified = cand.join(
        sh.select(
            F.col("doc_id").alias("doc_a"),
            F.col("sh").alias("sh_a"),
            F.col("n").alias("n_a"),
        ),
        "doc_a",
    ).join(
        sh.select(
            F.col("doc_id").alias("doc_b"),
            F.col("sh").alias("sh_b"),
            F.col("n").alias("n_b"),
        ),
        "doc_b",
    )
    # |∪| = n_a + n_b − |∩| exactly (distinct arrays) — one set op per
    # pair instead of two
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    return (
        verified.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("doc_a", "doc_b")
    )


#: Subset TARGETS for the SCALE-FEASIBLE oracle twins: the exact
#: all-pairs DuckDB replays are O(n²) and exceed any sane watchdog
#: past sf1, so above that the sweep certifies the operators on a
#: deterministic md5-selected subset sized at a fixed TARGET (not a
#: fixed fraction — a fraction re-explodes every decade: 10% of sf10's
#: 500k docs is 50k, right back where the full oracle died). rate =
#: min(1, target/count) is IEEE-identical on both engines (one double
#: division, one LEAST), and u32(md5(tag|id)) < rate·2³² is the repo's
#: standard engine-portable Bernoulli rule (functions/scale.py:53).
#: ~5k docs ≈ 12.5M candidate pairs, ~10k vectors ≈ 5·10⁷ cosines —
#: real exactness exercises that finish in minutes at ANY sf.
NGRAM_SAMPLE_TARGET = 5_000
EMB_SAMPLE_TARGET = 10_000


def dedup_ngram_jaccard_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_ngram_jaccard restricted to the deterministic md5 doc
    subset — the sweep's scale-feasible twin (same PPJoin interior,
    same oracle body, WHERE clause on both sides). Used by
    scripts/value_sweep.py when the full O(n²) oracle times out."""
    from guagua_spark.functions.scale import u32_hash

    docs_all = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    rate = min(1.0, NGRAM_SAMPLE_TARGET / max(docs_all.count(), 1))
    docs = docs_all.filter(
        u32_hash("ngsamp", F.col("doc_id").cast("string"))
        < F.lit(rate * 4294967296.0)
    )
    return ngram_jaccard_pairs_for(
        docs, spark.sparkContext.defaultParallelism
    )


def _ngram_oracle_sampled() -> str:
    keep = (
        "CAST(('0x' || substr(md5('ngsamp|' || CAST(doc_id AS VARCHAR)),"
        " 1, 8)) AS UBIGINT) < rate * 4294967296.0"
    )
    return f"""
WITH ngrate AS (
  SELECT LEAST(1.0, {float(NGRAM_SAMPLE_TARGET)!r}
               / GREATEST(COUNT(*), 1)) AS rate
  FROM documents
),
docs AS (SELECT doc_id, {_sql_shingles()} AS sh FROM documents, ngrate
              WHERE {keep})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
FROM docs a JOIN docs b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
      >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
""".strip()


def dedup_embedding_pairs_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dedup_embedding_pairs restricted to the deterministic md5 vector
    subset — the sweep's scale-feasible twin (same block-tiled matmul
    prefilter + exact rescore interior). The full all-pairs oracle is
    ~523 s at sf1's 20k vectors and quadratic beyond."""
    from guagua_spark.functions.scale import u32_hash

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n_all = emb.count()
    rate = min(1.0, EMB_SAMPLE_TARGET / max(n_all, 1))
    sub = emb.filter(
        u32_hash("embsamp", F.col("vec_id").cast("string"))
        < F.lit(rate * 4294967296.0)
    )
    # block sizing only affects task memory, never results — the exact
    # expected subset size avoids an extra count() job
    return embedding_pairs_for(sub, n_rows=max(1, int(n_all * rate)))


def _embedding_oracle_sampled() -> str:
    dim = 64
    dot = " + ".join(
        f"(CAST(a.embedding[{i+1}] AS DOUBLE) * CAST(b.embedding[{i+1}] AS DOUBLE))"
        for i in range(dim)
    )
    na = " + ".join(
        f"(CAST(a.embedding[{i+1}] AS DOUBLE) * CAST(a.embedding[{i+1}] AS DOUBLE))"
        for i in range(dim)
    )
    nb = " + ".join(
        f"(CAST(b.embedding[{i+1}] AS DOUBLE) * CAST(b.embedding[{i+1}] AS DOUBLE))"
        for i in range(dim)
    )
    keep = (
        "CAST(('0x' || substr(md5('embsamp|' || CAST(vec_id AS VARCHAR)),"
        " 1, 8)) AS UBIGINT) < rate * 4294967296.0"
    )
    return f"""
WITH erate AS (
  SELECT LEAST(1.0, {float(EMB_SAMPLE_TARGET)!r}
               / GREATEST(COUNT(*), 1)) AS rate
  FROM embeddings
),
es AS (SELECT vec_id, embedding FROM embeddings, erate WHERE {keep})
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ({dot}) / SQRT(({na}) * ({nb})) AS cosine
FROM es a JOIN es b ON a.vec_id < b.vec_id
WHERE ({dot}) / SQRT(({na}) * ({nb})) >= 0.95
ORDER BY id_a, id_b
""".strip()


#: rows per corpus block in the tiled all-pairs prefilter — 64k × 64 dims
#: × 8 B ≈ 32 MB per block, two blocks per task
EMB_BLOCK_ROWS = 65_536


def embedding_pairs_for(
    emb: DataFrame, block_rows: int = EMB_BLOCK_ROWS, n_rows: int | None = None
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.95) for a
    (vec_id, embedding) DataFrame — fully distributed block-tiled
    matmul; the DRIVER NEVER HOLDS THE CORPUS.

    Stage 1 — PREFILTER: pack the corpus into B = ⌈n/block_rows⌉ block
    rows (collect_list per block — bounded at ~32 MB each), take the
    B(B+1)/2 unordered block pairs via crossJoin + blk≤blk filter (a
    CartesianProduct at scale: each task streams exactly TWO blocks, so
    peak task memory is 2·block_rows·dim·8 B regardless of n), and run
    one numpy matmul per block pair, keeping sim ≥ threshold − 1e-6.
    The guard band is ~10⁷× the worst-case difference between numpy's
    pairwise summation and strict left-to-right order, so no qualifying
    pair can be lost.

    Stage 2 — EXACT verify on the surviving pairs only, with the same
    left-to-right double arithmetic as the SQL oracle, so reported
    cosines (and the ≥ threshold cut) are bit-identical cross-engine.
    Equi-joins back to the embeddings are left to AQE: broadcast at
    validator scale, shuffle-hash at 100 TB (a forced broadcast of the
    full table would die there).
    """
    import math

    import numpy as np
    import pandas as pd

    dim, threshold, band = 64, 0.95, 1e-6
    # Block-count sizing only affects task memory, never results (every
    # unordered block pair is enumerated whatever n_blocks is), so an
    # ESTIMATED row count is sufficient — take it from Catalyst's
    # relation statistics (parquet file bytes) instead of spending an
    # extra count() job per invocation. Fall back to count() only when
    # the plan has no usable statistic (Spark reports defaultSizeInBytes
    # ≈ 2^63 for unknown relations, e.g. local test DataFrames).
    if n_rows is None:
        from guagua_spark.sources.writers import plan_size_bytes

        est_bytes = plan_size_bytes(emb)
        if est_bytes < (1 << 50):
            # ~8 B/double parquet-encoded (random doubles don't compress)
            n_rows = max(1, est_bytes // (dim * 8 + 8))
        else:
            n_rows = emb.count()
    n = n_rows
    n_blocks = max(1, math.ceil(n / block_rows))
    packed = (
        emb.groupBy(F.pmod(F.col("vec_id"), F.lit(n_blocks)).alias("blk"))
        .agg(
            F.collect_list(
                F.struct(
                    F.col("vec_id").alias("i"), F.col("embedding").alias("e")
                )
            ).alias("v")
        )
        # ~one block per partition so the cartesian pairs tasks hold
        # exactly two blocks
        .repartition(n_blocks, "blk")
    )
    grid = (
        packed.select(
            F.col("blk").alias("xb"), F.col("v").alias("xv")
        )
        .crossJoin(
            packed.select(F.col("blk").alias("yb"), F.col("v").alias("yv"))
        )
        .filter(F.col("xb") <= F.col("yb"))
    )

    def block_pairs(it):
        for pdf in it:
            out_a: list[np.ndarray] = []
            out_b: list[np.ndarray] = []
            for xb, xv, yb, yv in zip(
                pdf["xb"], pdf["xv"], pdf["yb"], pdf["yv"]
            ):
                ids_x = np.array([r["i"] for r in xv], dtype=np.int64)
                mat_x = np.array([r["e"] for r in xv], dtype=np.float64)
                mat_x /= np.linalg.norm(mat_x, axis=1, keepdims=True)
                if xb == yb:
                    ids_y, mat_y = ids_x, mat_x
                else:
                    ids_y = np.array([r["i"] for r in yv], dtype=np.int64)
                    mat_y = np.array([r["e"] for r in yv], dtype=np.float64)
                    mat_y /= np.linalg.norm(mat_y, axis=1, keepdims=True)
                sim = mat_x @ mat_y.T
                ai, bi = np.nonzero(sim >= threshold - band)
                a, b = ids_x[ai], ids_y[bi]
                if xb == yb:
                    keep = a < b  # same block: each unordered pair twice
                    out_a.append(a[keep])
                    out_b.append(b[keep])
                else:
                    keep = a != b
                    out_a.append(np.minimum(a, b)[keep])
                    out_b.append(np.maximum(a, b)[keep])
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else [],
                    "id_b": np.concatenate(out_b) if out_b else [],
                }
            )

    cand = grid.mapInPandas(block_pairs, "id_a long, id_b long")
    from guagua_spark.functions.vector import cosine_expr

    cos = cosine_expr("ea", "eb", dim)
    return (
        cand.join(
            emb.select(
                F.col("vec_id").alias("id_a"),
                F.col("embedding").alias("ea"),
            ),
            "id_a",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("id_b"),
                F.col("embedding").alias("eb"),
            ),
            "id_b",
        )
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.95) over embeddings —
    see embedding_pairs_for for the block-tiled distributed plan.
    O(n²/B) compute remains quadratic by nature; the sub-quadratic
    scale path is the LSH variant in operators/similarity."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return embedding_pairs_for(emb)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document via Arrow-batched mapInPandas.

    Per-bit weighted majority over token hashes doesn't decompose into
    built-in array functions without 64 aggregate expressions per row;
    this is the sanctioned Pandas-UDF path (vectorized, no per-row
    Python). Deterministic (md5-based token hashes) → stable rows-only
    check.
    """
    import pandas as pd

    # repartition first — mapInPandas over the single scan partition of
    # a small file would run the whole Python stage on one core
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def simhash_batches(it):
        import hashlib

        import numpy as np

        # token→bit-row memo: md5 is the dominant cost and corpora are
        # Zipf-distributed, so most tokens repeat — hash each DISTINCT
        # token once and reuse its ±1 bit row. The vote accumulation is
        # one matrix sum per doc instead of a Python loop over tokens.
        # BOUNDED: the memo clears when it reaches ~50k entries (~30 MB)
        # — an unbounded per-partition dict over a real corpus's Zipf
        # tail (millions of distinct tokens per 128 MB split) would be
        # a multi-GB Python-worker memory hazard; the head of the
        # distribution re-enters the cache immediately after a clear,
        # which is where the win lives anyway.
        bit_cache: dict[str, np.ndarray] = {}
        cache_cap = 50_000
        shifts = np.arange(64, dtype=np.uint64)
        one = np.uint64(1)

        def bit_row(tok: str) -> np.ndarray:
            row = bit_cache.get(tok)
            if row is None:
                h = np.uint64(
                    int.from_bytes(
                        hashlib.md5(tok.encode()).digest()[:8], "big"
                    )
                )
                row = np.where(((h >> shifts) & one) == one, 1, -1).astype(
                    np.int64
                )
                if len(bit_cache) >= cache_cap:
                    bit_cache.clear()
                bit_cache[tok] = row
            return row

        for pdf in it:
            out = np.zeros(len(pdf), dtype=np.int64)
            for row_i, text in enumerate(pdf["text"].tolist()):
                toks = set(text.split(" "))
                acc = np.sum([bit_row(t) for t in toks], axis=0)
                sh = sum(1 << i for i in range(64) if acc[i] > 0)
                if sh >= 1 << 63:  # two's-complement into int64
                    sh -= 1 << 64
                out[row_i] = sh
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return docs.mapInPandas(
        simhash_batches, "doc_id long, simhash long"
    ).orderBy("doc_id")


# -- oracle SQL -------------------------------------------------------------


def _sql_shingles(col: str = "text") -> str:
    w = SHINGLE_WIDTH
    return (
        f"list_distinct(CASE WHEN len(string_split({col},' ')) >= {w} THEN "
        f"list_transform(generate_series(1, len(string_split({col},' '))-{w-1}), "
        f"i -> array_to_string(string_split({col},' ')[i:i+{w-1}], ' ')) "
        "ELSE [] END)"
    )


def _minhash_pair_ctes(source: str = "documents") -> str:
    """WITH-clause body computing verified pairs (doc_a, doc_b, jaccard)
    over ``source`` — shared by the pairs/clusters oracles and the
    clean-corpus pipeline oracle."""
    mh = ", ".join(
        f"list_min(list_transform(sh, s -> md5('{j}|' || s))) AS mh{j}"
        for j in range(NUM_HASHES)
    )
    band_rows = []
    for b in range(LSH_BANDS):
        cols = " || '|' || ".join(
            f"mh{b * LSH_ROWS + r}" for r in range(LSH_ROWS)
        )
        band_rows.append(f"SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sig")
    buckets = " UNION ALL ".join(band_rows)
    return f"""docs AS (SELECT doc_id, {_sql_shingles()} AS sh FROM {source}),
sig AS (SELECT doc_id, sh, {mh} FROM docs),
buckets AS ({buckets}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b,
         CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
         (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))) AS jaccard
  FROM cand
  JOIN docs x ON x.doc_id = doc_a
  JOIN docs y ON y.doc_id = doc_b
  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
        (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
        >= {JACCARD_THRESHOLD}
)"""


def _minhash_oracle() -> str:
    return f"""
WITH {_minhash_pair_ctes()}
SELECT doc_a, doc_b, jaccard FROM pairs
ORDER BY doc_a, doc_b
""".strip()


def _clusters_oracle() -> str:
    """Connected components of the pair graph via a recursive CTE:
    ``walk`` enumerates every (node, reachable-id) state — UNION dedups
    states so it terminates — and MIN per node over an undirected edge
    set is exactly the component minimum."""
    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
walk(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS doc_id, MIN(label) AS cluster_id
FROM walk GROUP BY node ORDER BY doc_id
""".strip()


def _ngram_oracle() -> str:
    return f"""
WITH docs AS (SELECT doc_id, {_sql_shingles()} AS sh FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
FROM docs a JOIN docs b ON a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
      >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
""".strip()


def _embedding_oracle() -> str:
    dim = 64
    dot = " + ".join(
        f"(CAST(a.embedding[{i+1}] AS DOUBLE) * CAST(b.embedding[{i+1}] AS DOUBLE))"
        for i in range(dim)
    )
    na = " + ".join(
        f"(CAST(a.embedding[{i+1}] AS DOUBLE) * CAST(a.embedding[{i+1}] AS DOUBLE))"
        for i in range(dim)
    )
    nb = " + ".join(
        f"(CAST(b.embedding[{i+1}] AS DOUBLE) * CAST(b.embedding[{i+1}] AS DOUBLE))"
        for i in range(dim)
    )
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ({dot}) / SQRT(({na}) * ({nb})) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ({dot}) / SQRT(({na}) * ({nb})) >= 0.95
ORDER BY id_a, id_b
""".strip()


def _simhash_oracle() -> str:
    """SimHash is deterministic md5 bit votes — fully SQL-expressible.

    ``'0x' || substr(md5(tok),1,16)`` cast to UBIGINT equals Python's
    ``int.from_bytes(md5(tok).digest()[:8], 'big')`` (verified bit-for-
    bit); votes and the two's-complement fold mirror the UDF exactly.
    """
    return """
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
th AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok),1,16)) AS UBIGINT) AS h
  FROM toks
),
votes AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM th CROSS JOIN (SELECT unnest(range(0,64)) AS i) bits
  GROUP BY doc_id, i
),
vals AS (
  SELECT doc_id,
         SUM(CASE WHEN vote > 0 THEN (1::HUGEINT << CAST(i AS INT))
             ELSE 0::HUGEINT END) AS v
  FROM votes GROUP BY doc_id
)
SELECT doc_id,
       CAST(CASE WHEN v >= (1::HUGEINT << 63) THEN v - (1::HUGEINT << 64)
            ELSE v END AS BIGINT) AS simhash
FROM vals ORDER BY doc_id
""".strip()


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_exact_stats": dedup_exact_stats,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_clusters": dedup_clusters,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_embedding_pairs": dedup_embedding_pairs,
    "dedup_simhash": dedup_simhash,
}

ORACLE_SQL = {
    "dedup_exact": (
        "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text) "
        "ORDER BY doc_id"
    ),
    "dedup_exact_stats": None,  # assigned below _exact_stats_oracle
    "dedup_minhash_pairs": _minhash_oracle(),
    "dedup_clusters": _clusters_oracle(),
    "dedup_ngram_jaccard": _ngram_oracle(),
    "dedup_embedding_pairs": _embedding_oracle(),
    "dedup_simhash": _simhash_oracle(),
}

#: scale-feasible (query, oracle) twins for scripts/value_sweep.py —
#: used only when a contract query's FULL oracle exceeds the sweep's
#: watchdog; the driver's sf0.01 gate always runs the full pair.
SWEEP_SAMPLED = {
    "dedup_ngram_jaccard": (
        dedup_ngram_jaccard_sampled,
        _ngram_oracle_sampled(),
        "u32(md5('ngsamp|doc_id')) <"
        f" min(1, {NGRAM_SAMPLE_TARGET}/n_docs)*2^32",
    ),
    "dedup_embedding_pairs": (
        dedup_embedding_pairs_sampled,
        _embedding_oracle_sampled(),
        "u32(md5('embsamp|vec_id')) <"
        f" min(1, {EMB_SAMPLE_TARGET}/n_vecs)*2^32",
    ),
}


#: sf100 twin subset for the MinHash family: 50k docs keeps the DuckDB
#: pair replay + recursive component walk at sf0.1-scale cost whatever
#: the corpus (the full clusters walk measured 341 s at sf10 — 10x
#: decades past the watchdog at sf100); pair membership and Jaccard
#: are per-doc/per-pair, so pairs(subset) == pairs(corpus) cut to
#: subset x subset — the same exactness argument as the ngram twin.
DOC_SAMPLE_TARGET = 50_000


def _sampled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from guagua_spark.functions.scale import u32_hash

    docs_all = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    rate = min(1.0, DOC_SAMPLE_TARGET / max(docs_all.count(), 1))
    return docs_all.filter(
        u32_hash("docsamp", F.col("doc_id").cast("string"))
        < F.lit(rate * 4294967296.0)
    )


def _docsamp_ctes() -> str:
    keep = (
        "CAST(('0x' || substr(md5('docsamp|' || CAST(doc_id AS VARCHAR)),"
        " 1, 8)) AS UBIGINT) < drate.rate * 4294967296.0"
    )
    return f"""drate AS (
  SELECT LEAST(1.0, {float(DOC_SAMPLE_TARGET)!r}
               / GREATEST(COUNT(*), 1)) AS rate
  FROM documents
),
dsamp AS (SELECT doc_id, text FROM documents, drate WHERE {keep})"""


def dedup_minhash_pairs_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dedup_minhash_pairs over the deterministic md5 doc subset —
    the sweep's scale-feasible twin (same LSH interior)."""
    return minhash_pairs_for(
        _sampled_docs(spark, sf_dir).repartition(
            spark.sparkContext.defaultParallelism
        )
    ).orderBy("doc_a", "doc_b")


def _minhash_oracle_sampled() -> str:
    return f"""
WITH {_docsamp_ctes()},
{_minhash_pair_ctes(source="dsamp")}
SELECT doc_a, doc_b, jaccard FROM pairs
ORDER BY doc_a, doc_b
""".strip()


def dedup_clusters_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_clusters (star-contraction CC) over the sampled pair
    graph — certifies the same resolve interior at any sf."""
    pairs = minhash_pairs_for(
        _sampled_docs(spark, sf_dir).repartition(
            spark.sparkContext.defaultParallelism
        )
    ).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b", algorithm="star")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


def _clusters_oracle_sampled() -> str:
    return f"""
WITH RECURSIVE {_docsamp_ctes()},
{_minhash_pair_ctes(source="dsamp")},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
walk(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS doc_id, MIN(label) AS cluster_id
FROM walk GROUP BY node ORDER BY doc_id
""".strip()


_DOCSAMP_RULE = (
    "u32(md5('docsamp|doc_id')) <"
    f" min(1, {DOC_SAMPLE_TARGET}/n_docs)*2^32"
)
SWEEP_SAMPLED["dedup_minhash_pairs"] = (
    dedup_minhash_pairs_sampled,
    _minhash_oracle_sampled(),
    _DOCSAMP_RULE,
)
SWEEP_SAMPLED["dedup_clusters"] = (
    dedup_clusters_sampled,
    _clusters_oracle_sampled(),
    _DOCSAMP_RULE,
)


def dedup_clusters_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_clusters computed by min-label propagation instead of the
    star contraction the contract row runs — SAME semantics, same
    DuckDB oracle. Kept oracle-tested locally (tests/test_dedup.py) so
    both interiors stay certified; propagation is the lower-latency
    choice when components are known-tiny cliques (2-3 rounds)."""
    # the pair graph comes persisted from the session index memo
    # (_minhash_pair_df) — do NOT unpersist it here
    pairs = _minhash_pair_df(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b")
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


# -- semantic dedup (SemDeDup-style, LSH-bucketed) --------------------------

SEM_TABLES = 8
SEM_BITS = 4
SEM_TAU = 0.35


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-dup pruning (the SemDeDup recipe: Abbas et
    al. 2023, arXiv:2303.09540): bucket vectors with an OR-construction
    of md5-seeded hyperplane tables (planes namespaced ``sem-`` —
    independent of the ANN index's), score exact cosine on within-bucket
    candidate pairs only, and drop every vector that has a lower-id
    τ-neighbor. The keep rule is a deterministic one-pass contract —
    "keep iff no same-bucket τ-neighbor with a smaller vec_id" — rather
    than cluster-representative election, so it needs no iterative
    component labeling and its SQL replay is exact.

    100 TB design: the paper clusters with k-means; hyperplane buckets
    give the same sub-quadratic candidate generation with zero training
    state (the planes are literals). Cost is one Arrow-batched matmul
    per batch for bucketing, a shuffle of (table, bucket) keyed 8-byte
    ids, cosine only on candidates, and an anti-join AQE sizes at
    runtime (the dropped set is corpus-sized in the worst case — never
    force-broadcast it). Recall is tunable by (tables, bits) exactly
    like the ANN index; the τ-pairs it may miss are the LSH trade-off,
    asserted ≥ 0.5 at sf0.01 in tests/test_packing.py."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    return semantic_dedup_df(emb)


def semantic_dedup_df(emb: DataFrame) -> DataFrame:
    """Core semantic-dedup transform over a (vec_id, embedding[, ...])
    DataFrame; all non-embedding columns ride through to the kept rows
    (see semantic_dedup for the algorithm and scale notes).

    Candidate generation is a grouped numpy matmul per (table, bucket)
    — the same prefilter-then-exact-verify pattern as the embedding
    near-dup block matmul above: an id-only self-join would ship every
    candidate PAIR back through a join against the embeddings (O(pairs)
    rows × 2 vectors each) and score it with the interpreted zip_with
    fold (measured 5.4 s at sf0.1); here each vector ships SEM_TABLES
    times into applyInPandas, the b² pair scoring happens inside one
    matmul per bucket, and only pairs within 1e-6 of τ come back out.
    The exact cosine_expr then decides ≥ τ bit-identically to the SQL
    oracle, so the band never changes the result — candidates with
    true cosine ≥ τ always clear τ−1e-6 (float noise is ~1e-12)."""
    import numpy as np
    import pandas as pd

    from guagua_spark.functions.vector import cosine_expr
    from guagua_spark.operators.similarity import _planes, _with_tables

    planes = _planes(SEM_TABLES, SEM_BITS, "sem")
    bucketed = _with_tables(
        emb.select("vec_id", "embedding"), "embedding", planes
    ).select("vec_id", "embedding", "table", "bucket")
    tau_band = SEM_TAU - 1e-6

    def find_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(pdf["embedding"].to_numpy())[order].astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            sim = (m @ m.T) / np.outer(norms, norms)
        iu = np.triu_indices(len(ids), 1)
        keep = sim[iu] >= tau_band  # NaN (zero vector) compares False
        return pd.DataFrame(
            {"vec_a": ids[iu[0]][keep], "vec_b": ids[iu[1]][keep]}
        )

    cand = (
        bucketed.groupBy("table", "bucket")
        .applyInPandas(find_pairs, "vec_a long, vec_b long")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    dropped = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .filter(cosine_expr("ea", "eb") >= SEM_TAU)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    kept_cols = [c for c in emb.columns if c != "embedding"]
    return (
        emb.join(dropped, "vec_id", "left_anti")
        .select(*kept_cols)
        .orderBy("vec_id")
    )


def _semantic_dropped_ctes(source: str = "embeddings") -> str:
    """``planes`` → … → ``dropped`` CTE block replaying semantic_dedup_df
    over any (vec_id, embedding) source relation — shared by the
    standalone oracle and the dedup_exact_stats certificate columns."""
    from guagua_spark.functions.vector import sql_cosine
    from guagua_spark.operators.similarity import (
        DIM,
        hyperplane_bucket_ctes,
    )

    buckets = hyperplane_bucket_ctes(
        "sem", SEM_TABLES, SEM_BITS, source=source
    )
    cos = sql_cosine("ea.embedding", "eb.embedding", DIM)
    # scand, not cand: the exact-stats oracle splices this block next
    # to the minhash pair block, which owns the `cand` name
    return f"""{buckets},
scand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bk a
  JOIN bk b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
dropped AS (
  SELECT DISTINCT c.vec_b AS vec_id
  FROM scand c
  JOIN {source} ea ON ea.vec_id = c.vec_a
  JOIN {source} eb ON eb.vec_id = c.vec_b
  WHERE {cos} >= {SEM_TAU!r}
)"""


def _semantic_oracle() -> str:
    return f"""
WITH {_semantic_dropped_ctes()}
SELECT e.vec_id, e.label FROM embeddings e
WHERE e.vec_id NOT IN (SELECT vec_id FROM dropped)
ORDER BY e.vec_id
""".strip()


def _exact_stats_oracle() -> str:
    from guagua_spark.functions.scale import binder_hash_sql

    spn_binder = binder_hash_sql(
        "spn", "CAST(doc_id AS VARCHAR)", "CAST(dup_chars AS VARCHAR)"
    )
    sem_binder = binder_hash_sql("semb", "CAST(vec_id AS VARCHAR)")
    edt_binder = binder_hash_sql(
        "edt",
        "CAST(doc_a AS VARCHAR)",
        "CAST(doc_b AS VARCHAR)",
        "CAST(edit_dist AS VARCHAR)",
    )
    return f"""
WITH RECURSIVE cert AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {SEM_CERT_VECS}
),
{_semantic_dropped_ctes(source="cert")},
sem AS (
  SELECT COUNT(*) AS sem_kept,
         CAST(SUM({sem_binder}) AS BIGINT) AS sem_kept_hash
  FROM cert WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
),
spncert AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {SPN_CERT_DOCS}
),
{_spans_ctes(source="spncert")},
spndoc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         CAST(SUM(e - s + 1) AS BIGINT) AS dup_chars
  FROM sspans GROUP BY doc_id
),
spn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS spn_docs,
         CAST(COALESCE(SUM(n_dup_spans), 0) AS BIGINT) AS spn_spans,
         CAST(COALESCE(SUM(dup_chars), 0) AS BIGINT) AS spn_chars,
         CAST(COALESCE(SUM({spn_binder}), 0) AS BIGINT) AS spn_hash
  FROM spndoc
),
{_minhash_pair_ctes()},
inc_per AS (
  SELECT doc_b, MIN(doc_a) AS dup_of, COUNT(*) AS n_matches,
         MAX(jaccard) AS best_jaccard
  FROM pairs
  WHERE doc_a < {INC_SPLIT} AND doc_b >= {INC_SPLIT}
  GROUP BY doc_b
),
inc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS inc_flagged,
         CAST(COALESCE(SUM(n_matches), 0) AS BIGINT) AS inc_match_total,
         CAST(COALESCE(SUM(dup_of), 0) AS BIGINT) AS inc_dup_of_sum,
         CAST(COALESCE(SUM(CAST(ROUND(best_jaccard * 1000000) AS BIGINT)),
                       0) AS BIGINT) AS inc_jac_musum
  FROM inc_per
),
edt_pairs_cte AS (
  SELECT doc_a, doc_b,
         levenshtein(x.text, y.text) AS edit_dist
  FROM cand
  JOIN documents x ON x.doc_id = cand.doc_a
  JOIN documents y ON y.doc_id = cand.doc_b
  WHERE levenshtein(x.text, y.text) <= {EDIT_TAU}
),
edtp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS edt_pairs,
         CAST(COALESCE(SUM({edt_binder}), 0) AS BIGINT) AS edt_hash
  FROM edt_pairs_cte
),
edt_edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM edt_pairs_cte
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM edt_pairs_cte
),
edt_walk(node, label) AS (
  SELECT src, src FROM edt_edges
  UNION
  SELECT e.dst, w.label FROM edt_walk w JOIN edt_edges e ON e.src = w.node
),
edt_lab AS (
  SELECT node, MIN(label) AS label FROM edt_walk GROUP BY node
),
edtc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS edt_nodes,
         CAST(COUNT(DISTINCT label) AS BIGINT) AS edt_entities
  FROM edt_lab
)
SELECT d.total, d.distinct_texts, d.removed,
       i.inc_flagged, i.inc_match_total, i.inc_dup_of_sum, i.inc_jac_musum,
       s.sem_kept, s.sem_kept_hash,
       p.spn_docs, p.spn_spans, p.spn_chars, p.spn_hash,
       e1.edt_pairs, e1.edt_hash, e2.edt_nodes, e2.edt_entities
FROM (
  SELECT COUNT(*) AS total, COUNT(DISTINCT text) AS distinct_texts,
         COUNT(*) - COUNT(DISTINCT text) AS removed
  FROM documents
) d, inc i, sem s, spn p, edtp e1, edtc e2
""".strip()


#: id split for the incremental-dedup fixture: doc_id ≥ INC_SPLIT plays
#: the freshly-ingested batch, doc_id < INC_SPLIT the standing corpus
#: (defined before the exact-stats oracle assignment below, which
#: splices the incremental certificate block)
INC_SPLIT = 450

# ORACLE_SQL["dedup_exact_stats"] is assigned at the bottom of the
# module: its oracle additionally splices the spn_* span-dedup
# certificate block, defined down there (round 10)


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: for every NEW document (doc_id ≥
    INC_SPLIT) that near-duplicates the standing corpus (doc_id <
    INC_SPLIT), report the lowest matching corpus doc, the match count,
    and the best Jaccard — the verdict an ingestion pipeline uses to
    drop already-known documents before they enter the corpus.

    Round 14 (guide §2.4, VERDICT item 5): computed from the SESSION
    PAIR INDEX (_minhash_pair_df — the shared LSH index with 4+ other
    consumers) restricted to (old, new) endpoints, which equals
    minhash_pairs_between exactly: bucket membership and the Jaccard
    verify are per-doc/per-pair, and with an id-based split every
    cross pair has doc_a on the old side — the same argument this
    operator's own oracle has ALWAYS replayed (it filters the full
    pair CTE), and the same restriction dedup_exact_stats' inc_* cert
    columns have hash-certified since round 4. Before this the entry
    re-ran the full double-sided signature+bucket+verify pipeline per
    call (~2.7 s LOCAL) next to an already-memoized identical pair
    graph. minhash_pairs_between stays as the primitive for true
    incremental ingest (a batch that is NOT part of the standing
    corpus relation)."""
    pairs = _minhash_pair_df(spark, sf_dir).filter(
        (F.col("doc_a") < INC_SPLIT) & (F.col("doc_b") >= INC_SPLIT)
    )
    return (
        pairs.groupBy(F.col("doc_b").alias("doc_id"))
        .agg(
            F.min("doc_a").alias("dup_of"),
            F.count(F.lit(1)).alias("n_matches"),
            F.max("jaccard").alias("best_jaccard"),
        )
        .orderBy("doc_id")
    )


def _incremental_oracle() -> str:
    """The cross-corpus pairs are exactly the full pair graph restricted
    to (old, new) endpoints — bucket membership and the Jaccard verify
    are per-doc/per-pair, and doc_a < doc_b with an id-based split means
    every cross pair has doc_a on the old side."""
    return f"""
WITH {_minhash_pair_ctes()}
SELECT doc_b AS doc_id, MIN(doc_a) AS dup_of, COUNT(*) AS n_matches,
       MAX(jaccard) AS best_jaccard
FROM pairs
WHERE doc_a < {INC_SPLIT} AND doc_b >= {INC_SPLIT}
GROUP BY doc_b ORDER BY doc_b
""".strip()


#: oracle-tested locally, not in the 50-slot driver contract
LOCAL_QUERIES = {
    "dedup_clusters_prop": dedup_clusters_prop,
    "semantic_dedup": semantic_dedup,
    "dedup_incremental": dedup_incremental,
}
LOCAL_ORACLE_SQL = {
    "dedup_clusters_prop": _clusters_oracle(),
    "semantic_dedup": _semantic_oracle(),
    "dedup_incremental": _incremental_oracle(),
}


# -- substring-level (span) dedup ---------------------------------------------

#: duplicated-span shingle width (chars) — also the minimum reportable
#: span length. The published operator (Lee et al., ACL'22
#: "Deduplicating Training Data Makes Language Models Better") uses
#: 50-token suffix-array matches over the full corpus; the
#: Spark-native equivalent detects spans as runs of globally-repeated
#: character shingles, which finds exactly the maximal repeated
#: substrings of length >= the width (every length-W window of a
#: repeated substring is itself repeated).
SPAN_W = 25


def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-SPAN statistics — substring-level dedup,
    the level below the document-level family (exact / MinHash /
    SimHash / n-gram / semantic): a position's length-``SPAN_W``
    shingle occurring anywhere else in the corpus (another doc OR the
    same doc — self-repetition counts, as in the reference algorithm)
    marks its ``SPAN_W`` characters duplicated; overlapping/adjacent
    marked windows merge into maximal spans (gaps-and-islands over the
    running max of span ends). Output per affected doc: span count,
    duplicated chars, duplicated fraction.

    100 TB shape: the (doc, pos) shingle relation is ~|corpus chars|
    rows — the honest cost of substring-level dedup (the suffix-array
    construction it replaces is the same size); shingles travel as
    16-byte md5s keyed BY HASH, and the duplicate test is two-phase:
    groupBy(h).count() (map-side combine collapses repeated shingles
    per partition before the shuffle) then an AQE-skew-splittable
    join-back of the count>1 hash set — never a window over h, which
    a boilerplate shingle would funnel into one partition. The island
    merge windows partition BY DOC — bounded by document length, never
    corpus-sized. No full text ever shuffles."""
    return dedup_spans_df(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


def dedup_spans_df(docs: DataFrame, materialize: bool = True) -> DataFrame:
    """dedup_spans over any (doc_id, text) relation — shared by the
    LOCAL operator and the spn_* certificate slice.

    ``materialize=False`` returns the raw lazy plan (plan-inspection
    hook, the graph_triangles pattern — the default eagerly
    checkpoints the doc-grain rollup so the shingle-proxy cache can be
    released; the caller of the lazy form owns the pinned ``pos``
    cache via the ``_pinned_relations`` handle)."""
    docs = docs.select("doc_id", "text", F.length("text").alias("n_chars"))
    eligible = docs.filter(F.col("n_chars") >= SPAN_W)
    # PERSIST the shingle proxy: it feeds BOTH the dup-hash aggregate
    # and the join-back probe side, and the two subtrees differ (one
    # exchanges partial counts, the other raw positions), so Spark's
    # ReusedExchange can never cover them — unpersisted, the corpus-
    # wide explode + per-position md5 ran TWICE per call. The cached
    # relation is the 28-byte-row proxy (doc, pos, 16-byte hash),
    # never the text (guide §8: cache/shuffle the lightweight proxy,
    # touch the heavy payload once); MEMORY_AND_DISK spills rather
    # than pins at scale. Measured at sf0.1: 12.6 s → 5.9 s, outputs
    # identical. Released below after the doc-grain rollup
    # materializes.
    from pyspark.storagelevel import StorageLevel

    pos = eligible.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.sequence(F.lit(1), F.col("n_chars") - (SPAN_W - 1))
        ).alias("p"),
        "text",
    ).select(
        "doc_id",
        "n_chars",
        "p",
        F.md5(F.col("text").substr(F.col("p"), F.lit(SPAN_W))).alias("h"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # two-phase dup test instead of count() OVER (PARTITION BY h): a
    # boilerplate shingle shared by millions of docs would land every
    # occurrence in ONE window partition, and AQE's skew mitigation
    # splits skewed JOINS, not window exchanges. groupBy gets map-side
    # combine (repeated shingles collapse per partition before the
    # shuffle) and the join-back on h IS AQE-skew-splittable — same
    # values, strictly better worst case (round-10 verdict #2).
    dup_hashes = (
        pos.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("h")
    )
    dup = pos.join(dup_hashes, "h").select(
        "doc_id", "n_chars", "p", (F.col("p") + (SPAN_W - 1)).alias("e")
    )
    by_doc = Window.partitionBy("doc_id").orderBy("p")
    prev_end = F.max("e").over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = dup.withColumn(
        "ni",
        (F.col("p") > F.coalesce(prev_end, F.lit(-1)) + 1).cast("int"),
    ).withColumn("island", F.sum("ni").over(by_doc))
    spans = isl.groupBy("doc_id", "n_chars", "island").agg(
        F.min("p").alias("s"), F.max("e").alias("e")
    )
    out = (
        spans.groupBy("doc_id", "n_chars")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
            F.sum(F.col("e") - F.col("s") + 1)
            .cast("bigint")
            .alias("dup_chars"),
        )
        .select(
            "doc_id",
            "n_dup_spans",
            "dup_chars",
            F.round(F.col("dup_chars") / F.col("n_chars"), 6).alias(
                "dup_ratio"
            ),
        )
        .orderBy("doc_id")
    )
    if not materialize:
        out._pinned_relations = (pos,)
        return out
    # doc-grain result (one row per affected doc) — materialize so
    # the shingle-proxy cache releases before return (the
    # pagerank/triangles discipline)
    lazy = out
    out = lazy.localCheckpoint(eager=True)
    from guagua_spark.metrics import record_plan

    record_plan("dedup_spans", lazy)
    pos.unpersist()
    return out


def _spans_ctes(source: str = "documents") -> str:
    """``spos`` → ``sdup`` → ``sisl`` → ``sspans`` CTE block replaying
    dedup_spans over any (doc_id, text) source relation — shared by
    the standalone LOCAL oracle and the spn_* certificate splice."""
    return f"""spos AS (
  SELECT doc_id, LENGTH(text) AS n_chars,
         unnest(generate_series(1, LENGTH(text) - {SPAN_W - 1})) AS p,
         text
  FROM {source} WHERE LENGTH(text) >= {SPAN_W}
),
sh AS (
  SELECT doc_id, n_chars, p,
         md5(text[p:p+{SPAN_W - 1}]) AS h
  FROM spos
),
sdup AS (
  SELECT doc_id, n_chars, p, p + {SPAN_W - 1} AS e
  FROM (SELECT *, COUNT(*) OVER (PARTITION BY h) AS c FROM sh)
  WHERE c > 1
),
sni AS (
  SELECT doc_id, n_chars, p, e,
         CASE WHEN p > COALESCE(MAX(e) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
             THEN 1 ELSE 0 END AS ni
  FROM sdup
),
sisl AS (
  SELECT doc_id, n_chars, p, e,
         SUM(ni) OVER (PARTITION BY doc_id ORDER BY p) AS island
  FROM sni
),
sspans AS (
  SELECT doc_id, n_chars, island, MIN(p) AS s, MAX(e) AS e
  FROM sisl GROUP BY 1, 2, 3
)"""


def _spans_oracle() -> str:
    return f"""
WITH {_spans_ctes()}
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
       CAST(SUM(e - s + 1) AS BIGINT) AS dup_chars,
       ROUND(CAST(SUM(e - s + 1) AS DOUBLE) / n_chars, 6) AS dup_ratio
FROM sspans
GROUP BY doc_id, n_chars
ORDER BY doc_id
""".strip()


LOCAL_QUERIES["dedup_spans"] = dedup_spans
LOCAL_ORACLE_SQL["dedup_spans"] = _spans_oracle()


#: id bound for the spn_* certificate slice spliced into
#: dedup_exact_stats: the pushed-down ``doc_id < SPN_CERT_DOCS``
#: filter keeps the certificate O(1) at any scale factor (the full
#: shingle relation is ~|corpus chars| rows — fine for the LOCAL
#: operator, not for a certificate that rides every contract sweep)
#: while still hash-certifying the whole span pipeline (shingle →
#: global dup count → island merge → per-doc stats) on real data.
SPN_CERT_DOCS = 400


def _spans_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (spn_docs, spn_spans, spn_chars, spn_hash) certificate of
    dedup_spans over the first SPN_CERT_DOCS documents — memoized per
    documents fingerprint (certmemo). spn_hash Σ-binds (doc_id,
    dup_chars) per affected doc through the Σ-safe binder (BIGINT-safe
    at any sf; a dropped doc, a shifted span boundary, or a miscounted
    island each flip it)."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.certmemo import cached_cert_row

    schema = (
        "spn_docs bigint, spn_spans bigint, spn_chars bigint,"
        " spn_hash bigint"
    )

    def build() -> DataFrame:
        docs = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < SPN_CERT_DOCS)
            .select("doc_id", "text")
        )
        return dedup_spans_df(docs).agg(
            F.count(F.lit(1)).cast("bigint").alias("spn_docs"),
            F.coalesce(F.sum("n_dup_spans"), F.lit(0))
            .cast("bigint")
            .alias("spn_spans"),
            F.coalesce(F.sum("dup_chars"), F.lit(0))
            .cast("bigint")
            .alias("spn_chars"),
            F.coalesce(
                F.sum(
                    binder_hash_col(
                        "spn", F.col("doc_id"), F.col("dup_chars")
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("spn_hash"),
        )

    return cached_cert_row(
        spark, sf_dir, "span_dedup", ("documents",), schema, build
    )


# -- edit-distance verification of LSH candidates (round 10) -----------------

#: max Levenshtein distance for a candidate pair to count as a verified
#: near-duplicate. sf0.01 probe: the LSH candidate set splits into true
#: near-dups at distance 4-20 and band collisions at ~300, so 20
#: separates cleanly at the synthetic doc lengths (48-553 chars).
EDIT_TAU = 20


def edit_verified_pairs(docs: DataFrame, tau: int = EDIT_TAU) -> DataFrame:
    """MinHash-LSH candidate pairs verified by BANDED edit distance —
    the block-then-verify record-linkage pipeline with Levenshtein as
    the verifier instead of shingle Jaccard (character-level edits that
    barely move a 3-word-shingle set still move edit distance, and vice
    versa — the two verifiers rank different near-dup classes).

    100 TB shape: candidates come from the banded LSH bucket self-join
    (never all-pairs — the same generation as minhash_pairs_for), and
    the verify uses Spark's THRESHOLDED levenshtein(l, r, tau): the
    banded DP visits O(tau · min(len)) cells and bails to -1 at the
    threshold, so a band collision between two long unrelated docs
    costs O(tau·n), not O(n²) — the reason a fixed tau keeps the verify
    stage linear in candidate count at any document length. Text joins
    back to candidates by doc_id, so full text shuffles only for
    candidate rows. The signature table is localCheckpoint'ed as in
    minhash_pairs_for (both bucket-join sides re-evaluate the
    k·|shingles| md5 folds otherwise)."""
    sig = (
        with_signature(docs)
        .select("doc_id", *[F.col(f"__mh{j}") for j in range(NUM_HASHES)])
        .localCheckpoint()
    )
    buckets = _band_buckets(sig)
    cand = _candidate_pairs(buckets)
    t = docs.select("doc_id", "text")
    joined = cand.join(
        t.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta")),
        "doc_a",
    ).join(
        t.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb")),
        "doc_b",
    )
    d = F.levenshtein(F.col("ta"), F.col("tb"), tau)
    return (
        joined.select(
            "doc_a",
            "doc_b",
            F.length("ta").cast("bigint").alias("len_a"),
            F.length("tb").cast("bigint").alias("len_b"),
            d.cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )


#: session memo of the edit-verified pair graph per sf_dir — same
#: contract as _PAIR_CACHE (fingerprint-keyed, one live entry,
#: clear_caches() drops it): the k·|shingles| signature pass dominates
#: and must not rerun for every consumer (pairs entry + clusters)
_EDIT_PAIR_CACHE: dict = {}


def _edit_pair_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from guagua_spark.memo import persisted_index
    from guagua_spark.sources.tables import table_fingerprint

    # repartition before signatures for the same reason as
    # _minhash_pair_df: the md5 folds run below the first exchange
    return persisted_index(
        _EDIT_PAIR_CACHE,
        sf_dir,
        table_fingerprint(sf_dir, "documents"),
        "edit_pairs",
        lambda: edit_verified_pairs(
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .repartition(spark.sparkContext.defaultParallelism)
        ),
    )


def dedup_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query entry: verified (doc_a, doc_b, len_a, len_b, edit_dist)
    near-dup pairs of the documents table, edit_dist ≤ EDIT_TAU —
    served from the session pair-graph memo."""
    return _edit_pair_df(spark, sf_dir).orderBy("doc_a", "doc_b")


def _edit_pairs_oracle() -> str:
    """Splices the shared LSH candidate CTEs, then DuckDB's (unbanded)
    levenshtein as the verify — same integers, O(n²) is fine for an
    oracle."""
    return f"""
WITH {_minhash_pair_ctes()}
SELECT doc_a, doc_b,
       CAST(LENGTH(x.text) AS BIGINT) AS len_a,
       CAST(LENGTH(y.text) AS BIGINT) AS len_b,
       CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist
FROM cand
JOIN documents x ON x.doc_id = cand.doc_a
JOIN documents y ON y.doc_id = cand.doc_b
WHERE levenshtein(x.text, y.text) <= {EDIT_TAU}
ORDER BY doc_a, doc_b
""".strip()


LOCAL_QUERIES["dedup_edit_pairs"] = dedup_edit_pairs
LOCAL_ORACLE_SQL["dedup_edit_pairs"] = _edit_pairs_oracle()


def dedup_edit_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: connected components over the
    EDIT-DISTANCE-verified pair graph (block → verify → resolve — the
    record-linkage pipeline's last stage). Each linked doc gets the
    smallest doc_id reachable through ≤ EDIT_TAU edit edges as its
    entity representative. Same star-contraction interior as
    dedup_clusters; only the verifier differs (banded levenshtein
    instead of shingle Jaccard), so transitivity artifacts — A~B~C
    linked while d(A,C) > τ — are resolved the standard way: one
    entity per component."""
    pairs = _edit_pair_df(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(
        pairs, "doc_a", "doc_b", algorithm="star"
    )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    ).orderBy("doc_id")


def _edit_clusters_oracle() -> str:
    """Recursive-CTE component walk over the edit-verified edge set —
    the _clusters_oracle shape with the levenshtein verify spliced in
    place of the Jaccard one."""
    return f"""
WITH RECURSIVE {_minhash_pair_ctes()},
epairs AS (
  SELECT doc_a, doc_b
  FROM cand
  JOIN documents x ON x.doc_id = cand.doc_a
  JOIN documents y ON y.doc_id = cand.doc_b
  WHERE levenshtein(x.text, y.text) <= {EDIT_TAU}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM epairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM epairs
),
walk(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS doc_id, MIN(label) AS cluster_id
FROM walk GROUP BY node ORDER BY doc_id
""".strip()


LOCAL_QUERIES["dedup_edit_clusters"] = dedup_edit_clusters
LOCAL_ORACLE_SQL["dedup_edit_clusters"] = _edit_clusters_oracle()

# deferred from the INC_SPLIT block above: the exact-stats oracle
# splices the spn_* CTE chain (span section) and the edt_* CTE chain
# (this section — EDIT_TAU must be bound before the f-string renders)
ORACLE_SQL["dedup_exact_stats"] = _exact_stats_oracle()


def _edit_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row ``edt_*`` certificate binding the edit-distance
    block→verify→resolve pipeline into the dedup_exact_stats contract
    row (round-10 verdict #6): verified pair count, a Σ-safe binder
    over every (doc_a, doc_b, edit_dist) triple (a missed pair, an
    extra pair, or a wrong distance all flip it), and the resolved
    component rollup (linked nodes, distinct entities). Reuses the
    memoized pair graph (_edit_pair_df — shared LSH candidates, banded
    levenshtein verify) and the star-contraction resolver, so the cost
    is one certmemo miss per corpus fingerprint."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.certmemo import cached_cert_row

    schema = (
        "edt_pairs bigint, edt_hash bigint, edt_nodes bigint, "
        "edt_entities bigint"
    )

    def build() -> DataFrame:
        pairs = _edit_pair_df(spark, sf_dir)
        p = pairs.agg(
            F.count(F.lit(1)).cast("bigint").alias("edt_pairs"),
            F.coalesce(
                F.sum(
                    binder_hash_col(
                        "edt",
                        F.col("doc_a"),
                        F.col("doc_b"),
                        F.col("edit_dist"),
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("edt_hash"),
        )
        labels = connected_components(
            pairs.select("doc_a", "doc_b"), "doc_a", "doc_b",
            algorithm="star",
        )
        c = labels.agg(
            F.count(F.lit(1)).cast("bigint").alias("edt_nodes"),
            F.coalesce(F.count_distinct("label"), F.lit(0))
            .cast("bigint")
            .alias("edt_entities"),
        )
        return p.crossJoin(c)

    return cached_cert_row(
        spark, sf_dir, "edit_dedup", ("documents",), schema, build
    )


def dedup_exact_stats_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_exact_stats over the md5 doc subset — the sweep's
    scale-feasible twin. The full row's oracle replays the MinHash
    pair CTEs AND (round 11) an unbanded levenshtein over every
    corpus-wide candidate pair, which is decades past the watchdog at
    sf100. The twin computes the doc stats, the incremental-ingest
    inc_* rollup, and the edit-resolve edt_* block over the SAMPLED
    corpus (pair membership is per-pair, so the subset is exact); the
    sem_*/spn_* certificates are already bounded slices (vec_id < 500
    / doc_id < 400) and stay IDENTICAL to the full row on both sides."""
    docs = _sampled_docs(spark, sf_dir)
    pairs = minhash_pairs_for(
        docs.repartition(spark.sparkContext.defaultParallelism)
    )
    cross = pairs.filter(
        (F.col("doc_a") < INC_SPLIT) & (F.col("doc_b") >= INC_SPLIT)
    )
    per_new = cross.groupBy("doc_b").agg(
        F.min("doc_a").alias("dup_of"),
        F.count(F.lit(1)).alias("n_matches"),
        F.max("jaccard").alias("best_jaccard"),
    )
    inc = per_new.agg(
        F.count(F.lit(1)).alias("inc_flagged"),
        F.coalesce(F.sum("n_matches"), F.lit(0))
        .cast("bigint")
        .alias("inc_match_total"),
        F.coalesce(F.sum("dup_of"), F.lit(0))
        .cast("bigint")
        .alias("inc_dup_of_sum"),
        F.coalesce(
            F.sum(F.round(F.col("best_jaccard") * 1e6).cast("bigint")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("inc_jac_musum"),
    )
    epairs = edit_verified_pairs(
        docs.repartition(spark.sparkContext.defaultParallelism)
    )
    from guagua_spark.functions.scale import binder_hash_col

    ep = epairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("edt_pairs"),
        F.coalesce(
            F.sum(
                binder_hash_col(
                    "edt",
                    F.col("doc_a"),
                    F.col("doc_b"),
                    F.col("edit_dist"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("edt_hash"),
    )
    elabels = connected_components(
        epairs.select("doc_a", "doc_b"), "doc_a", "doc_b", algorithm="star"
    )
    ec = elabels.agg(
        F.count(F.lit(1)).cast("bigint").alias("edt_nodes"),
        F.coalesce(F.count_distinct("label"), F.lit(0))
        .cast("bigint")
        .alias("edt_entities"),
    )
    return (
        docs.agg(
            F.count(F.lit(1)).alias("total"),
            F.countDistinct("text").alias("distinct_texts"),
            (F.count(F.lit(1)) - F.countDistinct("text")).alias("removed"),
        )
        .crossJoin(F.broadcast(inc))
        .crossJoin(F.broadcast(_sem_cert_df(spark, sf_dir)))
        .crossJoin(F.broadcast(_spans_cert_df(spark, sf_dir)))
        .crossJoin(F.broadcast(ep))
        .crossJoin(F.broadcast(ec))
    )


def _exact_stats_oracle_sampled() -> str:
    from guagua_spark.functions.scale import binder_hash_sql

    spn_binder = binder_hash_sql(
        "spn", "CAST(doc_id AS VARCHAR)", "CAST(dup_chars AS VARCHAR)"
    )
    sem_binder = binder_hash_sql("semb", "CAST(vec_id AS VARCHAR)")
    edt_binder = binder_hash_sql(
        "edt",
        "CAST(doc_a AS VARCHAR)",
        "CAST(doc_b AS VARCHAR)",
        "CAST(edit_dist AS VARCHAR)",
    )
    return f"""
WITH RECURSIVE {_docsamp_ctes()},
cert AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {SEM_CERT_VECS}
),
{_semantic_dropped_ctes(source="cert")},
sem AS (
  SELECT COUNT(*) AS sem_kept,
         CAST(SUM({sem_binder}) AS BIGINT) AS sem_kept_hash
  FROM cert WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
),
spncert AS (
  SELECT doc_id, text FROM documents WHERE doc_id < {SPN_CERT_DOCS}
),
{_spans_ctes(source="spncert")},
spndoc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         CAST(SUM(e - s + 1) AS BIGINT) AS dup_chars
  FROM sspans GROUP BY doc_id
),
spn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS spn_docs,
         CAST(COALESCE(SUM(n_dup_spans), 0) AS BIGINT) AS spn_spans,
         CAST(COALESCE(SUM(dup_chars), 0) AS BIGINT) AS spn_chars,
         CAST(COALESCE(SUM({spn_binder}), 0) AS BIGINT) AS spn_hash
  FROM spndoc
),
{_minhash_pair_ctes(source="dsamp")},
inc_per AS (
  SELECT doc_b, MIN(doc_a) AS dup_of, COUNT(*) AS n_matches,
         MAX(jaccard) AS best_jaccard
  FROM pairs
  WHERE doc_a < {INC_SPLIT} AND doc_b >= {INC_SPLIT}
  GROUP BY doc_b
),
inc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS inc_flagged,
         CAST(COALESCE(SUM(n_matches), 0) AS BIGINT) AS inc_match_total,
         CAST(COALESCE(SUM(dup_of), 0) AS BIGINT) AS inc_dup_of_sum,
         CAST(COALESCE(SUM(CAST(ROUND(best_jaccard * 1000000) AS BIGINT)),
                       0) AS BIGINT) AS inc_jac_musum
  FROM inc_per
),
edt_pairs_cte AS (
  SELECT doc_a, doc_b,
         levenshtein(x.text, y.text) AS edit_dist
  FROM cand
  JOIN dsamp x ON x.doc_id = cand.doc_a
  JOIN dsamp y ON y.doc_id = cand.doc_b
  WHERE levenshtein(x.text, y.text) <= {EDIT_TAU}
),
edtp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS edt_pairs,
         CAST(COALESCE(SUM({edt_binder}), 0) AS BIGINT) AS edt_hash
  FROM edt_pairs_cte
),
edt_edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM edt_pairs_cte
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM edt_pairs_cte
),
edt_walk(node, label) AS (
  SELECT src, src FROM edt_edges
  UNION
  SELECT e.dst, w.label FROM edt_walk w JOIN edt_edges e ON e.src = w.node
),
edt_lab AS (
  SELECT node, MIN(label) AS label FROM edt_walk GROUP BY node
),
edtc AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS edt_nodes,
         CAST(COUNT(DISTINCT label) AS BIGINT) AS edt_entities
  FROM edt_lab
)
SELECT d.total, d.distinct_texts, d.removed,
       i.inc_flagged, i.inc_match_total, i.inc_dup_of_sum, i.inc_jac_musum,
       s.sem_kept, s.sem_kept_hash,
       p.spn_docs, p.spn_spans, p.spn_chars, p.spn_hash,
       e1.edt_pairs, e1.edt_hash, e2.edt_nodes, e2.edt_entities
FROM (
  SELECT COUNT(*) AS total, COUNT(DISTINCT text) AS distinct_texts,
         COUNT(*) - COUNT(DISTINCT text) AS removed
  FROM dsamp
) d, inc i, sem s, spn p, edtp e1, edtc e2
""".strip()


SWEEP_SAMPLED["dedup_exact_stats"] = (
    dedup_exact_stats_sampled,
    _exact_stats_oracle_sampled(),
    _DOCSAMP_RULE
    + "; sem_*/spn_* certificate slices unchanged (already id-bounded)",
)
