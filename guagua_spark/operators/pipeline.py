"""The end-to-end training-data pipeline query: quality filter →
MinHash near-dup removal (cluster representatives kept) → per-language
corpus stats — ONE declarative plan.

This is the composition the individual operators exist for (reference
has nothing like it — SURVEY.md §2 note; this is the beyond-reference
extension layer): ``text.quality_scores``-style predicates prune the
corpus, ``dedup.minhash_pairs_for`` + ``dedup.connected_components``
find near-dup clusters WITHIN the filtered corpus, and an anti-join
drops every cluster member except its minimum-id representative. At
100 TB the quality filter is a map-side scan predicate (runs before
any shuffle, prunes before the expensive signature hashing), the LSH
dedup shuffles 16-byte keys not documents, and the final anti-join
broadcasts the tiny drop-list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from guagua_spark.operators.dedup import (
    _minhash_pair_ctes,
    connected_components,
)
from guagua_spark.sources.tables import load_table

MIN_TOKENS = 20
MIN_ALPHA_RATIO = 0.8


def _quality_pred():
    n_tokens = F.size(F.split(F.col("text"), " "))
    # try_divide: an empty doc would throw DIVIDE_BY_ZERO under ANSI
    # mode; NULL alpha makes the predicate false (doc filtered), which
    # is both the sensible semantics and DuckDB's x/0 behavior
    alpha = F.try_divide(
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")).cast(
            "double"
        ),
        F.length("text"),
    )
    return (n_tokens >= MIN_TOKENS) & (alpha >= MIN_ALPHA_RATIO)


# -- sampling / mixture operators ------------------------------------------

#: per-language keep rates for the stratified sample (down-sample the
#: over-represented languages, keep the rest whole — the standard
#: language-balancing move in corpus construction)
STRATIFIED_RATES: dict[str, float] = {"en": 0.5, "de": 0.75}
DEFAULT_RATE = 1.0

#: per-source character budget for the mixture (sources over budget are
#: down-sampled proportionally; sources under budget kept whole)
MIX_CHAR_BUDGET = 50_000


#: the shared deterministic uniform hash (functions/scale.u32_hash) —
#: re-exported under the historical private name used throughout the
#: sampling/packing operators
from guagua_spark.functions.scale import (  # noqa: E402
    binder_hash_col,
    binder_hash_sql,
)
from guagua_spark.functions.scale import u32_hash as _u32  # noqa: E402


def stratified_keep() -> "F.Column":
    """THE stratified-sample predicate — single definition shared by the
    batch operator and its streaming twin so the two can never drift
    (their row-set equality is asserted in tests/test_streaming.py)."""
    rate = F.lit(DEFAULT_RATE)
    for lang, r in STRATIFIED_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return _u32("strat", F.col("doc_id").cast("string")) < (
        rate * float(2**32)
    )


def _clean_docs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Quality filter → LSH near-dup removal: the cleaned corpus WITH
    text, plus the persisted filtered relation (caller unpersists once
    its consumer is materialized). Shared head of the clean-corpus
    rollup and the training-set build.

    The pair graph comes from the session's corpus near-dup index
    (dedup._minhash_pair_df) restricted to filtered endpoints with two
    semi-joins, instead of re-running the signature pass on the
    filtered corpus: LSH bucket membership and the Jaccard verify are
    per-doc/per-pair (no corpus-dependent state), so
    pairs(filtered) ≡ {(a,b) ∈ pairs(corpus) : a,b both pass the
    filter} EXACTLY — the recursive-CTE oracle, which computes pairs on
    the filtered set directly, stays hash-green (asserted). Reusing the
    index is also the 100 TB play: the near-dup sketch of a static
    corpus is computed once, not once per downstream query."""
    from guagua_spark.operators.dedup import _minhash_pair_df

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    filtered = docs.filter(_quality_pred()).persist()
    ids = filtered.select("doc_id")
    pairs_full = _minhash_pair_df(spark, sf_dir).select("doc_a", "doc_b")
    pairs = pairs_full.join(
        ids.withColumnRenamed("doc_id", "doc_a"), "doc_a", "left_semi"
    ).join(ids.withColumnRenamed("doc_id", "doc_b"), "doc_b", "left_semi")
    labels = connected_components(pairs, "doc_a", "doc_b")
    drop = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    clean = filtered.join(F.broadcast(drop), "doc_id", "left_anti")
    return clean, filtered


def _clean_slim(
    spark: SparkSession, sf_dir: str, checkpoint: bool = True
) -> DataFrame:
    """Quality filter → LSH near-dup removal → slim scalar projection
    (doc_id, lang, source, n_chars, n_toks) of the surviving corpus.
    With ``checkpoint`` the result is localCheckpoint'd so the two
    downstream passes (rates aggregate + final rollup) read the
    condensed relation instead of re-running the filter + anti-join
    subtree; pass False to inspect the full lineage (plan tests)."""
    clean, filtered = _clean_docs(spark, sf_dir)
    slim = clean.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).alias("n_toks"),
    )
    if checkpoint:
        slim = slim.localCheckpoint(eager=True)
        # the checkpoint materialized `slim`; the persisted filter
        # cache is no longer needed by anything downstream
        filtered.unpersist()
    return slim


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) stats of the cleaned corpus — quality filter →
    near-dup dedup — plus certified columns for the two sampling stages
    a real pipeline runs next (the driver contract caps at 50 rows, so
    the standalone stratified-sample / source-mix operators are
    certified through these columns):

    - ``strat_docs`` / ``strat_hash``: how many clean docs the
      per-language Bernoulli rule (stratified_keep — the SAME column
      expression the standalone operator and its streaming twin use)
      keeps, and the sum of their doc_ids (binds WHICH docs, not just
      how many).
    - ``mix_docs`` / ``mix_chars``: same certificates for the
      source-mixture rule at rates min(1, budget/total_chars(source))
      computed over the clean corpus.

    ``ts_n_seqs``/``ts_tokens``/``ts_checksum``: the end-to-end
    training-set-build certificate (pipeline_build_training_set =
    quality filter → LSH dedup → sequence packing) as typed literal
    columns — sequence count, packed-token total, and a Σ-safe
    binder-hash checksum over (bucket, seq_id, id_sum) binding WHICH
    docs land in WHICH sequence of the CLEANED corpus (round 10: the
    former weighted-id form overflowed BIGINT at sf100 — see
    functions/scale.binder_hash_col). Computed from the
    same checkpointed slim relation (pack_assignment needs only doc_id
    + token count), so the clean subtree runs once; the oracle splices
    the identical pack CTE block over its ``clean`` CTE. Certifies the
    composition LOCAL operator inside the 50-slot cap.

    ``tm_*`` (round 8): the temperature-rebalancing certificate
    (temperature_cert_df) — source count, kept total, Σ round(rate·10⁶)
    and a per-source result-row hash — as typed literal columns,
    driver-certifying pipeline_temperature_mix inside this green row.

    The mixture rates need per-source totals of the clean corpus while
    the mix predicate is per-row — two passes over the cleaned relation
    are inherent. To keep that cheap the clean corpus is condensed ONCE
    to a slim scalar projection (doc_id, lang, source, n_chars,
    n_toks — the text column never leaves the first pass) and
    checkpointed; the rates aggregate and the final rollup both read
    the condensed relation instead of re-running the filter + anti-join
    subtree."""
    from guagua_spark.operators.packing import PACK_BUCKETS, pack_assignment

    slim = _clean_slim(spark, sf_dir)
    bucket, seq, capped = pack_assignment(
        F.col("doc_id"), F.col("n_toks"), PACK_BUCKETS
    )
    seqs = (
        slim.select(
            "doc_id",
            bucket.alias("bucket"),
            seq.alias("seq_id"),
            capped.alias("capped"),
        )
        .groupBy("bucket", "seq_id")
        .agg(
            F.sum("capped").alias("seq_toks"),
            F.sum("doc_id").alias("id_sum"),
        )
    )
    from guagua_spark.operators.certmemo import cached_cert_cols

    # memoized per documents fingerprint (certmemo): the packing
    # rollup over the cleaned corpus is a pure function of the static
    # table — computed once, replayed as literals; miss cost reports
    # as _index:cert:training_set in the bench cold lane
    tcert_cols = cached_cert_cols(
        spark,
        sf_dir,
        "training_set",
        ("documents",),
        "ts_n_seqs bigint, ts_tokens bigint, ts_checksum bigint",
        lambda: seqs.agg(
            F.count(F.lit(1)).cast("bigint").alias("ts_n_seqs"),
            F.sum("seq_toks").cast("bigint").alias("ts_tokens"),
            # Σ-safe binder (round 10): the old weighted-id form
            # Σ (bucket·10⁶+seq+1)·id_sum reached ~1e21 at sf100 and
            # crashed Spark's ANSI bigint Σ — the first real defect
            # the decade probe caught. binder_hash_col bounds the row
            # term at <1e6, Σ-safe to ~9e12 sequences, same binding.
            F.sum(
                binder_hash_col(
                    "ts",
                    F.col("bucket"),
                    F.col("seq_id"),
                    F.col("id_sum"),
                )
            )
            .cast("bigint")
            .alias("ts_checksum"),
        ),
    )
    rates = slim.groupBy("source").agg(
        F.least(
            F.lit(1.0),
            # try_divide: a source of only empty docs has 0 total chars
            # (ANSI would crash); NULL → least picks 1.0 → keep whole
            F.try_divide(
                F.lit(float(MIX_CHAR_BUDGET)), F.sum("n_chars")
            ),
        ).alias("rate")
    )
    # dif_*/rch_* (round 7): snapshot-diff + incremental-re-chunk
    # certificate (diff_rechunk_cert_df), memoized per documents
    # fingerprint — driver-certifies pipeline_corpus_diff and
    # pipeline_incremental_chunks inside this same green row
    dif_cols = cached_cert_cols(
        spark,
        sf_dir,
        "corpus_diff",
        ("documents",),
        "dif_added bigint, dif_removed bigint, dif_changed bigint, "
        "dif_hash bigint, rch_chunks bigint, rch_tok_sum bigint, "
        "rch_checksum bigint",
        lambda: diff_rechunk_cert_df(spark, sf_dir),
    )
    # tm_* (round 8): the temperature-rebalancing certificate
    # (temperature_cert_df) — driver-certifies
    # pipeline_temperature_mix inside this same green row
    tm_cols = cached_cert_cols(
        spark,
        sf_dir,
        "temperature_mix",
        ("documents",),
        "tm_sources bigint, tm_kept bigint, tm_rate_e6 bigint, "
        "tm_hash bigint",
        lambda: temperature_cert_df(spark, sf_dir),
    )
    # skw_*/bud_* (round 9): pre-flight skew report + token-budget
    # selection certificate (skew_budget_cert_df) — driver-certifies
    # pipeline_source_skew and pipeline_select_within_budget inside
    # this same green row
    sb_cols = cached_cert_cols(
        spark,
        sf_dir,
        "skew_budget",
        ("documents",),
        "skw_rows bigint, skw_n_sum bigint, skw_share_e6 bigint, "
        "skw_hash bigint, bud_rows bigint, bud_tok_sum bigint, "
        "bud_hash bigint, bud_score_e6 bigint",
        lambda: skew_budget_cert_df(spark, sf_dir),
    )
    strat = stratified_keep()
    mix = _u32("mix", F.col("doc_id").cast("string")) < (
        F.col("rate") * float(2**32)
    )
    return (
        slim.join(rates, "source")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.when(strat, 1).otherwise(0)).alias("strat_docs"),
            # Σ-safe binder (ex strat_id_sum — Σ doc_id overflowed
            # BIGINT at ~4e9 rows; binder-magnitude audit, SCALE.md)
            F.sum(
                F.when(
                    strat, binder_hash_col("stratb", F.col("doc_id"))
                ).otherwise(0)
            ).alias("strat_hash"),
            F.sum(F.when(mix, 1).otherwise(0)).alias("mix_docs"),
            F.sum(F.when(mix, F.col("n_chars")).otherwise(0)).alias(
                "mix_chars"
            ),
        )
        .select("*", *tcert_cols, *dif_cols, *tm_cols, *sb_cols)
        .orderBy("lang", "source")
    )


def _pipeline_oracle() -> str:
    from guagua_spark.operators.packing import SEQ_TOKENS, _pack_ctes

    strat_cases = " ".join(
        f"WHEN lang = '{lang}' THEN {r!r}"
        for lang, r in STRATIFIED_RATES.items()
    )
    strat_keep = (
        "CAST(('0x' || substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 8))"
        " AS UBIGINT)"
        f" < (CASE {strat_cases} ELSE {DEFAULT_RATE!r} END) * 4294967296.0"
    )
    mix_keep = (
        "CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8))"
        " AS UBIGINT) < rate * 4294967296.0"
    )
    return f"""
WITH RECURSIVE filtered AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
    AND CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        / LENGTH(text) >= {MIN_ALPHA_RATIO}
),
{_minhash_pair_ctes(source="filtered")},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
walk(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
),
drop_ids AS (
  SELECT node FROM walk GROUP BY node HAVING node != MIN(label)
),
clean AS (
  SELECT * FROM filtered
  WHERE doc_id NOT IN (SELECT node FROM drop_ids)
),
rates AS (
  SELECT source,
         LEAST(1.0, {float(MIX_CHAR_BUDGET)!r} / SUM(n_chars)) AS rate
  FROM clean GROUP BY source
),
{_pack_ctes(source="clean")},
seqs AS (
  SELECT bucket,
         CAST(FLOOR((running - n_toks) / {float(SEQ_TOKENS)!r}) AS BIGINT)
           AS seq_id,
         SUM(n_toks) AS seq_toks, SUM(doc_id) AS id_sum
  FROM placed GROUP BY 1, 2
),
tcert AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS ts_n_seqs,
         CAST(SUM(seq_toks) AS BIGINT) AS ts_tokens,
         CAST(SUM({binder_hash_sql("ts", "CAST(bucket AS VARCHAR)",
                                   "CAST(seq_id AS VARCHAR)",
                                   "CAST(id_sum AS VARCHAR)")})
              AS BIGINT) AS ts_checksum
  FROM seqs
),
{_diff_cert_ctes()},
{_temperature_cert_ctes()},
{_skew_budget_cert_ctes()}
SELECT lang, cl.source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN {strat_keep} THEN 1 ELSE 0 END) AS BIGINT)
         AS strat_docs,
       CAST(SUM(CASE WHEN {strat_keep}
                THEN {binder_hash_sql("stratb", "CAST(doc_id AS VARCHAR)")}
                ELSE 0 END) AS BIGINT)
         AS strat_hash,
       CAST(SUM(CASE WHEN {mix_keep} THEN 1 ELSE 0 END) AS BIGINT)
         AS mix_docs,
       CAST(SUM(CASE WHEN {mix_keep} THEN n_chars ELSE 0 END) AS BIGINT)
         AS mix_chars,
       ts_n_seqs, ts_tokens, ts_checksum,
       dif_added, dif_removed, dif_changed, dif_hash,
       rch_chunks, rch_tok_sum, rch_checksum,
       tm_sources, tm_kept, tm_rate_e6, tm_hash,
       skw_rows, skw_n_sum, skw_share_e6, skw_hash,
       bud_rows, bud_tok_sum, bud_hash, bud_score_e6
FROM clean cl JOIN rates r ON cl.source = r.source, tcert, dcert, rcert,
     tmcert, skwcert, budcert
GROUP BY lang, cl.source, ts_n_seqs, ts_tokens, ts_checksum,
         dif_added, dif_removed, dif_changed, dif_hash,
         rch_chunks, rch_tok_sum, rch_checksum,
         tm_sources, tm_kept, tm_rate_e6, tm_hash,
         skw_rows, skw_n_sum, skw_share_e6, skw_hash,
         bud_rows, bud_tok_sum, bud_hash, bud_score_e6
ORDER BY lang, cl.source
""".strip()


QUERIES = {"pipeline_clean_corpus": pipeline_clean_corpus}

# filled at the bottom of the module: the oracle splices the
# dif_*/rch_* certificate CTEs, defined down there
ORACLE_SQL: dict[str, str] = {}


def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language Bernoulli sample of the documents
    table: language ℓ keeps doc iff u32(md5('strat|doc_id')) <
    rate(ℓ)·2³². Pure map-side scan predicate — no shuffle except the
    presentation sort; at 100 TB this is a single codegen'd pass and
    the sample is reproducible run-to-run and engine-to-engine."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        docs.filter(stratified_keep())
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _stratified_oracle() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN {r!r}"
        for lang, r in STRATIFIED_RATES.items()
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE CAST(('0x' || substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS UBIGINT)
      < (CASE {cases} ELSE {DEFAULT_RATE!r} END) * 4294967296.0
ORDER BY doc_id
""".strip()


def pipeline_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture construction: each source gets keep rate
    min(1, budget / total_chars(source)), applied with the same
    deterministic u32 Bernoulli rule; reports per-source totals of the
    mixed corpus.

    Two-phase plan: (1) one partial-aggregated groupBy computes
    per-source character totals; (2) the scan-side filter keeps
    documents under the per-source rate. This is the standard
    "down-sample over-represented domains to a token budget" step of
    corpus mixing, expressed as two codegen'd passes. No forced
    broadcast on the rate join: a mixture config is usually tens of
    sources and AQE converts to broadcast at runtime, but `source`
    could be a web-domain-cardinality column, where a mandatory hint
    would be the per-user-aggregate OOM anti-pattern.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    totals = docs.groupBy("source").agg(
        F.sum("n_chars").alias("total_chars")
    )
    rates = totals.select(
        "source",
        F.least(
            F.lit(1.0),
            F.try_divide(
                F.lit(float(MIX_CHAR_BUDGET)), F.col("total_chars")
            ),
        ).alias("rate"),
    )
    keep = _u32("mix", F.col("doc_id").cast("string")) < (
        F.col("rate") * float(2**32)
    )
    mixed = docs.join(rates, "source").filter(keep)
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sampled_chars"),
        )
        .orderBy("source")
    )


def _source_mix_oracle() -> str:
    return f"""
WITH rates AS (
  SELECT source,
         LEAST(1.0, {float(MIX_CHAR_BUDGET)!r} / SUM(n_chars)) AS rate
  FROM documents GROUP BY source
)
SELECT d.source, COUNT(*) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
FROM documents d JOIN rates r ON d.source = r.source
WHERE CAST(('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8))
           AS UBIGINT)
      < r.rate * 4294967296.0
GROUP BY d.source ORDER BY d.source
""".strip()


WSAMPLE_K = 100
WSAMPLE_TAG = "wsample"


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
    tag: str = WSAMPLE_TAG,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): per row draw u from the engine-portable
    u32 hash, rank by u^(1/w), keep the k largest — inclusion
    probability proportional to weight, reproducible on any engine and
    under any repartitioning (the 'importance-sample documents by
    quality weight' step of a data mixture, where Bernoulli sampling
    can't hit an exact budget k). Rows with weight ≤ 0 get key 0 —
    ineligible unless fewer than k positive-weight rows exist.

    100 TB plan: orderBy(limit k) compiles to TakeOrderedAndProject —
    each partition keeps its local top-k, the driver merges P·k rows —
    no global sort, no single-task window. Weight 0 rows get key
    u^inf = 0 and can never enter the sample."""
    from guagua_spark.functions.scale import u32_hash

    u = (
        u32_hash(tag, F.col(key_col).cast("string")).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    # non-positive weights are INELIGIBLE, not super-eligible: without
    # the guard, w < 0 gives u^(1/w) > 1, outranking every valid row
    skey = F.when(
        F.col(weight_col) > 0,
        F.pow(u, F.lit(1.0) / F.col(weight_col)),
    ).otherwise(F.lit(0.0))
    return (
        df.withColumn("__skey", skey)
        .orderBy(F.desc("__skey"))
        .limit(k)
        .drop("__skey")
    )


def pipeline_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Query entry: the k=WSAMPLE_K length-weighted document sample —
    longer documents proportionally likelier, exact budget."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    return weighted_sample(docs, "n_chars", "doc_id", WSAMPLE_K)


def _weighted_sample_oracle() -> str:
    return f"""
SELECT doc_id, n_chars FROM documents
ORDER BY POWER(
  (CAST(('0x' || substr(md5('{WSAMPLE_TAG}|' || CAST(doc_id AS VARCHAR)), 1, 8))
        AS UBIGINT) + 0.5) / 4294967296.0,
  1.0 / n_chars) DESC
LIMIT {WSAMPLE_K}
""".strip()


#: temperature for the rebalanced source mixture: sampling probability
#: p_s ∝ n_s^(1/T) with 1/T = 0.5 — the multilingual-LM recipe
#: (upsample the tail, downsample the head) with α = 0.5 EXACTLY so
#: the weight is sqrt(n): IEEE requires sqrt to be correctly rounded,
#: so both engines derive bit-identical rates (pow/exp would not be).
TEMP_TARGET_FRAC = 0.6


def temperature_rates(docs: DataFrame) -> DataFrame:
    """THE tempered rate law — (source, n_docs, rate) with
    rate = min(1, TEMP_TARGET_FRAC·N·√n_s / Z / n_s) — single
    definition shared by the batch operator and its streaming twin so
    the two can never drift (round-8 review; the same shared-expression
    contract as stratified_keep)."""
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    norm = counts.agg(
        F.sum(F.sqrt(F.col("n_docs"))).alias("z"),
        F.sum("n_docs").alias("n_total"),
    )
    return counts.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(1.0),
            F.lit(TEMP_TARGET_FRAC)
            * F.col("n_total")
            * F.sqrt(F.col("n_docs"))
            / F.col("z")
            / F.col("n_docs"),
        ).alias("rate"),
    )


def pipeline_temperature_mix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-rebalanced source mixture: target sampling
    probability p_s ∝ sqrt(n_s), keep-rate_s = min(1, target·p_s/n_s)
    with target = TEMP_TARGET_FRAC·N — over-represented sources get
    down-sampled toward the tempered distribution while small sources
    are kept whole; membership is the deterministic md5-Bernoulli rule
    (u32('tmix'|doc_id) < rate·2³²), reproducible engine-to-engine and
    under repartitioning. Output per source: n_docs, the tempered
    rate, kept count, kept-id sum (binds WHICH docs).

    100 TB shape: one partial-agg exchange for source counts (bounded
    = |sources| rows), the normalizer and target ride a 1-row
    broadcast, the keep rule is a map-side hash predicate on the
    second scan — the same skeleton as pipeline_source_mix, with the
    rate LAW swapped. Float-exactness: sqrt is correctly rounded by
    IEEE; the only order-dependent float is the |sources|-term
    normalizer sum, whose last-ulp noise moves the 2³²-scaled keep
    threshold by ~1e-6 of one u32 step — a flip needs a doc's hash
    inside that window (P ≈ 2e-16 per doc)."""
    from guagua_spark.functions.scale import u32_hash

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    rates = temperature_rates(docs)
    keep = u32_hash("tmix", F.col("doc_id").cast("string")) < (
        F.col("rate") * float(2**32)
    )
    return (
        docs.join(rates, "source")
        .groupBy("source")
        .agg(
            F.min("n_docs").alias("n_docs"),
            F.round(F.min("rate"), 6).alias("rate"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("kept"),
            # Σ-safe binder (ex kept_id_sum — binder-magnitude audit)
            F.sum(
                F.when(
                    keep, binder_hash_col("tmixb", F.col("doc_id"))
                ).otherwise(0)
            ).alias("kept_hash"),
        )
        .orderBy("source")
    )


def _temperature_mix_oracle() -> str:
    u32 = (
        "CAST(('0x' || substr(md5('tmix|' || CAST(doc_id AS VARCHAR)),"
        " 1, 8)) AS UBIGINT)"
    )
    return f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
norm AS (
  SELECT SUM(sqrt(CAST(n_docs AS DOUBLE))) AS z, SUM(n_docs) AS n_total
  FROM counts
),
rates AS (
  SELECT source, n_docs,
         LEAST(1.0, {TEMP_TARGET_FRAC!r} * n_total
               * sqrt(CAST(n_docs AS DOUBLE)) / z / n_docs) AS rate
  FROM counts, norm
)
SELECT d.source, CAST(MIN(r.n_docs) AS BIGINT) AS n_docs,
       ROUND(MIN(r.rate), 6) AS rate,
       CAST(SUM(CASE WHEN {u32} < r.rate * 4294967296.0
                THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       CAST(SUM(CASE WHEN {u32} < r.rate * 4294967296.0
                THEN {binder_hash_sql("tmixb", "CAST(doc_id AS VARCHAR)")}
                ELSE 0 END) AS BIGINT) AS kept_hash
FROM documents d JOIN rates r ON d.source = r.source
GROUP BY d.source ORDER BY d.source
""".strip()


#: token-budget floor for the quality-ranked corpus selection; the
#: effective budget scales with the corpus (GREATEST(floor,
#: SELECT_TOKEN_FRAC·total tokens)) so the kept fraction never
#: vanishes as sf grows (round-8 advice)
SELECT_TOKEN_BUDGET = 50_000
SELECT_TOKEN_FRAC = 0.1


def pipeline_select_within_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-budget corpus selection: rank documents by quality (alpha
    ratio — the same cross-engine-exact expression the clean-corpus
    filter uses) and keep the greedy prefix whose cumulative token
    count fits the budget — "spend the token budget on the best data",
    the data-selection step after cleaning/dedup. The budget is
    GREATEST(SELECT_TOKEN_BUDGET, floor(SELECT_TOKEN_FRAC·Σ n_toks)),
    so it tracks corpus size (both engines compute double(T)·0.1 → the
    FLOOR boundary is IEEE-identical).

    Skew-safe global cumsum: a running sum over a global ORDER BY is a
    SinglePartition window (one task sorts the corpus). Instead the
    score axis is bucketed at the score's own 6dp resolution
    (bucket = round(score·10⁶) — monotone in score, so cross-bucket
    order IS score order and EQUAL scores can never straddle buckets):
    per-bucket token totals (map-side partial agg) → prefix offsets
    over the bucket relation (the only single-partition window —
    bounded by the score DOMAIN at ≤10⁶+1 rows regardless of corpus
    size, never corpus-proportional) → within-bucket running sum
    partitioned by bucket. A near-corpus-sized bucket now requires
    most documents to share one exact 6dp quality score (fixed
    20-range bucketing put 99.6% of real docs in ONE bucket — round-8
    advice). Output (doc_id, score, n_toks, cum_toks) equals the
    single-window form for any data; cum_toks binds the full selection
    ORDER, so the SQL oracle (plain global window) checks the
    decomposition exactly."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    docs = docs.filter(F.length("text") > 0)
    score = F.length(
        F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")
    ).cast("double") / F.length("text")
    s = docs.select(
        "doc_id",
        score.alias("score"),
        F.size(F.split(F.col("text"), " ")).alias("n_toks"),
    )
    budget = s.agg(
        F.greatest(
            F.lit(SELECT_TOKEN_BUDGET).cast("bigint"),
            F.floor(
                F.sum("n_toks").cast("double")
                * F.lit(SELECT_TOKEN_FRAC)
            ),
        ).alias("__budget")
    )
    b = s.withColumn(
        "__b", F.round(F.col("score") * 1e6).cast("bigint")
    )
    totals = b.groupBy("__b").agg(F.sum("n_toks").alias("__btot"))
    from pyspark.sql.window import Window

    w_off = (
        Window.orderBy(F.col("__b").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__b",
        F.coalesce(F.sum("__btot").over(w_off), F.lit(0)).alias(
            "__off"
        ),
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy(F.col("score").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(offsets), "__b")
        .withColumn(
            "cum_toks", F.col("__off") + F.sum("n_toks").over(w_in)
        )
        .join(F.broadcast(budget))
        .filter(F.col("cum_toks") <= F.col("__budget"))
        .select(
            "doc_id",
            F.round("score", 6).alias("score"),
            "n_toks",
            "cum_toks",
        )
        .orderBy(F.col("score").desc(), "doc_id")
    )


def _select_budget_oracle() -> str:
    return f"""
WITH s AS (
  SELECT doc_id,
         CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           / LENGTH(text) AS score,
         len(string_split(text, ' ')) AS n_toks
  FROM documents WHERE LENGTH(text) > 0
),
budget AS (
  SELECT GREATEST({SELECT_TOKEN_BUDGET},
                  FLOOR(CAST(SUM(n_toks) AS DOUBLE)
                        * {SELECT_TOKEN_FRAC!r})) AS b
  FROM s
),
c AS (
  SELECT doc_id, score, n_toks,
         SUM(n_toks) OVER (ORDER BY score DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum_toks
  FROM s
)
SELECT doc_id, ROUND(score, 6) AS score,
       CAST(n_toks AS BIGINT) AS n_toks,
       CAST(cum_toks AS BIGINT) AS cum_toks
FROM c, budget WHERE cum_toks <= b
ORDER BY score DESC, doc_id
""".strip()


#: pinned knobs for the skew report host (explicit so the SQL oracle
#: replays the thresholds regardless of session conf)
SKEW_COUNTERS = 64
SKEW_SALTS = 16
SKEW_PARTS = 32


def pipeline_source_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight skew diagnostics on the corpus's source key (the
    partition/join key a by-source pipeline stage would shuffle on):
    exact share per heavy value + the salting recommendation —
    functions.sketch.skew_report over documents.source. At 100 TB this
    report runs BEFORE the expensive job (candidate-sized shuffle);
    thresholds are pinned (SKEW_*) so the DuckDB oracle replays the
    recommendation column bit-identically."""
    from guagua_spark.functions.sketch import skew_report

    docs = load_table(spark, sf_dir, "documents").select("source")
    return skew_report(
        docs,
        "source",
        counters=SKEW_COUNTERS,
        n_salts=SKEW_SALTS,
        shuffle_partitions=SKEW_PARTS,
    )


def _source_skew_oracle() -> str:
    return f"""
WITH vals AS (
  SELECT source AS v FROM documents WHERE source IS NOT NULL
),
tot AS (SELECT COUNT(*) AS n FROM vals)
SELECT v AS source, COUNT(*) AS n,
       ROUND(COUNT(*) / CAST(tot.n AS DOUBLE), 6) AS share,
       {SKEW_SALTS} AS salted_tasks,
       CASE WHEN COUNT(*) / CAST(tot.n AS DOUBLE) >= 0.5 / {SKEW_PARTS}
            THEN 'salt' ELSE 'none' END AS recommendation
FROM vals, tot
GROUP BY v, tot.n
HAVING COUNT(*) > CAST(tot.n AS DOUBLE) / {SKEW_COUNTERS + 1}
ORDER BY share DESC, source
""".strip()


def corpus_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    key: str = "doc_id",
    payload: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions: (key, status) for
    every ADDED / REMOVED / CHANGED row — the dataset-version
    comparison that drives incremental processing (re-embed only
    changed docs, re-dedup only added ones, audit a crawl refresh).

    100 TB plan: both sides project to (key, md5(payload)) BEFORE the
    full outer join, so payloads never shuffle — 24 bytes per row move
    however wide the documents are; unchanged rows (the overwhelming
    majority between adjacent versions) are filtered immediately after
    the join, map-side of anything downstream.

    NULL payloads are legal: presence is carried by explicit marker
    columns and the hash comparison is null-safe, so a row whose
    payload is NULL in both versions is unchanged, NULL→value and
    value→NULL are changed — md5(NULL)=NULL must never masquerade as
    row absence."""
    oh = old_df.select(
        F.col(key),
        F.md5(F.col(payload)).alias("__oh"),
        F.lit(True).alias("__in_old"),
    )
    nh = new_df.select(
        F.col(key),
        F.md5(F.col(payload)).alias("__nh"),
        F.lit(True).alias("__in_new"),
    )
    j = oh.join(nh, key, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("__oh").eqNullSafe(F.col("__nh")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(F.col(key), status.alias("status"))
        .filter(F.col("status") != "unchanged")
    )


#: deterministic synthetic version split for the query entry: "old" is
#: doc_id % 3 != 0, "new" is doc_id % 3 != 1 with every %7==0 doc's
#: text edited — yields all three statuses from the static fixture
_DIFF_EDIT = "doc_id % 7 = 0"


def _synthetic_versions(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The ONE definition of the fixture's (old, new) version split —
    shared by pipeline_corpus_diff and pipeline_incremental_chunks so
    their cross-query delta invariant can't silently drift."""
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 != 1).withColumn(
        "text",
        F.when(
            F.expr(_DIFF_EDIT), F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return old, new


def pipeline_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    old, new = _synthetic_versions(docs)
    return corpus_diff(old, new).orderBy("doc_id")


def _diff_ctes() -> str:
    """``dv_o``/``dv_n``/``dstat``/``dtodo`` CTE block replaying
    _synthetic_versions + corpus_diff (presence from KEY nullness —
    keys are non-null in the corpus — and a null-safe hash compare,
    matching corpus_diff's marker semantics) — shared by both
    standalone oracles and the dif_*/rch_* certificate splice inside
    pipeline_clean_corpus, so the three can't drift."""
    return f"""dv_o AS (
  SELECT doc_id, md5(text) AS oh FROM documents WHERE doc_id % 3 <> 0
),
dv_n AS (
  SELECT doc_id,
         CASE WHEN {_DIFF_EDIT} THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 3 <> 1
),
dstat AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.oh IS DISTINCT FROM md5(n.text) THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM dv_o o FULL OUTER JOIN dv_n n ON o.doc_id = n.doc_id
),
dtodo AS (
  -- added (no old row) or changed (null-safe hash mismatch)
  SELECT n.doc_id, n.text FROM dv_n n LEFT JOIN dv_o o USING (doc_id)
  WHERE o.doc_id IS NULL OR o.oh IS DISTINCT FROM md5(n.text)
)"""


def _corpus_diff_oracle() -> str:
    return f"""
WITH {_diff_ctes()}
SELECT doc_id, status FROM dstat WHERE status <> 'unchanged'
ORDER BY doc_id
""".strip()


def _incremental_chunk_rows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Unordered re-chunk of the added/changed delta — shared by the
    standalone query and the rch_* certificate."""
    from guagua_spark.operators.packing import chunk_docs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    old, new = _synthetic_versions(docs)
    todo_keys = (
        corpus_diff(old, new)
        .filter(F.col("status") != "removed")
        .select("doc_id")
    )
    todo = new.join(todo_keys, "doc_id", "left_semi")
    return chunk_docs(todo, ordered=False)


def pipeline_incremental_chunks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The incremental-processing composition corpus_diff exists for:
    re-chunk ONLY the added/changed documents of the new corpus
    version — O(delta) work per refresh instead of re-chunking the
    corpus (at 100 TB an adjacent-crawl delta is a small fraction; the
    diff's 24 B/row join finds it without shuffling payloads, then the
    chunker's map-side explode touches only the delta's text)."""
    return _incremental_chunk_rows(spark, sf_dir).orderBy(
        "doc_id", "chunk_id"
    )


def _incremental_chunks_oracle() -> str:
    from guagua_spark.operators.packing import _CHUNKS_SELECT, _chunks_ctes

    return f"""
WITH {_diff_ctes()},
{_chunks_ctes("dtodo")}
{_CHUNKS_SELECT}
""".strip()


def diff_rechunk_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row certificate binding BOTH incremental-processing operators
    into a hash-checked contract row (the column-merge pattern,
    SURVEY.md §7): per-status diff counts + a status-weighted id sum
    (binds WHICH docs carry WHICH status), and the delta re-chunk's
    chunk count / token total / per-chunk u32(md5) checksum over the
    full (doc, ordinal, content-hash) identity — so a wrong diff, a
    missed delta doc, or a corrupted chunk all flip an integer."""
    from guagua_spark.functions.scale import u32_hash

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    old, new = _synthetic_versions(docs)
    d = corpus_diff(old, new)
    w = (
        F.when(F.col("status") == "added", 1)
        .when(F.col("status") == "removed", 2)
        .otherwise(3)
        .cast("bigint")
    )
    dcert = d.agg(
        F.sum((F.col("status") == "added").cast("bigint")).alias(
            "dif_added"
        ),
        F.sum((F.col("status") == "removed").cast("bigint")).alias(
            "dif_removed"
        ),
        F.sum((F.col("status") == "changed").cast("bigint")).alias(
            "dif_changed"
        ),
        # Σ-safe binder (ex dif_id_wsum = Σ doc_id·{1,2,3} — overflow
        # horizon ~2.5e9 docs; binder-magnitude audit, SCALE.md)
        F.sum(binder_hash_col("dif", F.col("doc_id"), w))
        .cast("bigint")
        .alias("dif_hash"),
    )
    rcert = _incremental_chunk_rows(spark, sf_dir).agg(
        F.count(F.lit(1)).cast("bigint").alias("rch_chunks"),
        F.sum("chunk_toks").cast("bigint").alias("rch_tok_sum"),
        # per-row terms bounded < 1e6 (ex Σ raw u32, overflow at ~2e9
        # chunks; binder-magnitude audit, SCALE.md)
        F.sum(
            binder_hash_col(
                "cdiff",
                F.col("doc_id"),
                F.col("chunk_id"),
                F.col("chunk_md5"),
            )
        )
        .cast("bigint")
        .alias("rch_checksum"),
    )
    return dcert.crossJoin(rcert)


def temperature_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row certificate binding pipeline_temperature_mix into a
    hash-checked contract row (the column-merge pattern, SURVEY.md §7):
    source count, total kept, Σ round(rate·10⁶) over the 6dp-rounded
    tempered rates, and a u32(md5) over each source's full
    (source, kept, kept_hash) result row — so a wrong rate law, a
    flipped membership, or a miscounted source all flip an integer.
    Runs the REAL operator (not a re-derivation), so the oracle's
    independent replay certifies the whole temperature-mix pipeline."""
    tm = pipeline_temperature_mix(spark, sf_dir)
    # coalesce the string key: concat_ws skips nulls while the
    # oracle's || nulls the whole hash (round-8 review)
    binder = _u32(
        "tm",
        F.concat_ws(
            "|",
            F.coalesce(F.col("source"), F.lit("~")),
            F.col("kept").cast("string"),
            F.col("kept_hash").cast("string"),
        ),
    )
    return tm.agg(
        F.count(F.lit(1)).cast("bigint").alias("tm_sources"),
        F.sum("kept").cast("bigint").alias("tm_kept"),
        F.sum(F.round(F.col("rate") * 1e6))
        .cast("bigint")
        .alias("tm_rate_e6"),
        F.sum(binder).cast("bigint").alias("tm_hash"),
    )


def _temperature_cert_ctes() -> str:
    """``tm_counts`` → … → ``tmcert`` 1-row CTE block replaying
    temperature_cert_df — spliced into the pipeline_clean_corpus
    oracle. Names are tm_-prefixed: the host oracle already defines
    ``rates``/``counts``-shaped CTEs for its own stages."""
    u32_doc = (
        "CAST(('0x' || substr(md5('tmix|' || CAST(doc_id AS VARCHAR)),"
        " 1, 8)) AS UBIGINT)"
    )
    u32_row = (
        "CAST(('0x' || substr(md5('tm|' || coalesce(source, '~') ||"
        " '|' || CAST(kept AS VARCHAR) || '|' ||"
        " CAST(kept_hash AS VARCHAR)), 1, 8)) AS UBIGINT)"
    )
    return f"""tm_counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tm_norm AS (
  SELECT SUM(sqrt(CAST(n_docs AS DOUBLE))) AS z, SUM(n_docs) AS n_total
  FROM tm_counts
),
tm_rates AS (
  SELECT source, n_docs,
         LEAST(1.0, {TEMP_TARGET_FRAC!r} * n_total
               * sqrt(CAST(n_docs AS DOUBLE)) / z / n_docs) AS rate
  FROM tm_counts, tm_norm
),
tm_rows AS (
  SELECT d.source, ROUND(MIN(r.rate), 6) AS rate,
         CAST(SUM(CASE WHEN {u32_doc} < r.rate * 4294967296.0
                  THEN 1 ELSE 0 END) AS BIGINT) AS kept,
         CAST(SUM(CASE WHEN {u32_doc} < r.rate * 4294967296.0
                  THEN {binder_hash_sql("tmixb", "CAST(doc_id AS VARCHAR)")}
                  ELSE 0 END) AS BIGINT) AS kept_hash
  FROM documents d JOIN tm_rates r ON d.source = r.source
  GROUP BY d.source
),
tmcert AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS tm_sources,
         CAST(SUM(kept) AS BIGINT) AS tm_kept,
         CAST(SUM(ROUND(rate * 1e6)) AS BIGINT) AS tm_rate_e6,
         CAST(SUM({u32_row}) AS BIGINT) AS tm_hash
  FROM tm_rows
)"""


def skew_budget_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row certificate binding pipeline_source_skew AND
    pipeline_select_within_budget into the clean-corpus contract row
    (column-merge pattern, SURVEY.md §7). Runs the REAL operators, not
    re-derivations, so the oracle's independent replay certifies both
    pipelines end-to-end: ``skw_hash`` u32-binds every hot key's
    (source, recommendation) pair — a flipped salting decision or a
    missed heavy hitter flips an integer; ``bud_hash`` binds the
    full selection ORDER through cum_toks; ``skw_share_e6`` /
    ``bud_score_e6`` sum per-row 6dp-rounded integers (cents pattern —
    exact at any sf, never a rounded multi-row float SUM)."""
    from guagua_spark.functions.scale import u32_hash

    skw = pipeline_source_skew(spark, sf_dir)
    skw_binder = u32_hash(
        "skw",
        F.concat_ws("|", F.col("source"), F.col("recommendation")),
    )
    skw_row = skw.agg(
        F.count(F.lit(1)).cast("bigint").alias("skw_rows"),
        F.sum("n").cast("bigint").alias("skw_n_sum"),
        F.sum(F.round(F.col("share") * 1e6))
        .cast("bigint")
        .alias("skw_share_e6"),
        F.sum(skw_binder).cast("bigint").alias("skw_hash"),
    )
    bud = pipeline_select_within_budget(spark, sf_dir)
    bud_row = bud.agg(
        F.count(F.lit(1)).cast("bigint").alias("bud_rows"),
        F.sum("n_toks").cast("bigint").alias("bud_tok_sum"),
        # Σ-safe binder (round 10): Σ doc_id·cum_toks reached ~1e20
        # at sf100 (cum_toks grows with the corpus token budget) —
        # same overflow class as ts_checksum
        F.sum(binder_hash_col("bud", F.col("doc_id"), F.col("cum_toks")))
        .cast("bigint")
        .alias("bud_hash"),
        F.sum(F.round(F.col("score") * 1e6))
        .cast("bigint")
        .alias("bud_score_e6"),
    )
    return skw_row.crossJoin(bud_row)


def _skew_budget_cert_ctes() -> str:
    """``skw_*`` → ``skwcert`` + ``bud_*`` → ``budcert`` 1-row CTE
    blocks replaying skew_budget_cert_df — spliced into the
    pipeline_clean_corpus oracle."""
    u32_row = (
        "CAST(('0x' || substr(md5('skw|' || source || '|' ||"
        " recommendation), 1, 8)) AS UBIGINT)"
    )
    return f"""skw_vals AS (
  SELECT source AS v FROM documents WHERE source IS NOT NULL
),
skw_tot AS (SELECT COUNT(*) AS n FROM skw_vals),
skw_hot AS (
  SELECT v AS source, COUNT(*) AS n,
         ROUND(COUNT(*) / CAST(skw_tot.n AS DOUBLE), 6) AS share,
         CASE WHEN COUNT(*) / CAST(skw_tot.n AS DOUBLE)
                   >= 0.5 / {SKEW_PARTS}
              THEN 'salt' ELSE 'none' END AS recommendation
  FROM skw_vals, skw_tot GROUP BY v, skw_tot.n
  HAVING COUNT(*) > CAST(skw_tot.n AS DOUBLE) / {SKEW_COUNTERS + 1}
),
skwcert AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS skw_rows,
         CAST(SUM(n) AS BIGINT) AS skw_n_sum,
         CAST(SUM(ROUND(share * 1e6)) AS BIGINT) AS skw_share_e6,
         CAST(SUM({u32_row}) AS BIGINT) AS skw_hash
  FROM skw_hot
),
bud_s AS (
  SELECT doc_id,
         CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
              AS DOUBLE) / LENGTH(text) AS score,
         len(string_split(text, ' ')) AS n_toks
  FROM documents WHERE LENGTH(text) > 0
),
bud_budget AS (
  SELECT GREATEST({SELECT_TOKEN_BUDGET},
                  FLOOR(CAST(SUM(n_toks) AS DOUBLE)
                        * {SELECT_TOKEN_FRAC!r})) AS b
  FROM bud_s
),
bud_c AS (
  SELECT doc_id, score, n_toks,
         SUM(n_toks) OVER (ORDER BY score DESC, doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum_toks
  FROM bud_s
),
budcert AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS bud_rows,
         CAST(SUM(n_toks) AS BIGINT) AS bud_tok_sum,
         CAST(SUM(CAST(CAST(('0x' || substr(md5('bud|' || CAST(doc_id AS VARCHAR) || '|' || CAST(cum_toks AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000003 AS BIGINT)) AS BIGINT) AS bud_hash,
         CAST(SUM(ROUND(ROUND(score, 6) * 1e6)) AS BIGINT)
           AS bud_score_e6
  FROM bud_c, bud_budget WHERE cum_toks <= b
)"""


def _diff_cert_ctes() -> str:
    """``dcert`` + ``rcert`` 1-row CTEs replaying diff_rechunk_cert_df
    — spliced into the pipeline_clean_corpus oracle."""
    from guagua_spark.operators.packing import (
        _CHUNKS_ROW_EXPRS,
        _chunks_ctes,
    )

    rch_hash = binder_hash_sql(
        "cdiff",
        "CAST(doc_id AS VARCHAR)",
        "CAST(chunk_id AS VARCHAR)",
        "chunk_md5",
    )
    dif_hash = binder_hash_sql(
        "dif",
        "CAST(doc_id AS VARCHAR)",
        "CAST(CASE status WHEN 'added' THEN 1"
        " WHEN 'removed' THEN 2 ELSE 3 END AS VARCHAR)",
    )
    return f"""{_diff_ctes()},
dcert AS (
  SELECT CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
              AS BIGINT) AS dif_added,
         CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)
              AS BIGINT) AS dif_removed,
         CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)
              AS BIGINT) AS dif_changed,
         CAST(SUM({dif_hash}) AS BIGINT) AS dif_hash
  FROM dstat WHERE status <> 'unchanged'
),
{_chunks_ctes("dtodo")},
rcert AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rch_chunks,
         CAST(SUM(chunk_toks) AS BIGINT) AS rch_tok_sum,
         CAST(SUM({rch_hash}) AS BIGINT) AS rch_checksum
  FROM (SELECT {_CHUNKS_ROW_EXPRS} FROM c)
)"""


#: oracle-tested locally (tests/test_pipeline.py), not in the 50-slot
#: driver contract
LOCAL_QUERIES = {
    "pipeline_select_within_budget": pipeline_select_within_budget,
    "pipeline_source_skew": pipeline_source_skew,
    "pipeline_stratified_sample": pipeline_stratified_sample,
    "pipeline_source_mix": pipeline_source_mix,
    "pipeline_temperature_mix": pipeline_temperature_mix,
    "pipeline_weighted_sample": pipeline_weighted_sample,
    "pipeline_corpus_diff": pipeline_corpus_diff,
    "pipeline_incremental_chunks": pipeline_incremental_chunks,
}

LOCAL_ORACLE_SQL = {
    "pipeline_select_within_budget": _select_budget_oracle(),
    "pipeline_source_skew": _source_skew_oracle(),
    "pipeline_stratified_sample": _stratified_oracle(),
    "pipeline_source_mix": _source_mix_oracle(),
    "pipeline_temperature_mix": _temperature_mix_oracle(),
    "pipeline_weighted_sample": _weighted_sample_oracle(),
    "pipeline_corpus_diff": _corpus_diff_oracle(),
    "pipeline_incremental_chunks": _incremental_chunks_oracle(),
}

# deferred: the contract oracle splices the dif_*/rch_* certificate
# CTE block defined above
ORACLE_SQL["pipeline_clean_corpus"] = _pipeline_oracle()


# -- per-source frequency cap -------------------------------------------------

#: max documents retained per source — the RefinedWeb/CCNet-style
#: domain-frequency cap that stops one crawl domain from dominating
#: the training mix. Selection within a source is by u32(md5) order
#: (deterministic, engine-replayable uniform draw — the repo's
#: standard sampling rule), tie-broken by doc_id, so the kept set is a
#: reproducible uniform sample of the over-cap source.
SOURCE_CAP = 18


def pipeline_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep at most ``SOURCE_CAP`` documents per source, chosen by the
    deterministic md5 draw. The top-k-per-key shape is the WINDOW
    family's hot-key hazard (one mega-domain funnels into a single
    task's sort), so the selection runs through
    functions.scale.salted_topk — per-salt rank then a bounded merge
    of ≤ k·n_salts survivors per source; (cap_u32, doc_id) is a total
    order so the salted result provably equals the plain window
    (salted_topk's contract). Output ordered (source, cap_rank)."""
    from guagua_spark.functions.scale import salted_topk

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    keyed = docs.withColumn(
        "cap_u32", _u32("cap", F.col("doc_id").cast("string"))
    )
    kept = salted_topk(
        keyed,
        ["source"],
        [F.col("cap_u32"), F.col("doc_id")],
        SOURCE_CAP,
        rank_col="cap_rank",
    )
    return kept.select(
        "source", "doc_id", F.col("cap_rank").cast("int").alias("cap_rank")
    ).orderBy("source", "cap_rank")


def _source_cap_oracle() -> str:
    u32 = (
        "CAST(('0x' || substr(md5('cap|' || CAST(doc_id AS VARCHAR)),"
        " 1, 8)) AS UBIGINT)"
    )
    return f"""
SELECT source, doc_id, CAST(cap_rank AS INT) AS cap_rank
FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {u32}, doc_id) AS cap_rank
  FROM documents
)
WHERE cap_rank <= {SOURCE_CAP}
ORDER BY source, cap_rank
""".strip()


LOCAL_QUERIES["pipeline_source_cap"] = pipeline_source_cap
LOCAL_ORACLE_SQL["pipeline_source_cap"] = _source_cap_oracle()


# -- sf100 sampled twin (round 11) ------------------------------------------


def pipeline_clean_corpus_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The clean-corpus composition (quality filter -> LSH near-dup
    removal -> per-(lang, source) rollup) over the deterministic md5
    doc subset — the sweep's scale-feasible twin. The full oracle's
    DuckDB replay is ~17 min at sf10 (pair CTEs + recursive component
    walk over every doc) and linear per decade, so sf100 is decades
    past any watchdog; the twin keeps the replay at sf0.1-scale cost
    whatever the corpus. Certificate columns are omitted: each cert
    family is independently certified by its own host row at sf<=10,
    and the twin certifies the COMPOSITION interior (filter -> pairs
    within the filtered set -> components -> anti-join -> rollup).
    Same subset rule as the dedup twins ('docsamp' tag), so
    pairs(subset) == pairs(corpus) cut to subset x subset."""
    from guagua_spark.functions.scale import u32_hash
    from guagua_spark.operators.dedup import (
        DOC_SAMPLE_TARGET,
        minhash_pairs_for,
    )

    docs_all = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    rate = min(1.0, DOC_SAMPLE_TARGET / max(docs_all.count(), 1))
    docs = docs_all.filter(
        u32_hash("docsamp", F.col("doc_id").cast("string"))
        < F.lit(rate * 4294967296.0)
    )
    filtered = docs.filter(_quality_pred())
    pairs = minhash_pairs_for(
        filtered.select("doc_id", "text").repartition(
            spark.sparkContext.defaultParallelism
        )
    ).select("doc_a", "doc_b")
    labels = connected_components(pairs, "doc_a", "doc_b")
    drop = labels.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    clean = filtered.join(F.broadcast(drop), "doc_id", "left_anti")
    return (
        clean.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("bigint")
            .alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang", "source")
    )


def _clean_corpus_oracle_sampled() -> str:
    from guagua_spark.operators.dedup import (
        DOC_SAMPLE_TARGET,
        _minhash_pair_ctes,
    )

    keep = (
        "CAST(('0x' || substr(md5('docsamp|' || CAST(doc_id AS VARCHAR)),"
        " 1, 8)) AS UBIGINT) < drate.rate * 4294967296.0"
    )
    return f"""
WITH RECURSIVE drate AS (
  SELECT LEAST(1.0, {float(DOC_SAMPLE_TARGET)!r}
               / GREATEST(COUNT(*), 1)) AS rate
  FROM documents
),
dsamp AS (
  SELECT doc_id, text, lang, source, n_chars
  FROM documents, drate WHERE {keep}
),
filtered AS (
  SELECT doc_id, text, lang, source, n_chars FROM dsamp
  WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
    AND CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        / LENGTH(text) >= {MIN_ALPHA_RATIO}
),
{_minhash_pair_ctes(source="filtered")},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
walk(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
),
drop_ids AS (
  SELECT node FROM walk GROUP BY node HAVING node != MIN(label)
),
clean AS (
  SELECT * FROM filtered
  WHERE doc_id NOT IN (SELECT node FROM drop_ids)
)
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM clean GROUP BY lang, source ORDER BY lang, source
""".strip()


SWEEP_SAMPLED = {
    "pipeline_clean_corpus": (
        pipeline_clean_corpus_sampled,
        _clean_corpus_oracle_sampled(),
        "u32(md5('docsamp|doc_id')) < min(1, 50000/n_docs)*2^32;"
        " certificate columns omitted (independently certified at"
        " sf<=10 by their host rows)",
    ),
}
