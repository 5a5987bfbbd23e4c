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
    minhash_pairs_for,
)
from guagua_spark.sources.tables import load_table

MIN_TOKENS = 20
MIN_ALPHA_RATIO = 0.8


def _quality_pred():
    n_tokens = F.size(F.split(F.col("text"), " "))
    alpha = F.length(
        F.regexp_replace(F.col("text"), "[^a-zA-Z]", "")
    ).cast("double") / F.length("text")
    return (n_tokens >= MIN_TOKENS) & (alpha >= MIN_ALPHA_RATIO)


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language (n_docs, total_tokens, total_chars) of the cleaned
    corpus: quality-filtered, near-dup-deduplicated documents."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    filtered = docs.filter(_quality_pred()).persist()
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
    out = (
        clean.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " "))).alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )
    # labels are localCheckpoint'd (materialized) inside
    # connected_components, so the cache is only needed during the CC
    # loop; unpersisting now just means the final plan re-derives
    # `filtered` from the scan — one cheap predicate pass — instead of
    # pinning executor memory until the caller collects
    filtered.unpersist()
    return out


def _pipeline_oracle() -> str:
    return f"""
WITH RECURSIVE filtered AS (
  SELECT doc_id, text, lang, n_chars FROM documents
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
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM filtered
WHERE doc_id NOT IN (SELECT node FROM drop_ids)
GROUP BY lang ORDER BY lang
""".strip()


QUERIES = {"pipeline_clean_corpus": pipeline_clean_corpus}

ORACLE_SQL = {"pipeline_clean_corpus": _pipeline_oracle()}
