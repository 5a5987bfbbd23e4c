"""Physical-plan regressions: the plan properties that make these
operators scale must never silently disappear.

At 100 TB the difference between BroadcastHashJoin and SortMergeJoin on
a dimension table, or between a pruned and unpruned scan, is the whole
game — so the plans are asserted, not just the results.
"""

from __future__ import annotations

import re

import pytest

from guagua_spark.operators import relational, text


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_dimension_joins_are_broadcast(spark, oracle_sf_dir):
    p = _plan(relational.QUERIES["q4_revenue_by_nation"](spark, oracle_sf_dir))
    assert p.count("BroadcastHashJoin") == 3, p
    assert "SortMergeJoin" not in p, p


def test_q5_filter_pushed_to_parquet(spark, oracle_sf_dir):
    p = _plan(relational.QUERIES["q5_filter_count"](spark, oracle_sf_dir))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    assert m and "GreaterThan(o_totalprice" in m.group(1), p


def test_q1_scan_prunes_to_single_column(spark, oracle_sf_dir):
    p = _plan(relational.QUERIES["q1_sum_quantity"](spark, oracle_sf_dir))
    m = re.search(r"ReadSchema: ([^\n,]*[^\n]*)", p)
    assert m and m.group(1).strip().startswith("struct<l_quantity"), p


def test_q1_has_partial_aggregation(spark, oracle_sf_dir):
    p = _plan(relational.QUERIES["q1_sum_quantity"](spark, oracle_sf_dir))
    # map-side partial agg: two HashAggregate levels around the exchange
    assert p.count("HashAggregate") >= 2, p


@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_ops_prune_columns(spark, oracle_sf_dir, name):
    p = _plan(text.QUERIES[name](spark, oracle_sf_dir))
    m = re.search(r"ReadSchema: ([^\n]*)", p)
    assert m is not None, p
    # documents has 5 columns; text ops need at most (doc_id, text)
    assert "lang" not in m.group(1) and "source" not in m.group(1), p


def test_asof_join_single_key_exchange(spark, oracle_sf_dir):
    """The as-of join must stay ONE window pass over ONE hash exchange
    on the key — a range-join/NLJ formulation would explode at scale."""
    from guagua_spark.operators import events

    p = _plan(events.QUERIES["events_asof_purchase"](spark, oracle_sf_dir))
    assert p.count("Exchange hashpartitioning(user_id#") <= 2, p  # pre-agg + window
    assert "NestedLoop" not in p and "CartesianProduct" not in p, p
    assert p.count("Window") == 1, p


def test_tfidf_single_heavy_scan(spark, oracle_sf_dir):
    """df(term) must come from a window over the tf relation, not a
    second explode+aggregate of the corpus."""
    from guagua_spark.operators import text as t

    p = _plan(t.QUERIES["text_tfidf_top_terms"](spark, oracle_sf_dir))
    assert p.count("Generate explode") == 1, p


def test_cube_is_one_shuffle_with_expand(spark, oracle_sf_dir):
    """CUBE must plan as Expand + one aggregation, not N scans."""
    from guagua_spark.operators import relational_ext

    p = _plan(relational_ext.QUERIES["rx_cube_quantity"](spark, oracle_sf_dir))
    assert "Expand" in p, p
    assert p.count("Scan parquet") == 1, p


@pytest.mark.parametrize("name", ["events_funnel", "events_retention"])
def test_no_forced_broadcast_of_per_user_relations(spark, oracle_sf_dir, name):
    """Funnel/retention join per-user aggregates whose cardinality grows
    with the data — a FORCED broadcast of those would OOM executors at
    100×. Broadcast hints are allowed ONLY on bounded 1-row certificate
    literals (LogicalRDD — round 10: without the hint, two chained cert
    cross joins planned a CartesianProduct); any hint whose child is a
    real relation is the OOM hazard this test exists for."""
    from guagua_spark.operators import events

    df = events.QUERIES[name](spark, oracle_sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    lines = logical.splitlines()
    for i, line in enumerate(lines):
        if "ResolvedHint" in line:
            child = lines[i + 1] if i + 1 < len(lines) else ""
            assert "LogicalRDD" in child, logical


def test_pipeline_antijoin_is_broadcast(spark, oracle_sf_dir):
    """The clean-corpus drop-list anti-join must broadcast the tiny
    drop list, never shuffle the corpus. Inspected on the un-checkpointed
    lineage — the contract query condenses it behind a localCheckpoint
    so the rates + rollup passes don't re-run this subtree."""
    from guagua_spark.operators.pipeline import _clean_slim

    p = _plan(_clean_slim(spark, oracle_sf_dir, checkpoint=False))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p, p


def test_stratified_sample_is_map_side_only(spark, oracle_sf_dir):
    """The sampling predicate must run at the scan — no shuffle other
    than the presentation sort, and the scan pruned to the two used
    columns."""
    from guagua_spark.operators.pipeline import pipeline_stratified_sample

    p = _plan(pipeline_stratified_sample(spark, oracle_sf_dir))
    # exactly one Exchange: the rangepartitioning of the final orderBy
    assert p.count("Exchange") == 1 and "rangepartitioning" in p, p
    m = re.search(r"ReadSchema: ([^\n]*)", p)
    assert m and "text" not in m.group(1), p


def test_source_mix_has_no_forced_broadcast(spark, oracle_sf_dir):
    """`source` may be web-domain-cardinality at scale: the rate join
    must carry no mandatory broadcast hint (AQE may still choose one —
    assert on the analyzed plan, not the executed one)."""
    from guagua_spark.operators.pipeline import pipeline_source_mix

    logical = str(
        pipeline_source_mix(spark, oracle_sf_dir)
        ._jdf.queryExecution()
        .analyzed()
    )
    assert "ResolvedHint" not in logical, logical


def test_boilerplate_ngrams_partial_agg_and_topk(spark, oracle_sf_dir):
    """Gram counting must partial-aggregate map-side and the top-K must
    plan as TakeOrderedAndProject, never a global sort of all grams."""
    from guagua_spark.operators.text import boilerplate_ngrams

    p = _plan(boilerplate_ngrams(spark, oracle_sf_dir))
    assert p.count("HashAggregate") >= 2, p
    assert "TakeOrderedAndProject" in p, p


def test_percentiles_no_group_value_buffering(spark, oracle_sf_dir):
    """Exact percentiles must NOT plan Spark's `percentile` sort
    aggregate — it buffers every value of a group in memory (OOM at
    scale with 3 giant flag groups) — and (round 13) must NOT sort a
    whole flag's distinct prices in one window task either: the
    cumulative rank is bucket-decomposed, so every Window/Sort over
    the distinct-price relation partitions by (flag, BUCKET), the
    per-flag windows run only over the domain-bounded bucket-total
    relation, and the offsets attach via BROADCAST (the big relation
    is never re-exchanged for the join)."""
    from guagua_spark.operators.relational_ext import rx_percentiles

    df = rx_percentiles(spark, oracle_sf_dir)
    p = _plan(df)
    assert "percentile(" not in p, p
    # the rank-bearing window must partition by (flag, bkt) — a window
    # spec over bare l_returnflag ordered BY PRICE would be the serial
    # per-flag sort coming back
    assert "windowspecdefinition(l_returnflag" in p, p
    for line in p.splitlines():
        if "windowspecdefinition" in line and "l_extendedprice" in line:
            assert "bkt" in line, line
    # offsets ride a broadcast: the distinct-price relation is
    # exchanged exactly twice (histogram agg + in-bucket window), never
    # for the offset join
    assert "BroadcastExchange" in p, p
    assert p.count("HashAggregate") >= 3, p  # aggs stay partial+final


def test_doc_chunks_map_side_only(spark, oracle_sf_dir):
    """Chunking must be a pure map-side explode: one Exchange total
    (the presentation sort's rangepartitioning) and a scan pruned to
    (doc_id, text)."""
    from guagua_spark.operators.packing import pipeline_doc_chunks

    p = _plan(pipeline_doc_chunks(spark, oracle_sf_dir))
    assert p.count("Exchange") == 1 and "rangepartitioning" in p, p
    m = re.search(r"ReadSchema: ([^\n]*)", p)
    assert m and "lang" not in m.group(1) and "source" not in m.group(1), p


def test_pack_sequences_window_is_bucketed(spark, oracle_sf_dir):
    """The packing cumsum must window per salt bucket — a global
    (SinglePartition) window would funnel the corpus through one sort
    task at scale."""
    from guagua_spark.operators.packing import pipeline_pack_sequences

    p = _plan(pipeline_pack_sequences(spark, oracle_sf_dir))
    assert "Exchange hashpartitioning(bucket" in p, p
    assert "Exchange SinglePartition" not in p, p


def test_semantic_dedup_no_cartesian(spark, oracle_sf_dir):
    """The within-bucket self-join must plan as an equi-join on
    (table, bucket) — never a nested-loop/cartesian all-pairs — and the
    dropped-set anti-join must carry no mandatory broadcast hint (the
    dropped set is corpus-sized in the worst case)."""
    from guagua_spark.operators.dedup import semantic_dedup

    df = semantic_dedup(spark, oracle_sf_dir)
    p = _plan(df)
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p
    logical = str(df._jdf.queryExecution().analyzed())
    assert "ResolvedHint" not in logical, logical


def test_unigram_logprob_broadcasts_bounded_model(spark, oracle_sf_dir):
    """The truncated vocab and the 1-row total are bounded by
    construction — both must broadcast (never shuffle the token stream
    against them), the vocab cut must plan as TakeOrderedAndProject,
    and both rollups must partial-aggregate."""
    from guagua_spark.operators.text import unigram_logprob

    p = _plan(unigram_logprob(spark, oracle_sf_dir))
    assert p.count("BroadcastHashJoin") >= 1, p
    assert "BroadcastNestedLoopJoin" in p, p  # 1-row total cross join
    assert "TakeOrderedAndProject" in p, p
    assert "SortMergeJoin" not in p, p
    assert p.count("HashAggregate") >= 4, p


def test_ann_paths_reuse_persisted_index_tables(spark, oracle_sf_dir):
    """LSH and IVF candidate generation must read the session's
    persisted index tables (InMemoryTableScan), not re-run the
    bucketing/assignment UDF over the embeddings per invocation —
    the stored-index pattern that makes repeated queries cheap."""
    from guagua_spark.operators.similarity import (
        _ivf_cells_df,
        _lsh_buckets_df,
        ivf_candidates,
        lsh_candidates,
    )

    # force the memos to exist, then inspect the consumer plans
    _lsh_buckets_df(spark, oracle_sf_dir)
    _ivf_cells_df(spark, oracle_sf_dir)
    for gen in (lsh_candidates, ivf_candidates):
        p = _plan(gen(spark, oracle_sf_dir))
        assert "InMemoryTableScan" in p, p


def test_exact_stats_certificates_are_cheap_on_warm(spark, oracle_sf_dir):
    """dedup_exact_stats' merged certificates must not re-run heavy
    subtrees per call: the incremental certificate reads the persisted
    pair graph (InMemoryTableScan) and the semantic certificate is a
    memoized literal row (no applyInPandas stage in the plan)."""
    from guagua_spark.operators.dedup import QUERIES

    df = QUERIES["dedup_exact_stats"](spark, oracle_sf_dir)
    p = _plan(df)
    assert "InMemoryTableScan" in p, p
    assert "FlatMapGroupsInPandas" not in p, p


def test_decontaminate_no_forced_broadcast_partial_agg(spark, oracle_sf_dir):
    """The heldout gram set is usually broadcast-sized but must carry
    no MANDATORY hint (a pathological heldout set must not OOM); the
    per-doc rollup must partial-aggregate."""
    from guagua_spark.operators.text import decontaminate

    df = decontaminate(spark, oracle_sf_dir)
    logical = str(df._jdf.queryExecution().analyzed())
    assert "ResolvedHint" not in logical, logical
    p = _plan(df)
    assert p.count("HashAggregate") >= 2, p


def test_auc_window_runs_over_the_aggregated_relation(spark, oracle_sf_dir):
    """infer_auc's round-10 shape: tie-averaged ranks from a running
    count over the GROUP-BY-SCORE relation — the one Window in the
    plan is SinglePartition, but its input is the aggregate (≤10⁶+1
    rows by the 6dp score domain), never the corpus. No localCheckpoint
    pin (ExistingRDD) and no range repartition may reappear — those
    were the corpus-sized machinery this shape replaced (the tree's
    only super-linear index build, sf1→sf10 exponent 1.39)."""
    from guagua_spark.operators.inference import infer_auc

    p = _plan(infer_auc(spark, oracle_sf_dir))
    assert "ExistingRDD" not in p, p
    assert "rangepartitioning" not in p.lower(), p
    assert p.count("Window") == 1, p
    # the window's child subtree (printed below it) must reduce the
    # corpus with a hash aggregate BEFORE the window's exchange
    below_window = p[p.index("Window") :]
    assert "HashAggregate" in below_window, p


def test_pagerank_rounds_are_join_plus_partial_agg(spark, oracle_sf_dir):
    """Each superstep is a src join + dst hash aggregate with a partial
    phase (map-side combine absorbs celebrity in-degree); no cartesian
    product anywhere. Inspect the LAZY superstep plan — the public path
    returns a materialized checkpoint whose plan is just the cache
    scan."""
    from guagua_spark.operators.graph import _trade_edges, pagerank

    df = pagerank(_trade_edges(spark, oracle_sf_dir), _return_lazy=True)
    p = _plan(df)
    for rel in df._pinned_relations:  # lazy mode: caller releases
        rel.unpersist()
    assert "CartesianProduct" not in p, p
    assert "partial_sum" in p or "partial" in p.lower(), p


def test_weighted_sample_is_take_ordered(spark, oracle_sf_dir):
    from guagua_spark.operators.pipeline import LOCAL_QUERIES

    p = _plan(LOCAL_QUERIES["pipeline_weighted_sample"](spark, oracle_sf_dir))
    assert "TakeOrderedAndProject" in p, p
    # a global Sort would be the scale bug this helper exists to avoid
    assert "Sort [" not in p.replace("TakeOrderedAndProject", ""), p


def _final(p: str) -> str:
    return p.split("== Initial Plan ==")[0]


def test_bm25_probe_prunes_and_filters_terms(spark, oracle_sf_dir):
    """The BM25 pipeline must read only (doc_id, text) from documents,
    touch the corpus in exactly three passes (probe postings, lengths,
    corpus stats — the stored-index path, bm25_topk_from_index, does
    ZERO), and carry the literal probe-term IN-filter so only probe
    postings ever reach the (doc, term) aggregation."""
    from guagua_spark.operators.text import bm25_topk

    df = bm25_topk(spark, oracle_sf_dir)
    df.collect()
    p = _final(_plan(df))
    assert p.count("Scan parquet") == 3, p
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p):
        assert "lang" not in m.group(1) and "source" not in m.group(1), p
    assert re.search(r"term#\d+ IN \(", p), p


def test_pq_scoring_never_single_partition(spark, oracle_sf_dir):
    """PQ ADC scoring + the candidate window must stay parallel: the
    window partitions by query_id (hash exchange), never
    SinglePartition, and the codes come from the persisted index
    relation rather than a fresh embedding scan per call."""
    from guagua_spark.operators.similarity import LOCAL_QUERIES

    df = LOCAL_QUERIES["ann_pq_topk"](spark, oracle_sf_dir)
    df.collect()
    p = _final(_plan(df))
    assert "Exchange SinglePartition" not in p, p
    assert "InMemoryTableScan" in p, p


def test_retention_cert_joins_broadcast_not_cartesian(spark, oracle_sf_dir):
    """Two chained 1-row certificate cross joins made Catalyst plan a
    CartesianProduct (32x32 partitions of task-scheduling overhead —
    ~20 s/run at sf0.1, caught by the round-10 bench lane); the
    explicit broadcast hints must keep both joins BroadcastNestedLoop."""
    from guagua_spark.operators.events import QUERIES

    p = _plan(QUERIES["events_retention"](spark, oracle_sf_dir))
    assert "CartesianProduct" not in p, p


def test_dedup_spans_windows_partition_by_doc(spark, oracle_sf_dir):
    """Span dedup's island-merge windows must partition by doc_id
    (bounded by document length); the GLOBAL dup test must be the
    two-phase partial-agg + join-back — a partial_count HashAggregate
    on the shingle hash and NO window partitioned by h (a window's
    exchange cannot be AQE-skew-split, so a boilerplate shingle would
    funnel into one task). Scan must read only (doc_id, text).

    Round 13: the default path eagerly checkpoints the rollup (its
    executed plan collapses to an ExistingRDD scan), so inspect the
    LAZY form and release its pinned shingle cache after."""
    from guagua_spark.operators.dedup import dedup_spans_df
    from guagua_spark.sources.tables import load_table

    df = dedup_spans_df(
        load_table(spark, oracle_sf_dir, "documents").select(
            "doc_id", "text"
        ),
        materialize=False,
    )
    df.collect()
    p = _final(_plan(df))
    for rel in df._pinned_relations:
        rel.unpersist()
    assert "Exchange SinglePartition" not in p, p
    wins = re.findall(r"Window \[[^\n]*", p)
    assert wins, p
    assert "windowspecdefinition(h#" not in p, p
    assert "windowspecdefinition(doc_id#" in p, p
    assert re.search(r"partial_count|HashAggregate\(keys=\[h#", p), p
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p):
        assert "lang" not in m.group(1) and "source" not in m.group(1), p


def test_qcm_counters_constant_domain_partial_agg(spark, oracle_sf_dir):
    """The dyadic-CM build must partially aggregate (map-side combine
    bounds the exchange at <=16384 rows/partition) and the probe join
    must broadcast the counter table, never sort-merge it."""
    from guagua_spark.operators.events import LOCAL_QUERIES

    df = LOCAL_QUERIES["events_value_rank_qcm"](spark, oracle_sf_dir)
    df.collect()
    p = _final(_plan(df))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    assert re.search(r"partial_count|HashAggregate\(keys=\[lvl", p), p


def test_source_cap_ranks_within_salt_first(spark, oracle_sf_dir):
    """The capped selection must carry the two-phase salted shape: a
    window over (source, __salt) before the per-source merge window —
    no single window ever sorts a whole source."""
    from guagua_spark.operators.pipeline import LOCAL_QUERIES

    df = LOCAL_QUERIES["pipeline_source_cap"](spark, oracle_sf_dir)
    df.collect()
    p = _final(_plan(df))
    assert "__salt" in p, p
    assert "Exchange SinglePartition" not in p.split("Sort [source")[0], p


def test_association_rules_plan_shapes(spark, oracle_sf_dir):
    """The top-m pair prune plans as TakeOrderedAndProject (bounded
    per-partition heaps, never a global Sort+Limit) and the 20-row
    rule side reaches the item-support lookups as a broadcast — no
    CartesianProduct anywhere."""
    from guagua_spark.operators.relational_ext import LOCAL_QUERIES

    p = _plan(LOCAL_QUERIES["rx_association_rules"](spark, oracle_sf_dir))
    assert "CartesianProduct" not in p, p
    assert "TakeOrderedAndProject" in p, p
    assert p.split("== Initial Plan ==")[0].count("BroadcastHashJoin") >= 2, p


def test_edit_pairs_plan_no_cartesian(spark, oracle_sf_dir):
    """Candidates come from the banded bucket equi-join — an
    all-pairs regression would surface as a CartesianProduct /
    NestedLoop."""
    from guagua_spark.operators.dedup import LOCAL_QUERIES

    p = _plan(LOCAL_QUERIES["dedup_edit_pairs"](spark, oracle_sf_dir))
    assert "CartesianProduct" not in p and "NestedLoop" not in p, p


def test_gapfill_single_user_window_exchange(spark, oracle_sf_dir):
    """The forward-fill window must reuse the grid join's user
    partitioning lineage — the plan may carry at most 2 hashpartition
    exchanges on user-keyed relations ((user,h) bucket agg + the
    user-window sort input) and no range exchange beyond the
    presentation sort."""
    from guagua_spark.operators.events import LOCAL_QUERIES

    p = _plan(LOCAL_QUERIES["events_gapfill_hourly"](spark, oracle_sf_dir))
    assert "CartesianProduct" not in p, p
    n_hash = len(re.findall(r"Exchange hashpartitioning", p))
    assert n_hash <= 3, f"{n_hash} hash exchanges:\n{p}"


def test_audience_overlap_constant_size_exchanges(spark, oracle_sf_dir):
    """Sketch builds exchange register rows (≤ m per partition), the
    three 1-row sketch summaries attach by broadcast, and no
    CartesianProduct appears despite the three cross joins."""
    from guagua_spark.operators.events import LOCAL_QUERIES

    p = _plan(
        LOCAL_QUERIES["events_audience_overlap"](spark, oracle_sf_dir)
    )
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
