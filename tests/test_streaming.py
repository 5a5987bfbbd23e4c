"""Structured Streaming operators: availableNow drain == batch result."""

from __future__ import annotations

from pyspark.sql import functions as F

from guagua_spark.sources.tables import load_table
from guagua_spark.streaming import (
    run_available_now,
    streaming_dedup_docs,
    streaming_sessionize,
    streaming_user_totals,
    streaming_windowed_counts,
)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_windowed_counts_match_batch(spark, sf_dir):
    got = run_available_now(
        streaming_windowed_counts(spark, sf_dir), "s_win", "complete"
    )
    ev = load_table(spark, sf_dir, "events")
    want = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    cols = ("hour", "event_type", "n_events", "sum_value")
    assert _rows(got, *cols) == _rows(want, *cols)


def test_streaming_dedup_matches_batch(spark, sf_dir):
    got = run_available_now(
        streaming_dedup_docs(spark, sf_dir), "s_dedup", "append"
    )
    docs = load_table(spark, sf_dir, "documents")
    n_distinct = docs.select("text").distinct().count()
    assert got.count() == n_distinct
    # one row per fingerprint
    assert got.select("fp").distinct().count() == n_distinct


def test_streaming_sessionize_matches_batch_sessions(spark, sf_dir):
    """Native session_window (streaming) must produce the same sessions
    as the batch lag/cum-sum formulation in operators/events."""
    from guagua_spark.operators.events import events_sessionize

    got = run_available_now(
        streaming_sessionize(spark, sf_dir), "s_sess", "complete"
    )
    want = events_sessionize(spark, sf_dir).select(
        "user_id", "session_start", "n_events", "total_value"
    )
    cols = ("user_id", "session_start", "n_events", "total_value")
    assert _rows(got, *cols) == _rows(want, *cols)


def test_stateful_user_totals_match_batch(spark, sf_dir):
    got = run_available_now(
        streaming_user_totals(spark, sf_dir), "s_users", "update"
    )
    # update mode with one availableNow batch → last emit per user is
    # the lifetime total
    final = got.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
    )
    ev = load_table(spark, sf_dir, "events")
    want = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    cols = ("user_id", "n_events", "total_value")
    assert _rows(final, *cols) == _rows(want, *cols)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Inner interval join emits eagerly; the availableNow drain must
    equal the equivalent batch self-join."""
    from guagua_spark.streaming import streaming_click_purchase_join

    got = run_available_now(
        streaming_click_purchase_join(spark, sf_dir), "s_ivj", "append"
    )
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    want = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )
    cols = ("user_id", "click_ts", "purchase_ts", "purchase_value")
    assert _rows(got, *cols) == _rows(want, *cols)


def test_streaming_stratified_sample_matches_batch(spark, sf_dir):
    """The md5-Bernoulli sample is a pure function of doc_id, so the
    streaming drain must equal the batch operator's row set exactly."""
    from guagua_spark.operators.pipeline import pipeline_stratified_sample
    from guagua_spark.streaming import streaming_stratified_sample

    got = run_available_now(
        streaming_stratified_sample(spark, sf_dir), "s_strat", "append"
    )
    want = pipeline_stratified_sample(spark, sf_dir)
    assert _rows(got, "doc_id", "lang") == _rows(want, "doc_id", "lang")


def test_streaming_doc_chunks_match_batch(spark, sf_dir):
    """Chunking is a stateless pure function of each row, so the
    streaming drain must equal the batch operator's row set exactly."""
    from guagua_spark.operators.packing import pipeline_doc_chunks
    from guagua_spark.streaming import streaming_doc_chunks

    got = run_available_now(
        streaming_doc_chunks(spark, sf_dir), "s_chunks", "append"
    )
    want = pipeline_doc_chunks(spark, sf_dir)
    cols = ("doc_id", "chunk_id", "chunk_toks", "chunk_md5")
    assert _rows(got, *cols) == _rows(want, *cols)


def test_streaming_decontaminate_matches_batch(spark, sf_dir):
    """Stream-static join twin: the heldout gram set is a static
    relation joined per micro-batch; the drained aggregate must equal
    the batch operator row-for-row."""
    from guagua_spark.operators.text import decontaminate
    from guagua_spark.streaming import streaming_decontaminate

    got = run_available_now(
        streaming_decontaminate(spark, sf_dir), "s_decon", "complete"
    )
    want = decontaminate(spark, sf_dir)
    cols = ("doc_id", "n_grams", "n_hits", "contaminated")
    assert _rows(got, *cols) == _rows(want, *cols)


def test_streaming_dedup_incremental_matches_batch(spark, sf_dir):
    """Stream-static LSH twin: new docs stream against the standing
    corpus's static bucket/shingle index; the drained per-doc rollup
    must equal the batch incremental-dedup operator row-for-row
    (jaccard rounded — the stream dodges the pair distinct, so its max
    may combine float-identical duplicates)."""
    from guagua_spark.operators.dedup import dedup_incremental
    from guagua_spark.streaming import streaming_dedup_incremental

    got = run_available_now(
        streaming_dedup_incremental(spark, sf_dir), "s_inc", "complete"
    )
    want = dedup_incremental(spark, sf_dir)

    def rows(df):
        return sorted(
            (r.doc_id, r.dup_of, r.n_matches, round(r.best_jaccard, 9))
            for r in df.collect()
        )

    assert rows(got) == rows(want)


def test_streaming_score_matches_batch(spark, sf_dir):
    """Train-offline/score-the-stream: the availableNow drain must equal
    scoring the same table in batch with the same memoized weights —
    the expression is shared (lr_score_col), so any drift is a harness
    bug, not a model one."""
    from guagua_spark.operators.inference import (
        lr_score_col,
        trained_lr_weights,
    )
    from guagua_spark.streaming import streaming_score

    got = run_available_now(
        streaming_score(spark, sf_dir), "s_score", "append"
    )
    w = trained_lr_weights(spark, sf_dir)
    want = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.when(F.col("l_returnflag") == "R", 1.0)
            .otherwise(0.0)
            .alias("label"),
            lr_score_col(w).alias("score"),
        )
    )
    cols = ("l_orderkey", "l_linenumber", "label", "score")
    assert _rows(got, *cols) == _rows(want, *cols)


def test_streaming_rollup_maintenance_matches_batch(spark, sf_dir):
    """Draining the foreachBatch maintenance query must leave the
    stored rollup equal to the one-shot batch aggregate."""
    from guagua_spark.streaming import streaming_rollup_maintenance

    spark.sql("DROP TABLE IF EXISTS stream_rollup")
    q = streaming_rollup_maintenance(spark, sf_dir, "stream_rollup")
    q.awaitTermination()
    got = _rows(
        spark.table("stream_rollup"), "lang", "n_docs", "total_chars"
    )
    want = _rows(
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("doc_id").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        ),
        "lang",
        "n_docs",
        "total_chars",
    )
    assert got == want
    spark.sql("DROP TABLE IF EXISTS stream_rollup")


def test_streaming_rollup_keeps_existing_table(spark, sf_dir):
    """A rollup previously built by the BATCH path must be folded into,
    not wiped — the batch→stream handoff."""
    from guagua_spark.functions.scale import save_rollup
    from guagua_spark.sources.tables import load_table
    from guagua_spark.streaming import streaming_rollup_maintenance

    spark.sql("DROP TABLE IF EXISTS stream_rollup2")
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    aggs = {
        "n_docs": ("doc_id", "count"),
        "total_chars": ("n_chars", "sum"),
    }
    save_rollup("stream_rollup2", docs, ["lang"], aggs)
    q = streaming_rollup_maintenance(spark, sf_dir, "stream_rollup2")
    q.awaitTermination()
    # stream re-folds the same files on top of the batch-built rollup →
    # exactly double counts (proves kept + folded, not reseeded)
    got = _rows(spark.table("stream_rollup2"), "lang", "n_docs")
    want = [
        (lang, 2 * n)
        for lang, n in _rows(
            docs.groupBy("lang").agg(F.count("doc_id").alias("n")),
            "lang",
            "n",
        )
    ]
    assert got == want
    spark.sql("DROP TABLE IF EXISTS stream_rollup2")


def test_streaming_psi_monitor_bins_match_batch(spark, sf_dir):
    """The drained per-bin stream counts must equal bucketing the whole
    table in batch against the same frozen boundaries (shared
    frozen_bounds/bucket_col helpers), the emitted exp_share must be
    the frozen reference distribution, and the PSI fold over the
    drained rows must be exactly 0 here — the monitored stream IS the
    reference corpus."""
    import math

    from guagua_spark.operators.features import bucket_col, frozen_bounds
    from guagua_spark.streaming import streaming_psi_monitor

    got = run_available_now(
        streaming_psi_monitor(spark, sf_dir), "s_psi", "complete"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    bounds = frozen_bounds(li, "x")
    want = li.groupBy(bucket_col(bounds, "x").alias("bin")).agg(
        F.count(F.lit(1)).alias("n_act")
    )
    assert _rows(got, "bin", "n_act") == _rows(want, "bin", "n_act")
    rows = got.collect()
    total = sum(r["n_act"] for r in rows)
    for r in rows:  # the frozen reference distribution rides along
        assert abs(r["exp_share"] - r["n_act"] / total) < 1e-12
    psi = sum(
        (r["n_act"] / total - r["exp_share"])
        * math.log((r["n_act"] / total) / r["exp_share"])
        for r in rows
    )
    assert abs(psi) < 1e-12  # monitored == reference -> zero drift


def test_streaming_bm25_score_matches_batch(spark, sf_dir):
    """Index-offline/score-the-stream for retrieval: the availableNow
    drain must equal the batch scorer over the same table — corpus
    statistics are plan literals from the stored index, the scoring
    expression is shared (bm25_doc_score_cols)."""
    import shutil

    from guagua_spark.operators.text import (
        bm25_score_docs,
        save_text_index,
        text_index_stats,
    )
    from guagua_spark.streaming import streaming_bm25_score

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for suffix in ("_postings", "_lengths", "_stats"):
        spark.sql(f"DROP TABLE IF EXISTS st_bm25{suffix}")
        shutil.rmtree(f"{wh}/st_bm25{suffix}", ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    save_text_index(docs, "st_bm25")

    got = run_available_now(
        streaming_bm25_score(spark, sf_dir, "st_bm25"), "s_bm25", "append"
    )
    want = bm25_score_docs(docs, text_index_stats(spark, "st_bm25"))
    cols = ("doc_id", "q1_score", "q2_score", "q3_score")
    assert _rows(got, *cols) == _rows(want, *cols)


def test_streaming_temperature_mix_matches_batch(spark, sf_dir):
    """The tempered rates are frozen from the static corpus snapshot
    and membership is the md5-Bernoulli rule, so the drained kept-set's
    per-source rollup must equal the batch operator's kept /
    kept_hash columns exactly."""
    import pyspark.sql.functions as F

    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.pipeline import pipeline_temperature_mix
    from guagua_spark.streaming.stream_ops import (
        streaming_temperature_mix,
    )

    got = run_available_now(
        streaming_temperature_mix(spark, sf_dir), "s_tmix", "append"
    )
    rolled = sorted(
        tuple(r)
        for r in got.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept"),
            F.sum(binder_hash_col("tmixb", F.col("doc_id"))).alias(
                "kept_hash"
            ),
        )
        .collect()
    )
    want = sorted(
        (r.source, r.kept, r.kept_hash)
        for r in pipeline_temperature_mix(spark, sf_dir).collect()
        if r.kept > 0
    )
    got_nonzero = [t for t in rolled if t[1] > 0]
    assert got_nonzero == want and len(want) > 0


def test_streaming_hll_registers_match_batch(spark, sf_dir):
    """The streamed register table must equal the batch build exactly
    (MAX is monotone and order-insensitive), so the read-time estimate
    is identical too."""
    from guagua_spark.functions.sketch import hll_registers
    from guagua_spark.streaming import streaming_distinct_users_hll

    got = run_available_now(
        streaming_distinct_users_hll(spark, sf_dir), "s_hll", "complete"
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    want = hll_registers(ev, "uid", group_cols=("event_type",))
    cols = ("event_type", "bucket", "reg")
    assert _rows(got, *cols) == _rows(want, *cols)


def test_streaming_cm_counters_match_batch(spark, sf_dir):
    """CM is linear: the streamed counter table must equal the batch
    build exactly (SUM is order-insensitive on integers)."""
    from guagua_spark.functions.sketch import cm_counters
    from guagua_spark.streaming import streaming_token_freq_cm

    got = run_available_now(
        streaming_token_freq_cm(spark, sf_dir), "s_cm", "complete"
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    want = cm_counters(toks, "tok")
    cols = ("j", "bucket", "n")
    assert _rows(got, *cols) == _rows(want, *cols)


def test_streaming_qcm_counters_equal_batch(spark, sf_dir):
    """The dyadic-CM rank sketch is linear: the streamed counter table
    must equal the batch qcm_counters build exactly (integer SUM is
    order-insensitive), so a live stream can serve the same rank /
    quantile reads as the batch sketch."""
    from guagua_spark.functions.sketch import qcm_counters
    from guagua_spark.streaming import streaming_value_rank_qcm

    got = run_available_now(
        streaming_value_rank_qcm(spark, sf_dir), "s_qcm", "complete"
    )
    want = qcm_counters(load_table(spark, sf_dir, "events"), "value")
    cols = ("lvl", "j", "bucket", "n")
    assert _rows(got, *cols) == _rows(want, *cols)


def test_streaming_audience_registers_match_batch(spark, sf_dir):
    """Both streamed audience sketches equal their batch register
    builds exactly, and the read-time union (MAX over the two audience
    tags) equals batch hll_merge — so the live inclusion-exclusion
    overlap estimate is identical to events_audience_overlap's."""
    from guagua_spark.functions.sketch import hll_merge, hll_registers
    from guagua_spark.operators.events import OVERLAP_VALUE_MIN
    from guagua_spark.streaming import streaming_audience_registers

    got = run_available_now(
        streaming_audience_registers(spark, sf_dir), "s_aov", "complete"
    )
    ev = load_table(spark, sf_dir, "events")
    hv = F.col("value") >= F.lit(OVERLAP_VALUE_MIN)
    reg = {
        tag: hll_registers(
            ev.filter(hv & (F.col("event_type") == etype)).select(
                F.col("user_id").cast("string").alias("uid")
            ),
            "uid",
        )
        for tag, etype in [("a", "click"), ("b", "purchase")]
    }
    for tag in ("a", "b"):
        assert _rows(
            got.filter(F.col("aud") == tag), "bucket", "reg"
        ) == _rows(reg[tag], "bucket", "reg")
    union_live = got.groupBy("bucket").agg(F.max("reg").alias("reg"))
    union_batch = hll_merge(reg["a"], reg["b"])
    assert _rows(union_live, "bucket", "reg") == _rows(
        union_batch, "bucket", "reg"
    )


def test_streaming_bpe_pair_counts_match_oracle_round0(spark, sf_dir):
    """The drained stream's pair counts equal the BPE oracle chain's
    round-0 pair aggregate (integer-exact)."""
    import duckdb

    from guagua_spark.streaming.stream_ops import (
        run_available_now,
        streaming_bpe_pair_counts,
    )

    got = {
        (r["lft"], r["rgt"]): r["cnt"]
        for r in run_available_now(
            streaming_bpe_pair_counts(spark, sf_dir), "s_bpe_pairs"
        ).collect()
    }
    from guagua_spark.operators.tokenizer import _bpe_ctes

    chain, _ = _bpe_ctes(1)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {
        (l, r): int(c)
        for l, r, c in con.execute(
            f"WITH {chain} SELECT lft, rgt, cnt FROM bpe_p0"
        ).fetchall()
    }
    con.close()
    assert got == want and len(got) > 10


def test_streaming_bloom_bits_match_batch(spark, sf_dir):
    """The streamed bloom bit SET must equal the batch build exactly
    (bit membership is monotone and order-insensitive; the batch
    path's DISTINCT buyers is an optimization, not a semantic —
    duplicate keys set the same bits), so a live semi-join reduction
    from the drained rows prunes identically to batch."""
    from guagua_spark.functions.sketch import BLOOM_M, bloom_bits
    from guagua_spark.streaming import streaming_bloom_bits

    got = run_available_now(
        streaming_bloom_bits(spark, sf_dir), "s_blm", "complete"
    )
    buyers = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").cast("string").alias("k"))
        .distinct()
    )
    want = bloom_bits(buyers, "k")
    assert _rows(got, "bit") == _rows(want, "bit")
    assert got.count() <= BLOOM_M  # bounded BY CONSTRUCTION
    # n_hits telemetry: every set bit was set at least once
    assert got.filter(F.col("n_hits") < 1).count() == 0
