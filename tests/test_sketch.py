"""Bounded-memory frequent items (functions.sketch): exactness vs the
plain GROUP BY/HAVING form, the oracle match of the text host, and the
candidate-superset guarantee under heavy skew."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from guagua_spark.functions.sketch import frequent_items


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    from oracle import duck_connection

    return duck_connection(oracle_sf_dir)


def _exact(df, col, c):
    n = df.filter(F.col(col).isNotNull()).count()
    return sorted(
        tuple(r)
        for r in df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > n / (c + 1))
        .collect()
    )


def test_frequent_items_equals_exact_groupby_skewed(spark):
    """50% hot value + zipf-ish tail across 8 partitions: the sketch
    route must return EXACTLY the > N/(c+1) set with exact counts."""
    df = spark.range(0, 40000, 1, 8).select(
        F.when(F.col("id") % 2 == 0, "hot")
        .when(F.col("id") % 4 == 1, "warm")
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 500).cast("string")))
        .alias("v")
    )
    for c in (4, 16, 64):
        got = sorted(
            tuple(r) for r in frequent_items(df, "v", c).collect()
        )
        assert got == _exact(df, "v", c), c
    assert ("hot", 20000) in got


def test_frequent_items_uniform_returns_empty_or_exact(spark):
    """Uniform data (nothing above threshold at small c): still exact."""
    df = spark.range(0, 3000, 1, 4).select(
        (F.col("id") % 1000).cast("string").alias("v")
    )
    got = sorted(tuple(r) for r in frequent_items(df, "v", 8).collect())
    assert got == _exact(df, "v", 8)


def test_frequent_items_nulls_ignored(spark):
    df = spark.range(0, 1000, 1, 4).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(F.lit("x")).alias("v")
    )
    rows = frequent_items(df, "v", 4).collect()
    assert [(r.v, r.n) for r in rows] == [("x", 666)]


def test_text_frequent_tokens_matches_oracle(spark, oracle_sf_dir, duck):
    from guagua_spark.operators.text import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    from oracle import assert_matches_oracle

    assert_matches_oracle(
        LOCAL_QUERIES["text_frequent_tokens"](spark, oracle_sf_dir),
        duck,
        LOCAL_ORACLE_SQL["text_frequent_tokens"],
    )


def test_skew_report_flags_hot_key(spark):
    """A 60%-share key must be flagged 'salt' with its exact share;
    keys below 0.5/partitions get 'none'."""
    from guagua_spark.functions.sketch import skew_report

    df = spark.range(0, 10000, 1, 8).select(
        F.when(F.col("id") % 10 < 6, "hot")
        .when(F.col("id") % 10 < 8, "warm")
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 40).cast("string")))
        .alias("k")
    )
    rows = {
        r.k: r
        for r in skew_report(
            df, "k", counters=16, shuffle_partitions=4
        ).collect()
    }
    assert rows["hot"].n == 6000 and rows["hot"].share == 0.6
    assert rows["hot"].recommendation == "salt"
    assert rows["warm"].recommendation == "salt"  # 0.2 >= 0.5/4=0.125
    assert all(
        v.recommendation == "none" for k, v in rows.items()
        if k not in ("hot", "warm")
    ) or set(rows) == {"hot", "warm"}


def test_pipeline_source_skew_matches_oracle(spark, oracle_sf_dir, duck):
    from guagua_spark.operators.pipeline import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    from oracle import assert_matches_oracle

    assert_matches_oracle(
        LOCAL_QUERIES["pipeline_source_skew"](spark, oracle_sf_dir),
        duck,
        LOCAL_ORACLE_SQL["pipeline_source_skew"],
    )


def test_select_within_budget_matches_oracle_and_is_greedy(
    spark, oracle_sf_dir, duck
):
    """Budget selection: oracle equality (checks the bucketed cumsum
    against the plain global window bit-for-bit via cum_toks), the
    greedy contract (total <= budget, next-best doc would overflow),
    and no corpus-sized single-partition sort in the plan."""
    from guagua_spark.operators.pipeline import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
        SELECT_TOKEN_BUDGET,
        SELECT_TOKEN_FRAC,
    )

    from oracle import assert_matches_oracle

    df = LOCAL_QUERIES["pipeline_select_within_budget"](
        spark, oracle_sf_dir
    )
    assert_matches_oracle(
        df, duck, LOCAL_ORACLE_SQL["pipeline_select_within_budget"]
    )
    rows = df.collect()
    assert 0 < len(rows)
    total = max(r.cum_toks for r in rows)
    corpus_toks = duck.execute(
        "SELECT SUM(len(string_split(text, ' '))) FROM documents"
        " WHERE LENGTH(text) > 0"
    ).fetchone()[0]
    assert total <= max(
        SELECT_TOKEN_BUDGET, int(corpus_toks * SELECT_TOKEN_FRAC)
    )
    # the selection order is the quality order and cum_toks is its
    # running total
    scores = [(-r.score, r.doc_id) for r in rows]
    assert scores == sorted(scores)
    assert sum(r.n_toks for r in rows) == total
    # plan shape: the corpus-sized window partitions by the score
    # bucket; the only unpartitioned sort unit is the <=B-row offsets
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # every Window over the big relation must carry the bucket key
    wins = re.findall(r"Window .*", plan)
    assert any("__b" in w for w in wins)


@pytest.mark.parametrize(
    "mod,name,exact_col",
    [
        ("text", "text_distinct_tokens_hll", "exact_distinct"),
        ("events", "events_distinct_users_hll", "exact_users"),
    ],
)
def test_hll_matches_oracle_and_is_accurate(
    spark, oracle_sf_dir, duck, mod, name, exact_col
):
    """HLL distinct count: the register table, raw estimate, and
    corrected estimate must replay exactly in SQL, and the corrected
    estimate must sit within the sketch's error envelope (linear
    counting is near-exact at n << m; the generic bound is
    ~3*1.04/sqrt(m) ~ 10%)."""
    import importlib

    m = importlib.import_module(f"guagua_spark.operators.{mod}")

    from oracle import assert_matches_oracle

    df = m.LOCAL_QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, m.LOCAL_ORACLE_SQL[name])
    for r in df.collect():
        assert r[exact_col] > 0
        assert abs(r["rel_err"]) < 0.1, (r[exact_col], r["hll_est"])


def test_hll_registers_shuffle_is_bounded(spark):
    """The register relation is capped at m rows however many distinct
    values stream in, and MAX-of-rank is deterministic md5 math."""
    from guagua_spark.functions.sketch import HLL_M, hll_registers

    df = spark.range(50_000).select(
        F.col("id").cast("string").alias("v")
    )
    regs = hll_registers(df, "v").collect()
    assert 0 < len(regs) <= HLL_M
    again = hll_registers(df, "v").collect()
    assert sorted((r.bucket, r.reg) for r in regs) == sorted(
        (r.bucket, r.reg) for r in again
    )


def test_hll_merge_equals_rebuild_on_union(spark):
    """Sketch mergeability: MAX-merge of per-shard registers must be
    row-identical to rebuilding the sketch over the unioned data."""
    from guagua_spark.functions.sketch import hll_merge, hll_registers

    full = spark.range(20_000).select(
        F.col("id").cast("string").alias("v"),
        (F.col("id") % 2).alias("shard"),
    )
    a = hll_registers(full.filter("shard = 0"), "v")
    b = hll_registers(full.filter("shard = 1"), "v")
    merged = sorted(
        (r.bucket, r.reg) for r in hll_merge(a, b).collect()
    )
    rebuilt = sorted(
        (r.bucket, r.reg) for r in hll_registers(full, "v").collect()
    )
    assert merged == rebuilt


def test_cm_probe_freq_matches_oracle_and_never_underestimates(
    spark, oracle_sf_dir, duck
):
    from guagua_spark.operators.text import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    from oracle import assert_matches_oracle

    df = LOCAL_QUERIES["text_probe_freq_cm"](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["text_probe_freq_cm"])
    rows = df.collect()
    assert rows and any(r.exact_n > 0 for r in rows)
    assert all(r.overcount >= 0 for r in rows)  # CM's one-sided error


def test_cm_never_underestimates_property(spark):
    """Dense adversarial input (many distinct values forcing
    collisions): every estimate must still dominate the exact count,
    and the counter table stays <= d*w rows."""
    from guagua_spark.functions.sketch import (
        CM_DEPTH,
        CM_WIDTH,
        cm_counters,
        cm_estimates,
    )

    df = spark.range(0, 30_000, 1, 8).select(
        (F.col("id") % 700).cast("string").alias("v")
    )
    counters = cm_counters(df, "v")
    assert counters.count() <= CM_DEPTH * CM_WIDTH
    probes = spark.createDataFrame(
        [(str(i),) for i in range(0, 700, 37)], "v string"
    )
    est = {r.v: r.cm_est for r in cm_estimates(counters, probes, "v").collect()}
    exact = {
        r.v: r.n
        for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(est[v] >= exact.get(v, 0) for v in est)


def test_cm_counters_weighted_equals_raw_fan(spark):
    """The pre-aggregated weighted builder (round-13 text_probe_freq_cm
    path) must produce a counter table bit-identical to fanning the
    raw occurrence stream — the sum-associativity claim as a test."""
    from guagua_spark.functions.sketch import (
        cm_counters,
        cm_counters_weighted,
    )

    df = spark.range(0, 20_000, 1, 8).select(
        (F.col("id") % 450).cast("string").alias("v")
    )
    per_value = df.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    want = sorted(tuple(r) for r in cm_counters(df, "v").collect())
    got = sorted(
        tuple(r)
        for r in cm_counters_weighted(per_value, "v", "n").collect()
    )
    assert got == want


def test_cm_merge_by_addition(spark):
    """Linear sketch: counter tables of two shards SUM to the union's."""
    from guagua_spark.functions.sketch import cm_counters

    full = spark.range(10_000).select(
        (F.col("id") % 300).cast("string").alias("v"),
        (F.col("id") % 2).alias("shard"),
    )
    a = cm_counters(full.filter("shard = 0"), "v")
    b = cm_counters(full.filter("shard = 1"), "v")
    merged = (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    want = sorted(tuple(r) for r in cm_counters(full, "v").collect())
    got = sorted(tuple(r) for r in merged.collect())
    assert got == want


def test_bloom_semijoin_matches_oracle_and_is_transparent(
    spark, oracle_sf_dir, duck
):
    """The bloom-pruned semi join must equal the PLAIN semi join (no
    false negatives), and the bit-set/predicate stats must replay in
    SQL bit-for-bit."""
    from guagua_spark.operators.events import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )
    from guagua_spark.sources.tables import load_table

    from oracle import assert_matches_oracle

    df = LOCAL_QUERIES["events_bloom_semijoin"](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["events_bloom_semijoin"])
    ev = load_table(spark, oracle_sf_dir, "events")
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("b"))
        .distinct()
    )
    plain = {
        (r.event_type, r.n, r.u)
        for r in ev.join(buyers, ev["user_id"] == buyers["b"], "left_semi")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("u"),
        )
        .collect()
    }
    got = {(r.event_type, r.n_events, r.n_buyers) for r in df.collect()}
    assert got == plain


def test_bloom_never_drops_members_and_prunes_nonmembers(spark):
    """Property: every member passes (no false negatives); with a
    small member set against a large key universe the predicate prunes
    most non-members (FPR within ~4x of theory)."""
    import math

    from guagua_spark.functions.sketch import (
        BLOOM_K,
        BLOOM_M,
        bloom_bits,
        bloom_keep_col,
    )

    members = spark.range(0, 200).select(
        F.col("id").cast("string").alias("k")
    )
    bits = frozenset(r.bit for r in bloom_bits(members, "k").collect())
    big = spark.range(0, 20_000).select(
        F.col("id").cast("string").alias("k")
    )
    kept = {
        r.k for r in big.filter(bloom_keep_col(F.col("k"), bits)).collect()
    }
    assert {str(i) for i in range(200)} <= kept  # no false negatives
    fpr = (len(kept) - 200) / (20_000 - 200)
    theory = (1 - math.exp(-BLOOM_K * 200 / BLOOM_M)) ** BLOOM_K
    assert fpr <= 4 * theory + 0.01, (fpr, theory)


# -- dyadic Count-Min rank / quantile sketch ---------------------------------


def test_qcm_rank_matches_oracle(spark, oracle_sf_dir, duck):
    from guagua_spark.operators.events import (
        LOCAL_ORACLE_SQL,
        LOCAL_QUERIES,
    )

    from oracle import assert_matches_oracle

    df = LOCAL_QUERIES["events_value_rank_qcm"](spark, oracle_sf_dir)
    assert_matches_oracle(
        df, duck, LOCAL_ORACLE_SQL["events_value_rank_qcm"]
    )


def test_qcm_estimates_one_sided_and_bounded(spark, oracle_sf_dir):
    """est_rank >= exact_rank at every probe (each dyadic CM read
    includes all of its cell's occurrences plus NON-NEGATIVE
    collisions), and the total overcount stays within the CM bound
    sum over levels of 2N/w — deterministic md5 hashing makes this a
    reproducible assertion, not a probabilistic one."""
    from guagua_spark.functions.sketch import CM_WIDTH, QCM_LEVELS
    from guagua_spark.operators.events import LOCAL_QUERIES

    rows = LOCAL_QUERIES["events_value_rank_qcm"](
        spark, oracle_sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert r.est_rank >= r.exact_rank, r
        assert r.est_rank - r.exact_rank <= 2 * QCM_LEVELS * r.n / CM_WIDTH, r


def test_qcm_counters_merge_by_addition(spark):
    """Linear-sketch contract: counters of two shards SUM to the
    counters of the union — the incremental-ingest path never
    revisits raw data."""
    from guagua_spark.functions.sketch import qcm_counters

    full = spark.range(20_000).select(
        (F.col("id") % 700 / 3.0).alias("value"),
        (F.col("id") % 2).alias("shard"),
    )
    a = qcm_counters(full.filter("shard = 0"), "value")
    b = qcm_counters(full.filter("shard = 1"), "value")
    merged = (
        a.unionByName(b)
        .groupBy("lvl", "j", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    want = sorted(tuple(r) for r in qcm_counters(full, "value").collect())
    got = sorted(tuple(r) for r in merged.collect())
    assert got == want


def test_qcm_counter_table_bounded(spark):
    """The whole point: the counter relation stays <= levels*d*w rows
    however many rows/distinct values feed it."""
    from guagua_spark.functions.sketch import (
        CM_DEPTH,
        CM_WIDTH,
        QCM_LEVELS,
        qcm_counters,
    )

    df = spark.range(50_000).select((F.col("id") / 97.0).alias("value"))
    n = qcm_counters(df, "value").count()
    assert n <= QCM_LEVELS * CM_DEPTH * CM_WIDTH


def test_qcm_quantile_driver_search(spark):
    """qcm_quantile (driver-side binary search over the collected
    bounded counter table) lands within the one-sided rank bound of
    the true quantile: its exact rank is >= the target minus the CM
    overcount, and the returned value never undershoots the true
    quantile by more than the overcount's worth of rank."""
    from guagua_spark.functions.sketch import (
        CM_WIDTH,
        QCM_LEVELS,
        qcm_counters,
        qcm_quantile,
    )

    n = 10_000
    df = spark.range(n).select((F.col("id") % 500 + 0.25).alias("value"))
    counters = [tuple(r) for r in qcm_counters(df, "value").collect()]
    slack = 2 * QCM_LEVELS * n / CM_WIDTH
    for q in (0.1, 0.5, 0.9):
        v = qcm_quantile(counters, q, n)
        true_rank = df.filter(F.col("value") <= v).count()
        # one-sided overestimates can only make the search stop EARLY
        # (smaller value): the found value's true rank may sit below
        # the target by at most the overcount, and at most one
        # quantization step above it
        assert true_rank >= q * n - slack, (q, v, true_rank)
        prev_rank = df.filter(F.col("value") <= v - 0.01).count()
        assert prev_rank <= q * n + slack, (q, v, prev_rank)


def test_dedup_spans_planted_duplicates(spark):
    """Two docs sharing a 60-char paragraph + one self-repeating doc:
    spans must cover exactly the planted regions; a unique-text doc
    must not appear."""
    from guagua_spark.operators import dedup as D

    para = "the quick brown fox jumps over the lazy dog again and again!"
    assert len(para) == 60
    # aperiodic by construction: distinct 2-char base-26 blocks (a
    # modular pattern would repeat its own 25-char windows)
    uniq1 = "".join(
        chr(97 + i // 26) + chr(97 + i % 26) for i in range(40)
    )
    uniq2 = "".join(
        chr(97 + i // 26) + chr(97 + i % 26) for i in range(100, 140)
    )
    rep = "abcdefghijklmnopqrstuvwxyz012345"  # 32 chars, repeated twice
    rows = [
        (1, uniq1 + para),
        (2, para + uniq2),
        (3, rep + rep),
        (4, "x" * 10),  # too short for any shingle
        (5, "completely unique text with no repeats anywhere inside!!"),
    ]
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r.doc_id: r
            for r in D.dedup_spans(spark, td).collect()
        }
    W = D.SPAN_W
    # docs 1 and 2: exactly the 60-char paragraph is duplicated
    assert out[1].n_dup_spans == 1 and out[1].dup_chars == 60
    assert out[2].n_dup_spans == 1 and out[2].dup_chars == 60
    # doc 3: every window of rep+rep repeats (self-repetition), so the
    # whole 64 chars are one span
    assert out[3].n_dup_spans == 1 and out[3].dup_chars == 64
    assert 4 not in out and 5 not in out


def test_dedup_spans_boilerplate_shingle_skew(spark):
    """One boilerplate prefix shared by 50% of 200 docs — the skew
    shape that killed the round-10 window-on-h form (every occurrence
    of a hot shingle in ONE window partition, un-splittable by AQE).
    The two-phase groupBy+join form must return exact values: each
    boilerplate doc's dup region is exactly the 40-char prefix, and
    fully-unique docs are absent."""
    import pandas as pd

    from guagua_spark.operators import dedup as D

    W = D.SPAN_W  # 25
    boiler = "BOILERPLATE-HEADER-" + "x" * 21  # 40 chars
    assert len(boiler) == 40
    rows = []
    for i in range(200):
        # distinct single leading char per doc (wide unicode block) so
        # every boiler+tail straddle window is unique to its doc
        tail = chr(0x4E00 + i) + f"-unique-tail-{i:04d}-" + "z" * 20
        if i % 2 == 0:
            rows.append((i, boiler + tail))
        else:
            rows.append((i, tail + tail))  # self-repeating, no boiler
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r.doc_id: r for r in D.dedup_spans_df(docs).collect()}
    for i in range(0, 200, 2):
        # windows p=1..16 sit fully inside the boiler -> span [1, 40]
        assert out[i].n_dup_spans == 1, out[i]
        assert out[i].dup_chars == 40, out[i]
    for i in range(1, 200, 2):
        # tail+tail self-repeats over its full length
        assert out[i].n_dup_spans == 1, out[i]
