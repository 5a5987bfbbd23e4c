"""Event-stream analytics over the ``events`` table: tumbling-window
aggregation, gap-based sessionization, top-N per group, JSON property
extraction, and cumulative per-user metrics.

The reference has no window/streaming operators at all (SURVEY.md §2.9
— iterations are synchronous batch rounds); these are the
beyond-reference extensions a training-data pipeline needs, expressed
as Catalyst-native window/group operators so they scale:

- tumbling windows are a plain groupBy on a truncated timestamp — a
  single hash-aggregate shuffle on (bucket, type), map-side partial
  aggregation included;
- sessionization is the classic lag/cum-sum formulation: one shuffle on
  user_id (window partition), no self-join, no UDF — at 100 TB the only
  cost is the sort within each user partition, and AQE handles skewed
  users;
- top-N per group is row_number over a window, filter pushed right
  after the rank so only N rows per group survive the exchange;
- JSON extraction uses get_json_object (codegen'd) — no Python.

Every operator here is deterministic and oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from guagua_spark.functions.scale import binder_hash_col
from guagua_spark.sources.tables import load_table

SESSION_GAP_MINUTES = 30
TOP_N = 3


def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window event counts + value stats per event_type.

    ``F.window`` would give the same buckets; date_trunc keeps the
    output schema flat (one sortable timestamp column) and matches the
    ANSI oracle exactly.

    ``hll_*`` (round 9): the HyperLogLog distinct-count certificate
    (hll_cert_df — per-type register checksums + estimates + exact
    validators), memoized per events fingerprint and attached as typed
    literal columns — driver-certifies the events_distinct_users_hll
    LOCAL operator inside this green row.
    """
    from guagua_spark.operators.certmemo import cached_cert_cols

    hll_cols = cached_cert_cols(
        spark,
        sf_dir,
        "hll_users",
        ("events",),
        "hll_types bigint, hll_reg_sum bigint, hll_raw_e6 bigint, "
        "hll_exact_sum bigint",
        lambda: hll_cert_df(spark, sf_dir),
    )
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select("*", *hll_cols)
        .orderBy("hour", "event_type")
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (new session when > 30 min idle);
    returns per-session start/end/#events/total value.

    lag → gap flag → cumulative sum = session id. Two window passes over
    the same (user_id × ts) sort order, so Catalyst plans ONE exchange +
    ONE sort and reuses them for both windows.
    """
    ev = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts")
    # interval comparison, not epoch casts: TIMESTAMP_NTZ (how Spark 4
    # reads timezone-less parquet timestamps) forbids cast-to-long, while
    # ts - lag(ts) > INTERVAL works identically for NTZ and LTZ
    with_flag = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts") - F.lag("ts").over(by_user)
            > F.expr(f"INTERVAL {SESSION_GAP_MINUTES} MINUTES"),
            1,
        ).otherwise(0),
    )
    with_sid = with_flag.withColumn(
        "session_seq", F.sum("new_session").over(by_user) + 1
    )
    # sbg_* (round 12): the session-bigram transition-matrix
    # certificate -- same gap construction as this query, so a session-
    # boundary disagreement between the two operators flips the binder
    sbg_cols = _sbg_cert_cols(spark, sf_dir)
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select("*", *sbg_cols)
        .orderBy("user_id", "session_seq")
    )


def _per_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, user_id, total_value, n_events) — shared by the
    window top-N query and the salted-top-k certificate, so both rank
    the SAME aggregated relation."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 6).alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


def salted_topk_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row certificate binding functions.scale.salted_topk into a
    hash-checked contract row: runs the REAL salted operator (two-phase
    per-salt rank → bounded merge, ``pin=True`` because the input is a
    shuffle-rooted aggregate) over the same per-user relation the host
    query windows, and condenses its top-N to (row count,
    Σ u32(md5(event_type|rank|user_id)), Σ round(total_value·10⁶)).
    The oracle replays the PLAIN window top-N — equality is exactly
    salted_topk's contract (same result under a total order), so a
    dropped winner, a wrong rank, or a tie broken by salt placement
    all flip an integer."""
    from guagua_spark.functions.scale import salted_topk, u32_hash

    topk = salted_topk(
        _per_user_totals(spark, sf_dir),
        ["event_type"],
        [F.col("total_value").desc(), F.col("user_id")],
        TOP_N,
        pin=True,
    )
    # coalesce the string key: concat_ws silently SKIPS nulls while
    # the oracle's || yields NULL and drops the row from the sum — a
    # NULL event_type would flip the hash asymmetrically (round-8
    # review; sentinel matches the gs-label convention)
    binder = u32_hash(
        "stk",
        F.concat_ws(
            "|",
            F.coalesce(F.col("event_type"), F.lit("~")),
            F.col("rank").cast("string"),
            F.col("user_id").cast("string"),
        ),
    )
    return topk.agg(
        F.count(F.lit(1)).cast("bigint").alias("stk_rows"),
        F.sum(binder).cast("bigint").alias("stk_hash"),
        F.sum(F.round(F.col("total_value") * 1e6))
        .cast("bigint")
        .alias("stk_val_e6"),
    )


def events_top_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by total value within each event_type.

    Aggregate FIRST (shrinks to |users|×|types| rows), then rank — the
    window runs over the aggregated relation, not the raw events.

    ``stk_*`` (round 8): the salted-top-k certificate
    (salted_topk_cert_df) — driver-certifies the skew-safe
    functions.scale.salted_topk against this row's own plain-window
    top-N, as typed literal columns.

    ``jcm_*`` (round 12): the CM join-size estimation certificate —
    events_join_size_cm's 1-row output (estimate, exact join size,
    both counter-table checksums) renamed and attached, binding the
    sketch-inner-product family into this green row.
    """
    from guagua_spark.operators.certmemo import cached_cert_cols

    stk_cols = cached_cert_cols(
        spark,
        sf_dir,
        "salted_topk",
        ("events",),
        "stk_rows bigint, stk_hash bigint, stk_val_e6 bigint",
        lambda: salted_topk_cert_df(spark, sf_dir),
    )
    jcm_cols = cached_cert_cols(
        spark,
        sf_dir,
        "join_size_cm",
        ("events",),
        "jcm_est bigint, jcm_exact bigint, jcm_ca bigint, jcm_cb bigint",
        lambda: events_join_size_cm(spark, sf_dir).select(
            F.col("est_join").alias("jcm_est"),
            F.col("exact_join").alias("jcm_exact"),
            F.col("ca_checksum").alias("jcm_ca"),
            F.col("cb_checksum").alias("jcm_cb"),
        ),
    )
    per_user = _per_user_totals(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_N)
        .select(
            "event_type",
            "rank",
            "user_id",
            "total_value",
            "n_events",
            *stk_cols,
            *jcm_cols,
        )
        .orderBy("event_type", "rank")
    )


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract the JSON ``props.k`` int and aggregate by event_type —
    schema-on-read over a JSON string column, entirely codegen'd
    (get_json_object), no Python in the loop.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def events_user_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) value per user over time, last event per
    user returned — i.e. each user's lifetime total and final event ts.

    Formulated as max_by/aggregation rather than materializing the full
    running column for every row: the running window is computed, but
    only the last row per user leaves the stage.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    by_user = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    # gfl_* (round 12): the hourly gap-fill/LOCF certificate — the
    # thematic sibling (both are per-user time-series windows) rides
    # this contract row
    gfl_cols = _gfl_cert_cols(spark, sf_dir)
    running = ev.withColumn(
        "running_value", F.round(F.sum("value").over(w), 6)
    ).withColumn("rn", F.row_number().over(by_user))
    return (
        running.filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("running_value").alias("lifetime_value"),
        )
        .select("*", *gfl_cols)
        .orderBy("user_id")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Generic as-of (point-in-time) LEFT join: every ``left`` row gets
    the ``right`` row with the greatest ``right_ts`` ≤ its ``left_ts``
    within the same ``on`` key (nulls when none precede it).

    Spark has no ASOF JOIN operator; the scalable formulation is
    union-the-sides + one window pass. Tag right rows 0 and left rows
    1, sort each key's rows by (ts, tag), and carry the last non-null
    right payload forward with last(..., ignorenulls) over a running
    frame. That is ONE shuffle on the key and ONE sort — the merge plan
    a native as-of join would pick — with no range-join row explosion
    and no nested loop, so it survives a 100× scale-up unchanged. The
    ``right`` side must be unique per (key, ts) for determinism;
    pre-aggregate it if it is not.

    Output: all ``left`` columns, plus ``prefix+right_ts`` and
    ``prefix+c`` for each c in ``right_cols``.
    """
    tag = "__asof_is_probe"
    ts = "__asof_ts"
    payload = [right_ts, *right_cols]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias(ts),
        F.lit(0).alias(tag),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left.columns
            if c != on
        ],
    )
    l_side = left.select(
        F.col(on),
        F.col(left_ts).alias(ts),
        F.lit(1).alias(tag),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in payload
        ],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c != on],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts, tag)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l_side)
    for c in payload:
        carried = carried.withColumn(
            f"__r_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    out_cols = [
        F.col(f"__l_{c}").alias(c) if c != on else F.col(on)
        for c in left.columns
    ]
    out_cols += [F.col(f"__r_{c}").alias(f"{prefix}{c}") for c in payload]
    return carried.filter(F.col(tag) == 1).select(*out_cols)


def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event, the most recent purchase by the same user
    at or before the click — the generic asof_join applied to the
    events table. Purchases are pre-deduped per (user, ts) with
    max(value) so ties are deterministic in both engines; a purchase at
    exactly the click ts counts (≤, right side sorts first on ties).
    """
    ev = load_table(spark, sf_dir, "events")
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(
        clk,
        pur,
        on="user_id",
        right_cols=("pvalue",),
        prefix="last_purchase_",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "click_value",
        F.col("last_purchase_ts"),
        F.col("last_purchase_pvalue").alias("last_purchase_value"),
    ).orderBy("event_id")


HIST_WIDTH = 10.0


def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event_type (bucket = ⌊value/10⌋)
    — the data-profiling primitive. Integer bucketing keeps it exact in
    any engine; one hash-agg shuffle on (type, bucket) with map-side
    partials, cardinality bounded by types × buckets regardless of
    input size."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / F.lit(HIST_WIDTH)).alias("bucket")
    from guagua_spark.operators.certmemo import cached_cert_cols

    # qcm_* (round 10): the dyadic Count-Min rank-sketch certificate
    # (qcm_cert_df) — driver-certifies events_value_rank_qcm (the
    # fifth sketch family) inside this green row (column-merge
    # pattern); memoized per events fingerprint
    qcm_cols = cached_cert_cols(
        spark,
        sf_dir,
        "qcm_rank",
        ("events",),
        "qcm_n bigint, qcm_est_sum bigint, qcm_exact_sum bigint,"
        " qcm_hash bigint",
        lambda: qcm_cert_df(spark, sf_dir),
    )
    return (
        ev.select("event_type", bucket)
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("*", *qcm_cols)
        .orderBy("event_type", "bucket")
    )


RETENTION_MAX_DAYS = 7


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day;
    for each (cohort_day, day_offset ≤ 7) the count of distinct users
    active that day. Two aggregations: per-user first day
    (map-side-combined MIN, shuffle on user), then the event stream
    joins the one-row-per-user cohorts and the ONLY distinct runs
    after the retention-window filter, where the domain is bounded at
    ≤ RETENTION_MAX_DAYS+1 cells per user — no corpus-wide
    DISTINCT (user, day) intermediate (~500M rows at the 1B-event
    sf1000 rung), and the raw events never join themselves.

    No broadcast hint on the cohorts join: cohorts has one row per USER,
    a data-proportional cardinality that would OOM a forced broadcast at
    100×; both sides are already partitioned by user_id from their
    aggregations, and AQE may still pick a broadcast when the side is
    genuinely small. The 1-row certificate cross joins DO carry
    explicit broadcast hints (safe: bounded 1-row literals): with two
    chained certificate joins Catalyst planned a CartesianProduct
    (32×32 = 1024 partitions of pure task-scheduling overhead, ~20 s
    per run at sf0.1 — caught by the round-10 bench lane), where the
    single-join form had been auto-broadcast on size alone.

    ``lat_*``: the CDC latest-per-key certificate — a 1-row rollup of
    the ACTUAL rx_latest_per_key output (the skew-immune max_by
    compaction, relational_ext): surviving-row count, the sum of the
    surviving event_ids, and a Σ-safe binder hash over
    (user_id, event_id) binding WHICH event was selected as latest for
    WHICH user (event_id is unique, so it determines the whole
    surviving row; the former user_id·event_id weighted sum overflowed
    BIGINT at sf100 — functions/scale.binder_hash_col). All integer
    sums — exact cross-engine. Memoized per events fingerprint
    (certmemo); miss cost reports as _index:cert:latest_per_key. This
    certifies the standalone LOCAL operator inside the 50-slot cap.

    ``blm_*`` (round 10): the Bloom semi-join certificate
    (bloom_cert_df) — bit-set cardinality, map-side pass count, the
    hash-weighted per-type post-join event counts, and Σ distinct
    buyers, binding events_bloom_semijoin (the last sketch outside the
    certification pattern) into this green row."""
    from guagua_spark.operators.certmemo import cached_cert_row
    from guagua_spark.operators.relational_ext import rx_latest_per_key

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    # cohorts straight off the event stream (map-side-combined MIN
    # into one row per user) — no corpus-wide DISTINCT (user, day)
    # intermediate: that relation is ~500M rows at the 1B-event rung
    # (the sf1000 probe) and every consumer can do without it; the
    # only distinct left runs AFTER the retention-window filter, where
    # the domain is ≤ RETENTION_MAX_DAYS+1 cells per user (the same
    # shape change that fixed the DuckDB oracle's >50 GB temp spill)
    cohorts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cert = cached_cert_row(
        spark,
        sf_dir,
        "latest_per_key",
        ("events",),
        "lat_n_users bigint, lat_eid_hash bigint, lat_hash bigint",
        lambda: rx_latest_per_key(spark, sf_dir).agg(
            F.count(F.lit(1)).alias("lat_n_users"),
            # Σ-safe binder (ex lat_eid_sum = Σ per-user max event_id
            # ~ users·N — overflow horizon ~4e9 users; SCALE.md audit)
            F.sum(binder_hash_col("late", F.col("event_id")))
            .cast("bigint")
            .alias("lat_eid_hash"),
            # Σ-safe binder (round 10): Σ user_id·event_id reaches
            # ~1e20 at sf100 — the ts_checksum overflow class
            F.sum(
                binder_hash_col(
                    "lat", F.col("user_id"), F.col("event_id")
                )
            )
            .cast("bigint")
            .alias("lat_hash"),
        ),
    )
    bcert = cached_cert_row(
        spark,
        sf_dir,
        "bloom_semijoin",
        ("events",),
        "blm_bits bigint, blm_pass bigint, blm_ev_wsum bigint, "
        "blm_buyers bigint",
        lambda: bloom_cert_df(spark, sf_dir),
    )
    return (
        ev.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .filter(F.col("day_offset") <= RETENTION_MAX_DAYS)
        .groupBy("cohort_day", "day_offset")
        # the distinct happens HERE, after the window filter: raw
        # (user, day) duplicates collapse into ≤ max_days+1 cells per
        # user — same n_users as the former distinct-then-join, with
        # no corpus-wide distinct ever materialized
        .agg(F.countDistinct("user_id").alias("n_users"))
        .crossJoin(F.broadcast(cert))
        .crossJoin(F.broadcast(bcert))
        .orderBy("cohort_day", "day_offset")
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → click → purchase: how many
    users signed up, then clicked at/after their first signup, then
    purchased at/after that first qualifying click.

    Each stage aggregates BEFORE joining (one row per user), so the
    raw events table is scanned, never self-joined row-to-row. No
    broadcast hints: the per-user stage aggregates grow with the data
    (a forced broadcast of them is exactly the 100× OOM anti-pattern);
    the joins and aggregations all hash on user_id so consecutive
    stages reuse one partitioning, and AQE still converts to broadcast
    at runtime when a side is genuinely under the threshold.

    ``aov_*`` (round 10): the HLL audience-overlap certificate
    (aov_cert_df — weighted register checksums, raw-estimate
    inclusion-exclusion in µ-units, exact intersection/union) —
    driver-certifies the events_audience_overlap LOCAL operator
    inside this green row.
    """
    from guagua_spark.operators.certmemo import cached_cert_row

    aov = cached_cert_row(
        spark,
        sf_dir,
        "audience_overlap",
        ("events",),
        "aov_reg_sum bigint, aov_raw_e6 bigint, "
        "aov_exact_inter bigint, aov_exact_union bigint",
        lambda: aov_cert_df(spark, sf_dir),
    )
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_signup"),
            F.count("click_ts").alias("n_click_after_signup"),
            F.count("purchase_ts").alias("n_purchase_after_click"),
        )
        .crossJoin(F.broadcast(aov))
    )


# -- oracle SQL --------------------------------------------------------------

ORACLE_SQL = {
    # events_windowed_agg's oracle is assigned below the HLL section
    # (its hll_* certificate splice needs the sketch CTE builders)
    # assigned at the bottom — splices the sbg_* session-bigram
    # certificate CTE (round 12)
    "events_sessionize": None,
    # assigned at the bottom — splices the jcm_* join-size-CM
    # certificate CTE (round 12; keeps the inline stk_* block)
    "events_top_users_per_type": None,
    "events_json_props": """
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""".strip(),
    # assigned at the bottom — splices the gfl_* gap-fill
    # certificate CTE (round 12; the gapfill oracle lives below)
    "events_user_running_value": None,
    "events_asof_purchase": """
WITH pur AS (
  SELECT user_id, ts, MAX(value) AS pvalue
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
clk AS (
  SELECT event_id, user_id, ts, value AS click_value
  FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts, c.click_value,
       p.ts AS last_purchase_ts, p.pvalue AS last_purchase_value
FROM clk c ASOF LEFT JOIN pur p
  ON c.user_id = p.user_id AND p.ts <= c.ts
ORDER BY c.event_id
""".strip(),
    # events_funnel is assigned at the bottom of the module
    # (_funnel_aov_oracle): its oracle splices the aov_*
    # audience-overlap certificate CTEs (round 10)
    "events_funnel": None,
    # events_histogram is assigned at the bottom of the module: its
    # oracle splices the qcm_* dyadic-rank certificate CTEs (round 10)
    "events_histogram": None,
    # events_retention is assigned below (_retention_bloom_oracle):
    # it splices the latest-per-key AND the round-10 Bloom certificate
    # CTEs, which are defined later in the module
}

QUERIES = {
    "events_windowed_agg": events_windowed_agg,
    "events_sessionize": events_sessionize,
    "events_top_users_per_type": events_top_users_per_type,
    "events_json_props": events_json_props,
    "events_user_running_value": events_user_running_value,
    "events_asof_purchase": events_asof_purchase,
    "events_funnel": events_funnel,
    "events_histogram": events_histogram,
    "events_retention": events_retention,
}


def events_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type by HyperLogLog next to the exact
    truth — the GROUPED distinct-count sketch (functions/sketch.py):
    per (event_type, bucket) register MAX is map-side combinable, so
    the exchange carries ≤ types·1024 rows at any event volume, where
    COUNT(DISTINCT user_id) shuffles every distinct (type, user) pair.
    The cardinalities here sit in linear-counting range (n ≪ m), so
    hll_est exercises the small-range branch; hll_est_raw and the
    register checksum stay integer-exact."""
    from guagua_spark.functions.sketch import (
        hll_estimate_cols,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("user_id").cast("string").alias("uid")
    )
    est = (
        hll_registers(ev, "uid", group_cols=("event_type",))
        .groupBy("event_type")
        .agg(*hll_estimate_cols())
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("uid").cast("bigint").alias("exact_users")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "*",
            F.round(
                (F.col("hll_est") - F.col("exact_users"))
                / F.col("exact_users"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


def _hll_rows_ctes() -> str:
    """``hev`` → ``hrows`` CTE block replaying
    events_distinct_users_hll — shared by its standalone oracle and
    the hll_* certificate splice in the windowed-agg contract oracle."""
    from guagua_spark.functions.sketch import (
        hll_bucket_sql,
        hll_estimate_sql,
        hll_rank_sql,
    )

    return f"""hev AS (
  SELECT event_type, CAST(user_id AS VARCHAR) AS uid FROM events
),
hregs AS (
  SELECT event_type, {hll_bucket_sql('uid')} AS bucket,
         MAX({hll_rank_sql('uid')}) AS reg
  FROM hev WHERE uid IS NOT NULL GROUP BY 1, 2
),
hest AS (SELECT event_type, {hll_estimate_sql()}
         FROM hregs GROUP BY event_type),
hex AS (SELECT event_type,
               CAST(COUNT(DISTINCT uid) AS BIGINT) AS exact_users
        FROM hev GROUP BY 1),
hrows AS (
  SELECT hest.event_type, hll_used, hll_reg_checksum, hll_est_raw,
         hll_est, exact_users,
         ROUND((hll_est - exact_users) / exact_users, 6) AS rel_err
  FROM hest JOIN hex ON hest.event_type = hex.event_type
)"""


def _distinct_users_hll_oracle() -> str:
    return f"""
WITH {_hll_rows_ctes()}
SELECT * FROM hrows ORDER BY event_type
""".strip()


def hll_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row certificate binding events_distinct_users_hll into the
    hash-checked windowed-agg contract row (column-merge pattern,
    SURVEY.md §7): type count, Σ register checksums (binds every
    register of every type's sketch), Σ round(est_raw·10⁶) over the
    6dp-rounded per-type RAW estimates (cents pattern), and Σ exact
    distinct users. A flipped register, a drifted estimate, or a wrong
    exact count each flip an integer. The certificate binds
    ``hll_est_raw`` — exact by construction (the inverse power sum is
    exactly representable; see hll_estimate_cols) — not ``hll_est``,
    whose linear-counting branch is LN/libm and stays under the
    rtol-gated LOCAL oracle only (round-9 advice: a last-ulp LN flip
    per event type was the one remaining libm exposure in a
    hash-certified row)."""
    h = events_distinct_users_hll(spark, sf_dir)
    return h.agg(
        F.count(F.lit(1)).cast("bigint").alias("hll_types"),
        F.sum("hll_reg_checksum").cast("bigint").alias("hll_reg_sum"),
        F.sum(F.round(F.col("hll_est_raw") * 1e6))
        .cast("bigint")
        .alias("hll_raw_e6"),
        F.sum("exact_users").cast("bigint").alias("hll_exact_sum"),
    )


def _windowed_agg_oracle() -> str:
    return f"""
WITH {_hll_rows_ctes()},
hllcert AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS hll_types,
         CAST(SUM(hll_reg_checksum) AS BIGINT) AS hll_reg_sum,
         CAST(SUM(ROUND(hll_est_raw * 1e6)) AS BIGINT) AS hll_raw_e6,
         CAST(SUM(exact_users) AS BIGINT) AS hll_exact_sum
  FROM hrows
)
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value,
       ROUND(AVG(value), 6) AS avg_value,
       hll_types, hll_reg_sum, hll_raw_e6, hll_exact_sum
FROM events, hllcert
GROUP BY 1, 2, hll_types, hll_reg_sum, hll_raw_e6, hll_exact_sum
ORDER BY 1, 2
""".strip()


ORACLE_SQL["events_windowed_agg"] = _windowed_agg_oracle()


#: oracle-tested locally (tests/test_sketch.py); outside the 50-slot
#: driver contract
LOCAL_QUERIES = {
    "events_distinct_users_hll": events_distinct_users_hll,
}
LOCAL_ORACLE_SQL = {
    "events_distinct_users_hll": _distinct_users_hll_oracle(),
}


#: session memo of the distinct-buyer relation + its Bloom bit set —
#: sf_dir → (events fingerprint, buyers DF, bits frozenset). Two
#: consumers per session (the LOCAL entry + the blm_* cert build
#: riding events_retention) each re-ran the buyer distinct AND the
#: driver bit-set collect before round 13; both are indexes of the
#: static purchase side (the `_trade_edges` contract — never
#: precomputed across runs, a fresh process pays the build in its
#: cold lane as ``_index:bloom_buyers``). The event-stream scan + the
#: rollup join below stay per-invocation work.
_BLOOM_CACHE: dict = {}


def clear_caches() -> None:
    """Unpersist and drop the buyer/bit-set memo (data-regen hook)."""
    for _, buyers, _bits in _BLOOM_CACHE.values():
        buyers.unpersist()
    _BLOOM_CACHE.clear()


def _bloom_buyers(spark: SparkSession, sf_dir: str):
    from guagua_spark.functions.sketch import bloom_bits
    from guagua_spark.sources.tables import table_fingerprint

    fp = table_fingerprint(sf_dir, "events")
    hit = _BLOOM_CACHE.get(sf_dir)
    if hit is not None:
        if hit[0] == fp:
            return hit[1], hit[2]
        hit[1].unpersist()
    import time as _time

    from guagua_spark.metrics import record_index_build

    t0 = _time.monotonic()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("buyer_id"))
        .distinct()
        .persist()
    )
    bits = frozenset(
        r.bit
        for r in bloom_bits(
            buyers.select(F.col("buyer_id").cast("string").alias("k")), "k"
        ).collect()
    )  # bounded driver fetch: ≤ BLOOM_M ints
    record_index_build("bloom_buyers", _time.monotonic() - t0)
    _BLOOM_CACHE[sf_dir] = (fp, buyers, bits)
    return buyers, bits


def events_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type rollup of purchasers' events, computed through a BLOOM
    semi-join reduction: the purchase-side user ids build a ≤4096-int
    bit set (functions/sketch.bloom_bits) applied MAP-SIDE to the big
    event stream before the exact semi join — the engine-portable,
    SQL-certifiable analogue of Spark's runtime bloom-join filters.
    No false negatives ⇒ the rollup EQUALS the plain semi join (the
    oracle and tests assert exactly that); ``blm_bits``/``blm_pass``
    bind the bit set and the pruning predicate bit-for-bit."""
    from pyspark.sql.window import Window

    from guagua_spark.functions.sketch import bloom_keep_col

    # key columns only: every decision below needs (event_type,
    # user_id) — projecting here keeps the props payload out of both
    # passes (guide: project before opaque/wide operations)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    )
    # the distinct buyer set + its bit set come from the session memo
    # (`_bloom_buyers`): the persisted relation feeds BOTH the bit-set
    # build (driver collect, paid once per corpus fingerprint) and the
    # exact join below
    buyers, bits = _bloom_buyers(spark, sf_dir)
    pruned = ev.filter(
        bloom_keep_col(F.col("user_id").cast("string"), bits)
    )
    # ONE pass computes the rollup AND the pass count: the old shape
    # ran a separate pruned.count() job (a third corpus scan) and an
    # exact LEFT SEMI join; a LEFT join against the DISTINCT buyer set
    # adds at most one match per row, so counting matches == counting
    # semi-join survivors, and Σ per-type pruned rows == the map-side
    # pass count. Types whose pruned rows are all bloom false
    # positives are filtered (the semi join never produced them).
    g = (
        pruned.join(
            buyers, pruned["user_id"] == buyers["buyer_id"], "left"
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("_pass"),
            F.count("buyer_id").alias("n_events"),
            F.count_distinct(
                F.when(F.col("buyer_id").isNotNull(), F.col("user_id"))
            )
            .cast("bigint")
            .alias("n_buyers"),
        )
    )
    lazy = (
        # Σ _pass over the ≤|event-type-domain| grouped rows — a
        # single-partition window over a domain-bounded relation
        g.withColumn(
            "blm_pass",
            F.sum("_pass").over(Window.partitionBy()).cast("bigint"),
        )
        .filter(F.col("n_events") > 0)
        .select(
            "event_type",
            "n_events",
            "n_buyers",
            F.lit(len(bits)).cast("bigint").alias("blm_bits"),
            "blm_pass",
        )
        .orderBy("event_type")
    )
    out = lazy.localCheckpoint(eager=True)  # ≤|types| rows —
    # materialize eagerly (the buyer relation now belongs to the
    # session memo, which owns its release)
    from guagua_spark.metrics import record_plan

    # the checkpoint above EXECUTED the real plan; snapshot it for the
    # bench plan-metrics tripwire (the returned frame is a stub)
    record_plan("events_bloom_semijoin", lazy)
    return out


def bloom_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row certificate binding events_bloom_semijoin into the
    hash-checked retention contract row (column-merge pattern): the
    bit-set cardinality and the map-side pass count (constant columns
    of the bloom relation — MIN picks the single value), a
    hash-weighted Σ over per-type post-semi-join event counts (binds
    WHICH count belongs to WHICH type; u32 % 1000003 keeps the sum far
    from BIGINT range at any sf), and Σ distinct buyers. All integers
    — exact cross-engine; a flipped bloom bit, a mis-pruned row, or a
    drifted rollup each flip one."""
    from guagua_spark.functions.scale import u32_hash

    b = events_bloom_semijoin(spark, sf_dir)
    w = u32_hash("blm", F.col("event_type")) % F.lit(1000003)
    return b.agg(
        F.min("blm_bits").cast("bigint").alias("blm_bits"),
        F.min("blm_pass").cast("bigint").alias("blm_pass"),
        F.sum(w * F.col("n_events")).cast("bigint").alias("blm_ev_wsum"),
        F.sum("n_buyers").cast("bigint").alias("blm_buyers"),
    )


def _bloom_ctes() -> str:
    """``bku`` → ``bbits`` → ``bprune`` → ``bsemi`` CTE block replaying
    events_bloom_semijoin — shared by its standalone LOCAL oracle and
    the blm_* certificate splice in the retention contract oracle."""
    from guagua_spark.functions.sketch import BLOOM_K, bloom_bit_sql

    bits_union = "\n  UNION ALL\n  ".join(
        f"SELECT {bloom_bit_sql(i, 'k')} AS bit FROM bku"
        for i in range(BLOOM_K)
    )
    uid = "CAST(user_id AS VARCHAR)"
    keep = " AND ".join(
        f"{bloom_bit_sql(i, uid)} IN (SELECT bit FROM bbits)"
        for i in range(BLOOM_K)
    )
    return f"""bku AS MATERIALIZED (
  -- referenced by every bbits branch AND the bsemi semi-join: without
  -- MATERIALIZED DuckDB inlines this corpus distinct K^2 times (the
  -- concurrent spills filled the disk at the 1B-event sf1000 rung)
  SELECT DISTINCT CAST(user_id AS VARCHAR) AS k FROM events
  WHERE event_type = 'purchase'
),
bbits AS MATERIALIZED (SELECT DISTINCT bit FROM ({bits_union})),
bprune AS (
  -- key columns only: the consumers need (event_type, user_id) and a
  -- COUNT — SELECT * would drag the props payload through the filter
  SELECT event_type, user_id FROM events WHERE {keep}
),
bsemi AS (
  SELECT * FROM bprune WHERE {uid} IN (SELECT k FROM bku)
)"""


def _bloom_semijoin_oracle() -> str:
    return f"""
WITH {_bloom_ctes()}
SELECT event_type, COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bbits) AS blm_bits,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bprune) AS blm_pass
FROM bsemi GROUP BY 1 ORDER BY 1
""".strip()


LOCAL_QUERIES["events_bloom_semijoin"] = events_bloom_semijoin
LOCAL_ORACLE_SQL["events_bloom_semijoin"] = _bloom_semijoin_oracle()


def _retention_bloom_oracle() -> str:
    """The events_retention contract oracle with the blm_* Bloom
    certificate spliced in (round-10: the Bloom family joins its three
    sketch siblings inside a driver-hash-checked row). ``bwsum`` binds
    the per-type assignment of post-semi-join counts (u32 % 1000003
    keeps the weighted sum far from BIGINT range at any sf)."""
    w = (
        "CAST(CAST(('0x' || substr(md5('blm|' || event_type), 1, 8))"
        " AS UBIGINT) % 1000003 AS BIGINT)"
    )
    return f"""
WITH {_bloom_ctes()},
bgrp AS (
  SELECT event_type, COUNT(*) AS n_events,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers
  FROM bsemi GROUP BY 1
),
blm AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bbits) AS blm_bits,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM bprune) AS blm_pass,
         CAST(SUM({w} * n_events) AS BIGINT) AS blm_ev_wsum,
         CAST(SUM(n_buyers) AS BIGINT) AS blm_buyers
  FROM bgrp
),
cohorts AS (
  -- straight per-user MIN over events (20M groups, constant state
  -- per user): the former DISTINCT (user_id, day) intermediate was
  -- ~500M rows at the 1B-event sf1000 rung and, MATERIALIZED, was
  -- the oracle's last >50 GB temp spill
  SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
  FROM events GROUP BY 1
),
lat_pick AS (
  -- latest event per user as a HASH AGG, not a window: the former
  -- ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
  -- formulation globally SORTS the corpus — its spill filled the
  -- disk at the 1B-event sf1000 rung. arg_max over the exact integer
  -- composite epoch_us(ts)·2⁶⁴ + event_id is the identical
  -- (ts, event_id)-lexicographic pick (event_id < 2⁶⁴; int128
  -- arithmetic, no rounding), with per-user state only.
  SELECT user_id,
         arg_max(event_id,
                 CAST(epoch_us(ts) AS HUGEINT)
                   * CAST(18446744073709551616 AS HUGEINT)
                   + event_id) AS event_id
  FROM events GROUP BY user_id
),
lat AS (
  SELECT COUNT(*) AS lat_n_users,
         CAST(SUM(CAST(CAST(('0x' || substr(md5('late|' || CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000003 AS BIGINT)) AS BIGINT) AS lat_eid_hash,
         CAST(SUM(CAST(CAST(('0x' || substr(md5('lat|' || CAST(user_id AS VARCHAR) || '|' || CAST(event_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 1000003 AS BIGINT)) AS BIGINT) AS lat_hash
  FROM lat_pick
),
ret AS (
  -- window filter BEFORE the distinct: joining raw events to cohorts
  -- and filtering to the first {RETENTION_MAX_DAYS}+1 days shrinks
  -- the distinct's domain to <= (max_days+1) cells per user, versus
  -- a corpus-wide DISTINCT (user_id, day) first (~500M rows at 1B
  -- events). Exact: (cohort_day, day_offset) is a function of
  -- (user_id, day), so DISTINCT over the filtered triples is the
  -- same cell set, and COUNT(*) of distinct triples equals the old
  -- per-cell COUNT of distinct users.
  SELECT cohort_day, day_offset, COUNT(*) AS n_users
  FROM (
    SELECT DISTINCT c.cohort_day,
           CAST(date_diff('day', c.cohort_day,
                          date_trunc('day', e.ts)) AS INT)
             AS day_offset,
           e.user_id
    FROM events e JOIN cohorts c ON e.user_id = c.user_id
    WHERE date_diff('day', c.cohort_day, date_trunc('day', e.ts))
            <= {RETENTION_MAX_DAYS}
  )
  GROUP BY 1, 2
)
SELECT ret.cohort_day, ret.day_offset, ret.n_users,
       lat.lat_n_users, lat.lat_eid_hash, lat.lat_hash,
       blm.blm_bits, blm.blm_pass, blm.blm_ev_wsum, blm.blm_buyers
FROM ret CROSS JOIN lat CROSS JOIN blm
ORDER BY ret.cohort_day, ret.day_offset
""".strip()


ORACLE_SQL["events_retention"] = _retention_bloom_oracle()


#: fixed rank/quantile probe points (value units) for the dyadic
#: Count-Min rank sketch — same fixture role as the CM probe terms and
#: the BM25 probe queries: they span the value domain so the estimates
#: exercise every dyadic level.
QCM_PROBE_VALUES = (50.0, 100.0, 200.0, 300.0, 400.0, 450.0)


def events_value_rank_qcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank (≤-count) estimates over ``events.value`` by the dyadic
    Count-Min sketch next to their exact truths — the bounded-memory
    QUANTILE sketch completing the five-family set (Misra-Gries / HLL
    / Count-Min / Bloom / dyadic-CM; functions/sketch.py): 16 levels ×
    4 rows × 256 buckets = ≤16384 exact-integer counters whatever the
    corpus size, rank(x) answered as ≤16 disjoint dyadic CM point
    reads. Estimates are ONE-SIDED (est ≥ exact, never below —
    property-tested) with overcount ≤ Σ_levels 2N/256 w.h.p. Exact
    ranks ride along as validator columns (the Misra-Gries recount
    contract: the sketch is certified against plain SQL, not
    trusted). At 100 TB this replaces a full sort / exact running-sum
    percentile pass with a CONSTANT-size shuffle.

    Reference parity: guagua has no quantile surface; this extends the
    sketch family the same way HLL/CM did (pure extension, no
    reference counterpart)."""
    from guagua_spark.functions.sketch import (
        QCM_SCALE,
        qcm_counters_from_per_value,
        qcm_per_value,
        qcm_rank_estimates,
    )

    ev = load_table(spark, sf_dir, "events")
    # ONE corpus pass: the (vq, n) histogram feeds BOTH the counter
    # fan and the exact prefix ranks (the oracle's vcnt CTE has always
    # aggregated `exact` from the pre-agg; this is the Spark mirror —
    # AQE's ReusedExchange serves the shared groupBy(vq) to both
    # consumers, guide §2.4). Integer identity: count(1) over raw rows
    # ≡ SUM(n) over the histogram, and the conditional count is the
    # same sum restricted by the group key.
    per_value = qcm_per_value(ev, "value")
    counters = qcm_counters_from_per_value(per_value)
    probes_q = [int(round(v * QCM_SCALE)) for v in QCM_PROBE_VALUES]
    est = qcm_rank_estimates(counters, probes_q)
    # coalesce: SUM over a zero-row histogram (empty/all-null corpus)
    # is NULL where the pre-refactor COUNT(1) forms yielded 0 — keep
    # the degenerate-input behavior identical (ADVICE r13); on any
    # non-empty corpus the coalesce is a no-op
    exact_wide = per_value.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n"),
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("vq") <= F.lit(xq), F.col("n")
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"x{xq}")
            for xq in probes_q
        ],
    )
    stack = ", ".join(f"{xq}L, x{xq}" for xq in probes_q)
    exact = exact_wide.selectExpr(
        "n", f"stack({len(probes_q)}, {stack}) AS (probe_q, exact_rank)"
    )
    return (
        est.join(exact, "probe_q")
        .select(
            (F.col("probe_q").cast("double") / QCM_SCALE).alias(
                "probe_value"
            ),
            "est_rank",
            "exact_rank",
            "n",
        )
        .orderBy("probe_value")
    )


def _qcm_ctes() -> str:
    """``v`` → ``fan`` → ``cnt`` → ``cells`` → ``creads`` → ``cest`` →
    ``est`` → ``exact`` CTE block replaying events_value_rank_qcm —
    shared by the standalone LOCAL oracle and the qcm_* certificate
    splice in the histogram contract oracle."""
    from guagua_spark.functions.sketch import (
        CM_DEPTH,
        QCM_LEVELS,
        QCM_SCALE,
        _qcm_bucket_sql,
        dyadic_prefix_cells,
        qcm_quantize_sql,
    )

    probes_q = [int(round(v * QCM_SCALE)) for v in QCM_PROBE_VALUES]
    cell_rows = ",\n    ".join(
        f"({xq}, {lvl}, {cell})"
        for xq in probes_q
        for (lvl, cell) in dyadic_prefix_cells(xq)
    )
    probe_rows = ", ".join(f"({xq})" for xq in probes_q)
    return f"""v AS (
  SELECT {qcm_quantize_sql("value")} AS vq FROM events
  WHERE value IS NOT NULL
),
vcnt AS MATERIALIZED (
  SELECT vq, COUNT(*) AS vn FROM v GROUP BY 1
),
fan AS (
  SELECT l.lvl, j.j,
         {_qcm_bucket_sql("l.lvl", "j.j", "v.vq >> l.lvl")} AS bucket,
         v.vn
  FROM vcnt v,
       (SELECT unnest(range({QCM_LEVELS})) AS lvl) l,
       (SELECT unnest(range({CM_DEPTH})) AS j) j
),
cnt AS (SELECT lvl, j, bucket, SUM(vn) AS n FROM fan GROUP BY 1, 2, 3),
cells(probe_q, lvl, cell) AS (VALUES
    {cell_rows}
),
creads AS (
  SELECT c.probe_q, c.lvl, c.cell, j.j,
         {_qcm_bucket_sql("c.lvl", "j.j", "c.cell")} AS bucket
  FROM cells c, (SELECT unnest(range({CM_DEPTH})) AS j) j
),
cest AS (
  SELECT r.probe_q, r.lvl, r.cell,
         MIN(COALESCE(cnt.n, 0)) AS cell_est
  FROM creads r
  LEFT JOIN cnt ON cnt.lvl = r.lvl AND cnt.j = r.j
              AND cnt.bucket = r.bucket
  GROUP BY 1, 2, 3
),
est AS (
  SELECT probe_q, CAST(SUM(cell_est) AS BIGINT) AS est_rank
  FROM cest GROUP BY 1
),
exact AS (
  SELECT p.probe_q,
         CAST(SUM(CASE WHEN v.vq <= p.probe_q THEN v.vn ELSE 0 END)
              AS BIGINT) AS exact_rank,
         CAST(SUM(v.vn) AS BIGINT) AS n
  FROM (VALUES {probe_rows}) p(probe_q), vcnt v
  GROUP BY 1
)"""


def _value_rank_qcm_oracle() -> str:
    from guagua_spark.functions.sketch import QCM_SCALE

    return f"""
WITH {_qcm_ctes()}
SELECT CAST(e.probe_q AS DOUBLE) / {QCM_SCALE} AS probe_value,
       e.est_rank, x.exact_rank, x.n
FROM est e JOIN exact x ON e.probe_q = x.probe_q
ORDER BY probe_value
""".strip()


def qcm_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row certificate binding events_value_rank_qcm into the
    hash-checked histogram contract row: the corpus size, Σ estimated
    and Σ exact ranks over the fixed probes, and a Σ-safe binder over
    (probe_q, est_rank) binding WHICH estimate belongs to WHICH probe.
    All integers — exact cross-engine; a flipped counter, a wrong
    dyadic decomposition, or a drifted estimate each flip one."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.functions.sketch import QCM_SCALE

    r = events_value_rank_qcm(spark, sf_dir)
    probe_q = F.round(F.col("probe_value") * QCM_SCALE).cast("bigint")
    return r.agg(
        F.min("n").cast("bigint").alias("qcm_n"),
        F.sum("est_rank").cast("bigint").alias("qcm_est_sum"),
        F.sum("exact_rank").cast("bigint").alias("qcm_exact_sum"),
        F.sum(binder_hash_col("qcm", probe_q, F.col("est_rank")))
        .cast("bigint")
        .alias("qcm_hash"),
    )


def _histogram_qcm_oracle() -> str:
    """The events_histogram contract oracle with the qcm_* dyadic-rank
    certificate spliced in (round 10: the quantile sketch joins its
    four sketch siblings inside a driver-hash-checked row)."""
    from guagua_spark.functions.scale import binder_hash_sql

    binder = binder_hash_sql(
        "qcm", "CAST(e.probe_q AS VARCHAR)", "CAST(e.est_rank AS VARCHAR)"
    )
    return f"""
WITH {_qcm_ctes()},
qcm AS (
  SELECT CAST(MIN(x.n) AS BIGINT) AS qcm_n,
         CAST(SUM(e.est_rank) AS BIGINT) AS qcm_est_sum,
         CAST(SUM(x.exact_rank) AS BIGINT) AS qcm_exact_sum,
         CAST(SUM({binder}) AS BIGINT) AS qcm_hash
  FROM est e JOIN exact x ON e.probe_q = x.probe_q
)
SELECT h.event_type, h.bucket, h.n,
       q.qcm_n, q.qcm_est_sum, q.qcm_exact_sum, q.qcm_hash
FROM (
  SELECT event_type, CAST(FLOOR(value / {HIST_WIDTH}) AS BIGINT) AS bucket,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
) h CROSS JOIN qcm q
ORDER BY h.event_type, h.bucket
""".strip()


LOCAL_QUERIES["events_value_rank_qcm"] = events_value_rank_qcm
LOCAL_ORACLE_SQL["events_value_rank_qcm"] = _value_rank_qcm_oracle()
ORACLE_SQL["events_histogram"] = _histogram_qcm_oracle()


# -- HLL audience overlap (round 10) -----------------------------------------

#: high-value threshold defining the two audiences — picked so the
#: audiences overlap partially at every probed sf (sf0.01: |A|=135,
#: |B|=127, |A∩B|=113); a plain >= on a parquet DOUBLE, so both
#: engines select identical rows
OVERLAP_VALUE_MIN = 90.0


def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation by HLL SET ALGEBRA — the sketch
    composition the per-type distinct count can't answer: |A∩B| for
    A = high-value clickers, B = high-value purchasers, via
    inclusion-exclusion est(A) + est(B) − est(A∪B), where the union
    sketch is hll_merge's register-wise MAX (never a re-scan of the
    union's raw rows). One row: the three register checksums (binding
    every register of all three sketches), the three raw estimates
    (exact-by-construction dyadic sums), the three CORRECTED estimates
    (linear counting — the meaningful numbers at small fill; LN/libm,
    which is fine here because this operator lives under the
    rtol-gated LOCAL oracle, not a hash-certified contract row — the
    hll_cert_df policy), the derived intersection estimate from the
    corrected values, and the four exact cardinalities for
    reference.

    100 TB shape: each audience's register build is the constant-size
    HLL exchange (≤ m rows per partition); the union costs a groupBy
    MAX over two m-row tables — the raw events are scanned once per
    audience and never again; exact counts ride ONE partial-agg
    exchange over the combined audience filter (per-user flag maxes,
    then four decomposable sums)."""
    from guagua_spark.functions.sketch import (
        hll_estimate_cols,
        hll_merge,
        hll_registers,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    hv = F.col("value") >= F.lit(OVERLAP_VALUE_MIN)
    a = ev.filter((F.col("event_type") == "click") & hv).select("user_id")
    b = ev.filter((F.col("event_type") == "purchase") & hv).select(
        "user_id"
    )
    reg_a = hll_registers(a, "user_id")
    reg_b = hll_registers(b, "user_id")
    reg_u = hll_merge(reg_a, reg_b)

    def _sketch_row(regs: DataFrame, tag: str) -> DataFrame:
        _, chk, raw, est = hll_estimate_cols()
        return regs.agg(
            chk.alias(f"{tag}_reg_checksum"),
            raw.alias(f"{tag}_est_raw"),
            est.alias(f"{tag}_est"),
        )

    aud = (
        ev.filter(
            hv & F.col("event_type").isin("click", "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("ha"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("hb"),
        )
    )
    exact = aud.agg(
        F.sum("ha").cast("bigint").alias("exact_a"),
        F.sum("hb").cast("bigint").alias("exact_b"),
        F.count(F.lit(1)).cast("bigint").alias("exact_union"),
        F.sum(F.col("ha") * F.col("hb")).cast("bigint").alias("exact_inter"),
    )
    return (
        exact.crossJoin(F.broadcast(_sketch_row(reg_a, "a")))
        .crossJoin(F.broadcast(_sketch_row(reg_b, "b")))
        .crossJoin(F.broadcast(_sketch_row(reg_u, "u")))
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_inter",
            "a_reg_checksum",
            "b_reg_checksum",
            "u_reg_checksum",
            "a_est_raw",
            "b_est_raw",
            "u_est_raw",
            "a_est",
            "b_est",
            "u_est",
            F.round(
                F.col("a_est") + F.col("b_est") - F.col("u_est"), 6
            ).alias("inter_est"),
        )
    )


def _aov_ctes() -> str:
    """``ra`` → ``ex`` CTE body replaying events_audience_overlap —
    shared by its standalone oracle and the aov_* certificate splice
    in the funnel contract oracle (the _hll_rows_ctes pattern)."""
    from guagua_spark.functions.sketch import (
        hll_bucket_sql,
        hll_estimate_sql,
        hll_rank_sql,
    )

    def regs(name: str, pred: str) -> str:
        return f"""{name} AS (
  SELECT {hll_bucket_sql('uid')} AS bucket,
         MAX({hll_rank_sql('uid')}) AS reg
  FROM (SELECT CAST(user_id AS VARCHAR) AS uid FROM events
        WHERE {pred} AND user_id IS NOT NULL)
  GROUP BY 1
)"""

    pa = f"event_type = 'click' AND value >= {OVERLAP_VALUE_MIN!r}"
    pb = f"event_type = 'purchase' AND value >= {OVERLAP_VALUE_MIN!r}"
    est = hll_estimate_sql()
    return f"""{regs("ra", pa)},
{regs("rb", pb)},
ru AS (
  SELECT bucket, MAX(reg) AS reg
  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1
),
ea AS (SELECT {est} FROM ra),
eb AS (SELECT {est} FROM rb),
eu AS (SELECT {est} FROM ru),
aud AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ha,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hb
  FROM events
  WHERE value >= {OVERLAP_VALUE_MIN!r}
    AND event_type IN ('click', 'purchase')
  GROUP BY 1
),
ex AS (
  SELECT CAST(SUM(ha) AS BIGINT) AS exact_a,
         CAST(SUM(hb) AS BIGINT) AS exact_b,
         CAST(COUNT(*) AS BIGINT) AS exact_union,
         CAST(SUM(ha * hb) AS BIGINT) AS exact_inter
  FROM aud
)"""


def _audience_overlap_oracle() -> str:
    return f"""
WITH {_aov_ctes()}
SELECT exact_a, exact_b, exact_union, exact_inter,
       ea.hll_reg_checksum AS a_reg_checksum,
       eb.hll_reg_checksum AS b_reg_checksum,
       eu.hll_reg_checksum AS u_reg_checksum,
       ea.hll_est_raw AS a_est_raw,
       eb.hll_est_raw AS b_est_raw,
       eu.hll_est_raw AS u_est_raw,
       ea.hll_est AS a_est,
       eb.hll_est AS b_est,
       eu.hll_est AS u_est,
       ROUND(ea.hll_est + eb.hll_est - eu.hll_est, 6) AS inter_est
FROM ex, ea, eb, eu
""".strip()


LOCAL_QUERIES["events_audience_overlap"] = events_audience_overlap
LOCAL_ORACLE_SQL["events_audience_overlap"] = _audience_overlap_oracle()


def aov_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row certificate binding events_audience_overlap into the
    hash-checked funnel contract row (column-merge pattern, SURVEY.md
    §7): a weighted sum of the three register checksums (weights 1/3/9
    so sketches can't swap places unnoticed), the RAW-estimate
    inclusion-exclusion in integer µ-units (the hll_raw_e6 precedent —
    raw estimates are exact-by-construction dyadic sums, so no libm
    enters the hash-certified path; the corrected LN-based estimates
    stay under the rtol LOCAL oracle), and the two exact driver
    cardinalities. A flipped register in ANY of the three sketches, a
    drifted merge, or a wrong exact count each flip an integer."""
    r = events_audience_overlap(spark, sf_dir)
    return r.select(
        (
            F.col("a_reg_checksum")
            + 3 * F.col("b_reg_checksum")
            + 9 * F.col("u_reg_checksum")
        )
        .cast("bigint")
        .alias("aov_reg_sum"),
        F.round(
            (
                F.col("a_est_raw")
                + F.col("b_est_raw")
                - F.col("u_est_raw")
            )
            * 1e6
        )
        .cast("bigint")
        .alias("aov_raw_e6"),
        F.col("exact_inter").alias("aov_exact_inter"),
        F.col("exact_union").alias("aov_exact_union"),
    )


def _funnel_aov_oracle() -> str:
    """The funnel oracle with the aov_* audience-overlap certificate
    CTEs spliced in (round 10) — same splice shape as the retention
    row's lat_*/blm_* pair."""
    return f"""
WITH {_aov_ctes()},
aovcert AS (
  SELECT CAST(ea.hll_reg_checksum + 3 * eb.hll_reg_checksum
              + 9 * eu.hll_reg_checksum AS BIGINT) AS aov_reg_sum,
         CAST(ROUND((ea.hll_est_raw + eb.hll_est_raw - eu.hll_est_raw)
                    * 1e6) AS BIGINT) AS aov_raw_e6,
         exact_inter AS aov_exact_inter,
         exact_union AS aov_exact_union
  FROM ex, ea, eb, eu
),
s AS (
  SELECT user_id, MIN(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.signup_ts
  WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.click_ts
  WHERE e.event_type = 'purchase' GROUP BY 1
),
f AS (
  -- aggregate the funnel FIRST (a global COUNT is always exactly one
  -- row, even on a corpus with zero signups) and only then attach the
  -- one-row certificate: grouping the joined relation BY the cert
  -- columns would return 0 rows on an empty funnel while the Spark
  -- side's global .agg() returns 1 (driver ADVICE r10)
  SELECT COUNT(*) AS n_signup,
         COUNT(c.click_ts) AS n_click_after_signup,
         COUNT(p.purchase_ts) AS n_purchase_after_click
  FROM s LEFT JOIN c ON s.user_id = c.user_id
         LEFT JOIN p ON s.user_id = p.user_id
)
SELECT n_signup, n_click_after_signup, n_purchase_after_click,
       aov_reg_sum, aov_raw_e6, aov_exact_inter, aov_exact_union
FROM f CROSS JOIN aovcert
""".strip()


# deferred: the funnel contract oracle splices the aov_* certificate
# CTEs defined in this section
ORACLE_SQL["events_funnel"] = _funnel_aov_oracle()


# -- time-series gap-fill + forward fill (round 10) ---------------------------


def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample with gap-fill and forward-fill — the
    telemetry/feature-store shape: every user gets a DENSE hour grid
    from their first to their last active hour; empty hours appear
    with n_events = 0 and carry the last observed hourly max forward
    (LOCF). ~90% of grid rows are gaps on this corpus, so the fill is
    the operator, not a no-op.

    100 TB shape: the per-user explode is F.sequence over the user's
    [first, last] hour — bounded by the TIME DOMAIN (720 buckets per
    30-day window), never by event count, so the grid is |users|·|domain|
    and each forward-fill window sorts ≤ |domain| rows per user — a
    hot user costs the same as a cold one (same argument as the
    score-bucket prefix sum: windows over domain-bounded relations are
    skew-immune by construction). The grid-to-actuals join reuses the
    (user, hour) bucket aggregation's exchange."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "value",
    )
    b = ev.groupBy("user_id", "h").agg(
        F.count(F.lit(1)).alias("n"), F.max("value").alias("hmax")
    )
    r = b.groupBy("user_id").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    grid = r.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    j = grid.join(b, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # no presentation orderBy: the grid is the largest relation any
    # LOCAL entry returns (|users|·|domain| rows) and a global range
    # sort of it buys nothing — consumers are keyed lookups/joins, the
    # oracle harness sorts canonically, and rows are already grouped
    # per user by the fill window's partitioning
    return j.select(
        "user_id",
        F.col("h").alias("hour"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.col("hmax"),
        F.last("hmax", ignorenulls=True).over(w).alias("ffill_value"),
    )


def _gapfill_oracle() -> str:
    return """
WITH b AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         COUNT(*) AS n, MAX(value) AS hmax
  FROM events GROUP BY 1, 2
),
r AS (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM b GROUP BY 1),
g AS (
  SELECT user_id, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
  FROM r
),
j AS (
  SELECT g.user_id, g.h, COALESCE(b.n, 0) AS n_events, b.hmax
  FROM g LEFT JOIN b ON b.user_id = g.user_id AND b.h = g.h
)
SELECT user_id, h AS hour, CAST(n_events AS BIGINT) AS n_events, hmax,
       LAST_VALUE(hmax IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS ffill_value
FROM j
ORDER BY user_id, hour
""".strip()


LOCAL_QUERIES["events_gapfill_hourly"] = events_gapfill_hourly
LOCAL_ORACLE_SQL["events_gapfill_hourly"] = _gapfill_oracle()


# -- session sequence mining (round 10) ---------------------------------------


def events_session_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition mining: for every ordered in-session pair
    of consecutive events, how often the transition occurs and in how
    many distinct sessions — the Markov-chain / next-action matrix
    over the same gap-based sessions as events_sessionize (identical
    flag → cumsum construction, so the two can never disagree on
    session boundaries).

    100 TB shape: ONE user_id exchange + sort feeds both window passes
    (session-id cumsum and the lag), then the transition counts are a
    partial-agg groupBy over a ≤ |event types|² key space — the output
    relation is domain-bounded (25 rows here) whatever the corpus.
    Ties on ts break by event_id in BOTH engines, so the lag sequence
    is a total order and the counts are deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_flag = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts") - F.lag("ts").over(by_user)
            > F.expr(f"INTERVAL {SESSION_GAP_MINUTES} MINUTES"),
            1,
        ).otherwise(0),
    )
    # a per-(user, session) lag would cost a second exchange on
    # (user_id, session_seq); but under the per-user total order an
    # in-session transition is EXACTLY a per-user lag row where
    # new_session = 0 (a session-opening event's lag crosses the
    # boundary and is excluded by the flag), so one window
    # partitioning serves the session cumsum AND the pairing
    pairs = with_flag.select(
        "user_id",
        (F.sum("new_session").over(by_user) + 1).alias("session_seq"),
        F.lag("event_type").over(by_user).alias("src_type"),
        F.col("event_type").alias("dst_type"),
        "new_session",
    ).filter(
        (F.col("new_session") == 0) & F.col("src_type").isNotNull()
    )
    return (
        pairs.groupBy("src_type", "dst_type")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.countDistinct("user_id", "session_seq").alias("n_sessions"),
        )
        .orderBy("src_type", "dst_type")
    )


def _session_bigrams_oracle() -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w)
                   > {SESSION_GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
  FROM flagged
),
pairs AS (
  SELECT user_id, session_seq,
         LAG(event_type) OVER (PARTITION BY user_id, session_seq
                               ORDER BY ts, event_id) AS src_type,
         event_type AS dst_type
  FROM sess
)
SELECT src_type, dst_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(COUNT(DISTINCT (user_id, session_seq)) AS BIGINT) AS n_sessions
FROM pairs WHERE src_type IS NOT NULL
GROUP BY 1, 2
ORDER BY 1, 2
""".strip()


LOCAL_QUERIES["events_session_bigrams"] = events_session_bigrams
LOCAL_ORACLE_SQL["events_session_bigrams"] = _session_bigrams_oracle()


# -- CM join-size estimation (round 10) ---------------------------------------


def cm_join_size(counters_a: DataFrame, counters_b: DataFrame) -> DataFrame:
    """Join-cardinality estimate from two Count-Min counter tables
    over the join key (Cormode & Muthukrishnan, J.Alg'05 §4.3: the
    sketch inner product): per depth row j, Σ_b cA[j,b]·cB[j,b]; the
    estimate is the MIN across rows — NEVER an underestimate (each
    product counts the true Σ_k fA(k)·fB(k) plus non-negative
    collision cross-terms). One row (est_join bigint).

    The inputs are ≤ d·w = 1024-row tables, so this costs a toy join
    whatever the corpora; the SIZES of a 100 TB equi-join are
    estimated without touching either side again — the optimizer /
    capacity-planning primitive. Integer-exact while per-key counts
    stay < ~3e9 per side (Σ 256 products of two such counts < 2⁶³);
    beyond that the counters themselves need DECIMAL — the
    binder-magnitude audit class (SCALE.md).

    A depth row with NO shared buckets has inner product 0 (it
    certifies the true join size is 0), but the bucket equi-join
    simply drops such rows — so the row products left-join a literal
    depth spine and coalesce to 0, otherwise disjoint key sets would
    return NULL (and partially-empty rows would lose the zero bound),
    breaking the one-sided contract."""
    from guagua_spark.functions.sketch import CM_DEPTH

    j = counters_a.alias("x").join(
        counters_b.alias("y"), ["j", "bucket"]
    )
    per_row = j.groupBy("j").agg(
        F.sum(F.col("x.n") * F.col("y.n")).alias("ip")
    )
    spine = counters_a.sparkSession.range(CM_DEPTH).select(
        F.col("id").cast("int").alias("j")
    )
    full = spine.join(per_row, "j", "left").select(
        F.coalesce(F.col("ip"), F.lit(0)).alias("ip")
    )
    return full.agg(F.min("ip").cast("bigint").alias("est_join"))


def events_join_size_cm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many (click, purchase) row pairs join on user_id —
    estimated from two 1024-cell CM sketches via the inner product,
    with the exact answer alongside (Σ per-user clicks × purchases —
    ONE partial-agg exchange over the filtered events). One row:
    (est_join, exact_join, ca_checksum, cb_checksum); est ≥ exact
    always, property-tested."""
    from guagua_spark.functions.sketch import cm_counters

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    # each counter table feeds TWO consumers (the inner product and
    # its checksum) and the executed plan rebuilt it per consumer —
    # four corpus scans + four md5 fans for two ≤depth×width=4096-row
    # relations (round-14 plan audit; runtime exchange reuse does not
    # cover them). Materialize BOTH in one tagged-union checkpoint —
    # domain-bounded (≤2·depth·width rows) whatever the corpus, ONE
    # extra job (the per-counter-checkpoint variant serialized two
    # materialization jobs and measured +0.3–0.4 s at sf1; the union
    # keeps the two counter scans parallel inside the one job and
    # matched or beat the rebuild form at sf0.1 AND sf1 — A/B in
    # OPTIMIZATION_r14.md). 5 corpus scans → 3.
    from guagua_spark.metrics import record_plan

    tagged_lazy = cm_counters(clicks, "user_id").withColumn(
        "side", F.lit("a")
    ).unionByName(
        cm_counters(purchases, "user_id").withColumn("side", F.lit("b"))
    )
    tagged = tagged_lazy.localCheckpoint(eager=True)
    record_plan("events_join_size_cm:counters", tagged_lazy)
    ca = tagged.filter(F.col("side") == "a").drop("side")
    cb = tagged.filter(F.col("side") == "b").drop("side")

    def _chk(c: DataFrame, name: str) -> DataFrame:
        from guagua_spark.functions.sketch import CM_WIDTH

        return c.agg(
            F.sum(
                (F.col("j") * CM_WIDTH + F.col("bucket") + 1) * F.col("n")
            )
            .cast("bigint")
            .alias(name)
        )

    per_user = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("nc"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("np"),
        )
    )
    exact = per_user.agg(
        F.sum(F.col("nc") * F.col("np")).cast("bigint").alias("exact_join")
    )
    return (
        cm_join_size(ca, cb)
        .crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(_chk(ca, "ca_checksum")))
        .crossJoin(F.broadcast(_chk(cb, "cb_checksum")))
    )


def _join_size_cm_oracle() -> str:
    from guagua_spark.functions.sketch import (
        CM_DEPTH,
        CM_WIDTH,
        cm_bucket_sql,
    )

    def counters(name: str, etype: str) -> str:
        rows = " UNION ALL ".join(
            f"SELECT {j} AS j, {cm_bucket_sql(j, 'uid')} AS bucket"
            " FROM base_" + name
            for j in range(CM_DEPTH)
        )
        return f"""base_{name} AS (
  SELECT CAST(user_id AS VARCHAR) AS uid FROM events
  WHERE event_type = '{etype}' AND user_id IS NOT NULL
),
{name} AS (
  SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM ({rows}) GROUP BY 1, 2
)"""

    return f"""
WITH {counters("ca", "click")},
{counters("cb", "purchase")},
ip AS (
  SELECT ca.j, SUM(ca.n * cb.n) AS ip
  FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
  GROUP BY 1
),
spine AS (SELECT UNNEST(generate_series(0, {CM_DEPTH - 1})) AS j),
est AS (
  SELECT CAST(MIN(COALESCE(ip.ip, 0)) AS BIGINT) AS est_join
  FROM spine LEFT JOIN ip ON ip.j = spine.j
),
pu AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nc,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
ex AS (SELECT CAST(SUM(nc * np) AS BIGINT) AS exact_join FROM pu),
cka AS (SELECT CAST(SUM((j * {CM_WIDTH} + bucket + 1) * n) AS BIGINT)
               AS ca_checksum FROM ca),
ckb AS (SELECT CAST(SUM((j * {CM_WIDTH} + bucket + 1) * n) AS BIGINT)
               AS cb_checksum FROM cb)
SELECT est_join, exact_join, ca_checksum, cb_checksum
FROM est, ex, cka, ckb
""".strip()


LOCAL_QUERIES["events_join_size_cm"] = events_join_size_cm
LOCAL_ORACLE_SQL["events_join_size_cm"] = _join_size_cm_oracle()


# -- round-12 certificates: the last three LOCAL event families move
# behind the driver's value-hash gate (sbg_* / gfl_* / jcm_*) ---------------


def _sbg_cert_cols(spark: SparkSession, sf_dir: str) -> list:
    """``sbg_*`` certificate for the events_sessionize contract host
    (certmemo): transition-matrix row count, Σ transitions,
    Σ sessions-with-transition, and the Σ-safe binder over
    (src_type, dst_type, n_transitions, n_sessions)."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.certmemo import cached_cert_cols

    def _build() -> DataFrame:
        b = events_session_bigrams(spark, sf_dir)
        return b.agg(
            F.count(F.lit(1)).cast("bigint").alias("sbg_pairs"),
            F.sum("n_transitions").cast("bigint").alias("sbg_transitions"),
            F.sum(
                binder_hash_col(
                    "sbg",
                    F.col("src_type"),
                    F.col("dst_type"),
                    F.col("n_transitions"),
                    F.col("n_sessions"),
                )
            )
            .cast("bigint")
            .alias("sbg_binder"),
        )

    return cached_cert_cols(
        spark,
        sf_dir,
        "session_bigrams",
        ("events",),
        "sbg_pairs bigint, sbg_transitions bigint, sbg_binder bigint",
        _build,
    )


def _sql_sbg_cert_cte() -> str:
    from guagua_spark.functions.scale import binder_hash_sql

    binder = binder_hash_sql(
        "sbg",
        "src_type",
        "dst_type",
        "CAST(n_transitions AS VARCHAR)",
        "CAST(n_sessions AS VARCHAR)",
    )
    return (
        "sbgc AS MATERIALIZED (\n"
        "  SELECT CAST(COUNT(*) AS BIGINT) AS sbg_pairs,\n"
        "         CAST(SUM(n_transitions) AS BIGINT) AS sbg_transitions,\n"
        f"         CAST(SUM({binder}) AS BIGINT) AS sbg_binder\n"
        f"  FROM ({_session_bigrams_oracle()}) sq)"
    )


ORACLE_SQL["events_sessionize"] = f"""
WITH {_sql_sbg_cert_cte()},
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) + 1
              AS BIGINT) AS session_seq
  FROM flagged
),
s AS (
  SELECT user_id, session_seq,
         MIN(ts) AS session_start, MAX(ts) AS session_end,
         COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
  FROM sess
  GROUP BY user_id, session_seq
)
SELECT s.user_id, s.session_seq, s.session_start, s.session_end,
       s.n_events, s.total_value,
       sbgc.sbg_pairs, sbgc.sbg_transitions, sbgc.sbg_binder
FROM s CROSS JOIN sbgc
ORDER BY s.user_id, s.session_seq
""".strip()


def _gfl_cert_cols(spark: SparkSession, sf_dir: str) -> list:
    """``gfl_*`` certificate for the events_user_running_value host
    (certmemo): dense-grid row count, Σ events on the grid, gap-row
    count, and the Σ-safe binder over (user_id, ISO day, hour,
    n_events, LOCF cents) — per-row cent rounding of identical
    doubles is bit-exact cross-engine (the gs-certificate argument),
    so a wrong fill value, a missing gap row, or a mis-bucketed hour
    each flip an integer."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.certmemo import cached_cert_cols

    def _build() -> DataFrame:
        g = events_gapfill_hourly(spark, sf_dir)
        binder = binder_hash_col(
            "gfl",
            F.col("user_id"),
            F.col("hour").cast("date").cast("string"),
            F.hour("hour"),
            F.col("n_events"),
            F.coalesce(
                F.round(F.col("ffill_value") * 100).cast("bigint"),
                F.lit(-1),
            ),
        )
        return g.agg(
            F.count(F.lit(1)).cast("bigint").alias("gfl_rows"),
            F.sum("n_events").cast("bigint").alias("gfl_events_total"),
            F.sum(F.when(F.col("n_events") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("gfl_gaps"),
            F.sum(binder).cast("bigint").alias("gfl_binder"),
        )

    return cached_cert_cols(
        spark,
        sf_dir,
        "gapfill",
        ("events",),
        "gfl_rows bigint, gfl_events_total bigint, gfl_gaps bigint,"
        " gfl_binder bigint",
        _build,
    )


def _sql_gfl_cert_cte() -> str:
    from guagua_spark.functions.scale import binder_hash_sql

    binder = binder_hash_sql(
        "gfl",
        "CAST(user_id AS VARCHAR)",
        "CAST(CAST(hour AS DATE) AS VARCHAR)",
        "CAST(EXTRACT(hour FROM hour) AS VARCHAR)",
        "CAST(n_events AS VARCHAR)",
        "CAST(COALESCE(CAST(ROUND(ffill_value * 100) AS BIGINT), -1)"
        " AS VARCHAR)",
    )
    return (
        "gflc AS MATERIALIZED (\n"
        "  SELECT CAST(COUNT(*) AS BIGINT) AS gfl_rows,\n"
        "         CAST(SUM(n_events) AS BIGINT) AS gfl_events_total,\n"
        "         CAST(SUM(CASE WHEN n_events = 0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS gfl_gaps,\n"
        f"         CAST(SUM({binder}) AS BIGINT) AS gfl_binder\n"
        f"  FROM ({_gapfill_oracle()}) gq)"
    )


ORACLE_SQL["events_user_running_value"] = f"""
WITH {_sql_gfl_cert_cte()},
running AS (
  SELECT user_id, ts, event_id,
         ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING), 6) AS running_value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT r.user_id, r.ts AS last_ts, r.running_value AS lifetime_value,
       gflc.gfl_rows, gflc.gfl_events_total, gflc.gfl_gaps,
       gflc.gfl_binder
FROM running r CROSS JOIN gflc WHERE r.rn = 1
ORDER BY r.user_id
""".strip()


def _sql_jcm_cert_cte() -> str:
    """``jcmc`` 1-row CTE wrapping the CM join-size oracle verbatim,
    columns renamed to the jcm_* certificate names."""
    return (
        "jcmc AS MATERIALIZED (\n"
        "  SELECT est_join AS jcm_est, exact_join AS jcm_exact,\n"
        "         ca_checksum AS jcm_ca, cb_checksum AS jcm_cb\n"
        f"  FROM ({_join_size_cm_oracle()}) jq)"
    )


ORACLE_SQL["events_top_users_per_type"] = f"""
WITH {_sql_jcm_cert_cte()},
per_user AS (
  SELECT event_type, user_id,
         ROUND(SUM(value), 6) AS total_value,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY total_value DESC, user_id) AS rank
  FROM per_user
),
stk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS stk_rows,
         CAST(SUM(CAST(('0x' || substr(md5('stk|'
                  || coalesce(event_type, '~') || '|'
                  || CAST(rank AS VARCHAR) || '|'
                  || CAST(user_id AS VARCHAR)), 1, 8)) AS UBIGINT))
              AS BIGINT) AS stk_hash,
         CAST(SUM(ROUND(total_value * 1e6)) AS BIGINT) AS stk_val_e6
  FROM ranked WHERE rank <= {TOP_N}
)
SELECT event_type, rank, user_id, total_value, n_events,
       stk_rows, stk_hash, stk_val_e6,
       jcmc.jcm_est, jcmc.jcm_exact, jcmc.jcm_ca, jcmc.jcm_cb
FROM ranked, stk, jcmc WHERE rank <= {TOP_N}
ORDER BY event_type, rank
""".strip()


# -- sf100 sampled twins (round 11) -----------------------------------------
#
# events_sessionize / events_asof_purchase produce PER-EVENT-scale
# results (9.5M / 2M rows at sf10 -> ~95M / ~20M at sf100): the
# sweep's driver-side row-hash compare (toPandas + canonical sort on
# BOTH engines) is memory- and time-infeasible there, and was the
# plausible proximate cause of the round-10 sf100 session deaths.
# Both computations are PER-USER (a user's sessions / asof matches
# depend only on that user's events), so a deterministic md5 USER
# subset is an exact twin: results(subset) == results(corpus)
# restricted to sampled users.

USER_SAMPLE_TARGET = 20_000


def _sampled_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from guagua_spark.functions.scale import u32_hash

    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    rate = min(1.0, USER_SAMPLE_TARGET / max(n_users, 1))
    return ev.filter(
        u32_hash("usersamp", F.col("user_id").cast("string"))
        < F.lit(rate * 4294967296.0)
    )


_USAMP_CTES = f"""urate AS (
  SELECT LEAST(1.0, {float(USER_SAMPLE_TARGET)!r}
               / GREATEST(COUNT(DISTINCT user_id), 1)) AS rate
  FROM events
),
esamp AS (
  SELECT events.* FROM events, urate
  WHERE CAST(('0x' || substr(md5('usersamp|' || CAST(user_id AS VARCHAR)),
             1, 8)) AS UBIGINT) < urate.rate * 4294967296.0
)"""


def events_sessionize_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """events_sessionize over the md5 user subset — same two-window
    one-exchange interior."""
    ev = _sampled_events(spark, sf_dir)
    by_user = Window.partitionBy("user_id").orderBy("ts")
    with_flag = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts") - F.lag("ts").over(by_user)
            > F.expr(f"INTERVAL {SESSION_GAP_MINUTES} MINUTES"),
            1,
        ).otherwise(0),
    )
    with_sid = with_flag.withColumn(
        "session_seq", F.sum("new_session").over(by_user) + 1
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def events_asof_purchase_sampled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """events_asof_purchase over the md5 user subset — same pre-dedup
    + asof_join interior."""
    ev = _sampled_events(spark, sf_dir)
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(
        clk,
        pur,
        on="user_id",
        right_cols=("pvalue",),
        prefix="last_purchase_",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "click_value",
        F.col("last_purchase_ts"),
        F.col("last_purchase_pvalue").alias("last_purchase_value"),
    ).orderBy("event_id")


_USAMP_RULE = (
    "u32(md5('usersamp|user_id')) <"
    f" min(1, {USER_SAMPLE_TARGET}/n_users)*2^32;"
    " certificate columns omitted where the full row carries them"
)

SWEEP_SAMPLED = {
    "events_sessionize": (
        events_sessionize_sampled,
        f"""
WITH {_USAMP_CTES},
flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM esamp
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) + 1
              AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
""".strip(),
        _USAMP_RULE,
    ),
    "events_asof_purchase": (
        events_asof_purchase_sampled,
        f"""
WITH {_USAMP_CTES},
pur AS (
  SELECT user_id, ts, MAX(value) AS pvalue
  FROM esamp WHERE event_type = 'purchase' GROUP BY 1, 2
),
clk AS (
  SELECT event_id, user_id, ts, value AS click_value
  FROM esamp WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts, c.click_value,
       p.ts AS last_purchase_ts, p.pvalue AS last_purchase_value
FROM clk c ASOF LEFT JOIN pur p
  ON c.user_id = p.user_id AND p.ts <= c.ts
ORDER BY c.event_id
""".strip(),
        _USAMP_RULE,
    ),
}
