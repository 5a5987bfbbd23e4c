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

from guagua_spark.sources.tables import load_table

SESSION_GAP_MINUTES = 30
TOP_N = 3


def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window event counts + value stats per event_type.

    ``F.window`` would give the same buckets; date_trunc keeps the
    output schema flat (one sortable timestamp column) and matches the
    ANSI oracle exactly.
    """
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
    gap_s = SESSION_GAP_MINUTES * 60
    with_flag = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long")).over(by_user)
            > gap_s,
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


def events_top_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by total value within each event_type.

    Aggregate FIRST (shrinks to |users|×|types| rows), then rank — the
    window runs over the aggregated relation, not the raw events.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 6).alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_N)
        .select("event_type", "rank", "user_id", "total_value", "n_events")
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
        .orderBy("user_id")
    )


# -- oracle SQL --------------------------------------------------------------

ORACLE_SQL = {
    "events_windowed_agg": """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS sum_value,
       ROUND(AVG(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""".strip(),
    "events_sessionize": f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > {SESSION_GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) + 1 AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS total_value
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
""".strip(),
    "events_top_users_per_type": f"""
WITH per_user AS (
  SELECT event_type, user_id,
         ROUND(SUM(value), 6) AS total_value,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY total_value DESC, user_id) AS rank
  FROM per_user
)
SELECT event_type, rank, user_id, total_value, n_events
FROM ranked WHERE rank <= {TOP_N}
ORDER BY event_type, rank
""".strip(),
    "events_json_props": """
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""".strip(),
    "events_user_running_value": """
WITH running AS (
  SELECT user_id, ts, event_id,
         ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING), 6) AS running_value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, ts AS last_ts, running_value AS lifetime_value
FROM running WHERE rn = 1
ORDER BY user_id
""".strip(),
}

QUERIES = {
    "events_windowed_agg": events_windowed_agg,
    "events_sessionize": events_sessionize,
    "events_top_users_per_type": events_top_users_per_type,
    "events_json_props": events_json_props,
    "events_user_running_value": events_user_running_value,
}
