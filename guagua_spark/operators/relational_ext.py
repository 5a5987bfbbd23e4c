"""Extended relational operator coverage beyond SURVEY §2.10's Q1–Q5:
the classic analytic patterns a user migrating a warehouse workload
expects, each DuckDB-oracle checked.

The reference has none of these (its only 'group by' is k-means' fixed-k
accumulation — SURVEY.md §2.3 note); on Spark they are Catalyst
built-ins, so the engineering content here is the SCALE SHAPE of each
plan, noted per operator.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from guagua_spark.functions.scale import u32_hash
from guagua_spark.sources.tables import load_table


def rx_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (returnflag, linestatus): hierarchy subtotals + grand
    total in ONE pass — Spark expands grouping sets map-side, so it is
    still a single shuffle, not three queries.

    ``gs_*``: the GROUPING SETS certificate — a 1-row rollup of the
    ACTUAL rx_grouping_sets output (explicit-sets syntax over orders):
    output row count plus label-hash-weighted integer sums of every
    group's count and cent total, where the label hash covers
    (priority, status, gid). The weighting binds WHICH group got
    WHICH count/revenue — a swap between two groups changes the sum.
    The cent totals come from a twin aggregation that rounds EACH ROW
    to integer cents before summing (joined 1:1 on the group label):
    per-row rounding of identical doubles is bit-exact cross-engine
    and integer sums are order-independent, so the certificate is
    exact at ANY scale — the previous form rounded each group's FLOAT
    revenue sum, whose accumulation noise grows with group magnitude
    and flipped the 10⁻⁴ rounding at the synthetic sf1 (found by the
    round-8 value sweep; the sf0.01 contract gate never sees it).
    This certifies the standalone LOCAL operator inside the 50-slot
    driver cap. Memoized per orders fingerprint (certmemo); cost on
    miss reports as _index:cert:grouping_sets."""
    from guagua_spark.operators.certmemo import cached_cert_cols

    li = load_table(spark, sf_dir, "lineitem")
    base = li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("cnt"),
    )

    def build() -> DataFrame:
        gs = rx_grouping_sets(spark, sf_dir)
        cents_twin = spark.sql(
            """
            SELECT o_orderpriority, o_orderstatus,
                   CAST(grouping_id() AS BIGINT) AS gid,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                     AS cents
            FROM orders
            GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                    (o_orderpriority), ())
            """
        )

        def label_of(df: DataFrame) -> F.Column:
            return F.concat_ws(
                "|",
                F.coalesce(df["o_orderpriority"], F.lit("~")),
                F.coalesce(df["o_orderstatus"], F.lit("~")),
                df["gid"].cast("string"),
            )

        # label join (not the raw keys: rollup label rows hold NULLs,
        # which an equi-join would drop); 1:1 by construction, so the
        # join also asserts group-set correspondence
        joined = gs.withColumn("__label", label_of(gs)).join(
            cents_twin.select(
                label_of(cents_twin).alias("__label"), "cents"
            ),
            "__label",
        )
        # small weight (u32 % 997 + 1) so weight·cents summed over all
        # groups stays far inside bigint range
        w = F.pmod(u32_hash("gs", F.col("__label")), F.lit(997)) + 1
        return joined.agg(
            F.count(F.lit(1)).alias("gs_rows"),
            F.sum(w * F.col("n_orders")).alias("gs_n_wsum"),
            F.sum(w * F.col("cents")).alias("gs_rev_wsum"),
        )

    cert_cols = cached_cert_cols(
        spark,
        sf_dir,
        "grouping_sets",
        ("orders",),
        "gs_rows bigint, gs_n_wsum bigint, gs_rev_wsum bigint",
        build,
    )
    # smb_* (round 12): the bucketed co-located join certificate —
    # value binder PLUS the plan shape (zero join-key exchanges, two
    # bucketed scans) as driver-hash-checked integers
    smb_cols = _smb_cert_cols(spark, sf_dir)
    return base.select("*", *cert_cols, *smb_cols).orderBy(
        F.col("l_returnflag").asc_nulls_first(),
        F.col("l_linestatus").asc_nulls_first(),
    )


def rx_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers WITH at least one high-value order (left-semi):
    the probe side never duplicates — at scale a semi join ships only
    the join keys of the filtered orders, and the o_totalprice filter is
    pushed to the parquet scan before the shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 150000
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def rx_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO order above 300k (left-anti) — the NOT EXISTS
    pattern; same key-only shuffle shape as the semi join, with the
    order-side filter pushed below the shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def rx_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) alongside plain aggs — Spark plans expand +
    two-phase aggregation; at scale prefer approx_count_distinct (HLL)
    when exactness isn't required (provided as rx_approx_distinct).

    ``aud_*`` (round 12): the data-quality audit certificate — total
    rows audited, total violations, and a binder over EVERY audit cell
    (counts + the date range as ISO days), binding the whole Deequ-
    style constraint row into this 1-row driver-hash-checked host."""
    aud_cols = _aud_cert_cols(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("total_price"),
    ).select("*", *aud_cols)


def rx_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (CASE WHEN inside SUM) per
    order priority — one scan, no join, no pivot shuffle.

    ``n_F/n_O/n_P`` + ``rev_F/rev_O/rev_P``: the per-status vector from
    the ACTUAL rx_pivot_status output (Spark's pinned-values
    ``.pivot()`` operator), joined in per priority. ``unp_n_sum`` /
    ``unp_wsum``: a per-priority rollup of the ACTUAL rx_unpivot_status
    output (the ``.unpivot()`` melt) — total count across statuses plus
    a status-hash-weighted count sum that binds WHICH status label
    carried WHICH count through the melt. Both operators run for real
    on certificate build; the priority×status domain is a bounded enum
    (≤ 5×3 cells), so the certificate is a bounded-domain literal
    (certmemo.cached_cert_df, memoized per orders fingerprint, miss
    cost visible as _index:cert:pivot_unpivot) joined on priority —
    never a data-proportional relation. Certifies both standalone
    LOCAL operators inside the 50-slot driver cap."""
    from guagua_spark.operators.certmemo import cached_cert_df

    orders = load_table(spark, sf_dir, "orders")
    high = F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)
    base = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(high).alias("n_high_value"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )

    def build() -> DataFrame:
        piv = rx_pivot_status(spark, sf_dir)
        unp = (
            rx_unpivot_status(spark, sf_dir)
            .groupBy("o_orderpriority")
            .agg(
                F.sum("n").alias("unp_n_sum"),
                F.sum(u32_hash("unp", F.col("status")) * F.col("n")).alias(
                    "unp_wsum"
                ),
            )
        )
        return piv.join(unp, "o_orderpriority")

    cert = cached_cert_df(
        spark,
        sf_dir,
        "pivot_unpivot",
        ("orders",),
        "o_orderpriority string, "
        + ", ".join(f"n_{s} bigint" for s in PIVOT_STATUSES)
        + ", "
        + ", ".join(f"rev_{s} double" for s in PIVOT_STATUSES)
        + ", unp_n_sum bigint, unp_wsum bigint",
        build,
        max_rows=64,
    )
    return base.join(F.broadcast(cert), "o_orderpriority").orderBy(
        "o_orderpriority"
    )


RANGE_BOUNDS = [0.0, 50_000.0, 100_000.0, 200_000.0, float("inf")]


def rx_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-customer count + approximate totalprice quantiles,
    emitted as a sketch-accuracy CERTIFICATE.

    The 100 TB answer to rx_distinct_agg: approx_count_distinct keeps a
    fixed-size HLL sketch per partition (merged map-side — no expand,
    no second shuffle), approx_percentile a bounded-error GK-style
    sketch. Sketch *values* are engine-specific, so they can never
    hash-match a DuckDB oracle; what CAN be hash-checked is (a) the
    exact answers, computed in the same aggregate, and (b) booleans
    asserting each sketch landed within its documented error bound
    (3·rsd for HLL, 5% relative for the quantile sketch — generous vs
    the rank-error guarantee n/accuracy). Both are deterministic
    functions of the data, so the driver row is green iff the sketches
    actually deliver their bounds. The output row carries the exact
    answers (n_customers_exact, p50/p90/p99_exact) plus the hll_ok /
    q_ok certificate booleans; the raw sketch estimates themselves are
    folded into the booleans rather than emitted, since their values
    are engine-specific.
    """
    orders = load_table(spark, sf_dir, "orders")
    pa = F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10_000)
    pe = F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))")
    # countDistinct must NOT share an aggregate with the sketches:
    # Spark's distinct rewrite first groups by o_custkey and drags every
    # other aggregate's partial state (≈400 HLL register longs + the GK
    # summary) through that per-key aggregate — measured 10× slower.
    # Two single-row aggregates + a crossJoin keep each path cheap.
    exact_n = orders.agg(
        F.countDistinct("o_custkey").alias("n_customers_exact")
    )
    sketches = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("hll"),
        pa.alias("pa"),
        pe.alias("pe"),
    )
    agg = exact_n.crossJoin(sketches)

    def q_ok(i: int) -> Column:
        a, e = F.col("pa").getItem(i), F.col("pe").getItem(i)
        return F.abs(a - e) / e <= 0.05

    return agg.select(
        "n_customers_exact",
        (
            F.abs(F.col("hll") - F.col("n_customers_exact"))
            / F.col("n_customers_exact")
            <= 0.06
        ).alias("hll_ok"),
        F.col("pe").getItem(0).alias("p50"),
        F.col("pe").getItem(1).alias("p90"),
        F.col("pe").getItem(2).alias("p99"),
        q_ok(0).alias("p50_ok"),
        q_ok(1).alias("p90_ok"),
        q_ok(2).alias("p99_ok"),
    )


def rx_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders binned against a small range table — the range-join
    pattern: a non-equi join against a BROADCAST side stays a cheap
    nested loop over 4 rows, never a shuffle. (Bounds are literals so
    bucket edges are bit-identical cross-engine; a data-derived range
    table would join the same way.)"""
    orders = load_table(spark, sf_dir, "orders")
    rows = [
        (i, RANGE_BOUNDS[i], RANGE_BOUNDS[i + 1])
        for i in range(len(RANGE_BOUNDS) - 1)
    ]
    bounds = spark.createDataFrame(rows, "bucket int, lo double, hi double")
    joined = orders.join(
        F.broadcast(bounds),
        (F.col("o_totalprice") > F.col("lo"))
        & (F.col("o_totalprice") <= F.col("hi")),
    )
    # ivj_* (round 12): the interval-overlap BIN-join certificate — the
    # thematic sibling (range join small-side broadcast vs interval
    # join big-big bin escape) rides the same contract row
    ivj_cols = _ivj_cert_cols(spark, sf_dir)
    return (
        joined.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
        .select("*", *ivj_cols)
        .orderBy("bucket")
    )


def rx_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand part stats with a size filter pushed to the scan.

    ``asr_*`` (round 12): the association-rules certificate — rule
    count, Σ pair support, and the Σ-safe binder over (part_a, part_b,
    sup_ab, sup_a, sup_b); conf/lift are pure IEEE functions of those
    integers, so binding the integers binds the whole rule set."""
    asr_cols = _asr_cert_cols(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 10)
    return (
        part.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
        .select("*", *asr_cols)
        .orderBy("p_brand")
    )


def rx_supplier_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account balance by nation — broadcast the fixed-size
    nation dim (same shape as Q4's model-side join)."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        sup.join(
            F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 4).alias("total_balance"),
        )
        .orderBy("n_name")
    )


def rx_cube_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (returnflag, linestatus) with an explicit grouping id —
    all 2² grouping sets in ONE shuffle (Catalyst expands the sets
    map-side with an Expand node, it does not run 4 scans); the
    grouping id disambiguates a NULL group value from a subtotal row,
    which is what makes cube output machine-consumable."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "cnt")
        .orderBy(
            F.col("gid"),
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


PERCENTILE_PROBES = (("p25", 0.25), ("p50", 0.5), ("p90", 0.9))

#: coarse-bucket width for the cumulative-rank decomposition below —
#: prices are domain-bounded (TPC-H extendedprice ∈ ~[900, 105000]), so
#: ~100 buckets per flag whatever the corpus size; the width only
#: affects parallelism, never values (ranks are integer sums).
PCT_BUCKET_WIDTH = 1000.0


def rx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (p25/p50/p90) of extended price per return
    flag, computed WITHOUT per-group value buffering AND without any
    whole-group sort.

    Spark's ``percentile`` aggregate collects every value of a group
    into an in-memory map — with 3 return-flag groups each holding ~⅓
    of the table, that's a guaranteed OOM at 100 TB. This form instead:

    1. pre-aggregates to (flag, price) → count — map-side partial
       combine collapses duplicate prices before any wide exchange;
    2. decomposes the cumulative rank the ``bucketed_running_sum`` way
       (functions/scale.py — round-12 verdict #2): per-(flag, coarse
       price bucket) count totals (the bucket relation is domain-
       bounded: ~100 buckets/flag at ANY corpus size), a per-flag
       running OFFSET over that tiny relation, a broadcast join-back,
       and a within-bucket running sum whose window partitions by
       (flag, bucket) — so no task ever sorts a whole flag's distinct
       prices. The old form's ``Window.partitionBy(flag)`` funneled
       each flag's full distinct-price table through ONE sort task (3
       effective partitions at every scale); here each sort unit is
       one bucket of one flag. Ranks are INTEGER sums — decomposition
       reorders integer addition only, so [lo, hi) and n are
       bit-identical to the single-window form (delta-swept);
    3. picks the two bracketing values per probe with conditional
       max() and interpolates with the same weighted form both Spark's
       Percentile and DuckDB's quantile_cont use —
       ``(crn−rn)·v_lo + (rn−frn)·v_hi`` at rn=(n−1)·p — so results
       stay bit-identical cross-engine.

    Worst case degrades to a disk-backed PARALLEL sort of each
    bucket's distinct values, never an in-memory group buffer and
    never a serial per-flag sort. At extreme scale percentile_approx
    (t-digest, mergeable map-side) remains the cheaper path;
    rx_approx_distinct shows that certified-sketch pattern.
    """
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    # monotone-in-price coarse bucket; NULL prices (none in TPC-H, but
    # the rule must not silently drop them) get the smallest bucket so
    # the (bucket, price NULLS FIRST) order equals the old global
    # NULLS-FIRST order
    bkt = F.coalesce(
        F.floor(F.col("l_extendedprice") / F.lit(PCT_BUCKET_WIDTH)).cast(
            "long"
        ),
        F.lit(-(2**62)),
    )
    bcounts = counts.withColumn("bkt", bkt)
    btot = bcounts.groupBy("l_returnflag", "bkt").agg(
        F.sum("c").alias("bc")
    )
    w_off = (
        Window.partitionBy("l_returnflag")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("l_returnflag")
    offs = btot.select(
        "l_returnflag",
        "bkt",
        F.coalesce(F.sum("bc").over(w_off), F.lit(0)).alias("off"),
        F.sum("bc").over(w_tot).alias("n"),
    )
    w_in = (
        Window.partitionBy("l_returnflag", "bkt")
        .orderBy(F.col("l_extendedprice").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = (
        bcounts.join(F.broadcast(offs), ["l_returnflag", "bkt"])
        .withColumn("hi", F.col("off") + F.sum("c").over(w_in))
        .withColumn("lo", F.col("hi") - F.col("c"))  # 0-based first rank
    )
    # per probe: bracketing ranks frn=floor((n-1)p), crn=ceil((n-1)p);
    # a value covers 0-based ranks [lo, hi-1]
    aggs, finals = [], [F.col("l_returnflag")]
    for name, p in PERCENTILE_PROBES:
        rn = (F.col("n") - 1) * F.lit(p)
        frn, crn = F.floor(rn), F.ceil(rn)
        aggs.append(
            F.max(
                F.when(
                    (frn >= F.col("lo")) & (frn < F.col("hi")),
                    F.col("l_extendedprice"),
                )
            ).alias(f"_vl_{name}")
        )
        aggs.append(
            F.max(
                F.when(
                    (crn >= F.col("lo")) & (crn < F.col("hi")),
                    F.col("l_extendedprice"),
                )
            ).alias(f"_vu_{name}")
        )
    aggs.append(F.max("n").alias("_n"))
    for name, p in PERCENTILE_PROBES:
        rn = (F.col("_n") - 1) * F.lit(p)
        frn, crn = F.floor(rn), F.ceil(rn)
        vl, vu = F.col(f"_vl_{name}"), F.col(f"_vu_{name}")
        finals.append(
            F.when(crn == frn, vl)
            .otherwise((crn - rn) * vl + (rn - frn) * vu)
            .alias(name)
        )
    return (
        ranked.groupBy("l_returnflag")
        .agg(*aggs)
        .select(*finals)
        .orderBy("l_returnflag")
    )


QUERIES = {
    "rx_parts_by_brand": rx_parts_by_brand,
    "rx_cube_quantity": rx_cube_quantity,
    "rx_percentiles": rx_percentiles,
    "rx_supplier_nation_balance": rx_supplier_nation_balance,
    "rx_rollup_revenue": rx_rollup_revenue,
    "rx_semi_join_customers": rx_semi_join_customers,
    "rx_anti_join_customers": rx_anti_join_customers,
    "rx_distinct_agg": rx_distinct_agg,
    "rx_conditional_agg": rx_conditional_agg,
    "rx_approx_distinct": rx_approx_distinct,
    "rx_range_join_events": rx_range_join_events,
}

ORACLE_SQL = {
    "rx_percentiles": """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""".strip(),
    "rx_cube_quantity": """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS cnt
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""".strip(),
    # assigned at the bottom — splices the asr_* association-rules
    # certificate CTE (its oracle lives in the market-basket section)
    "rx_parts_by_brand": None,
    "rx_supplier_nation_balance": """
SELECT n_name, COUNT(*) AS n_suppliers,
       ROUND(SUM(s_acctbal), 4) AS total_balance
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""".strip(),
    # assigned at the bottom of the module — splices the grouping-sets
    # certificate CTE, whose SQL is defined down there
    "rx_rollup_revenue": None,
    "rx_semi_join_customers": """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
ORDER BY c_custkey
""".strip(),
    "rx_anti_join_customers": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
ORDER BY c_custkey
""".strip(),
    # assigned at the bottom — splices the aud_* quality-audit
    # certificate CTE (its oracle lives in the audit section)
    "rx_distinct_agg": None,
    # assigned at the bottom of the module — splices the pivot/unpivot
    # certificate CTEs, whose SQL is defined down there
    "rx_conditional_agg": None,
    # assigned at the bottom — splices the ivj_* interval-join
    # certificate CTE (its oracle lives in the bin-join section)
    "rx_range_join_events": None,
    # certificate form (see rx_approx_distinct docstring): the oracle
    # carries the exact answers plus TRUE for every within-bound flag —
    # the row hash-matches iff Spark's sketches deliver their bounds
    "rx_approx_distinct": """
SELECT COUNT(DISTINCT o_custkey) AS n_customers_exact,
       TRUE AS hll_ok,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM orders
""".strip(),
}


def rx_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style latest-record compaction: the newest event per user
    (ts desc, event_id desc tiebreak) — the "upsert dedup" every
    change-capture ingest runs before merging a batch.

    Skew-immune form: ``max_by(payload struct, (ts, event_id))``
    partial-aggregates map-side, so a hot key combines on every input
    partition before ONE hash exchange of per-key 1-row partials — no
    per-key sort, no window. (The row_number-over-window formulation
    the oracle uses funnels each key through a sort; fine for an
    oracle, wrong at 100 TB with a power-law key.)"""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    payload = F.struct("ts", "event_id", "event_type", "value")
    order = F.struct("ts", "event_id")
    return (
        ev.groupBy("user_id")
        .agg(F.max_by(payload, order).alias("s"))
        .select(
            "user_id",
            F.col("s.ts").alias("ts"),
            F.col("s.event_id").alias("event_id"),
            F.col("s.event_type").alias("event_type"),
            F.col("s.value").alias("value"),
        )
        .orderBy("user_id")
    )


_LATEST_ORACLE = """
WITH ranked AS (
  SELECT user_id, ts, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, ts, event_id, event_type, value
FROM ranked WHERE rn = 1 ORDER BY user_id
""".strip()

#: oracle-tested locally (tests/test_relational_ext.py), not in the
#: 50-slot driver contract
LOCAL_QUERIES = {"rx_latest_per_key": rx_latest_per_key}
LOCAL_ORACLE_SQL = {"rx_latest_per_key": _LATEST_ORACLE}


#: pivot column values PINNED (TPC-H order statuses). At scale you pin
#: the pivot domain: `pivot(col)` without values runs an extra
#: distinct-collect pass over the corpus to infer them, and an
#: unbounded inferred domain can explode the schema.
PIVOT_STATUSES = ("F", "O", "P")


def rx_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts and revenue per priority × status, statuses
    widened into columns — `groupBy().pivot(values=...)` plans as ONE
    partial-aggregated exchange with CASE-expanded aggregates (exactly
    the oracle's conditional-aggregation form), never a per-value scan.
    """
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(PIVOT_STATUSES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 4).alias("rev"),
        )
    )
    cols = [
        F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"n_{s}")
        for s in PIVOT_STATUSES
    ] + [
        F.coalesce(F.col(f"{s}_rev"), F.lit(0.0)).alias(f"rev_{s}")
        for s in PIVOT_STATUSES
    ]
    return out.select("o_orderpriority", *cols).orderBy("o_orderpriority")


def rx_unpivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the pivoted counts folded back to long form —
    one row per (priority, status) including empty cells. unpivot is a
    pure map-side Expand (no shuffle beyond the upstream pivot's); the
    oracle replays it as priorities × statuses with COALESCE(n, 0)."""
    from pyspark.sql import functions as F

    wide = rx_pivot_status(spark, sf_dir).select(
        "o_orderpriority", *[f"n_{s}" for s in PIVOT_STATUSES]
    )
    return (
        wide.unpivot(
            ["o_orderpriority"],
            [f"n_{s}" for s in PIVOT_STATUSES],
            "status",
            "n",
        )
        .select(
            "o_orderpriority",
            F.expr("substring(status, 3)").alias("status"),
            "n",
        )
        .orderBy("o_orderpriority", "status")
    )


_PIVOT_CORE = (
    "SELECT o_orderpriority, "
    + ", ".join(
        f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{s}"
        for s in PIVOT_STATUSES
    )
    + ", "
    + ", ".join(
        f"COALESCE(ROUND(SUM(CASE WHEN o_orderstatus = '{s}' "
        f"THEN o_totalprice END), 4), 0.0) AS rev_{s}"
        for s in PIVOT_STATUSES
    )
    + " FROM orders GROUP BY 1"
)

_PIVOT_ORACLE = _PIVOT_CORE + " ORDER BY 1"

#: CTE block (statuses/counts/prio/unp_long) replaying the unpivot melt
#: in long form — shared by the standalone oracle and the
#: rx_conditional_agg certificate splice
_UNPIVOT_CTES = """statuses AS (
  SELECT unnest(['F', 'O', 'P']) AS status
),
counts AS (
  SELECT o_orderpriority, o_orderstatus AS status, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
prio AS (SELECT DISTINCT o_orderpriority FROM orders),
unp_long AS (
  SELECT p.o_orderpriority, s.status,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS n
  FROM prio p
  CROSS JOIN statuses s
  LEFT JOIN counts c
    ON c.o_orderpriority = p.o_orderpriority AND c.status = s.status
)"""

_UNPIVOT_ORACLE = f"""
WITH {_UNPIVOT_CTES}
SELECT o_orderpriority, status, n
FROM unp_long
ORDER BY o_orderpriority, status
""".strip()

LOCAL_QUERIES["rx_pivot_status"] = rx_pivot_status
LOCAL_QUERIES["rx_unpivot_status"] = rx_unpivot_status
LOCAL_ORACLE_SQL["rx_pivot_status"] = _PIVOT_ORACLE
LOCAL_ORACLE_SQL["rx_unpivot_status"] = _UNPIVOT_ORACLE


def rx_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((priority, status), (priority), ()) —
    the general form that cube/rollup specialize (rx_cube_quantity /
    rx_rollup_revenue cover those). Plans exactly like them: ONE scan +
    Expand (one input row fans to one row per set) + one partial-
    aggregated exchange — never a scan per set. grouping_id
    disambiguates the NULL-as-label rows from genuine NULLs."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping_id() AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
        ORDER BY gid, o_orderpriority, o_orderstatus
        """
    )


_GROUPING_SETS_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 4) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), ())
ORDER BY gid, o_orderpriority, o_orderstatus
""".strip()

LOCAL_QUERIES["rx_grouping_sets"] = rx_grouping_sets
LOCAL_ORACLE_SQL["rx_grouping_sets"] = _GROUPING_SETS_ORACLE


# -- contract-row oracles spliced from the LOCAL operators' SQL ------------
#
# rx_conditional_agg carries the pivot/unpivot certificate columns and
# rx_rollup_revenue the grouping-sets certificate (see their docstrings)
# — each oracle replays the host aggregate plus the certified operator's
# own oracle SQL, so a driver hash-match proves the LOCAL operator's
# math, not just the host's.

_U32_SQL = "CAST(('0x' || substr(md5('{tag}|' || {expr}), 1, 8)) AS UBIGINT)"

ORACLE_SQL["rx_conditional_agg"] = f"""
WITH {_UNPIVOT_CTES},
piv AS ({_PIVOT_CORE}),
unp AS (
  SELECT o_orderpriority,
         CAST(SUM(n) AS BIGINT) AS unp_n_sum,
         CAST(SUM({_U32_SQL.format(tag="unp", expr="status")} * n)
              AS BIGINT) AS unp_wsum
  FROM unp_long GROUP BY 1
),
base AS (
  SELECT o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_high_value,
         ROUND(AVG(o_totalprice), 4) AS avg_price
  FROM orders GROUP BY 1
)
SELECT base.o_orderpriority, base.n_orders, base.n_high_value,
       base.avg_price,
       {", ".join(f"piv.n_{s}" for s in PIVOT_STATUSES)},
       {", ".join(f"piv.rev_{s}" for s in PIVOT_STATUSES)},
       unp.unp_n_sum, unp.unp_wsum
FROM base
JOIN piv USING (o_orderpriority)
JOIN unp USING (o_orderpriority)
ORDER BY o_orderpriority
""".strip()

_GS_LABEL = (
    "coalesce(o_orderpriority, '~') || '|' || "
    "coalesce(o_orderstatus, '~') || '|' || CAST(gid AS VARCHAR)"
)

# body only — assigned into ORACLE_SQL at the bottom of the module,
# where the smb_* bucketed-join certificate CTE it now splices exists
_ROLLUP_ORACLE_BODY = f"""
gs AS (
  SELECT o_orderpriority, o_orderstatus,
         CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
         COUNT(*) AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                          (o_orderpriority), ())
),
cert AS (
  SELECT COUNT(*) AS gs_rows,
         CAST(SUM(({_U32_SQL.format(tag="gs", expr=_GS_LABEL)} % 997 + 1)
                  * n_orders) AS BIGINT) AS gs_n_wsum,
         CAST(SUM(({_U32_SQL.format(tag="gs", expr=_GS_LABEL)} % 997 + 1)
                  * cents) AS BIGINT) AS gs_rev_wsum
  FROM gs
),
roll AS (
  SELECT l_returnflag, l_linestatus,
         ROUND(SUM(l_extendedprice), 4) AS revenue, COUNT(*) AS cnt
  FROM lineitem
  GROUP BY ROLLUP (l_returnflag, l_linestatus)
)
SELECT roll.l_returnflag, roll.l_linestatus, roll.revenue, roll.cnt,
       cert.gs_rows, cert.gs_n_wsum, cert.gs_rev_wsum,
       smbc.smb_n_prios, smbc.smb_lines_total, smbc.smb_binder,
       smbc.smb_key_exchanges, smbc.smb_bucketed_scans
FROM roll CROSS JOIN cert CROSS JOIN smbc
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""".strip()


# -- market-basket association rules (round 10) ------------------------------

#: rules returned by the query entry, by pair support
RULES_TOPK = 20


def rx_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-RULES_TOPK association rules over order baskets — for the
    strongest co-purchased part pairs {a, b}: support counts, both
    directed confidences conf(a→b) = sup(ab)/sup(a), and lift =
    N·sup(ab)/(sup(a)·sup(b)) — the Apriori/FP-growth headline stats
    restricted to 2-itemsets, which at 100 TB is the part that's a
    JOIN problem rather than a lattice-search problem.

    Shape at scale (rewritten round 14, guide §§2.3–2.4 — the r13
    plan ran FIVE lineitem scans and five (o,p) distincts, one per
    reference of the li CTE): ONE scan feeds a single
    groupBy(l_orderkey).collect_set basket relation (map-side partial
    dedup, one corpus exchange) whose exchange is runtime-reused by
    all three consumers — pair supports (a JVM higher-order pair
    explode over the sorted basket, fan-out C(basket, 2) — bounded by
    basket size, exactly the old self-join's output), item supports
    (explode + partial-agg groupBy), and the order count (count of
    baskets, no further exchange). The top-m pair prune is
    TakeOrderedAndProject (per-partition heaps); the two item-support
    lookups then join the part-sized support relation against a
    BROADCAST 20-row side, so no corpus-scale work follows the prune.
    Divisions are IEEE-exact on integer counts — both engines derive
    bit-identical doubles.

    Equivalence to the join form (the oracle still replays that):
    sort_array(collect_set) per order ≡ the (o,p) distinct restricted
    to one order; pairs (x, y) with x < y from the sorted array are
    exactly the self-join's survivors; count-of-groups ≡ distinct
    order count (a group exists iff the order has ≥1 row); NULL
    partkeys can't reach the output either way (collect_set drops
    them here; a NULL never satisfies part_a < part_b or an equi-join
    there)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    parts = F.col("parts")
    pair_structs = F.flatten(
        F.transform(
            parts,
            lambda x, i: F.transform(
                F.slice(parts, i + F.lit(2), F.size(parts)),
                lambda y: F.struct(
                    x.alias("part_a"), y.alias("part_b")
                ),
            ),
        )
    )
    pair_sup = (
        baskets.select(F.explode(pair_structs).alias("pr"))
        .select("pr.part_a", "pr.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("sup_ab"))
    )
    top = pair_sup.orderBy(
        F.col("sup_ab").desc(), "part_a", "part_b"
    ).limit(RULES_TOPK)
    item_sup = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("sup_item"))
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    rules_a = item_sup.join(
        F.broadcast(top),
        item_sup["l_partkey"] == top["part_a"],
    ).select(
        "part_a", "part_b", "sup_ab", F.col("sup_item").alias("sup_a")
    )
    out = (
        # the ≤20-row rule side is the broadcast side of BOTH
        # item-support lookups — post-limit stats don't always
        # propagate, so the second hint is explicit too
        item_sup.withColumnRenamed("l_partkey", "part_b")
        .withColumnRenamed("sup_item", "sup_b")
        .join(F.broadcast(rules_a), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "sup_ab",
            "sup_a",
            "sup_b",
            (F.col("sup_ab") / F.col("sup_a")).alias("conf_ab"),
            (F.col("sup_ab") / F.col("sup_b")).alias("conf_ba"),
            (
                # DOUBLE before the product: bigint·bigint can overflow
                # int64 at extreme counts where the oracle's
                # CAST(n_orders AS DOUBLE) degrades gracefully
                F.col("n_orders").cast("double")
                * F.col("sup_ab")
                / (F.col("sup_a") * F.col("sup_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("sup_ab").desc(), "part_a", "part_b")
    )
    return out


def _association_rules_oracle() -> str:
    return f"""
WITH li AS MATERIALIZED (
  -- referenced four times (pair join ×2, item_sup, n): materialize,
  -- or DuckDB inlines a full corpus distinct per reference (the
  -- triangles-oracle sf10 spill lesson, round 12)
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pair_sup AS (
  SELECT l1.l_partkey AS part_a, l2.l_partkey AS part_b,
         COUNT(*) AS sup_ab
  FROM li l1
  JOIN li l2 ON l1.l_orderkey = l2.l_orderkey
            AND l1.l_partkey < l2.l_partkey
  GROUP BY 1, 2
),
top AS (
  SELECT * FROM pair_sup ORDER BY sup_ab DESC, part_a, part_b
  LIMIT {RULES_TOPK}
),
item_sup AS (SELECT l_partkey, COUNT(*) AS sup_item FROM li GROUP BY 1),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li)
SELECT part_a, part_b, sup_ab,
       sa.sup_item AS sup_a, sb.sup_item AS sup_b,
       CAST(sup_ab AS DOUBLE) / sa.sup_item AS conf_ab,
       CAST(sup_ab AS DOUBLE) / sb.sup_item AS conf_ba,
       CAST(n.n_orders AS DOUBLE) * sup_ab / (sa.sup_item * sb.sup_item)
         AS lift
FROM top
JOIN item_sup sa ON sa.l_partkey = top.part_a
JOIN item_sup sb ON sb.l_partkey = top.part_b
CROSS JOIN n
ORDER BY sup_ab DESC, part_a, part_b
""".strip()


LOCAL_QUERIES["rx_association_rules"] = rx_association_rules
LOCAL_ORACLE_SQL["rx_association_rules"] = _association_rules_oracle()


def _asr_cert_cols(spark: SparkSession, sf_dir: str) -> list:
    """``asr_*`` certificate for the rx_parts_by_brand contract host
    (certmemo): rule count, Σ pair support, and the Σ-safe binder over
    (part_a, part_b, sup_ab, sup_a, sup_b)."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.certmemo import cached_cert_cols

    def _build() -> DataFrame:
        r = rx_association_rules(spark, sf_dir)
        return r.agg(
            F.count(F.lit(1)).cast("bigint").alias("asr_rules"),
            F.sum("sup_ab").cast("bigint").alias("asr_sup_total"),
            F.sum(
                binder_hash_col(
                    "asr",
                    F.col("part_a"),
                    F.col("part_b"),
                    F.col("sup_ab"),
                    F.col("sup_a"),
                    F.col("sup_b"),
                )
            )
            .cast("bigint")
            .alias("asr_binder"),
        )

    return cached_cert_cols(
        spark,
        sf_dir,
        "asr",
        ("lineitem",),
        "asr_rules bigint, asr_sup_total bigint, asr_binder bigint",
        _build,
    )


def _sql_asr_cert_cte() -> str:
    """``asrc`` 1-row CTE wrapping the rule-mining oracle verbatim."""
    from guagua_spark.functions.scale import binder_hash_sql

    binder = binder_hash_sql(
        "asr",
        "CAST(part_a AS VARCHAR)",
        "CAST(part_b AS VARCHAR)",
        "CAST(sup_ab AS VARCHAR)",
        "CAST(sup_a AS VARCHAR)",
        "CAST(sup_b AS VARCHAR)",
    )
    return (
        "asrc AS MATERIALIZED (\n"
        "  SELECT CAST(COUNT(*) AS BIGINT) AS asr_rules,\n"
        "         CAST(SUM(sup_ab) AS BIGINT) AS asr_sup_total,\n"
        f"         CAST(SUM({binder}) AS BIGINT) AS asr_binder\n"
        f"  FROM ({_association_rules_oracle()}) aq)"
    )


ORACLE_SQL["rx_parts_by_brand"] = f"""
WITH {_sql_asr_cert_cte()},
pb AS (
  SELECT p_brand, COUNT(*) AS n_parts,
         ROUND(AVG(p_retailprice), 4) AS avg_price,
         MAX(p_size) AS max_size
  FROM part WHERE p_size >= 10
  GROUP BY p_brand
)
SELECT pb.p_brand, pb.n_parts, pb.avg_price, pb.max_size,
       asrc.asr_rules, asrc.asr_sup_total, asrc.asr_binder
FROM pb CROSS JOIN asrc ORDER BY p_brand
""".strip()


# -- data-quality / constraint audit (round 10) ------------------------------


def quality_audit_df(
    orders: DataFrame, customer: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Deequ-style constraint audit compiled into ONE row: per-table
    row counts, primary-key duplicate counts, null-FK counts, orphan
    counts (child keys with no parent), a domain check (non-positive
    totalprice), and the observed date range. Every violation count is
    a decomposable aggregate or a key-only anti join, so the whole
    audit is a handful of partial-agg scans + two LEFT ANTI joins that
    shuffle 8-byte keys — auditing 100 TB costs key traffic, never
    payload traffic, and a green audit certifies load integrity before
    any downstream pipeline runs (violations are counted, not assumed:
    the planted-violation tests prove each check fires)."""
    o_stats = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("orders_rows"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("orders_dup_keys"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("orders_null_cust"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("orders_bad_price"),
        F.min("o_orderdate").alias("orders_date_lo"),
        F.max("o_orderdate").alias("orders_date_hi"),
    )
    o_orphans = (
        orders.select("o_custkey")
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("orders_orphans"))
    )
    l_stats = lineitem.agg(
        F.count(F.lit(1)).cast("bigint").alias("lineitem_rows")
    )
    l_orphans = (
        lineitem.select(F.col("l_orderkey").alias("k"))
        .join(
            orders.select(F.col("o_orderkey").alias("k")),
            "k",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("lineitem_orphans"))
    )
    return (
        o_stats.crossJoin(F.broadcast(o_orphans))
        .crossJoin(F.broadcast(l_stats))
        .crossJoin(F.broadcast(l_orphans))
    )


def rx_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query entry: the constraint audit over orders / customer /
    lineitem."""
    return quality_audit_df(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "lineitem"),
    )


_QUALITY_AUDIT_ORACLE = """
WITH o AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orders_rows,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
           AS orders_dup_keys,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS orders_null_cust,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS orders_bad_price,
         MIN(o_orderdate) AS orders_date_lo,
         MAX(o_orderdate) AS orders_date_hi
  FROM orders
),
oo AS (
  -- LEFT ANTI semantics: a NULL FK matches no parent and IS an
  -- orphan. NOT EXISTS rather than NOT IN: if the PARENT key column
  -- ever contains a NULL, NOT IN evaluates to NULL for every probe
  -- and silently undercounts orphans — fragile for a dirty-data
  -- audit (driver ADVICE r10)
  SELECT CAST(COUNT(*) AS BIGINT) AS orders_orphans
  FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
  )
),
l AS (SELECT CAST(COUNT(*) AS BIGINT) AS lineitem_rows FROM lineitem),
lo AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS lineitem_orphans
  FROM lineitem li
  WHERE NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey
  )
)
SELECT * FROM o, oo, l, lo
""".strip()


LOCAL_QUERIES["rx_quality_audit"] = rx_quality_audit
LOCAL_ORACLE_SQL["rx_quality_audit"] = _QUALITY_AUDIT_ORACLE


#: every audit cell, in binder order — shared by the Spark and SQL
#: binder builders so the two sides cannot drift
_AUD_COUNT_COLS = (
    "orders_rows",
    "orders_dup_keys",
    "orders_null_cust",
    "orders_bad_price",
    "orders_orphans",
    "lineitem_rows",
    "lineitem_orphans",
)


def _aud_cert_cols(spark: SparkSession, sf_dir: str) -> list:
    """``aud_*`` certificate for the rx_distinct_agg contract host
    (certmemo): rows audited, total violations, and a binder over the
    ENTIRE audit row (all counts + the date range as ISO days, the
    cross-engine-stable date rendering)."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.certmemo import cached_cert_cols

    def _build() -> DataFrame:
        a = rx_quality_audit(spark, sf_dir)
        viol = (
            F.col("orders_dup_keys")
            + F.col("orders_null_cust")
            + F.col("orders_bad_price")
            + F.col("orders_orphans")
            + F.col("lineitem_orphans")
        )
        binder = binder_hash_col(
            "aud",
            *[F.col(c) for c in _AUD_COUNT_COLS],
            F.col("orders_date_lo").cast("date").cast("string"),
            F.col("orders_date_hi").cast("date").cast("string"),
        )
        return a.select(
            (F.col("orders_rows") + F.col("lineitem_rows"))
            .cast("bigint")
            .alias("aud_rows"),
            viol.cast("bigint").alias("aud_violations"),
            binder.cast("bigint").alias("aud_binder"),
        )

    return cached_cert_cols(
        spark,
        sf_dir,
        "aud",
        ("orders", "customer", "lineitem"),
        "aud_rows bigint, aud_violations bigint, aud_binder bigint",
        _build,
    )


def _sql_aud_cert_cte() -> str:
    """``audc`` 1-row CTE wrapping the audit oracle verbatim."""
    from guagua_spark.functions.scale import binder_hash_sql

    binder = binder_hash_sql(
        "aud",
        *[f"CAST({c} AS VARCHAR)" for c in _AUD_COUNT_COLS],
        "CAST(CAST(orders_date_lo AS DATE) AS VARCHAR)",
        "CAST(CAST(orders_date_hi AS DATE) AS VARCHAR)",
    )
    return (
        "audc AS MATERIALIZED (\n"
        "  SELECT CAST(orders_rows + lineitem_rows AS BIGINT)"
        " AS aud_rows,\n"
        "         CAST(orders_dup_keys + orders_null_cust +"
        " orders_bad_price + orders_orphans + lineitem_orphans"
        " AS BIGINT) AS aud_violations,\n"
        f"         CAST({binder} AS BIGINT) AS aud_binder\n"
        f"  FROM ({_QUALITY_AUDIT_ORACLE}) aq)"
    )


ORACLE_SQL["rx_distinct_agg"] = f"""
WITH {_sql_aud_cert_cte()},
da AS (
  SELECT COUNT(DISTINCT o_custkey) AS n_customers,
         COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 4) AS total_price
  FROM orders
)
SELECT da.n_customers, da.n_orders, da.total_price,
       audc.aud_rows, audc.aud_violations, audc.aud_binder
FROM da CROSS JOIN audc
""".strip()


# ---------------------------------------------------------------------------
# Interval-overlap join (bin join)


#: bin width in days for the interval join — wider than the longest
#: interval on either side (windows ≤ 60 d, lineitem spans ≤ 14 d), so
#: every interval lands in at most 2 buckets and the per-pair dedup
#: rule below fires exactly once
_IVJ_BIN_DAYS = 64
_IVJ_EPOCH = "1992-01-01"
_IVJ_WINDOW_EPOCH = "1995-01-01"


def rx_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via the classic BIN JOIN: overlap counts of
    25 deterministic nation-derived audit windows against per-lineitem
    ship intervals ``[shipdate, shipdate + qty%14 + 1 d]``.

    Spark has no interval-join operator; the naive formulation is a
    theta join (``l.s <= w.end AND l.e >= w.start``) that Catalyst can
    only run as BroadcastNestedLoopJoin / cartesian — a scale-killer
    when BOTH sides are large. The bin join makes it an EQUI join:
    explode each interval into the fixed-width day buckets it covers
    (≤2 per side at this width), hash-join on the bucket, re-check the
    exact overlap predicate, and count each qualifying pair exactly
    once via the standard dedup rule — keep the pair only in the bucket
    containing ``GREATEST(l.s, w.start)`` (both intervals cover that
    day, and it lies in exactly one bucket). At 100 TB both sides
    shuffle on a dense integer key, AQE can skew-split a hot bucket,
    and the fan-out is bounded by ``interval_len/bin + 1`` per row —
    the plan test pins the absence of any nested-loop join.

    Oracle: the theta join DuckDB runs natively (its IEJoin handles
    interval predicates — the luxury Spark lacks, which is the point
    of this operator)."""
    n = load_table(spark, sf_dir, "nation")
    day0 = F.to_date(F.lit(_IVJ_EPOCH))
    wep = F.to_date(F.lit(_IVJ_WINDOW_EPOCH))

    def bkt(d: Column) -> Column:
        return F.floor(F.datediff(d, day0) / _IVJ_BIN_DAYS).cast("int")

    win = n.select(
        F.col("n_nationkey").cast("int").alias("window_id"),
        F.date_add(wep, (F.col("n_nationkey") * 97).cast("int")).alias(
            "w_start"
        ),
        F.date_add(
            wep,
            (
                F.col("n_nationkey") * 97
                + 20
                + (F.col("n_nationkey") * 13) % 40
            ).cast("int"),
        ).alias("w_end"),
    )
    win_b = win.withColumn(
        "bkt", F.explode(F.sequence(bkt(F.col("w_start")), bkt(F.col("w_end"))))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").cast("date").alias("s"),
        F.date_add(
            F.col("l_shipdate").cast("date"),
            (F.floor(F.col("l_quantity")).cast("int") % 14 + 1),
        ).alias("e"),
        "l_quantity",
    )
    li_b = li.withColumn(
        "bkt", F.explode(F.sequence(bkt(F.col("s")), bkt(F.col("e"))))
    )
    pairs = (
        li_b.join(win_b, "bkt")
        .where(
            (F.col("s") <= F.col("w_end"))
            & (F.col("e") >= F.col("w_start"))
            & (F.col("bkt") == bkt(F.greatest(F.col("s"), F.col("w_start"))))
        )
    )
    return pairs.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
    )


_INTERVAL_JOIN_ORACLE = f"""
WITH windows AS (
  SELECT CAST(n_nationkey AS INT) AS window_id,
         DATE '{_IVJ_WINDOW_EPOCH}' + CAST(n_nationkey * 97 AS INT) AS w_start,
         DATE '{_IVJ_WINDOW_EPOCH}'
           + CAST(n_nationkey * 97 + 20 + (n_nationkey * 13) % 40 AS INT) AS w_end
  FROM nation),
iv AS (
  SELECT CAST(l_shipdate AS DATE) AS s,
         CAST(l_shipdate AS DATE)
           + CAST(CAST(FLOOR(l_quantity) AS INT) % 14 + 1 AS INT) AS e,
         l_quantity
  FROM lineitem)
SELECT w.window_id,
       COUNT(*) AS n_overlap,
       CAST(SUM(iv.l_quantity) AS DOUBLE) AS sum_qty
FROM windows w
JOIN iv ON iv.s <= w.w_end AND iv.e >= w.w_start
GROUP BY 1
""".strip()


LOCAL_QUERIES["rx_interval_join"] = rx_interval_join
LOCAL_ORACLE_SQL["rx_interval_join"] = _INTERVAL_JOIN_ORACLE


def _ivj_cert_cols(spark: SparkSession, sf_dir: str) -> list:
    """``ivj_*`` certificate as memoized literal columns for the
    rx_range_join_events contract host (certmemo): window count,
    Σ overlap pairs, and the Σ-safe binder over (window_id, n_overlap)
    — a pair counted twice by the bucket dedup rule, a dropped window,
    or a fan-out miscount flips it. Puts the LOCAL bin-join operator
    behind the driver's value-hash gate. sum_qty is deliberately
    excluded (float accumulation is the host row's 6dp concern; the
    binder stays exact at any scale)."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.certmemo import cached_cert_cols

    def _build() -> DataFrame:
        r = rx_interval_join(spark, sf_dir)
        return r.agg(
            F.count(F.lit(1)).cast("bigint").alias("ivj_n_windows"),
            F.sum("n_overlap").cast("bigint").alias("ivj_overlap_total"),
            F.sum(
                binder_hash_col(
                    "ivj", F.col("window_id"), F.col("n_overlap")
                )
            )
            .cast("bigint")
            .alias("ivj_binder"),
        )

    return cached_cert_cols(
        spark,
        sf_dir,
        "ivj",
        ("nation", "lineitem"),
        "ivj_n_windows bigint, ivj_overlap_total bigint, ivj_binder bigint",
        _build,
    )


def _sql_ivj_cert_cte() -> str:
    """``ivjc`` 1-row CTE wrapping the theta-join oracle verbatim —
    DuckDB runs the interval predicate natively (IEJoin), the luxury
    whose absence in Spark the bin join exists to work around."""
    from guagua_spark.functions.scale import binder_hash_sql

    binder = binder_hash_sql(
        "ivj", "CAST(window_id AS VARCHAR)", "CAST(n_overlap AS VARCHAR)"
    )
    return (
        "ivjc AS MATERIALIZED (\n"
        "  SELECT CAST(COUNT(*) AS BIGINT) AS ivj_n_windows,\n"
        "         CAST(SUM(n_overlap) AS BIGINT) AS ivj_overlap_total,\n"
        f"         CAST(SUM({binder}) AS BIGINT) AS ivj_binder\n"
        f"  FROM ({_INTERVAL_JOIN_ORACLE}) ivq)"
    )


ORACLE_SQL["rx_range_join_events"] = f"""
WITH {_sql_ivj_cert_cte()},
bounds AS (
  SELECT 0 AS bucket, 0.0 AS lo, 50000.0 AS hi
  UNION ALL SELECT 1, 50000.0, 100000.0
  UNION ALL SELECT 2, 100000.0, 200000.0
  UNION ALL SELECT 3, 200000.0, CAST('inf' AS DOUBLE)
),
rj AS (
  SELECT bucket, COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 4) AS total_price
  FROM orders JOIN bounds
    ON o_totalprice > lo AND o_totalprice <= hi
  GROUP BY bucket
)
SELECT rj.bucket, rj.n_orders, rj.total_price,
       ivjc.ivj_n_windows, ivjc.ivj_overlap_total, ivjc.ivj_binder
FROM rj CROSS JOIN ivjc ORDER BY bucket
""".strip()


# ---------------------------------------------------------------------------
# Bucketed co-located join (sort-merge-bucket)


#: bucket count for the co-located join demo — matched on BOTH sides
#: (Spark only elides the exchange when the counts are equal)
_SMB_BUCKETS = 16


def _bucketed_twin(
    spark: SparkSession, sf_dir: str, table: str, key: str, cols: list[str]
) -> str:
    """Materialize ``table`` as a managed parquet table bucketed AND
    sorted on ``key`` — the write-time investment that makes every
    later equi-join on that key shuffle-free. Memoized by embedding
    (table fingerprint, code version) in the table name; a stale twin
    for the same source table is dropped on rebuild, a hit is a pure
    catalog lookup (zero jobs)."""
    import hashlib

    from guagua_spark.durable import code_version
    from guagua_spark.sources.tables import table_fingerprint

    fp = hashlib.md5(
        repr(
            (
                table_fingerprint(sf_dir, table),
                code_version(),
                _SMB_BUCKETS,
                key,
                tuple(cols),
            )
        ).encode()
    ).hexdigest()[:12]
    name = f"g_smb_{table}_{fp}"
    if not spark.catalog.tableExists(name):
        # the default session catalog is in-memory (session.py): THIS
        # name's directory from a PREVIOUS process can survive in the
        # warehouse with no catalog entry (the name is content-
        # addressed, so the files are exactly this twin's data). A
        # COMPLETE directory (_SUCCESS marker) is re-registered as an
        # external bucketed table — the cross-session warm path, zero
        # jobs, bucketing metadata restored by declaring the same
        # CLUSTERED BY spec the writer used. A torn write rebuilds.
        # Other g_smb_* variants are twins of OTHER (data, key, cols,
        # code) combinations — possibly live in this or a concurrent
        # session — and are never touched; orphans are bounded by
        # distinct fingerprints and cost only warehouse disk. Two
        # sessions racing on the SAME fingerprint are serialized by an
        # atomic mkdir lock beside the directory: the loser waits,
        # then reattaches the winner's (byte-identical, content-
        # addressed) output instead of rmtree-ing it mid-write.
        import shutil
        import time
        from urllib.parse import urlparse

        raw = spark.conf.get(
            "spark.sql.warehouse.dir", os.path.abspath("spark-warehouse")
        )
        # file:/x, file:///x and plain /x all normalize to a POSIX path
        wh = urlparse(raw).path if raw.startswith("file:") else raw
        stale = os.path.join(wh, name)
        done = os.path.join(stale, "_SUCCESS")
        src = load_table(spark, sf_dir, table).select(*cols)

        def _reattach() -> None:
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in src.schema.fields
            )
            spark.sql(
                f"CREATE TABLE {name} ({ddl}) USING parquet "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {_SMB_BUCKETS} BUCKETS LOCATION '{stale}'"
            )

        if os.path.exists(done):
            _reattach()
            return name
        os.makedirs(wh, exist_ok=True)
        lock = stale + "._lock"
        deadline = time.monotonic() + 600
        while True:
            try:
                os.mkdir(lock)
                break
            except FileExistsError:
                if os.path.exists(done):  # concurrent builder finished
                    _reattach()
                    return name
                if time.monotonic() > deadline:  # crashed builder
                    shutil.rmtree(lock, ignore_errors=True)
                time.sleep(0.5)
        try:
            if os.path.exists(done):  # lost an earlier race, now warm
                _reattach()
                return name
            if os.path.isdir(stale):
                shutil.rmtree(stale, ignore_errors=True)
            (
                src.write.mode("overwrite")
                .bucketBy(_SMB_BUCKETS, key)
                .sortBy(key)
                .saveAsTable(name)
            )
        finally:
            shutil.rmtree(lock, ignore_errors=True)
    return name


def rx_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join with BOTH sides pre-bucketed on the join key —
    the sort-merge-bucket pattern that turns the dominant cost of a
    100 TB star join (two corpus-sized shuffles, re-paid per query)
    into a one-time write-layout decision: Spark's bucketed scan
    reports the hash partitioning to Catalyst, which plans the
    SortMergeJoin with NO Exchange under either side (the plan test
    pins exactly one Exchange in the whole query — the final grouped
    aggregate's). The broadcast escape is deliberately absent here:
    this is the big-big shape where broadcasting is impossible and
    bucketing is the only shuffle eliminator.

    Returns revenue per order priority over the joined relation —
    oracle is the plain join DuckDB runs directly."""
    ot = _bucketed_twin(
        spark, sf_dir, "orders", "o_orderkey",
        ["o_orderkey", "o_orderpriority"],
    )
    lt = _bucketed_twin(
        spark, sf_dir, "lineitem", "l_orderkey",
        ["l_orderkey", "l_extendedprice", "l_discount"],
    )
    o, li = spark.table(ot), spark.table(lt)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


_BUCKETED_JOIN_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       SUM(l_extendedprice * (1.0 - l_discount)) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
""".strip()


LOCAL_QUERIES["rx_bucketed_join"] = rx_bucketed_join
LOCAL_ORACLE_SQL["rx_bucketed_join"] = _BUCKETED_JOIN_ORACLE


def _smb_cert_cols(spark: SparkSession, sf_dir: str) -> list:
    """``smb_*`` certificate as memoized literal columns for the
    rx_rollup_revenue contract host (certmemo): priority-group count,
    Σ joined line counts, the Σ-safe binder over (priority, n_lines),
    AND the plan shape itself as integers — join-key Exchange count
    (must be 0: the whole point of the bucketed layout) and bucketed
    scan count (must be 2). The oracle emits the expected constants,
    so a silent regression to a shuffled join fails the DRIVER's
    value-hash gate, not just a pytest plan pin. Broadcast is disabled
    during the build so the sort-merge-bucket path is what's measured;
    revenue doubles are excluded from the binder (the LOCAL oracle
    float-gates them)."""
    from guagua_spark.functions.scale import binder_hash_col
    from guagua_spark.operators.certmemo import cached_cert_cols

    def _build() -> DataFrame:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = rx_bucketed_join(spark, sf_dir)
            df.collect()  # realize so AQE's final plan is inspectable
            plan = df._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            key_ex = final.count(
                "Exchange hashpartitioning(o_orderkey"
            ) + final.count("Exchange hashpartitioning(l_orderkey")
            bucketed = final.count("Bucketed: true")
            return (
                df.agg(
                    F.count(F.lit(1)).cast("bigint").alias("smb_n_prios"),
                    F.sum("n_lines")
                    .cast("bigint")
                    .alias("smb_lines_total"),
                    F.sum(
                        binder_hash_col(
                            "smb",
                            F.col("o_orderpriority"),
                            F.col("n_lines"),
                        )
                    )
                    .cast("bigint")
                    .alias("smb_binder"),
                )
                .withColumn(
                    "smb_key_exchanges", F.lit(key_ex).cast("bigint")
                )
                .withColumn(
                    "smb_bucketed_scans", F.lit(bucketed).cast("bigint")
                )
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    return cached_cert_cols(
        spark,
        sf_dir,
        "smb",
        ("orders", "lineitem"),
        "smb_n_prios bigint, smb_lines_total bigint, smb_binder bigint,"
        " smb_key_exchanges bigint, smb_bucketed_scans bigint",
        _build,
    )


def _sql_smb_cert_cte() -> str:
    """``smbc`` 1-row CTE wrapping the plain-join oracle verbatim; the
    plan-shape columns are the EXPECTED constants (0 join-key
    exchanges, 2 bucketed scans) — DuckDB has no bucketed scans, the
    constants are the contract Spark's plan must meet."""
    from guagua_spark.functions.scale import binder_hash_sql

    binder = binder_hash_sql(
        "smb", "o_orderpriority", "CAST(n_lines AS VARCHAR)"
    )
    return (
        "smbc AS MATERIALIZED (\n"
        "  SELECT CAST(COUNT(*) AS BIGINT) AS smb_n_prios,\n"
        "         CAST(SUM(n_lines) AS BIGINT) AS smb_lines_total,\n"
        f"         CAST(SUM({binder}) AS BIGINT) AS smb_binder,\n"
        "         CAST(0 AS BIGINT) AS smb_key_exchanges,\n"
        "         CAST(2 AS BIGINT) AS smb_bucketed_scans\n"
        f"  FROM ({_BUCKETED_JOIN_ORACLE}) smbq)"
    )


ORACLE_SQL["rx_rollup_revenue"] = (
    f"WITH {_sql_smb_cert_cte()},\n{_ROLLUP_ORACLE_BODY.strip()}"
)
