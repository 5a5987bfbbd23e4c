"""Bounded-memory frequent items (heavy hitters) with EXACT output.

The 100 TB problem: "which tokens appear in more than x% of the
corpus" via a plain groupBy shuffles the ENTIRE distinct-value set —
billions of rare tokens move through the exchange to produce a
handful of output rows. The sketch route bounds that:

1. **Misra-Gries candidate pass** (mapInPandas, one scan): each
   partition folds its batches into a c-counter summary using the
   mergeable-summaries MERGE (combine counts, subtract the (c+1)-th
   largest, keep the positive top c — Agarwal/Cormode et al., PODS'12
   "Mergeable Summaries"): undercount ≤ N_p/(c+1), so any value with
   partition frequency > N_p/(c+1) survives its partition's sketch.
   By averaging, a value with GLOBAL frequency > N/(c+1) exceeds that
   bound in at least one partition — the union of partition sketches
   is a SUPERSET of every global heavy hitter. ≤ (c+1)·P tiny rows
   leave the scan.
2. **Exact recount**: broadcast the candidate set back as a map-side
   semi filter, one partially-aggregated groupBy over ONLY candidate
   rows (map-side combine collapses each partition's contribution to
   ≤ |candidates| rows before the exchange), threshold at N/(c+1).

Step 2 makes the output EXACT — provably equal to
``GROUP BY v HAVING COUNT(*) > N/(c+1)`` — so a plain SQL oracle can
replay it, while the shuffle stays candidate-sized at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counts, c: int):
    """One mergeable-summaries MERGE step: keep the top c counters
    after subtracting the (c+1)-th largest (0 if none)."""
    if len(counts) <= c:
        return counts
    top = counts.nlargest(c + 1)
    out = top.iloc[:c] - top.iloc[-1]
    return out[out > 0]


def skew_report(
    df: DataFrame,
    col: str,
    counters: int = 64,
    n_salts: int = 16,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Pre-flight skew diagnostics for a join/groupBy/window key: the
    exact share of rows held by every value above the 1/(counters+1)
    detection threshold (via :func:`frequent_items` — candidate-sized
    shuffle at any scale), plus the mitigation each hot key calls for.
    At 100 TB you run THIS before the expensive job, not after the one
    straggler task times out:

    - share ≥ 0.5/shuffle-partitions → one reducer holds multiples of
      the average: ``salted_agg``/``salted_topk`` (groupBy/window) or
      AQE skew-join handles the join case;
    - below that → no action, AQE partition coalescing suffices.

    Output: (value, n, share, salted_tasks, recommendation) ordered by
    share desc — ``salted_tasks`` is the per-key fan-out ``n_salts``
    would give that key. Exact (sketch candidates + exact recount), so
    the SQL oracle is a plain GROUP BY/HAVING replay. Pass an explicit
    ``shuffle_partitions`` when the report must be reproducible across
    environments (oracle replays pin it); default reads the session
    conf."""
    spark = df.sparkSession
    # N comes from the candidate pass's partition total markers — no
    # third corpus scan for the share denominators (round-8 review)
    hot, n_total = _frequent_with_total(df, col, counters, "n")
    n_total = n_total or 1
    parts = shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    share = (F.col("n") / F.lit(float(n_total))).alias("share")
    hot_bar = 0.5 / parts
    return hot.select(
        col,
        "n",
        F.round(share, 6).alias("share"),
        F.lit(n_salts).alias("salted_tasks"),
        F.when(
            F.col("n") / F.lit(float(n_total)) >= hot_bar,
            F.lit("salt"),
        )
        .otherwise(F.lit("none"))
        .alias("recommendation"),
    ).orderBy(F.col("share").desc(), col)


def frequent_items(
    df: DataFrame,
    col: str,
    counters: int = 64,
    out_col: str = "n",
) -> DataFrame:
    """Every value of ``col`` whose frequency exceeds N/(counters+1),
    with its EXACT count, ordered by (count desc, value). See the
    module docstring for the two-pass construction and the exactness
    argument. ``counters`` trades candidate-set size (≤ (counters+1)·P
    rows) against the detection threshold."""
    return _frequent_with_total(df, col, counters, out_col)[0]


def _frequent_with_total(
    df: DataFrame, col: str, counters: int, out_col: str
) -> tuple[DataFrame, int]:
    """(frequent-items result, exact non-null total N) — N falls out of
    the candidate pass's per-partition total markers, so callers that
    need it (skew_report's shares) don't pay a third corpus scan."""
    c = counters

    def mg(batches):
        import pandas as pd

        sketch = pd.Series(dtype="float64")
        total = 0
        for pdf in batches:
            total += len(pdf)
            vc = pdf["__v"].value_counts()
            sketch = _mg_merge(sketch.add(vc, fill_value=0), c)
        out = pd.DataFrame(
            {"val": sketch.index.astype(object), "n": 0}
        )
        yield pd.concat(
            [out, pd.DataFrame({"val": [None], "n": [total]})]
        )

    base = df.select(F.col(col).cast("string").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    # one scan emits ≤ c candidates + 1 total-marker row per partition;
    # pinned so the totals job and the candidates job read ONE
    # materialized result (it is candidate-sized, never corpus-sized)
    part = base.mapInPandas(mg, "val string, n long").localCheckpoint(
        eager=True
    )
    n_total = (
        part.filter(F.col("val").isNull()).agg(F.sum("n")).collect()[0][0]
        or 0
    )
    cand = part.filter(F.col("val").isNotNull()).select("val").distinct()
    thresh = float(n_total) / (c + 1)
    result = (
        base.join(F.broadcast(cand), F.col("__v") == F.col("val"))
        .groupBy("__v")
        .agg(F.count(F.lit(1)).alias(out_col))
        .filter(F.col(out_col) > thresh)
        .select(F.col("__v").alias(col), out_col)
        .orderBy(F.col(out_col).desc(), col)
    )
    return result, int(n_total)


# -- HyperLogLog distinct-count sketch (engine-exact registers) -------------

#: register count 2^HLL_B; standard error 1.04/√m ≈ 3.3% at b=10
HLL_B = 10
HLL_M = 1 << HLL_B
#: bias correction α_m for m ≥ 128 (Flajolet et al., AofA'07)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: 2⁰ .. 2⁻³³ as exact double literals — register weights resolved by
#: ARRAY LOOKUP instead of POWER() so both engines read the identical
#: bit pattern (element_at here, list indexing in the SQL twin)
HLL_WEIGHTS = [2.0 ** (-r) for r in range(34)]


def hll_rank_col(value_col) -> F.Column:
    """HLL rank of a value: 1 + leading-zero count of the 32-bit
    deterministic hash u32(md5('hllr|'·v)) — a pure integer
    comparison ladder (first WHEN that fires wins), no log2/libm, so
    the SQL twin (hll_rank_sql) produces the identical integer for
    every input on any engine."""
    from guagua_spark.functions.scale import u32_hash

    u = u32_hash("hllr", value_col)
    w = F.when(u >= F.lit(1 << 31), 1)
    for r in range(2, 33):
        w = w.when(u >= F.lit(1 << (32 - r)), r)
    return w.otherwise(33)


def hll_rank_sql(value_expr: str) -> str:
    """SQL twin of hll_rank_col over a VARCHAR expression."""
    u = (
        f"CAST(('0x' || substr(md5('hllr|' || {value_expr}), 1, 8))"
        " AS UBIGINT)"
    )
    whens = " ".join(
        f"WHEN {u} >= {1 << (32 - r)} THEN {r}" for r in range(1, 33)
    )
    return f"(CASE {whens} ELSE 33 END)"


def hll_bucket_col(value_col) -> F.Column:
    from guagua_spark.functions.scale import u32_hash

    return u32_hash("hllb", value_col) % HLL_M


def hll_bucket_sql(value_expr: str) -> str:
    return (
        f"(CAST(('0x' || substr(md5('hllb|' || {value_expr}), 1, 8))"
        f" AS UBIGINT) % {HLL_M})"
    )


def hll_registers(
    df: DataFrame, col: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(group..., bucket, reg) register table — MAX of ranks per
    bucket. The 100 TB shape: the groupBy key space is (groups × m)
    regardless of cardinality, and MAX is map-side combinable, so the
    exchange carries ≤ m rows per partition per group — a distinct
    count with a CONSTANT-size shuffle where COUNT(DISTINCT) shuffles
    the entire distinct set. Registers are deterministic integers
    (md5-derived), replayed exactly by the SQL oracle; the same
    monotone MAX makes the streaming twin a plain incremental agg."""
    v = F.col(col).cast("string")
    base = df.filter(v.isNotNull()).select(
        *group_cols,
        hll_bucket_col(v).alias("bucket"),
        hll_rank_col(v).alias("rank"),
    )
    return base.groupBy(*group_cols, "bucket").agg(
        F.max("rank").alias("reg")
    )


def hll_estimate_cols() -> list:
    """Aggregate columns over a register relation (bucket, reg) →
    (hll_used, hll_reg_checksum, hll_est_raw, hll_est). The inverse
    power sum Σ 2^-reg + zeros·2⁰ is EXACTLY representable (every
    term is a multiple of 2⁻³³, the total < 2¹⁰ — 43 mantissa bits
    < 53), so it is order-independent and bit-identical cross-engine;
    the raw estimate αm²/sum is then one exact-input float expression.
    ``hll_est`` applies the standard small-range correction (linear
    counting, m·ln(m/zeros) when est_raw ≤ 2.5m and zero registers
    exist — Flajolet et al.); ln() is libm, hence the 6dp rounding
    defense, while used/checksum/est_raw stay integer-or-exact at any
    scale."""
    used = F.count(F.lit(1)).cast("bigint").alias("hll_used")
    checksum = (
        F.sum((F.col("bucket") + 1) * F.col("reg"))
        .cast("bigint")
        .alias("hll_reg_checksum")
    )
    zeros = (F.lit(HLL_M) - F.count(F.lit(1))).cast("double")
    inv_sum = (
        F.sum(
            F.element_at(
                F.array(*[F.lit(x) for x in HLL_WEIGHTS]),
                F.col("reg") + 1,
            )
        )
        + zeros
    )
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / inv_sum
    est_raw = F.round(raw, 6).alias("hll_est_raw")
    est = F.round(
        F.when(
            (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
            F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
        ).otherwise(raw),
        6,
    ).alias("hll_est")
    return [used, checksum, est_raw, est]


def hll_estimate_sql() -> str:
    """SQL twin of hll_estimate_cols over a (bucket, reg) relation —
    a select-list fragment (used, checksum, est_raw, est)."""
    lits = ", ".join(repr(x) for x in HLL_WEIGHTS)
    inv = (
        f"(SUM(([{lits}])[reg + 1])"
        f" + CAST({HLL_M} - COUNT(*) AS DOUBLE))"
    )
    raw = f"({HLL_ALPHA * HLL_M * HLL_M!r} / {inv})"
    zeros = f"CAST({HLL_M} - COUNT(*) AS DOUBLE)"
    est = (
        f"CASE WHEN {raw} <= {2.5 * HLL_M!r} AND {zeros} > 0"
        f" THEN {float(HLL_M)!r} * LN({float(HLL_M)!r} / {zeros})"
        f" ELSE {raw} END"
    )
    return (
        "CAST(COUNT(*) AS BIGINT) AS hll_used, "
        "CAST(SUM((bucket + 1) * reg) AS BIGINT) AS hll_reg_checksum, "
        f"ROUND({raw}, 6) AS hll_est_raw, "
        f"ROUND({est}, 6) AS hll_est"
    )


def hll_merge(
    *reg_dfs: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Union of sketches = element-wise MAX of registers — the
    mergeability that makes HLL the incremental distinct count: each
    batch (a day's events, a crawl shard) builds its own register
    table with hll_registers, and merging is a bounded groupBy MAX
    over register rows — raw data is never revisited (the same ingest
    contract as append_to_pq_index: grow derived state in O(batch)).
    Exactly equals rebuilding on the unioned input, because
    MAX(MAX(A), MAX(B)) = MAX(A ∪ B) — asserted in tests."""
    out = reg_dfs[0]
    for r in reg_dfs[1:]:
        out = out.unionByName(r)
    return out.groupBy(*group_cols, "bucket").agg(
        F.max("reg").alias("reg")
    )


# -- Count-Min frequency sketch (engine-exact counters) ----------------------

#: depth × width: 4 independent md5 hash rows × 256 buckets = a 1024-row
#: counter table whatever the corpus size; overestimate ≤ 2N/w per row
#: with probability 1 − 2⁻ᵈ (Cormode & Muthukrishnan, J.Alg'05)
CM_DEPTH = 4
CM_WIDTH = 256


def cm_bucket_col(j: int, value_col) -> F.Column:
    from guagua_spark.functions.scale import u32_hash

    return u32_hash(f"cm{j}", value_col) % CM_WIDTH


def cm_bucket_sql(j: int, value_expr: str) -> str:
    return (
        f"(CAST(('0x' || substr(md5('cm{j}|' || {value_expr}), 1, 8))"
        f" AS UBIGINT) % {CM_WIDTH})"
    )


def cm_counters(df: DataFrame, col: str) -> DataFrame:
    """(j, bucket, n) Count-Min counter table. The 100 TB shape: each
    value fans out map-side into CM_DEPTH (j, bucket) rows whose
    groupBy domain is d·w = 1024 whatever the cardinality, so map-side
    combine collapses every partition's contribution to ≤ 1024 rows
    before the exchange — a frequency table with a CONSTANT-size
    shuffle. Counters are exact integers over deterministic md5
    buckets, so the SQL twin replays them bit-for-bit, and two
    corpora's counter tables merge by ADDITION (linear sketch)."""
    v = F.col(col).cast("string")
    fan = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    cm_bucket_col(j, v).alias("bucket"),
                )
                for j in range(CM_DEPTH)
            ]
        )
    ).alias("cell")
    return (
        df.filter(v.isNotNull())
        .select(fan)
        .groupBy(F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cm_counters_weighted(
    per_value: DataFrame, col: str, weight_col: str
) -> DataFrame:
    """(j, bucket, n) Count-Min counters from a PRE-AGGREGATED
    (value, count) relation — the round-13 qcm construction applied to
    the flat sketch: the CM_DEPTH md5 fan runs once per DISTINCT value
    with SUM(weight) totals, instead of once per occurrence. Counters
    are bit-identical to :func:`cm_counters` over the raw stream
    (bucket_j(v) is a pure function of v; integer SUM is associative —
    suite-asserted). Worth it only when occurrences ≫ distinct values:
    at sf0.1 the token stream measured 1.9 s → 0.5 s, while the
    events user_id stream (small occurrence/distinct ratio) measured
    0.27 s → 0.40 s, so :func:`cm_counters` remains the right form
    for such callers and both stay available."""
    v = F.col(col).cast("string")
    fan = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    cm_bucket_col(j, v).alias("bucket"),
                )
                for j in range(CM_DEPTH)
            ]
        )
    ).alias("cell")
    return (
        per_value.filter(v.isNotNull())
        .select(fan, F.col(weight_col).alias("_w"))
        .groupBy(
            F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket")
        )
        .agg(F.sum("_w").alias("n"))
    )


def cm_estimates(counters: DataFrame, probes: DataFrame, col: str) -> DataFrame:
    """Point-frequency estimates for a probe relation: est(x) =
    MIN over the d rows of counter[j, bucket_j(x)] — NEVER an
    underestimate (every counter that x hashes into counts all of x's
    occurrences plus non-negative collisions; property-tested). The
    probe fan-out is |probes|·d rows joining a ≤1024-row broadcast."""
    v = F.col(col).cast("string")
    fan = probes.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cm_bucket_col(j, v).alias("bucket"),
                    )
                    for j in range(CM_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select(col, F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
    return (
        fan.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cm_est"))
    )


# -- Bloom filter (engine-exact bit set) --------------------------------------

#: bits and hash count: m = 4096, k = 3 → FPR ≈ (1−e^(−kn/m))^k,
#: ~1.5% at n = 500 keys; both deterministic md5 functions of the key,
#: so the bit set (stored as a DISTINCT bit-position relation, ≤ m
#: rows) replays bit-for-bit in SQL
BLOOM_M = 4096
BLOOM_K = 3


def bloom_bit_cols(value_col) -> list:
    from guagua_spark.functions.scale import u32_hash

    return [
        (u32_hash(f"bf{i}", value_col) % BLOOM_M) for i in range(BLOOM_K)
    ]


def bloom_bit_sql(i: int, value_expr: str) -> str:
    return (
        f"(CAST(('0x' || substr(md5('bf{i}|' || {value_expr}), 1, 8))"
        f" AS UBIGINT) % {BLOOM_M})"
    )


def bloom_bits(df: DataFrame, col: str) -> DataFrame:
    """1-column (bit) relation: the DISTINCT bit positions the build
    side sets — ≤ BLOOM_M rows whatever the key count. The 100 TB
    pattern is SEMI-JOIN REDUCTION: build over the small side's keys,
    collect the ≤4096 ints to the driver (bounded), and prune the big
    side MAP-SIDE with :func:`bloom_keep_col` before any shuffle — no
    false negatives, so an exact join after the filter returns exactly
    the unfiltered result (property- and oracle-tested). This is the
    engine-portable, SQL-certifiable analogue of Spark's runtime
    bloom-join filters."""
    v = F.col(col).cast("string")
    return (
        df.filter(v.isNotNull())
        .select(
            F.explode(F.array(*bloom_bit_cols(v))).alias("bit")
        )
        .distinct()
    )


def bloom_keep_col(value_col, bit_set: frozenset) -> F.Column:
    """Map-side membership predicate: True iff ALL k bits of the value
    are in the (driver-collected, ≤m-int) bit set — a plan-literal
    array lookup per hash, no join, no shuffle. May pass a non-member
    (bounded FPR), NEVER drops a member.

    Encoding (round 13): the bit set rides the plan as ONE constant
    BLOOM_M-element boolean array indexed by bit position —
    ``element_at(bitmap, bit + 1)`` — instead of ``bit.isin(<up to m
    sorted literals>)``. The isin form's per-row cost grew linearly
    with the set's density (k separate thousands-literal IN lists);
    the array lookup is O(1) per hash at any density. Measured at
    sf0.1 (2709 of 4096 bits set, 100k events): filter pass 6.1 s →
    0.97 s, identical pass set. Same truth table bit-for-bit: NULL
    keys hash to NULL bits → NULL lookup → row dropped, exactly as
    NULL.isin(...) did."""
    bitmap = F.array(
        *[F.lit(bool(i in bit_set)) for i in range(BLOOM_M)]
    )
    keep = F.lit(True)
    for c in bloom_bit_cols(value_col):
        keep = keep & F.element_at(bitmap, c.cast("int") + F.lit(1))
    return keep


# -- Dyadic Count-Min rank / quantile sketch ----------------------------------
#
# The fifth sketch: bounded-memory RANK (and therefore quantile)
# estimation over a numeric column, per Cormode & Muthukrishnan's
# dyadic range-sum construction (J.Alg'05 §4.2): quantize values to an
# integer domain [0, 2^QCM_LEVELS), keep one Count-Min sketch per
# dyadic LEVEL l over the cell ids (vq >> l), and answer
# rank(x) = |{v <= x}| as the sum of <= QCM_LEVELS disjoint dyadic
# interval counts covering [0, x] — each interval a single CM point
# query at its level. Like the other four sketches the construction is
# deterministic md5 arithmetic, so a SQL twin replays the counters AND
# the estimates bit-for-bit; like Count-Min it is a LINEAR sketch
# (counters of two corpora ADD), and every estimate is one-sided
# (>= the true rank, never below — each CM cell count includes all of
# the cell's occurrences plus non-negative collisions).
#
# 100 TB shape: each value fans out map-side into
# QCM_LEVELS * CM_DEPTH = 64 (lvl, j, bucket) rows whose groupBy
# domain is <= 64 * CM_WIDTH = 16384 counters whatever the corpus
# size — map-side combine collapses every partition's contribution
# before the exchange, so the shuffle is CONSTANT-size. A full sort
# (or the exact distinct-value running sum of rx_percentiles) touches
# every row; this touches 16384 counters.

QCM_LEVELS = 16
#: fixed-point scale: rank queries are answered on the quantized
#: domain vq = round(value * QCM_SCALE) clamped to [0, 2^QCM_LEVELS)
#: — exact for any corpus whose values fit the domain (events.value
#: spans [0, ~500] -> vq <= 50002), saturating (not wrapping) beyond.
QCM_SCALE = 100


def qcm_quantize_col(value_col) -> "F.Column":
    vq = F.round(value_col * QCM_SCALE).cast("bigint")
    return F.greatest(
        F.lit(0), F.least(vq, F.lit((1 << QCM_LEVELS) - 1))
    )


def qcm_quantize_sql(expr: str) -> str:
    return (
        f"GREATEST(0, LEAST(CAST(ROUND(({expr}) * {QCM_SCALE}) AS"
        f" BIGINT), {(1 << QCM_LEVELS) - 1}))"
    )


def _qcm_bucket_col(lvl: int, j: int, cell_col) -> "F.Column":
    from guagua_spark.functions.scale import u32_hash

    return u32_hash(f"qcm{lvl}_{j}", cell_col.cast("string")) % CM_WIDTH


def _qcm_bucket_sql(lvl_expr: str, j_expr: str, cell_expr: str) -> str:
    """DuckDB twin of _qcm_bucket_col with lvl/j as SQL expressions
    (the oracle fans levels with unnest, not 64 unioned branches)."""
    return (
        "(CAST(('0x' || substr(md5('qcm' || CAST((" + lvl_expr + ") AS"
        " VARCHAR) || '_' || CAST((" + j_expr + ") AS VARCHAR) || '|'"
        " || CAST((" + cell_expr + ") AS VARCHAR)), 1, 8)) AS UBIGINT)"
        f" % {CM_WIDTH})"
    )


def qcm_counters(df: DataFrame, col: str) -> DataFrame:
    """(lvl, j, bucket, n) dyadic Count-Min counter table over the
    quantized values of ``col`` — <= QCM_LEVELS * CM_DEPTH * CM_WIDTH
    = 16384 exact-integer rows whatever the corpus size. Counters of
    two corpora MERGE BY ADDITION (linear sketch, same contract as
    cm_counters; asserted in tests).

    The corpus-sized pass is ONE ordinary map-side-combined
    ``groupBy(vq).count()`` — the quantized domain is 2^QCM_LEVELS =
    65536 cells by construction, so the dyadic fan is applied AFTER
    that pre-aggregation, with SUM(n) weights.

    The fan itself CASCADES (round 13, guide §1.2 'fix per-task work'):
    level-l cells are vq >> l, so distinct (lvl, cell) pairs number
    Σ_l min(|vq|, 2^(QCM_LEVELS-l)) ≈ 2·|vq| — the md5 bucket hash is
    evaluated once per (lvl, cell) × CM_DEPTH after a second
    domain-bounded pre-aggregation, instead of QCM_LEVELS × CM_DEPTH
    times per distinct value: ~8× fewer md5s for one extra tiny
    exchange (≤ 2·65536 rows whatever the corpus). Counters are
    bit-identical to fanning the raw stream: bucket(lvl, j, cell) is a
    pure function of its key and integer SUM is associative
    (A/B-measured 3.3 s → 0.9 s at sf0.1; asserted row-identical)."""
    return qcm_counters_from_per_value(qcm_per_value(df, col))


def qcm_per_value(df: DataFrame, col: str) -> DataFrame:
    """The (vq, n) quantized-domain histogram — the ONE corpus-sized
    pass behind the dyadic-CM build (≤ 2^QCM_LEVELS rows whatever the
    corpus). Exposed as a seam (round 13) so a host query that also
    needs EXACT prefix ranks can aggregate them from this relation
    instead of re-scanning the corpus — the DuckDB oracle's ``vcnt``
    CTE has always been shaped this way; sharing one exchange between
    the counter fan and the exact reads is the Spark mirror of it
    (guide §2.4, ReusedExchange)."""
    vq = qcm_quantize_col(F.col(col))
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(vq.alias("vq"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def qcm_counters_from_per_value(per_value: DataFrame) -> DataFrame:
    """The dyadic fan + cascade of qcm_counters over an existing
    (vq, n) histogram (see qcm_counters for the counter math and the
    bit-identity argument)."""
    lvl_fan = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(lvl).alias("lvl"),
                    F.shiftright(F.col("vq"), lvl).alias("cell"),
                )
                for lvl in range(QCM_LEVELS)
            ]
        )
    ).alias("lc")
    per_cell = (
        per_value.select(lvl_fan, "n")
        .groupBy(
            F.col("lc.lvl").alias("lvl"), F.col("lc.cell").alias("cell")
        )
        .agg(F.sum("n").alias("n"))
    )
    # same md5 form as _qcm_bucket_col with lvl/j as COLUMNS — the
    # byte-identical concat construction qcm_rank_estimates already
    # uses on the probe side
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("qcm"),
                        F.col("lvl").cast("string"),
                        F.lit("_"),
                        F.col("j").cast("string"),
                        F.lit("|"),
                        F.col("cell").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % CM_WIDTH
    )
    return (
        per_cell.select(
            "lvl",
            "cell",
            "n",
            F.explode(
                F.array(*[F.lit(j) for j in range(CM_DEPTH)])
            ).alias("j"),
        )
        .withColumn("bucket", bucket)
        .groupBy("lvl", "j", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def dyadic_prefix_cells(xq: int, levels: int = QCM_LEVELS) -> list:
    """The <= ``levels`` disjoint dyadic cells whose union is the
    inclusive prefix [0, xq]: one cell per set bit of xq+1, walked
    MSB-first so each block is aligned at its level. Pure plan-time
    arithmetic — shared by the Spark builder and the SQL oracle
    generator so the decompositions cannot drift."""
    n = xq + 1
    cells, p = [], 0
    for lvl in range(levels - 1, -1, -1):
        if n & (1 << lvl):
            cells.append((lvl, p >> lvl))
            p += 1 << lvl
    return cells


def qcm_rank_estimates(
    counters: DataFrame, probes_q: list
) -> DataFrame:
    """(probe_q, est_rank) one-sided rank estimates at quantized probe
    points: est(x) = sum over the dyadic decomposition of [0, x] of
    MIN-over-j counter reads — <= levels * CM_DEPTH rows per probe
    joining the <= 16384-row broadcast counter table. NEVER below the
    true rank (each cell read >= the cell's true count; the cells are
    disjoint and cover exactly [0, x])."""
    spark = counters.sparkSession
    rows = [
        (int(xq), int(lvl), int(cell))
        for xq in probes_q
        for (lvl, cell) in dyadic_prefix_cells(int(xq))
    ]
    cells = spark.createDataFrame(rows, "probe_q bigint, lvl int, cell bigint")
    # tag must be built per-row (lvl and j are columns here, literals
    # on the counter side) — same md5 form as _qcm_bucket_col
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("qcm"),
                        F.col("lvl").cast("string"),
                        F.lit("_"),
                        F.col("j").cast("string"),
                        F.lit("|"),
                        F.col("cell").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % CM_WIDTH
    )
    fan = cells.select(
        "probe_q",
        "lvl",
        "cell",
        F.explode(F.array(*[F.lit(j) for j in range(CM_DEPTH)])).alias("j"),
    ).withColumn("bucket", bucket)
    per_cell = (
        fan.join(F.broadcast(counters), ["lvl", "j", "bucket"], "left")
        .groupBy("probe_q", "lvl", "cell")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cell_est"))
    )
    return per_cell.groupBy("probe_q").agg(
        F.sum("cell_est").cast("bigint").alias("est_rank")
    )


def qcm_quantile(counter_rows, q: float, n_total: int) -> float:
    """Driver-side quantile query over a COLLECTED counter table
    (<= 16384 (lvl, j, bucket, n) tuples — bounded by construction,
    the same driver-fetch contract as the Bloom bit set): binary
    search the smallest quantized value whose estimated rank >=
    ceil(q * n_total), then undo the fixed-point scale. Python md5
    replays the engine hash exactly (u32_hash contract)."""
    import hashlib
    import math

    counters = {}
    for lvl, j, bucket, n in counter_rows:
        counters[(int(lvl), int(j), int(bucket))] = int(n)

    def est_rank(xq: int) -> int:
        total = 0
        for lvl, cell in dyadic_prefix_cells(xq):
            reads = []
            for j in range(CM_DEPTH):
                h = hashlib.md5(
                    f"qcm{lvl}_{j}|{cell}".encode()
                ).hexdigest()[:8]
                reads.append(counters.get((lvl, j, int(h, 16) % CM_WIDTH), 0))
            total += min(reads)
        return total

    target = max(1, math.ceil(q * n_total))
    lo, hi = 0, (1 << QCM_LEVELS) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if est_rank(mid) >= target:
            hi = mid
        else:
            lo = mid + 1
    return lo / QCM_SCALE
