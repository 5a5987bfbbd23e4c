"""Feature-engineering statistics: equal-frequency binning, weight of
evidence (WOE), information value (IV), and Kolmogorov–Smirnov (KS).

The reference engine exists to power exactly this workload in its
parent project — "Guagua, a sub-project of Shifu"
(/root/reference/README.md:20) — where per-feature binning/WOE/KS/IV
statistics over the training table are the preprocessing step before
the NN/LR training the engine runs. Spark-first, the whole family is
two partial-aggregated passes, no iteration needed:

1. boundaries: EXACT equal-frequency bin edges via `percentile` over
   the (2-decimal) feature — the aggregation state is one count per
   distinct value, bounded by the feature's precision, so the exact
   form scales (same argument as inference.infer_deciles; swap in
   approx_percentile for truly continuous unbounded features).
2. per-bin (n, n_pos) partial-aggregated groupBy — bucket assignment
   is a map-side `Σ (x > bᵢ)` against B−1 plan literals.
3. WOE/IV/KS fold over the B-row bin table: window cumulative sums over
   a BOUNDED relation (B rows by construction — this is the documented
   exception to the no-global-window rule: the windowed relation is
   model-sized, not data-sized).

Laplace smoothing (+0.5 per bin cell, +0.5·B per class total) keeps
WOE finite on empty-class bins; both sides of every oracle use the
identical smoothed formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from guagua_spark.sources.tables import load_table

N_BINS = 10
# no rounding: round(1/16, 2) = 0.06 would silently break the
# equal-frequency guarantee for bin counts whose reciprocal needs more
# precision; both engines accept full-precision fractions
_QS = [i / N_BINS for i in range(1, N_BINS)]


#: session memo for percentile boundary jobs, keyed (sf_dir, slice
#: key) → (lineitem fingerprint, {col: bounds}) — the _KMEANS_INIT_CACHE
#: pattern: bounds are a pure function of the static table, but the
#: family re-ran the expensive exact-percentile scan once per operator
#: call (woe_bins, iv_ks ×2 features, psi, the cert build = 4+ scans
#: per session). One fused job computes every feature's boundary array
#: at once (independent aggregates — identical values to separate
#: jobs); repeats replay driver-held literals. Build cost self-reports
#: as ``_index:feature_bounds:*``; clear_caches() drops everything.
_BOUNDS_CACHE: dict = {}

#: the binning features whose bounds the fused job computes together
_BINNED_FEATURES = ("l_extendedprice", "l_quantity")


def clear_caches() -> None:
    _BOUNDS_CACHE.clear()


def _cached_bounds(
    spark: SparkSession, sf_dir: str, key: str, cols, build_df
) -> dict:
    from guagua_spark.sources.tables import table_fingerprint

    fp = table_fingerprint(sf_dir, "lineitem")
    hit = _BOUNDS_CACHE.get((sf_dir, key))
    if hit is not None and hit[0] == fp:
        return hit[1]
    import time as _time

    from guagua_spark.metrics import record_index_build

    t0 = _time.monotonic()
    qs = ", ".join(str(q) for q in _QS)
    row = build_df().select(
        *[
            F.expr(f"percentile({c}, array({qs}))").alias(c)
            for c in cols
        ]
    ).first()
    out = {c: [float(v) for v in row[c]] for c in cols}
    record_index_build(f"feature_bounds:{key}", _time.monotonic() - t0)
    _BOUNDS_CACHE[(sf_dir, key)] = (fp, out)
    return out


def _binned(
    spark: SparkSession, sf_dir: str, feature: str
) -> DataFrame:
    """(bin, n, n_pos) for the feature over lineitem with label
    l_returnflag == 'R' — boundaries from exact percentiles (fused +
    memoized per session, see _cached_bounds), bucket assignment
    map-side."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col(feature).alias("x"),
        (F.col("l_returnflag") == "R").cast("bigint").alias("y"),
    )
    bounds = _cached_bounds(
        spark,
        sf_dir,
        "lineitem",
        _BINNED_FEATURES,
        lambda: load_table(spark, sf_dir, "lineitem"),
    )[feature]
    return li.groupBy(bucket_col(bounds, "x").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos")
    )


def frozen_bounds(df: DataFrame, col: str) -> list[float]:
    """The B−1 exact interior-percentile boundaries of ``col`` — the
    SINGLE definition of the binning rule, shared by _binned,
    feature_psi, the streaming PSI monitor, and their tests (a drift
    between any two of those would silently change what 'bin' means).
    One O(1)-result driver job."""
    qs = ", ".join(str(q) for q in _QS)
    row = df.select(
        F.expr(f"percentile({col}, array({qs}))").alias("b")
    ).first()
    return [float(v) for v in row["b"]]


def bucket_col(bounds: list[float], col: str):
    """Map-side bin assignment `Σ (col > bᵢ)` against the frozen
    boundary literals — the shared other half of the binning rule."""
    b = F.lit(0)
    for v in bounds:
        b = b + (F.col(col) > F.lit(float(v))).cast("int")
    return b


def _woe_cols():
    """Smoothed WOE/IV-term expressions over a bin row carrying
    (n, n_pos) plus window totals (pos_tot, neg_tot, n_bins)."""
    pos_i = F.col("n_pos") + F.lit(0.5)
    neg_i = (F.col("n") - F.col("n_pos")) + F.lit(0.5)
    pos_t = F.col("pos_tot") + F.lit(0.5) * F.col("n_bins")
    neg_t = F.col("neg_tot") + F.lit(0.5) * F.col("n_bins")
    pr, nr = pos_i / pos_t, neg_i / neg_t
    woe = F.log(pr / nr)
    return woe, (pr - nr) * woe


def _woe_from_bins(bins: DataFrame) -> DataFrame:
    """Per-bin WOE table from a (bin, n, n_pos) relation."""
    w = Window.partitionBy()  # B rows total — bounded, see module doc
    withtot = bins.select(
        "bin",
        "n",
        "n_pos",
        F.sum("n_pos").over(w).alias("pos_tot"),
        F.sum(F.col("n") - F.col("n_pos")).over(w).alias("neg_tot"),
        F.count(F.lit(1)).over(w).alias("n_bins"),
    )
    woe, _ = _woe_cols()
    return withtot.select(
        "bin",
        "n",
        "n_pos",
        (F.col("n_pos") / F.col("n")).alias("pos_rate"),
        woe.alias("woe"),
    ).orderBy("bin")


def _iv_ks_from_bins(bins: DataFrame, feature: str) -> DataFrame:
    """1-row (feature, iv, ks) from a (bin, n, n_pos) relation."""
    w = Window.partitionBy()  # B rows — bounded
    wo = Window.partitionBy().orderBy("bin")  # same B rows
    withtot = bins.select(
        "bin",
        "n",
        "n_pos",
        F.sum("n_pos").over(w).alias("pos_tot"),
        F.sum(F.col("n") - F.col("n_pos")).over(w).alias("neg_tot"),
        F.count(F.lit(1)).over(w).alias("n_bins"),
        F.sum("n_pos").over(wo).alias("cum_pos"),
        F.sum(F.col("n") - F.col("n_pos")).over(wo).alias("cum_neg"),
    )
    _, iv_term = _woe_cols()
    ks_term = F.abs(
        F.col("cum_pos") / F.col("pos_tot")
        - F.col("cum_neg") / F.col("neg_tot")
    )
    return withtot.agg(
        F.sum(iv_term).alias("iv"), F.max(ks_term).alias("ks")
    ).select(F.lit(feature).alias("feature"), "iv", "ks")


def feature_woe_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin WOE table for l_extendedprice (B equal-frequency bins):
    bin, n, n_pos, pos_rate, woe. The bin relation is B rows, so the
    totals window is bounded-by-construction."""
    return _woe_from_bins(_binned(spark, sf_dir, "l_extendedprice"))


def feature_iv_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per feature: information value (Σ smoothed IV terms)
    and KS (max |cum pos share − cum neg share| over the ordered
    bins) for l_extendedprice and l_quantity."""
    out = None
    for feature in ("l_extendedprice", "l_quantity"):
        row = _iv_ks_from_bins(_binned(spark, sf_dir, feature), feature)
        out = row if out is None else out.unionByName(row)
    return out.orderBy("feature")


def _bin_ctes(feature: str) -> str:
    qs = ", ".join(str(q) for q in _QS)
    bucket = " + ".join(
        f"(CASE WHEN x > q[{i + 1}] THEN 1 ELSE 0 END)"
        for i in range(N_BINS - 1)
    )
    return f"""li AS (
  SELECT {feature} AS x,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem
),
qb AS (SELECT quantile_cont(x, [{qs}]) AS q FROM li),
bins AS (
  SELECT {bucket} AS bin, COUNT(*) AS n, SUM(y) AS n_pos
  FROM li, qb GROUP BY 1
),
tot AS (
  SELECT SUM(n_pos) AS pos_tot, SUM(n - n_pos) AS neg_tot,
         COUNT(*) AS n_bins
  FROM bins
)"""


_WOE_SQL = (
    "LN(((n_pos + 0.5)/(pos_tot + 0.5*n_bins)) /"
    " (((n - n_pos) + 0.5)/(neg_tot + 0.5*n_bins)))"
)
_IV_TERM_SQL = (
    "(((n_pos + 0.5)/(pos_tot + 0.5*n_bins)) -"
    " (((n - n_pos) + 0.5)/(neg_tot + 0.5*n_bins))) * " + _WOE_SQL
)


def _woe_bins_oracle() -> str:
    return f"""
WITH {_bin_ctes('l_extendedprice')}
SELECT bin, n, n_pos,
       CAST(n_pos AS DOUBLE) / n AS pos_rate,
       {_WOE_SQL} AS woe
FROM bins, tot ORDER BY bin
""".strip()


def _iv_ks_oracle() -> str:
    parts = []
    for feature in ("l_extendedprice", "l_quantity"):
        parts.append(
            f"""(
WITH {_bin_ctes(feature)},
c AS (
  SELECT bin, n, n_pos, pos_tot, neg_tot, n_bins,
         SUM(n_pos) OVER (ORDER BY bin) AS cum_pos,
         SUM(n - n_pos) OVER (ORDER BY bin) AS cum_neg
  FROM bins, tot
)
SELECT '{feature}' AS feature,
       SUM({_IV_TERM_SQL}) AS iv,
       MAX(ABS(CAST(cum_pos AS DOUBLE)/pos_tot
               - CAST(cum_neg AS DOUBLE)/neg_tot)) AS ks
FROM c
)"""
        )
    return (" UNION ALL ".join(parts) + " ORDER BY feature").strip()


#: PSI split: "expected" = first half of the order stream, "actual" =
#: second half — the train-vs-out-of-time shape, deterministic from
#: the key so both engines cut identically
PSI_SPLIT_SQL = "l_orderkey % 2 = 0"


def feature_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index: how far the feature's distribution
    drifted between an expected (reference/train) slice and an actual
    (monitoring/out-of-time) slice — the model-monitoring companion of
    WOE/IV (drift > 0.25 conventionally means re-train).

    PSI = Σ_bins (a_i − e_i)·ln(a_i/e_i) over the SHARED bin edges
    computed from the expected slice only (monitoring never re-bins),
    with the same +0.5 Laplace smoothing as WOE so empty bins stay
    finite. Both population passes are map-side bucket assignment +
    one partial-agg exchange; the expected-slice percentile scan is
    the same bounded-state aggregate as _binned's."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x"),
        (F.col("l_orderkey") % 2 == 0).alias("is_exp"),
    )
    bounds = _cached_bounds(
        spark, sf_dir, "psi_expected", ("x",),
        lambda: li.filter("is_exp"),
    )["x"]
    bins = li.groupBy(bucket_col(bounds, "x").alias("bin")).agg(
        F.sum(F.col("is_exp").cast("bigint")).alias("n_exp"),
        F.sum((~F.col("is_exp")).cast("bigint")).alias("n_act"),
    )
    w = Window.partitionBy()  # ≤ N_BINS rows — bounded
    rates = bins.select(
        "bin",
        (
            (F.col("n_exp") + F.lit(0.5))
            / (F.sum("n_exp").over(w) + F.lit(0.5) * F.count(F.lit(1)).over(w))
        ).alias("e"),
        (
            (F.col("n_act") + F.lit(0.5))
            / (F.sum("n_act").over(w) + F.lit(0.5) * F.count(F.lit(1)).over(w))
        ).alias("a"),
    )
    return rates.agg(
        F.sum((F.col("a") - F.col("e")) * F.log(F.col("a") / F.col("e"))).alias(
            "psi"
        ),
        F.count(F.lit(1)).alias("n_bins"),
    )


def _psi_oracle() -> str:
    qs = ", ".join(str(q) for q in _QS)
    bucket = " + ".join(
        f"(CASE WHEN x > q[{i + 1}] THEN 1 ELSE 0 END)"
        for i in range(N_BINS - 1)
    )
    return f"""
WITH li AS (
  SELECT l_extendedprice AS x, ({PSI_SPLIT_SQL}) AS is_exp FROM lineitem
),
qb AS (SELECT quantile_cont(x, [{qs}]) AS q FROM li WHERE is_exp),
bins AS (
  SELECT {bucket} AS bin,
         SUM(CASE WHEN is_exp THEN 1 ELSE 0 END) AS n_exp,
         SUM(CASE WHEN is_exp THEN 0 ELSE 1 END) AS n_act
  FROM li, qb GROUP BY 1
),
tot AS (
  SELECT SUM(n_exp) AS te, SUM(n_act) AS ta, COUNT(*) AS nb FROM bins
),
rates AS (
  SELECT (n_exp + 0.5)/(te + 0.5*nb) AS e,
         (n_act + 0.5)/(ta + 0.5*nb) AS a
  FROM bins, tot
)
SELECT SUM((a - e) * LN(a / e)) AS psi, COUNT(*) AS n_bins FROM rates
""".strip()


#: the numeric feature set for the correlation matrix
CORR_FEATURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def feature_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over the numeric feature set —
    collinearity screening before model training (Shifu drops one of
    each highly-correlated pair). ONE scan: every pair's corr is a
    decomposable central-moment aggregate, so all C(k,2) cells compute
    in a single partial-aggregated pass; the 1×C(k,2) result row is
    unpivoted to (feat_a, feat_b, corr) rows with a stack expression.
    k is model-sized (a feature list), so the single combined row is
    bounded however large the table."""
    li = load_table(spark, sf_dir, "lineitem").select(*CORR_FEATURES)
    pairs = [
        (a, b)
        for i, a in enumerate(CORR_FEATURES)
        for b in CORR_FEATURES[i + 1 :]
    ]
    wide = li.agg(
        *[F.corr(a, b).alias(f"c_{a}_{b}") for a, b in pairs]
    )
    stack = ", ".join(
        f"'{a}', '{b}', c_{a}_{b}" for a, b in pairs
    )
    return wide.select(
        F.expr(
            f"stack({len(pairs)}, {stack}) AS (feat_a, feat_b, corr)"
        )
    ).orderBy("feat_a", "feat_b")


def _correlation_oracle() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(CORR_FEATURES)
        for b in CORR_FEATURES[i + 1 :]
    ]
    selects = " UNION ALL ".join(
        f"SELECT '{a}' AS feat_a, '{b}' AS feat_b, corr({a}, {b}) AS corr"
        " FROM lineitem"
        for a, b in pairs
    )
    return f"{selects} ORDER BY feat_a, feat_b"


def feature_cert_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row certificate of the whole feature-stats family, built from
    the ACTUAL operators' outputs (round 6): bin-weighted WOE sum
    (binds which bin got which WOE), IV and KS sums over both
    features, PSI, and the correlation-matrix sum. Cross-joined into
    q2_partial_agg (relational.py) so a green contract row
    hash-certifies this module inside the 50-slot cap."""
    # ONE bin pass for l_extendedprice feeds both WOE and IV/KS (the
    # boundaries job and the bin groupBy would otherwise run twice)
    bins_ep = _binned(spark, sf_dir, "l_extendedprice")
    woe = _woe_from_bins(bins_ep).agg(
        F.round(F.sum((F.col("bin") + 1) * F.col("woe")), 6).alias(
            "ftr_woe_wsum"
        )
    )
    ivks = (
        _iv_ks_from_bins(bins_ep, "l_extendedprice")
        .unionByName(
            _iv_ks_from_bins(
                _binned(spark, sf_dir, "l_quantity"), "l_quantity"
            )
        )
        .agg(
            F.round(F.sum("iv"), 6).alias("ftr_iv_sum"),
            F.round(F.sum("ks"), 6).alias("ftr_ks_sum"),
        )
    )
    psi = feature_psi(spark, sf_dir).select(
        F.round("psi", 6).alias("ftr_psi")
    )
    corr = feature_correlation(spark, sf_dir).agg(
        F.round(F.sum("corr"), 6).alias("ftr_corr_sum")
    )
    return woe.crossJoin(ivks).crossJoin(psi).crossJoin(corr)


def sql_feature_cert_ctes() -> str:
    """CTE block ending in ``ftr_cert`` — wraps this module's
    standalone oracles verbatim as derived tables, so the host row's
    hash certifies exactly the math they define."""
    return f"""fw AS (
  SELECT ROUND(SUM((bin + 1) * woe), 6) AS ftr_woe_wsum
  FROM ({_woe_bins_oracle()})
),
fik AS (
  SELECT ROUND(SUM(iv), 6) AS ftr_iv_sum, ROUND(SUM(ks), 6) AS ftr_ks_sum
  FROM ({_iv_ks_oracle()})
),
fp AS (SELECT ROUND(psi, 6) AS ftr_psi FROM ({_psi_oracle()})),
fc AS (
  SELECT ROUND(SUM(corr), 6) AS ftr_corr_sum
  FROM ({_correlation_oracle()})
),
ftr_cert AS (SELECT * FROM fw, fik, fp, fc)"""


#: oracle-tested locally (tests/test_features.py); 50-slot contract full
LOCAL_QUERIES = {
    "feature_woe_bins": feature_woe_bins,
    "feature_iv_ks": feature_iv_ks,
    "feature_psi": feature_psi,
    "feature_correlation": feature_correlation,
}
LOCAL_ORACLE_SQL = {
    "feature_woe_bins": _woe_bins_oracle(),
    "feature_iv_ks": _iv_ks_oracle(),
    "feature_psi": _psi_oracle(),
    "feature_correlation": _correlation_oracle(),
}
