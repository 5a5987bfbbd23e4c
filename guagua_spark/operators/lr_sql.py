"""Shared LR-family oracle SQL — a LEAF module (imports nothing from
the operator modules) so both iterative.py (which builds lr_train's
contract oracle at import time) and inference.py (which splices the
same CTEs into its standalone oracles) can use one set of strings
without a circular import."""

from __future__ import annotations

#: decile boundaries: exact interior percentiles 0.1 .. 0.9
DECILE_QS = [round(0.1 * i, 1) for i in range(1, 10)]


def lr_train_it_cte(source: str = "lineitem") -> str:
    """The 5-step LR training loop as the body of a recursive CTE named
    ``it`` — shared verbatim between lr_train's hash-certified oracle
    and the inference oracles, so the weights the scoring oracles
    replay are bit-identical to the certified ones.

    Mirrors the engine exactly (gradient.py GradientDescentMaster):
    err = sigmoid(w·x) − y per row, then w ← w − lr·Σ(err·x)/n and
    loss = Σerr²/n, iterated 5 times from w = 0⃗.  The anchor must be
    CAST AS DOUBLE or DuckDB types the whole CTE DECIMAL(2,1).
    """
    lr = 0.5
    return f"""it AS (
  SELECT 0 AS i, CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
         CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS loss
  UNION ALL
  SELECT i + 1,
         w0 - {lr} * SUM(err) / COUNT(*),
         w1 - {lr} * SUM(err * l_quantity) / COUNT(*),
         w2 - {lr} * SUM(err * l_discount) / COUNT(*),
         SUM(err * err) / COUNT(*)
  FROM (
    SELECT i, w0, w1, w2,
           1.0/(1.0 + EXP(-(w0 + w1*l_quantity + w2*l_discount)))
             - (CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) AS err,
           l_quantity, l_discount
    FROM it, {source}
    WHERE i < 5
  ) s
  GROUP BY i, w0, w1, w2
)""".strip()


def scored_ctes() -> str:
    """CTE body (``it`` → ``w`` → ``sc``, no WITH prefix) replaying
    training + 6dp rounding + scoring — spliceable into any oracle
    that needs the scored relation."""
    return f"""{lr_train_it_cte()},
w AS (
  SELECT ROUND(w0, 6) AS w0, ROUND(w1, 6) AS w1, ROUND(w2, 6) AS w2
  FROM it WHERE i = 5
),
sc AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS label,
         ROUND(1.0/(1.0 + EXP(-(w0 + w1*l_quantity + w2*l_discount))), 6)
           AS score
  FROM lineitem, w
)""".strip()


def auc_rank_ctes(prefix: str = "", src: str = "sc") -> str:
    """The tie-averaged rank CTEs over ``src`` — {p}g (per-score
    groups) → {p}o (running counts) → {p}t (rank-sum totals). ONE
    definition shared by inference's standalone AUC oracle (prefix "",
    src "sc") and the lr_train certificate splice (prefix "ic", src
    "sc_cert" — the libm-free rational rescore), so the two can
    never certify different math."""
    g, o, t = f"{prefix}g", f"{prefix}o", f"{prefix}t"
    return f"""{g} AS (
  SELECT score, COUNT(*) AS n, SUM(CAST(label AS BIGINT)) AS np
  FROM {src} GROUP BY score
),
{o} AS (
  SELECT np, n, SUM(n) OVER (ORDER BY score) AS cum FROM {g}
),
{t} AS (
  SELECT SUM(np * (cum - n + (n + 1)/2.0)) AS spr,
         SUM(np) AS p, SUM(n) AS tot
  FROM {o}
)"""


#: the final AUC expression over the rank-sum totals CTE
AUC_EXPR = "(spr - p*(p+1)/2.0) / (p * (tot - p))"


def decile_bucket_sql(qref: str) -> str:
    """The decile bucket fold `Σ (score > q[i])` given a quantile-array
    reference — shared by inference's decile oracle (``q``) and the
    certificate splice (``icq.q``)."""
    return " + ".join(
        f"(CASE WHEN score > {qref}[{i + 1}] THEN 1 ELSE 0 END)"
        for i in range(len(DECILE_QS))
    )


# -- fixed literal models for the ARRAY / NN-forward certificates ----------
#
# Deterministic small rationals generated ONCE here (the leaf module)
# and rendered into BOTH the Catalyst expressions (inference.py) and
# the SQL below — the same shared-literal discipline as LR_WEIGHTS in
# the lr_gradient_step certification. Fixed weights are what make the
# forward-pass PLUMBING SQL-replayable: the engine-trained weights
# exist only after a run, so they stay numpy-replay-tested instead.

#: 64-dim logistic model over the embedding column
EMB_DIM = 64
EMB_WEIGHTS = [((i * 37) % 101 - 50) / 100.0 for i in range(EMB_DIM)]
EMB_BIAS = -0.05

#: [4, 8, 1] net over the engineered lineitem features (same layout as
#: iterative.NN_GD_LAYERS); magnitudes ≤ ~1 keep the sigmoids off
#: their saturated tails so the certificate actually exercises the
#: arithmetic
NNF_LAYERS = (4, 8, 1)
NNF_W1 = [
    [(((i * 8 + j) * 7) % 23 - 11) / 20.0 for j in range(8)]
    for i in range(4)
]
NNF_B1 = [((j * 5) % 13 - 6) / 10.0 for j in range(8)]
NNF_W2 = [((j * 11) % 17 - 8) / 12.0 for j in range(8)]
NNF_B2 = 0.05

#: the engineered-feature expressions (iterative._nn_features' SQL
#: twin, identical to the nn_train_gd oracle's feats CTE)
NN_FEATURE_SQL = (
    "l_quantity/50.0",
    "l_discount*10.0",
    "l_extendedprice/100000.0",
    "l_tax*10.0",
)


def _rational_sigmoid_sql(z: str) -> str:
    """σ̃(z) = 0.5 + 0.5·z/(1+|z|) — the libm-free logistic surrogate
    (same range, same 0.5 threshold at z=0, monotone). Pure IEEE
    +−×÷/abs, so both engines produce the SAME double bit-for-bit at
    any scale; the parenthesization mirrors the Catalyst tree
    (0.5 + ((0.5·z)/(1+abs(z))))."""
    return f"(0.5 + (0.5*({z}))/(1.0 + ABS({z})))"


def scored_rational_cte() -> str:
    """``sc_cert`` CTE (expects ``w`` in scope, i.e. spliced after
    scored_ctes): the SAME 6dp-rounded trained weights rescored with
    the rational surrogate σ̃ — pure IEEE +−×÷/abs, so every per-row
    score is bit-exact across engines at any scale. This is the
    relation the inf_* certificates aggregate; the real-sigmoid ``sc``
    stays for the production operators and their rtol oracles."""
    z = "(w0 + w1*l_quantity + w2*l_discount)"
    return f"""sc_cert AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS label,
         ROUND({_rational_sigmoid_sql(z)}, 6) AS score
  FROM lineitem, w
)""".strip()


def emb_score_sql() -> str:
    """Per-row 6dp rational-logistic score over the embeddings table —
    the SQL twin of inference._emb_score_col(activation="rational")
    (list_dot_product folds left-to-right like F.aggregate)."""
    lits = ", ".join(repr(x) for x in EMB_WEIGHTS)
    z = (
        f"{EMB_BIAS!r} + list_dot_product("
        f"CAST(embedding AS DOUBLE[]), [{lits}])"
    )
    return f"ROUND({_rational_sigmoid_sql(z)}, 6)"


def nnf_score_sql() -> str:
    """Per-row 6dp forward-pass score of the fixed [4,8,1] net over
    lineitem — the SQL twin of nn_score_col(nnf_fixed_weights(),
    activation="rational"): every weight a literal, each hidden unit
    one rational-sigmoid-of-affine, rendered from the SAME Python
    lists the Catalyst side uses."""
    hs = []
    for j in range(8):
        z = f"{NNF_B1[j]!r}" + "".join(
            f" + {NNF_W1[i][j]!r}*({NN_FEATURE_SQL[i]})" for i in range(4)
        )
        hs.append(_rational_sigmoid_sql(z))
    out = f"{NNF_B2!r}" + "".join(
        f" + {NNF_W2[j]!r}*{hs[j]}" for j in range(8)
    )
    return f"ROUND({_rational_sigmoid_sql(out)}, 6)"


def sql_inference_cert_ctes() -> str:
    """CTE block (expects ``sc`` in scope, i.e. spliced after
    scored_ctes) ending in ``inf_cert`` — the 1-row certificate of the
    whole inference family: tie-aware AUC (round 6), the 0.5-threshold
    decision count, the Σ(per-row decile) rollup that binds the decile
    assignment, and (round 7) the array-scoring and NN-forward
    certificates — per-row 6dp scores summed at 1e-6 resolution
    (exact: a 6dp-rounded double times 1e6 re-rounds to the same
    integer on both engines) plus their 0.5-threshold counts. Spliced
    into lr_train's contract oracle.

    Round 9 moved emb_score_e6/nnf_score_e6 (and text.py's
    bm_score_e6) to the RATIONAL surrogate σ̃ (_rational_sigmoid_sql) —
    libm-free, so the N-row Σ round(score·1e6) certificates are
    bit-exact by construction at ANY scale (the former exp/ln last-ulp
    exposure grew as ~N·2e-10 flips per sweep). Round 10 finished the
    job: the trained-LR certificate columns (inf_auc / inf_flagged /
    inf_dec_nwsum) now aggregate ``sc_cert`` — the SAME hash-certified
    6dp weights rescored with σ̃ — so NO per-row libm call feeds any
    hash-certified aggregate. The real-sigmoid ``sc`` operators keep
    their own rtol-gated local oracles. The only remaining EXP is
    inside the training replay itself, where the exposure is
    aggregate-level (weights rounded to 6dp AFTER the Σ over rows),
    not per-row — exactly the exposure lr_train has certified green
    since round 2."""
    qs = ", ".join(str(q) for q in DECILE_QS)
    return f"""{scored_rational_cte()},
{auc_rank_ctes("ic", "sc_cert")},
icq AS (SELECT quantile_cont(score, [{qs}]) AS q FROM sc_cert),
emb_sc AS (SELECT {emb_score_sql()} AS score FROM embeddings),
nnf_sc AS (SELECT {nnf_score_sql()} AS score FROM lineitem),
inf_cert AS (
  SELECT (SELECT ROUND({AUC_EXPR}, 6)
          FROM ict) AS inf_auc,
         (SELECT CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)
                      AS BIGINT) FROM sc_cert) AS inf_flagged,
         (SELECT CAST(SUM({decile_bucket_sql("icq.q")}) AS BIGINT)
          FROM sc_cert, icq) AS inf_dec_nwsum,
         (SELECT CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)
                      AS BIGINT) FROM emb_sc) AS emb_flagged,
         (SELECT CAST(SUM(CAST(ROUND(score * 1e6) AS BIGINT)) AS BIGINT)
          FROM emb_sc) AS emb_score_e6,
         (SELECT CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)
                      AS BIGINT) FROM nnf_sc) AS nnf_flagged,
         (SELECT CAST(SUM(CAST(ROUND(score * 1e6) AS BIGINT)) AS BIGINT)
          FROM nnf_sc) AS nnf_score_e6
)"""
