"""Driver-style value-hash sweep at an arbitrary scale directory.

Replays the round driver's correctness gate — for every contract query
in ``__spark_entry__.queries()`` with an ``oracle_sql()`` entry, run
the Spark DataFrame AND the DuckDB oracle over the same parquet tables
and compare rows / schema(column names) / a 6dp-rounded column-sorted
row-sorted md5. The driver only ever runs this at sf0.01; this script
exists to probe the scale-dependent failure class (ties, rounding,
overflow — the range-partition pin bug was one) at sf0.1 and the
synthetic sf1 built by scripts/sf1_scaling.py.

Usage: python scripts/value_sweep.py [sf_dir] [--out FILE]
       (default sf_dir /root/repo/testdata_sf1, out SWEEP.json beside it)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _cell(x):
    """Engine-neutral cell canonicalization: floats at 6dp (the
    driver's resolution), timestamps/dates as ISO strings, numpy
    scalars unwrapped."""
    import datetime

    import numpy as np
    import pandas as pd

    if isinstance(x, (np.floating, float)):
        v = round(float(x), 6)
        return 0.0 if v == 0 else v  # fold -0.0
    if isinstance(x, np.integer):
        return int(x)
    if isinstance(x, (pd.Timestamp, datetime.datetime, datetime.date)):
        return str(x)
    if x is None or x != x:  # NaN/None
        return None
    return x


def canon(pdf) -> tuple[list[str], list[tuple]]:
    cols = sorted(pdf.columns)
    pdf = pdf.reindex(cols, axis=1)
    rows = sorted(
        tuple(_cell(x) for x in row)
        for row in pdf.itertuples(index=False, name=None)
    )
    return cols, rows


def value_hash(rows) -> str:
    m = hashlib.md5()
    for r in rows:
        m.update(repr(r).encode())
    return m.hexdigest()


#: Relative tolerance for the float gate. Two engines summing the same
#: doubles in different orders diverge by O(n·eps) relative — observed
#: max 4e-12 across the sf1 sweep — while real defects (a wrong filter,
#: a dropped row, a 1e-7 approximation) sit many decades above. 1e-9
#: leaves ~3 decades of margin on each side.
FLOAT_RTOL = 1e-9
#: the hash's rounding quantum: contract queries round float outputs
#: at 6dp, so a value whose TRUE result sits exactly on a 5e-7
#: boundary splits the engines by exactly ONE quantum when their
#: accumulation noise lands on opposite sides (observed: quantized
#: synthetic event values make exact-boundary averages COMMON — 18 of
#: 3600 groups at sf10). Such a cell is information-theoretically
#: undecidable from rounded output, so it passes as a counted
#: BOUNDARY TIE — but only up to BOUNDARY_TIE_FRAC of a column's
#: rows, so a systematic one-quantum defect still fails.
ROUND_QUANTUM = 1e-6
BOUNDARY_TIE_FRAC = 0.02


def _adjudicate(sdf, odf, rtol: float = FLOAT_RTOL) -> dict:
    """Per-cell comparison of two same-shape frames (columns sorted by
    name; rows aligned by sorting on NON-float columns first so a
    last-ulp float difference can never mispair rows). Float cells
    pass on 6dp-absolute agreement (the hash's own resolution) OR
    relative agreement ``<= rtol`` OR an exactly-one-quantum boundary
    tie (capped — see BOUNDARY_TIE_FRAC); every other cell must match
    exactly (Spark None vs DuckDB NaN both read as NULL). Returns the
    machine-decidable verdict plus the worst divergence for the
    artifact."""
    import pandas as pd

    cols = sorted(sdf.columns)

    def is_float(c):
        return pd.api.types.is_float_dtype(
            sdf[c]
        ) or pd.api.types.is_float_dtype(odf[c])

    order = [c for c in cols if not is_float(c)] + [
        c for c in cols if is_float(c)
    ]
    s = sdf.reindex(cols, axis=1).sort_values(by=order, ignore_index=True)
    o = odf.reindex(cols, axis=1).sort_values(by=order, ignore_index=True)
    worst, worst_col, hard, gate_fail, ties = 0.0, None, 0, 0, 0
    n_rows = max(len(s), 1)
    tie_cap = max(1, int(BOUNDARY_TIE_FRAC * n_rows))
    for c in cols:
        g, w = s[c], o[c]
        if is_float(c):
            col_ties = 0
            for a, b in zip(g.astype(float), w.astype(float)):
                if a != b and not (a != a and b != b):
                    rel = abs(a - b) / max(abs(a), abs(b), 1e-300)
                    if rel > worst:
                        worst, worst_col = rel, c
                    if round(a, 6) == round(b, 6) or rel <= rtol:
                        continue
                    # one-quantum test up to the OPERANDS' representation
                    # error: a/b are 6dp-rounded decimals stored as
                    # doubles (±eps·|x| each; their subtraction is exact
                    # — Sterbenz), so |a−b| deviates from the decimal
                    # quantum by ≤ ~2·eps·|x|
                    tol = 8e-16 * max(abs(a), abs(b)) + 1e-18
                    if abs(abs(a - b) - ROUND_QUANTUM) <= tol:
                        col_ties += 1
                    else:
                        gate_fail += 1
            if col_ties > tie_cap:
                gate_fail += col_ties  # systematic, not ties
            else:
                ties += col_ties
        else:
            # None (Spark) vs NaN (DuckDB fetchdf) both mean NULL —
            # don't count representation skew as a mismatch
            both_null = g.isna() & w.isna()
            hard += int(((g != w) & ~both_null).sum())
    return {
        "max_float_rel_err": f"{worst:.2e}",
        "max_rel_err_col": worst_col,
        "non_float_mismatches": hard,
        "float_gate_fail_cells": gate_fail,
        "boundary_tie_cells": ties,
        "float_gate_pass": hard == 0 and gate_fail == 0,
    }


def _rec_ok(rec: dict) -> bool:
    """A sweep record's pass verdict — the same rule the loop applies,
    factored out so --resume can re-derive it from a prior artifact."""
    if rec.get("err") is not None:
        return False
    if rec.get("rows_only"):
        return rec.get("spark_rows", 0) > 0
    return bool(
        rec.get("rows_match")
        and rec.get("schema_match")
        and (rec.get("hash_match") or rec.get("float_gate_pass", False))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.path.join(_REPO, "testdata_sf1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--skip", default=None, help="comma-separated query names")
    ap.add_argument(
        "--sampled",
        default=None,
        help="comma-separated query names to run DIRECTLY on their"
        " SWEEP_SAMPLED twin, skipping the full spark+oracle attempt —"
        " for scales where even the full Spark side is"
        " all-pairs-infeasible (e.g. dedup_embedding_pairs at sf10)",
    )
    ap.add_argument(
        "--resume",
        action="store_true",
        help="load --out if it exists and SKIP queries already recorded"
        " as passing there (their records are kept in the merged"
        " artifact) — so one dead Spark session doesn't orphan the"
        " completed rows of a long sweep (round-10 lesson: SWEEP_SF100"
        " died at query 5/50 and lost 4 green rows to the retry file)",
    )
    ap.add_argument(
        "--oracle-timeout",
        type=float,
        default=900.0,
        help="per-oracle DuckDB budget in seconds (interrupted and"
        " recorded as an err, the sweep continues — a replay that"
        " doesn't scale is a finding, not a reason to lose the rest)",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir

    import duckdb

    import __spark_entry__ as entry
    from guagua_spark.session import get_spark

    spark = get_spark(
        app_name="value_sweep", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # bound the in-process oracle: DuckDB's default budget is ~80% of
    # RAM and shares the address space with the Spark driver JVM — the
    # round-11 sf100 run was OOM-killed at 76 GB anon RSS inside the
    # q4 oracle. A budget + disk spill keeps the replay alive (slower
    # is fine; the watchdog still bounds it). Overridable because the
    # right split depends on the Spark driver heap chosen for the run
    # ($SWEEP_DUCK_MEM, e.g. '56GB' for the q4 pagerank-edge build at
    # sf100, whose spill exceeds free disk at the default).
    con.execute(
        f"SET memory_limit='{os.environ.get('SWEEP_DUCK_MEM', '24GB')}'"
    )
    con.execute("SET preserve_insertion_order=false")
    _tmp = os.path.join(_REPO, ".duck_sweep_tmp")
    os.makedirs(_tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{_tmp}'")
    for t in TABLE_NAMES:
        # tolerate partial scale dirs (single-table decade rungs: the
        # sf100 embeddings-only twin run) — a query touching a missing
        # view fails with a clear binder error rather than up front
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
            )
        except Exception as e:  # noqa: BLE001
            print(f"view {t} unavailable: {type(e).__name__}", flush=True)

    import threading

    def run_oracle(sql: str):
        """Execute with a watchdog: past the budget the DuckDB query is
        interrupted (duckdb.InterruptException) so ONE unscalable
        replay can't eat the whole sweep."""
        timer = threading.Timer(args.oracle_timeout, con.interrupt)
        timer.start()
        try:
            return con.execute(sql).fetchdf()
        finally:
            timer.cancel()

    qs = entry.queries()
    oracles = entry.oracle_sql()
    sampled = entry.sweep_sampled() if hasattr(entry, "sweep_sampled") else {}
    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()
    direct = set(args.sampled.split(",")) if args.sampled else set()
    unknown_direct = direct - set(sampled)
    if unknown_direct:
        raise SystemExit(f"--sampled names without a twin: {unknown_direct}")
    results: dict = {}
    n_pass = n_fail = n_err = 0
    out = args.out or os.path.join(_REPO, "SWEEP.json")
    prior_pass: set = set()
    if args.resume and os.path.exists(out):
        with open(out) as f:
            prior = json.load(f)
        for pname, prec in prior.get("results", {}).items():
            if _rec_ok(prec):
                results[pname] = prec
                prior_pass.add(pname)
                n_pass += 1
        print(
            f"resume: kept {len(prior_pass)} passing rows from {out}",
            flush=True,
        )
    summary = {
        "sf_dir": sf_dir,
        "passed": n_pass,
        "failed": 0,
        "errors": 0,
        "total": len(results),
        "results": results,
    }
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            continue
        if name in prior_pass:
            continue
        rec: dict = {}
        use_fn, use_sql = fn, oracles.get(name)
        if name in direct:
            use_fn, use_sql, rule = sampled[name]
            rec["oracle_sampled"] = True
            rec["sampled_direct"] = True
            rec["sample_rule"] = rule
        try:
            t0 = time.monotonic()
            sdf = use_fn(spark, sf_dir).toPandas()
            rec["spark_secs"] = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            if use_sql is not None:
                try:
                    odf = run_oracle(use_sql)
                except duckdb.InterruptException:
                    if name not in sampled or name in direct:
                        raise  # no twin, or the twin itself timed out
                    # the full replay is infeasible at this sf (e.g.
                    # the O(n²) PPJoin validator at 50k docs) — certify
                    # the SAME operator interior on the deterministic
                    # md5-selected subset instead; the rule is recorded
                    # in the artifact so the rung is auditable.
                    sfn, ssql, rule = sampled[name]
                    rec["oracle_sampled"] = True
                    rec["sample_rule"] = rule
                    rec["full_oracle_timeout_secs"] = round(
                        time.monotonic() - t0, 2
                    )
                    sdf = sfn(spark, sf_dir).toPandas()
                    t0 = time.monotonic()
                    odf = run_oracle(ssql)
                rec["oracle_secs"] = round(time.monotonic() - t0, 2)
                scols, srows = canon(sdf)
                ocols, orows = canon(odf)
                rec.update(
                    rows_match=len(srows) == len(orows),
                    schema_match=scols == ocols,
                    hash_match=value_hash(srows) == value_hash(orows),
                    spark_rows=len(srows),
                    oracle_rows=len(orows),
                )
                if not rec["hash_match"] and rec["rows_match"]:
                    # float gate: a 6dp-ABSOLUTE hash demands ~1e-16
                    # relative agreement once float magnitudes reach
                    # 1e10 — below double accumulation noise. Re-check
                    # per cell: float cells pass on (6dp-absolute OR
                    # rel<=FLOAT_RTOL), everything else strict. A row
                    # passes the sweep iff the gate says so — no hand
                    # adjudication; the worst divergence is recorded
                    # for the artifact either way.
                    rec.update(_adjudicate(sdf, odf))
                ok = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and (rec["hash_match"] or rec.get("float_gate_pass", False))
                )
            else:
                # rows-only (no oracle): the driver's weaker check —
                # ran without error AND produced rows (every contract
                # query yields >0 rows at every sf)
                rec.update(rows_only=True, spark_rows=len(sdf))
                ok = len(sdf) > 0
            rec["err"] = None
        except Exception as e:  # noqa: BLE001 — sweep must finish
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
            ok = False
            n_err += 1
        results[name] = rec
        n_pass += ok
        n_fail += (not ok) and rec["err"] is None
        print(name, "OK" if ok else "FAIL", json.dumps(rec)[:200], flush=True)
        summary = {
            "sf_dir": sf_dir,
            "passed": n_pass,
            "failed": n_fail,
            "errors": n_err,
            "total": len(results),
            "results": results,
        }
        # incremental write: a killed/timed-out sweep keeps everything
        # completed so far
        with open(out, "w") as f:
            json.dump(summary, f, indent=1)
            f.write("\n")
    print(
        json.dumps(
            {k: summary[k] for k in ("passed", "failed", "errors", "total")}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
