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


def _adjudicate(sdf, odf) -> dict:
    """Max relative float divergence + non-float mismatch count between
    two same-shape frames (columns sorted by name, rows sorted)."""
    import pandas as pd

    cols = sorted(sdf.columns)
    s = sdf.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
    o = odf.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
    worst, worst_col, hard = 0.0, None, 0
    for c in cols:
        g, w = s[c], o[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for a, b in zip(g.astype(float), w.astype(float)):
                if a != b and not (a != a and b != b):
                    rel = abs(a - b) / max(abs(a), abs(b), 1e-300)
                    if rel > worst:
                        worst, worst_col = rel, c
        else:
            # None (Spark) vs NaN (DuckDB fetchdf) both mean NULL —
            # don't count representation skew as a mismatch
            both_null = g.isna() & w.isna()
            hard += int(((g != w) & ~both_null).sum())
    return {
        "max_float_rel_err": f"{worst:.2e}",
        "max_rel_err_col": worst_col,
        "non_float_mismatches": hard,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.path.join(_REPO, "testdata_sf1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--skip", default=None, help="comma-separated query names")
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
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )

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
    only = set(args.only.split(",")) if args.only else None
    skip = set(args.skip.split(",")) if args.skip else set()
    results: dict = {}
    n_pass = n_fail = n_err = 0
    out = args.out or os.path.join(_REPO, "SWEEP.json")
    summary = {
        "sf_dir": sf_dir,
        "passed": 0,
        "failed": 0,
        "errors": 0,
        "total": 0,
        "results": results,
    }
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            continue
        rec: dict = {}
        try:
            t0 = time.monotonic()
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_secs"] = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            if name in oracles:
                odf = run_oracle(oracles[name])
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
                    # adjudicate: a 6dp-ABSOLUTE hash gate demands
                    # ~1e-16 relative agreement once float magnitudes
                    # reach 1e10 — below double accumulation noise.
                    # Record the max relative float divergence and any
                    # non-float (real) mismatches so the artifact
                    # separates gate-resolution physics from bugs.
                    rec.update(_adjudicate(sdf, odf))
                ok = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and rec["hash_match"]
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
