"""sf1000 probe for the three cheapest sketch/certificate contract rows
(round-10 verdict #8 stretch): events_windowed_agg (hll_*),
events_histogram (qcm_*), text_tfidf_top_terms's fi_*/cm_* hosts ride
documents — the sketch families claim BOUNDED-BY-CONSTRUCTION state
(1024 HLL registers, 16384 dyadic-CM cells, ≤(c+1)·P Misra-Gries
candidates), so one decade further costs little for constant-exchange
queries and catches the next magnitude class (the sf100 lesson: each
decade found exactly one).

Generates ONLY the events + documents tables at 10000× sf0.1 (~26 GB
— a full sf1000 deck would be ~140 GB) with the same key-shift
replication scheme as sf1_scaling.generate, runs the driver-style
value compare for the three rows, and writes SWEEP_SF1000_SKETCH.json.

The tfidf row is compared via its SUBSET TWIN (15M output rows per
decade is past the row-hash compare — same rule as the sf100 sweep);
its fi_*/cm_* certificates are sketch-certified by the FULL row at
sf<=10. histogram/windowed_agg outputs are domain-bounded (types ×
buckets / types × days) so the full rows run.

Usage: python scripts/sf1000_sketch_probe.py [--skip-gen]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(_REPO, "testdata_sf1000_sketch")
REPLICAS = 10_000

#: the probe rows: (name, use_sampled_twin). Round 12 additions: the
#: qcm build's 64x-per-event fan is gone (pre-aggregated on the 2^16
#: quantized domain, sketch.py), unblocking events_histogram, and the
#: remaining two constant-exchange sketch hosts (events_funnel's aov_*
#: registers, events_retention's blm_* bits) join the rung — the probe
#: writes the artifact incrementally after each row
PROBE = [
    ("events_windowed_agg", False),
    ("text_tfidf_top_terms", True),
    ("events_histogram", False),
    ("events_funnel", False),
    ("events_retention", False),
]


def generate() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='48GB'")
    tmp = os.path.join(DST, "_duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    # same offsets as sf1_scaling.OFFSETS — assert no collision
    for table, col, off in (
        ("events", "event_id", 100000),
        ("events", "user_id", 2000),
        ("documents", "doc_id", 5000),
    ):
        (mx,) = con.execute(
            f"SELECT MAX({col}) FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()
        if mx is None or mx >= off:
            raise ValueError(f"{table}.{col} max {mx} >= offset {off}")
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({REPLICAS})) AS k")

    def write(name: str, sql: str) -> None:
        path = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(path):
            return
        con.execute(f"COPY ({sql}) TO '{path}' (FORMAT PARQUET)")
        print("wrote", path, flush=True)

    write(
        "events",
        f"""SELECT event_id + k * 100000 AS event_id, ts,
               user_id + k * 2000 AS user_id, event_type, value, props
        FROM read_parquet('{SRC}/events.parquet'), r""",
    )
    # 3-letter replica suffix covers k <= 17575 (26^3) — same mutation
    # law as sf1_scaling so replicas share almost no shingles
    suffix = (
        "'q' || chr(97 + CAST(k % 26 AS INT))"
        " || chr(97 + CAST((k // 26) % 26 AS INT))"
        " || chr(97 + CAST(k // 676 AS INT))"
    )
    write(
        "documents",
        f"""SELECT doc_id + k * 5000 AS doc_id, text,
               lang, source, LENGTH(text) AS n_chars
        FROM (
          SELECT doc_id, k,
                 array_to_string(list_transform(string_split(text, ' '),
                   (w, i) -> CASE WHEN (i * 2654435761 + k) % 3 = 0
                             THEN w || {suffix}
                             ELSE w END), ' ') AS text,
                 lang, source
          FROM read_parquet('{SRC}/documents.parquet'), r
        )""",
    )


def main() -> None:
    if "--skip-gen" not in sys.argv:
        generate()
    import duckdb

    import __spark_entry__ as entry
    from scripts.value_sweep import _adjudicate, canon, value_hash

    from guagua_spark.session import get_spark

    spark = get_spark(
        app_name="sf1000_sketch", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # budget the oracle: an unbudgeted in-process DuckDB at this rung
    # OOM-kills the SHARED process (the round-10 awaitResult deaths)
    con.execute("SET memory_limit='48GB'")
    tmp = os.path.join(DST, "_duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(DST, t + '.parquet')}')"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    sampled = entry.sweep_sampled()
    results: dict = {}
    out_path = os.path.join(_REPO, "SWEEP_SF1000_SKETCH.json")
    if "--resume" in sys.argv and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f).get("results", {})
        results = {
            k: v
            for k, v in prior.items()
            if v.get("err") is None and v.get("rows_match")
        }
        print("resume: keeping", sorted(results), flush=True)
    for name, use_twin in PROBE:
        if name in results:
            continue
        rec: dict = {}
        fn, sql = qs[name], oracles[name]
        if use_twin:
            fn, sql, rule = sampled[name]
            rec["oracle_sampled"] = True
            rec["sample_rule"] = rule
        try:
            t0 = time.monotonic()
            sdf = fn(spark, DST).toPandas()
            rec["spark_secs"] = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            odf = con.execute(sql).fetchdf()
            rec["oracle_secs"] = round(time.monotonic() - t0, 2)
            scols, srows = canon(sdf)
            ocols, orows = canon(odf)
            rec.update(
                rows_match=len(srows) == len(orows),
                schema_match=scols == ocols,
                hash_match=value_hash(srows) == value_hash(orows),
                spark_rows=len(srows),
            )
            if not rec["hash_match"] and rec["rows_match"]:
                rec.update(_adjudicate(sdf, odf))
            rec["err"] = None
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = rec
        print(name, json.dumps(rec)[:240], flush=True)
        with open(os.path.join(_REPO, "SWEEP_SF1000_SKETCH.json"), "w") as f:
            json.dump(
                {"sf_dir": DST, "replicas": REPLICAS, "results": results},
                f,
                indent=1,
            )
            f.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
