"""Synthesize larger scale dirs (sf1, sf10) and measure heavy-query
scaling exponents.

The driver provides sf{0.001,0.01,0.1} only, so larger scales are
synthesized here (under the repo, gitignored) by key-shifted
replication of sf0.1 — and, for documents, a per-replica deterministic
word mutation (every third word position gets a replica suffix) so
replicas share almost no shingles: without it every replica pair would
be a near-duplicate and the dedup family would measure a fabricated
pair explosion instead of more data. Distributions (lengths,
vocabulary shape, dup structure WITHIN a replica) carry over from the
driver's generator.

Modes:
    python scripts/sf1_scaling.py          # sf1 = 10x, BENCH_SF1.json
    python scripts/sf1_scaling.py --sf10   # sf10 = 100x, BENCH_SF10.json
                                           # (exponents vs the sf1 dir,
                                           # which must exist already)

The sf10 probe exists because magnitude-driven defect classes surface
one decade at a time: the gs_rev_wsum float-rounding bug was invisible
below sf1 (round 8); whatever is next is invisible below sf10. Run the
value sweep (scripts/value_sweep.py, rtol-gated since round 9) against
the generated dir for the correctness half of the probe.
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
QUERIES = [
    "dedup_ngram_jaccard",
    "lr_train",
    "pipeline_clean_corpus",
    "dedup_clusters",
    "rx_percentiles",
]


#: per-table replica key offsets — must exceed the source table's max
#: id or replicas silently collide (asserted in generate())
OFFSETS = {
    "lineitem": [("l_orderkey", 200000)],
    "documents": [("doc_id", 5000)],
    "embeddings": [("vec_id", 2000)],
    "orders": [("o_orderkey", 200000)],
    "events": [("event_id", 100000), ("user_id", 2000)],
}

#: dimension tables copied UNREPLICATED (facts scale Nx, dims fixed —
#: the TPC-H-style scaling mode; lineitem keeps its part/supp keys and
#: orders its custkeys, so FK joins stay consistent)
DIM_COPIES = ("region", "nation", "customer", "supplier", "part")


def generate(dst: str, replicas: int) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # stream the COPY instead of materializing the whole replicated
    # relation: with order preservation on (the default), the sf100
    # lineitem CTAS buffers ~600M rows (~100 GB RSS — observed OOM
    # trajectory); row order is meaningless in these synthetic decks
    # and every consumer sorts/aggregates, so let DuckDB write row
    # groups as they are produced under a bounded memory budget
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='48GB'")
    tmp = os.path.join(dst, "_duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    # guard the hardcoded offsets against a regenerated sf0.1 with
    # larger cardinalities: a collision would silently corrupt the
    # synthetic dataset and the published exponents (round-8 advice)
    for table, cols in OFFSETS.items():
        for col, off in cols:
            (mx,) = con.execute(
                f"SELECT MAX({col}) FROM read_parquet('{SRC}/{table}.parquet')"
            ).fetchone()
            if mx is None:  # empty source table: MAX() is NULL
                raise ValueError(
                    f"{table} is empty at {SRC} — regenerate the source"
                    " scale dir before synthesizing replicas"
                )
            if mx >= off:  # hard raise: asserts vanish under -O
                raise ValueError(
                    f"{table}.{col} max {mx} >= replica offset {off}:"
                    " replicas would collide — raise the offset and"
                    f" delete stale {dst} outputs"
                )
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({replicas})) AS k")

    def write(name: str, sql: str) -> None:
        path = os.path.join(dst, f"{name}.parquet")
        if os.path.exists(path):
            return
        con.execute(
            f"COPY ({sql}) TO '{path}' (FORMAT PARQUET)"
        )
        print("wrote", path)

    write(
        "lineitem",
        f"""SELECT l_orderkey + k * 200000 AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'), r""",
    )
    # replica suffix is ALPHABETIC ('q' + letter(s)): a '~<digit>'
    # suffix would sink every mutated doc below the clean-corpus
    # alpha-ratio filter (observed: empty clean corpus at sf1); past
    # k=25 a second letter keeps it alphabetic (chr(97+k) would leave
    # ASCII). The k<=25 form is unchanged so an existing sf1 dir stays
    # reproducible. n_chars is recomputed to match the mutated payload.
    if replicas <= 26:
        suffix = "'q' || chr(97 + CAST(k AS INT))"
    elif replicas <= 676:
        suffix = (
            "'q' || chr(97 + CAST(k % 26 AS INT))"
            " || chr(97 + CAST(k // 26 AS INT))"
        )
    else:
        # three letters for sf100 (k ≤ 999): the two-letter form's
        # k//26 leaves ASCII letters past k=675
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
    write(
        "embeddings",
        f"""SELECT vec_id + k * 2000 AS vec_id, embedding, label
        FROM read_parquet('{SRC}/embeddings.parquet'), r""",
    )
    # the remaining fact tables + dim copies (round 8) let the FULL
    # 50-query contract run at the synthesized scale, not just the
    # 5-query timing set: orders replicates on the same orderkey offset
    # as lineitem so the l_orderkey = o_orderkey join stays consistent;
    # events shifts both event and user ids so per-user
    # session/retention structure is preserved per replica (Nx users,
    # not Nx-longer histories)
    write(
        "orders",
        f"""SELECT o_orderkey + k * 200000 AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'), r""",
    )
    write(
        "events",
        f"""SELECT event_id + k * 100000 AS event_id, ts,
               user_id + k * 2000 AS user_id, event_type, value, props
        FROM read_parquet('{SRC}/events.parquet'), r""",
    )
    for dim in DIM_COPIES:
        write(
            dim,
            f"SELECT * FROM read_parquet('{SRC}/{dim}.parquet')",
        )


def run(dirs: list[tuple[str, str]], out_name: str, replicas: int) -> None:
    """Time QUERIES at each (dir, tag) and write exponents between the
    LAST two tags (log10 of the wall ratio per 10x data)."""
    os.environ["GUAGUA_DURABLE_CACHE"] = "0"  # measure real builds
    from guagua_spark.metrics import drain_index_builds
    from guagua_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        app_name="sf_scaling", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out: dict = {"replicas": replicas, "runs": {}}
    for sf_dir, tag in dirs:
        drain_index_builds()
        rec: dict = {}
        for name in QUERIES:
            t0 = time.monotonic()
            n = len(qs[name](spark, sf_dir).collect())
            secs = time.monotonic() - t0
            idx = drain_index_builds()
            rec[name] = {
                "secs": round(secs - sum(idx.values()), 3),
                "rows": n,
                "index": {k: round(v, 3) for k, v in idx.items()},
            }
            print(tag, name, rec[name], flush=True)
        out["runs"][tag] = rec
    import math

    lo, hi = dirs[-2][1], dirs[-1][1]

    def total(tag: str, q: str) -> float:
        r = out["runs"][tag][q]
        return r["secs"] + sum(r["index"].values())

    out["exponents"] = {
        q: round(math.log10(total(hi, q) / total(lo, q)), 3)
        for q in QUERIES
    }
    with open(os.path.join(_REPO, out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["exponents"]))
    spark.stop()


#: hub suppliers (keys < this) keep their original key in every graph
#: replica — the connectivity spine that keeps the grown trade graph
#: ONE component (all-shifted keys would make BFS explore a constant
#: subgraph while only the scans grew — the vacuous exponent the
#: round-11 verdict flagged)
_GRAPH_HUB_SUPPKEYS = 50


def generate_graph(dst: str, replicas: int) -> None:
    """Graph-GROWING replica dir (orders + lineitem only): unlike
    generate(), replicas shift the CUSTOMER key space and all
    non-hub SUPPLIER keys, so each replica adds ~15k new customer
    nodes and ~950 new supplier nodes rather than re-weighting the
    same fixed node set. Used only by the graph-operator scaling
    probe; the main sf1/sf10 dirs keep dim-consistent FKs."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='48GB'")
    for table, col, off in (
        ("orders", "o_orderkey", 200000),
        ("orders", "o_custkey", 15000),
        ("lineitem", "l_suppkey", 1000),
    ):
        (mx,) = con.execute(
            f"SELECT MAX({col}) FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchone()
        if mx is None or mx >= off:
            raise ValueError(
                f"{table}.{col} max {mx} >= replica offset {off}"
            )
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({replicas})) AS k")

    def write(name: str, sql: str) -> None:
        path = os.path.join(dst, f"{name}.parquet")
        if os.path.exists(path):
            return
        con.execute(f"COPY ({sql}) TO '{path}' (FORMAT PARQUET)")
        print("wrote", path, flush=True)

    write(
        "orders",
        f"""SELECT o_orderkey + k * 200000 AS o_orderkey,
               o_custkey + k * 15000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'), r""",
    )
    write(
        "lineitem",
        f"""SELECT l_orderkey + k * 200000 AS l_orderkey, l_partkey,
               CASE WHEN l_suppkey < {_GRAPH_HUB_SUPPKEYS}
                    THEN l_suppkey
                    ELSE l_suppkey + k * 1000 END AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'), r""",
    )


def run_graph(dirs: list[tuple[str, str]], out_name: str, replicas: int):
    """Time the LOCAL graph operators at each rung and record the
    exponent — plus the BFS node count and triangle totals per rung,
    the direct evidence the GRAPH grew (not just the scan)."""
    import math

    from guagua_spark.session import get_spark

    from guagua_spark.operators.graph import LOCAL_QUERIES

    names = ["graph_bfs_depth", "graph_triangles"]
    spark = get_spark(
        app_name="graph_scaling", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "replicas": replicas,
        "hub_suppkeys": _GRAPH_HUB_SUPPKEYS,
        "runs": {},
    }
    for sf_dir, tag in dirs:
        rec: dict = {}
        for name in names:
            best, rows, evidence = None, 0, {}
            for _ in range(2):  # rep 1 warms the scan; keep the best
                t0 = time.monotonic()
                got = LOCAL_QUERIES[name](spark, sf_dir).collect()
                secs = time.monotonic() - t0
                best = secs if best is None else min(best, secs)
                rows = len(got)
            if name == "graph_bfs_depth":
                from collections import Counter

                evidence["nodes_per_depth"] = dict(
                    sorted(Counter(r["depth"] for r in got).items())
                )
            else:
                evidence["tri_total"] = got[0]["tri_total"] if got else 0
            rec[name] = {"secs": round(best, 3), "rows": rows, **evidence}
            print(tag, name, rec[name], flush=True)
        out["runs"][tag] = rec
    lo, hi = dirs[-2][1], dirs[-1][1]
    out["exponents"] = {
        q: round(
            math.log10(
                out["runs"][hi][q]["secs"] / out["runs"][lo][q]["secs"]
            ),
            3,
        )
        for q in names
    }
    with open(os.path.join(_REPO, out_name), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["exponents"]))
    spark.stop()


def run_engine(dirs: list[tuple[str, str]], out_name: str):
    """Time the engine-workload LOCAL rows (ALS, GBT) at each rung and
    record the exponent. Cold per rung by construction: caches are
    cleared between calls so the timing includes the load-once persist
    and every superstep — the engine interior IS the claim (per-round
    traffic is model-sized, so the exponent should track the scan,
    not the superstep count)."""
    import math

    from guagua_spark.session import get_spark

    names = ["als_train", "gbt_train"]
    spark = get_spark(
        app_name="engine_scaling", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"runs": {}}
    for sf_dir, tag in dirs:
        rec: dict = {}
        for name in names:
            from guagua_spark.operators import iterative

            iterative.clear_caches()
            t0 = time.monotonic()
            rows = iterative.LOCAL_QUERIES[name](spark, sf_dir).collect()
            rec[name] = {
                "secs": round(time.monotonic() - t0, 3),
                "rows": len(rows),
            }
            print(tag, name, rec[name], flush=True)
        out["runs"][tag] = rec
    lo, hi = dirs[-2][1], dirs[-1][1]
    out["exponents"] = {
        q: round(
            math.log10(
                out["runs"][hi][q]["secs"] / out["runs"][lo][q]["secs"]
            ),
            3,
        )
        for q in names
    }
    with open(os.path.join(_REPO, out_name), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out["exponents"]))
    spark.stop()


if __name__ == "__main__":
    sf1_dst = os.path.join(_REPO, "testdata_sf1")
    if "--engine" in sys.argv:
        generate(sf1_dst, 10)
        run_engine(
            [(SRC, "sf0.1"), (sf1_dst, "sf1")], "BENCH_ENGINE_SCALING.json"
        )
    elif "--graph" in sys.argv:
        gdst = os.path.join(_REPO, "testdata_graph_sf1")
        generate_graph(gdst, 10)
        run_graph(
            [(SRC, "sf0.1"), (gdst, "graph_sf1")],
            "BENCH_GRAPH_SCALING.json",
            10,
        )
    elif "--sf100" in sys.argv:
        # the next decade (round-9 verdict #4): exponents sf10 → sf100
        sf10_dst = os.path.join(_REPO, "testdata_sf10")
        sf100_dst = os.path.join(_REPO, "testdata_sf100")
        generate(sf10_dst, 100)  # baseline dir must exist for exponents
        generate(sf100_dst, 1000)
        run(
            [(sf10_dst, "sf10"), (sf100_dst, "sf100")],
            "BENCH_SF100.json",
            1000,
        )
    elif "--sf10" in sys.argv:
        sf10_dst = os.path.join(_REPO, "testdata_sf10")
        generate(sf1_dst, 10)  # baseline dir must exist for exponents
        generate(sf10_dst, 100)
        run([(sf1_dst, "sf1"), (sf10_dst, "sf10")], "BENCH_SF10.json", 100)
    else:
        generate(sf1_dst, 10)
        run([(SRC, "sf0.1"), (sf1_dst, "sf1")], "BENCH_SF1.json", 10)
