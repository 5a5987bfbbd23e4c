"""One-shot sf0.1 → sf1 scaling measurement for the heaviest queries.

The driver provides sf{0.001,0.01,0.1} only, so sf1 is synthesized
here (under the repo, gitignored) by 10x replication of sf0.1 with
shifted keys — and, for documents, a per-replica deterministic word
mutation (every third word position gets a replica suffix) so replicas
share almost no shingles: without it every replica pair would be a
near-duplicate and the dedup family would measure a fabricated 100x
pair explosion instead of 10x more data. Distributions (lengths,
vocabulary shape, dup structure WITHIN a replica) carry over from the
driver's generator.

Usage: python scripts/sf1_scaling.py   (writes BENCH_SF1.json; run
findings are summarized in BENCH_NOTES.md)
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
DST = os.path.join(_REPO, "testdata_sf1")
REPLICAS = 10
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

#: dimension tables copied UNREPLICATED (facts scale 10x, dims fixed —
#: the TPC-H-style scaling mode; lineitem keeps its part/supp keys and
#: orders its custkeys, so FK joins stay consistent)
DIM_COPIES = ("region", "nation", "customer", "supplier", "part")


def generate() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
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
                    " delete stale testdata_sf1 outputs"
                )
    con.execute(f"CREATE VIEW r AS SELECT unnest(range({REPLICAS})) AS k")

    def write(name: str, sql: str) -> None:
        path = os.path.join(DST, f"{name}.parquet")
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
    # replica suffix is ALPHABETIC ('q' + letter): a '~<digit>' suffix
    # would sink every mutated doc below the clean-corpus alpha-ratio
    # filter (observed: empty clean corpus at sf1); n_chars is
    # recomputed so the metadata matches the mutated payload
    write(
        "documents",
        f"""SELECT doc_id + k * 5000 AS doc_id, text,
               lang, source, LENGTH(text) AS n_chars
        FROM (
          SELECT doc_id, k,
                 array_to_string(list_transform(string_split(text, ' '),
                   (w, i) -> CASE WHEN (i * 2654435761 + k) % 3 = 0
                             THEN w || 'q' || chr(97 + CAST(k AS INT))
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
    # 50-query contract run at sf1, not just the 5-query timing set:
    # orders replicates on the same orderkey offset as lineitem so the
    # l_orderkey = o_orderkey join stays consistent; events shifts both
    # event and user ids so per-user session/retention structure is
    # preserved per replica (10x users, not 10x-longer histories)
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


def run() -> None:
    os.environ["GUAGUA_DURABLE_CACHE"] = "0"  # measure real builds
    from guagua_spark.metrics import drain_index_builds
    from guagua_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        app_name="sf1_scaling", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out: dict = {"replicas": REPLICAS, "runs": {}}
    for sf_dir, tag in ((SRC, "sf0.1"), (DST, "sf1")):
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
            print(tag, name, rec[name])
        out["runs"][tag] = rec
    import math

    out["exponents"] = {
        q: round(
            math.log10(
                (
                    out["runs"]["sf1"][q]["secs"]
                    + sum(out["runs"]["sf1"][q]["index"].values())
                )
                / (
                    out["runs"]["sf0.1"][q]["secs"]
                    + sum(out["runs"]["sf0.1"][q]["index"].values())
                )
            ),
            3,
        )
        for q in QUERIES
    }
    with open(os.path.join(_REPO, "BENCH_SF1.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["exponents"]))
    spark.stop()


if __name__ == "__main__":
    generate()
    run()
