"""Property-based checks for the round-11 continuation operators:
interval bin join, BFS hop distance, and the BPE oracle's REPLACE
encoding — each vs a pure-Python reference on randomized inputs.

Few examples, Spark-job-per-example (house convention,
test_packing_properties.py): the value is randomized edge cases —
touching interval endpoints, bucket-boundary straddles, disconnected
graphs, self-loops, words with long symbol runs — not volume.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DAY0 = datetime.date(1992, 1, 1)


# --- interval bin join ------------------------------------------------------

_iv = st.tuples(
    st.integers(min_value=0, max_value=300),  # start day offset
    st.integers(min_value=0, max_value=40),  # length (end >= start)
)


@_SETTINGS
@given(
    lhs=st.lists(_iv, min_size=0, max_size=25),
    rhs=st.lists(_iv, min_size=1, max_size=8),
)
def test_bin_join_equals_brute_force_overlap(spark, lhs, rhs):
    """The explode-to-buckets + GREATEST-bucket dedup pipeline counts
    exactly the overlapping pairs a brute-force scan finds — including
    touching endpoints and intervals spanning several buckets (length
    can reach 40 of the 64-day bucket width; offsets cross boundaries)."""
    from guagua_spark.operators.relational_ext import _IVJ_BIN_DAYS

    def d(off):
        return _DAY0 + datetime.timedelta(days=off)

    want = 0
    for ls, ln in lhs:
        for rs, rn in rhs:
            if ls <= rs + rn and ls + ln >= rs:
                want += 1

    if not lhs:
        return  # spark.createDataFrame needs rows; brute force = 0 too
    ldf = spark.createDataFrame(
        [(d(s), d(s + n)) for s, n in lhs], "s date, e date"
    )
    rdf = spark.createDataFrame(
        [(i, d(s), d(s + n)) for i, (s, n) in enumerate(rhs)],
        "window_id int, w_start date, w_end date",
    )

    def bkt(c):
        return F.floor(
            F.datediff(c, F.lit(_DAY0)) / _IVJ_BIN_DAYS
        ).cast("int")

    lb = ldf.withColumn(
        "bkt", F.explode(F.sequence(bkt(F.col("s")), bkt(F.col("e"))))
    )
    rb = rdf.withColumn(
        "bkt",
        F.explode(F.sequence(bkt(F.col("w_start")), bkt(F.col("w_end")))),
    )
    got = (
        lb.join(rb, "bkt")
        .where(
            (F.col("s") <= F.col("w_end"))
            & (F.col("e") >= F.col("w_start"))
            & (
                F.col("bkt")
                == bkt(F.greatest(F.col("s"), F.col("w_start")))
            )
        )
        .count()
    )
    assert got == want


# --- BFS hop distance -------------------------------------------------------


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    ),
    cap=st.integers(min_value=1, max_value=5),
)
def test_bfs_equals_python_bfs(spark, edges, cap):
    """Frontier-loop BFS equals a dict-based reference BFS on random
    directed graphs (self-loops, cycles, disconnected nodes) at every
    hop cap."""
    from guagua_spark.operators.graph import bfs_depths

    src = str(edges[0][0])
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(str(a), set()).add(str(b))
    want = {src: 0}
    frontier = [src]
    for depth in range(1, cap + 1):
        nxt = []
        for node in frontier:
            for m in adj.get(node, ()):
                if m not in want:
                    want[m] = depth
                    nxt.append(m)
        frontier = nxt

    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "a string, b string"
    )
    got = {
        r["node"]: r["depth"] for r in bfs_depths(df, src, cap).collect()
    }
    assert got == want


# --- BPE REPLACE encoding ---------------------------------------------------


@_SETTINGS
@given(
    words=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=5),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=1, max_value=5),
)
def test_bpe_replace_encoding_tracks_list_merge(words, k):
    """For every merge the serial trainer learns on a random tiny-
    alphabet corpus (maximizing repeated-adjacent-symbol words, the
    REPLACE encoding's hard case), the double-space REPLACE rewrite
    yields exactly the list-merge symbolization of every word."""
    import duckdb

    from guagua_spark.operators.tokenizer import (
        EOW,
        bpe_train_serial,
        merge_symbols,
    )

    merges = bpe_train_serial(words, k)
    con = duckdb.connect()
    for w in words:
        enc = " " + "  ".join(list(w) + [EOW]) + " "
        symbols = list(w) + [EOW]
        for lft, rgt, _ in merges:
            enc = con.execute(
                "SELECT REPLACE(?, ?, ?)",
                [enc, f" {lft}  {rgt} ", f" {lft}{rgt} "],
            ).fetchone()[0]
            symbols = merge_symbols(symbols, lft, rgt)
            assert enc.strip(" ").split("  ") == symbols, (w, lft, rgt)
    con.close()
