"""BPE merge training: engine path vs DuckDB unrolled-CTE oracle and
the serial reference replay (operators/tokenizer.py)."""

from __future__ import annotations

import pytest

from guagua_spark.operators.tokenizer import (
    BPE_MERGES,
    LOCAL_ORACLE_SQL,
    bpe_train,
    bpe_train_serial,
    merge_symbols,
)

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


def test_bpe_train_matches_oracle(spark, oracle_sf_dir, duck):
    df = bpe_train(spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, LOCAL_ORACLE_SQL["bpe_train"])


def test_bpe_train_matches_serial_replay(spark, oracle_sf_dir, duck):
    got = [
        (r["lft"], r["rgt"], r["pair_freq"])
        for r in bpe_train(spark, oracle_sf_dir).orderBy("merge_rank").collect()
    ]
    words = dict(
        duck.execute(
            "SELECT w, COUNT(*) FROM (SELECT unnest(string_split(text,"
            "' ')) AS w FROM documents) t WHERE w <> '' GROUP BY w"
        ).fetchall()
    )
    assert got == bpe_train_serial(words, BPE_MERGES)
    assert len(got) == BPE_MERGES


def test_merge_symbols_left_to_right_nonoverlapping():
    # l l l l -> ll ll ; l l l -> ll l (the canonical BPE apply rule the
    # oracle's double-space REPLACE encoding must reproduce)
    assert merge_symbols(["l"] * 4, "l", "l") == ["ll", "ll"]
    assert merge_symbols(["l"] * 3, "l", "l") == ["ll", "l"]
    assert merge_symbols(["a", "b", "a"], "a", "b") == ["ab", "a"]
    assert merge_symbols([], "a", "b") == []


def test_serial_merges_of_merges():
    # 'aaaa' x2: merge 1 = (a,a) — Sennrich-style stats count EVERY
    # adjacent occurrence (3 per word x freq 2 = 6) even though the
    # apply step then merges non-overlapping; merge 2 ties at count 2
    # between (aa,aa) and (aa,</w>) and the joined-string tie-break
    # picks 'aa </w>' ('<' sorts below 'a') — a merged symbol on the
    # left proves pairs between MERGED symbols are counted
    merges = bpe_train_serial({"aaaa": 2}, 2)
    assert merges[0] == ("a", "a", 6)
    assert merges[1] == ("aa", "</w>", 2)


def test_serial_tie_break_is_pair_string_order():
    # all three pairs occur once; ('a','b') is the smallest joined string
    merges = bpe_train_serial({"abc": 1}, 1)
    assert merges[0][:2] == ("a", "b")


def test_serial_halts_when_no_pairs():
    # a single-char word is one symbol + EOW -> one merge empties it
    merges = bpe_train_serial({"x": 5}, 10)
    assert merges == [("x", "</w>", 5)]


@pytest.mark.parametrize("word,n", [("hello", 3), ("aabaa", 3), ("llll", 2)])
def test_oracle_encoding_matches_list_merge(word, n):
    # the double-space SQL REPLACE and the list merge agree step-by-step,
    # including overlapping-occurrence words
    import duckdb

    con = duckdb.connect()
    merges = bpe_train_serial({word: 1}, n)
    enc = " " + "  ".join(list(word) + ["</w>"]) + " "
    symbols = list(word) + ["</w>"]
    for lft, rgt, _ in merges:
        enc = con.execute(
            "SELECT REPLACE(?, ?, ?)",
            [enc, f" {lft}  {rgt} ", f" {lft}{rgt} "],
        ).fetchone()[0]
        symbols = merge_symbols(symbols, lft, rgt)
        assert enc.strip(" ").split("  ") == symbols, (word, lft, rgt)
    con.close()


def test_bpe_failover_resume_equals_uninterrupted(spark, tmp_path):
    """The engine's FailOverCommand analogue on the BPE workload: train
    4 merges with checkpointing, then resume the same checkpoint dir to
    8 — the merge list must equal an uninterrupted 8-merge run (the
    master result carries the full merge history, so resume needs no
    replay of completed supersteps)."""
    from guagua_spark.engine import IterativeEngine
    from guagua_spark.operators.tokenizer import (
        BPEMaster,
        BPEWorker,
        build_vocabulary,
    )
    from guagua_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    vocab = build_vocabulary(load_table(spark, sf, "documents"))
    ckpt = str(tmp_path / "bpe_ckpt")
    e1 = IterativeEngine(spark, checkpoint_dir=ckpt, checkpoint_interval=1)
    m4 = e1.run(BPEMaster(), BPEWorker(), vocab, total_iteration=4)
    assert len(m4.merges) == 4
    e2 = IterativeEngine(spark, checkpoint_dir=ckpt, checkpoint_interval=1)
    m8 = e2.run(BPEMaster(), BPEWorker(), vocab, total_iteration=8)
    assert len(e2.iteration_seconds) == 4  # only supersteps 5..8 ran
    full = IterativeEngine(spark).run(
        BPEMaster(), BPEWorker(), vocab, total_iteration=8
    )
    assert m8.merges == full.merges
