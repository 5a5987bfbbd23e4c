"""Text-analysis operators vs DuckDB oracle."""

from __future__ import annotations

import pytest

from guagua_spark.operators.text import (
    LOCAL_ORACLE_SQL,
    LOCAL_QUERIES,
    ORACLE_SQL,
    QUERIES,
)

from oracle import assert_matches_oracle, duck_connection

ALL_QUERIES = {**QUERIES, **LOCAL_QUERIES}
ALL_ORACLE_SQL = {**ORACLE_SQL, **LOCAL_ORACLE_SQL}


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_text_op_matches_oracle(spark, oracle_sf_dir, duck, name):
    df = ALL_QUERIES[name](spark, oracle_sf_dir)
    assert_matches_oracle(df, duck, ALL_ORACLE_SQL[name])


def test_repetition_redaction_boilerplate_nonzero(spark, oracle_sf_dir):
    """The fixture must actually exercise the new signals — a corpus
    where every count is zero would green-light a broken operator."""
    from pyspark.sql import functions as F

    from guagua_spark.operators.text import (
        boilerplate_ngrams,
        redact_denylist,
        repetition_scores,
    )

    assert (
        repetition_scores(spark, oracle_sf_dir)
        .filter(F.col("rep_ratio") > 0)
        .count()
        > 0
    )
    assert (
        redact_denylist(spark, oracle_sf_dir)
        .agg(F.sum("n_redacted"))
        .collect()[0][0]
        > 0
    )
    assert boilerplate_ngrams(spark, oracle_sf_dir).count() > 0


def test_unigram_logprob_exercises_oov(spark, oracle_sf_dir):
    """VOCAB_K truncates below the fixture's vocabulary, so some doc
    must count OOV tokens and OOV logprob must be below every in-vocab
    score in that doc (the floor is smaller than any real count)."""
    from guagua_spark.operators.text import unigram_logprob

    rows = unigram_logprob(spark, oracle_sf_dir).collect()
    assert any(r.n_oov > 0 for r in rows)
    assert all(r.n_tokens >= r.n_oov for r in rows)
    assert all(r.avg_logprob < 0 for r in rows)


def test_decontaminate_flags_real_overlap(spark, oracle_sf_dir, duck):
    """The filter must flag a non-trivial strict subset and every
    flagged doc must truly share a gram with the heldout set (checked
    against an independent DuckDB recount)."""
    from guagua_spark.operators.text import (
        DECON_GRAM,
        DECON_HELDOUT,
        decontaminate,
    )

    rows = decontaminate(spark, oracle_sf_dir).collect()
    flagged = {r.doc_id for r in rows if r.contaminated}
    assert 0 < len(flagged) < len(rows)
    w = DECON_GRAM
    want = {
        r[0]
        for r in duck.execute(
            f"""
            WITH toks AS (SELECT doc_id, string_split(text,' ') AS t
                          FROM documents),
            grams AS (SELECT doc_id, array_to_string(t[i:i+{w-1}],' ') AS g
                      FROM toks, unnest(range(1, len(t)-{w-2})) AS u(i)
                      WHERE len(t) >= {w})
            SELECT DISTINCT tr.doc_id FROM grams tr
            JOIN grams h ON tr.g = h.g AND h.doc_id < {DECON_HELDOUT}
            WHERE tr.doc_id >= {DECON_HELDOUT}"""
        ).fetchall()
    }
    assert flagged == want
