"""Composite clean-corpus pipeline vs the DuckDB recursive-CTE oracle."""

from __future__ import annotations

import pytest

from guagua_spark.operators.pipeline import ORACLE_SQL, QUERIES

from oracle import assert_matches_oracle, duck_connection


@pytest.fixture(scope="module")
def duck(oracle_sf_dir):
    con = duck_connection(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_pipeline_matches_oracle(spark, oracle_sf_dir, duck, name):
    assert_matches_oracle(
        QUERIES[name](spark, oracle_sf_dir), duck, ORACLE_SQL[name]
    )


def test_pipeline_actually_filters_and_dedups(spark, oracle_sf_dir, duck):
    """The composite must remove rows at BOTH stages on the fixture,
    otherwise the query degenerates to a plain groupBy."""
    from guagua_spark.operators.pipeline import MIN_ALPHA_RATIO, MIN_TOKENS

    total = duck.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    filtered = duck.execute(
        f"""SELECT COUNT(*) FROM documents
        WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
          AND CAST(LENGTH(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
              / LENGTH(text) >= {MIN_ALPHA_RATIO}"""
    ).fetchone()[0]
    kept = (
        QUERIES["pipeline_clean_corpus"](spark, oracle_sf_dir)
        .groupBy()
        .sum("n_docs")
        .collect()[0][0]
    )
    assert filtered < total, "quality filter must drop rows"
    assert kept < filtered, "near-dup removal must drop rows"
