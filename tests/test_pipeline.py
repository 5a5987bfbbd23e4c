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


@pytest.mark.parametrize(
    "name",
    [
        "pipeline_stratified_sample",
        "pipeline_source_mix",
        "pipeline_weighted_sample",
        "pipeline_corpus_diff",
        "pipeline_incremental_chunks",
        "pipeline_source_cap",
    ],
)
def test_sampling_operators_match_oracle(spark, oracle_sf_dir, duck, name):
    from guagua_spark.operators.pipeline import LOCAL_ORACLE_SQL, LOCAL_QUERIES

    assert_matches_oracle(
        LOCAL_QUERIES[name](spark, oracle_sf_dir),
        duck,
        LOCAL_ORACLE_SQL[name],
    )


def test_stratified_sample_actually_downsamples(spark, oracle_sf_dir):
    """Sampled language rates must land near their configured targets
    (binomial noise bound) and un-configured languages stay whole."""
    from guagua_spark.operators.pipeline import (
        STRATIFIED_RATES,
        pipeline_stratified_sample,
    )
    from guagua_spark.sources.tables import load_table

    from pyspark.sql import functions as F

    totals = {
        r.lang: r.n
        for r in load_table(spark, oracle_sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kept = {
        r.lang: r.n
        for r in pipeline_stratified_sample(spark, oracle_sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in totals.items():
        rate = STRATIFIED_RATES.get(lang, 1.0)
        if rate == 1.0:
            assert kept[lang] == n
        else:
            # 4-sigma binomial bound
            import math

            sigma = math.sqrt(n * rate * (1 - rate))
            assert abs(kept[lang] - n * rate) <= 4 * sigma + 1


def test_source_mix_respects_budget(spark, oracle_sf_dir):
    from guagua_spark.operators.pipeline import (
        MIX_CHAR_BUDGET,
        pipeline_source_mix,
    )

    rows = pipeline_source_mix(spark, oracle_sf_dir).collect()
    assert rows, "mixture must be non-empty"
    for r in rows:
        # sampled chars may overshoot by binomial noise, not by design:
        # allow 2x headroom over the budget (tiny fixture, coarse docs)
        assert r.sampled_chars <= 2 * MIX_CHAR_BUDGET


def test_quality_pred_survives_empty_docs(spark):
    """Under Spark 4's default ANSI mode the alpha-ratio division used
    to throw DIVIDE_BY_ZERO on a zero-length doc (a real corpus has
    them even though the fixture doesn't) — the predicate must filter
    such docs, not kill the job."""
    from guagua_spark.operators.pipeline import _quality_pred

    df = spark.createDataFrame(
        [(1, ""), (2, " ".join(["okayword"] * 30))],
        "doc_id long, text string",
    )
    kept = df.filter(_quality_pred()).collect()
    assert [r.doc_id for r in kept] == [2]


def test_certmemo_invalidates_on_fingerprint_change(spark, oracle_sf_dir):
    """The certificate-scalar memo must serve cached values on a clean
    hit (no Spark job) and recompute when the input table fingerprint
    changes — same contract as the pair-graph memo."""
    from unittest import mock

    from guagua_spark.operators import certmemo

    certmemo.clear_caches()
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.createDataFrame([(calls["n"],)], "v bigint")

    try:
        a = certmemo.cached_cert_row(
            spark, oracle_sf_dir, "t", ("documents",), "v bigint", build
        ).collect()[0].v
        b = certmemo.cached_cert_row(
            spark, oracle_sf_dir, "t", ("documents",), "v bigint", build
        ).collect()[0].v
        assert (a, b) == (1, 1) and calls["n"] == 1, "hit must not rebuild"
        with mock.patch(
            "guagua_spark.sources.tables.table_fingerprint",
            return_value=("changed", 0, 0),
        ):
            c = certmemo.cached_cert_row(
                spark, oracle_sf_dir, "t", ("documents",), "v bigint", build
            ).collect()[0].v
        assert c == 2 and calls["n"] == 2, "fingerprint change must rebuild"
    finally:
        certmemo.clear_caches()


def test_weighted_sample_favors_heavy_rows_and_avoids_global_sort(
    spark, oracle_sf_dir
):
    """Inclusion ∝ weight: the length-weighted sample's mean n_chars
    must exceed the corpus mean; the plan must be TakeOrderedAndProject
    (per-partition top-k), not a global Sort."""
    from guagua_spark.operators.pipeline import (
        WSAMPLE_K,
        pipeline_weighted_sample,
    )
    from guagua_spark.sources.tables import load_table

    df = pipeline_weighted_sample(spark, oracle_sf_dir)
    rows = df.collect()
    assert len(rows) == WSAMPLE_K
    assert len({r["doc_id"] for r in rows}) == WSAMPLE_K  # no replacement
    corpus_avg = (
        load_table(spark, oracle_sf_dir, "documents")
        .agg({"n_chars": "avg"})
        .first()[0]
    )
    sample_avg = sum(r["n_chars"] for r in rows) / len(rows)
    assert sample_avg > corpus_avg
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_corpus_diff_statuses_are_complete(spark, oracle_sf_dir):
    """Every status appears on the synthetic split, counts reconcile
    with the set algebra of the two versions, and unchanged rows never
    surface."""
    from guagua_spark.operators.pipeline import pipeline_corpus_diff
    from guagua_spark.sources.tables import load_table

    rows = pipeline_corpus_diff(spark, oracle_sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r["status"], set()).add(r["doc_id"])
    assert set(by) == {"added", "removed", "changed"}
    ids = {
        r["doc_id"]
        for r in load_table(spark, oracle_sf_dir, "documents")
        .select("doc_id")
        .collect()
    }
    assert by["added"] == {i for i in ids if i % 3 == 0}
    assert by["removed"] == {i for i in ids if i % 3 == 1}
    assert by["changed"] == {
        i for i in ids if i % 3 == 2 and i % 7 == 0
    }


def test_incremental_chunks_touch_only_the_delta(spark, oracle_sf_dir):
    """Re-chunked doc set == added ∪ changed from the diff, nothing
    else — the O(delta) claim as an exact set equation."""
    from guagua_spark.operators.pipeline import (
        pipeline_corpus_diff,
        pipeline_incremental_chunks,
    )

    chunked = {
        r["doc_id"]
        for r in pipeline_incremental_chunks(spark, oracle_sf_dir).collect()
    }
    want = {
        r["doc_id"]
        for r in pipeline_corpus_diff(spark, oracle_sf_dir).collect()
        if r["status"] != "removed"
    }
    assert chunked == want


def test_corpus_diff_null_payloads(spark):
    """NULL payloads are values, not absences: NULL→NULL is unchanged,
    NULL→'x' and 'x'→NULL are changed, true adds/removes still work."""
    from guagua_spark.operators.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "keep")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None), (5, "new")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new).collect()
    }
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}
