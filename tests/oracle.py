"""DuckDB oracle comparison helper — mirrors the driver's t2 check:
row-count + schema(column names) + order-insensitive value comparison.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_matches_oracle(
    spark_df, oracle_con: duckdb.DuckDBPyConnection, sql: str, rtol: float = 1e-9
) -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(oracle_con.execute(sql).fetchdf())
    assert sorted(got.columns) == sorted(want.columns), (
        f"schema mismatch: {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g.astype(float), w.astype(float))):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert math.isclose(a, b, rel_tol=rtol, abs_tol=1e-12), (
                    f"col {col} row {i}: {a} != {b}"
                )
        else:
            ga, wa = g.astype(str).tolist(), w.astype(str).tolist()
            assert ga == wa, f"col {col} differs: {ga[:3]}... vs {wa[:3]}..."
