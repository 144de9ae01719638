"""DuckDB oracle harness mirroring the driver's correctness gate:
run a Spark DataFrame and a DuckDB SQL string over the same parquet
tables, sort columns by name and rows by value, compare."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from fluent_bit_spark.transcripts import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: None
                if v is None or (isinstance(v, float) and math.isnan(v))
                else v
            )
    # sort by non-float columns FIRST: a rounded float at a boundary can
    # differ by 1 ulp across engines, and using it as the primary sort
    # key would misalign otherwise-identical rows past the tolerance
    # check (ids/strings are exact, so they anchor the row order)
    exact = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    floats = [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
    df = df.sort_values(by=exact + floats, na_position="first").reset_index(drop=True)
    return df


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    got = _normalize(spark_df.toPandas())
    con = duckdb_conn(sf_dir)
    try:
        want = _normalize(con.execute(oracle_sql).df())
    finally:
        con.close()
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count mismatch: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            # Absolute tolerance only: the driver gate hashes values, so a
            # relative term would hide real drift on large magnitudes (e.g.
            # epoch seconds ~1.7e9, where 1e-6 relative is ~1,700 s of slack
            # -- exactly how the r2 sink_gelf/sink_splunk ms-truncation bug
            # shipped green locally).  1e-6 absolute still admits a few ulps
            # at epoch-second magnitude (double spacing ~2e-7 there).
            ok = (g.isna() & w.isna()) | ((g - w).abs() <= 1e-6)
        else:
            ok = (g.isna() & w.isna()) | (g.astype(object) == w.astype(object))
        if not ok.all():
            bad = (~ok).idxmax()
            raise AssertionError(
                f"value mismatch in column {c!r} at sorted row {bad}: "
                f"spark={g[bad]!r} oracle={w[bad]!r}"
            )
