"""Aggregate sinks & timeseries functions.

- `counter` ≙ out_counter (plugins/out_counter/counter.c:24-46):
  running record total per sink.
- `flowcounter` ≙ out_flowcounter
  (plugins/out_flowcounter/out_flowcounter.c:101-125): counts & bytes
  per tag per time unit. The reference windows on wall-clock ticks; we
  bind windows to the event timestamp (`F.window(ts, ...)`) which makes
  results deterministic — a documented improvement, same aggregate
  surface.
- `timeseries_forecast` ≙ TIMESERIES_FORECAST/_R
  (include/fluent-bit/stream_processor/flb_sp_timeseries.h:52-64):
  simple linear regression y = a + b·x via Spark's `regr_slope` /
  `regr_intercept` (numerically the same Σx/Σy/Σxy/Σx² computation the
  reference keeps incrementally).

Scale notes: these group-bys carry low-cardinality keys (sink, tag,
window), so Spark's partial (map-side) aggregation collapses each
partition to a handful of rows before the shuffle — the 100 TB plan is
scan-heavy, shuffle-light. No salting needed here; see skew.py for the
high-cardinality conv_id paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def counter(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Total record count (per key set, default per sink)."""
    keys = keys if keys is not None else ["sink"]
    return df.groupBy(*keys).agg(F.count("*").alias("records"))


def flowcounter(
    df: DataFrame,
    keys: list[str] | None = None,
    window: str = "1 hour",
    ts: str = "ts",
    bytes_col: str = "text",
) -> DataFrame:
    """Counts and byte totals per key per event-time window; emits
    window bounds plus rate columns like the reference's
    {counts, bytes, counts/unit, bytes/unit} record."""
    keys = keys if keys is not None else ["sink", "tag"]
    win = F.window(F.col(ts), window)
    return (
        df.groupBy(*keys, win.alias("w"))
        .agg(
            F.count("*").alias("counts"),
            F.sum(F.length(bytes_col)).alias("bytes"),
        )
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "counts",
            "bytes",
        )
    )


def sessionize(
    df: DataFrame,
    key: str,
    gap: str = "30 minutes",
    ts: str = "ts",
) -> DataFrame:
    """Session aggregation per key: `session_window(ts, gap)` — counts
    and bounds per session. (Not in the reference's SQL surface —
    SURVEY.md §2.5 notes session windows are absent there; free on
    Spark and listed as an addition.)"""
    return (
        df.groupBy(key, F.session_window(F.col(ts), gap).alias("sw"))
        .agg(F.count("*").alias("n_turns"))
        .select(
            key,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_turns",
        )
    )


def timeseries_forecast(
    df: DataFrame,
    x: str,
    y: str,
    group_keys: list[str] | None = None,
    future_x: float | None = None,
) -> DataFrame:
    """Linear-regression forecast per group: slope, intercept, and the
    predicted y at `future_x` (≙ TIMESERIES_FORECAST(x, y, n))."""
    keys = group_keys or []
    agg = df.groupBy(*keys).agg(
        F.regr_slope(F.col(y), F.col(x)).alias("slope"),
        F.regr_intercept(F.col(y), F.col(x)).alias("intercept"),
    )
    if future_x is not None:
        agg = agg.withColumn(
            "forecast", F.col("intercept") + F.col("slope") * F.lit(float(future_x))
        )
    return agg
