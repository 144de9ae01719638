"""Enrich operators — the reference's lookup/append filters as
broadcast-join stages.

- `lookup_enrich` ≙ apm_ldap lookup with RETRIES/DEFAULT
  (plugins/filter_apm_ldap/filter_ldap.h:21-45): broadcast left join
  against a small dim table, missing keys filled from defaults —
  the north-star "lookup filter" shape. Also covers filter_kubernetes
  metadata enrich (plugins/filter_kubernetes/kube_meta.c:1312) and
  geoip2 (dim = geo table).
- `record_append` ≙ record_modifier `Record k v`
  (plugins/filter_record_modifier/filter_modifier.c:54-88) and the
  env-constant filters (filter_aws, apm_kubernetes_labels): literal
  columns, no shuffle.

At 100 TB the dim tables here are KBs–MBs; `F.broadcast` pins the
hash-join build side on every executor so the enrich stage is
shuffle-free and stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lookup_enrich(
    df: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str | None = None,
    defaults: dict[str, str] | None = None,
) -> DataFrame:
    """Broadcast left-join `dim` onto `df[key]`; every non-key dim
    column is appended, misses filled from `defaults` (≙ apm_ldap
    DEFAULT on lookup failure)."""
    dim_key = dim_key or key
    value_cols = [c for c in dim.columns if c != dim_key]
    joined = df.join(
        F.broadcast(dim), on=df[key] == dim[dim_key], how="left"
    ).drop(dim[dim_key])
    if defaults:
        joined = joined.withColumns(
            {c: F.coalesce(F.col(c), F.lit(d)) for c, d in defaults.items() if c in value_cols}
        )
    return joined


def record_append(df: DataFrame, fields: dict[str, object]) -> DataFrame:
    """Append literal key/values (record_modifier `Record`, filter_aws)."""
    return df.withColumns({k: F.lit(v) for k, v in fields.items()})


def range_lookup_enrich(
    df: DataFrame,
    ranges: DataFrame,
    key: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    defaults: dict[str, str] | None = None,
) -> DataFrame:
    """Interval lookup (the geoip2 shape, plugins/filter_geoip2: an IP
    maps into a CIDR/range row): broadcast range join
    `lo <= key < hi`, non-matches filled from defaults.

    At scale the ranges table is small (broadcast, no shuffle); the
    join is a broadcast nested-loop with a range predicate — fine for
    dim tables of thousands of intervals. For million-interval tables,
    pre-bucket both sides on floor(key/width) and equi-join first."""
    value_cols = [c for c in ranges.columns if c not in (lo_col, hi_col)]
    joined = df.join(
        F.broadcast(ranges),
        on=(df[key] >= ranges[lo_col]) & (df[key] < ranges[hi_col]),
        how="left",
    ).drop(lo_col, hi_col)
    if defaults:
        joined = joined.withColumns(
            {c: F.coalesce(F.col(c), F.lit(d)) for c, d in defaults.items() if c in value_cols}
        )
    return joined


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the value columns of the
    right row with the greatest `right_ts` <= `left_ts` for the same
    `key` (inclusive bound — a right row at exactly `left_ts` applies).
    Left rows with no prior right row keep NULL values. The time-series
    enrich Spark has no builtin for (the "latest config/deployment
    before this record" lookup; DuckDB spells it ASOF LEFT JOIN).

    Scale shape: instead of a range join (which Spark would execute as
    a broadcast-nested-loop / cartesian with a post-filter — O(n·m) per
    key), both sides are unioned and a single `last(value_struct,
    ignorenulls=True)` running window carries the most recent right-row
    values forward: ONE shuffle on `key`, O(n+m) total work, no
    candidate explosion. Right-side values travel in one struct so all
    value columns always come from the SAME right row.

    Determinism: right rows must be unique per (key, right_ts) — with
    duplicate marker timestamps "the latest prior row" is ill-defined;
    pre-aggregate the right side first. Rows whose packed value struct
    would be entirely NULL still win the as-of race (the struct itself
    is non-null), matching ASOF semantics.

    Skew: one hot key lands in one task. The window is a running
    prefix, so if a key is hot, pre-bucket `left_ts` into coarse epochs
    and seed each epoch with the last right row of the previous epoch —
    not needed for config/deployment-sized right tables.

    NULL semantics match SQL ASOF: a NULL join key or NULL `right_ts`
    never matches (those right rows are dropped; NULL-key left rows
    pass through with NULL values).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, right_ts)]
    if not value_cols:
        raise ValueError("asof_join: value_cols must be non-empty")
    clash = set(value_cols) & {c for c in left.columns if c != key}
    if clash:
        raise ValueError(
            f"asof_join: right value columns {sorted(clash)} collide with "
            "left columns — rename one side first"
        )
    ts, src, packed = "_asof_ts", "_asof_src", "_asof_val"
    left_cols = left.columns
    # markers sort BEFORE left rows at equal ts => inclusive bound;
    # NULL key / NULL ts markers can never be "the latest prior row"
    right = right.filter(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
    r = right.select(
        F.col(key),
        F.col(right_ts).alias(ts),
        F.lit(0).alias(src),
        F.struct(*[F.col(c) for c in value_cols]).alias(packed),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c != key],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias(ts),
        F.lit(1).alias(src),
        F.lit(None).cast(r.schema[packed].dataType).alias(packed),
        *[F.col(c) for c in left_cols if c != key],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts, src)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(packed, F.last(packed, ignorenulls=True).over(w))
    out = carried.filter(F.col(src) == 1).select(
        *left_cols, *[F.col(f"{packed}.{c}").alias(c) for c in value_cols]
    )
    return out


def regex_table_enrich(
    df: DataFrame,
    table: list[tuple[str, dict[str, str]]],
    key: str,
    defaults: dict[str, str] | None = None,
) -> DataFrame:
    """Ordered regex-table lookup (the ua-parser shape,
    plugins/filter_apm_uaparser: a regex list is matched against a
    field, first match supplies the derived fields). The table is
    config-sized, so it compiles to a lazy when-chain — pure JVM, no
    join at all."""
    out_cols: dict[str, object] = {}
    names = sorted({n for _, fields in table for n in fields})
    for name in names:
        expr = None
        for pattern, fields in table:
            if name not in fields:
                continue
            cond = F.col(key).rlike(pattern)
            expr = F.when(cond, F.lit(fields[name])) if expr is None else expr.when(
                cond, F.lit(fields[name])
            )
        if defaults and name in defaults:
            expr = expr.otherwise(F.lit(defaults[name]))
        out_cols[name] = expr
    return df.withColumns(out_cols)
