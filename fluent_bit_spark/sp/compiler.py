"""Compile stream-processor AST to Spark DataFrame plans.

Semantics mirrored from the reference interpreter
(src/stream_processor/flb_sp.c):

- value model: comparisons coerce int<->float, and strings coerce to
  numbers when compared against a numeric literal (object_to_number,
  flb_sp.c:346; samples.json row 9 carries "bytes": "10.30" as a
  string to exercise exactly this) => try_cast to double on both sides
  of numeric comparisons.
- missing keys: selecting a missing key silently omits it (here: NULL
  column); @record.contains(key) => IS NOT NULL / map_contains_key.
- aggregation mixing: bare keys alongside aggregates are rejected
  unless they appear in GROUP BY (flb_sp.c:217,:590) => SpSqlError.
- windows: the reference uses processing-time timers (flb_sp.c:600-634);
  we bind TUMBLING/HOPPING to event time via F.window(ts, size, slide)
  — deterministic, same aggregate surface. Window bounds are emitted
  as window_start/window_end columns.
- output naming: aggregate results are named 'SUM(key)' or the alias
  (package_results, flb_sp.c:1224-1331).
- CREATE STREAM: result registered as a new stream for chaining
  (flb_sp_stream.c:36-90); optional tag property sets a literal tag
  column on the result.
- SNAPSHOT/FLUSH (flb_sp_snapshot.c): CREATE SNAPSHOT buffers the last
  `limit` records and/or the records within `seconds` of the newest
  (time-based ring, flb_sp_snapshot.c:122); FLUSH SNAPSHOT replays the
  buffered rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluent_bit_spark.operators.route import glob_predicate
from fluent_bit_spark.sp import parser as P


class SpSqlError(ValueError):
    pass


@dataclass
class _Snapshot:
    select: P.Select
    limit: int | None
    df: DataFrame


class SpEngine:
    """Holds the stream registry (name -> DataFrame) and executes SP
    SQL statements against it."""

    def __init__(
        self,
        spark: SparkSession,
        streams: dict[str, DataFrame] | None = None,
        ts_col: str = "ts",
        tag_col: str = "tag",
        now: object | None = None,
        watermark: str | None = None,
    ):
        self.spark = spark
        self.streams: dict[str, DataFrame] = dict(streams or {})
        self.snapshots: dict[str, _Snapshot] = {}
        self.ts_col = ts_col
        self.tag_col = tag_col
        self.now = now  # fixed timestamp for deterministic NOW()/UNIX_TIMESTAMP()
        # late-data bound for STREAMING sources: windowed aggregates get
        # withWatermark(ts, watermark) so state is evictable (the
        # reference's window timer flushes play the same role,
        # flb_sp_window.c). Ignored for batch frames.
        self.watermark = watermark or "10 minutes"

    # -- public API ---------------------------------------------------------
    def register(self, name: str, df: DataFrame) -> None:
        self.streams[name] = df

    def execute(self, sql: str) -> DataFrame | None:
        ast = P.parse(sql)
        if isinstance(ast, P.Select):
            return self._select(ast)
        if isinstance(ast, P.CreateStream):
            df = self._select(ast.select)
            if "tag" in ast.props:
                df = df.withColumn(self.tag_col, F.lit(ast.props["tag"]))
            self.streams[ast.name] = df
            return df
        if isinstance(ast, P.CreateSnapshot):
            limit = int(ast.props["limit"]) if "limit" in ast.props else None
            seconds = int(ast.props["seconds"]) if "seconds" in ast.props else None
            src = self._source(ast.select)
            if ast.select.where is not None:
                src = src.filter(self._cond(src, ast.select.where))
            if seconds:
                # time-based ring (flb_sp_snapshot.c:122): retain records
                # within `seconds` of the newest buffered record (batch
                # analog of the arrival-relative ring).  The newest ts is
                # a 1-row partial-aggregate broadcast back over the
                # stream -- NOT an unpartitioned window, which would
                # shuffle the whole stream to one partition
                # collision-proof internal name: the source stream may
                # legitimately carry a user column called _maxts, and a
                # bare join would make the reference ambiguous
                mxc = "__sp_snapshot_maxts"
                mx = src.agg(F.max(F.col(self.ts_col)).alias(mxc))
                src = (
                    src.join(F.broadcast(mx))
                    .filter(
                        F.col(self.ts_col)
                        >= F.col(mxc) - F.expr(f"INTERVAL {seconds} SECONDS")
                    )
                    .drop(mxc)
                )
            if limit:
                # newest-`limit` ring without a single-partition global
                # window: per-partition pre-limit bounds the final rank
                # to limit * num_partitions rows (skew.topk_per_group)
                from fluent_bit_spark.operators.skew import topk_per_group

                src = topk_per_group(
                    src, [], [F.col(self.ts_col).desc()], limit
                )
            self.snapshots[ast.name] = _Snapshot(ast.select, limit, src)
            return None
        if isinstance(ast, P.FlushSnapshot):
            snap = self.snapshots.get(ast.name)
            if snap is None:
                raise SpSqlError(f"unknown snapshot {ast.name!r}")
            return snap.df
        raise SpSqlError(f"unsupported statement {type(ast).__name__}")

    # -- internals ----------------------------------------------------------
    def _source(self, sel: P.Select) -> DataFrame:
        if sel.source_type == "STREAM":
            try:
                return self.streams[sel.source]
            except KeyError:
                raise SpSqlError(f"unknown stream {sel.source!r}") from None
        # TAG:pattern — glob over the tag column across all streams
        import functools

        frames = [
            df.filter(glob_predicate(F.col(self.tag_col), sel.source))
            for df in self.streams.values()
            if self.tag_col in df.columns
        ]
        if not frames:
            raise SpSqlError("TAG: source requires registered tagged streams")
        return functools.reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)

    def _key_col(self, df: DataFrame, sub: P.Subkey) -> Column:
        if sub.name not in df.columns:
            return F.lit(None)
        c = F.col(sub.name)
        for p in sub.path:
            c = F.try_element_at(c, F.lit(p))
        return c

    def _scalar_fn(self, key: P.Key) -> Column:
        if key.func == "NOW":
            base = F.lit(self.now).cast("timestamp") if self.now else F.current_timestamp()
            return F.date_format(base, "yyyy-MM-dd HH:mm:ss")
        if key.func == "UNIX_TIMESTAMP":
            base = F.lit(self.now).cast("timestamp") if self.now else F.current_timestamp()
            return F.unix_timestamp(base)
        if key.func == "RECORD_TAG":
            return F.col(self.tag_col)
        if key.func == "RECORD_TIME":
            # NTZ timestamps route through LTZ (UTC session); ANSI
            # forbids the direct double cast
            return F.col(self.ts_col).cast("timestamp_ltz").cast("double")
        raise SpSqlError(f"unknown function {key.func}")

    def _cond(self, df: DataFrame, node) -> Column:
        if isinstance(node, P.BoolOp):
            ops = [self._cond(df, o) for o in node.operands]
            if node.op == "AND":
                return ops[0] & ops[1]
            if node.op == "OR":
                return ops[0] | ops[1]
            return ~ops[0]
        if isinstance(node, P.IsNull):
            c = self._key_col(df, node.key)
            return c.isNotNull() if node.negated else c.isNull()
        if isinstance(node, P.RecordContains):
            if node.key.name not in df.columns:
                return F.lit(False)
            return self._key_col(df, node.key).isNotNull()
        if isinstance(node, P.Comparison):
            return self._compare(df, node)
        if isinstance(node, P.Literal):
            if isinstance(node.value, bool):
                return F.lit(node.value)
            raise SpSqlError(f"bare literal {node.value!r} is not a condition")
        raise SpSqlError(f"bad condition node {node!r}")

    def _compare(self, df: DataFrame, node: P.Comparison) -> Column:
        def side(x, numeric_hint: bool):
            if isinstance(x, P.Literal):
                return F.lit(x.value)
            c = self._key_col(df, x)
            if numeric_hint:
                # int<->float widening + string->number coercion
                return c.cast("string").try_cast("double")
            return c

        numeric = any(
            isinstance(x, P.Literal) and isinstance(x.value, (int, float)) and not isinstance(x.value, bool)
            for x in (node.left, node.right)
        )
        l = side(node.left, numeric)
        r = side(node.right, numeric)
        if numeric:
            l = l.cast("double") if isinstance(node.left, P.Literal) else l
            r = r.cast("double") if isinstance(node.right, P.Literal) else r
        ops = {
            "=": l == r,
            "!=": l != r,
            "<": l < r,
            "<=": l <= r,
            ">": l > r,
            ">=": l >= r,
        }
        try:
            return ops[node.op]
        except KeyError:
            raise SpSqlError(f"unknown operator {node.op!r}") from None

    def _select(self, sel: P.Select) -> DataFrame:
        df = self._source(sel)
        if sel.where is not None:
            df = df.filter(self._cond(df, sel.where))

        aggs = [k for k in sel.keys if k.func in P.AGG_FUNCS or k.func in P.TS_FUNCS]
        bare = [k for k in sel.keys if not k.func and not k.star]

        if aggs:
            group_names = {g.name for g in sel.group_by}
            for k in bare:
                if k.key.name not in group_names:
                    raise SpSqlError(
                        f"key {k.key.name!r} must appear in GROUP BY "
                        "(aggregate/bare mixing is rejected, flb_sp.c:590)"
                    )
            return self._select_aggr(df, sel, aggs)

        # non-aggregated projection
        cols: list[Column] = []
        for k in sel.keys:
            if k.star:
                cols.extend(F.col(c) for c in df.columns)
            elif k.func:
                cols.append(self._scalar_fn(k).alias(k.display()))
            else:
                cols.append(self._key_col(df, k.key).alias(k.display()))
        out = df.select(*cols)
        if sel.limit is not None:
            out = out.limit(sel.limit)
        return out

    def _select_aggr(self, df: DataFrame, sel: P.Select, aggs: list[P.Key]) -> DataFrame:
        group_cols = [self._key_col(df, g).alias(g.name) for g in sel.group_by]
        if df.isStreaming and sel.window:
            # watermarks require TIMESTAMP (LTZ); NTZ sources convert via
            # the UTC session zone
            if dict(df.dtypes).get(self.ts_col) == "timestamp_ntz":
                df = df.withColumn(
                    self.ts_col, F.col(self.ts_col).cast("timestamp_ltz")
                )
            df = df.withWatermark(self.ts_col, self.watermark)
        win = None
        if sel.window:
            size = f"{sel.window.size_sec} seconds"
            if sel.window.kind == "HOPPING":
                win = F.window(F.col(self.ts_col), size, f"{sel.window.advance_sec} seconds")
            else:
                win = F.window(F.col(self.ts_col), size)

        agg_exprs: list[Column] = []
        for k in aggs:
            name = k.display()
            if k.func in P.TS_FUNCS:
                x = self._num(df, k.key)
                y = self._num(df, k.args[0])
                if k.func == "TIMESERIES_FORECAST":
                    future = float(k.args[1]) if len(k.args) > 1 else 0.0
                    expr = (
                        F.regr_intercept(y, x)
                        + F.regr_slope(y, x) * (F.max(x) + F.lit(future))
                    )
                else:  # FORECAST_R: x at which y reaches target (cap arg ignored)
                    target = float(k.args[1])
                    expr = (F.lit(target) - F.regr_intercept(y, x)) / F.regr_slope(y, x)
                agg_exprs.append(expr.alias(name))
                continue
            if k.func == "COUNT":
                c = F.count("*") if k.key is None else F.count(self._key_col(df, k.key))
                agg_exprs.append(c.alias(name))
                continue
            target = self._num(df, k.key) if k.func in ("SUM", "AVG") else self._key_col(df, k.key)
            fn = {"MIN": F.min, "MAX": F.max, "SUM": F.sum, "AVG": F.avg}[k.func]
            agg_exprs.append(fn(target).alias(name))

        keys = list(group_cols)
        if win is not None:
            keys.append(win.alias("_w"))
        grouped = df.groupBy(*keys) if keys else df.groupBy()
        out = grouped.agg(*agg_exprs)
        if win is not None:
            out = out.select(
                *[g.name for g in sel.group_by],
                F.col("_w.start").alias("window_start"),
                F.col("_w.end").alias("window_end"),
                *[k.display() for k in aggs],
            )
        if sel.limit is not None:
            out = out.limit(sel.limit)
        return out

    def _num(self, df: DataFrame, sub: P.Subkey) -> Column:
        """Numeric view of a key with the reference's string->number
        coercion (non-numeric strings become NULL, ignored by aggs)."""
        return self._key_col(df, sub).cast("string").try_cast("double")
