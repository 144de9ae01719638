"""Pipeline metrics + lineage.

Mirrors the reference's metric ids (include/fluent-bit/flb_metrics.h:
30-38): per input N_RECORDS/N_BYTES, per output OUT_OK_RECORDS/
OUT_OK_BYTES/errors/retries — re-expressed as Spark accumulators
(cheap, collected driver-side after actions) plus a lineage table.

Counting happens where the data already flows: `instrument_input`
attaches a `DataFrame.observe()` aggregate (computed inside the JVM as
the plan executes — zero extra jobs, zero Python in the row path, no
Tungsten-defeating RDD round-trip); `snapshot()` after your action
reads the totals from every observation that has completed.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class PipelineMetrics:
    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self.spark = spark
        self.out_ok: dict[str, object] = {}
        self._observations: list[Observation] = []
        self._sc = sc

    def instrument_input(self, df: DataFrame, bytes_col: str = "text") -> DataFrame:
        """Count records/bytes where the plan already runs: a named
        `observe()` aggregate piggybacked on the existing stage (the
        reference's N_RECORDS/N_BYTES counters, flb_metrics.h:30-33).
        Totals become visible after the first action that consumes the
        returned DataFrame."""
        obs = Observation(f"input_{len(self._observations)}")
        exprs = [F.count(F.lit(1)).alias("records")]
        if bytes_col in df.columns:
            exprs.append(
                F.coalesce(F.sum(F.length(bytes_col)), F.lit(0)).alias("bytes")
            )
        out = df.observe(obs, *exprs)
        self._observations.append(obs)
        return out

    def sink_accumulator(self, sink: str):
        if sink not in self.out_ok:
            self.out_ok[sink] = self._sc.accumulator(0)
        return self.out_ok[sink]

    def record_sink(self, sink: str, records: int) -> None:
        self.sink_accumulator(sink).add(int(records))

    @staticmethod
    def _observed(obs: Observation) -> dict:
        # non-blocking: empty dict until the observed action completes.
        # `_jo`/`getOrEmpty` are classic-session internals; under Spark
        # Connect (no _jo) or across version drift we report
        # not-yet-observed rather than crash snapshot().
        jo = getattr(obs, "_jo", None)
        if jo is None:
            return {}
        try:
            if jo.getOrEmpty().isEmpty():
                return {}
        except Exception:
            return {}
        return obs.get

    def snapshot(self) -> dict:
        seen = [self._observed(o) for o in self._observations]
        return {
            "records_in": sum(int(s.get("records", 0)) for s in seen),
            "bytes_in": sum(int(s.get("bytes", 0)) for s in seen),
            "out_ok": {k: v.value for k, v in self.out_ok.items()},
        }


def lineage_rows(
    spark: SparkSession,
    run_id: str,
    stage: str,
    metrics: dict,
    extra: dict | None = None,
) -> DataFrame:
    """One lineage record per (run, stage): who produced what, when,
    with counts — the queryable audit trail of a pipeline run."""
    row = {
        "run_id": run_id,
        "stage": stage,
        "at": time.time(),
        "metrics": {k: str(v) for k, v in metrics.items()},
        **(extra or {}),
    }
    return spark.createDataFrame([row])


def summarize_counts(df: DataFrame, keys: list[str], bytes_col: str | None = "text") -> DataFrame:
    """Declarative metrics: counts (+bytes) per key set computed inside
    the engine (preferred at scale over accumulators — it is itself a
    tiny aggregate job Catalyst fuses with the main plan when cached)."""
    aggs = [F.count("*").alias("records")]
    if bytes_col and bytes_col in df.columns:
        aggs.append(F.sum(F.length(bytes_col)).alias("bytes"))
    return df.groupBy(*keys).agg(*aggs)


def partition_watermarks(
    df: DataFrame,
    n_buckets: int = 16,
    key_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-partition watermark + lineage metrics: bucket rows by a
    portable hash of the conversation key (md5-slice — the same
    engine-agnostic convention the dedup/sketch family uses) and report
    each bucket's high/low watermark, row count, and distinct-key
    count. This is the table `ResumableBatchJob` checkpoints per
    partition (checkpoint.py): a killed run replays only buckets whose
    recorded watermark trails the source's, never reprocessing finished
    ones — the north rule's "per-partition watermarks with lineage +
    metrics" as a queryable frame.

    Scale shape: one groupBy on a 16-way (configurable) bucket id with
    map-side partial min/max/count; distinct keys per bucket are exact
    but bucket-local, so no global distinct shuffle.
    """
    from fluent_bit_spark.operators.dedup import md5_32

    bucket = (md5_32(F.col(key_col)) % F.lit(n_buckets)).cast("int")
    return (
        df.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.max(F.col(ts_col)).alias("watermark"),
            F.min(F.col(ts_col)).alias("low_ts"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col(key_col)).alias("n_keys"),
        )
    )
