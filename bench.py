"""Benchmark harness.

Default mode (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`--scaling` mode (north-rule evidence): run the full pipeline on the
same input at local[8] and local[32], report turns/sec at both and the
scaling efficiency thr(32) / (4 * thr(8)); append results to
BENCH/BASELINE.md.

Work is forced with the `noop` write format (full computation, no
driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "1"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _sf_label(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.0


def build_source(spark):
    from fluent_bit_spark.transcripts import synth_transcripts

    return synth_transcripts(spark, SF_DIR, replicate=REPLICATE)


def bench_queries(spark, source):
    """Headline queries; each returns a DataFrame to force."""
    from fluent_bit_spark.plans import flagship
    from fluent_bit_spark.operators.route import explode_routes
    from fluent_bit_spark.operators.aggregate import counter, flowcounter
    from fluent_bit_spark.operators.skew import salted_agg, stable_turn_order
    from pyspark.sql import functions as F

    def pipeline_e2e():
        routed = flagship.route_stage(
            flagship.enrich_stage(flagship.parse_stage(source), spark)
        )
        per_sink = explode_routes(routed)
        return flowcounter(per_sink, ["sink", "tag"], "1 hour")

    def parse_only():
        return flagship.parse_stage(source).select(
            "conv_id", "fmt", "parse_ok", "evt_name", "amount_cents", "code"
        )

    def parse_arrow():
        return flagship.parse_stage(source, backend="arrow").select(
            "conv_id", "fmt", "parse_ok", "evt_name", "amount_cents", "code"
        )

    def route_counts():
        routed = flagship.route_stage(
            flagship.enrich_stage(flagship.parse_stage(source), spark)
        )
        return counter(explode_routes(routed), ["sink"])

    def conv_stats():
        df = source.withColumn("text_len", F.length("text"))
        return salted_agg(
            df,
            "conv_id",
            {"turns": ("count", "conv_id"), "bytes": ("sum", "text_len")},
            salt_buckets=16,
        )

    def stable_order():
        return stable_turn_order(source).filter(F.col("turn_rank") == 1)

    return {
        "pipeline_e2e": pipeline_e2e,
        "parse_native": parse_only,
        "parse_arrow": parse_arrow,
        "route_counts": route_counts,
        "conv_stats_salted": conv_stats,
        "stable_order": stable_order,
    }


def run_default() -> None:
    from fluent_bit_spark.session import get_spark

    spark = get_spark("fbs-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    source = build_source(spark).persist()
    rows = source.count()  # materialize once; also warms the JVM

    queries = bench_queries(spark, source)
    # warmup pass: codegen, broadcast build, python-worker pool spin-up
    for fn in queries.values():
        _force(fn())

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        _force(fn())
        timings[name] = round(time.perf_counter() - t0, 3)

    e2e = timings["pipeline_e2e"]
    print(
        json.dumps(
            {
                "metric": "e2e parse->route->aggregate wall-clock",
                "value": e2e,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_label(SF_DIR),
                "rows": rows,
                "throughput_turns_per_sec": round(rows / e2e, 1) if e2e else None,
                "cpus": CPUS,
                "replicate": REPLICATE,
            }
        )
    )
    spark.stop()


def run_scaling(parallelisms=(8, 32), repeats: int = 3) -> None:
    from fluent_bit_spark.session import get_spark

    results = {}
    rows = None
    for n in parallelisms:
        spark = get_spark(f"fbs-scale-{n}", master=f"local[{n}]", shuffle_partitions=n)
        source = build_source(spark).persist()
        rows = source.count()
        qs = bench_queries(spark, source)
        _force(qs["pipeline_e2e"]())  # warmup
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _force(qs["pipeline_e2e"]())
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        results[n] = {"sec": round(med, 3), "turns_per_sec": round(rows / med, 1)}
        source.unpersist()
        spark.stop()

    lo, hi = parallelisms[0], parallelisms[-1]
    eff = results[hi]["turns_per_sec"] / (
        (hi / lo) * results[lo]["turns_per_sec"]
    )
    out = {
        "metric": "scaling efficiency local[%d] -> local[%d]" % (lo, hi),
        "value": round(eff, 3),
        "unit": "ratio",
        "per_parallelism": results,
        "rows": rows,
        "sf": _sf_label(SF_DIR),
        "replicate": REPLICATE,
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## scaling run (sf={_sf_label(SF_DIR)}, rows={rows}, replicate={REPLICATE})\n\n"
            f"| parallelism | median sec | turns/sec |\n|---|---|---|\n"
            + "".join(
                f"| local[{n}] | {r['sec']} | {r['turns_per_sec']} |\n"
                for n, r in results.items()
            )
            + f"\nscaling efficiency thr({hi})/({hi // lo}*thr({lo})) = **{eff:.3f}** "
            f"(single machine: 'executors' are local cores; see BASELINE.md)\n"
        )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        run_default()
