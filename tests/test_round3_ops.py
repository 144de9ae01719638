"""Unit tests for the round-3 batch-1 operators: template mining,
byte-budget retention, partition watermarks, skew report."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


def test_template_mine_masks_and_thresholds(spark):
    from fluent_bit_spark.operators.parse import template_mine

    rows = [
        ("c1", "GET /api/users/17 from 10.0.3.1 took 250ms"),
        ("c2", "GET /api/users/99 from 10.9.0.250 took 3ms"),
        ("c3", "GET /api/users/5 from 172.16.0.9 took 77ms"),
        ("c1", "unique line no repeats 1"),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "text"])
    out = {r["template"]: r for r in template_mine(df, min_groups=3).collect()}
    assert list(out) == ["GET /api/users/<N> from <IP> took <N>ms"]
    row = out["GET /api/users/<N> from <IP> took <N>ms"]
    assert row["n_turns"] == 3 and row["n_groups"] == 3
    # deterministic exemplar: lexicographic min of the raw lines
    assert row["sample"] == "GET /api/users/17 from 10.0.3.1 took 250ms"


def test_retention_by_budget_exact_cutoff(spark):
    from fluent_bit_spark.sinks import retention_by_budget

    # one sink, 3 day-buckets, 10 bytes per row; budget 45 bytes keeps
    # the newest full day (30b), then 1 row of the boundary day (40b);
    # the next boundary row would hit 50 > 45.
    rows = [
        ("s", f"c{i}", 0, _ts(day, hour), "x" * 10)
        for day, nrows in ((3, 3), (2, 4), (1, 5))
        for hour, i in zip(range(nrows), range(nrows))
    ]
    df = spark.createDataFrame(rows, ["sink", "conv_id", "turn_idx", "ts", "text"])
    kept = retention_by_budget(df, budget_bytes=45).collect()
    by_day = {}
    for r in kept:
        by_day.setdefault(r["ts"].day, []).append(r)
    assert sorted(by_day) == [2, 3]
    assert len(by_day[3]) == 3  # newest day fully kept
    assert len(by_day[2]) == 1  # boundary day partially kept
    # within the boundary day the NEWEST row wins (ts DESC order)
    assert by_day[2][0]["ts"].hour == 3
    assert all(r["nbytes"] == 10 for r in kept)


def test_retention_keeps_everything_under_budget(spark):
    from fluent_bit_spark.sinks import retention_by_budget

    rows = [("s", "c", i, _ts(1, i), "abc") for i in range(4)]
    df = spark.createDataFrame(rows, ["sink", "conv_id", "turn_idx", "ts", "text"])
    assert retention_by_budget(df, budget_bytes=1000).count() == 4


def test_partition_watermarks_cover_all_rows(spark, sf_dir):
    from fluent_bit_spark.metrics import partition_watermarks
    from fluent_bit_spark.transcripts import load_transcripts

    t = load_transcripts(spark, sf_dir)
    wm = partition_watermarks(t, n_buckets=16).collect()
    assert sum(r["n_rows"] for r in wm) == t.count()
    assert all(0 <= r["bucket"] < 16 for r in wm)
    assert all(r["low_ts"] <= r["watermark"] for r in wm)
    # distinct conv keys partition cleanly across buckets
    assert sum(r["n_keys"] for r in wm) == t.select("conv_id").distinct().count()


def test_skew_report_orders_and_shares(spark):
    from fluent_bit_spark.operators.skew import skew_report

    rows = [("hot", i) for i in range(60)] + [
        (f"cold{j}", i) for j in range(4) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx"])
    rep = skew_report(df, topk=3).collect()
    assert [r["conv_id"] for r in rep] == ["hot", "cold0", "cold1"]
    assert [r["rnk"] for r in rep] == [1, 2, 3]
    assert rep[0]["n_rows"] == 60
    assert rep[0]["share_ppm"] == 600_000  # 60/100 exactly
    assert rep[1]["share_ppm"] == 100_000


def test_canonical_branch_keeps_latest(spark):
    from fluent_bit_spark.operators.transcript_qa import canonical_branch

    rows = [
        ("c1", 0, "first try", _ts(1, 0)),
        ("c1", 0, "regenerated", _ts(1, 2)),
        ("c1", 1, "only", _ts(1, 3)),
        ("c2", 0, "tie-a", _ts(2, 0)),
        ("c2", 0, "tie-b", _ts(2, 0)),  # same ts: text DESC breaks the tie
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text", "ts"])
    out = {(r["conv_id"], r["turn_idx"]): r for r in canonical_branch(df).collect()}
    assert out[("c1", 0)]["text"] == "regenerated"
    assert out[("c1", 0)]["n_branches"] == 2
    assert out[("c1", 1)]["n_branches"] == 1
    assert out[("c2", 0)]["text"] == "tie-b"


def test_reliability_report_wilson_math(spark):
    from fluent_bit_spark.operators.aggregate import reliability_report
    import math

    # 1/1 errors vs 90/100: raw rate ranks t1 worse, Wilson ranks t2 worse
    rows = [("t1", True)] + [("t2", i < 90) for i in range(100)]
    df = spark.createDataFrame(rows, ["tool", "is_err"])
    out = {r["tool"]: r for r in reliability_report(df).collect()}
    assert out["t1"]["err_rate"] == 1.0 and out["t2"]["err_rate"] == 0.9
    assert out["t1"]["wilson_lb"] < out["t2"]["wilson_lb"]

    def wilson(e, n, z=1.96):
        p = e / n
        return (p + z * z / (2 * n) - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) / (
            1 + z * z / n
        )

    assert abs(out["t2"]["wilson_lb"] - wilson(90, 100)) < 1e-6


def test_minhash_contam_boundary_only(spark):
    from fluent_bit_spark.operators.curation import minhash_contam

    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "completely different words entirely here now")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(7, base + " x")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in minhash_contam(corpus, bench, threshold=0.7).collect()}
    # docs 1 and 2 near-duplicate the bench item; doc 3 does not; the
    # corpus-corpus pair (1,2) must NOT appear (boundary filter)
    assert set(out) == {1, 2}
    assert all(r["n_bench"] == 1 for r in out.values())


def test_reply_latency_pairs_only(spark):
    from fluent_bit_spark.operators.transcript_qa import reply_latency

    rows = [
        ("c1", 0, "human", _ts(1, 0)),       # user (normalized)
        ("c1", 1, "ai", _ts(1, 2)),          # assistant after user -> 2h wait
        ("c1", 2, "assistant", _ts(1, 3)),   # assistant after assistant -> no row
        ("c1", 3, "system", _ts(1, 4)),
        ("c1", 4, "assistant", _ts(1, 5)),   # after system -> no row
        ("c2", 0, "assistant", _ts(2, 0)),   # first turn -> no row
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "ts"])
    out = reply_latency(df).collect()
    assert len(out) == 1
    assert out[0]["turn_idx"] == 1
    assert out[0]["wait_us"] == 2 * 3600 * 1_000_000


def test_mad_outliers_flags_spikes_only(spark):
    from fluent_bit_spark.operators.sketch import mad_outliers

    rows = [("c", i, 100 + (i % 7)) for i in range(50)] + [("c", 99, 50_000)]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "latency_cents"])
    out = mad_outliers(df, "latency_cents", width=16).collect()
    assert [r["turn_idx"] for r in out] == [99]
    assert abs(out[0]["robust_z"]) > 3.5
    # estimates are grid-quantized integers (hist hi edges)
    assert out[0]["med_est"] % 16 == 15 and out[0]["mad_est"] % 16 == 15


def test_zone_maps_prune(spark):
    import datetime as dt

    from fluent_bit_spark.sources import prune_flags, zone_maps

    rows = [("c1", dt.datetime(2024, 1, d, 12)) for d in (1, 2, 10, 25)]
    df = spark.createDataFrame(rows, ["conv_id", "ts"])
    zm = prune_flags(
        zone_maps(df, F.date_trunc("day", F.col("ts"))),
        dt.datetime(2024, 1, 10),
        dt.datetime(2024, 1, 20),
    ).collect()
    verdict = {r["part"].day: r["pruned"] for r in zm}
    assert verdict == {1: True, 2: True, 10: False, 25: True}


def test_retry_schedule_capped_exponential(spark):
    from fluent_bit_spark.retry import retry_schedule_frame

    df = spark.createDataFrame([("c", 0, _ts(1, 0))], ["conv_id", "turn_idx", "ts"])
    out = sorted(retry_schedule_frame(df).collect(), key=lambda r: r["attempt"])
    assert [r["delay_s"] for r in out] == [2, 4, 8, 16, 30]  # 32 capped at 30
    # retry_at is the CUMULATIVE schedule
    offsets = [(r["retry_at"] - _ts(1, 0)).total_seconds() for r in out]
    assert offsets == [2, 6, 14, 30, 60]


def test_burn_rate_alerts_multiwindow(spark):
    from fluent_bit_spark.operators.aggregate import burn_rate_alerts

    # hour 0: 5/10 errors (short burn 2.5); hours 1-5: 0/10 each ->
    # long burn over the 6h block = 5/60/0.2 ~ 0.417 -> NO alert.
    # hour 6: 10/10 errors, alone in its block -> both burns 5.0 -> alert.
    rows = (
        [("e" if i < 5 else "ok", _ts(1, 0)) for i in range(10)]
        + [("ok", _ts(1, h)) for h in range(1, 6) for _ in range(10)]
        + [("e", _ts(1, 6)) for _ in range(10)]
    )
    df = spark.createDataFrame(rows, ["kind", "ts"])
    out = {
        r["window_start"].hour: r
        for r in burn_rate_alerts(df, F.col("kind") == "e", slo=0.8).collect()
    }
    assert out[0]["short_burn"] == 2.5 and not out[0]["alert"]
    assert out[6]["alert"] and out[6]["short_burn"] == 5.0
    assert not out[3]["alert"]


def test_ttr_by_group(spark):
    from fluent_bit_spark.operators.text_analysis import ttr_by_group

    df = spark.createDataFrame(
        [
            (1, "a b a b", "s1"),
            (2, "a c", "s1"),
            (3, "x x x x", "s2"),
            (4, "y", None),  # NULL group excluded
        ],
        ["doc_id", "text", "source"],
    )
    out = {r["source"]: r for r in ttr_by_group(df).collect()}
    assert set(out) == {"s1", "s2"}
    assert out["s1"]["n_tokens"] == 6 and out["s1"]["n_types"] == 3
    assert out["s1"]["n_docs"] == 2
    assert out["s1"]["ttr"] == 0.5
    assert out["s2"]["n_types"] == 1


def test_ann_recall_eval_bounds(spark, sf_dir):
    from fluent_bit_spark.operators.similarity import ann_recall_eval

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = embs.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    cands = embs.filter(F.col("vec_id") >= 5)
    out = ann_recall_eval(cands, qs, k=10, nbits=4, probe_bits=1).collect()
    assert len(out) == 5  # every query present, even at zero recall
    assert all(0 <= r["n_common"] <= 10 for r in out)
    assert all(abs(r["recall_at_k"] - r["n_common"] / 10.0) < 1e-9 for r in out)
    # multi-probe at 4 bits probes 5 of 16 buckets; recall must be
    # nonzero overall or the operating point is broken
    assert sum(r["n_common"] for r in out) > 0


def test_mtbf_report_span_math(spark):
    from fluent_bit_spark.operators.aggregate import mtbf_report

    rows = [
        ("bash", _ts(1, 0)),
        ("bash", _ts(1, 2)),
        ("bash", _ts(1, 6)),   # span 6h over 2 gaps -> 3h
        ("sql", _ts(2, 0)),    # single failure -> NULL mtbf
        (None, _ts(3, 0)),     # NULL key excluded
    ]
    df = spark.createDataFrame(rows, ["tool", "ts"])
    out = {r["tool"]: r for r in mtbf_report(df).collect()}
    assert set(out) == {"bash", "sql"}
    assert out["bash"]["mtbf_us"] == 3 * 3600 * 1_000_000
    assert out["sql"]["mtbf_us"] is None


def test_scd2_history_intervals(spark):
    from fluent_bit_spark.operators.enrich import scd2_history

    rows = [
        ("c", 0, "bash", _ts(1, 0)),
        ("c", 1, "bash", _ts(1, 1)),   # no change -> collapsed
        ("c", 2, None, _ts(1, 2)),     # bash -> NULL is a change
        ("c", 3, None, _ts(1, 3)),     # still NULL -> collapsed
        ("c", 4, "sql", _ts(1, 4)),    # NULL -> sql is a change
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "tool", "ts"])
    out = sorted(scd2_history(df).collect(), key=lambda r: r["valid_from"])
    assert [(r["tool"], r["valid_from"].hour) for r in out] == [
        ("bash", 0), (None, 2), ("sql", 4),
    ]
    # half-open chaining: each valid_to is the next valid_from
    assert out[0]["valid_to"] == out[1]["valid_from"]
    assert out[1]["valid_to"] == out[2]["valid_from"]
    assert [r["is_current"] for r in out] == [False, False, True]


def test_late_data_report_ppm(spark):
    from fluent_bit_spark.streaming import late_data_report

    df = spark.createDataFrame(
        [("a", _ts(1, 0)), ("b", _ts(1, 0)), ("c", _ts(1, 0)), ("d", _ts(1, 0))],
        ["k", "ts"],
    )
    delay = F.when(F.col("k") == "a", 1200).otherwise(10)  # one late row
    out = late_data_report(df, delay, watermark_s=600).collect()
    by_hour = {r["proc_hour"].hour: r for r in out}
    # the late row ARRIVES in hour 0+20min -> same hour bucket here
    assert by_hour[0]["n_total"] == 4 and by_hour[0]["n_late"] == 1
    assert by_hour[0]["late_ppm"] == 250_000


def test_cdc_apply_merge_semantics(spark):
    from fluent_bit_spark.operators.enrich import cdc_apply

    base = spark.createDataFrame(
        [("c", 0, "keep me"), ("c", 1, "update me"), ("c", 2, "delete me")],
        ["conv_id", "turn_idx", "text"],
    )
    changes = spark.createDataFrame(
        [
            ("c", 1, "U", 1, "v1"),
            ("c", 1, "U", 2, "v2"),      # higher seq wins
            ("c", 2, "D", 1, "x"),
            ("c", 9, "I", 1, "brand new"),
            ("c", 8, "D", 1, "delete of absent key -> no row"),
        ],
        ["conv_id", "turn_idx", "op", "seq", "text"],
    )
    out = {r["turn_idx"]: r["text"] for r in cdc_apply(base, changes).collect()}
    assert out == {0: "keep me", 1: "v2", 9: "brand new"}


def test_compaction_plan_groups_small_parts(spark):
    from fluent_bit_spark.sources import compaction_plan

    rows = [(f"p{i:02d}", 10) for i in range(10)] + [("p99", 500)]
    df = spark.createDataFrame(rows, ["part", "n_bytes"])
    out = {r["part"]: r["task_id"] for r in
           compaction_plan(df, target_bytes=40, small_bytes=100).collect()}
    assert "p99" not in out          # big partition excluded
    # 10-byte parts, 40-byte target: 4 parts per task in part order
    assert [out[f"p{i:02d}"] for i in range(10)] == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]


def test_kfold_assign_exact_balance(spark, sf_dir):
    from fluent_bit_spark.operators.sampling import kfold_assign

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = kfold_assign(docs, k=5).collect()
    assert len(out) == docs.count()
    sizes = {}
    for r in out:
        sizes.setdefault(r["lang"], {}).setdefault(r["fold"], 0)
        sizes[r["lang"]][r["fold"]] += 1
    for lang, folds in sizes.items():
        # exact balance: fold sizes within a stratum differ by <= 1
        assert max(folds.values()) - min(folds.values()) <= 1, (lang, folds)
    # deterministic: same input -> same assignment
    again = {(r["doc_id"]): r["fold"] for r in kfold_assign(docs, k=5).collect()}
    assert all(again[r["doc_id"]] == r["fold"] for r in out)


def test_zorder_key_vectors(spark):
    from fluent_bit_spark.operators.layout import zorder_key
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(3, 1), (0, 0), (1, 0), (0, 1), (7, 0)], ["x", "y"]
    )
    out = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y"), bits=4).alias("z")
        ).collect()
    }
    # x on even bit positions, y on odd: z(3,1)=0b0111, z(7,0)=0b010101
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(3, 1)] == 7
    assert out[(7, 0)] == 0b010101


def test_zorder_layout_ranges_are_rectangles(spark):
    from fluent_bit_spark.operators.layout import zorder_layout

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = zorder_layout(df, "x", "y", bits=5, file_bits=4).collect()
    assert sum(r.n_rows for r in out) == 1024 and len(out) == 16
    for r in out:
        # each key-prefix file covers an exact 16x4 or 4x16 rectangle
        assert (r.x_max - r.x_min + 1) * (r.y_max - r.y_min + 1) == r.n_rows
