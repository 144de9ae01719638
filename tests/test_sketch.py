"""Sketch operators: bloom membership, count-min, HLL.

The exact-vs-DuckDB equivalence of the three driver queries is covered
by test_entry_queries; these tests pin the probabilistic contracts the
oracle can't express: no bloom false negatives, one-sided CMS error,
HLL estimate accuracy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators.sketch import (
    bloom_build,
    bloom_contamination,
    bloom_member,
    cms_topk_compare,
    hll_estimate,
    hll_registers,
)


@pytest.fixture(scope="module")
def words_df(spark):
    rows = [(f"value-{i}",) for i in range(200)]
    return spark.createDataFrame(rows, ["v"])


def test_bloom_no_false_negatives(spark, words_df):
    m, k = 1 << 12, 4
    words = bloom_build(words_df, "v", m, k)
    out = words_df.select(bloom_member(F.col("v"), words, m, k).alias("hit")).collect()
    assert all(r.hit for r in out)


def test_bloom_rejects_most_non_members(spark, words_df):
    m, k = 1 << 12, 4
    words = bloom_build(words_df, "v", m, k)
    others = spark.createDataFrame([(f"other-{i}",) for i in range(500)], ["v"])
    hits = others.select(bloom_member(F.col("v"), words, m, k).alias("hit")).collect()
    fp = sum(r.hit for r in hits) / 500
    # 200 values * 4 probes in 4096 bits -> expected fp ~ (1-e^-0.195)^4 ~ 1e-3
    assert fp < 0.05


def test_bloom_contamination_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    benchmark = docs.filter(F.col("doc_id") % 50 == 0)
    out = bloom_contamination(docs, benchmark).collect()
    assert out, "benchmark docs must at least flag themselves"
    for r in out:
        assert r.n_bloom >= r.n_exact
        assert r.bloom_contaminated
    # every (>=13-word) benchmark doc overlaps itself exactly
    flagged_exact = {r.doc_id for r in out if r.contaminated}
    long_bench = {
        r.doc_id
        for r in benchmark.collect()
        if len([t for t in r.text.split() if t]) >= 13
    }
    assert long_bench <= flagged_exact


def test_cms_one_sided_error(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    out = cms_topk_compare(docs, k=20, depth=4, width=512).collect()
    assert len(out) == 20
    for r in out:
        assert r.cms_est >= r.exact_n, (r.token, r.exact_n, r.cms_est)
    # with 4 independent rows of 512 counters, the min over rows should
    # be exact for at least half of the heavy hitters
    exact_hits = sum(1 for r in out if r.cms_est == r.exact_n)
    assert exact_hits >= 10


def test_cms_estimate_absent_key_is_zero(spark):
    """A key the grid never counted must estimate 0 (empty cell), not
    vanish from the output or min over partial cells."""
    from fluent_bit_spark.operators.sketch import cms_counters, cms_estimate

    counts = spark.createDataFrame([("alpha", 7), ("beta", 3)], ["token", "n"])
    grid = cms_counters(counts, "token", "n", depth=4, width=512)
    keys = spark.createDataFrame(
        [("alpha",), ("never-seen-token",)], ["token"]
    )
    out = {r.token: r.cms_est for r in cms_estimate(grid, keys, "token").collect()}
    assert out["alpha"] >= 7
    assert out["never-seen-token"] == 0


def test_hll_ignores_nulls(spark):
    """COUNT(DISTINCT) semantics: NULL values contribute no register."""
    a = spark.range(50).select(F.concat(F.lit("n-"), F.col("id")).alias("v"))
    with_nulls = a.union(spark.createDataFrame([(None,), (None,)], "v: string"))
    assert sorted(map(tuple, hll_registers(a, "v").collect())) == sorted(
        map(tuple, hll_registers(with_nulls, "v").collect())
    )


def test_hll_estimate_accuracy(spark):
    n = 5000
    df = spark.range(n).select(F.concat(F.lit("user-"), F.col("id")).alias("v"))
    regs = hll_registers(df, "v", p=10).collect()
    assert len(regs) <= 1024
    est = hll_estimate([(r.bucket, r.max_rho) for r in regs], p=10)
    assert abs(est - n) / n < 0.1, est


def test_hll_merge_is_max(spark):
    """Registers of a union == element-wise MAX of the parts — the
    property that makes HLL distributable."""
    a = spark.range(0, 3000).select(F.concat(F.lit("u-"), F.col("id")).alias("v"))
    b = spark.range(2000, 6000).select(F.concat(F.lit("u-"), F.col("id")).alias("v"))
    whole = {
        (r.bucket, r.max_rho) for r in hll_registers(a.union(b), "v").collect()
    }
    ra = dict((r.bucket, r.max_rho) for r in hll_registers(a, "v").collect())
    rb = dict((r.bucket, r.max_rho) for r in hll_registers(b, "v").collect())
    merged = {
        (bkt, max(ra.get(bkt, 0), rb.get(bkt, 0))) for bkt in set(ra) | set(rb)
    }
    assert whole == merged


def test_hll_grouped_rollup_merges_to_overall(spark, sf_dir):
    """hll_merge over per-hour registers == registers of the whole
    stream — the incremental-rollup law the hourly query relies on."""
    from fluent_bit_spark.operators.sketch import hll_merge
    from fluent_bit_spark.transcripts import load_transcripts

    t = load_transcripts(spark, sf_dir).withColumn(
        "hour", F.date_trunc("hour", F.col("ts"))
    )
    hourly = hll_registers(t, "conv_id", p=10, by=("hour",))
    rolled = sorted(map(tuple, hll_merge(hourly).collect()))
    whole = sorted(map(tuple, hll_registers(t, "conv_id", p=10).collect()))
    assert rolled == whole


def test_hist_quantiles_bracket_exact_percentiles(spark, sf_dir):
    """Each histogram estimate's bucket must contain the exact
    q-quantile: lo <= exact <= hi."""
    from fluent_bit_spark.operators.sketch import hist_quantiles

    lens = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.length("text").alias("len"))
    )
    out = {r.q: r for r in hist_quantiles(lens, "len", width=64).collect()}
    values = sorted(r.len for r in lens.collect())
    n = len(values)
    import math

    for q, row in out.items():
        exact = values[math.ceil(q * n) - 1]
        assert row.lo <= exact <= row.hi, (q, exact, row)
        assert row.cum_n >= math.ceil(q * n)


def test_hll_duplicates_do_not_move_registers(spark):
    a = spark.range(100).select(F.concat(F.lit("d-"), F.col("id")).alias("v"))
    dup = a.union(a).union(a)
    assert sorted(map(tuple, hll_registers(a, "v").collect())) == sorted(
        map(tuple, hll_registers(dup, "v").collect())
    )
