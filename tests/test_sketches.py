"""Probabilistic sketches: Count-Min, Bloom, HyperLogLog, Misra-Gries.

The driver gate already proves bit-level oracle parity (cms_token_counts /
bloom_screen / hll_distinct_tokens) and the MG guaranteed-member invariant
(heavy_hitters_gate); these tests pin the *mathematical* contracts the
gate can't see — one-sided error directions, error bounds, and the
linear-counting branch — on adversarial multi-partition inputs.
"""

import pytest
from pyspark.sql import functions as F

from flexgraph_spark import sketches


@pytest.fixture(scope="module")
def skewed(spark):
    """97 background keys ~50x each, plus two heavy keys, 7 partitions."""
    rows = (
        [(f"w{i % 97}",) for i in range(5000)]
        + [("hot",)] * 800
        + [("warm",)] * 300
    )
    return spark.createDataFrame(rows, "w string").repartition(7)


def test_count_min_never_underestimates(spark, skewed):
    sk = sketches.count_min_build(skewed, "w", depth=4, width=256)
    keys = skewed.select("w").distinct()
    est = sketches.count_min_estimate(sk, keys, "w", depth=4, width=256)
    true = skewed.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    rows = est.join(true, "w").collect()
    assert len(rows) == 99
    assert all(r.cm_est >= r.n for r in rows)  # one-sided error
    # depth x width sketch is constant-size regardless of input rows
    assert sk.count() <= 4 * 256


def test_count_min_exact_when_wide(spark, skewed):
    # width >> #keys: collisions are possible but the min over 4
    # independent rows makes an all-rows collision for the heavy key
    # astronomically unlikely at width 8192 / 99 keys
    sk = sketches.count_min_build(skewed, "w", depth=4, width=8192)
    est = sketches.count_min_estimate(
        sk, spark.createDataFrame([("hot",)], "w string"), "w",
        depth=4, width=8192,
    ).collect()
    assert est[0].cm_est == 800


def test_count_min_weighted(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "w string, c long"
    )
    sk = sketches.count_min_build(df, "w", depth=2, width=64, count_col="c")
    est = {
        r.w: r.cm_est
        for r in sketches.count_min_estimate(
            sk, df.select("w").distinct(), "w", depth=2, width=64
        ).collect()
    }
    assert est["a"] >= 12 and est["b"] >= 1


def test_bloom_no_false_negatives(spark, skewed):
    bloom = sketches.bloom_build(skewed, "w", num_bits=1 << 12, num_hashes=5)
    present = skewed.select("w").distinct()
    pr = sketches.bloom_probe(
        bloom, present, "w", num_bits=1 << 12, num_hashes=5
    ).collect()
    assert all(r.maybe_present for r in pr)  # the Bloom guarantee


def test_bloom_false_positive_rate_sane(spark, skewed):
    bloom = sketches.bloom_build(skewed, "w", num_bits=1 << 14, num_hashes=5)
    absent = spark.range(500).select(
        F.concat(F.lit("absent"), F.col("id")).alias("w")
    )
    pr = sketches.bloom_probe(
        bloom, absent, "w", num_bits=1 << 14, num_hashes=5
    ).collect()
    fp = sum(1 for r in pr if r.maybe_present)
    # 99 keys * 5 hashes in 16384 bits -> theoretical fp ~ (1-e^-495/16384)^5
    # ~ 2e-8; allow generous slack
    assert fp <= 2


def test_hll_within_standard_error(spark):
    n = 20_000
    df = spark.range(n).select(F.concat(F.lit("k"), F.col("id")).alias("w"))
    regs = sketches.hll_registers(df, "w", precision=10)
    est = sketches.hll_estimate(regs, precision=10).collect()[0].hll_est
    # sigma ~ 1.04/sqrt(1024) ~ 3.25%; assert within 4 sigma
    assert abs(est - n) / n < 0.13
    assert regs.count() <= 1 << 10


def test_hll_linear_counting_small_range(spark):
    # 30 distinct << 2.5 * m: the linear-counting branch must fire and be
    # near-exact (V close to m, m*ln(m/V) ~ n)
    df = spark.range(30).select(F.concat(F.lit("s"), F.col("id")).alias("w"))
    est = sketches.hll_estimate(
        sketches.hll_registers(df, "w", precision=10), precision=10
    ).collect()[0].hll_est
    assert abs(est - 30) < 3


def test_hll_grouped(spark):
    df = spark.range(5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("w"),
        (F.col("id") % 2 == 0).cast("string").alias("g"),
    )
    out = {
        r.g: r.hll_est
        for r in sketches.hll_estimate(
            sketches.hll_registers(df, "w", precision=10, group_cols=["g"]),
            precision=10,
            group_cols=["g"],
        ).collect()
    }
    for g, n in (("true", 2500), ("false", 2500)):
        assert abs(out[g] - n) / n < 0.13


def test_misra_gries_guarantee_and_bounds(spark, skewed):
    k = 8
    mg = sketches.misra_gries(skewed, "w", k=k)
    rows = {r.w: r.mg_est for r in mg.collect()}
    n_total = skewed.count()
    true = {r.w: r.n for r in
            skewed.groupBy("w").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(rows) <= k
    # guarantee: freq > N/(k+1) is present ('hot' at 800 > 6100/9)
    for w, n in true.items():
        if n > n_total / (k + 1):
            assert w in rows
    # error bounds: underestimate, off by at most N/(k+1)
    for w, est in rows.items():
        assert est <= true[w]
        assert true[w] - est <= n_total / (k + 1) + 1


def test_misra_gries_weighted(spark):
    df = spark.createDataFrame(
        [("a", 100), ("b", 2), ("c", 1), ("a", 50)] + [(f"x{i}", 1) for i in range(40)],
        "w string, c long",
    ).repartition(3)
    mg = {r.w: r.mg_est for r in
          sketches.misra_gries(df, "w", k=4, count_col="c").collect()}
    assert "a" in mg  # 150 of 193 total, far above N/5
    assert mg["a"] <= 150
