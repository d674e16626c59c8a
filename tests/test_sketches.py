"""Invariants for the mergeable Bloom / Count-Min sketches and the
sketch-suite registry queries.

The registry queries already have EXACT DuckDB oracles (the oracle
replays the sketch construction); these tests pin the *semantic*
guarantees the oracle can't express — no false negatives, CMS
overestimate-only with the ε·N bound, merge ≡ build-on-union — plus
the sampling properties of doc_sample_per_group.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.sketches import (
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
)

M, K = 2048, 4
D, W = 4, 256


@pytest.fixture(scope="module")
def items(spark):
    # 300 member strings + 300 disjoint non-members.
    return (
        spark.range(600)
        .select(
            F.col("id"),
            F.concat(F.lit("item-"), F.col("id").cast("string")).alias("x"),
            (F.col("id") < 300).alias("is_member"),
        )
    )


def test_bloom_no_false_negatives(spark, items):
    members = items.filter("is_member").select("x")
    bloom = bloom_build(members, "x", M, K)
    probed = bloom_probe(items.select("id", "x", "is_member"), "x", bloom, M, K)
    missed = probed.filter(F.col("is_member") & ~F.col("bloom_hit")).count()
    assert missed == 0


def test_bloom_fp_rate_within_bound(spark, items):
    members = items.filter("is_member").select("x")
    bloom = bloom_build(members, "x", M, K)
    probed = bloom_probe(items.select("id", "x", "is_member"), "x", bloom, M, K)
    fp = probed.filter(~F.col("is_member") & F.col("bloom_hit")).count()
    # theoretical rate (1 - e^{-kn/m})^k ~= 0.022 for n=300,m=2048,k=4;
    # allow generous slack on 300 trials (P[fp > 30] is negligible).
    n = 300
    p = (1 - math.exp(-K * n / M)) ** K
    assert fp <= max(10, int(5 * p * n))


def test_bloom_merge_equals_union_build(spark, items):
    a = items.filter(F.col("id") < 150).select("x")
    b = items.filter((F.col("id") >= 150) & (F.col("id") < 300)).select("x")
    merged = bloom_build(a, "x", M, K).unionByName(bloom_build(b, "x", M, K)).distinct()
    direct = bloom_build(a.unionByName(b), "x", M, K)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


@pytest.fixture(scope="module")
def freq_df(spark):
    # skewed frequencies: item-i appears (i % 7) + 1 times for i < 100
    return (
        spark.range(100)
        .select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("x"),
            ((F.col("id") % 7) + 1).alias("n"),
        )
        .withColumn("rep", F.explode(F.sequence(F.lit(1), F.col("n"))))
        .select("x")
    )


def test_cms_overestimates_within_eps(spark, freq_df):
    sketch = cms_build(freq_df, "x", D, W)
    truth = freq_df.groupBy("x").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(truth, "x", sketch, D, W)
    n_total = freq_df.count()
    eps = math.e / W
    rows = est.collect()
    assert len(rows) == 100
    for r in rows:
        assert r["est"] >= r["true_cnt"]
        # per-row CMS bound holds w.p. 1 - e^-D per item; with D=4 over
        # 100 items allow a couple of excursions but cap them hard.
    over = [r for r in rows if r["est"] > r["true_cnt"] + math.ceil(eps * n_total)]
    assert len(over) <= 5


def test_cms_merge_equals_union_build(spark, freq_df):
    a = freq_df.limit(200)
    b = freq_df.exceptAll(a)
    merged = (
        cms_build(a, "x", D, W)
        .unionByName(cms_build(b, "x", D, W))
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_build(freq_df, "x", D, W)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 3), ("b", 2)], ["x", "w"]
    )
    sketch = cms_build(df, "x", D, W, weight=F.col("w").cast("long"))
    est = cms_estimate(df.select("x").distinct(), "x", sketch, D, W)
    got = {r["x"]: r["est"] for r in est.collect()}
    assert got["a"] >= 8 and got["b"] >= 2
    # with only 2 keys in 256 cells, collisions are essentially
    # impossible across all 4 rows — the min must be exact.
    assert got["a"] == 8
    assert got["b"] == 2


def test_sample_per_group_size_and_determinism(spark, sf_dir):
    fn = REGISTRY["doc_sample_per_group"].fn
    a = fn(spark, sf_dir).collect()
    b = fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_lang: dict[str, int] = {}
    for r in a:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + 1
        assert 1 <= r["sample_rank"] <= 5
    assert all(v <= 5 for v in per_lang.values())


def test_quality_classifier_probabilities_bounded(spark, sf_dir):
    rows = REGISTRY["doc_quality_classifier"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["quality_prob"] <= 1.0
        assert r["n_tokens"] >= 1


def test_bloom_registry_query_invariant(spark, sf_dir):
    rows = REGISTRY["sketch_bloom_decontaminate"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["exact_member"]:
            assert r["bloom_hit"], f"false negative at doc {r['doc_id']}"


def test_cms_registry_query_invariant(spark, sf_dir):
    rows = REGISTRY["sketch_cms_user_counts"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["est_cnt"] >= r["true_cnt"]


def test_bloom_prefilter_sound_and_broadcast(spark, sf_dir):
    """Prefilter must keep every true match (soundness) and probe via
    broadcast semi-joins only — no shuffle of the fact side before the
    exact join."""
    from pyspark.sql import functions as F  # noqa: F811

    from kafka_stream_aggregator_spark.sketches import bloom_build, bloom_prefilter
    from kafka_stream_aggregator_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    li = load_table(spark, sf_dir, "lineitem")
    bloom = bloom_build(o.select("o_orderkey"), "o_orderkey", 1 << 16, 4)
    surv = bloom_prefilter(li, "l_orderkey", bloom, 1 << 16, 4)
    # soundness: every lineitem of a selected order survives
    true_keys = {r[0] for r in o.select("o_orderkey").collect()}
    surv_keys = {r[0] for r in surv.select("l_orderkey").distinct().collect()}
    li_keys = {r[0] for r in li.select("l_orderkey").distinct().collect()}
    assert (true_keys & li_keys) <= surv_keys
    # plan: the k probes are broadcast LeftSemi hash joins
    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4
    assert "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_prefilter_shrinks_probe_side(spark, sf_dir):
    from pyspark.sql import functions as F  # noqa: F811

    from kafka_stream_aggregator_spark.sketches import bloom_build, bloom_prefilter
    from kafka_stream_aggregator_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    li = load_table(spark, sf_dir, "lineitem")
    bloom = bloom_build(o.select("o_orderkey"), "o_orderkey", 1 << 16, 4)
    surv_n = bloom_prefilter(li, "l_orderkey", bloom, 1 << 16, 4).count()
    li_n = li.count()
    match_n = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi").count()
    assert match_n <= surv_n < li_n


def test_bloom_xx64_hasher_same_guarantees(spark, items):
    """The fast-hash (xxhash64) tier keeps the bloom guarantees; it just
    isn't oracle-replayable."""
    members = items.filter("is_member").select("x")
    bloom = bloom_build(members, "x", M, K, hasher="xx64")
    probed = bloom_probe(items.select("id", "x", "is_member"), "x", bloom, M, K,
                         hasher="xx64")
    assert probed.filter(F.col("is_member") & ~F.col("bloom_hit")).count() == 0


def test_cms_xx64_hasher_overestimates(spark, freq_df):
    sketch = cms_build(freq_df, "x", D, W, hasher="xx64")
    truth = freq_df.groupBy("x").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(truth, "x", sketch, D, W, hasher="xx64")
    for r in est.collect():
        assert r["est"] >= r["true_cnt"]


def test_bloom_probe_duplicate_rows_no_false_negative(spark, items):
    """Regression (review finding): duplicate probe rows collapse into
    one group of n_dup*k exploded rows — membership must still hold."""
    members = items.filter("is_member").select("x")
    bloom = bloom_build(members, "x", M, K)
    dup_probe = members.limit(5).unionByName(members.limit(5))  # every row twice
    probed = bloom_probe(dup_probe, "x", bloom, M, K)
    rows = probed.collect()
    assert rows and all(r["bloom_hit"] for r in rows)


def test_hll_portable_estimate_accuracy(spark):
    """The 64-register portable HLL must track true cardinality within
    the theoretical relative error (1.04/sqrt(64) ~ 13%) times a 4x
    safety factor, across two orders of magnitude of cardinality —
    guards against register/rho arithmetic regressions that the
    oracle-replay equality alone would not catch (a consistently-wrong
    formula would still 'match' DuckDB)."""
    from pyspark.sql import functions as F

    from kafka_stream_aggregator_spark.sketches import portable_u64

    for n in (50, 1000, 20000):
        df = spark.range(n).select(
            F.lit("t").alias("event_type"), F.col("id").alias("user_id")
        )
        h = portable_u64(F.col("user_id"))
        w = F.shiftright(h, 6)
        rho = F.when(w > 0, F.lit(55) - F.length(F.bin(w))).otherwise(
            F.lit(55)
        )
        regs = (
            df.select(F.pmod(h, F.lit(64)).alias("reg"), rho.alias("rho"))
            .groupBy("reg")
            .agg(F.max("rho").alias("rho"))
        )
        row = regs.agg(
            F.count(F.lit(1)).alias("n_regs"),
            (
                F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - rho)"))
                + (F.lit(64) - F.count(F.lit(1))) * F.lit(1 << 55)
            ).alias("s"),
        ).collect()[0]
        import math

        est = 0.709 * 64 * 64 * float(1 << 55) / row["s"]
        if est <= 160 and row["n_regs"] < 64:  # linear-counting branch
            est = 64 * math.log(64.0 / (64 - row["n_regs"]))
        rel = abs(est - n) / n
        assert rel < 4 * 1.04 / 8, (n, est, rel)
