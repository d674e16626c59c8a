"""Mergeable Misra-Gries heavy hitters (ops.approx_heavy_hitters):
no SQL oracle (output depends on partitioning), so the MG guarantees
ARE the contract — every sufficiently-frequent item survives, every
reported count is a lower bound within the composed error, and the
summary finds a planted heavy hitter under adversarial skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.ops import approx_heavy_hitters
from kafka_stream_aggregator_spark.tables import load_table


def _exact(df, col):
    return {
        r[col]: r["n"]
        for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_guarantees_on_events(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").select("event_type")
    exact = _exact(e, "event_type")
    n_total = sum(exact.values())
    k = 50
    got = {
        r["item"]: (r["count_lb"], r["n_total"], r["err_bound"])
        for r in approx_heavy_hitters(e, "event_type", k=k).collect()
    }
    assert got  # non-empty
    for item, (lb, n_tot, err) in got.items():
        assert n_tot == n_total
        assert err == n_total // (k + 1)
        # lower bound: never overcounts, undercounts by at most err
        assert lb <= exact[item]
        assert lb >= exact[item] - err
    # completeness: every item above the threshold must be reported
    for item, f in exact.items():
        if f > n_total // (k + 1):
            assert item in got, f"frequent item {item!r} (f={f}) missing"


def test_planted_heavy_hitter_under_skew(spark, sf_dir):
    """10% of all rows carry one planted key among ~6000 distinct
    others; with k=50 the threshold is ~2% so the planted key MUST
    surface, with a tight lower bound."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    planted = l.withColumn(
        "key",
        F.when(F.col("l_orderkey") % 10 == 0, F.lit(-1)).otherwise(
            F.col("l_orderkey")
        ),
    )
    exact = _exact(planted, "key")
    n_total = sum(exact.values())
    res = {
        r["item"]: r["count_lb"]
        for r in approx_heavy_hitters(planted, "key", k=50).collect()
    }
    assert -1 in res
    assert res[-1] >= exact[-1] - n_total // 51
    assert res[-1] <= exact[-1]


def test_weighted_variant(spark, sf_dir):
    """Weighted counts (pre-aggregated input) obey the same bounds."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.lit(3).alias("w")
    )
    exact = {
        r["o_orderpriority"]: r["n"] * 3
        for r in o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(exact.values())
    res = {
        r["item"]: r["count_lb"]
        for r in approx_heavy_hitters(
            o, "o_orderpriority", k=20, weight_col="w"
        ).collect()
    }
    for item, f in exact.items():
        if f > n_total // 21:
            assert item in res
            assert exact[item] - n_total // 21 <= res[item] <= exact[item]


def test_float_weights_keep_float_arithmetic(spark, sf_dir):
    """A DOUBLE weight column must not be silently truncated to int:
    counts come back as doubles and the N/(k+1) lower-bound guarantee
    holds in exact float arithmetic (weights of 0.5 would previously
    all truncate to 0 and every bound would be vacuous or wrong)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.lit(0.5).alias("w")
    )
    exact = {
        r["o_orderpriority"]: r["n"] * 0.5
        for r in o.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(exact.values())
    rows = approx_heavy_hitters(o, "o_orderpriority", k=20, weight_col="w").collect()
    assert rows
    err = n_total / 21
    for r in rows:
        assert isinstance(r["count_lb"], float)
        assert abs(r["n_total"] - n_total) < 1e-6
        assert abs(r["err_bound"] - err) < 1e-6
    res = {r["item"]: r["count_lb"] for r in rows}
    for item, f in exact.items():
        if f > err:
            assert item in res
            assert exact[item] - err - 1e-6 <= res[item] <= exact[item] + 1e-6
