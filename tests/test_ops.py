"""Unit tests for the composite operators in ops.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.ops import (
    asof_join,
    dedup_keep_first,
    global_top_k,
    sessionize,
    top_k_per_group,
)
from kafka_stream_aggregator_spark.tables import load_table


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 50), (4, "v", 100)],
        "lid long, u string, t long",
    )
    right = spark.createDataFrame(
        [(10, "u", 100, 1.0), (11, "u", 200, 2.0), (12, "w", 10, 9.0)],
        "rid long, ru string, rt long, val double",
    )
    out = {
        r["lid"]: r["val"]
        for r in asof_join(
            left, right, "t", "rt", "u", "ru", right_tiebreak="rid", value_cols=["val"]
        ).collect()
    }
    assert out[1] == 1.0  # exact-time match visible
    assert out[2] == 2.0  # latest prior
    assert out[3] is None  # nothing prior
    assert out[4] is None  # other group never leaks


def test_asof_join_tiebreak(spark):
    # two right rows at the same ts: largest tiebreak wins
    left = spark.createDataFrame([(1, "u", 100)], "lid long, u string, t long")
    right = spark.createDataFrame(
        [(10, "u", 100, 1.0), (11, "u", 100, 2.0)],
        "rid long, ru string, rt long, val double",
    )
    out = asof_join(
        left, right, "t", "rt", "u", "ru", right_tiebreak="rid", value_cols=["val"]
    ).collect()
    assert out[0]["val"] == 2.0


def test_sessionize(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 7),
        (2, "2024-01-01 00:10:00", 7),   # gap 600s -> same session
        (3, "2024-01-01 01:10:00", 7),   # gap 3600s -> new session
        (4, "2024-01-01 00:00:00", 8),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {r["event_id"]: r["session_id"] for r in sessionize(df).collect()}
    assert out[1] == out[2] == 1
    assert out[3] == 2
    assert out[4] == 1


def test_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 5), (3, "b", 1)], "id long, k string, o long"
    )
    out = dedup_keep_first(df, ["k"], ["o", "id"]).collect()
    assert {r["id"] for r in out} == {2, 3}


def test_topk(spark):
    df = spark.createDataFrame(
        [(g, i, float(i * (g + 1))) for g in range(2) for i in range(10)],
        "g long, i long, v double",
    )
    per = top_k_per_group(df, ["g"], [F.col("v").desc()], 3)
    assert per.count() == 6
    assert per.filter("g = 1").agg(F.min("v")).first()[0] == 14.0
    top = global_top_k(df, [F.col("v").desc()], 2).collect()
    assert [r["v"] for r in top] == [18.0, 16.0]


def test_topk_plan_uses_take_ordered(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "i long, v double")
    plan = global_top_k(df, [F.col("v").desc()], 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_exact_percentiles_matches_builtin(spark):
    """Sort-based exact_percentiles == Spark's built-in exact percentile
    on randomized data (ties + duplicates + negative values included)."""
    import random

    from pyspark.sql import functions as F

    from kafka_stream_aggregator_spark.ops import exact_percentiles

    rng = random.Random(7)
    rows = [
        (rng.choice(["a", "b", "c"]), round(rng.uniform(-100, 100), 2))
        for _ in range(5000)
    ] + [("a", 5.0)] * 25  # ties
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: (r["p50"], r["p90"], r["p05"])
        for r in exact_percentiles(
            df, "v", [(0.5, "p50"), (0.9, "p90"), (0.05, "p05")], group_cols=("g",)
        ).collect()
    }
    want = {
        r["g"]: (r["p50"], r["p90"], r["p05"])
        for r in df.groupBy("g")
        .agg(
            F.percentile("v", F.lit(0.5)).alias("p50"),
            F.percentile("v", F.lit(0.9)).alias("p90"),
            F.percentile("v", F.lit(0.05)).alias("p05"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        for a, b in zip(got[g], want[g]):
            assert abs(a - b) < 1e-9, (g, got[g], want[g])


def test_exact_percentiles_edge_groups(spark):
    """Single-row and two-row groups: interpolation endpoints."""
    from kafka_stream_aggregator_spark.ops import exact_percentiles

    df = spark.createDataFrame(
        [("one", 42.0), ("two", 10.0), ("two", 20.0)], "g string, v double"
    )
    got = {
        r["g"]: (r["p50"], r["p90"])
        for r in exact_percentiles(
            df, "v", [(0.5, "p50"), (0.9, "p90")], group_cols=("g",)
        ).collect()
    }
    assert got["one"] == (42.0, 42.0)
    assert got["two"] == (15.0, pytest.approx(19.0))


def test_percentile_approx_within_bounds_of_exact(spark, sf_dir):
    """agg_percentiles_approx (the 100 TB tier) stays within tight rank
    error of the exact result at accuracy=10000."""
    from kafka_stream_aggregator_spark.queries import REGISTRY

    exact = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_percentiles"].fn(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_percentiles_approx"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for g in exact:
        # quantity percentiles: discrete domain, sketch should be spot-on
        assert abs(exact[g]["p50_qty"] - approx[g]["p50_qty"]) <= 1.0
        assert abs(exact[g]["p90_qty"] - approx[g]["p90_qty"]) <= 1.0
        # continuous price median: within 1% relative
        rel = abs(exact[g]["med_price"] - approx[g]["med_price"]) / exact[g]["med_price"]
        assert rel < 0.01, (g, exact[g]["med_price"], approx[g]["med_price"])


def test_salted_join_rejects_dim_duplicating_how(spark):
    from kafka_stream_aggregator_spark.ops import salted_join

    fact = spark.range(10).withColumnRenamed("id", "k")
    dim = spark.range(5).withColumnRenamed("id", "dk")
    with pytest.raises(ValueError, match="fact-preserving"):
        salted_join(fact, dim, "k", "dk", how="full")


def test_exact_percentiles_bucketed_matches_builtin(spark):
    """Histogram-bucketed exact percentiles == built-in on randomized
    data with ties, duplicates, negatives, single-row groups."""
    import random

    from kafka_stream_aggregator_spark.ops import exact_percentiles_bucketed

    rng = random.Random(11)
    rows = (
        [("a", 5.0)] * 40
        + [("one", 42.0)]
        + [
            (rng.choice(["a", "b", "c"]), round(rng.uniform(-100, 100), 2))
            for _ in range(4000)
        ]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    qs = [(0.05, "p05"), (0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
    got = {
        r["g"]: tuple(r[n] for _, n in qs)
        for r in exact_percentiles_bucketed(df, "v", qs, group_cols=("g",)).collect()
    }
    want = {
        r["g"]: tuple(r[n] for _, n in qs)
        for r in df.groupBy("g")
        .agg(*[F.percentile("v", F.lit(q)).alias(n) for q, n in qs])
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        for a, b in zip(got[g], want[g]):
            assert abs(a - b) < 1e-9, (g, got[g], want[g])


def test_salted_join_accepts_spark_aliases(spark):
    """Spark's own JoinType aliases (leftOuter, left_semi, leftanti)
    must pass the fact-preserving guard."""
    from kafka_stream_aggregator_spark.ops import salted_join

    fact = spark.range(10).withColumnRenamed("id", "k")
    dim = spark.range(5).withColumnRenamed("id", "dk")
    for how, want in (("leftOuter", 10), ("left_semi", 5), ("leftanti", 5), ("LEFT", 10)):
        assert salted_join(fact, dim, "k", "dk", how=how).count() == want, how


def test_exact_percentiles_ignore_nulls(spark):
    """Both exact tiers must skip NULLs like F.percentile does: a null
    must not inflate the rank count or shift quantile positions."""
    from kafka_stream_aggregator_spark.ops import (
        exact_percentiles,
        exact_percentiles_bucketed,
    )

    from kafka_stream_aggregator_spark.ops import exact_percentiles_counts

    rows = [("g", float(v)) for v in range(1, 101)] + [("g", None)] * 37
    df = spark.createDataFrame(rows, "g string, v double")
    qs = [(0.5, "p50"), (0.9, "p90")]
    builtin = df.groupBy("g").agg(
        F.percentile("v", F.lit(0.5)).alias("p50"),
        F.percentile("v", F.lit(0.9)).alias("p90"),
    ).collect()[0]
    for fn in (exact_percentiles, exact_percentiles_bucketed, exact_percentiles_counts):
        got = fn(df, "v", qs, group_cols=("g",)).collect()[0]
        assert got["p50"] == pytest.approx(builtin["p50"]), fn.__name__
        assert got["p90"] == pytest.approx(builtin["p90"]), fn.__name__


def test_percentile_tier_choice_pinned():
    """The tier choice at four scales: counts whenever the caller
    declares low cardinality (size-independent — the counts table stays
    tiny at any row count), sort up to the 10M crossover, bucketed
    above it, approx only at billions AND with caller opt-in."""
    from kafka_stream_aggregator_spark.ops import choose_percentile_tier

    assert choose_percentile_tier(600_000) == "sort"
    assert choose_percentile_tier(600_000, low_cardinality=True) == "counts"
    assert choose_percentile_tier(5_000_000_000, low_cardinality=True) == "counts"
    assert choose_percentile_tier(5_000_000) == "sort"
    assert choose_percentile_tier(50_000_000) == "bucketed"
    assert choose_percentile_tier(5_000_000_000) == "bucketed"  # no opt-in
    assert choose_percentile_tier(5_000_000_000, approx_ok=True) == "approx"
    assert choose_percentile_tier(50_000_000, approx_ok=True) == "bucketed"


def test_exact_percentiles_auto_matches_fixed_tiers(spark, sf_dir):
    """auto == sort tier on a bench-scale input (estimate -> sort), and
    forcing n_rows over the crossover routes to the bucketed tier with
    identical results."""
    from kafka_stream_aggregator_spark.ops import (
        exact_percentiles,
        exact_percentiles_auto,
    )

    li = load_table(spark, sf_dir, "lineitem")
    qs = [(0.5, "p50"), (0.9, "p90")]
    want = {
        r["l_returnflag"]: (r["p50"], r["p90"])
        for r in exact_percentiles(
            li, "l_extendedprice", qs, group_cols=("l_returnflag",)
        ).collect()
    }
    for forced in (None, 50_000_000):
        got = {
            r["l_returnflag"]: (r["p50"], r["p90"])
            for r in exact_percentiles_auto(
                li, "l_extendedprice", qs, group_cols=("l_returnflag",), n_rows=forced
            ).collect()
        }
        assert got.keys() == want.keys()
        for k in want:
            assert got[k][0] == pytest.approx(want[k][0]), (forced, k)
            assert got[k][1] == pytest.approx(want[k][1]), (forced, k)


def test_distributed_global_rank_matches_global_row_number(spark, sf_dir):
    """The two-phase rank must be bit-identical to an unpartitioned
    row_number() — both bucket modes (auto quantile edges on a numeric
    lead; supplied hash-prefix bucket on a string lead)."""
    from pyspark.sql import Window as W

    from kafka_stream_aggregator_spark.ops import distributed_global_rank
    from kafka_stream_aggregator_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    order = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    expected = li.withColumn(
        "rn_ref", F.row_number().over(W.orderBy(*order))
    )
    got = distributed_global_rank(li, order, rank_col="rn")
    joined = got.join(expected, order)
    assert joined.count() == li.count()
    assert joined.filter(F.col("rn") != F.col("rn_ref")).count() == 0

    # supplied-bucket mode: md5 head as the coarsening
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    exp2 = docs.withColumn("rn_ref", F.row_number().over(W.orderBy("h", "doc_id")))
    got2 = distributed_global_rank(
        docs, ["h", "doc_id"], bucket=F.substring("h", 1, 2), rank_col="rn"
    )
    j2 = got2.join(exp2, ["h", "doc_id"])
    assert j2.filter(F.col("rn") != F.col("rn_ref")).count() == 0

    # degenerate inputs: empty and single-row
    assert distributed_global_rank(li.limit(0), order).count() == 0
    one = distributed_global_rank(li.limit(1), order).collect()
    assert len(one) == 1 and one[0]["rn"] == 1


def test_isotonic_fit_pava_equals_minimax(spark, sf_dir):
    """The applyInPandas PAVA operator (ops.isotonic_fit — the long-
    series scale path) and the oracle-exact O(n^2) minimax query
    (ml_isotonic_pava) compute the SAME isotonic projection
    (Robertson Thm 1.4.4). Pin the equivalence on the real quantity
    cells, plus PAVA-shape sanity on a hand case."""
    from pyspark.sql import functions as F

    from kafka_stream_aggregator_spark.ops import isotonic_fit
    from kafka_stream_aggregator_spark.queries import REGISTRY

    sf = sf_dir
    mm = {
        r["qv"]: r["iso_fit"]
        for r in REGISTRY["ml_isotonic_pava"].fn(spark, sf).collect()
    }
    from kafka_stream_aggregator_spark.tables import load_table

    li = load_table(spark, sf, "lineitem")
    cells = li.groupBy(
        F.round("l_quantity", 0).cast("bigint").alias("qv")
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        ).alias("s"),
        F.count(F.lit(1)).alias("c"),
    ).withColumn("g", F.lit("all"))
    pv = {
        r["qv"]: r["iso_fit"]
        for r in isotonic_fit(cells, ["g"], "qv", "s", "c").collect()
    }
    assert set(pv) == set(mm)
    for qv, fit in pv.items():
        assert abs(fit / 100 - mm[qv]) < 1e-6, (qv, fit / 100, mm[qv])
    # monotone non-decreasing in qv
    vals = [pv[q] for q in sorted(pv)]
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))

    # hand case: y = [3, 1, 2] w=1 -> PAVA pools [3,1] -> [2,2,2]
    hand = spark.createDataFrame(
        [("g", 1, 3.0, 1.0), ("g", 2, 1.0, 1.0), ("g", 3, 2.0, 1.0)],
        "g string, x long, s double, w double",
    )
    got = {
        r["x"]: r["iso_fit"]
        for r in isotonic_fit(hand, ["g"], "x", "s", "w").collect()
    }
    assert got == {1: 2.0, 2: 2.0, 3: 2.0}


def test_isotonic_fit_typed_keys_and_weight_validation(spark):
    """ADVICE r10: group/x output types mirror the input schema (a
    bigint group key and double x survive round-trip, no silent
    casts), and a non-positive weight raises instead of emitting
    NaN/inf."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from kafka_stream_aggregator_spark.ops import isotonic_fit

    typed = spark.createDataFrame(
        [(7, 0.5, 3.0, 1.0), (7, 1.5, 1.0, 1.0), (8, 0.5, 4.0, 2.0)],
        "g bigint, x double, s double, w double",
    )
    out = isotonic_fit(typed, ["g"], "x", "s", "w")
    assert dict(out.dtypes) == {
        "g": "bigint", "x": "double", "iso_fit": "double",
    }
    got = {(r["g"], r["x"]): r["iso_fit"] for r in out.collect()}
    assert got == {(7, 0.5): 2.0, (7, 1.5): 2.0, (8, 0.5): 2.0}

    zero_w = spark.createDataFrame(
        [("g", 1, 3.0, 0.0)], "g string, x long, s double, w double"
    )
    with pytest.raises(PythonException, match="non-positive weight"):
        isotonic_fit(zero_w, ["g"], "x", "s", "w").collect()
