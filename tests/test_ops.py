"""Unit tests for the composite operators in ops.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.ops import (
    asof_join,
    dedup_keep_first,
    global_top_k,
    sessionize,
    top_k_per_group,
)


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
