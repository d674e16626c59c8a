"""W3C traceparent propagation through Kafka header columns (R12)."""

import re

from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.streaming.tracing import (
    HEADERS_TYPE,
    extract_traceparent,
    get_header,
    inject_traceparent,
    set_header,
)

W3C = re.compile(r"^00-[0-9a-f]{32}-[0-9a-f]{16}-01$")


def _headers(spark, entries, extra_cols=None):
    row = dict(extra_cols or {})
    df = spark.createDataFrame([tuple(row.values()) or (1,)],
                               list(row.keys()) or ["dummy"])
    arr = F.array(
        *[
            F.struct(
                F.lit(k).alias("key"),
                F.lit(v).cast("binary").alias("value"),
            )
            for k, v in entries
        ]
    ).cast(HEADERS_TYPE) if entries else F.array().cast(HEADERS_TYPE)
    return df.withColumn("headers", arr)


def test_inject_creates_wellformed_traceparent(spark):
    df = spark.createDataFrame([("k1", 1), ("k2", 2)], ["key", "seq"])
    out = inject_traceparent(df, id_cols=["key", "seq"]).collect()
    for r in out:
        tps = [h.value.decode() for h in r.headers if h.key == "traceparent"]
        assert len(tps) == 1
        assert W3C.match(tps[0]), tps[0]
    # distinct rows -> distinct trace ids; same row -> deterministic
    again = inject_traceparent(df, id_cols=["key", "seq"]).collect()
    assert {r.key: r.headers for r in out} == {r.key: r.headers for r in again}
    t1, t2 = (r.headers[-1].value for r in out)
    assert t1 != t2


def test_inject_preserves_upstream_trace_id(spark):
    up_tp = "00-" + "ab" * 16 + "-" + "12" * 8 + "-01"
    df = _headers(spark, [("traceparent", up_tp), ("other", "x")],
                  {"key": "k1"})
    out = inject_traceparent(df, id_cols=["key"]).collect()[0]
    tps = [h.value.decode() for h in out.headers if h.key == "traceparent"]
    assert len(tps) == 1  # replaced, not duplicated
    assert tps[0].split("-")[1] == "ab" * 16  # trace id continued
    assert tps[0].split("-")[2] != "12" * 8  # fresh child span
    # unrelated headers survive
    assert [h.key for h in out.headers if h.key == "other"] == ["other"]


def test_extract_roundtrip_and_malformed(spark):
    df = spark.createDataFrame([("k1",), ("k2",)], ["key"])
    stamped = inject_traceparent(df, id_cols=["key"])
    ex = {r.key: r for r in extract_traceparent(stamped).collect()}
    for r in ex.values():
        assert re.match(r"^[0-9a-f]{32}$", r.trace_id)
        assert re.match(r"^[0-9a-f]{16}$", r.parent_span_id)
    assert ex["k1"].trace_id != ex["k2"].trace_id

    bad = _headers(spark, [("traceparent", "zz-not-a-trace")])
    r = extract_traceparent(bad).collect()[0]
    assert r.trace_id is None and r.parent_span_id is None

    none = spark.createDataFrame([(1,)], ["x"]).withColumn(
        "headers", F.lit(None).cast(HEADERS_TYPE)
    )
    r = extract_traceparent(none).collect()[0]
    assert r.trace_id is None and r.parent_span_id is None


def test_header_upsert_first_match_semantics(spark):
    df = _headers(spark, [("a", "1"), ("b", "2"), ("a", "3")])
    # get: first match wins (HeaderExtractor::get parity)
    got = df.select(get_header(F.col("headers"), "a").alias("v")).collect()[0]
    assert got.v == "1"
    # set: replaces every entry for the key, appends exactly one
    out = df.select(
        set_header(F.col("headers"), "a", F.lit("9")).alias("h")
    ).collect()[0]
    assert [(h.key, h.value.decode()) for h in out.h] == [
        ("b", "2"),
        ("a", "9"),
    ]


def test_inject_is_pure_catalyst(spark):
    """No Python row path: the injected plan must stay in codegen
    (BatchEvalPython would appear for a row-at-a-time UDF)."""
    df = spark.createDataFrame([("k1", 1)], ["key", "seq"])
    plan = inject_traceparent(df, id_cols=["key", "seq"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
