"""Replays for surface wave 3 (queries/surface3.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.queries.streaming_q import _run_to_df
from kafka_stream_aggregator_spark.streaming.sources import file_stream
from kafka_stream_aggregator_spark.tables import load_table

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_xml_roundtrip_is_lossless(spark, sf_dir):
    out = {r["event_type"]: r for r in REGISTRY["fn_xml_roundtrip"].fn(spark, sf_dir).collect()}
    rows = _duck(
        f"""SELECT event_type, count(*), sum(user_id),
                   sum(CAST(round(round(value,6)*1000000, 0) AS BIGINT))
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"""
    )
    for et, n, su, sv in rows:
        r = out[et]
        assert (r["n"], r["sum_uid"], r["sum_value_micro"]) == (n, su, sv)


def test_bitmap_distinct_is_exact(spark, sf_dir):
    for r in REGISTRY["fn_bitmap_suite"].fn(spark, sf_dir).collect():
        assert r["n_distinct_bitmap"] == r["n_distinct_plain"]


def test_phi_frequent_threshold_exact(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, user_id, count(*)
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"""
    )
    tot = defaultdict(int)
    for et, _u, k in rows:
        tot[et] += k
    exp = {
        (et, u): k for et, u, k in rows if k * 200 > tot[et]
    }
    got = {
        (r["event_type"], r["user_id"]): r["k"]
        for r in REGISTRY["agg_phi_frequent"].fn(spark, sf_dir).collect()
    }
    assert got == exp


def test_wilson_ci_properties(spark, sf_dir):
    out = REGISTRY["stat_wilson_ci"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0 <= r["wilson_lo"] <= r["p_hat"] <= r["wilson_hi"] <= 1
        # replay
        n, s = r["n"], r["s"]
        p = s / n
        z2 = 1.96 * 1.96
        rad = math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n))
        den = 1 + z2 / n
        assert abs(r["wilson_lo"] - (p + z2 / (2 * n) - 1.96 * rad) / den) < 1e-6
        assert abs(r["wilson_hi"] - (p + z2 / (2 * n) + 1.96 * rad) / den) < 1e-6


def test_stream_bitmap_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """bitmap_construct_agg is an OR — idempotent and commutative — so
    micro-batch splits cannot change the drained bitmaps."""
    ev = load_table(spark, sf_dir, "events")
    d = str(tmp_path / "bm_stream")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    stream = file_stream(
        spark,
        d,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
        max_files_per_trigger=1,
    )
    bm = (
        stream.select(
            "event_type",
            F.bitmap_bucket_number(F.col("user_id")).alias("bkt"),
            F.bitmap_bit_position(F.col("user_id")).alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bits"))
    )
    drained = _run_to_df(spark, bm, mode="complete")
    got = (
        drained.groupBy("event_type")
        .agg(F.sum(F.bitmap_count("bits")).alias("n"))
        .collect()
    )
    ref = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"]: r["n"] for r in got} == ref
