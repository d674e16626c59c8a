"""Replays for analytics wave 20 (queries/analytics20.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR

L1 = math.log(0.5 / 0.3)
L0 = math.log(0.5 / 0.7)
UP = math.log(19.0)


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_sprt_crossing_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, value > 250
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE user_id < 60
            ORDER BY event_type, epoch_us(ts), event_id"""
    )
    per = defaultdict(list)
    for et, s in rows:
        per[et].append(1 if s else 0)
    out = {r["event_type"]: r for r in REGISTRY["ab_sprt_crossing"].fn(spark, sf_dir).collect()}
    for et, ss in per.items():
        k = 0
        hit = None
        for t, s in enumerate(ss, start=1):
            k += s
            llr = k * L1 + (t - k) * L0
            if llr >= UP or llr <= -UP:
                hit = (t, llr, "accept_h1" if llr >= UP else "accept_h0")
                break
        if hit is None:
            assert et not in out
            continue
        r = out[et]
        assert r["crossing_step"] == hit[0]
        assert abs(r["llr_at_crossing"] - hit[1]) < 1e-6
        assert r["decision"] == hit[2]


def test_variance_ratio_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, CAST(floor(epoch(ts)/60) AS BIGINT) m,
                   round(sum(round(value,6))/count(*), 6)
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    per = defaultdict(list)
    for et, _m, v in rows:
        per[et].append(v)
    out = {r["event_type"]: r for r in REGISTRY["ts_variance_ratio"].fn(spark, sf_dir).collect()}
    for et, xs in per.items():
        d1 = [b - a for a, b in zip(xs, xs[1:])]
        d4 = [xs[i] - xs[i - 4] for i in range(4, len(xs))]
        if len(d1) < 2 or len(d4) < 2:
            assert et not in out
            continue

        def var(v):
            mu = sum(v) / len(v)
            return sum((x - mu) ** 2 for x in v) / (len(v) - 1)

        vr = var(d4) / (4 * var(d1))
        r = out[et]
        assert r["n1"] == len(d1) and r["n4"] == len(d4)
        assert abs(r["variance_ratio"] - vr) < 1e-4
        assert r["variance_ratio"] > 0
