"""Replay for analytics wave 39 (events_weibull_fit)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def test_weibull_fit_matches_python_replay(spark, sf_dir):
    rows = duckdb.connect().execute(
        f"""SELECT user_id, event_type, epoch_us(ts)
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type IN ('view', 'purchase')"""
    ).fetchall()
    first = defaultdict(dict)
    for uid, et, us in rows:
        if et not in first[uid] or us < first[uid][et]:
            first[uid][et] = us
    ds = sorted(
        ((f["purchase"] - f["view"]) / 3600000000.0, uid)
        for uid, f in first.items()
        if "view" in f and "purchase" in f and f["purchase"] > f["view"]
    )
    n = len(ds)
    pts = [
        (math.log(dh), math.log(-math.log(1 - (10 * i - 3) / (10 * n + 4))))
        for i, (dh, _uid) in enumerate(ds, start=1)
    ]
    k = len(pts)
    sx = sum(round(x, 9) for x, _ in pts)
    sy = sum(round(y, 9) for _, y in pts)
    sxy = sum(round(x * y, 9) for x, y in pts)
    sxx = sum(round(x * x, 9) for x, _ in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    icept = sy / k - slope * (sx / k)
    r = REGISTRY["events_weibull_fit"].fn(spark, sf_dir).collect()[0]
    assert r["n_durations"] == n
    assert abs(r["weibull_shape"] - round(slope, 6)) < 5e-6
    assert abs(
        r["weibull_scale_hours"] - round(math.exp(-icept / slope), 6)
    ) < max(5e-6, 1e-5 * abs(r["weibull_scale_hours"]))
    assert r["weibull_shape"] > 0 and r["weibull_scale_hours"] > 0
