"""Replays for analytics wave 41."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def test_elasticity_matches_python_replay(spark, sf_dir):
    rows = duckdb.connect().execute(
        f"""SELECT p.p_brand, l.l_quantity, l.l_extendedprice
            FROM read_parquet('{SF_DIR}/lineitem.parquet') l
            JOIN read_parquet('{SF_DIR}/part.parquet') p
              ON l.l_partkey = p.p_partkey
            WHERE l.l_quantity > 0 AND l.l_extendedprice > 0"""
    ).fetchall()
    per = defaultdict(list)
    for b, q, e in rows:
        per[b].append((math.log(e / q), math.log(q)))
    out = {
        r["p_brand"]: r
        for r in REGISTRY["agg_price_elasticity"].fn(spark, sf_dir).collect()
    }
    for b, pts in per.items():
        n = len(pts)
        sx = sum(round(x, 9) for x, _ in pts)
        sy = sum(round(y, 9) for _, y in pts)
        sxy = sum(round(x * y, 9) for x, y in pts)
        sxx = sum(round(x * x, 9) for x, _ in pts)
        den = n * sxx - sx * sx
        if n <= 2 or den == 0:
            assert b not in out
            continue
        r = out[b]
        assert r["n"] == n
        assert abs(
            r["elasticity"] - round((n * sxy - sx * sy) / den, 6)
        ) < 5e-6


def test_simpson_matches_python_replay(spark, sf_dir):
    rows = duckdb.connect().execute(
        f"""SELECT event_type,
                   CAST(extract(hour FROM ts) AS BIGINT), value
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    g = defaultdict(lambda: [0, 0, 0.0, 0.0, 0])
    for et, x, v in rows:
        y = round(v, 2)
        m = g[et]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * y
        m[4] += x * x
    slopes = {}
    for et, (n, sx, sy, sxy, sxx) in g.items():
        den = n * sxx - sx * sx
        if den != 0:
            slopes[et] = (n * sxy - sx * sy) / den
    tn = sum(m[0] for m in g.values())
    tsx = sum(m[1] for m in g.values())
    tsy = sum(m[2] for m in g.values())
    tsxy = sum(m[3] for m in g.values())
    tsxx = sum(m[4] for m in g.values())
    pooled = (tn * tsxy - tsx * tsy) / (tn * tsxx - tsx * tsx)
    r = REGISTRY["diag_simpson_slopes"].fn(spark, sf_dir).collect()[0]
    assert r["n_rows"] == tn
    assert r["n_groups"] == len(slopes)
    assert abs(r["pooled_slope"] - round(pooled, 6)) < 3e-6
    assert r["n_opposite_sign"] == sum(
        1 for s in slopes.values() if s * pooled < 0
    )
