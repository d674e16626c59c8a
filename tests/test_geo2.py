"""Replays for the second spatial wave (queries/geo2.py)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR

WORLD, CELL, G = 1_000_000, 50_000, 20
NC = G * G


def _p60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hotspot_gi_matches_loop(spark, sf_dir):
    keys = [
        k
        for (k,) in duckdb.connect()
        .execute(f"SELECT c_custkey FROM read_parquet('{SF_DIR}/customer.parquet')")
        .fetchall()
    ]
    cells = Counter()
    for k in keys:
        xi = _p60(f"{k}:gx") % WORLD
        yi = _p60(f"{k}:gy") % WORLD
        cells[(xi // CELL, yi // CELL)] += 1
    total = sum(cells.values())
    total2 = sum(c * c for c in cells.values())
    xbar = total / NC
    sd = math.sqrt(total2 / NC - xbar * xbar)
    out = {
        (r["cx"], r["cy"]): r
        for r in REGISTRY["geo_hotspot_gi"].fn(spark, sf_dir).collect()
    }
    exp = {}
    for (cx, cy), c in cells.items():
        s_i = sum(
            cells.get((cx + dx, cy + dy), 0)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        k_i = (min(cx + 1, G - 1) - max(cx - 1, 0) + 1) * (
            min(cy + 1, G - 1) - max(cy - 1, 0) + 1
        )
        gi = (s_i - xbar * k_i) / (
            sd * math.sqrt((NC * k_i - k_i * k_i) / (NC - 1))
        )
        if gi > 1.5:
            exp[(cx, cy)] = (c, s_i, k_i, gi)
    assert set(out) == set(exp)
    for key, (c, s_i, k_i, gi) in exp.items():
        r = out[key]
        assert (r["c"], r["s_i"], r["k_i"]) == (c, s_i, k_i)
        assert abs(r["gi_z"] - gi) < 1e-5


def test_feature_hashing_census(spark, sf_dir):
    rows = duckdb.connect().execute(
        f"""SELECT DISTINCT event_type, user_id
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    buckets = Counter(_p60(f"{et}:{u}:fh") % 4096 for et, u in rows)
    hist = Counter(buckets.values())
    out = {
        r["n_feats"]: r["n_buckets"]
        for r in REGISTRY["ml_feature_hashing"].fn(spark, sf_dir).collect()
    }
    assert out == dict(hist)
    # conservation: sum(n_feats * n_buckets) == number of features
    assert sum(k * v for k, v in out.items()) == len(rows)
