"""Independent replays for the thirteenth analytics wave
(queries/analytics13.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_periodogram_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, date_trunc('day', ts), count(*)
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    per = defaultdict(list)
    for et, _d, c in rows:
        per[et].append(c)
    out = REGISTRY["ts_periodogram"].fn(spark, sf_dir).collect()
    assert len(out) == len(per) * 6
    for r in out:
        cs = per[r["event_type"]]
        n = len(cs)
        mu = sum(cs) / n
        k = r["k"]
        a = sum(
            (c - mu) * math.cos(2 * math.pi * k * t / n)
            for t, c in enumerate(cs)
        )
        b = sum(
            (c - mu) * math.sin(2 * math.pi * k * t / n)
            for t, c in enumerate(cs)
        )
        assert r["series_len"] == n
        assert abs(r["power"] - (a * a + b * b)) < 1e-3, (
            r["event_type"],
            k,
        )


def test_jarque_bera_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT CAST(round(o_totalprice*100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    )
    vs = [v for (v,) in rows]
    n = len(vs)
    mu = sum(vs) / n
    mu2 = sum((v - mu) ** 2 for v in vs) / n
    mu3 = sum((v - mu) ** 3 for v in vs) / n
    mu4 = sum((v - mu) ** 4 for v in vs) / n
    s = mu3 / mu2**1.5
    k = mu4 / mu2**2 - 3
    jb = n / 6 * (s**2 + k**2 / 4)
    [r] = REGISTRY["stat_jarque_bera"].fn(spark, sf_dir).collect()
    assert r["n_obs"] == n
    assert abs(r["skewness"] - s) < 1e-4
    assert abs(r["excess_kurtosis"] - k) < 1e-4
    assert abs(r["jarque_bera"] - jb) < max(1e-3, abs(jb) * 1e-5)


def test_kcore_matches_peeling(spark, sf_dir):
    rows = _duck(
        f"""SELECT DISTINCT user_id, event_type,
                   CAST(floor(epoch(ts)/300) AS BIGINT)
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE user_id < 120"""
    )
    by_cell = defaultdict(set)
    for u, et, w in rows:
        by_cell[(et, w)].add(u)
    adj = defaultdict(set)
    for cell, us in by_cell.items():
        us = sorted(us)
        for i, a in enumerate(us):
            for b in us[i + 1 :]:
                adj[a].add(b)
                adj[b].add(a)
    out = {
        r["k"]: r["core_size"]
        for r in REGISTRY["graph_kcore"].fn(spark, sf_dir).collect()
    }
    assert set(out) == {2, 3, 4}
    for k in (2, 3, 4):
        cur = {u: set(vs) for u, vs in adj.items()}
        while True:
            drop = [u for u, vs in cur.items() if len(vs) < k]
            if not drop:
                break
            for u in drop:
                for v in cur[u]:
                    cur[v].discard(u)
                del cur[u]
        assert out[k] == len(cur), k
    # nesting: higher k-cores are subsets
    assert out[2] >= out[3] >= out[4]
