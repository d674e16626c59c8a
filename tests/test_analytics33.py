"""Replays for analytics wave 43."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_cochran_q_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""WITH w AS (SELECT min(ts) AS t0
                       FROM read_parquet('{SF_DIR}/events.parquet'))
            SELECT user_id, event_type
            FROM read_parquet('{SF_DIR}/events.parquet') e CROSS JOIN w
            WHERE e.ts < w.t0 + INTERVAL 7 DAY
              AND event_type IN ('view', 'click', 'purchase')"""
    )
    per = defaultdict(set)
    users = set()
    for uid, et in rows:
        per[uid].add(et)
        users.add(uid)
    # blocks include first-week-active users with NONE of the 3 types?
    # The engine groups ALL first-week events per user, so any user
    # with at least one first-week event (of any type) is a block.
    allrows = _duck(
        f"""WITH w AS (SELECT min(ts) AS t0
                       FROM read_parquet('{SF_DIR}/events.parquet'))
            SELECT DISTINCT user_id
            FROM read_parquet('{SF_DIR}/events.parquet') e CROSS JOIN w
            WHERE e.ts < w.t0 + INTERVAL 7 DAY"""
    )
    blocks = [u for (u,) in allrows]
    k = 3
    cs = {
        ty: sum(1 for u in blocks if ty in per.get(u, ()))
        for ty in ("view", "click", "purchase")
    }
    rs = [len(per.get(u, ()) & {"view", "click", "purchase"})
          for u in blocks]
    sr, sr2 = sum(rs), sum(r * r for r in rs)
    mu = sr / k
    q = (
        k * (k - 1) * sum((cs[t] - mu) ** 2 for t in cs)
        / (k * sr - sr2)
    )
    r = REGISTRY["stat_cochran_q"].fn(spark, sf_dir).collect()[0]
    assert r["n_blocks"] == len(blocks)
    assert r["n_view"] == cs["view"]
    assert abs(r["cochran_q"] - round(q, 6)) < 3e-6
    assert r["cochran_q"] >= 0


def test_atkinson_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""WITH rev AS (
              SELECT l_suppkey,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l_discount AS DECIMAL(5,2)))
                       AS DOUBLE) AS r
              FROM read_parquet('{SF_DIR}/lineitem.parquet')
              GROUP BY l_suppkey)
            SELECT n.n_name, rev.r
            FROM rev
            JOIN read_parquet('{SF_DIR}/supplier.parquet') s
              ON rev.l_suppkey = s.s_suppkey
            JOIN read_parquet('{SF_DIR}/nation.parquet') n
              ON s.s_nationkey = n.n_nationkey
            WHERE rev.r > 0"""
    )
    per = defaultdict(list)
    for nn, x in rows:
        per[nn].append(x)
    out = {
        r["n_name"]: r
        for r in REGISTRY["agg_atkinson_index"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(per)
    for nn, xs in per.items():
        n = len(xs)
        sx = sum(round(x, 2) for x in xs)
        slnx = sum(round(math.log(x), 9) for x in xs)
        a = 1 - math.exp(slnx / n) / (sx / n)
        r = out[nn]
        assert r["n_suppliers"] == n
        assert abs(r["atkinson_1"] - round(a, 6)) < 3e-6
        assert 0 - 1e-9 <= r["atkinson_1"] < 1  # AM-GM bound
