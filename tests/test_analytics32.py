"""Replays for analytics wave 42."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_f_two_sample_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, CAST(value AS DECIMAL(18,2))
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type IN ('purchase', 'view')"""
    )
    g = defaultdict(list)
    for et, v in rows:
        g[et].append(Decimal(v))
    def var(xs):
        n = len(xs)
        s, ss = float(sum(xs)), float(sum(x * x for x in xs))
        return (ss - s * s / n) / (n - 1)
    r = REGISTRY["stat_f_two_sample_var"].fn(spark, sf_dir).collect()[0]
    assert r["n_purchase"] == len(g["purchase"])
    assert r["df2"] == len(g["view"]) - 1
    want = var(g["purchase"]) / var(g["view"])
    assert abs(r["f_stat"] - round(want, 6)) < 3e-6
    assert r["f_stat"] > 0


def test_hill_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT user_id, count(*)
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY user_id"""
    )
    cs = sorted(((c, uid) for uid, c in rows), key=lambda t: (-t[0], t[1]))
    n = len(cs)
    kk = n // 3
    xk1 = cs[kk][0]  # (kk+1)-th largest
    terms = [round(math.log(cs[i][0] / xk1), 9) for i in range(kk)]
    r = REGISTRY["events_hill_tail_index"].fn(spark, sf_dir).collect()[0]
    assert r["k"] == kk
    assert abs(r["hill_alpha"] - round(kk / sum(terms), 6)) < 5e-6
    assert r["hill_alpha"] > 0


def test_theil_decomposition_identity(spark, sf_dir):
    r = REGISTRY["agg_theil_decomposition"].fn(spark, sf_dir).collect()[0]
    # decomposition sanity: T = between + within (within round-6 of
    # the independently rounded parts), both parts non-negative
    assert abs(
        r["t_total"] - (r["t_between"] + r["t_within"])
    ) < 2e-6
    assert r["t_between"] >= -1e-9
    assert r["t_within"] >= -1e-9
    # and the independently computed scalar Theil index of the SAME
    # supplier-revenue distribution should be close to t_total
    rows = _duck(
        f"""WITH rev AS (
              SELECT l_suppkey,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(1 - l_discount AS DECIMAL(5,2)))
                       AS DOUBLE) AS r
              FROM read_parquet('{SF_DIR}/lineitem.parquet')
              GROUP BY l_suppkey)
            SELECT r FROM rev WHERE r > 0"""
    )
    xs = [x for (x,) in rows]
    mu = sum(xs) / len(xs)
    xt = sum(xs)
    t = sum((x / xt) * math.log(x / mu) for x in xs)
    assert abs(r["t_total"] - t) < 1e-4
