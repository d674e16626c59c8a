"""Independent replays for analytics wave 16 (queries/analytics16.py):
k-fold CV regression, Poisson bursts, Friedman test."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def _p60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kfold_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = _duck(
        f"""SELECT l_orderkey, l_linenumber, round(l_quantity, 6),
                   round(l_extendedprice, 6)
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    )
    folds = defaultdict(list)
    for ok, ln, q, p in rows:
        folds[_p60(f"{ok}_{ln}:cv") % 5].append((q, p))
    out = {r["fold"]: r for r in REGISTRY["ml_kfold_cv_linreg"].fn(spark, sf_dir).collect()}
    assert set(out) == set(folds)
    n_total = len(rows)
    for f, test in folds.items():
        train = [xy for g, xys in folds.items() if g != f for xy in xys]
        X = np.array([x for x, _ in train])
        Y = np.array([y for _, y in train])
        b, a = np.polyfit(X, Y, 1)
        r = out[f]
        assert r["n_test"] == len(test)
        assert r["n_train"] == n_total - len(test)
        assert abs(r["coef_qty"] - b) < 1e-3
        assert abs(r["intercept"] - a) < 1e-1 * max(1, abs(a))
        rmse = math.sqrt(
            sum((y - (a + b * x)) ** 2 for x, y in test) / len(test)
        )
        assert abs(r["rmse"] - rmse) < 1e-2 * max(1, rmse)


def test_poisson_burst_flags(spark, sf_dir):
    cells = _duck(
        f"""SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT),
                   count(*)
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"""
    )
    base = defaultdict(lambda: [0, 0])
    for et, h, c in cells:
        k = (et, h % 24)
        base[k][0] += c
        base[k][1] += 1
    out = REGISTRY["events_poisson_burst"].fn(spark, sf_dir).collect()
    flagged = {(r["event_type"], r["hour"]) for r in out}
    for et, h, c in cells:
        tot, n = base[(et, h % 24)]
        lam = tot / n
        z = (c - lam) / math.sqrt(lam)
        assert ((et, h) in flagged) == (z > 1.5), (et, h, z)
    for r in out:
        assert r["z"] > 1.5
        tot, n = base[(r["event_type"], r["hour"] % 24)]
        assert abs(r["lam"] - tot / n) < 1e-5


def test_friedman_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT user_id, event_type, sum(round(value, 6)), count(*)
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2"""
    )
    means = defaultdict(dict)
    for u, et, s, c in rows:
        means[u][et] = s / c
    blocks = {u: m for u, m in means.items() if len(m) == 5}
    n, k = len(blocks), 5
    rj = defaultdict(float)
    A = 0.0
    for _u, m in blocks.items():
        for et, mv in m.items():
            lt = sum(1 for v in m.values() if v < mv)
            eq = sum(1 for e2, v in m.items() if v == mv and e2 != et)
            rank = 1 + lt + eq / 2
            rj[et] += rank
            A += rank * rank
    C = n * k * (k + 1) ** 2 / 4
    S = sum((r - n * (k + 1) / 2) ** 2 for r in rj.values())
    q = (k - 1) * S / (A - C)
    r = REGISTRY["stat_friedman_test"].fn(spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert abs(r["q_stat"] - q) < 1e-4
    assert r["q_stat"] >= 0
