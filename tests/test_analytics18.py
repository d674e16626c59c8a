"""Replays for analytics wave 18 (queries/analytics18.py): PACF,
tolerance as-of join, Poisson IRLS."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def _acf(xs, k):
    n = len(xs)
    mu = sum(xs) / n
    c0 = sum((x - mu) ** 2 for x in xs)
    ck = sum((xs[t] - mu) * (xs[t + k] - mu) for t in range(n - k))
    return ck / c0


def test_pacf_matches_durbin_levinson(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) h,
                   count(*)
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    per = defaultdict(list)
    for et, _h, c in rows:
        per[et].append(c)
    # NOTE: the operator computes acf over the OBSERVED hourly rows in
    # hour order (gaps collapse) — mirror that here.
    out = {r["event_type"]: r for r in REGISTRY["ts_pacf"].fn(spark, sf_dir).collect()}
    for et, xs in per.items():
        if len(xs) < 4:
            assert et not in out
            continue
        r1, r2, r3 = _acf(xs, 1), _acf(xs, 2), _acf(xs, 3)
        phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
        phi21 = r1 * (1 - r2) / (1 - r1 * r1)
        phi33 = (r3 - phi21 * r2 - phi22 * r1) / (
            1 - phi21 * r1 - phi22 * r2
        )
        got = out[et]
        assert got["n"] == len(xs)
        assert abs(got["pacf1"] - r1) < 1e-5
        assert abs(got["pacf2"] - phi22) < 1e-5
        assert abs(got["pacf3"] - phi33) < 1e-5
        for v in (got["pacf1"], got["pacf2"], got["pacf3"]):
            assert -1 - 1e-9 <= v <= 1 + 1e-9


def test_asof_tolerance_vs_plain_asof(spark, sf_dir):
    plain = {
        r["event_id"]: r for r in REGISTRY["join_asof"].fn(spark, sf_dir).collect()
    }
    tol = {
        r["event_id"]: r
        for r in REGISTRY["join_asof_tolerance"].fn(spark, sf_dir).collect()
    }
    assert set(plain) == set(tol)
    # tolerance can only REMOVE matches, and when it keeps one it must
    # be the same nearest-prior value
    n_dropped = 0
    for eid, p in plain.items():
        t_ = tol[eid]
        if t_["has_click_10m"] == 1.0:
            assert p["has_click"] == 1.0
            assert t_["last_click_value"] == p["last_click_value"]
        elif p["has_click"] == 1.0:
            n_dropped += 1
    assert n_dropped > 0, "tolerance never fired — threshold too loose"
    # exact replay of the gap rule
    rows = _duck(
        f"""WITH p AS (SELECT event_id, user_id, epoch_us(ts) pts
                       FROM read_parquet('{SF_DIR}/events.parquet')
                       WHERE event_type='purchase'),
                 c AS (SELECT user_id, epoch_us(ts) cts
                       FROM read_parquet('{SF_DIR}/events.parquet')
                       WHERE event_type='click')
            SELECT p.event_id,
                   max(CASE WHEN p.pts - c.cts <= 600000000
                            THEN 1 ELSE 0 END) AS any_in_tol
            FROM p JOIN c ON p.user_id = c.user_id AND c.cts <= p.pts
            GROUP BY p.event_id"""
    )
    exp_in_tol = {eid: bool(v) for eid, v in rows}
    for eid, t_ in tol.items():
        assert (t_["has_click_10m"] == 1.0) == exp_in_tol.get(eid, False)


def test_poisson_irls_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT user_id, count_if(event_type='purchase'),
                   count_if(event_type='view')
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"""
    )
    data = [(x, y) for _u, y, x in rows]
    n = len(data)
    # iteration 1 (mu=1): weighted OLS of z=y-1 on x
    sx = sum(x for x, _ in data)
    sxx = sum(x * x for x, _ in data)
    sz = sum(y - 1 for _x, y in data)
    sxz = sum(x * (y - 1) for x, y in data)
    b1 = (n * sxz - sx * sz) / (n * sxx - sx * sx)
    a1 = (sz - b1 * sx) / n
    # iteration 2
    sw = swx = swxx = swz = swxz = 0.0
    for x, y in data:
        eta = a1 + b1 * x
        mu = math.exp(eta)
        z = eta + (y - mu) / mu
        sw += mu
        swx += mu * x
        swxx += mu * x * x
        swz += mu * z
        swxz += mu * x * z
    b2 = (sw * swxz - swx * swz) / (sw * swxx - swx * swx)
    a2 = (swz - b2 * swx) / sw
    r = REGISTRY["ml_poisson_irls"].fn(spark, sf_dir).collect()[0]
    assert abs(r["coef_iter1"] - b1) < 1e-5
    assert abs(r["intercept_iter1"] - a1) < 1e-5
    assert abs(r["coef_iter2"] - b2) < 1e-4
    assert abs(r["intercept_iter2"] - a2) < 1e-4
