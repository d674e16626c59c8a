"""Reference replays for the sixth analytics wave
(queries/analytics6.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


@pytest.fixture(scope="module")
def daily():
    rows = _duck(
        f"""SELECT CAST(floor(epoch(ts)/86400) AS BIGINT),
                   count(*) FILTER (WHERE event_type='view'),
                   count(*) FILTER (WHERE event_type='purchase')
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type IN ('view','purchase') GROUP BY 1 ORDER BY 1"""
    )
    return [(d, int(x), int(y)) for d, x, y in rows]


def test_lateral_topk_matches_loop(spark, sf_dir):
    cust = _duck(
        f"""SELECT c_nationkey, c_name, c_acctbal
            FROM read_parquet('{SF_DIR}/customer.parquet')"""
    )
    nat = dict(
        _duck(
            f"""SELECT n_nationkey, n_name
            FROM read_parquet('{SF_DIR}/nation.parquet')"""
        )
    )
    per = defaultdict(list)
    for nk, name, bal in cust:
        per[nk].append((-bal, name))
    expect = []
    for nk in sorted(per, key=lambda k: nat[k]):
        for negbal, name in sorted(per[nk])[:3]:
            expect.append((nat[nk], name, -negbal))
    out = REGISTRY["join_lateral_topk"].fn(spark, sf_dir).collect()
    got = [(r["n_name"], r["c_name"], r["c_acctbal"]) for r in out]
    assert got == expect


def test_cross_correlation_matches_loop(spark, sf_dir, daily):
    xs = {d: x for d, x, _ in daily}
    ys = {d: y for d, _, y in daily}
    out = REGISTRY["ts_cross_correlation"].fn(spark, sf_dir).collect()
    assert [r["lag"] for r in out] == list(range(-3, 4))
    for r in out:
        pairs = [
            (xs[d], ys[d + r["lag"]]) for d in xs if d + r["lag"] in ys
        ]
        n = len(pairs)
        assert r["n"] == n
        mx = sum(p[0] for p in pairs) / n
        my = sum(p[1] for p in pairs) / n
        cov = sum(a * b for a, b in pairs) / n - mx * my
        vx = sum(a * a for a, _ in pairs) / n - mx * mx
        vy = sum(b * b for _, b in pairs) / n - my * my
        assert r["xcorr"] == pytest.approx(
            cov / math.sqrt(vx * vy), abs=1e-5
        )


def test_kendall_tau_matches_loop(spark, sf_dir, daily):
    nc = nd = n1 = n2 = 0
    n = len(daily)
    for i in range(n):
        for j in range(i + 1, n):
            dx = daily[i][1] - daily[j][1]
            dy = daily[i][2] - daily[j][2]
            if dx * dy > 0:
                nc += 1
            elif dx * dy < 0:
                nd += 1
            if dx == 0:
                n1 += 1
            if dy == 0:
                n2 += 1
    n0 = n * (n - 1) // 2
    out = REGISTRY["stat_kendall_tau"].fn(spark, sf_dir).collect()[0]
    assert (out["n0"], out["nc"], out["nd"]) == (n0, nc, nd)
    tau = (nc - nd) / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))
    assert out["tau_b"] == pytest.approx(tau, abs=1e-6)


def test_outlier_iqr_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, value
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    per = defaultdict(list)
    for et, v in rows:
        per[et].append(v)
    out = REGISTRY["diag_outlier_iqr"].fn(spark, sf_dir).collect()
    assert len(out) == len(per)
    for r in out:
        vs = sorted(per[r["event_type"]])
        n = len(vs)

        def interp(q):
            pos = q * (n - 1)
            lo, hi = vs[math.floor(pos)], vs[math.ceil(pos)]
            return lo + (pos - math.floor(pos)) * (hi - lo)

        q1, q3 = interp(0.25), interp(0.75)
        lo_f = q1 - 1.5 * (q3 - q1)
        hi_f = q3 + 1.5 * (q3 - q1)
        assert r["n"] == n
        assert r["q1"] == pytest.approx(q1, abs=1e-6)
        assert r["q3"] == pytest.approx(q3, abs=1e-6)
        assert r["n_low"] == sum(1 for v in vs if v < lo_f)
        assert r["n_high"] == sum(1 for v in vs if v > hi_f)


def test_heaps_fit_matches_loop(spark, sf_dir):
    rows = _duck(
        rf"""SELECT source, count(*), count(DISTINCT word) FROM (
              SELECT source,
                     unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                       AS word
              FROM read_parquet('{SF_DIR}/documents.parquet'))
            GROUP BY source"""
    )
    pts = [
        (round(math.log(nt), 9), round(math.log(ty), 9))
        for _, nt, ty in rows
    ]
    k = len(pts)
    mx = sum(x for x, _ in pts) / k
    my = sum(y for _, y in pts) / k
    beta = (sum(x * y for x, y in pts) / k - mx * my) / (
        sum(x * x for x, _ in pts) / k - mx * mx
    )
    out = REGISTRY["corpus_heaps_fit"].fn(spark, sf_dir).collect()[0]
    assert out["n_sources"] == k
    assert out["beta"] == pytest.approx(beta, abs=1e-4)
    assert out["ln_k"] == pytest.approx(my - beta * mx, abs=1e-3)
    # Heaps exponent must be sub-linear and positive on any real corpus
    assert 0 < out["beta"] <= 1.0