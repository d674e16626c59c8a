"""Reference replays for the robust time-series wave
(queries/analytics5.py): classical decomposition and Theil-Sen are
recomputed with explicit Python loops and compared exactly."""

from __future__ import annotations

import statistics

import duckdb
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


@pytest.fixture(scope="module")
def daily():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT event_type, CAST(floor(epoch(ts)/86400) AS BIGINT) d,
                   count(*) c
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    out = {}
    for et, d, c in rows:
        out.setdefault(et, []).append((d, c))
    return out


def test_stl_decompose_matches_loop(spark, sf_dir, daily):
    """Trend / seasonal / residual replayed with explicit windows;
    also pins the decomposition identity c = trend+seasonal+resid and
    that the count-weighted seasonal means sum to ~zero."""
    expect = {}
    for et, series in daily.items():
        cs = [c for _, c in series]
        interior = []
        for i in range(3, len(cs) - 3):
            sx = sum(cs[i - 3: i + 4])
            d, c = series[i]
            interior.append((d, c, sx, 7 * c - sx, d % 7))
        if not interior:
            continue
        g_num = sum(r[3] for r in interior)
        n_tot = len(interior)
        s_by_dow = {}
        for _, _, _, dn, dow in interior:
            s_by_dow.setdefault(dow, []).append(dn)
        for d, c, sx, dn, dow in interior:
            s_num = sum(s_by_dow[dow])
            s_cnt = len(s_by_dow[dow])
            seasonal = s_num / (7.0 * s_cnt) - g_num / (7.0 * n_tot)
            trend = sx / 7.0
            expect[(et, d)] = (c, trend, seasonal, c - trend - seasonal)

    got = REGISTRY["ts_stl_decompose"].fn(spark, sf_dir).collect()
    assert {(r["event_type"], r["day"]) for r in got} == set(expect)
    for r in got:
        c, trend, seasonal, resid = expect[(r["event_type"], r["day"])]
        assert r["c"] == c
        assert r["trend"] == pytest.approx(trend, abs=1e-6)
        assert r["seasonal"] == pytest.approx(seasonal, abs=1e-6)
        assert r["resid"] == pytest.approx(resid, abs=1e-6)
        # additive identity (to rounding grain)
        assert r["trend"] + r["seasonal"] + r["resid"] == pytest.approx(
            r["c"], abs=3e-6
        )
    # count-weighted seasonal means cancel per type by construction
    for et, series in daily.items():
        rows = [r for r in got if r["event_type"] == et]
        if not rows:
            continue
        w = sum(r["seasonal"] for r in rows)
        assert abs(w) < 1e-3 * len(rows) + 1e-6


def test_theil_sen_matches_loop(spark, sf_dir, daily):
    """Median pairwise slope replayed with statistics.median over the
    full slope multiset."""
    got = {
        r["event_type"]: r
        for r in REGISTRY["ts_theil_sen"].fn(spark, sf_dir).collect()
    }
    for et, series in daily.items():
        slopes = [
            (cb - ca) / float(db - da)
            for i, (da, ca) in enumerate(series)
            for db, cb in series[i + 1:]
        ]
        if not slopes:
            assert et not in got
            continue
        med = statistics.median(slopes)
        r = got[et]
        assert r["n_slopes"] == len(slopes)
        assert r["slope_per_day"] == pytest.approx(med, abs=1e-6)
        assert r["direction"] == (
            "increasing" if med > 0 else "decreasing" if med < 0 else "flat"
        )


def test_funnel_latency_matches_loop(spark, sf_dir):
    """view->purchase latency percentiles replayed with a linear-
    interpolation quantile (the quantile_cont formula) in pure
    Python."""
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id,
                   min(CASE WHEN event_type='view' THEN epoch_us(ts) END),
                   min(CASE WHEN event_type='purchase' THEN epoch_us(ts) END)
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY user_id"""
    ).fetchall()
    gaps = sorted(
        tb - tv for _, tv, tb in rows
        if tv is not None and tb is not None and tb > tv
    )
    assert gaps, "testdata must contain converting users"

    def qcont(q):
        pos = q * (len(gaps) - 1)
        lo, frac = int(pos), pos - int(pos)
        hi = min(lo + 1, len(gaps) - 1)
        return (gaps[lo] + (gaps[hi] - gaps[lo]) * frac) / 1e6

    r = REGISTRY["events_funnel_latency"].fn(spark, sf_dir).collect()[0]
    assert r["n_converted"] == len(gaps)
    assert r["n_users"] == len(rows)
    assert r["conversion_rate"] == pytest.approx(
        len(gaps) / len(rows), abs=1e-6
    )
    for q, col in [(0.25, "p25_s"), (0.5, "p50_s"), (0.75, "p75_s"),
                   (0.9, "p90_s")]:
        assert r[col] == pytest.approx(qcont(q), abs=1e-5), col
