"""Replays and invariants for analytics wave 33 (queries/analytics24.py).

Each replay recomputes the statistic in plain Python from a DuckDB
row pull (independent of both the Spark plan and the registered
oracle SQL), so a shared oracle/engine mistake cannot self-confirm.
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_win_drawdown_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT user_id, event_type, CAST(value AS DECIMAL(18,2))
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, epoch_us(ts), event_id"""
    )
    per = defaultdict(list)
    for uid, et, v in rows:
        amt = -v if et in ("click", "view") else v
        per[uid].append(Decimal(amt))
    out = {
        r["user_id"]: r
        for r in REGISTRY["win_drawdown"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(per)
    for uid, amts in per.items():
        cum = Decimal(0)
        peak = None
        mdd = 0.0
        for a in amts:
            cum += a
            peak = cum if peak is None or cum > peak else peak
            if peak > 0:
                mdd = max(mdd, (float(peak) - float(cum)) / float(peak))
        r = out[uid]
        assert r["n_events"] == len(amts)
        assert abs(r["final_equity"] - float(cum)) < 1e-6
        assert abs(r["max_drawdown"] - round(mdd, 6)) < 2e-6
        assert 0.0 <= r["max_drawdown"]


def test_durbin_watson_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr,
                   count(*) AS c
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY event_type, hr"""
    )
    series = defaultdict(list)
    for et, _hr, c in rows:
        series[et].append(c)
    out = {
        r["event_type"]: r
        for r in REGISTRY["stat_durbin_watson"].fn(spark, sf_dir).collect()
    }
    for et, cs in series.items():
        n = len(cs)
        xs = range(1, n + 1)
        sx, sy = sum(xs), sum(cs)
        sxy = sum(x * c for x, c in zip(xs, cs))
        sxx = sum(x * x for x in xs)
        den = n * sxx - sx * sx
        if den == 0:
            assert et not in out
            continue
        slope = (n * sxy - sx * sy) / den
        icept = (sy - slope * sx) / n
        q = [Decimal(str(round(c - icept - slope * x, 6))) for x, c in zip(xs, cs)]
        num = sum((a - b) * (a - b) for a, b in zip(q[1:], q[:-1]))
        dd = sum(a * a for a in q)
        r = out[et]
        assert r["n_hours"] == n
        assert abs(r["slope"] - round(slope, 6)) < 2e-6
        assert abs(r["dw"] - round(float(num) / float(dd), 6)) < 2e-6
        assert 0.0 <= r["dw"] <= 4.0 + 1e-9


def test_permutation_entropy_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr,
                   count(*) AS c
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY event_type, hr"""
    )
    series = defaultdict(list)
    for et, _hr, c in rows:
        series[et].append(c)
    out = {
        r["event_type"]: r
        for r in REGISTRY["ts_permutation_entropy"].fn(spark, sf_dir).collect()
    }
    for et, cs in series.items():
        pats = defaultdict(int)
        for a, b, c in zip(cs, cs[1:], cs[2:]):
            pats[4 * (a < b) + 2 * (b < c) + (a < c)] += 1
        n = sum(pats.values())
        ent = math.log(n) - sum(c * math.log(c) for c in pats.values()) / n
        r = out[et]
        assert r["n_windows"] == n
        assert r["n_patterns"] == len(pats)
        assert abs(r["perm_entropy_nats"] - round(ent, 6)) < 2e-6
        # order-3 entropy is bounded by ln(6) (only 6 patterns are
        # realizable; the 3-bit encoding leaves 2 codes unused)
        assert 0.0 <= r["perm_entropy_nats"] <= math.log(6) + 1e-9


def test_bipower_invariants(spark, sf_dir):
    rows = REGISTRY["trade_realized_bipower"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rv"] >= 0.0
        assert r["bpv"] >= 0.0
        assert r["jump_var"] >= -1e-9
        # jump_var = max(0, rv - bpv) up to the independent round-6 of
        # each emitted column
        assert abs(r["jump_var"] - max(0.0, r["rv"] - r["bpv"])) < 2e-6


def test_stickiness_bounds(spark, sf_dir):
    rows = REGISTRY["events_stickiness"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["stickiness"] <= 1.0 + 1e-9
        assert 0 < r["avg_dau"] <= r["mau"] + 1e-9


def test_hhi_bounds(spark, sf_dir):
    rows = REGISTRY["agg_hhi_concentration"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 1e4/n_suppliers <= HHI*1e4 <= 1e4 (equal shares .. monopoly)
        assert 10000.0 / r["n_suppliers"] - 1e-6 <= r["hhi_x1e4"]
        assert r["hhi_x1e4"] <= 10000.0 + 1e-6


def test_grubbs_and_amihud_positive(spark, sf_dir):
    for name, col in (
        ("stat_grubbs_max", "grubbs_g"),
        ("trade_amihud_illiquidity", "amihud_x1e6"),
    ):
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r[col] > 0.0
