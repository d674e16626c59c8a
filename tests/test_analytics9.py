"""Independent replays for the ninth analytics wave
(queries/analytics9.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_roc_auc_matches_pair_counting(spark, sf_dir):
    rows = _duck(
        f"""SELECT value, event_type = 'purchase'
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    pos = sorted(v for v, y in rows if y)
    neg = sorted(v for v, y in rows if not y)
    import bisect

    # AUC by direct pair counting: P(score_pos > score_neg) + 0.5 ties
    wins = ties = 0
    for p in pos:
        lo = bisect.bisect_left(neg, p)
        hi = bisect.bisect_right(neg, p)
        wins += lo
        ties += hi - lo
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    [r] = REGISTRY["ml_roc_auc"].fn(spark, sf_dir).collect()
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
    assert abs(r["auc"] - auc) < 1e-6


def test_calibration_bins_match_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT lang, lower(trim(text))
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    bins = defaultdict(list)
    for lang, text in rows:
        ws = text.split()
        if not ws:
            continue
        p = sum(1 for w in ws if w in ("a", "the")) / len(ws)
        y = 1 if lang == "en" else 0
        bins[min(int(p * 10), 9)].append((p, y))
    out = REGISTRY["ml_calibration_bins"].fn(spark, sf_dir).collect()
    assert len(out) == len(bins)
    for r in out:
        xs = bins[r["bin"]]
        n = len(xs)
        assert r["n"] == n
        assert abs(r["mean_pred"] - sum(p for p, _ in xs) / n) < 1e-5
        assert abs(r["frac_pos"] - sum(y for _, y in xs) / n) < 1e-5
        assert (
            abs(r["bin_brier"] - sum((p - y) ** 2 for p, y in xs) / n)
            < 1e-5
        )


def test_attribution_linear_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_id, user_id, ts, event_type
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    by_user = defaultdict(list)
    for eid, uid, ts, et in rows:
        by_user[uid].append((ts, eid, et))
    credit = Counter()
    n_touch = Counter()
    convs = defaultdict(set)
    from datetime import timedelta

    for uid, evs in by_user.items():
        purchases = [(ts, eid) for ts, eid, et in evs if et == "purchase"]
        for pts, pid in purchases:
            touches = [
                et
                for ts, _eid, et in evs
                if et != "purchase"
                and ts < pts
                and ts >= pts - timedelta(days=7)
            ]
            k = len(touches)
            for et in touches:
                credit[et] += 1.0 / k
                n_touch[et] += 1
                convs[et].add(pid)
    out = REGISTRY["events_attribution_linear"].fn(spark, sf_dir).collect()
    got = {r["channel"]: r for r in out}
    assert set(got) == set(n_touch)
    for ch, r in got.items():
        assert r["n_touches"] == n_touch[ch]
        assert r["n_conversions"] == len(convs[ch])
        assert abs(r["credit"] - credit[ch]) < 1e-4


def test_holt_winters_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, ts, event_id, value
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE user_id % 5 = 0 ORDER BY event_type, ts, event_id"""
    )
    per = defaultdict(list)
    for et, _ts, _eid, v in rows:
        per[et].append(v)
    out = REGISTRY["ind_holt_winters"].fn(spark, sf_dir).collect()
    assert len(out) == len(per)
    a, bta, g, m = 0.3, 0.1, 0.2, 7
    for r in out:
        xs = per[r["event_type"]]
        level, b, s = xs[0], 0.0, [0.0] * m
        for rn0, x in enumerate(xs[1:], start=1):
            idx = rn0 % m
            l_new = a * (x - s[idx]) + (1.0 - a) * (level + b)
            b = bta * (l_new - level) + (1.0 - bta) * b
            s[idx] = g * (x - l_new) + (1.0 - g) * s[idx]
            level = l_new
        assert r["n_rows"] == len(xs)
        assert abs(r["level"] - level) < 1e-6
        assert abs(r["trend"] - b) < 1e-6
        assert abs(r["forecast_1"] - (level + b + s[len(xs) % m])) < 1e-6
        # seasonal component must actually matter: forecast differs
        # from the plain Holt forecast unless the seasonal is degenerate
    # at least one series long enough to exercise every seasonal slot
    assert any(len(v) > 2 * m for v in per.values())
