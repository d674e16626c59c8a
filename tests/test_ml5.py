"""Replays for ML wave 5 (queries/ml5.py)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_woe_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT round(value, 6), event_type = 'purchase'
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE value IS NOT NULL ORDER BY 1"""
    )
    xs = [x for x, _y in rows]
    # decile of a value = floor(10 * (#strictly smaller) / n)
    n = len(xs)
    from bisect import bisect_left

    sxs = sorted(xs)
    cells = defaultdict(lambda: [0, 0])
    for x, y in rows:
        b = (10 * bisect_left(sxs, x)) // n
        cells[b][0 if y else 1] += 1
    tpos = sum(c[0] for c in cells.values())
    tneg = sum(c[1] for c in cells.values())
    out = {r["bin"]: r for r in REGISTRY["ml_woe_encoding"].fn(spark, sf_dir).collect()}
    exp_bins = {b for b, (p, g) in cells.items() if p > 0 and g > 0}
    assert set(out) == exp_bins
    for b in exp_bins:
        p, g = cells[b]
        woe = math.log((p / tpos) / (g / tneg))
        r = out[b]
        assert (r["pos"], r["neg"]) == (p, g)
        assert abs(r["woe"] - woe) < 1e-5


def test_cramers_v_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT lang, source, count(*)
            FROM read_parquet('{SF_DIR}/documents.parquet') GROUP BY 1, 2"""
    )
    obs = {(lg, sc): o for lg, sc, o in rows}
    langs = sorted({lg for lg, _s, _o in rows})
    srcs = sorted({s for _l, s, _o in rows})
    n = sum(obs.values())
    rm = {lg: sum(o for (l2, _s), o in obs.items() if l2 == lg) for lg in langs}
    cm = {s: sum(o for (_l, s2), o in obs.items() if s2 == s) for s in srcs}
    chi2 = 0.0
    for lg in langs:
        for s in srcs:
            e = rm[lg] * cm[s] / n
            o = obs.get((lg, s), 0)
            chi2 += round((o - e) ** 2 / e, 9)
    v = math.sqrt(chi2 / (n * min(len(langs) - 1, len(srcs) - 1)))
    r = REGISTRY["stat_cramers_v"].fn(spark, sf_dir).collect()[0]
    assert r["n"] == n and r["nr"] == len(langs) and r["nc"] == len(srcs)
    assert abs(r["chi2"] - chi2) < 1e-4
    assert abs(r["cramers_v"] - v) < 1e-5
    assert 0 <= r["cramers_v"] <= 1
