"""Replays for analytics wave 36 (queries/analytics27.py)."""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def _sse(n, s, ss):
    return float(ss) - float(s) * float(s) / n


def test_regression_tree_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hr,
                   count(*) AS n,
                   sum(CAST(value AS DECIMAL(18,2))) AS s,
                   sum(CAST(value AS DECIMAL(18,2))
                       * CAST(value AS DECIMAL(18,2))) AS ss
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY hr ORDER BY hr"""
    )
    hm = {hr: (n, Decimal(s), Decimal(ss)) for hr, n, s, ss in rows}

    def split_cost(hours, t):
        ln = sum(hm[h][0] for h in hours if h <= t)
        ls = sum(hm[h][1] for h in hours if h <= t)
        lss = sum(hm[h][2] for h in hours if h <= t)
        rn = sum(hm[h][0] for h in hours if h > t)
        rs = sum(hm[h][1] for h in hours if h > t)
        rss = sum(hm[h][2] for h in hours if h > t)
        return _sse(ln, ls, lss) + _sse(rn, rs, rss)

    hours = sorted(hm)
    t0 = min(
        (t for t in hours if 1 <= t <= 21),
        key=lambda t: (split_cost(hours, t), t),
    )
    leaves = {}
    for side, hs in (
        ("L", [h for h in hours if h <= t0]),
        ("R", [h for h in hours if h > t0]),
    ):
        t1 = min(hs[:-1], key=lambda t: (split_cost(hs, t), t))
        leaves[side + "L"] = [h for h in hs if h <= t1]
        leaves[side + "R"] = [h for h in hs if h > t1]
    out = {
        r["leaf"]: r
        for r in REGISTRY["ml_regression_tree_depth2"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(out) == set(leaves)
    for leaf, hs in leaves.items():
        n = sum(hm[h][0] for h in hs)
        s = sum(hm[h][1] for h in hs)
        ss = sum(hm[h][2] for h in hs)
        r = out[leaf]
        assert r["hr_lo"] == min(hs) and r["hr_hi"] == max(hs)
        assert r["n"] == n
        assert abs(r["mean_value"] - round(float(s) / n, 6)) < 2e-6
        assert abs(r["sse"] - round(_sse(n, s, ss), 6)) < 3e-6


def test_binary_segmentation_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type,
                   CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr,
                   count(*) AS c
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    series = defaultdict(list)
    for et, hr, c in rows:
        series[et].append((hr, c))
    out = {
        r["event_type"]: r
        for r in REGISTRY["ts_binary_segmentation"].fn(spark, sf_dir).collect()
    }
    for et, pts in series.items():
        cs = [c for _, c in pts]
        n = len(cs)
        tot = _sse(n, sum(cs), sum(c * c for c in cs))
        best = None
        for x in range(1, n):
            l, r_ = cs[:x], cs[x:]
            red = (
                tot
                - _sse(x, sum(l), sum(c * c for c in l))
                - _sse(n - x, sum(r_), sum(c * c for c in r_))
            )
            if best is None or red > best[0] + 1e-12:
                best = (red, x)
        red, x = best
        r = out[et]
        assert r["n_hours"] == n
        assert r["split_pos"] == x
        assert r["split_hr"] == pts[x - 1][0]
        assert abs(r["mean_left"] - round(sum(cs[:x]) / x, 6)) < 2e-6
        assert abs(
            r["mean_right"] - round(sum(cs[x:]) / (n - x), 6)
        ) < 2e-6
        assert abs(r["sse_reduction"] - round(red, 6)) < 3e-6
        assert r["sse_reduction"] >= -1e-9
