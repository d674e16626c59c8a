"""Replay for analytics wave 38 (ts_hurst_rs)."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def test_hurst_matches_python_replay(spark, sf_dir):
    rows = duckdb.connect().execute(
        f"""SELECT event_type, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr,
                   count(*) AS c
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series = defaultdict(list)
    for et, _hr, c in rows:
        series[et].append(c)
    out = {
        r["event_type"]: r
        for r in REGISTRY["ts_hurst_rs"].fn(spark, sf_dir).collect()
    }
    for et, cs in series.items():
        pts = []
        for m in (16, 64, 256):
            # strictly as the engine computes: max(w)-min(w) over the
            # m in-block rows (no implicit w_0 = 0 row)
            rss = []
            for b in range(len(cs) // m):
                blk = cs[b * m : (b + 1) * m]
                s, ss = sum(blk), sum(c * c for c in blk)
                var = (float(ss) - float(s) * s / m) / m
                if var <= 0:
                    continue
                mean = float(s) / m
                ws = []
                cum = 0
                for t, c in enumerate(blk, start=1):
                    cum += c
                    ws.append(cum - t * mean)
                rss.append(round((max(ws) - min(ws)) / math.sqrt(var), 9))
            if rss:
                avg = sum(rss) / len(rss)
                if avg > 0:
                    pts.append((math.log(m), math.log(avg)))
        if len(pts) < 2:
            assert et not in out
            continue
        k = len(pts)
        sx = sum(round(x, 9) for x, _ in pts)
        sy = sum(round(y, 9) for _, y in pts)
        sxy = sum(round(x * y, 9) for x, y in pts)
        sxx = sum(round(x * x, 9) for x, _ in pts)
        h = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        r = out[et]
        assert r["n_scales"] == k
        assert abs(r["hurst"] - round(h, 6)) < 5e-6
        # R/S Hurst of a real series lands in (0, 1.2) sanity band
        assert -0.2 < r["hurst"] < 1.3
