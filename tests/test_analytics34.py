"""Replay for analytics wave 44 (stat_granger_1lag)."""

from __future__ import annotations

import duckdb
import numpy as np

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def test_granger_matches_numpy_ols(spark, sf_dir):
    rows = duckdb.connect().execute(
        f"""SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr,
                   count(*) FILTER (WHERE event_type = 'purchase') AS p,
                   count(*) FILTER (WHERE event_type = 'view') AS v
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY hr ORDER BY hr"""
    ).fetchall()
    p = np.array([r[1] for r in rows], dtype=float)
    v = np.array([r[2] for r in rows], dtype=float)
    y, a, b = p[1:], p[:-1], v[:-1]
    n = len(y)
    Xu = np.column_stack([np.ones(n), a, b])
    Xr = np.column_stack([np.ones(n), a])
    bu, *_ = np.linalg.lstsq(Xu, y, rcond=None)
    br, *_ = np.linalg.lstsq(Xr, y, rcond=None)
    ssr_u = float(((y - Xu @ bu) ** 2).sum())
    ssr_r = float(((y - Xr @ br) ** 2).sum())
    fstat = (ssr_r - ssr_u) * (n - 3) / ssr_u
    r = REGISTRY["stat_granger_1lag"].fn(spark, sf_dir).collect()[0]
    assert r["n_obs"] == n
    # independent solver (numpy lstsq) vs the engine's Cramer chains:
    # agree to a loose numeric tolerance, exact-match is the oracle's job
    assert abs(r["ssr_unrestricted"] - ssr_u) < 1e-4 * max(1.0, ssr_u)
    assert abs(r["ssr_restricted"] - ssr_r) < 1e-4 * max(1.0, ssr_r)
    assert abs(r["f_granger"] - fstat) < 1e-3 * max(1.0, abs(fstat))
    # adding a regressor can only reduce SSR
    assert r["ssr_unrestricted"] <= r["ssr_restricted"] + 1e-6
    assert r["f_granger"] >= -1e-9
