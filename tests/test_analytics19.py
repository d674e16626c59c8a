"""Replays for analytics wave 19 (queries/analytics19.py)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_ewm_volatility_matches_pandas(spark, sf_dir):
    import pandas as pd

    rows = _duck(
        f"""SELECT event_type, CAST(floor(epoch(ts)/60) AS BIGINT) m,
                   sum(round(value,6))/count(*) v
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    per = defaultdict(list)
    for et, _m, v in rows:
        per[et].append(v)
    out = {r["event_type"]: r for r in REGISTRY["ind_ewm_volatility"].fn(spark, sf_dir).collect()}
    for et, xs in per.items():
        s = pd.Series(xs)
        mean = s.ewm(alpha=0.1, adjust=True).mean().iloc[-1]
        var = s.ewm(alpha=0.1, adjust=True).var(bias=True).iloc[-1]
        assert abs(out[et]["ewm_mean"] - mean) < 1e-4
        assert abs(out[et]["ewm_var"] - var) < 1e-3
        assert out[et]["ewm_var"] >= -1e-9


def test_label_prop_matches_loop(spark, sf_dir):
    edges = _duck(
        f"""WITH c AS (SELECT DISTINCT user_id, event_type,
                       CAST(floor(epoch(ts)/300) AS BIGINT) AS w
                       FROM read_parquet('{SF_DIR}/events.parquet')
                       WHERE user_id < 120)
            SELECT DISTINCT a.user_id, b.user_id
            FROM c a JOIN c b ON a.event_type = b.event_type AND a.w = b.w
             AND a.user_id < b.user_id"""
    )
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)

    def vote(labels):
        new = {}
        for v, nbs in adj.items():
            cnt = Counter(labels[nb] for nb in nbs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        return new

    labels = {v: v for v in adj}
    labels = vote(labels)
    labels = vote(labels)
    hist = Counter(labels.values())
    out = {
        r["community"]: r["size"]
        for r in REGISTRY["graph_label_prop_2round"].fn(spark, sf_dir).collect()
    }
    assert out == dict(hist)
