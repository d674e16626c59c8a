"""Replay for analytics wave 37 (stat_kruskal_wallis)."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def test_kruskal_wallis_matches_python_replay(spark, sf_dir):
    rows = duckdb.connect().execute(
        f"""SELECT event_type, value
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    # midrank assignment over the pooled sample
    allv = sorted(v for _, v in rows)
    n = len(allv)
    rank_of = {}
    i = 0
    while i < n:
        j = i
        while j < n and allv[j] == allv[i]:
            j += 1
        rank_of[allv[i]] = (i + 1 + j) / 2  # average of ranks i+1..j
        i = j
    rg = defaultdict(float)
    ng = defaultdict(int)
    for et, v in rows:
        rg[et] += rank_of[v]
        ng[et] += 1
    s = sum(rg[g] ** 2 / ng[g] for g in rg)
    h = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    tie_counts = defaultdict(int)
    for v in allv:
        tie_counts[v] += 1
    t3 = sum(t**3 - t for t in tie_counts.values())
    hc = h / (1 - t3 / (float(n) ** 3 - n))
    r = REGISTRY["stat_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    assert r["k"] == len(rg) and r["n"] == n and r["df"] == len(rg) - 1
    assert abs(r["h"] - round(h, 6)) < 3e-6
    assert abs(r["h_tie_corrected"] - round(hc, 6)) < 3e-6
    assert r["h"] >= 0
