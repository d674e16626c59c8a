"""Replays for analytics wave 35 (queries/analytics26.py)."""

from __future__ import annotations

import zlib
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_modularity_matches_python_replay(spark, sf_dir):
    pairs = _duck(
        f"""SELECT DISTINCT user_id, event_type,
                   CAST(floor(epoch(ts)/300) AS BIGINT) AS w
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE user_id < 120"""
    )
    cells = defaultdict(set)
    for u, et, w in pairs:
        cells[(et, w)].add(u)
    edges = set()
    for us in cells.values():
        us = sorted(us)
        for i, a in enumerate(us):
            for b in us[i + 1:]:
                edges.add((a, b))
    m = len(edges)
    counts = _duck(
        f"""SELECT user_id, event_type, count(*)
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE user_id < 120 GROUP BY 1, 2"""
    )
    per = defaultdict(list)
    for u, et, c in counts:
        per[u].append((-c, et))
    comm = {u: min(v)[1] for u, v in per.items()}
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    dsum = defaultdict(int)
    nnode = defaultdict(int)
    for u, c in comm.items():
        nnode[c] += 1
        dsum[c] += deg.get(u, 0)
    ewin = defaultdict(int)
    for a, b in edges:
        if comm.get(a) is not None and comm.get(a) == comm.get(b):
            ewin[comm[a]] += 1
    out = {
        r["community"]: r
        for r in REGISTRY["graph_modularity"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(nnode)
    total_q = 0.0
    for c in nnode:
        r = out[c]
        assert r["n_nodes"] == nnode[c]
        assert r["deg_sum"] == dsum[c]
        assert r["e_within"] == ewin.get(c, 0)
        q = ewin.get(c, 0) / m - (dsum[c] / (2 * m)) ** 2
        assert abs(r["q_contrib"] - round(q, 6)) < 2e-6
        total_q += q
    assert -1.0 <= total_q <= 1.0  # modularity bound


def test_yule_walker_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, count(*) AS c
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY event_type, CAST(floor(epoch(ts)/3600) AS BIGINT)
            ORDER BY event_type,
                     CAST(floor(epoch(ts)/3600) AS BIGINT)"""
    )
    # re-pull ordered series per type
    series = defaultdict(list)
    rows2 = _duck(
        f"""SELECT event_type,
                   CAST(floor(epoch(ts)/3600) AS BIGINT) AS hr,
                   count(*) AS c
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    for et, _hr, c in rows2:
        series[et].append(c)
    out = {
        r["event_type"]: r
        for r in REGISTRY["ts_yule_walker_ar2"].fn(spark, sf_dir).collect()
    }
    for et, cs in series.items():
        n = len(cs)
        mu = sum(cs) / n
        den = sum(c * c for c in cs) - n * mu * mu
        if n <= 2 or den <= 0:
            assert et not in out
            continue
        r1 = sum((a - mu) * (b - mu) for a, b in zip(cs[1:], cs[:-1])) / den
        r2 = sum((a - mu) * (b - mu) for a, b in zip(cs[2:], cs[:-2])) / den
        r = out[et]
        assert abs(r["r1"] - round(r1, 6)) < 2e-6
        assert abs(r["r2"] - round(r2, 6)) < 2e-6
        phi1 = r1 * (1 - r2) / (1 - r1 * r1)
        phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
        assert abs(r["phi1"] - round(phi1, 6)) < 2e-6
        assert abs(r["phi2"] - round(phi2, 6)) < 2e-6


def test_compression_ratio_matches_zlib_exactly(spark, sf_dir):
    docs = _duck(
        f"""SELECT source, text
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    per = defaultdict(list)
    for src, text in docs:
        b = (text or "").encode("utf-8")
        if b:
            per[src].append(round(len(zlib.compress(b, 6)) / len(b), 6))
    out = {
        r["source"]: r
        for r in REGISTRY["doc_compression_ratio"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(per)
    for src, ratios in per.items():
        r = out[src]
        assert r["n_docs"] == len(ratios)
        assert abs(
            r["mean_ratio"] - round(sum(ratios) / len(ratios), 6)
        ) < 2e-6
        assert r["n_repetitive"] == sum(1 for x in ratios if x < 0.4)
        assert r["n_gibberish"] == sum(1 for x in ratios if x > 0.9)


def test_video_pipeline_matches_formula(spark, sf_dir):
    out = REGISTRY["video_frame_pipeline"].fn(spark, sf_dir).collect()
    mids = {
        r[0]
        for r in _duck(
            f"""SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')
                WHERE doc_id < 40"""
        )
    }
    assert len(out) == len(mids) * 6
    ys = [0, 2, 4, 6, 8, 10]
    xs = [0, 2, 4, 6, 8, 10, 12, 14]
    for r in out:
        assert r["width"] == 8 and r["height"] == 6
        assert r["frame_idx"] in (0, 3, 6, 9, 12, 15)
        want = sum(
            (r["media_id"] * 31 + r["frame_idx"] * 7 + (y * 16 + x)) % 256
            for y in ys
            for x in xs
        )
        assert r["checksum"] == want
