"""Independent replays for the eleventh analytics wave
(queries/analytics11.py)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def _u64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_winnowing_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT doc_id, lower(trim(text))
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    K, W = 4, 5
    fps = {}
    for d, text in rows:
        ws = text.split()
        gh = [
            _u64(" ".join(ws[i : i + K]) + ":winnow")
            for i in range(len(ws) - K + 1)
        ]
        if len(gh) < W:
            continue
        wins = {min(gh[j : j + W]) for j in range(len(gh) - W + 1)}
        fps[d] = wins
    fc = Counter()
    for wins in fps.values():
        fc.update(wins)
    out = REGISTRY["doc_winnowing_fingerprint"].fn(spark, sf_dir).collect()
    assert len(out) == len(fps)
    for r in out:
        wins = fps[r["doc_id"]]
        shared = sum(1 for f in wins if fc[f] > 1)
        assert (r["n_fingerprints"], r["n_shared"]) == (
            len(wins),
            shared,
        ), r["doc_id"]
    # winnowing density: ~2/(w+1) of grams become fingerprints
    total_grams = sum(
        max(len(t.split()) - K + 1, 0) for _d, t in rows
    )
    total_fps = sum(len(v) for v in fps.values())
    assert 0.1 < total_fps / total_grams < 0.6


def test_salted_heavy_key_equals_direct(spark, sf_dir):
    exp = {
        f: (n, q, c)
        for f, n, q, c in _duck(
            f"""SELECT l_returnflag, count(*),
                       sum(CAST(l_quantity AS BIGINT)),
                       sum(CAST(round(l_extendedprice*100) AS BIGINT))
                FROM read_parquet('{SF_DIR}/lineitem.parquet')
                GROUP BY 1"""
        )
    }
    out = REGISTRY["agg_salted_heavy_key"].fn(spark, sf_dir).collect()
    got = {
        r["l_returnflag"]: (r["n"], r["sum_qty"], r["sum_price_cents"])
        for r in out
    }
    assert got == exp
    assert "__salt" not in out[0].asDict()


def test_segment_migration_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT user_id, CAST(floor(epoch(ts)/86400) AS BIGINT),
                   event_type
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    days = [d for _u, d, _e in rows]
    mid = (min(days) + max(days)) // 2
    p1, p2 = Counter(), Counter()
    users = set()
    for u, d, et in rows:
        users.add(u)
        if et == "purchase":
            (p1 if d <= mid else p2)[u] += 1

    def cls(c):
        return "high" if c >= 7 else ("mid" if c >= 3 else "low")

    exp = Counter(
        (cls(p1[u]), cls(p2[u])) for u in users
    )
    out = REGISTRY["events_segment_migration"].fn(spark, sf_dir).collect()
    got = {
        (r["seg_before"], r["seg_after"]): r["n_users"] for r in out
    }
    assert got == dict(exp)
    assert sum(got.values()) == len(users)
