"""Independent replays for the twelfth analytics wave
(queries/analytics12.py)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def _u64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_pattern_regex_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT user_id, ts, event_id, substr(event_type, 1, 1)
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    )
    seqs = defaultdict(str)
    for u, _ts, _eid, ch in rows:
        seqs[u] += ch
    out = REGISTRY["events_pattern_regex"].fn(spark, sf_dir).collect()
    assert len(out) == len(seqs)
    pat = re.compile("v+c*p")
    any_match = False
    for r in out:
        seq = seqs[r["user_id"]]
        m = pat.findall(seq)
        assert r["n_events"] == len(seq)
        assert r["n_matches"] == len(m), r["user_id"]
        assert r["has_conversion_path"] == (len(m) > 0)
        any_match = any_match or bool(m)
    assert any_match


def test_bitset_presence_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT c_nationkey, CAST(substr(o_orderpriority,1,1) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') o
            JOIN read_parquet('{SF_DIR}/customer.parquet') c
              ON o.o_custkey = c.c_custkey"""
    )
    masks = defaultdict(int)
    dist = defaultdict(set)
    for nat, p in rows:
        masks[nat] |= 1 << p
        dist[nat].add(p)
    out = REGISTRY["agg_bitset_presence"].fn(spark, sf_dir).collect()
    assert len(out) == len(masks)
    for r in out:
        nat = r["nation"]
        assert r["priority_mask"] == masks[nat]
        assert r["n_distinct_priorities"] == len(dist[nat])
        assert r["check_distinct"] == len(dist[nat])
        assert bin(masks[nat]).count("1") == len(dist[nat])


def test_containment_pairs_match_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT doc_id, lang, lower(trim(text))
            FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE doc_id < 120"""
    )
    grams = {}
    lang = {}
    for d, lg, text in rows:
        ws = text.split()
        grams[d] = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        }
        lang[d] = lg
    expect = {}
    ids = sorted(grams)
    for a in ids:
        for b in ids:
            if a == b or lang[a] != lang[b]:
                continue
            inter = len(grams[a] & grams[b])
            if grams[a] and inter / len(grams[a]) >= 0.05:
                expect[(a, b)] = (inter, inter / len(grams[a]))
    out = REGISTRY["doc_containment_pairs"].fn(spark, sf_dir).collect()
    got = {
        (r["id_a"], r["id_b"]): (r["n_inter"], r["containment"])
        for r in out
    }
    assert set(got) == set(expect)
    for k, (ni, c) in expect.items():
        assert got[k][0] == ni
        assert abs(got[k][1] - c) < 1e-6
