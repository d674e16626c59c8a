"""Independent replays for the corpus-maintenance wave 3
(queries/corpus3.py)."""

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


def test_incremental_dedup_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT doc_id, lower(trim(text))
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    old_hashes = {_u64(t) for d, t in rows if d % 10 != 0}
    sigs = {}
    for d, t in rows:
        ws = t.split()
        sh = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        }
        sigs[d] = [
            min((_u64(f"{s}:{i}") for s in sh), default=None)
            for i in range(16)
        ]
    old_ids = [d for d, _t in rows if d % 10 != 0]
    expect = {}
    for d, t in rows:
        if d % 10 != 0:
            continue
        n_near = 0
        for o in old_ids:
            nm = sum(
                1
                for a, b in zip(sigs[d], sigs[o])
                if a is not None and a == b
            )
            if nm >= 4:
                n_near += 1
        status = (
            "exact"
            if _u64(t) in old_hashes
            else ("near" if n_near else "clean")
        )
        expect[d] = (status, n_near)
    out = REGISTRY["doc_incremental_dedup"].fn(spark, sf_dir).collect()
    assert len(out) == len(expect)
    for r in out:
        assert (r["status"], r["n_near_matches"]) == expect[r["doc_id"]], (
            r["doc_id"]
        )


def test_log2_histogram_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT CAST(round(o_totalprice*100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    )
    per = defaultdict(list)
    for (c,) in rows:
        per[c.bit_length()].append(c)
    out = REGISTRY["agg_log2_histogram"].fn(spark, sf_dir).collect()
    assert len(out) == len(per)
    for r in out:
        xs = per[r["bucket"]]
        assert r["n"] == len(xs)
        assert (r["min_cents"], r["max_cents"]) == (min(xs), max(xs))
        assert r["sum_cents"] == sum(xs)
        # bucket invariant: every value has bit_length == bucket
        assert all(x.bit_length() == r["bucket"] for x in xs)


def test_cohort_ltv_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT user_id, CAST(floor(epoch(ts)/86400) AS BIGINT),
                   event_type,
                   CAST(round(value*100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    c0 = {}
    for u, day, _et, _c in rows:
        c0[u] = min(c0.get(u, day), day)
    daily = defaultdict(lambda: [set(), 0])
    for u, day, et, cents in rows:
        key = (c0[u], day - c0[u])
        daily[key][0].add(u)
        if et == "purchase":
            daily[key][1] += cents
    out = REGISTRY["events_cohort_ltv"].fn(spark, sf_dir).collect()
    assert len(out) == len(daily)
    cum = defaultdict(int)
    for r in sorted(out, key=lambda r: (r["cohort_day"], r["age_days"])):
        users, rev = daily[(r["cohort_day"], r["age_days"])]
        cum[r["cohort_day"]] += rev
        assert r["n_active"] == len(users)
        assert r["cum_revenue_cents"] == cum[r["cohort_day"]]
    # LTV curves are monotone nondecreasing per cohort by construction
