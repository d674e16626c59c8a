"""Independent replays for the eighth analytics wave
(queries/analytics8.py)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def _u64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmeans_2step_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = _duck(
        f"""SELECT vec_id, embedding
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            ORDER BY vec_id"""
    )
    ids = np.array([r[0] for r in rows])
    X = np.array([[float(x) for x in r[1]] for r in rows])
    cents = X[:8].copy()

    def assign(C):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        d2r = np.round(d2, 6)
        # argmin with cid tie-break = plain argmin (first minimum)
        return d2r.argmin(axis=1), d2r

    a1, _ = assign(cents)
    C2 = np.stack([X[a1 == c].mean(axis=0) for c in range(8)])
    a2, d2r = assign(C2)
    out = REGISTRY["emb_kmeans_2step_exact"].fn(spark, sf_dir).collect()
    got = {r["cluster_id"]: (r["n_members"], r["avg_dist2"]) for r in out}
    for c in range(8):
        n = int((a2 == c).sum())
        if n == 0:
            assert c not in got
            continue
        avg = float(d2r[a2 == c, c].mean())
        assert got[c][0] == n, c
        assert abs(got[c][1] - avg) < 1e-4, c


def test_permutation_test_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT doc_id, lang, n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    n = len(rows)
    na = sum(1 for _d, lang, _c in rows if lang == "en")
    theta = math.floor(2**60 * na / n)
    a = [c for _d, lang, c in rows if lang == "en"]
    b = [c for _d, lang, c in rows if lang != "en"]
    obs = sum(a) / len(a) - sum(b) / len(b)
    n_ext = 0
    for p in range(200):
        sa, ca, sb, cb = 0, 0, 0, 0
        for d, _lang, c in rows:
            if _u64(f"{d}:{p}:perm") < theta:
                sa, ca = sa + c, ca + 1
            else:
                sb, cb = sb + c, cb + 1
        st = sa / ca - sb / cb
        if abs(st) >= abs(obs):
            n_ext += 1
    [r] = REGISTRY["stat_permutation_test"].fn(spark, sf_dir).collect()
    assert r["n_perms"] == 200
    assert r["n_extreme"] == n_ext
    assert abs(r["obs_diff"] - obs) < 1e-5
    assert abs(r["p_value"] - (1 + n_ext) / 201.0) < 1e-6


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2.0


def test_anomaly_mad_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d'),
                   count(*)
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"""
    )
    per = defaultdict(dict)
    for et, day, c in rows:
        per[et][day] = c
    out = REGISTRY["diag_anomaly_mad"].fn(spark, sf_dir).collect()
    assert len(out) == sum(len(v) for v in per.values())
    for r in out:
        cs = per[r["event_type"]]
        md = _median(list(cs.values()))
        mad = _median([abs(c - md) for c in cs.values()])
        c = cs[r["day"]]
        assert r["n_events"] == c
        exp_anom = mad > 0 and abs(c - md) > 3 * 1.4826 * mad
        assert r["is_anomaly"] == exp_anom, (r["event_type"], r["day"])
        if mad > 0:
            assert abs(r["robust_z"] - (c - md) / (1.4826 * mad)) < 1e-5


def test_sax_symbols_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, date_trunc('day', ts) AS d, count(*)
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2 ORDER BY 1, 2"""
    )
    per = defaultdict(list)
    for et, _d, c in rows:
        per[et].append(c)
    out = REGISTRY["ts_sax_symbols"].fn(spark, sf_dir).collect()
    assert len(out) == len(per)
    for r in out:
        cs = per[r["event_type"]]
        L = len(cs)
        mu = sum(cs) / L
        sd = math.sqrt(sum((x - mu) ** 2 for x in cs) / L)
        segs = defaultdict(list)
        for i, c in enumerate(cs):
            segs[i * 8 // L].append((c - mu) / sd)
        word = ""
        for s in sorted(segs):
            z = round(sum(segs[s]) / len(segs[s]), 6)
            word += (
                "a" if z < -0.6745 else
                "b" if z < 0.0 else
                "c" if z < 0.6745 else "d"
            )
        assert r["series_len"] == L
        assert r["sax"] == word, r["event_type"]
        assert len(r["sax"]) == min(8, L)
