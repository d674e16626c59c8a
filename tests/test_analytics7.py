"""Independent replays for the seventh analytics wave
(queries/analytics7.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_group_entropy_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, extract(hour FROM ts)
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    hist = defaultdict(Counter)
    for et, hr in rows:
        hist[et][hr] += 1
    out = REGISTRY["agg_group_entropy"].fn(spark, sf_dir).collect()
    assert len(out) == len(hist)
    for r in out:
        c = hist[r["event_type"]]
        n = sum(c.values())
        ent = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        assert r["n_events"] == n
        assert r["n_hours"] == len(c)
        assert abs(r["entropy_nats"] - ent) < 1e-5


def test_levene_bf_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT lang, n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    per = defaultdict(list)
    for lang, nc in rows:
        per[lang].append(nc)
    zs = {}
    for lang, xs in per.items():
        xs = sorted(xs)
        n = len(xs)
        md = (
            xs[n // 2]
            if n % 2
            else (xs[n // 2 - 1] + xs[n // 2]) / 2.0
        )
        zs[lang] = [abs(x - md) for x in xs]
    k = len(zs)
    nn = sum(len(v) for v in zs.values())
    zbar = sum(sum(v) for v in zs.values()) / nn
    num = sum(
        len(v) * (sum(v) / len(v) - zbar) ** 2 for v in zs.values()
    )
    den = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in zs.values()
    )
    f = (nn - k) / (k - 1) * num / den
    [r] = REGISTRY["stat_levene_bf"].fn(spark, sf_dir).collect()
    assert (r["n_groups"], r["n_obs"]) == (k, nn)
    assert (r["df1"], r["df2"]) == (k - 1, nn - k)
    assert abs(r["f_stat"] - f) < 1e-4


def test_snapshot_diff_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    )
    old = {k: c for k, c in rows if k % 5 != 0}
    new = {
        k: c + (150 if k % 3 == 0 else 0)
        for k, c in rows
        if k % 7 != 0
    }
    exp = Counter()
    delta = Counter()
    for k in set(old) | set(new):
        if k not in old:
            cls, d = "added", new[k]
        elif k not in new:
            cls, d = "removed", old[k]
        elif old[k] != new[k]:
            cls, d = "changed", abs(new[k] - old[k])
        else:
            cls, d = "unchanged", 0
        exp[cls] += 1
        delta[cls] += d
    out = REGISTRY["io_snapshot_diff"].fn(spark, sf_dir).collect()
    got = {r["change_type"]: (r["n_rows"], r["abs_delta_cents"]) for r in out}
    assert got == {c: (exp[c], delta[c]) for c in exp}
    assert set(exp) == {"added", "removed", "changed", "unchanged"}


def test_mmr_diversify_matches_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT vec_id, embedding
            FROM read_parquet('{SF_DIR}/embeddings.parquet')"""
    )
    vecs = {
        vid: [float(x) for x in v] for vid, v in rows
    }
    dim = len(next(iter(vecs.values())))
    n = len(vecs)
    q = [
        sum(v[i] for v in vecs.values()) / n for i in range(dim)
    ]
    qn = math.sqrt(sum(x * x for x in q))

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    nrm = {vid: math.sqrt(dot(v, v)) for vid, v in vecs.items()}
    rel = {
        vid: dot(v, q) / (nrm[vid] * qn) for vid, v in vecs.items()
    }
    picked = []
    for _step in range(10):
        best = None
        for vid in sorted(vecs):
            if vid in {p[0] for p in picked}:
                continue
            pen = max(
                (
                    dot(vecs[vid], vecs[p[0]])
                    / (nrm[vid] * nrm[p[0]])
                    for p in picked
                ),
                default=0.0,
            )
            score = 0.7 * rel[vid] - 0.3 * pen
            key = (round(score, 6), -vid)
            if best is None or key > best[0]:
                best = (key, vid, score)
        picked.append((best[1], best[2]))
    out = REGISTRY["emb_mmr_diversify"].fn(spark, sf_dir).collect()
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["step"])] == [
        p[0] for p in picked
    ]
    # diversity: MMR picks must not all be the plain top-10 by relevance
    plain = [
        vid
        for vid, _ in sorted(
            rel.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
        )[:10]
    ]
    assert {p[0] for p in picked} != set(plain)
    for r in out:
        assert abs(r["relevance"] - rel[r["vec_id"]]) < 1e-5
