"""Independent replays for the fourth ML wave (queries/ml4.py)."""

from __future__ import annotations

import math
from collections import Counter

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_centroid_classifier_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = _duck(
        f"""SELECT vec_id, label, embedding
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            ORDER BY vec_id"""
    )
    ys = np.array([r[1] for r in rows])
    X = np.array([[float(x) for x in r[2]] for r in rows])
    labels = sorted(set(ys))
    C = np.stack([X[ys == lb].mean(axis=0) for lb in labels])
    d2 = np.round(
        ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6
    )
    pred = [labels[j] for j in d2.argmin(axis=1)]
    conf = Counter(zip(ys.tolist(), pred))
    out = REGISTRY["emb_centroid_classifier"].fn(spark, sf_dir).collect()
    got = {(r["true_label"], r["pred_label"]): r["n"] for r in out}
    assert got == dict(conf)
    assert sum(got.values()) == len(rows)


def test_zipf_fit_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT lower(trim(text))
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    vc = Counter()
    for (t,) in rows:
        vc.update(t.split())
    ranked = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(r + 1) for r in range(len(ranked))]
    ys = [math.log(c) for _w, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    inter = (sy - slope * sx) / n
    [r] = REGISTRY["doc_zipf_fit"].fn(spark, sf_dir).collect()
    assert r["vocab_size"] == n
    assert abs(r["zipf_slope"] - slope) < 1e-5
    assert abs(r["intercept"] - inter) < 1e-4
    # frequency is nonincreasing in rank, so the slope is negative
    # (this synthetic corpus is only mildly Zipfian: ~-0.18)
    assert r["zipf_slope"] < 0


def test_cronbach_alpha_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT lower(trim(text)), n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    items = []
    for t, nc in rows:
        ws = t.split()
        items.append((len(ws), len(set(ws)), nc // 10))
    n = len(items)

    def var(xs):
        mu = sum(xs) / n
        return sum((x - mu) ** 2 for x in xs) / n

    v = [var([it[j] for it in items]) for j in range(3)]
    vt = var([sum(it) for it in items])
    alpha = 3 / 2 * (1 - sum(v) / vt)
    [r] = REGISTRY["stat_cronbach_alpha"].fn(spark, sf_dir).collect()
    assert r["n_docs"] == n
    assert abs(r["sum_item_var"] - sum(v)) < 1e-3
    assert abs(r["total_var"] - vt) < 1e-3
    assert abs(r["cronbach_alpha"] - alpha) < 1e-5
    # size items co-vary strongly: alpha should be high
    assert r["cronbach_alpha"] > 0.6
