"""Independent replays for the third ML wave (queries/ml3.py)."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_knn_classifier_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = _duck(
        f"""SELECT vec_id, label, embedding
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            ORDER BY vec_id"""
    )
    ids = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    X = np.array([[float(x) for x in r[2]] for r in rows])
    d2 = np.round(
        ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2), 6
    )
    conf = Counter()
    for i in range(len(ids)):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (d2[i, j], ids[j]),
        )[:5]
        votes = Counter(ys[j] for j in order)
        pred = sorted(votes, key=lambda y: (-votes[y], y))[0]
        conf[(ys[i], pred)] += 1
    out = REGISTRY["ml_knn_classifier"].fn(spark, sf_dir).collect()
    got = {(r["true_label"], r["pred_label"]): r["n"] for r in out}
    assert got == dict(conf)
    # sanity: diagonal dominates (labels correlate with geometry or
    # at least the matrix is complete)
    assert sum(got.values()) == len(ids)


def test_markov_eval_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT user_id, ts, event_id, event_type
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    )
    by_user = defaultdict(list)
    for u, _ts, _eid, et in rows:
        by_user[u].append(et)
    pairs = []
    for seq in by_user.values():
        pairs.extend(zip(seq, seq[1:]))
    tc = Counter(pairs)
    # deterministic argmax: count desc, next asc
    by_cur = defaultdict(list)
    for (cur, nxt), c in tc.items():
        by_cur[cur].append((-c, nxt))
    pred = {cur: sorted(v)[0][1] for cur, v in by_cur.items()}
    out = REGISTRY["events_markov_eval"].fn(spark, sf_dir).collect()
    got = {r["event_type"]: r for r in out}
    assert set(got) == set(by_cur)
    for cur in by_cur:
        n = sum(c for (cc, _n), c in tc.items() if cc == cur)
        correct = tc.get((cur, pred[cur]), 0)
        r = got[cur]
        assert r["predicted_next"] == pred[cur]
        assert (r["n_transitions"], r["n_correct"]) == (n, correct)
        assert abs(r["accuracy"] - correct / n) < 1e-6


def test_top_percentile_share_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT CAST(round(o_totalprice*100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    )
    cents = sorted((c for (c,) in rows), reverse=True)
    n, s = len(cents), sum(cents)
    cells = Counter(cents)
    out = REGISTRY["agg_top_percentile_share"].fn(spark, sf_dir).collect()
    got = {r["pct"]: r for r in out}
    assert set(got) == {1, 5, 10}
    for pct, r in got.items():
        cut = n * pct // 100
        # cell granularity: a cell is included iff its whole run of
        # equal values fits within the cut
        top = 0
        seen = 0
        for v in sorted(cells, reverse=True):
            if seen + cells[v] <= cut:
                top += v * cells[v]
                seen += cells[v]
            else:
                break
        assert r["n_top"] == cut
        assert r["top_cents"] == top, pct
        assert abs(r["share"] - top / s) < 1e-6
    assert got[1]["share"] < got[5]["share"] < got[10]["share"]
