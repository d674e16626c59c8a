"""Independent replays for analytics wave 15 and sketches wave 3
(queries/analytics15.py, queries/sketches3.py)."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def _minute_series():
    rows = _duck(
        f"""SELECT event_type, CAST(floor(epoch(ts)/60) AS BIGINT),
                   sum(round(value, 6)) / count(*)
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"""
    )
    per = defaultdict(dict)
    for et, m, v in rows:
        per[et][m] = v
    return per


def test_hampel_flags_are_outliers(spark, sf_dir):
    per = _minute_series()
    out = REGISTRY["ts_hampel_filter"].fn(spark, sf_dir).collect()
    assert out, "expected hampel outliers at this tier"
    for r in out:
        d = per[r["event_type"]]
        ms = sorted(d)
        i = ms.index(r["minute"])
        win = [d[m] for m in ms[max(0, i - 3): i + 4]]
        assert len(win) == 7
        med = sorted(win)[3]
        mad = sorted(abs(x - med) for x in win)[3]
        assert abs(r["rolling_med"] - med) < 1e-5
        assert abs(r["mad"] - mad) < 1e-5
        assert abs(d[r["minute"]] - med) > 3 * 1.4826 * mad - 1e-9


def test_theil_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, round(value, 6)
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    per = defaultdict(list)
    for et, v in rows:
        per[et].append(v)
    out = {r["event_type"]: r for r in REGISTRY["agg_theil_index"].fn(spark, sf_dir).collect()}
    for et, vs in per.items():
        mu = sum(vs) / len(vs)
        theil = sum((x / mu) * math.log(x / mu) for x in vs) / len(vs)
        assert out[et]["n"] == len(vs)
        assert abs(out[et]["theil_t"] - theil) < 1e-4
        assert out[et]["theil_t"] >= -1e-9  # Theil T is non-negative


def test_ndcg_bounds_and_replay(spark, sf_dir):
    out = REGISTRY["ml_ndcg_at_k"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0 <= r["ndcg10"] <= 1 + 1e-9
    # exact replay for the 3 smallest user_ids
    rows = _duck(
        f"""SELECT user_id, round(value, 6), epoch_us(ts), event_id
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE user_id IN (SELECT user_id FROM
              read_parquet('{SF_DIR}/events.parquet') GROUP BY user_id
              HAVING count(*) >= 2 ORDER BY user_id LIMIT 3)"""
    )
    per = defaultdict(list)
    for u, rel, ts, eid in rows:
        per[u].append((ts, eid, rel))
    got = {r["user_id"]: r["ndcg10"] for r in out}
    for u, evs in per.items():
        arrival = [r for _t, _e, r in sorted(evs)]
        ideal = sorted(evs, key=lambda x: (-x[2], x[0], x[1]))
        dcg = sum(
            r / (math.log(i + 2) / math.log(2))
            for i, r in enumerate(arrival[:10])
        )
        idcg = sum(
            r / (math.log(i + 2) / math.log(2))
            for i, (_t, _e, r) in enumerate(ideal[:10])
        )
        assert abs(got[u] - dcg / idcg) < 1e-5


def test_confusion_metrics_consistent(spark, sf_dir):
    conf = REGISTRY["doc_lang_id_heuristic"].fn(spark, sf_dir).collect()
    out = {r["lang"]: r for r in REGISTRY["ml_confusion_metrics"].fn(spark, sf_dir).collect()}
    langs = {r["lang"] for r in conf}
    tp = {lg: sum(r["n"] for r in conf if r["lang"] == lg and r["pred_lang"] == lg) for lg in langs}
    supp = {lg: sum(r["n"] for r in conf if r["lang"] == lg) for lg in langs}
    npred = {lg: sum(r["n"] for r in conf if r["pred_lang"] == lg) for lg in langs}
    ps, rs, f1s = [], [], []
    for lg in langs:
        p = tp[lg] / npred[lg] if npred[lg] else 0.0
        r_ = tp[lg] / supp[lg] if supp[lg] else 0.0
        f1 = 2 * p * r_ / (p + r_) if p + r_ else 0.0
        ps.append(p)
        rs.append(r_)
        f1s.append(f1)
        assert abs(out[lg]["precision_"] - p) < 1e-5
        assert abs(out[lg]["recall_"] - r_) < 1e-5
        assert abs(out[lg]["f1"] - f1) < 1e-5
    m = out["__macro__"]
    assert abs(m["precision_"] - sum(ps) / len(ps)) < 1e-5
    assert abs(m["f1"] - sum(f1s) / len(f1s)) < 1e-5
    assert m["support"] == sum(supp.values())


def test_ridge_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = _duck(
        f"""SELECT round(l_quantity, 6), round(l_discount, 6),
                   round(l_extendedprice, 6)
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    )
    X = np.array([[1.0, q, d] for q, d, _y in rows])
    y = np.array([p for _q, _d, p in rows])
    A = X.T @ X + np.diag([0.0, 1000.0, 1000.0])
    beta = np.linalg.solve(A, X.T @ y)
    r = REGISTRY["ml_ridge_normal_eq"].fn(spark, sf_dir).collect()[0]
    assert abs(r["intercept"] - beta[0]) < 1e-3
    assert abs(r["coef_qty"] - beta[1]) < 1e-4
    assert abs(r["coef_disc"] - beta[2]) < 1e-3


def test_rolling_slope_matches_numpy(spark, sf_dir):
    import numpy as np

    out = REGISTRY["win_rolling_slope"].fn(spark, sf_dir).collect()
    assert out
    rows = _duck(
        f"""SELECT user_id, round(value, 6)
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE user_id < 40 ORDER BY user_id, epoch_us(ts), event_id"""
    )
    per = defaultdict(list)
    for u, v in rows:
        per[u].append(v)
    got = {(r["user_id"], r["pos"]): r["slope"] for r in out}
    for (u, pos), slope in list(got.items())[:50]:
        ys = per[u][pos - 20: pos]
        xs = np.arange(pos - 19, pos + 1, dtype=float)
        exp = np.polyfit(xs, ys, 1)[0]
        assert abs(slope - exp) < 1e-4, (u, pos)


def _p60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_theta_setops_replay_and_bounds(spark, sf_dir):
    rows = _duck(
        f"""SELECT DISTINCT event_type, user_id
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type IN ('click', 'purchase')"""
    )
    A = {u for et, u in rows if et == "click"}
    B = {u for et, u in rows if et == "purchase"}
    r = REGISTRY["sketch_theta_setops"].fn(spark, sf_dir).collect()[0]
    assert r["exact_a"] == len(A) and r["exact_b"] == len(B)
    assert r["exact_inter"] == len(A & B)
    assert r["exact_anotb"] == len(A - B)
    # replay the sketch exactly
    K, U60 = 128, 1 << 60
    ha = sorted((_p60(f"{u}:theta"), u) for u in A)[:K]
    hb = sorted((_p60(f"{u}:theta"), u) for u in B)[:K]
    ta = ha[-1][0] if len(A) >= K else U60
    tb = hb[-1][0] if len(B) >= K else U60
    th = min(ta, tb)
    est_a = (K - 1) * U60 / ta if ta < U60 else float(len(A))
    bkeys = {u for _h, u in hb}
    c_inter = sum(1 for h, u in ha if h < th and u in bkeys)
    c_anotb = sum(1 for h, u in ha if h < th and u not in bkeys)
    assert abs(r["est_a"] - est_a) < 1e-4
    assert abs(r["est_inter"] - c_inter * U60 / th) < 1e-4
    assert abs(r["est_anotb"] - c_anotb * U60 / th) < 1e-4
    # estimation error sanity: within 60% rel at k=128 (loose 3-sigma)
    if len(A) >= K:
        assert abs(r["est_a"] - len(A)) / len(A) < 0.6


def test_random_projection_jl_property(spark, sf_dir):
    out = REGISTRY["emb_random_projection"].fn(spark, sf_dir).collect()
    assert out
    ratios = [r["norm_ratio"] for r in out]
    mean = sum(ratios) / len(ratios)
    # E[ratio] = 1 for +-1 sign projections; 16 dims -> loose band
    assert 0.7 < mean < 1.3, mean
    # exact replay for one vector
    vrow = _duck(
        f"""SELECT vec_id, CAST(embedding AS DOUBLE[])
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            ORDER BY vec_id LIMIT 1"""
    )[0]
    vid, v = vrow
    signs0 = [
        1.0 if _p60(f"0:{d}:jl") % 2 == 0 else -1.0 for d in range(64)
    ]
    p0 = sum(x * s for x, s in zip(v, signs0))
    got = {r["vec_id"]: r for r in out}[vid]
    assert abs(got["p0"] - p0) < 1e-4


def test_edge_embeddedness_replay(spark, sf_dir):
    edges = _duck(
        f"""WITH c AS (SELECT DISTINCT user_id, event_type,
                       CAST(floor(epoch(ts)/300) AS BIGINT) AS w
                       FROM read_parquet('{SF_DIR}/events.parquet')
                       WHERE user_id < 120)
            SELECT DISTINCT a.user_id, b.user_id
            FROM c a JOIN c b ON a.event_type = b.event_type AND a.w = b.w
             AND a.user_id < b.user_id"""
    )
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    out = REGISTRY["graph_edge_embeddedness"].fn(spark, sf_dir).collect()
    assert len(out) == len(edges)
    for r in out:
        a, b = r["ua"], r["ub"]
        cn = len(nbrs[a] & nbrs[b])
        assert r["cn"] == cn
        den = len(nbrs[a]) + len(nbrs[b]) - 2 - cn
        exp = cn / den if den else 0.0
        assert abs(r["jaccard"] - exp) < 1e-5
