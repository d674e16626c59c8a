"""Independent Python replays for wave 55 (round 11).

Each test recomputes the query's semantics from the raw parquet with
plain Python/numpy (no SQL on either engine), so correctness evidence
is triangulated: Spark vs DuckDB (tools/parity.py) vs this replay.
"""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck():
    return duckdb.connect()


def test_recursive_cte_depth_is_floor_log2(spark, sf_dir):
    """The ancestor walk's depth for key k is floor(log2 k) (k >= 1),
    so the per-depth histogram is recomputable without recursion."""
    keys = [
        r[0]
        for r in _duck().execute(
            f"SELECT s_suppkey FROM "
            f"read_parquet('{SF_DIR}/supplier.parquet')"
        ).fetchall()
    ]
    bals = {
        r[0]: r[1]
        for r in _duck().execute(
            f"SELECT s_suppkey, round(s_acctbal * 100, 0)::BIGINT "
            f"FROM read_parquet('{SF_DIR}/supplier.parquet')"
        ).fetchall()
    }
    want = defaultdict(lambda: [0, 0])
    for k in keys:
        # floor(log2 k); key 0 never recurses (cur > 1 fails) -> depth 0
        d = max(k.bit_length() - 1, 0)
        want[d][0] += 1
        want[d][1] += bals[k]
    got = {
        r["depth"]: (r["n_suppliers"], r["bal_cents"])
        for r in REGISTRY["sql_recursive_cte"].fn(spark, sf_dir).collect()
    }
    assert got == {d: tuple(v) for d, v in want.items()}


def test_max_subarray_matches_kadane(spark, sf_dir):
    rows = _duck().execute(
        f"""SELECT user_id, round(value * 100, 0)::BIGINT - 5000
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, ts, event_id"""
    ).fetchall()
    series = defaultdict(list)
    for uid, x in rows:
        series[uid].append(x)
    want = {}
    for uid, xs in series.items():
        best = cur = xs[0]
        for x in xs[1:]:
            cur = max(x, cur + x)
            best = max(best, cur)
        want[uid] = (best, len(xs))
    got = {
        r["user_id"]: (r["best_run_cents"], r["n_events"])
        for r in REGISTRY["win_max_subarray"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_hodges_lehmann_matches_walsh_median(spark, sf_dir):
    rows = _duck().execute(
        f"""SELECT event_type, floor(epoch(ts) / 86400)::BIGINT,
                   sum(round(value * 100, 0)::BIGINT)::BIGINT,
                   count(*)::BIGINT
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2"""
    ).fetchall()
    daily = defaultdict(list)
    for et, _day, s, c in rows:
        daily[et].append(s / c)
    want = {}
    for et, ms in daily.items():
        ws = sorted(
            (a + b) / 2 for i, a in enumerate(ms) for b in ms[i:]
        )
        n = len(ws)
        med = (
            ws[n // 2]
            if n % 2
            else (ws[n // 2 - 1] + ws[n // 2]) / 2
        )
        want[et] = (len(ms), round(med / 100, 6))
    got = {
        r["event_type"]: (r["n_days"], r["hl_estimate"])
        for r in REGISTRY["stat_hodges_lehmann"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_ansari_bradley_matches_replay(spark, sf_dir):
    rows = _duck().execute(
        f"""SELECT event_type, round(value * 100, 0)::BIGINT
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type IN ('click', 'error')"""
    ).fetchall()
    vals = sorted(v for _, v in rows)
    n = len(vals)
    n1 = sum(1 for et, _ in rows if et == "click")
    # midrank-based AB scores, computed per distinct value
    from collections import Counter

    cnt = Counter(vals)
    below = 0
    a2 = {}  # value -> 2 * score
    for v in sorted(cnt):
        c = cnt[v]
        a2[v] = min(2 * below + c + 1, 2 * (n + 1) - (2 * below + c + 1))
        below += c
    ab = sum(a2[v] for et, v in rows if et == "click") / 2
    s1 = sum(a2[v] * c for v, c in cnt.items())
    s2 = sum(a2[v] * a2[v] * c for v, c in cnt.items())
    mean_a = (s1 / 2.0) / n
    var = n1 * (n - n1) / (n * (n - 1.0)) * (s2 / 4.0 - n * mean_a * mean_a)
    z = (ab - n1 * mean_a) / math.sqrt(var)
    row = REGISTRY["stat_ansari_bradley"].fn(spark, sf_dir).collect()[0]
    assert row["n_click"] == n1 and row["n_error"] == n - n1
    assert abs(row["ab_stat"] - ab) < 1e-6
    assert abs(row["z"] - z) < 1e-6


def test_chao1_matches_replay(spark, sf_dir):
    rows = _duck().execute(
        f"""SELECT event_type, user_id, count(*)::BIGINT
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2"""
    ).fetchall()
    per = defaultdict(list)
    for et, _uid, c in rows:
        per[et].append(c)
    for r in REGISTRY["agg_chao1_richness"].fn(spark, sf_dir).collect():
        cs = per[r["event_type"]]
        d, f1, f2 = len(cs), cs.count(1), cs.count(2)
        assert (r["d_observed"], r["f1"], r["f2"]) == (d, f1, f2)
        assert abs(r["chao1"] - (d + f1 * (f1 - 1.0) / (2.0 * (f2 + 1)))) < 1e-6
        assert abs(r["gt_coverage"] - (1.0 - f1 / sum(cs))) < 1e-6


def test_map_mrr_matches_replay(spark, sf_dir):
    rows = _duck().execute(
        f"""SELECT user_id, event_type, value, event_id
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    by_user = defaultdict(list)
    for uid, et, v, eid in rows:
        by_user[uid].append((-v, eid, et == "purchase"))
    buckets = defaultdict(lambda: [0, 0.0, 0.0])
    for uid, evs in by_user.items():
        evs.sort()
        r_total = sum(1 for _, _, rel in evs if rel)
        if r_total == 0:
            continue
        top = evs[:10]
        cum, ap, rr = 0, 0.0, 0.0
        for k, (_, _, rel) in enumerate(top, start=1):
            if rel:
                cum += 1
                ap += cum / k
                if cum == 1:
                    rr = 1.0 / k
        ap /= min(r_total, 10)
        b = buckets[uid % 10]
        b[0] += 1
        b[1] += ap
        b[2] += rr
    got = {
        r["bucket"]: (r["n_users"], r["map10"], r["mrr"])
        for r in REGISTRY["ml_map_mrr"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(buckets)
    for bk, (n, sap, srr) in buckets.items():
        gn, gmap, gmrr = got[bk]
        assert gn == n
        assert abs(gmap - sap / n) < 1e-5
        assert abs(gmrr - srr / n) < 1e-5


def test_aalen_johansen_cifs_sum_to_event_fraction(spark, sf_dir):
    """Invariants: CIFs are nondecreasing in the horizon, bounded by
    the all-cause event fraction, and at a horizon past the last
    event time CIF_p + CIF_e equals 1 - KM survival (here: with every
    user experiencing a cause by then, the total incidence)."""
    out = {
        r["horizon_h"]: (r["cif_purchase"], r["cif_error"], r["n_users"])
        for r in REGISTRY["events_aalen_johansen"].fn(spark, sf_dir).collect()
    }
    hs = sorted(out)
    for a, b in zip(hs, hs[1:]):
        assert out[a][0] <= out[b][0] + 1e-9
        assert out[a][1] <= out[b][1] + 1e-9
    for h in hs:
        cp, ce, _n = out[h]
        assert 0.0 <= cp <= 1.0 and 0.0 <= ce <= 1.0
        assert cp + ce <= 1.0 + 1e-9


def test_dfa_matches_numpy_replay(spark, sf_dir):
    import numpy as np

    rows = _duck().execute(
        f"""SELECT floor(epoch(ts) / 3600)::BIGINT AS hr,
                   sum(round(value * 100, 0)::BIGINT)::BIGINT AS y
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY hr ORDER BY hr"""
    ).fetchall()
    y = np.array([r[1] for r in rows], dtype="float64")
    h = len(y)
    prof = np.cumsum(y) - (np.arange(1, h + 1) / h) * y.sum()
    fvals = {}
    for s in (4, 8):
        nb = h // s
        r2 = 0.0
        tt = np.arange(1, s + 1, dtype="float64")
        for b in range(nb):
            seg = prof[b * s : (b + 1) * s]
            slope, intercept = np.polyfit(tt, seg, 1)
            r2 += float(((seg - intercept - slope * tt) ** 2).sum())
        fvals[s] = math.sqrt(r2 / (nb * s))
    alpha = (math.log(fvals[8]) - math.log(fvals[4])) / math.log(2)
    row = REGISTRY["ts_dfa"].fn(spark, sf_dir).collect()[0]
    assert row["n_hours"] == h
    assert abs(row["f4"] - fvals[4]) < max(1e-4 * fvals[4], 1e-4)
    assert abs(row["f8"] - fvals[8]) < max(1e-4 * fvals[8], 1e-4)
    assert abs(row["alpha"] - alpha) < 1e-4


def test_hard_negatives_matches_numpy(spark, sf_dir):
    import numpy as np

    rows = _duck().execute(
        f"""SELECT vec_id, label, embedding::DOUBLE[]
            FROM read_parquet('{SF_DIR}/embeddings.parquet')"""
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    labels = np.array([r[1] for r in rows])
    vecs = np.array([r[2] for r in rows])
    norms = np.sqrt((vecs * vecs).sum(1))
    got = defaultdict(list)
    for r in REGISTRY["emb_hard_negatives"].fn(spark, sf_dir).collect():
        got[r["q_id"]].append((r["rk"], r["neg_id"], r["cos_sim"]))
    assert got, "no query vectors sampled"
    for qi in np.nonzero((ids % 97 == 0) & (ids < 5000))[0]:
        mask = labels != labels[qi]
        cos = (vecs[mask] @ vecs[qi]) / (norms[mask] * norms[qi])
        order = sorted(
            zip(-cos, ids[mask]), key=lambda p: (p[0], p[1])
        )[:3]
        want = [
            (k + 1, int(nid), round(-negcos, 6))
            for k, (negcos, nid) in enumerate(order)
        ]
        rows_got = sorted(got[ids[qi]])
        assert [(a, b) for a, b, _ in rows_got] == [
            (a, b) for a, b, _ in want
        ]
        for (_, _, gc), (_, _, wc) in zip(rows_got, want):
            assert abs(gc - wc) < 1e-5
