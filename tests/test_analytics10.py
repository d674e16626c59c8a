"""Independent replays for the tenth analytics wave
(queries/analytics10.py)."""

from __future__ import annotations

import bisect
import hashlib
import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.queries.analytics10 import (
    _POIS_CDF,
    _U_SCALE,
)

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def _u64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_bootstrap_ci_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT doc_id, n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    means = []
    for b in range(100):
        sw = swx = 0
        for d, x in rows:
            u = _u64(f"{d}:{b}:boot") / _U_SCALE
            w = bisect.bisect_right(_POIS_CDF, u)
            sw += w
            swx += w * x
        means.append(swx / sw)
    mu = sum(x for _d, x in rows) / len(rows)
    se = math.sqrt(
        sum((m - sum(means) / 100) ** 2 for m in means) / 100
    )

    def q(p):
        xs = sorted(means)
        i = p * (len(xs) - 1)
        lo, hi = int(math.floor(i)), int(math.ceil(i))
        return xs[lo] + (xs[hi] - xs[lo]) * (i - lo)

    [r] = REGISTRY["stat_bootstrap_ci"].fn(spark, sf_dir).collect()
    assert r["n_docs"] == len(rows)
    assert abs(r["obs_mean"] - mu) < 1e-5
    assert abs(r["boot_se"] - se) < 1e-5
    assert abs(r["ci_lo"] - q(0.025)) < 1e-5
    assert abs(r["ci_hi"] - q(0.975)) < 1e-5
    assert r["ci_lo"] < r["obs_mean"] < r["ci_hi"]
    # sane bootstrap: se within 3x of the CLT estimate
    var = sum((x - mu) ** 2 for _d, x in rows) / len(rows)
    clt = math.sqrt(var / len(rows))
    assert clt / 3 < r["boot_se"] < clt * 3


def test_pr_curve_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT value, event_type = 'purchase'
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    cells = defaultdict(lambda: [0, 0])
    for v, y in rows:
        cells[v][0] += 1 if y else 0
        cells[v][1] += 1
    vs = sorted(cells)
    D = len(vs)
    step = math.ceil(D / 20)
    p_all = sum(c[0] for c in cells.values())
    out = REGISTRY["ml_pr_curve"].fn(spark, sf_dir).collect()
    got = {r["threshold"]: r for r in out}
    exp_thresholds = [vs[i] for i in range(0, D, step)]
    assert sorted(got) == sorted(exp_thresholds)
    for thr, r in got.items():
        tp = sum(c[0] for v, c in cells.items() if v >= thr)
        pp = sum(c[1] for v, c in cells.items() if v >= thr)
        assert (r["tp"], r["n_pred_pos"]) == (tp, pp)
        assert abs(r["precision"] - tp / pp) < 1e-6
        assert abs(r["recall"] - tp / p_all) < 1e-6
        assert abs(r["f1_score"] - 2 * tp / (pp + p_all)) < 1e-6


def test_ewma_irregular_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, epoch_us(ts), value
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    per = defaultdict(list)
    for et, us, v in rows:
        per[et].append((us, v))
    out = REGISTRY["ts_ewma_irregular"].fn(spark, sf_dir).collect()
    assert len(out) == len(per)
    for r in out:
        xs = per[r["event_type"]]
        mx = max(us for us, _ in xs)
        ws = [math.exp((us - mx) / 1e6 / 3600.0) for us, _ in xs]
        ewma = sum(w * v for w, (_, v) in zip(ws, xs)) / sum(ws)
        assert r["n_events"] == len(xs)
        assert abs(r["ewma_decay"] - ewma) < 1e-4
        assert abs(r["eff_n"] - sum(ws)) < 1e-4
        # decay leaves far fewer effective samples than raw count
        assert r["eff_n"] < r["n_events"]
