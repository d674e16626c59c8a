"""Replays and invariants for analytics wave 34 (queries/analytics25.py
+ stream_dau_mau in streaming_q2.py)."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import Decimal

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_lorenz_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2)))
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 2, 1"""
    )
    n = len(rows)
    spends = [Decimal(s) for _, s in rows]
    total = sum(spends)
    per = defaultdict(lambda: [0, Decimal(0)])
    for i, s in enumerate(spends):
        dec = (i * 10) // n + 1
        per[dec][0] += 1
        per[dec][1] += s
    out = {
        r["decile"]: r
        for r in REGISTRY["agg_lorenz_deciles"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(per)
    cum = Decimal(0)
    for dec in sorted(per):
        cnt, ds = per[dec]
        cum += ds
        r = out[dec]
        assert r["n_customers"] == cnt
        assert abs(r["spend_share"] - round(float(ds) / float(total), 6)) < 2e-6
        assert abs(r["cum_share"] - round(float(cum) / float(total), 6)) < 2e-6
    # Lorenz curve properties: shares ascend by decile, cum ends at 1
    shares = [out[d]["spend_share"] for d in sorted(out)]
    assert shares == sorted(shares)
    assert abs(out[max(out)]["cum_share"] - 1.0) < 1e-9


def test_poisson_dispersion_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, count(*) AS c
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY event_type, CAST(floor(epoch(ts)/3600) AS BIGINT)"""
    )
    series = defaultdict(list)
    for et, c in rows:
        series[et].append(c)
    out = {
        r["event_type"]: r
        for r in REGISTRY["stat_poisson_dispersion"].fn(spark, sf_dir).collect()
    }
    for et, cs in series.items():
        n, sy, sqq = len(cs), sum(cs), sum(c * c for c in cs)
        r = out[et]
        assert r["n_hours"] == n and r["df"] == n - 1
        assert abs(r["vmr"] - round((n * sqq - sy * sy) / ((n - 1) * sy), 6)) < 2e-6
        assert abs(
            r["chi2_dispersion"] - round((n * sqq - sy * sy) / sy, 6)
        ) < 2e-6


def test_length_kl_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT source, least(n_chars // 100, 20) AS b, count(*)
            FROM read_parquet('{SF_DIR}/documents.parquet')
            GROUP BY 1, 2"""
    )
    sb = defaultdict(dict)
    cb = defaultdict(int)
    for src, b, c in rows:
        sb[src][b] = c
        cb[b] += c
    n_all = sum(cb.values())
    out = {
        r["source"]: r
        for r in REGISTRY["corpus_length_kl"].fn(spark, sf_dir).collect()
    }
    for src, buckets in sb.items():
        ns = sum(buckets.values())
        kl = sum(
            (c / ns) * math.log((c * n_all) / (ns * cb[b]))
            for b, c in buckets.items()
        )
        r = out[src]
        assert r["n_docs"] == ns
        assert abs(r["kl_nats"] - round(kl, 6)) < 3e-6
        assert r["kl_nats"] >= -1e-9  # KL is non-negative


def test_adaboost_matches_python_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT n_chars, CASE WHEN lang = 'en' THEN 1 ELSE -1 END
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    xs = sorted(x for x, _ in rows)
    n = len(rows)
    thetas = sorted(
        {next(v for i, v in enumerate(xs) if (i + 1) * 10 >= k * n)
         for k in range(1, 10)}
    )

    def mis(theta):
        return [(x <= theta and y == -1) or (x > theta and y == 1)
                for x, y in rows]

    err1 = {th: sum(mis(th)) for th in thetas}
    theta1 = min(thetas, key=lambda th: (err1[th], th))
    e1c = err1[theta1]
    alpha1 = 0.5 * math.log((n - e1c) / e1c)
    wi = math.sqrt((n - e1c) / e1c)
    wc = math.sqrt(e1c / (n - e1c))
    m1 = mis(theta1)
    den = wi * e1c + wc * (n - e1c)
    best2, e2b = None, None
    for th in thetas:
        m = mis(th)
        a = sum(1 for i in range(n) if m[i] and m1[i])
        b = sum(1 for i in range(n) if m[i] and not m1[i])
        e2 = (wi * a + wc * b) / den
        if best2 is None or (e2, th) < (e2b, best2):
            best2, e2b = th, e2
    alpha2 = 0.5 * math.log((1 - e2b) / e2b)
    ens_err = sum(
        1
        for x, y in rows
        if (1 if alpha1 * (1 if x <= theta1 else -1)
            + alpha2 * (1 if x <= best2 else -1) > 0 else -1) != y
    )
    r = REGISTRY["ml_adaboost_stump_2round"].fn(spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert r["theta1"] == theta1 and r["err1"] == e1c
    assert abs(r["alpha1"] - round(alpha1, 6)) < 2e-6
    assert r["theta2"] == best2
    assert abs(r["werr2"] - round(e2b, 6)) < 2e-6
    assert abs(r["alpha2"] - round(alpha2, 6)) < 2e-6
    assert r["ens_err"] == ens_err
    # boosting sanity: round-1 stump error is below coin flip
    assert e1c < n / 2


def test_stream_dau_mau_equals_batch_twin(spark, sf_dir):
    a = {
        r["mon"]: r
        for r in REGISTRY["stream_dau_mau"].fn(spark, sf_dir).collect()
    }
    b = {
        r["mon"]: r
        for r in REGISTRY["events_stickiness"].fn(spark, sf_dir).collect()
    }
    assert set(a) == set(b)
    for mon in a:
        for col in ("mau", "n_days", "avg_dau", "stickiness"):
            assert a[mon][col] == b[mon][col]
