"""Independent Python replays for the fourteenth analytics wave
(queries/analytics14.py) — exact re-computation with scipy-free
closed forms, plus the invariants each statistic must satisfy."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_welch_ttest_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, round(value, 6)
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type IN ('click', 'purchase')"""
    )
    groups = defaultdict(list)
    for et, v in rows:
        groups[et].append(v)
    x, y = groups["click"], groups["purchase"]
    n1, n2 = len(x), len(y)
    m1, m2 = sum(x) / n1, sum(y) / n2
    v1 = sum((v - m1) ** 2 for v in x) / (n1 - 1)
    v2 = sum((v - m2) ** 2 for v in y) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t_stat = (m1 - m2) / math.sqrt(se2)
    df = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    r = REGISTRY["stat_welch_ttest"].fn(spark, sf_dir).collect()[0]
    assert r["n1"] == n1 and r["n2"] == n2
    assert abs(r["t_stat"] - t_stat) < 1e-4
    assert abs(r["welch_df"] - df) < 1e-2
    # Welch df always between min(n)-1 and n1+n2-2
    assert min(n1, n2) - 1 <= r["welch_df"] <= n1 + n2 - 2


def test_cohens_kappa_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT n_chars > 300,
                   len(regexp_extract_all(text, '\\S+')) > 50
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    n11 = sum(1 for a, b in rows if a and b)
    n10 = sum(1 for a, b in rows if a and not b)
    n01 = sum(1 for a, b in rows if not a and b)
    n00 = sum(1 for a, b in rows if not a and not b)
    n = len(rows)
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n / n
    kappa = (po - pe) / (1 - pe)
    r = REGISTRY["stat_cohens_kappa"].fn(spark, sf_dir).collect()[0]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (n11, n10, n01, n00)
    assert abs(r["kappa"] - kappa) < 1e-5
    assert -1 <= r["kappa"] <= 1


def test_wilcoxon_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT user_id,
                   count_if(event_type = 'click'),
                   count_if(event_type = 'view')
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type IN ('click', 'view') GROUP BY user_id"""
    )
    diffs = [(a - b) for _u, a, b in rows if a != b]
    n = len(diffs)
    # midranks of |d|
    srt = sorted(abs(d) for d in diffs)
    rank_of = {}
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and srt[j] == srt[i]:
            j += 1
        rank_of[srt[i]] = (i + 1 + j) / 2  # avg of ranks i+1..j
        i = j
    wplus = sum(rank_of[abs(d)] for d in diffs if d > 0)
    ties = defaultdict(int)
    for d in diffs:
        ties[abs(d)] += 1
    tie3 = sum(t**3 - t for t in ties.values())
    mu = n * (n + 1) / 4
    sd = math.sqrt(n * (n + 1) * (2 * n + 1) / 24 - tie3 / 48)
    z = (wplus - mu) / sd
    r = REGISTRY["stat_wilcoxon_signed_rank"].fn(spark, sf_dir).collect()[0]
    assert r["n"] == n
    assert abs(r["w_plus"] - wplus) < 1e-6
    assert abs(r["z_stat"] - z) < 1e-5


def test_assortativity_matches_loop(spark, sf_dir):
    edges = _duck(
        f"""WITH c AS (SELECT DISTINCT user_id, event_type,
                       CAST(floor(epoch(ts)/300) AS BIGINT) AS w
                       FROM read_parquet('{SF_DIR}/events.parquet')
                       WHERE user_id < 120)
            SELECT DISTINCT a.user_id, b.user_id
            FROM c a JOIN c b
              ON a.event_type = b.event_type AND a.w = b.w
             AND a.user_id < b.user_id"""
    )
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    pairs = [(deg[u], deg[v]) for u, v in edges] + [
        (deg[v], deg[u]) for u, v in edges
    ]
    m = len(pairs)
    sx = sum(p[0] for p in pairs)
    sy = sum(p[1] for p in pairs)
    sxx = sum(p[0] ** 2 for p in pairs)
    syy = sum(p[1] ** 2 for p in pairs)
    sxy = sum(p[0] * p[1] for p in pairs)
    r_exp = (sxy - sx * sy / m) / math.sqrt(
        (sxx - sx * sx / m) * (syy - sy * sy / m)
    )
    r = REGISTRY["graph_assortativity"].fn(spark, sf_dir).collect()[0]
    assert r["n_directed_edges"] == m
    assert abs(r["assortativity"] - r_exp) < 1e-5
    assert -1 <= r["assortativity"] <= 1


def test_peak_detection_is_local_max(spark, sf_dir):
    out = REGISTRY["ts_peak_detection"].fn(spark, sf_dir).collect()
    series = _duck(
        f"""SELECT event_type, CAST(floor(epoch(ts)/60) AS BIGINT) AS m,
                   sum(round(value, 6)) / count(*) AS v
            FROM read_parquet('{SF_DIR}/events.parquet')
            GROUP BY 1, 2"""
    )
    per = defaultdict(dict)
    for et, m, v in series:
        per[et][m] = v
    gmean = {
        et: sum(d.values()) / len(d) for et, d in per.items()
    }
    assert out, "expected at least one peak at sf0.001+"
    for r in out:
        d = per[r["event_type"]]
        m = r["minute"]
        ms = sorted(d)
        i = ms.index(m)
        assert 0 < i < len(ms) - 1
        prev_m, next_m = ms[i - 1], ms[i + 1]
        # neighbors in MINUTE order (gaps allowed), strictly below peak
        assert d[m] > d[prev_m] and d[m] > d[next_m]
        assert abs(r["peak_value"] - d[m]) < 1e-5
        # weak global-mean check (replay mean is a float re-sum)
        assert d[m] > gmean[r["event_type"]] - 1e-6


def test_interarrival_stats_match_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, user_id, epoch_us(ts), event_id
            FROM read_parquet('{SF_DIR}/events.parquet')
            ORDER BY user_id, event_type, epoch_us(ts), event_id"""
    )
    gaps = defaultdict(list)
    prev = {}
    for et, u, ts, _eid in rows:
        k = (u, et)
        if k in prev:
            gaps[et].append(ts - prev[k])
        prev[k] = ts

    def q(vals, p):
        vs = sorted(vals)
        pos = p * (len(vs) - 1)
        lo, hi = vs[math.floor(pos)], vs[math.ceil(pos)]
        return (lo + (pos - math.floor(pos)) * (hi - lo)) / 1e6

    out = {
        r["event_type"]: r
        for r in REGISTRY["events_interarrival_stats"].fn(spark, sf_dir).collect()
    }
    assert set(out) == set(gaps)
    for et, g in gaps.items():
        r = out[et]
        assert r["n_gaps"] == len(g)
        assert abs(r["mean_gap_sec"] - sum(g) / len(g) / 1e6) < 1e-5
        assert abs(r["p50_gap_sec"] - q(g, 0.5)) < 1e-5
        assert abs(r["p90_gap_sec"] - q(g, 0.9)) < 1e-5
