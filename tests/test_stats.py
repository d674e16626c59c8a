"""Reference replays for the hypothesis-testing wave
(queries/stats.py): KS, Mann-Whitney U, Spearman, and one-way ANOVA
are recomputed with explicit Python loops (textbook formulas, avg-tie
ranks) and compared to the Spark results at sf0.001."""

from __future__ import annotations

import math

import duckdb
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    con = duckdb.connect()
    return con.execute(sql).fetchall()


def _avg_ranks(values):
    """Tie-averaged ranks (1-based) of a list, textbook definition."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and values[order[j + 1]] == values[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def test_ks_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, value
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type IN ('view','click')"""
    )
    a = sorted(v for t, v in rows if t == "view")
    b = sorted(v for t, v in rows if t == "click")
    pooled = sorted(set(a) | set(b))
    import bisect

    d = 0.0
    for x in pooled:
        f1 = bisect.bisect_right(a, x) / len(a)
        f2 = bisect.bisect_right(b, x) / len(b)
        d = max(d, abs(f1 - f2))
    out = REGISTRY["stat_ks_test"].fn(spark, sf_dir).collect()[0]
    assert out["n1"] == len(a) and out["n2"] == len(b)
    assert out["d_stat"] == pytest.approx(d, abs=2e-6)
    scale = math.sqrt(len(a) * len(b) / (len(a) + len(b)))
    assert out["ks_scaled"] == pytest.approx(scale * d, abs=1e-4)


def test_mannwhitney_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT o_orderpriority, o_totalprice
            FROM read_parquet('{SF_DIR}/orders.parquet')
            WHERE o_orderpriority IN ('1-URGENT','5-LOW')"""
    )
    vals = [v for _, v in rows]
    ranks = _avg_ranks(vals)
    n1 = sum(1 for p, _ in rows if p == "1-URGENT")
    n2 = len(rows) - n1
    r1 = sum(r for (p, _), r in zip(rows, ranks) if p == "1-URGENT")
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    # tie correction
    from collections import Counter

    ties = sum(t**3 - t for t in Counter(vals).values())
    mu = n1 * n2 / 2
    sig2 = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - mu) / math.sqrt(sig2)
    out = REGISTRY["stat_mannwhitney_u"].fn(spark, sf_dir).collect()[0]
    assert out["n1"] == n1 and out["n2"] == n2
    assert out["u_centered"] == pytest.approx(u1 - mu, abs=1e-3)
    assert out["z_stat"] == pytest.approx(z, abs=1e-5)


def test_spearman_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT l_quantity, l_extendedprice
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    )
    rx = _avg_ranks([q for q, _ in rows])
    ry = _avg_ranks([p for _, p in rows])
    n = len(rows)
    ma = sum(rx) / n
    mb = sum(ry) / n
    cov = sum(x * y for x, y in zip(rx, ry)) / n - ma * mb
    va = sum(x * x for x in rx) / n - ma * ma
    vb = sum(y * y for y in ry) / n - mb * mb
    rho = cov / math.sqrt(va * vb)
    out = REGISTRY["stat_spearman_corr"].fn(spark, sf_dir).collect()[0]
    assert out["n"] == n
    assert out["rho"] == pytest.approx(rho, abs=1e-5)
    # the synthetic generator draws price independent of quantity:
    # rho is near zero (the replay above is the real equality check)
    assert abs(out["rho"]) < 0.1


def test_anova_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE)
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    groups = {}
    for et, v in rows:
        groups.setdefault(et, []).append(v)
    k = len(groups)
    n = len(rows)
    grand = sum(v for _, v in rows) / n
    ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups.values())
    ssw = sum(
        sum((v - sum(g) / len(g)) ** 2 for v in g) for g in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    out = REGISTRY["stat_anova_oneway"].fn(spark, sf_dir).collect()[0]
    assert out["k"] == k and out["n"] == n
    assert out["ss_between"] == pytest.approx(ssb, rel=1e-6)
    assert out["ss_within"] == pytest.approx(ssw, rel=1e-6)
    assert out["f_stat"] == pytest.approx(f, rel=1e-5)
    assert out["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=1e-6)


def test_ks_identical_samples_zero(spark, sf_dir):
    """KS of a distribution against itself must be 0: replay the
    query shape on a same-type split sanity-checked via the statistic
    being small for two halves of the same generator output."""
    out = REGISTRY["stat_ks_test"].fn(spark, sf_dir).collect()[0]
    # view vs click are drawn from similar generators: D must be << 1
    # and strictly positive (distinct empirical samples).
    assert 0 < out["d_stat"] < 0.5
