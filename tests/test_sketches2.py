"""Reference replays for the estimation-sketch wave
(queries/sketches2.py): the CMS inner-product, KMV, and AMS
constructions are recomputed in pure Python (hashlib md5 — the same
portable 60-bit hash) and compared exactly, plus the estimators'
theoretical guarantees are pinned as invariants."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.queries.sketches2 import (
    AMS_D,
    CMS_D,
    CMS_W,
    KMV_K,
)

from conftest import SF_DIR


def _u64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def pdf():
    con = duckdb.connect()
    out = {}
    for name in ["events", "orders", "customer"]:
        out[name] = con.execute(
            f"SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        ).df()
    return out


def test_join_size_sketch_matches_replay(spark, sf_dir, pdf):
    """CMS inner product replayed cell-by-cell; est must equal the
    replay AND respect the upper-bound guarantee est >= true."""
    def build(keys):
        cells = {}
        for k in keys:
            for i in range(CMS_D):
                c = _u64(f"{k}:{i}") % CMS_W
                cells[(i, c)] = cells.get((i, c), 0) + 1
        return cells

    a = build(pdf["orders"]["o_custkey"].tolist())
    b = build(pdf["events"]["user_id"].tolist())
    dots = [
        sum(
            cnt * b.get((i, c), 0)
            for (i2, c), cnt in a.items()
            if i2 == i
        )
        for i in range(CMS_D)
    ]
    est = min(dots)
    fo = pdf["orders"].groupby("o_custkey").size()
    fe = pdf["events"].groupby("user_id").size()
    exact = int(sum(fo.get(k, 0) * n for k, n in fe.items()))

    row = REGISTRY["diag_join_size_sketch"].fn(spark, sf_dir).collect()[0]
    assert row["est_join_size"] == est
    assert row["exact_join_size"] == exact
    assert row["est_join_size"] >= exact  # CMS inner product never undershoots
    assert row["over_ratio"] == pytest.approx(est / exact, abs=1e-6)


def test_kmv_matches_replay(spark, sf_dir, pdf):
    """KMV minima, Jaccard, and union-distinct estimates replayed;
    the distinct estimate must land within the k-relative bound."""
    a = set(pdf["orders"]["o_custkey"].tolist())
    b = set(pdf["customer"]["c_custkey"].tolist())
    union = sorted(a | b)
    hv = {k: _u64(str(k)) for k in union}
    mins = sorted(union, key=lambda k: (hv[k], k))[:KMV_K]
    n_kmv = len(mins)
    est_j = sum(1 for k in mins if k in a and k in b) / n_kmv
    exact_j = len(a & b) / len(a | b)
    hk = max(hv[k] for k in mins)
    est_u = (n_kmv - 1) * 1152921504606846976.0 / hk

    row = REGISTRY["sketch_kmv_jaccard"].fn(spark, sf_dir).collect()[0]
    assert row["n_kmv"] == n_kmv
    assert row["est_jaccard"] == pytest.approx(est_j, abs=1e-6)
    assert row["exact_jaccard"] == pytest.approx(exact_j, abs=1e-6)
    assert row["est_union_distinct"] == pytest.approx(est_u, abs=1e-4)
    assert row["exact_union_distinct"] == len(union)
    # KMV relative-error guarantee is O(1/sqrt(k)); allow 6 sigma.
    rel = abs(est_u - len(union)) / len(union)
    assert rel < 6.0 / (n_kmv - 1) ** 0.5


def test_ams_f2_matches_replay(spark, sf_dir, pdf):
    """AMS signed sums replayed; est is the mean of d squared sums."""
    freq = pdf["events"].groupby("user_id").size().to_dict()
    zs = []
    for i in range(AMS_D):
        zs.append(
            sum(
                f * (1 - 2 * (_u64(f"{k}:{i}") % 2))
                for k, f in freq.items()
            )
        )
    est = sum(z * z for z in zs) / AMS_D
    exact = sum(f * f for f in freq.values())

    row = REGISTRY["sketch_ams_f2"].fn(spark, sf_dir).collect()[0]
    assert row["exact_f2"] == exact
    assert row["est_f2"] == pytest.approx(est, abs=1e-6)
    assert row["est_over_exact"] == pytest.approx(est / exact, abs=1e-6)


def test_ams_unbiased_over_many_seeds():
    """Pure-Python law-of-large-numbers check: averaging the AMS
    estimator over many independent sign seeds converges to F2 (the
    estimator is unbiased); pins the sign construction itself."""
    freq = {k: (k % 7) + 1 for k in range(40)}
    exact = sum(f * f for f in freq.values())
    n_seeds = 400
    total = 0.0
    for i in range(n_seeds):
        z = sum(
            f * (1 - 2 * (_u64(f"{k}:{i}") % 2)) for k, f in freq.items()
        )
        total += z * z
    mean = total / n_seeds
    assert abs(mean - exact) / exact < 0.25
