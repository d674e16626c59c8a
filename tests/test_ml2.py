"""Reference replays for the classical-ML wave (queries/ml2.py):
the stump against an exhaustive threshold scan, the closed-form
regression against numpy's least squares."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def test_decision_stump_matches_scan(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_totalprice,
                   CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                        THEN 1 ELSE 0 END
            FROM read_parquet('{SF_DIR}/orders.parquet')
            ORDER BY o_totalprice"""
    ).fetchall()
    vals = [v for v, _ in rows]
    ys = [y for _, y in rows]
    t1, t0 = sum(ys), len(ys) - sum(ys)
    best = None
    f1 = f0 = 0
    i = 0
    while i < len(rows):
        j = i
        while j + 1 < len(rows) and vals[j + 1] == vals[i]:
            j += 1
        f1 += sum(ys[i: j + 1])
        f0 += (j - i + 1) - sum(ys[i: j + 1])
        i = j + 1
        if f1 + f0 == len(rows):
            break
        nl, nr = f1 + f0, len(rows) - f1 - f0
        r1, r0 = t1 - f1, t0 - f0
        g = round(
            (nl - (f1 * f1 + f0 * f0) / nl) + (nr - (r1 * r1 + r0 * r0) / nr),
            9,
        )
        key = (g, vals[j])
        if best is None or key < best[0]:
            best = (key, f1, f0)
    (g, thr), bf1, bf0 = best
    out = REGISTRY["ml_decision_stump"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["threshold"] == thr
    assert r["gini_weighted"] == pytest.approx(g, abs=1e-9)
    assert r["n_left"] == bf1 + bf0
    assert r["n_right"] == len(rows) - bf1 - bf0
    assert r["left_majority"] == (1 if bf1 * 2 >= bf1 + bf0 else 0)
    # the stump must beat the trivial no-split Gini
    p1 = t1 / len(rows)
    root_gini = len(rows) * 2 * p1 * (1 - p1)
    assert r["gini_weighted"] <= root_gini + 1e-9


def test_linreg_matches_numpy(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(o.o_totalprice AS DECIMAL(18,2)),
                   sum(CAST(l.l_quantity AS BIGINT)), count(*)
            FROM read_parquet('{SF_DIR}/orders.parquet') o
            JOIN read_parquet('{SF_DIR}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderkey, o.o_totalprice"""
    ).fetchall()
    y = np.array([float(r[0]) for r in rows])
    X = np.column_stack(
        [np.ones(len(rows)), [r[1] for r in rows], [r[2] for r in rows]]
    )
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    out = REGISTRY["ml_linreg_normal_eq"].fn(spark, sf_dir).collect()[0]
    assert out["n"] == len(rows)
    assert out["b0"] == pytest.approx(beta[0], rel=1e-4, abs=1e-3)
    assert out["b1"] == pytest.approx(beta[1], rel=1e-4, abs=1e-3)
    assert out["b2"] == pytest.approx(beta[2], rel=1e-4, abs=1e-3)
    # prediction sanity: more items / quantity => higher price
    assert out["b1"] > 0 or out["b2"] > 0
