"""Replays for the trading wave (queries/trading.py)."""

from __future__ import annotations

from collections import defaultdict

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.sources import gen_row


def test_vwap_replay(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0.0, 0.0])
    for i in range(4000):
        _s, inst, _d, p, a, _t = gen_row(7, i)
        c = agg[inst]
        c[0] += 1
        c[1] += a
        c[2] += p * a
    out = {r["instrument"]: r for r in REGISTRY["trade_vwap"].fn(spark, sf_dir).collect()}
    for inst, (n, vol, pv) in agg.items():
        r = out[inst]
        assert r["n_trades"] == n
        assert abs(r["volume_micro"] - round(vol * 1e6)) <= 1
        assert abs(r["vwap"] - pv / vol) < 1e-4


def test_tick_imbalance_replay(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0])
    for i in range(4000):
        _s, inst, d, _p, _a, _t = gen_row(7, i)
        c = agg[(inst, i // 500)]
        if d == "buy":
            c[0] += 1
        elif d == "sell":
            c[1] += 1
        if d != "zero":
            c[2] += 1
    out = {
        (r["instrument"], r["bucket"]): r
        for r in REGISTRY["trade_tick_imbalance"].fn(spark, sf_dir).collect()
    }
    exp = {k: v for k, v in agg.items() if v[2] > 0}
    assert set(out) == set(exp)
    for k, (b, s, nz) in exp.items():
        r = out[k]
        assert (r["buys"], r["sells"]) == (b, s)
        assert abs(r["imbalance"] - (b - s) / nz) < 1e-6
