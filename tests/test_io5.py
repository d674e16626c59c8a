"""Replays for IO wave 5 (queries/io5.py) and the custom Python
DataSource."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.sources import gen_row, register

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_datasource_partitions_and_rows(spark):
    register(spark)
    df = (
        spark.read.format("tradegen")
        .option("n_rows", 100)
        .option("n_parts", 5)
        .option("seed", 3)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = {r["trade_seq"]: tuple(r) for r in df.collect()}
    assert len(rows) == 100
    for i in (0, 17, 99):
        assert rows[i] == gen_row(3, i)


def test_datasource_scan_query_is_input_independent(spark, sf_dir):
    out = REGISTRY["io_python_datasource_scan"].fn(spark, sf_dir).collect()
    n = sum(r["n"] for r in out)
    assert n == 2000
    insts = {r["instrument"] for r in out}
    assert insts == {"BTC-OPT-A", "BTC-OPT-B", "ETH-OPT-A", "ETH-OPT-B"}
    # exact micro-sums replay
    exp = defaultdict(lambda: [0, 0, 0])
    for i in range(2000):
        _seq, inst, d, p, a, _ts = gen_row(7, i)
        cell = exp[(inst, d)]
        cell[0] += 1
        cell[1] += round(p * 1e6)
        cell[2] += round(a * 1e6)
    for r in out:
        c = exp[(r["instrument"], r["direction"])]
        assert (r["n"], r["sum_price_micro"], r["sum_amount_micro"]) == tuple(c)


def test_asof_forward_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, event_id, user_id, epoch_us(ts),
                   round(value, 6)
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type IN ('click', 'purchase')"""
    )
    purchases = defaultdict(list)
    clicks = []
    for et, eid, u, ts, v in rows:
        if et == "purchase":
            purchases[u].append((ts, eid, v))
        else:
            clicks.append((eid, u, ts))
    out = {r["event_id"]: r for r in REGISTRY["join_asof_forward"].fn(spark, sf_dir).collect()}
    assert set(out) == {eid for eid, _u, _t in clicks}
    for eid, u, ts in clicks:
        after = sorted(p for p in purchases[u] if p[0] >= ts)
        r = out[eid]
        if after:
            assert r["converts"] == 1.0
            assert abs(r["next_purchase_value"] - after[0][2]) < 1e-6
        else:
            assert r["converts"] == 0.0
            assert r["next_purchase_value"] == -1.0


def test_dedup_curve_replay(spark, sf_dir):
    raw, norm, pref = _duck(
        f"""SELECT count(DISTINCT md5(text)),
                   count(DISTINCT md5(regexp_replace(lower(text), '\\s+', ' ', 'g'))),
                   count(DISTINCT md5(array_to_string(
                     regexp_extract_all(lower(text), '\\S+')[1:8], ' ')))
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )[0]
    (n,) = _duck(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    )[0]
    out = {r["tier"]: r for r in REGISTRY["corpus_dedup_curve"].fn(spark, sf_dir).collect()}
    assert out["raw"]["n_distinct"] == raw
    assert out["norm"]["n_distinct"] == norm
    assert out["prefix8"]["n_distinct"] == pref
    for r in out.values():
        assert r["n_docs"] == n
        assert abs(r["dup_rate"] - (1 - r["n_distinct"] / n)) < 1e-9
    # aggressiveness ordering: coarser keys can only dedup MORE
    assert out["raw"]["n_distinct"] >= out["norm"]["n_distinct"] >= out["prefix8"]["n_distinct"]


def test_session_entropy_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT user_id, event_type, count(*)
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY 1, 2"""
    )
    per = defaultdict(dict)
    for u, et, k in rows:
        per[u][et] = k
    out = {r["user_id"]: r for r in REGISTRY["events_session_entropy"].fn(spark, sf_dir).collect()}
    assert set(out) == set(per)
    for u, m in per.items():
        n = sum(m.values())
        ent = sum(-(k / n) * math.log(k / n) for k in m.values())
        assert out[u]["n_events"] == n
        assert abs(out[u]["entropy"] - ent) < 1e-5
        assert -1e-9 <= out[u]["entropy"] <= math.log(5) + 1e-9


def test_streaming_datasource_drains_all_batches(spark, sf_dir):
    """The custom streaming source serves 2000 rows in 5 uneven
    450-row micro-batches; the drained complete-mode counts must equal
    the batch generator aggregate exactly."""
    from collections import Counter

    out = {
        r["instrument"]: (r["n"], r["buys"])
        for r in REGISTRY["stream_pydatasource_counts"].fn(spark, sf_dir).collect()
    }
    exp_n = Counter()
    exp_b = Counter()
    for i in range(2000):
        _s, inst, d, _p, _a, _t = gen_row(7, i)
        exp_n[inst] += 1
        if d == "buy":
            exp_b[inst] += 1
    assert out == {k: (exp_n[k], exp_b[k]) for k in exp_n}


def test_streaming_datasource_checkpoint_resume(spark, tmp_path):
    """Kill the stream after the first micro-batch, restart with the
    same checkpoint: the reader must RESUME from the committed offset
    (no re-serve, no gap) — append-mode counts across both runs equal
    the full row set exactly."""
    import time
    import uuid

    from pyspark.sql import functions as F

    register(spark)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def start():
        s = (
            spark.readStream.format("tradegen")
            .option("n_rows", 1000)
            .option("batch_rows", 300)
            .option("seed", 11)
            .load()
        )
        return (
            s.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )

    schema = (
        "trade_seq long, instrument string, direction string,"
        " price double, amount double, ts_ms long"
    )

    def n_written():
        try:
            return spark.read.schema(schema).parquet(out_dir).count()
        except Exception:
            return 0

    q = start()
    deadline = time.time() + 120
    while time.time() < deadline and n_written() == 0:
        time.sleep(0.3)
    q.stop()  # kill mid-stream
    n1 = n_written()
    assert 0 < n1 <= 1000

    q2 = start()
    deadline = time.time() + 180
    while time.time() < deadline and n_written() < 1000:
        time.sleep(0.3)
    q2.stop()
    got = spark.read.schema(schema).parquet(out_dir)
    assert got.count() == 1000
    # no duplicates, no gaps: trade_seq is exactly 0..999
    seqs = sorted(r["trade_seq"] for r in got.select("trade_seq").collect())
    assert seqs == list(range(1000))
