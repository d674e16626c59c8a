"""Streaming Misra-Gries heavy hitters: bound invariants and
state-carrying behavior across micro-batches."""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.streaming.heavyhitters import (
    latest_snapshot,
    stream_heavy_hitters,
)
from kafka_stream_aggregator_spark.streaming.sources import file_stream

K, SHARDS = 8, 2


def _drain(spark, sdf):
    name = "hh_" + uuid.uuid4().hex[:12]
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@pytest.fixture(scope="module")
def planted(spark):
    """3 planted hitters (300/200/100 occurrences) in a sea of 600
    singletons, split into two micro-batch files."""
    rows = []
    i = 0
    for item, n in (("big", 300), ("mid", 200), ("low", 100)):
        for _ in range(n):
            rows.append((i, item))
            i += 1
    for j in range(600):
        rows.append((i, f"rare-{j}"))
        i += 1
    df = spark.createDataFrame(rows, "event_id long, item string")
    d = tempfile.mkdtemp(prefix="hh_src_")
    df.filter("event_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(d)
    df.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(d)
    truth = {r["item"]: r["n"] for r in
             df.groupBy("item").agg(F.count("*").alias("n")).collect()}
    return d, truth


def test_planted_hitters_survive_with_bounds(spark, planted):
    d, truth = planted
    stream = file_stream(spark, d, "event_id long, item string",
                         max_files_per_trigger=1)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        out = _drain(spark, stream_heavy_hitters(stream, "item", k=K,
                                                 n_shards=SHARDS))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    snap = latest_snapshot(out).collect()
    assert snap, "no summary emitted"
    per_shard_n = {}
    reported = {}
    for r in snap:
        per_shard_n[r["shard"]] = r["n_shard"]
        reported[r["item"]] = (r["count_lb"], r["n_shard"])
    # state stayed bounded: at most k counters per shard
    from collections import Counter

    by_shard = Counter(r["shard"] for r in snap)
    assert all(c <= K for c in by_shard.values())
    # total weight conserved across shards
    assert sum(per_shard_n.values()) == sum(truth.values())
    for item, (lb, n_shard) in reported.items():
        true = truth[item]
        err = n_shard / (K + 1)
        assert lb <= true, f"{item}: lower bound {lb} exceeds truth {true}"
        assert lb >= true - err, f"{item}: undercount beyond n/(k+1)"
    # guaranteed presence: the big planted hitters exceed any shard's
    # err bound (n_shard <= 1200 -> err <= 133; low=100 may miss)
    for item in ("big", "mid"):
        assert item in reported, f"planted hitter {item} missing"


def test_registry_stream_heavy_hitters(spark, sf_dir):
    rows = REGISTRY["stream_heavy_hitters"].fn(spark, sf_dir).collect()
    assert rows
    k = 16
    from collections import Counter

    by_shard = Counter(r["shard"] for r in rows)
    assert all(c <= k for c in by_shard.values())
    # lower bounds within n_shard/(k+1) of true counts
    import os

    truth = {
        str(r["user_id"]): r["n"]
        for r in spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        true = truth[r["item"]]
        assert r["count_lb"] <= true
        assert r["count_lb"] >= true - r["n_shard"] / (k + 1)
