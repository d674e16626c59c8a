"""Replays and streaming-equivalence tests for analytics wave 17
(queries/analytics17.py)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb
from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.queries.streaming_q import _run_to_df
from kafka_stream_aggregator_spark.streaming.sources import file_stream
from kafka_stream_aggregator_spark.tables import load_table

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_cross_source_dedup_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT source, array_to_string(
              regexp_extract_all(lower(text), '\\S+')[1:8], ' ')
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    per = defaultdict(set)
    for src, prefix in rows:
        per[src].add(hashlib.md5(prefix.encode()).hexdigest())
    out = {
        (r["source_a"], r["source_b"]): r["shared_hashes"]
        for r in REGISTRY["doc_cross_source_dedup"].fn(spark, sf_dir).collect()
    }
    exp = {}
    srcs = sorted(per)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            n = len(per[a] & per[b])
            if n:
                exp[(a, b)] = n
    assert out == exp


def test_coverage_curve_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS tk
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    freq = defaultdict(int)
    for (tk,) in rows:
        freq[tk] += 1
    total = sum(freq.values())
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    out = {r["k"]: r for r in REGISTRY["corpus_ngram_coverage_curve"].fn(spark, sf_dir).collect()}
    for k in (10, 100, 1000):
        if k > len(ranked) and not any(
            kk <= len(ranked) for kk in (k,)
        ):
            continue
        topsum = sum(c for _t, c in ranked[:k])
        r = out[k]
        assert r["total_occurrences"] == total
        assert r["top_occurrences"] == topsum
        assert abs(r["coverage"] - topsum / total) < 1e-6
    # coverage is monotone in k and <= 1
    ks = sorted(out)
    for k1, k2 in zip(ks, ks[1:]):
        assert out[k1]["coverage"] <= out[k2]["coverage"] <= 1.0


def test_stream_burst_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """Splitting the stream into micro-batches cannot change the cell
    counts (count is batching-independent), so the streaming operator
    must equal the batch operator row for row."""
    ev = load_table(spark, sf_dir, "events")
    d = str(tmp_path / "burst_stream")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    stream = file_stream(
        spark,
        d,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
        max_files_per_trigger=1,
    )
    cells_stream = stream.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 3600).cast("bigint").alias("hour"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    drained = _run_to_df(spark, cells_stream, mode="complete")
    got = {
        (r["event_type"], r["hour"]): r["c"] for r in drained.collect()
    }
    ref = {
        (r["event_type"], r["hour"]): r["c"]
        for r in ev.groupBy(
            "event_type",
            F.floor(F.col("ts").cast("double") / 3600)
            .cast("bigint")
            .alias("hour"),
        )
        .agg(F.count("*").cast("bigint").alias("c"))
        .collect()
    }
    assert got == ref
    # and the full operator agrees with the batch twin
    s_rows = sorted(
        map(
            tuple,
            REGISTRY["stream_poisson_burst"].fn(spark, sf_dir).collect(),
        )
    )
    b_rows = sorted(
        map(tuple, REGISTRY["events_poisson_burst"].fn(spark, sf_dir).collect())
    )
    assert s_rows == b_rows
