"""Multi-batch equivalence for stream_cdc_materialize
(queries/streaming_q.py): the materialized table after a 2-micro-batch
stream equals the batch argmax, including tombstone drops."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.streaming.sources import file_stream
from kafka_stream_aggregator_spark.tables import load_table


def _run(spark, sdf, mode):
    name = "t_" + uuid.uuid4().hex[:10]
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_cdc_materialize_multibatch_equals_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    d = str(tmp_path / "cdc_stream")
    # split so most keys receive changes in BOTH micro-batches
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
    agg = stream.groupBy("user_id").agg(
        F.max(
            F.struct("ts", "event_id", "event_type", "value")
        ).alias("last")
    )
    drained = _run(spark, agg, "complete")
    got = {
        r["user_id"]: (
            r["last"]["event_type"],
            r["last"]["event_id"],
        )
        for r in drained.collect()
    }

    # batch reference: argmax by (ts, event_id) per user
    ref = {
        r["user_id"]: (r["event_type"], r["event_id"])
        for r in ev.withColumn(
            "rn",
            F.row_number().over(
                __import__(
                    "pyspark.sql.window", fromlist=["Window"]
                ).Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where("rn = 1")
        .collect()
    }
    assert got == ref
    # and the registered query's tombstone filter matches the oracle's
    out = REGISTRY["stream_cdc_materialize"].fn(spark, sf_dir).collect()
    live = {u for u, (et, _eid) in ref.items() if et != "error"}
    assert {r["user_id"] for r in out} == live
    for r in out:
        assert r["last_op_type"] == ref[r["user_id"]][0]
