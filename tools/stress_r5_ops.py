"""Scale stress for the second round-5 wave: Holt per-entity fold,
NFC-normalize pandas UDF throughput, composite-blocked fuzzy join.

Run:  python tools/stress_r5_ops.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.indicators import holt_smoothing
from kafka_stream_aggregator_spark.llm.text import nfc_normalize_udf
from kafka_stream_aggregator_spark.session import get_spark
from kafka_stream_aggregator_spark.tables import load_table


def tt(label, thunk):
    t0 = time.time()
    n = thunk()
    print(f"{label:48s} {time.time() - t0:7.1f}s  ({n:,} rows)")


def main() -> None:
    spark = get_spark("stress-r5")

    # 10M events: Holt fold per (event_type, user bucket) — 800 series
    # of ~12.5k points each (the realistic per-entity shape), plus the
    # degenerate 8-series x 1.25M-point case.
    base = load_table(spark, "/root/testdata/sf0.1", "events")
    d = tempfile.mkdtemp(prefix="stress_holt_")
    r = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("r")
    (
        base.select("*", r)
        .select(
            (F.col("event_id") + F.col("r") * 1_000_000).alias("event_id"),
            (F.col("ts") + F.make_interval(days=F.col("r"))).alias("ts"),
            (F.col("user_id") % 100).alias("ub"),
            "event_type",
            "value",
        )
        .write.mode("overwrite")
        .parquet(d)
    )
    ev = spark.read.parquet(d)
    print(f"events: {ev.count():,} rows")

    ev2 = ev.withColumn("grp", F.concat_ws("-", "event_type", "ub"))
    tt(
        "holt fold (10M rows, 800 series x ~12.5k)",
        lambda: holt_smoothing(ev2, ["grp"], "value", ["ts", "event_id"]).count(),
    )
    tt(
        "holt fold (10M rows, 8 series x 1.25M)",
        lambda: holt_smoothing(
            ev, ["event_type"], "value", ["ts", "event_id"]
        ).count(),
    )

    # 500k docs through the NFC pandas UDF
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    dd = tempfile.mkdtemp(prefix="stress_nfc_")
    rd = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("r")
    (
        docs.select("text", rd)
        .select(F.concat("text", F.lit(" r"), F.col("r").cast("string")).alias("text"))
        .write.mode("overwrite")
        .parquet(dd)
    )
    big_docs = spark.read.parquet(dd)
    print(f"documents: {big_docs.count():,} rows")
    norm = nfc_normalize_udf()
    tt(
        "nfc_normalize pandas UDF (500k docs)",
        lambda: big_docs.select(F.length(norm(F.col("text"))).alias("n"))
        .agg(F.sum("n"))
        .collect()
        and 500_000,
    )

    # fuzzy join at sf0.1 (20k parts), composite blocking
    from kafka_stream_aggregator_spark.queries import REGISTRY

    tt(
        "join_fuzzy_blocked (20k parts, composite)",
        lambda: REGISTRY["join_fuzzy_blocked"].fn(spark, "/root/testdata/sf0.1").count(),
    )

    print("done")


if __name__ == "__main__":
    main()
