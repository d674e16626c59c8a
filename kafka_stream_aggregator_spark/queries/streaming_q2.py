"""Sixth exactly-oracled streaming op (round 7): a complete-mode
aggregation over the CUSTOM Python streaming source
(sources/pydatasource.py TradeGenStreamReader).

Equivalence argument (the stream_cms/hll/kmv/burst/bitmap family):
counts per instrument are order- and batching-independent, and the
generator's row set is fixed, so the drained state equals the batch
generator aggregate EXACTLY — the oracle replays the generator with
generate_series + md5, which therefore verifies the STREAMING
connector end to end (offsets, prefetch, micro-batch planning).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F

from ..sketches import U64_SQL_TEMPLATE as U64
from .base import query

_N = 2000
_BATCH = 450  # deliberately not a divisor of _N: 5 uneven batches


def _u(field: str) -> str:
    return U64.format(expr=f"('7:' || CAST(i AS VARCHAR) || ':{field}')")


@query(
    "stream_pydatasource_counts",
    oracle=f"""
    WITH g AS (
      SELECT
        ['BTC-OPT-A','BTC-OPT-B','ETH-OPT-A','ETH-OPT-B'][({_u('i')} % 4) + 1]
          AS instrument,
        ['buy','sell','zero'][({_u('d')} % 3) + 1] AS direction
      FROM generate_series(0, {_N - 1}) t(i)
    )
    SELECT instrument,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count_if(direction = 'buy') AS BIGINT) AS buys
    FROM g GROUP BY instrument
    """,
)
def stream_pydatasource_counts(spark, sf_dir):
    """Streaming scan of the custom Python source in 5 uneven
    micro-batches (batch_rows=450 over 2000 rows), complete-mode
    count per instrument. The drain loop polls the query's committed
    offset and stops WHEN STATE says all rows are served — bounded,
    deterministic, no sleep-and-hope. sf_dir unused (generator
    source)."""
    from ..sources import register

    register(spark)
    s = (
        spark.readStream.format("tradegen")
        .option("n_rows", _N)
        .option("batch_rows", _BATCH)
        .option("seed", 7)
        .load()
    )
    agg = s.groupBy("instrument").agg(
        F.count("*").cast("bigint").alias("n"),
        F.count_if(F.col("direction") == "buy").cast("bigint").alias("buys"),
    )
    # idle-progress events gate the drain loop's exit; the 10 s default
    # would add that much dead time to every run
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "500")
    name = "q_" + uuid.uuid4().hex[:12]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    import ast

    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["sources"]:
                end = p["sources"][0].get("endOffset")
                if isinstance(end, str):
                    # the simple reader's dict offset round-trips as its
                    # Python repr (single quotes) — not JSON
                    end = ast.literal_eval(end)
                if (
                    end
                    and int(end.get("i", 0)) >= _N
                    and p["numInputRows"] == 0
                ):
                    # an empty batch after the final offset means the
                    # last data batch committed its sink write
                    break
            time.sleep(0.2)
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_tick_imbalance",
    # SEVENTH exactly-oracled streaming op: the reference-domain tick
    # imbalance (trade_tick_imbalance's 500-seq buckets) computed over
    # the STREAMING connector. Counts per (instrument, bucket) are
    # order- and batching-independent and the generator's row set is
    # fixed, so the drained complete-mode state equals the batch
    # aggregate EXACTLY — the oracle replays the generator, verifying
    # offsets/micro-batch planning AND the indicator end to end.
    oracle=f"""
    WITH g AS (
      SELECT i AS trade_seq,
        ['BTC-OPT-A','BTC-OPT-B','ETH-OPT-A','ETH-OPT-B'][({_u('i')} % 4) + 1]
          AS instrument,
        ['buy','sell','zero'][({_u('d')} % 3) + 1] AS direction
      FROM generate_series(0, {_N - 1}) t(i)
    )
    SELECT instrument,
           CAST(trade_seq // 500 AS BIGINT) AS bucket,
           CAST(count_if(direction = 'buy') AS BIGINT) AS buys,
           CAST(count_if(direction = 'sell') AS BIGINT) AS sells,
           round((count_if(direction = 'buy')
                  - count_if(direction = 'sell'))
                 / CAST(count_if(direction <> 'zero') AS DOUBLE), 6)
             AS imbalance
    FROM g
    GROUP BY instrument, CAST(trade_seq // 500 AS BIGINT)
    HAVING count_if(direction <> 'zero') > 0
    """,
)
def stream_tick_imbalance(spark, sf_dir):
    """Streaming tick imbalance: complete-mode keyed counts over the
    custom streaming source in uneven micro-batches; the final ratio
    is computed on the drained exact counts. sf_dir unused."""
    from ..sources import register

    register(spark)
    s = (
        spark.readStream.format("tradegen")
        .option("n_rows", _N)
        .option("batch_rows", _BATCH)
        .option("seed", 7)
        .load()
    )
    buys = F.count_if(F.col("direction") == "buy")
    sells = F.count_if(F.col("direction") == "sell")
    nz = F.count_if(F.col("direction") != "zero")
    agg = s.groupBy(
        "instrument",
        F.floor(F.col("trade_seq") / 500).cast("bigint").alias("bucket"),
    ).agg(
        buys.cast("bigint").alias("buys"),
        sells.cast("bigint").alias("sells"),
        nz.cast("bigint").alias("nz"),
    )
    spark.conf.set("spark.sql.streaming.noDataProgressEventInterval", "500")
    name = "q_" + uuid.uuid4().hex[:12]
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    import ast

    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["sources"]:
                end = p["sources"][0].get("endOffset")
                if isinstance(end, str):
                    end = ast.literal_eval(end)
                if (
                    end
                    and int(end.get("i", 0)) >= _N
                    and p["numInputRows"] == 0
                ):
                    break
            time.sleep(0.2)
        q.processAllAvailable()
    finally:
        q.stop()
    drained = spark.table(name)
    return (
        drained.filter(F.col("nz") > 0)
        .select(
            "instrument",
            "bucket",
            "buys",
            "sells",
            F.round(
                (F.col("buys") - F.col("sells")) / F.col("nz").cast("double"),
                6,
            ).alias("imbalance"),
        )
    )
