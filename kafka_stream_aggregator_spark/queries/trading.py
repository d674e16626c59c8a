"""Trading-domain wave (round 7): VWAP and tick-imbalance over the
custom Python DataSource — the reference's own domain (crypto trade
ticks, models.rs:31-44) computed on the engine's own connector.

Both oracles REPLAY the tradegen generator (generate_series + md5,
as io_python_datasource_scan established), so source + indicator are
verified together end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sketches import U64_SQL_TEMPLATE as U64
from .base import query

_N = 4000


def _gen_sql(n: int) -> str:
    def u(field: str) -> str:
        return U64.format(
            expr=f"('7:' || CAST(i AS VARCHAR) || ':{field}')"
        )

    return f"""
      SELECT i AS trade_seq,
        ['BTC-OPT-A','BTC-OPT-B','ETH-OPT-A','ETH-OPT-B'][({u('i')} % 4) + 1]
          AS instrument,
        ['buy','sell','zero'][({u('d')} % 3) + 1] AS direction,
        round(100.0 + ({u('p')} % 1000000) / 100.0, 6) AS price,
        round(1.0 + ({u('a')} % 1000) / 10.0, 6) AS amount
      FROM generate_series(0, {n - 1}) t(i)
    """


def _trades(spark):
    from ..sources import register

    register(spark)
    return (
        spark.read.format("tradegen")
        .option("n_rows", _N)
        .option("n_parts", 8)
        .option("seed", 7)
        .load()
    )


@query(
    "trade_vwap",
    # Volume-weighted average price per instrument: VWAP =
    # sum(price*amount)/sum(amount) with both sums DECIMAL-exact at
    # the generator's 6-dp grain (the product is exact at 12 dp); the
    # division is the only double op. The reference's EWMA sibling
    # indicator (indicators.rs:6-11 computes EWMA; VWAP is the other
    # standard tick aggregate).
    oracle=f"""
    WITH g AS ({_gen_sql(_N)})
    SELECT instrument,
           CAST(count(*) AS BIGINT) AS n_trades,
           CAST(sum(CAST(amount AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS volume_micro,
           round(CAST(sum(CAST(price AS DECIMAL(20,6))
                          * CAST(amount AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(CAST(amount AS DECIMAL(18,6))) AS DOUBLE), 6)
             AS vwap
    FROM g GROUP BY instrument
    """,
)
def trade_vwap(spark, sf_dir):
    """VWAP: one codegen hash aggregate over the connector scan —
    map-side partial sums, 4-row reduce. sf_dir unused (the source is
    the generator), kept for the uniform query signature."""
    df = _trades(spark)
    am = F.col("amount").cast("decimal(18,6)")
    pr = F.col("price").cast("decimal(20,6)")
    return df.groupBy("instrument").agg(
        F.count("*").cast("bigint").alias("n_trades"),
        (F.sum(am) * 1_000_000).cast("bigint").alias("volume_micro"),
        F.round(
            F.sum(pr * am).cast("double") / F.sum(am).cast("double"), 6
        ).alias("vwap"),
    )


@query(
    "trade_tick_imbalance",
    # Buy/sell tick imbalance per instrument per 500-trade bucket:
    # (buys - sells) / (buys + sells), zeros excluded — the order-flow
    # signal microstructure models start from. Exact integer counts;
    # one division.
    oracle=f"""
    WITH g AS ({_gen_sql(_N)})
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
def trade_tick_imbalance(spark, sf_dir):
    """Tick imbalance: one aggregate keyed by (instrument, seq
    bucket); at any scale the bucket key keeps groups bounded."""
    df = _trades(spark)
    buys = F.count_if(F.col("direction") == "buy")
    sells = F.count_if(F.col("direction") == "sell")
    nz = F.count_if(F.col("direction") != "zero")
    return (
        df.groupBy(
            "instrument",
            F.floor(F.col("trade_seq") / 500).cast("bigint").alias("bucket"),
        )
        .agg(
            buys.cast("bigint").alias("buys"),
            sells.cast("bigint").alias("sells"),
            F.round(
                (buys - sells) / nz.cast("double"), 6
            ).alias("imbalance"),
            nz.alias("nz"),
        )
        .filter(F.col("nz") > 0)
        .drop("nz")
    )
