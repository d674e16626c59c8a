"""Round-9 wave 46: range-based volatility and order-flow estimators
over the tradegen connector (reference domain: crypto trade ticks,
models.rs:31-44) — Parkinson/Garman-Klass, Corwin-Schultz spread, and
order-flow sign autocorrelation.

Bars are 1000-tick global-sequence windows (4 per run, ~250 ticks per
instrument each) with DECIMAL-exact OHLC; every ln appears at O(1)
magnitude and is quantized round(., 9) BEFORE any term algebra (the
theil/adamic-adar discipline), libm constants are embedded as the
same decimal literals in both engines, and bounded per-instrument
term sums go through DECIMAL so no double fold order can leak.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query
from .trading import _N, _gen_sql, _trades

# identical literal constants on BOTH engines (never computed via ln)
_2LN2M1 = "0.3862943611198906"  # 2*ln(2) - 1
_INV4LN2 = "0.3606737602222409"  # 1 / (4*ln(2))
_3M2SQRT2 = "0.1715728752538099"  # 3 - 2*sqrt(2)

_OHLC_SQL = f"""
      SELECT instrument, CAST(floor(trade_seq / 1000) AS BIGINT) AS bar,
             CAST(max(price) AS DECIMAL(18,6)) AS h,
             CAST(min(price) AS DECIMAL(18,6)) AS l,
             CAST(arg_min(price, trade_seq) AS DECIMAL(18,6)) AS o,
             CAST(arg_max(price, trade_seq) AS DECIMAL(18,6)) AS c
      FROM g GROUP BY instrument, bar
"""


def _ohlc(spark):
    df = _trades(spark)
    p = F.col("price").cast("decimal(18,6)")
    return df.groupBy(
        "instrument",
        F.floor(F.col("trade_seq") / 1000).cast("bigint").alias("bar"),
    ).agg(
        F.max(p).alias("h"),
        F.min(p).alias("l"),
        F.min(F.struct(F.col("trade_seq"), p.alias("p")))["p"].alias("o"),
        F.max(F.struct(F.col("trade_seq"), p.alias("p")))["p"].alias("c"),
    )


@query(
    "trade_range_volatility",
    # Parkinson (1980) and Garman-Klass (1980) range-based variance
    # estimators per instrument: richer than close-close variance
    # because the high-low range carries intrabar information.
    # P = mean(ln(H/L)^2) / (4 ln 2);  GK = mean(0.5 ln(H/L)^2
    # - (2 ln 2 - 1) ln(C/O)^2). ln terms round-9-quantized, bounded
    # 4-bar DECIMAL term sums.
    oracle=f"""
    WITH g AS ({_gen_sql(_N)}), b AS ({_OHLC_SQL}), r AS (
      SELECT instrument,
             CAST(round(ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE)), 9)
                  AS DECIMAL(20,9)) AS lhl,
             CAST(round(ln(CAST(c AS DOUBLE) / CAST(o AS DOUBLE)), 9)
                  AS DECIMAL(20,9)) AS lco
      FROM b
    ), m AS (
      SELECT instrument,
             CAST(count(*) AS BIGINT) AS n_bars,
             CAST(sum(CAST(round(CAST(lhl AS DOUBLE)
                                 * CAST(lhl AS DOUBLE), 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS s_hl2,
             CAST(sum(CAST(round(CAST(lco AS DOUBLE)
                                 * CAST(lco AS DOUBLE), 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS s_co2
      FROM r GROUP BY instrument
    )
    SELECT instrument, n_bars,
           round({_INV4LN2} * s_hl2 / n_bars, 6) AS parkinson_var,
           round((0.5 * s_hl2 - {_2LN2M1} * s_co2) / n_bars, 6)
             AS garman_klass_var
    FROM m WHERE n_bars > 0
    """,
)
def trade_range_volatility(spark, sf_dir):
    """Parkinson + Garman-Klass per instrument: one OHLC bar
    aggregate, round-9 ln terms, DECIMAL 4-term sums, two closed
    chains. sf_dir unused (connector source)."""
    b = _ohlc(spark)
    lhl = F.round(
        F.log(F.col("h").cast("double") / F.col("l").cast("double")), 9
    ).cast("decimal(20,9)")
    lco = F.round(
        F.log(F.col("c").cast("double") / F.col("o").cast("double")), 9
    ).cast("decimal(20,9)")
    r = b.select(
        "instrument", lhl.alias("lhl"), lco.alias("lco")
    )
    sq = lambda col: F.round(  # noqa: E731
        F.col(col).cast("double") * F.col(col).cast("double"), 9
    ).cast("decimal(20,9)")
    m = r.groupBy("instrument").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bars"),
        F.sum(sq("lhl")).cast("double").alias("s_hl2"),
        F.sum(sq("lco")).cast("double").alias("s_co2"),
    )
    return m.filter(F.col("n_bars") > 0).select(
        "instrument",
        "n_bars",
        F.round(
            F.lit(float(_INV4LN2)) * F.col("s_hl2") / F.col("n_bars"), 6
        ).alias("parkinson_var"),
        F.round(
            (0.5 * F.col("s_hl2") - F.lit(float(_2LN2M1)) * F.col("s_co2"))
            / F.col("n_bars"),
            6,
        ).alias("garman_klass_var"),
    )


@query(
    "trade_corwin_schultz",
    # Corwin-Schultz (2012) high-low spread estimator per instrument:
    # over consecutive bar pairs, beta = mean(lhl_t^2 + lhl_{t+1}^2),
    # gamma = mean(ln(maxH/minL)^2 over the 2-bar span); alpha =
    # (sqrt(2 beta) - sqrt(beta)) / (3 - 2 sqrt 2)
    # - sqrt(gamma / (3 - 2 sqrt 2)); spread = 2(e^a - 1)/(1 + e^a).
    # alpha is O(1) so the exp sits far inside the audit margin.
    oracle=f"""
    WITH g AS ({_gen_sql(_N)}), b AS ({_OHLC_SQL}), p AS (
      SELECT instrument,
             CAST(round(ln(CAST(h AS DOUBLE) / CAST(l AS DOUBLE)), 9)
                  AS DOUBLE) AS lhl,
             CAST(round(ln(CAST(lead(h) OVER w AS DOUBLE)
                           / CAST(lead(l) OVER w AS DOUBLE)), 9)
                  AS DOUBLE) AS lhl2,
             CAST(round(ln(CAST(greatest(h, lead(h) OVER w) AS DOUBLE)
                           / CAST(least(l, lead(l) OVER w) AS DOUBLE)),
                        9) AS DOUBLE) AS lsp
      FROM b WINDOW w AS (PARTITION BY instrument ORDER BY bar)
    ), m AS (
      SELECT instrument,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CAST(round(lhl * lhl + lhl2 * lhl2, 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS sb,
             CAST(sum(CAST(round(lsp * lsp, 9) AS DECIMAL(20,9)))
                  AS DOUBLE) AS sg
      FROM p WHERE lhl2 IS NOT NULL GROUP BY instrument
    ), a AS (
      SELECT instrument, n_pairs,
             (sqrt(2 * sb / n_pairs) - sqrt(sb / n_pairs))
               / {_3M2SQRT2}
             - sqrt(sg / n_pairs / {_3M2SQRT2}) AS alpha
      FROM m WHERE n_pairs > 0
    )
    SELECT instrument, n_pairs,
           round(alpha, 6) AS cs_alpha,
           round(2 * (exp(alpha) - 1) / (1 + exp(alpha)), 6)
             AS cs_spread
    FROM a
    """,
)
def trade_corwin_schultz(spark, sf_dir):
    """Corwin-Schultz: OHLC bars, one lead window per instrument,
    round-9 ln terms into DECIMAL pair sums, the closed alpha/spread
    chain (sqrt exact, exp at O(1))."""
    b = _ohlc(spark)
    w = W.partitionBy("instrument").orderBy("bar")
    hd = F.col("h").cast("double")
    ld = F.col("l").cast("double")
    h2 = F.lead("h").over(w).cast("double")
    l2 = F.lead("l").over(w).cast("double")
    p = b.select(
        "instrument",
        F.round(F.log(hd / ld), 9).alias("lhl"),
        F.round(F.log(h2 / l2), 9).alias("lhl2"),
        F.round(
            F.log(F.greatest(hd, h2) / F.least(ld, l2)), 9
        ).alias("lsp"),
    ).filter(F.col("lhl2").isNotNull())
    m = p.groupBy("instrument").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(
            F.round(
                F.col("lhl") * F.col("lhl")
                + F.col("lhl2") * F.col("lhl2"),
                9,
            ).cast("decimal(20,9)")
        )
        .cast("double")
        .alias("sb"),
        F.sum(
            F.round(F.col("lsp") * F.col("lsp"), 9).cast("decimal(20,9)")
        )
        .cast("double")
        .alias("sg"),
    )
    c = F.lit(float(_3M2SQRT2))
    beta = F.col("sb") / F.col("n_pairs")
    gamma = F.col("sg") / F.col("n_pairs")
    alpha = (F.sqrt(2 * beta) - F.sqrt(beta)) / c - F.sqrt(gamma / c)
    a = m.filter(F.col("n_pairs") > 0).select(
        "instrument", "n_pairs", alpha.alias("alpha")
    )
    return a.select(
        "instrument",
        "n_pairs",
        F.round("alpha", 6).alias("cs_alpha"),
        F.round(
            2 * (F.exp(F.col("alpha")) - 1) / (1 + F.exp(F.col("alpha"))),
            6,
        ).alias("cs_spread"),
    )


@query(
    "trade_orderflow_acf",
    # Lag-1 autocorrelation of the order-flow sign series (+1 buy,
    # -1 sell, 0 zero) per instrument — the classic order-flow
    # persistence measure (buys follow buys). Pure integer moments;
    # one closing rational chain.
    oracle=f"""
    WITH g AS ({_gen_sql(_N)}), s AS (
      SELECT instrument,
             CASE direction WHEN 'buy' THEN 1
                  WHEN 'sell' THEN -1 ELSE 0 END AS sg,
             lag(CASE direction WHEN 'buy' THEN 1
                  WHEN 'sell' THEN -1 ELSE 0 END)
               OVER (PARTITION BY instrument ORDER BY trade_seq) AS sp
      FROM g
    ), m AS (
      SELECT instrument,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(sg) AS BIGINT) AS sa,
             CAST(sum(sp) AS BIGINT) AS sb,
             CAST(sum(sg * sg) AS BIGINT) AS saa,
             CAST(sum(sp * sp) AS BIGINT) AS sbb,
             CAST(sum(sg * sp) AS BIGINT) AS sab
      FROM s WHERE sp IS NOT NULL GROUP BY instrument
    )
    SELECT instrument, n AS n_pairs,
           round((CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
                 / sqrt((CAST(n AS DOUBLE) * saa
                         - CAST(sa AS DOUBLE) * sa)
                        * (CAST(n AS DOUBLE) * sbb
                           - CAST(sb AS DOUBLE) * sb)), 6)
             AS flow_acf1
    FROM m
    WHERE (CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa) > 0
      AND (CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb) > 0
    """,
)
def trade_orderflow_acf(spark, sf_dir):
    """Order-flow sign ACF(1): one lag window over the tick sequence,
    six BIGINT moments per instrument, one Pearson chain (sqrt
    exact)."""
    df = _trades(spark)
    sg = (
        F.when(F.col("direction") == "buy", 1)
        .when(F.col("direction") == "sell", -1)
        .otherwise(0)
    )
    w = W.partitionBy("instrument").orderBy("trade_seq")
    s = df.select(
        "instrument", sg.alias("sg"), F.lag(sg).over(w).alias("sp")
    ).filter(F.col("sp").isNotNull())
    m = s.groupBy("instrument").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sg").cast("bigint").alias("sa"),
        F.sum("sp").cast("bigint").alias("sb"),
        F.sum(F.col("sg") * F.col("sg")).cast("bigint").alias("saa"),
        F.sum(F.col("sp") * F.col("sp")).cast("bigint").alias("sbb"),
        F.sum(F.col("sg") * F.col("sp")).cast("bigint").alias("sab"),
    )
    nd = F.col("n").cast("double")
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    saa, sbb = F.col("saa").cast("double"), F.col("sbb").cast("double")
    sab = F.col("sab").cast("double")
    da = nd * saa - sa * sa
    db = nd * sbb - sb * sb
    return m.filter((da > 0) & (db > 0)).select(
        "instrument",
        F.col("n").alias("n_pairs"),
        F.round((nd * sab - sa * sb) / F.sqrt(da * db), 6).alias(
            "flow_acf1"
        ),
    )
