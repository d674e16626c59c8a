"""Round-8 wave 44: Granger causality (1 lag) between event streams.

Does the hourly 'view' count Granger-cause the hourly 'purchase'
count? Restricted model: p_t ~ p_{t-1}; unrestricted adds v_{t-1}.
Every moment (n, Sy, Sa, Sb, Syy, Saa, Sbb, Say, Sby, Sab) is a pure
BIGINT sum over the bounded hourly relation; the 2x2 and 3x3 normal
equations are solved by Cramer's rule with the determinant expansions
written as the SAME literal chains on both engines (double arithmetic
on exact integer inputs — IEEE-identical), so coefficients, SSRs and
the F statistic cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "stat_granger_1lag",
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS p,
             CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS v
      FROM events GROUP BY hr
    ), lagged AS (
      SELECT p AS y,
             lag(p) OVER (ORDER BY hr) AS a,
             lag(v) OVER (ORDER BY hr) AS b
      FROM hourly
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy_,
             CAST(sum(a) AS BIGINT) AS sa,
             CAST(sum(b) AS BIGINT) AS sb,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(a * a) AS BIGINT) AS saa,
             CAST(sum(b * b) AS BIGINT) AS sbb,
             CAST(sum(a * y) AS BIGINT) AS say,
             CAST(sum(b * y) AS BIGINT) AS sby,
             CAST(sum(a * b) AS BIGINT) AS sab
      FROM lagged WHERE a IS NOT NULL AND b IS NOT NULL
    ), r AS (
      SELECT n, syy, sy_, say, sby,
        CAST(n AS DOUBLE) * (CAST(saa AS DOUBLE) * sbb
                             - CAST(sab AS DOUBLE) * sab)
        - CAST(sa AS DOUBLE) * (CAST(sa AS DOUBLE) * sbb
                                - CAST(sab AS DOUBLE) * sb)
        + CAST(sb AS DOUBLE) * (CAST(sa AS DOUBLE) * sab
                                - CAST(saa AS DOUBLE) * sb) AS d,
        CAST(sy_ AS DOUBLE) * (CAST(saa AS DOUBLE) * sbb
                               - CAST(sab AS DOUBLE) * sab)
        - CAST(sa AS DOUBLE) * (CAST(say AS DOUBLE) * sbb
                                - CAST(sab AS DOUBLE) * sby)
        + CAST(sb AS DOUBLE) * (CAST(say AS DOUBLE) * sab
                                - CAST(saa AS DOUBLE) * sby) AS d0,
        CAST(n AS DOUBLE) * (CAST(say AS DOUBLE) * sbb
                             - CAST(sab AS DOUBLE) * sby)
        - CAST(sy_ AS DOUBLE) * (CAST(sa AS DOUBLE) * sbb
                                 - CAST(sab AS DOUBLE) * sb)
        + CAST(sb AS DOUBLE) * (CAST(sa AS DOUBLE) * sby
                                - CAST(say AS DOUBLE) * sb) AS d1,
        CAST(n AS DOUBLE) * (CAST(saa AS DOUBLE) * sby
                             - CAST(say AS DOUBLE) * sab)
        - CAST(sa AS DOUBLE) * (CAST(sa AS DOUBLE) * sby
                                - CAST(say AS DOUBLE) * sb)
        + CAST(sy_ AS DOUBLE) * (CAST(sa AS DOUBLE) * sab
                                 - CAST(saa AS DOUBLE) * sb) AS d2,
        CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa AS dr,
        CAST(n AS DOUBLE) * say - CAST(sa AS DOUBLE) * sy_ AS nr,
        sa
      FROM m WHERE n > 3
    ), f AS (
      SELECT n,
             syy - (d0 / d) * sy_ - (d1 / d) * say - (d2 / d) * sby
               AS ssr_u,
             syy - ((sy_ - (nr / dr) * sa) / n) * sy_
                 - (nr / dr) * say AS ssr_r
      FROM r WHERE d <> 0 AND dr <> 0
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(ssr_r, 6) AS ssr_restricted,
           round(ssr_u, 6) AS ssr_unrestricted,
           round((ssr_r - ssr_u) * (n - 3) / ssr_u, 6) AS f_granger
    FROM f WHERE ssr_u > 0
    """,
)
def stat_granger_1lag(spark, sf_dir):
    """Granger F(1, n-3): one hourly aggregate (conditional counts per
    hour), two lags, ten BIGINT moments, Cramer-rule chains."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 3600)
        .cast("bigint")
        .alias("hr")
    ).agg(
        F.count_if(F.col("event_type") == "purchase")
        .cast("bigint")
        .alias("p"),
        F.count_if(F.col("event_type") == "view")
        .cast("bigint")
        .alias("v"),
    )
    w = W.orderBy("hr")
    lagged = hourly.select(
        F.col("p").alias("y"),
        F.lag("p").over(w).alias("a"),
        F.lag("v").over(w).alias("b"),
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    m = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy_"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("bigint").alias("sbb"),
        F.sum(F.col("a") * F.col("y")).cast("bigint").alias("say"),
        F.sum(F.col("b") * F.col("y")).cast("bigint").alias("sby"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("sab"),
    )
    nd = F.col("n").cast("double")
    sa, sb, sy = (
        F.col("sa").cast("double"),
        F.col("sb").cast("double"),
        F.col("sy_").cast("double"),
    )
    saa, sbb, sab = (
        F.col("saa").cast("double"),
        F.col("sbb").cast("double"),
        F.col("sab").cast("double"),
    )
    say, sby = F.col("say").cast("double"), F.col("sby").cast("double")
    d = (
        nd * (saa * sbb - sab * sab)
        - sa * (sa * sbb - sab * sb)
        + sb * (sa * sab - saa * sb)
    )
    d0 = (
        sy * (saa * sbb - sab * sab)
        - sa * (say * sbb - sab * sby)
        + sb * (say * sab - saa * sby)
    )
    d1 = (
        nd * (say * sbb - sab * sby)
        - sy * (sa * sbb - sab * sb)
        + sb * (sa * sby - say * sb)
    )
    d2 = (
        nd * (saa * sby - say * sab)
        - sa * (sa * sby - say * sb)
        + sy * (sa * sab - saa * sb)
    )
    dr = nd * saa - sa * sa
    nr = nd * say - sa * sy
    r = m.filter(F.col("n") > 3).select(
        "n",
        "syy",
        "sy_",
        "say",
        "sby",
        "sa",
        d.alias("d"),
        d0.alias("d0"),
        d1.alias("d1"),
        d2.alias("d2"),
        dr.alias("dr"),
        nr.alias("nr"),
    )
    ssr_u = (
        F.col("syy")
        - (F.col("d0") / F.col("d")) * F.col("sy_")
        - (F.col("d1") / F.col("d")) * F.col("say")
        - (F.col("d2") / F.col("d")) * F.col("sby")
    )
    ssr_r = (
        F.col("syy")
        - (
            (
                F.col("sy_")
                - (F.col("nr") / F.col("dr")) * F.col("sa")
            )
            / F.col("n")
        )
        * F.col("sy_")
        - (F.col("nr") / F.col("dr")) * F.col("say")
    )
    f = (
        r.filter((F.col("d") != 0) & (F.col("dr") != 0))
        .select(
            "n", ssr_u.alias("ssr_u"), ssr_r.alias("ssr_r")
        )
        .filter(F.col("ssr_u") > 0)
    )
    return f.select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.round("ssr_r", 6).alias("ssr_restricted"),
        F.round("ssr_u", 6).alias("ssr_unrestricted"),
        F.round(
            (F.col("ssr_r") - F.col("ssr_u"))
            * (F.col("n") - 3)
            / F.col("ssr_u"),
            6,
        ).alias("f_granger"),
    )
