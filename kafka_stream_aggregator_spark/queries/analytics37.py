"""Round-9 wave 48: cointegration, diffusion-curve fitting, and
sample entropy.

stat_engle_granger chains two existing disciplines: a BIGINT-moment
OLS (step 1) whose residuals are quantized DECIMAL(18,6) at birth
(the durbin-watson rule — residuals are the one place doubles would
otherwise enter a sum), then the Dickey-Fuller machinery of
ts_adf_test on the quantized series. events_bass_diffusion needs
quartic cumulative-adopter moments, which outgrow int64 (the
jarque-bera 1e31 lesson) — they are carried as exact DECIMAL(38,0)
products on Spark and HUGEINT on DuckDB, identical integers either
way. ts_sampen is all integer comparisons until one closing ln.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

_HV_SQL = """
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) FILTER (WHERE event_type = 'purchase')
                  AS BIGINT) AS y,
             CAST(count(*) FILTER (WHERE event_type = 'view')
                  AS BIGINT) AS x
      FROM events GROUP BY hr
"""


@query(
    "stat_engle_granger",
    # Engle-Granger two-step cointegration test between the hourly
    # purchase and view count series: (1) OLS y ~ x from BIGINT
    # moments; (2) Dickey-Fuller on the 6-dp-quantized residuals. A
    # strongly negative DF on the residuals = the two series share a
    # stochastic trend.
    oracle=f"""
    WITH hv AS ({_HV_SQL}), m1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy_,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM hv
    ), co AS (
      SELECT (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy_)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               AS b,
             (CAST(sy_ AS DOUBLE)
              - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy_)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sx) / n AS a
      FROM m1
      WHERE CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx <> 0
    ), e AS (
      SELECT hr,
             CAST(round(y - a - b * x, 6) AS DECIMAL(18,6)) AS r
      FROM hv CROSS JOIN co
    ), d AS (
      SELECT CAST(r - lag(r) OVER (ORDER BY hr) AS DOUBLE) AS dr,
             CAST(lag(r) OVER (ORDER BY hr) AS DOUBLE) AS rl
      FROM e
    ), m2 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(rl, 6) AS DECIMAL(24,6))) AS DOUBLE)
               AS srl,
             CAST(sum(CAST(round(dr, 6) AS DECIMAL(24,6))) AS DOUBLE)
               AS sdr,
             CAST(sum(CAST(round(rl * rl, 6) AS DECIMAL(28,6)))
                  AS DOUBLE) AS sll,
             CAST(sum(CAST(round(dr * dr, 6) AS DECIMAL(28,6)))
                  AS DOUBLE) AS sdd,
             CAST(sum(CAST(round(rl * dr, 6) AS DECIMAL(28,6)))
                  AS DOUBLE) AS sld
      FROM d WHERE rl IS NOT NULL
    ), f AS (
      SELECT n,
             (n * sld - srl * sdr) / (n * sll - srl * srl) AS g,
             n * sll - srl * srl AS dxx, sdr, srl, sld, sdd
      FROM m2 WHERE n > 2 AND n * sll - srl * srl <> 0
    ), s AS (
      SELECT n, g, dxx,
             sdd - ((sdr - g * srl) / n) * sdr - g * sld AS ssr
      FROM f
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(g, 6) AS gamma,
           round(g / sqrt((ssr / (n - 2)) * n / dxx), 6) AS eg_stat
    FROM s WHERE ssr > 0
    """,
)
def stat_engle_granger(spark, sf_dir):
    """Two-step cointegration: BIGINT-moment OLS, residuals quantized
    DECIMAL(18,6) at birth, round-6+DECIMAL moment sums of the
    residual series (durbin-watson magnitude rule), DF chain."""
    ev = t(spark, sf_dir, "events")
    hv = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 3600)
        .cast("bigint")
        .alias("hr")
    ).agg(
        F.count_if(F.col("event_type") == "purchase")
        .cast("bigint")
        .alias("y"),
        F.count_if(F.col("event_type") == "view")
        .cast("bigint")
        .alias("x"),
    )
    m1 = hv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy_"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy_").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    dxx1 = nd * sxx - sx * sx
    b = (nd * sxy - sx * sy) / dxx1
    co = m1.filter(dxx1 != 0).select(
        b.alias("b"), ((sy - b * sx) / nd).alias("a")
    )
    e = hv.crossJoin(F.broadcast(co)).select(
        "hr",
        F.round(
            F.col("y") - F.col("a") - F.col("b") * F.col("x"), 6
        )
        .cast("decimal(18,6)")
        .alias("r"),
    )
    w = W.orderBy("hr")
    d = e.select(
        (F.col("r") - F.lag("r").over(w)).cast("double").alias("dr"),
        F.lag("r").over(w).cast("double").alias("rl"),
    ).filter(F.col("rl").isNotNull())

    def q6(col, prec):
        return F.sum(F.round(col, 6).cast(f"decimal({prec},6)")).cast(
            "double"
        )

    m2 = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        q6(F.col("rl"), 24).alias("srl"),
        q6(F.col("dr"), 24).alias("sdr"),
        q6(F.col("rl") * F.col("rl"), 28).alias("sll"),
        q6(F.col("dr") * F.col("dr"), 28).alias("sdd"),
        q6(F.col("rl") * F.col("dr"), 28).alias("sld"),
    )
    n2 = F.col("n")
    dxx = n2 * F.col("sll") - F.col("srl") * F.col("srl")
    g = (n2 * F.col("sld") - F.col("srl") * F.col("sdr")) / dxx
    f = m2.filter((n2 > 2) & (dxx != 0)).select(
        "n",
        g.alias("g"),
        dxx.alias("dxx"),
        "sdr",
        "srl",
        "sld",
        "sdd",
    )
    ssr = (
        F.col("sdd")
        - ((F.col("sdr") - F.col("g") * F.col("srl")) / F.col("n"))
        * F.col("sdr")
        - F.col("g") * F.col("sld")
    )
    s = f.select("n", "g", "dxx", ssr.alias("ssr"))
    return s.filter(F.col("ssr") > 0).select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.round("g", 6).alias("gamma"),
        F.round(
            F.col("g")
            / F.sqrt(
                (F.col("ssr") / (F.col("n") - 2))
                * F.col("n")
                / F.col("dxx")
            ),
            6,
        ).alias("eg_stat"),
    )


@query(
    "events_bass_diffusion",
    # Bass diffusion fit on the customer-acquisition curve: monthly
    # NEW customers (month of first order, a 7-year span) regressed
    # on cumulative adopters N_{t-1} and N_{t-1}^2 (the
    # discrete Bass identity n = pM + (q-p)N - (q/M)N^2). The N^4
    # moment outruns int64, so every quartic product is an exact
    # DECIMAL(38,0)/HUGEINT integer. Implied market size M is the
    # positive root of the fitted quadratic.
    oracle="""
    WITH first_seen AS (
      SELECT o_custkey,
             CAST(min(year(o_orderdate) * 12 + month(o_orderdate))
                  AS BIGINT) AS day
      FROM orders GROUP BY o_custkey
    ), daily AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_new
      FROM first_seen GROUP BY day
    ), cum AS (
      SELECT day, n_new,
             CAST(coalesce(sum(n_new) OVER (ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS nprev
      FROM daily
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(n_new) AS BIGINT) AS sy_,
             CAST(sum(nprev) AS BIGINT) AS sa,
             CAST(sum(CAST(nprev AS HUGEINT) * nprev) AS HUGEINT) AS sb,
             CAST(sum(CAST(nprev AS HUGEINT) * nprev * nprev)
                  AS HUGEINT) AS sab,
             CAST(sum(CAST(nprev AS HUGEINT) * nprev * nprev * nprev)
                  AS HUGEINT) AS sbb,
             CAST(sum(CAST(nprev AS HUGEINT) * n_new) AS HUGEINT)
               AS say,
             CAST(sum(CAST(nprev AS HUGEINT) * nprev * n_new)
                  AS HUGEINT) AS sby
      FROM cum WHERE nprev > 0
    ), r AS (
      SELECT n, sy_, say, sby,
        CAST(n AS DOUBLE) * (CAST(sb AS DOUBLE) * CAST(sbb AS DOUBLE)
                             - CAST(sab AS DOUBLE) * CAST(sab AS DOUBLE))
        - CAST(sa AS DOUBLE) * (CAST(sa AS DOUBLE) * CAST(sbb AS DOUBLE)
                                - CAST(sab AS DOUBLE) * CAST(sb AS DOUBLE))
        + CAST(sb AS DOUBLE) * (CAST(sa AS DOUBLE) * CAST(sab AS DOUBLE)
                                - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
          AS d,
        CAST(sy_ AS DOUBLE) * (CAST(sb AS DOUBLE) * CAST(sbb AS DOUBLE)
                               - CAST(sab AS DOUBLE) * CAST(sab AS DOUBLE))
        - CAST(sa AS DOUBLE) * (CAST(say AS DOUBLE) * CAST(sbb AS DOUBLE)
                                - CAST(sab AS DOUBLE) * CAST(sby AS DOUBLE))
        + CAST(sb AS DOUBLE) * (CAST(say AS DOUBLE) * CAST(sab AS DOUBLE)
                                - CAST(sb AS DOUBLE) * CAST(sby AS DOUBLE))
          AS d0,
        CAST(n AS DOUBLE) * (CAST(say AS DOUBLE) * CAST(sbb AS DOUBLE)
                             - CAST(sab AS DOUBLE) * CAST(sby AS DOUBLE))
        - CAST(sy_ AS DOUBLE) * (CAST(sa AS DOUBLE) * CAST(sbb AS DOUBLE)
                                 - CAST(sab AS DOUBLE) * CAST(sb AS DOUBLE))
        + CAST(sb AS DOUBLE) * (CAST(sa AS DOUBLE) * CAST(sby AS DOUBLE)
                                - CAST(say AS DOUBLE) * CAST(sb AS DOUBLE))
          AS d1,
        CAST(n AS DOUBLE) * (CAST(sb AS DOUBLE) * CAST(sby AS DOUBLE)
                             - CAST(say AS DOUBLE) * CAST(sab AS DOUBLE))
        - CAST(sa AS DOUBLE) * (CAST(sa AS DOUBLE) * CAST(sby AS DOUBLE)
                                - CAST(say AS DOUBLE) * CAST(sb AS DOUBLE))
        + CAST(sy_ AS DOUBLE) * (CAST(sa AS DOUBLE) * CAST(sab AS DOUBLE)
                                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
          AS d2
      FROM m WHERE n > 3
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(d0 / d, 6) + 0.0 AS c0,
           round(d1 / d, 6) + 0.0 AS c1,
           round(d2 / d, 6) + 0.0 AS c2,
           round(CASE WHEN d2 / d < 0
                      AND (d1 / d) * (d1 / d)
                          - 4 * (d2 / d) * (d0 / d) >= 0
                 THEN (-(d1 / d) - sqrt((d1 / d) * (d1 / d)
                       - 4 * (d2 / d) * (d0 / d))) / (2 * (d2 / d))
                 END, 6) + 0.0 AS m_implied
    FROM r WHERE d <> 0
    """,
)
def events_bass_diffusion(spark, sf_dir):
    """Bass curve: first-order month per customer -> monthly adopters ->
    quadratic OLS via Cramer 3x3 on exact integer moments (quartics
    in DECIMAL(38,0)); M from the quadratic root (sqrt exact)."""
    orders = t(spark, sf_dir, "orders")
    first_seen = orders.groupBy("o_custkey").agg(
        F.min(
            F.year("o_orderdate") * 12 + F.month("o_orderdate")
        ).cast("bigint").alias("day")
    )
    daily = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, -1)
    cum = daily.select(
        "day",
        "n_new",
        F.coalesce(F.sum("n_new").over(w), F.lit(0))
        .cast("bigint")
        .alias("nprev"),
    ).filter(F.col("nprev") > 0)
    np_ = F.col("nprev").cast("decimal(38,0)")
    m = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_new").cast("bigint").alias("sy_"),
        F.sum("nprev").cast("bigint").alias("sa"),
        F.sum(np_ * F.col("nprev")).cast("decimal(38,0)").alias("sb"),
        F.sum(np_ * F.col("nprev") * F.col("nprev"))
        .cast("decimal(38,0)")
        .alias("sab"),
        F.sum(np_ * F.col("nprev") * F.col("nprev") * F.col("nprev"))
        .cast("decimal(38,0)")
        .alias("sbb"),
        F.sum(np_ * F.col("n_new")).cast("decimal(38,0)").alias("say"),
        F.sum(np_ * F.col("nprev") * F.col("n_new"))
        .cast("decimal(38,0)")
        .alias("sby"),
    )
    nd = F.col("n").cast("double")
    sa, sy = F.col("sa").cast("double"), F.col("sy_").cast("double")
    sb, sab = F.col("sb").cast("double"), F.col("sab").cast("double")
    sbb = F.col("sbb").cast("double")
    say, sby = F.col("say").cast("double"), F.col("sby").cast("double")
    d = (
        nd * (sb * sbb - sab * sab)
        - sa * (sa * sbb - sab * sb)
        + sb * (sa * sab - sb * sb)
    )
    d0 = (
        sy * (sb * sbb - sab * sab)
        - sa * (say * sbb - sab * sby)
        + sb * (say * sab - sb * sby)
    )
    d1 = (
        nd * (say * sbb - sab * sby)
        - sy * (sa * sbb - sab * sb)
        + sb * (sa * sby - say * sb)
    )
    d2 = (
        nd * (sb * sby - say * sab)
        - sa * (sa * sby - say * sb)
        + sy * (sa * sab - sb * sb)
    )
    r = m.filter(F.col("n") > 3).select(
        "n", d.alias("d"), d0.alias("d0"), d1.alias("d1"), d2.alias("d2")
    )
    c0 = F.col("d0") / F.col("d")
    c1 = F.col("d1") / F.col("d")
    c2 = F.col("d2") / F.col("d")
    disc = c1 * c1 - 4 * c2 * c0
    # + 0.0 post-round: signed coefficients can round to zero from
    # below, where DuckDB emits -0.0 and Spark +0.0 (the r11 sf1
    # sweep caught c2 doing exactly this; ROUND11_AUDIT_negzero.md).
    return r.filter(F.col("d") != 0).select(
        F.col("n").cast("bigint").alias("n_days"),
        (F.round(c0, 6) + 0.0).alias("c0"),
        (F.round(c1, 6) + 0.0).alias("c1"),
        (F.round(c2, 6) + 0.0).alias("c2"),
        (
            F.round(
                F.when(
                    (c2 < 0) & (disc >= 0),
                    (-c1 - F.sqrt(disc)) / (2 * c2),
                ),
                6,
            )
            + 0.0
        ).alias("m_implied"),
    )


@query(
    "ts_sampen",
    # Sample entropy (m = 2, integer tolerance r = max(1,
    # (max-min)//20)) of the daily event-count series: template
    # matching is pure integer comparisons over the day-pair join
    # (bounded: days^2 pairs), SampEn = -ln(A/B) closes at O(1).
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS z
      FROM events GROUP BY day
    ), s AS (
      SELECT row_number() OVER (ORDER BY day) AS i, z,
             lead(z, 1) OVER (ORDER BY day) AS z1,
             lead(z, 2) OVER (ORDER BY day) AS z2
      FROM daily
    ), tol AS (
      SELECT greatest(1, (max(z) - min(z)) // 20) AS r FROM daily
    ), pairs AS (
      SELECT CASE WHEN abs(a.z - b.z) <= r AND abs(a.z1 - b.z1) <= r
                  THEN 1 ELSE 0 END AS bm,
             CASE WHEN abs(a.z - b.z) <= r AND abs(a.z1 - b.z1) <= r
                       AND abs(a.z2 - b.z2) <= r
                  THEN 1 ELSE 0 END AS am
      FROM s a JOIN s b ON a.i < b.i CROSS JOIN tol
      WHERE a.z2 IS NOT NULL AND b.z2 IS NOT NULL
    )
    SELECT CAST(sum(bm) AS BIGINT) AS n_template_matches,
           CAST(sum(am) AS BIGINT) AS n_extended_matches,
           round(-ln(CAST(sum(am) AS DOUBLE) / sum(bm)), 6) AS sampen
    FROM pairs
    HAVING sum(bm) > 0 AND sum(am) > 0
    """,
)
def ts_sampen(spark, sf_dir):
    """SampEn(2, r): one daily aggregate, two leads, a bounded
    day-pair self-join of integer comparisons, one closing ln."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 86400)
        .cast("bigint")
        .alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("z"))
    w = W.orderBy("day")
    s = daily.select(
        F.row_number().over(w).alias("i"),
        "z",
        F.lead("z", 1).over(w).alias("z1"),
        F.lead("z", 2).over(w).alias("z2"),
    ).filter(F.col("z2").isNotNull())
    tol = daily.agg(
        F.greatest(
            F.lit(1),
            F.floor((F.max("z") - F.min("z")) / 20).cast("bigint"),
        ).alias("r")
    )
    a = s.select(
        F.col("i").alias("ia"),
        F.col("z").alias("za"),
        F.col("z1").alias("za1"),
        F.col("z2").alias("za2"),
    )
    b = s.select(
        F.col("i").alias("ib"),
        F.col("z").alias("zb"),
        F.col("z1").alias("zb1"),
        F.col("z2").alias("zb2"),
    )
    pm = (F.abs(F.col("za") - F.col("zb")) <= F.col("r")) & (
        F.abs(F.col("za1") - F.col("zb1")) <= F.col("r")
    )
    am = pm & (F.abs(F.col("za2") - F.col("zb2")) <= F.col("r"))
    pairs = (
        a.join(b, F.col("ia") < F.col("ib"))
        .crossJoin(F.broadcast(tol))
        .select(
            F.when(pm, 1).otherwise(0).alias("bm"),
            F.when(am, 1).otherwise(0).alias("am"),
        )
    )
    out = pairs.agg(
        F.sum("bm").cast("bigint").alias("n_template_matches"),
        F.sum("am").cast("bigint").alias("n_extended_matches"),
    )
    return out.filter(
        (F.col("n_template_matches") > 0)
        & (F.col("n_extended_matches") > 0)
    ).select(
        "n_template_matches",
        "n_extended_matches",
        F.round(
            -F.log(
                F.col("n_extended_matches").cast("double")
                / F.col("n_template_matches")
            ),
            6,
        ).alias("sampen"),
    )
