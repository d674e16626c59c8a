"""Statistics wave 6 (round 8): McNemar, Cochran-Armitage trend,
Bartlett variance homogeneity, Ljung-Box portmanteau, and the
logistic-regression IRLS twin of ml_poisson_irls.

House determinism discipline throughout: every moment is an exact
integer/DECIMAL sum; libm appears only in final bounded-magnitude
chains (or is 6-dp-quantized per docs/ROUND9_AUDIT_r08.md before any
term algebra); nothing order-dependent ever feeds a round.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


# --------------------------------------------------------------------------
# McNemar's test (paired binary: did-view vs did-purchase per user)
# --------------------------------------------------------------------------


@query(
    "stat_mcnemar",
    # Paired binaries at (user, day) grain — did-purchase vs
    # did-signup that day (user grain is fully concordant on this
    # testdata: every user has every type). Discordant cells b/c are
    # exact BIGINTs; the continuity-corrected statistic
    # (|b-c|-1)^2/(b+c) is one division.
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS dy,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT)
    )
    SELECT CAST(count_if(x = 1 AND y = 0) AS BIGINT) AS b,
           CAST(count_if(x = 0 AND y = 1) AS BIGINT) AS c,
           round(CAST((abs(count_if(x = 1 AND y = 0)
                           - count_if(x = 0 AND y = 1)) - 1)
                      * (abs(count_if(x = 1 AND y = 0)
                             - count_if(x = 0 AND y = 1)) - 1) AS DOUBLE)
                 / (count_if(x = 1 AND y = 0)
                    + count_if(x = 0 AND y = 1)), 6) AS chi2_cc
    FROM u
    """,
)
def stat_mcnemar(spark, sf_dir):
    """McNemar on paired per-(user, day) binaries: one cell-grain
    aggregate (map-side combinable), one 1-row reduce — the b/c
    discordant cells are exact BIGINTs, chi2 is a single division."""
    ev = t(spark, sf_dir, "events")
    dy = F.floor(F.col("ts").cast("double") / 86400).cast("bigint")
    u = ev.groupBy("user_id", dy.alias("dy")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    b = F.count_if((F.col("x") == 1) & (F.col("y") == 0))
    c = F.count_if((F.col("x") == 0) & (F.col("y") == 1))
    d = F.abs(b - c) - 1
    return u.agg(
        b.cast("bigint").alias("b"),
        c.cast("bigint").alias("c"),
        F.round((d * d).cast("double") / (b + c), 6).alias("chi2_cc"),
    )


# --------------------------------------------------------------------------
# Cochran-Armitage trend test (purchase rate across hour-of-day quartiles)
# --------------------------------------------------------------------------


@query(
    "stat_cochran_armitage",
    # Ordered exposure groups = hour-of-day quartile (scores 0..3),
    # success = purchase. All five moments are BIGINTs; T, Var and Z
    # are one identical double chain on them.
    oracle="""
    WITH e AS (
      SELECT CAST((CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24) // 6
                  AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS r,
             CAST(sum(s * y) AS BIGINT) AS ssr,
             CAST(sum(s) AS BIGINT) AS ssn,
             CAST(sum(s * s) AS BIGINT) AS ss2n
      FROM e
    )
    SELECT n, r, ssr, ssn, ss2n,
           round((ssr - CAST(r AS DOUBLE) / n * ssn)
                 / sqrt((CAST(r AS DOUBLE) / n)
                        * (1.0 - CAST(r AS DOUBLE) / n)
                        * (ss2n - CAST(ssn AS DOUBLE) * ssn / n)), 6)
             AS z_trend
    FROM m
    """,
)
def stat_cochran_armitage(spark, sf_dir):
    """Cochran-Armitage: ONE scan building five integer moments (the
    dose scores fold into the sums), then the Z chain on the 1-row
    aggregate — no per-group relation ever materializes."""
    ev = t(spark, sf_dir, "events")
    s = (
        (F.floor(F.col("ts").cast("double") / 3600).cast("bigint") % 24)
        / F.lit(6)
    ).cast("bigint")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    e = ev.select(s.alias("s"), y.alias("y"))
    m = e.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("r"),
        F.sum(F.col("s") * F.col("y")).cast("bigint").alias("ssr"),
        F.sum("s").cast("bigint").alias("ssn"),
        F.sum(F.col("s") * F.col("s")).cast("bigint").alias("ss2n"),
    )
    p = F.col("r").cast("double") / F.col("n")
    tstat = F.col("ssr") - p * F.col("ssn")
    var = (
        p
        * (1.0 - p)
        * (
            F.col("ss2n")
            - F.col("ssn").cast("double") * F.col("ssn") / F.col("n")
        )
    )
    return m.select(
        "n",
        "r",
        "ssr",
        "ssn",
        "ss2n",
        F.round(tstat / F.sqrt(var), 6).alias("z_trend"),
    )


# --------------------------------------------------------------------------
# Bartlett's test for variance homogeneity of value across event types
# --------------------------------------------------------------------------


@query(
    "stat_bartlett",
    # Group variances from exact DECIMAL sums of round(value,6) and
    # its exact 12-dp square; the ln terms (magnitude ~|ln var| < 20)
    # sum round-9 in DECIMAL over the k=|event types| bounded relation.
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) AS sx,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))
                      * CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) AS sxx
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    ), v AS (
      SELECT event_type, n, sx, sxx,
             (sxx - sx * sx / n) / (n - 1) AS s2
      FROM g WHERE n > 1
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(CAST(round((n - 1) * ln(s2), 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS sln,
             CAST(sum(CAST(round(1.0 / (n - 1), 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS sinv,
             -- pooled variance from the same exact group moments
             (sum(sxx) - sum(sx * sx / n)) / (sum(n) - count(*)) AS sp2
      FROM v
    )
    SELECT k, nn,
           round(((nn - k) * ln(sp2) - sln)
                 / (1.0 + (sinv - 1.0 / (nn - k)) / (3.0 * (k - 1))), 6)
             AS bartlett_chi2
    FROM m
    """,
)
def stat_bartlett(spark, sf_dir):
    """Bartlett's chi2: one group aggregate of exact decimal moments,
    then a k-row (bounded) reduce whose only float folds are round-9
    DECIMAL sums of small ln terms."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = F.round("value", 6).cast("decimal(18,6)")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
    ).filter(F.col("n") > 1)
    s2 = (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (
        F.col("n") - 1
    )
    v = g.select("n", "sx", "sxx", s2.alias("s2"))
    m = v.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum(
            F.round((F.col("n") - 1) * F.log("s2"), 9).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("sln"),
        F.sum(F.round(1.0 / (F.col("n") - 1), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("sinv"),
        (
            (F.sum("sxx") - F.sum(F.col("sx") * F.col("sx") / F.col("n")))
            / (F.sum("n") - F.count("*"))
        ).alias("sp2"),
    )
    chi2 = ((F.col("nn") - F.col("k")) * F.log("sp2") - F.col("sln")) / (
        1.0
        + (F.col("sinv") - 1.0 / (F.col("nn") - F.col("k")))
        / (3.0 * (F.col("k") - 1))
    )
    return m.select("k", "nn", F.round(chi2, 6).alias("bartlett_chi2"))


# --------------------------------------------------------------------------
# Ljung-Box portmanteau test on the hourly count series per event type
# --------------------------------------------------------------------------


@query(
    "stat_ljung_box",
    # Q_LB at h=3 on the observed hourly-count sequence (ordered by
    # hour, gaps ignored by definition — documented). Counts are
    # integers, so every co-moment (head/tail/cross sums per lag) is a
    # BIGINT and the rho/Q arithmetic is one deterministic chain.
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, c,
             lag(c, 1) OVER w AS c1,
             lag(c, 2) OVER w AS c2,
             lag(c, 3) OVER w AS c3
      FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    ), m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS sq,
             CAST(sum(c * c1) AS BIGINT) AS x1,
             CAST(sum(CASE WHEN c1 IS NOT NULL THEN c1 END) AS BIGINT) AS h1,
             CAST(sum(CASE WHEN c1 IS NOT NULL THEN c END) AS BIGINT) AS t1,
             CAST(sum(c * c2) AS BIGINT) AS x2,
             CAST(sum(CASE WHEN c2 IS NOT NULL THEN c2 END) AS BIGINT) AS h2,
             CAST(sum(CASE WHEN c2 IS NOT NULL THEN c END) AS BIGINT) AS t2,
             CAST(sum(c * c3) AS BIGINT) AS x3,
             CAST(sum(CASE WHEN c3 IS NOT NULL THEN c3 END) AS BIGINT) AS h3,
             CAST(sum(CASE WHEN c3 IS NOT NULL THEN c END) AS BIGINT) AS t3
      FROM lagged GROUP BY event_type
    )
    SELECT event_type, n,
           round(n * (n + 2.0) * (
             pow((x1 - (CAST(s AS DOUBLE)/n)*(h1+t1)
                   + (n-1)*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n))
                 / (sq - n*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n)), 2)
               / (n - 1)
           + pow((x2 - (CAST(s AS DOUBLE)/n)*(h2+t2)
                   + (n-2)*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n))
                 / (sq - n*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n)), 2)
               / (n - 2)
           + pow((x3 - (CAST(s AS DOUBLE)/n)*(h3+t3)
                   + (n-3)*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n))
                 / (sq - n*(CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n)), 2)
               / (n - 3)), 6) AS q_lb
    FROM m WHERE n > 3
    """,
)
def stat_ljung_box(spark, sf_dir):
    """Ljung-Box Q(h=3): the only data-sized stage is the hour-grain
    count; three lag columns over the tiny per-type hourly relation
    give BIGINT co-moments, and Q is a closed-form chain on them."""
    ev = t(spark, sf_dir, "events")
    hr = F.floor(F.col("ts").cast("double") / 3600).cast("bigint")
    hourly = ev.groupBy("event_type", hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("event_type").orderBy("hr")
    lagged = hourly.select(
        "event_type",
        "c",
        *[F.lag("c", k).over(w).alias(f"c{k}") for k in (1, 2, 3)],
    )
    aggs = [
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sq"),
    ]
    for k in (1, 2, 3):
        ck = F.col(f"c{k}")
        aggs += [
            F.sum(F.col("c") * ck).cast("bigint").alias(f"x{k}"),
            F.sum(F.when(ck.isNotNull(), ck)).cast("bigint").alias(f"h{k}"),
            F.sum(F.when(ck.isNotNull(), F.col("c")))
            .cast("bigint")
            .alias(f"t{k}"),
        ]
    m = lagged.groupBy("event_type").agg(*aggs)
    mean = F.col("s").cast("double") / F.col("n")
    c0 = F.col("sq") - F.col("n") * mean * mean

    def rho(k):
        return (
            F.col(f"x{k}")
            - mean * (F.col(f"h{k}") + F.col(f"t{k}"))
            + (F.col("n") - k) * mean * mean
        ) / c0

    q = (
        F.col("n")
        * (F.col("n") + 2.0)
        * sum(F.pow(rho(k), 2) / (F.col("n") - k) for k in (1, 2, 3))
    )
    return m.filter(F.col("n") > 3).select(
        "event_type", "n", F.round(q, 6).alias("q_lb")
    )


# --------------------------------------------------------------------------
# Logistic regression, two unrolled IRLS iterations (poisson twin)
# --------------------------------------------------------------------------


@query(
    "ml_logreg_irls",
    # P(user purchases | view count), logit link, beta = (0,0) start.
    # Iteration 1 is EXACT: mu = 1/2 => w = 1/4 constant cancels and
    # z = 4y - 2 is an integer, so the weighted OLS collapses to
    # integer moments. Iteration 2 quantizes mu = round(sigmoid, 6)
    # clamped to [1e-6, 1-1e-6] BEFORE any term algebra
    # (docs/ROUND9_AUDIT_r08.md rule), making every term a
    # deterministic product; terms stay < 1e3 so round-9+DECIMAL is
    # magnitude-safe.
    oracle="""
    WITH d AS (
      SELECT user_id,
             CAST(CASE WHEN count_if(event_type = 'purchase') > 0
                  THEN 1 ELSE 0 END AS BIGINT) AS y,
             CAST(count_if(event_type = 'view') AS BIGINT) AS x
      FROM events GROUP BY user_id
    ), m1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(4 * y - 2) AS BIGINT) AS sz,
             CAST(sum(x * (4 * y - 2)) AS BIGINT) AS sxz
      FROM d
    ), b1 AS (
      SELECT (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
             (CAST(sz AS DOUBLE)
              - (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sx) / n AS a
      FROM m1
    ), tq AS (
      SELECT d.x, d.y, b1.a, b1.b,
             greatest(least(round(1.0 / (1.0 + exp(-(b1.a + b1.b * d.x))),
                                  6), 0.999999), 0.000001) AS mu
      FROM d, b1
    ), t2 AS (
      SELECT x, a, b,
             round(mu * (1 - mu), 9) AS w,
             round(mu * (1 - mu) * x, 9) AS wx,
             round(mu * (1 - mu) * x * x, 9) AS wxx,
             round(mu * (1 - mu)
                   * ((a + b * x) + (y - mu) / (mu * (1 - mu))), 9) AS wz,
             round(mu * (1 - mu) * x
                   * ((a + b * x) + (y - mu) / (mu * (1 - mu))), 9) AS wxz
      FROM tq
    ), m2 AS (
      SELECT max(a) AS a1, max(b) AS b1v,
             CAST(sum(CAST(w AS DECIMAL(30,9))) AS DOUBLE) AS sw,
             CAST(sum(CAST(wx AS DECIMAL(30,9))) AS DOUBLE) AS swx,
             CAST(sum(CAST(wxx AS DECIMAL(30,9))) AS DOUBLE) AS swxx,
             CAST(sum(CAST(wz AS DECIMAL(30,9))) AS DOUBLE) AS swz,
             CAST(sum(CAST(wxz AS DECIMAL(30,9))) AS DOUBLE) AS swxz
      FROM t2
    )
    SELECT round(a1, 6) AS intercept_iter1, round(b1v, 6) AS coef_iter1,
           round((sw * swxz - swx * swz) / (sw * swxx - swx * swx), 6)
             AS coef_iter2,
           round((swz - (sw * swxz - swx * swz)
                        / (sw * swxx - swx * swx) * swx) / sw, 6)
             AS intercept_iter2
    FROM m2
    """,
)
def ml_logreg_irls(spark, sf_dir):
    """Logistic IRLS as bounded scans (the ml_poisson_irls shape): each
    iteration one map-combinable moments aggregate with the scalar
    coefficients broadcast — no driver-side data movement."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy("user_id").agg(
        F.when(F.count_if(F.col("event_type") == "purchase") > 0, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("y"),
        F.count_if(F.col("event_type") == "view").cast("bigint").alias("x"),
    )
    z1 = 4 * F.col("y") - 2
    m1 = d.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(z1).cast("bigint").alias("sz"),
        F.sum(F.col("x") * z1).cast("bigint").alias("sxz"),
    )
    nn = F.col("n").cast("double")
    bb = (nn * F.col("sxz") - F.col("sx").cast("double") * F.col("sz")) / (
        nn * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    b1 = m1.select(
        bb.alias("b"),
        ((F.col("sz").cast("double") - bb * F.col("sx")) / F.col("n")).alias(
            "a"
        ),
    )
    eta = F.col("a") + F.col("b") * F.col("x")
    tq = d.crossJoin(F.broadcast(b1)).select(
        "x",
        "y",
        "a",
        "b",
        F.greatest(
            F.least(
                F.round(1.0 / (1.0 + F.exp(-eta)), 6), F.lit(0.999999)
            ),
            F.lit(0.000001),
        ).alias("mu"),
    )
    mu = F.col("mu")
    ww = mu * (1 - mu)
    zz = eta + (F.col("y") - mu) / ww
    t2 = tq.select(
        "x",
        "a",
        "b",
        F.round(ww, 9).alias("w"),
        F.round(ww * F.col("x"), 9).alias("wx"),
        F.round(ww * F.col("x") * F.col("x"), 9).alias("wxx"),
        F.round(ww * zz, 9).alias("wz"),
        F.round(ww * F.col("x") * zz, 9).alias("wxz"),
    )
    m2 = t2.agg(
        F.max("a").alias("a1"),
        F.max("b").alias("b1v"),
        F.sum(F.col("w").cast("decimal(30,9)")).cast("double").alias("sw"),
        F.sum(F.col("wx").cast("decimal(30,9)")).cast("double").alias("swx"),
        F.sum(F.col("wxx").cast("decimal(30,9)")).cast("double").alias("swxx"),
        F.sum(F.col("wz").cast("decimal(30,9)")).cast("double").alias("swz"),
        F.sum(F.col("wxz").cast("decimal(30,9)")).cast("double").alias("swxz"),
    )
    b2 = (
        F.col("sw") * F.col("swxz") - F.col("swx") * F.col("swz")
    ) / (F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx"))
    return m2.select(
        F.round("a1", 6).alias("intercept_iter1"),
        F.round("b1v", 6).alias("coef_iter1"),
        F.round(b2, 6).alias("coef_iter2"),
        F.round((F.col("swz") - b2 * F.col("swx")) / F.col("sw"), 6).alias(
            "intercept_iter2"
        ),
    )
