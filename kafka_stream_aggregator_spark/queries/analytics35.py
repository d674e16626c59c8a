"""Round-9 wave 45: unit-root / heteroskedasticity / spectral /
median-test statistics over the events stream.

Every series here is the hourly event-count relation (bounded: hours
grow linearly with the timeline, counts stay density-constant under
the offset-copy scaler), and every accumulated moment is a pure
BIGINT sum — the stat_granger_1lag discipline (analytics34.py) — so
nothing order-dependent or libm-touched ever enters a sum. Closing
chains are IEEE double algebra on exact integers; sqrt is correctly
rounded (ROUND9_AUDIT final-emission rule), ln appears only at O(1)
magnitudes.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

_HOURLY_SQL = """
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY hr
"""


def _hourly(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy(
            F.floor(F.col("ts").cast("double") / 3600)
            .cast("bigint")
            .alias("hr")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )


@query(
    "ts_adf_test",
    # Dickey-Fuller unit-root test (zero augmentation): OLS of
    # dy_t = alpha + beta * y_{t-1} on the hourly count series;
    # DF statistic = beta / se(beta). A strongly negative DF rejects
    # the unit root (the series mean-reverts) — the standard
    # stationarity screen before AR modeling. Six BIGINT moments,
    # closed-form slope/intercept/SSR, one sqrt.
    oracle=f"""
    WITH hourly AS ({_HOURLY_SQL}), d AS (
      SELECT y - lag(y) OVER (ORDER BY hr) AS dy,
             lag(y) OVER (ORDER BY hr) AS x
      FROM hourly
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(dy) AS BIGINT) AS sd,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(dy * dy) AS BIGINT) AS sdd,
             CAST(sum(x * dy) AS BIGINT) AS sxd
      FROM d WHERE x IS NOT NULL
    ), f AS (
      SELECT n, sx, sd, sxx, sdd, sxd,
             (CAST(n AS DOUBLE) * sxd - CAST(sx AS DOUBLE) * sd)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               AS beta
      FROM m
      WHERE n > 2 AND CAST(n AS DOUBLE) * sxx
                      - CAST(sx AS DOUBLE) * sx <> 0
    ), s AS (
      SELECT n, beta,
             (CAST(sd AS DOUBLE) - beta * sx) / n AS alpha,
             sdd - ((CAST(sd AS DOUBLE) - beta * sx) / n) * sd
                 - beta * sxd AS ssr,
             CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS dxx
      FROM f
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(beta, 6) AS beta,
           round(beta / sqrt((ssr / (n - 2)) * n / dxx), 6) AS df_stat
    FROM s WHERE ssr > 0
    """,
)
def ts_adf_test(spark, sf_dir):
    """Dickey-Fuller: one hourly aggregate, one lag window on the
    bounded series, six BIGINT moments, a closed beta/se chain."""
    hourly = _hourly(spark, sf_dir)
    w = W.orderBy("hr")
    d = hourly.select(
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        F.lag("y").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sd"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("sdd"),
        F.sum(F.col("x") * F.col("dy")).cast("bigint").alias("sxd"),
    )
    nd = F.col("n").cast("double")
    sx, sd = F.col("sx").cast("double"), F.col("sd").cast("double")
    sxx, sdd = F.col("sxx").cast("double"), F.col("sdd").cast("double")
    sxd = F.col("sxd").cast("double")
    dxx = nd * sxx - sx * sx
    f = m.filter((F.col("n") > 2) & (dxx != 0)).select(
        "n", "sx", "sd", "sxx", "sdd", "sxd",
        ((nd * sxd - sx * sd) / dxx).alias("beta"),
    )
    beta = F.col("beta")
    alpha = (sd - beta * sx) / nd
    ssr = sdd - alpha * sd - beta * sxd
    s = f.select("n", "beta", ssr.alias("ssr"), dxx.alias("dxx"))
    return s.filter(F.col("ssr") > 0).select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.round("beta", 6).alias("beta"),
        F.round(
            F.col("beta")
            / F.sqrt(
                (F.col("ssr") / (F.col("n") - 2))
                * F.col("n")
                / F.col("dxx")
            ),
            6,
        ).alias("df_stat"),
    )


@query(
    "ts_arch_lm",
    # Engle's ARCH LM test (1 lag) for conditional heteroskedasticity
    # on the INTEGER-demeaned hourly series: e_t = y_t - floor(mean)
    # keeps e (and so e^2, e^4 and all six moments of the squared
    # series) pure BIGINT at any scale — the jarque-bera 1e31
    # power-sum class never arises because the demeaning bounds |e|
    # by the count fluctuation, not the count level. LM = n * R^2 of
    # e_t^2 ~ e_{t-1}^2.
    oracle=f"""
    WITH hourly AS ({_HOURLY_SQL}), mu AS (
      SELECT CAST(floor(CAST(sum(y) AS DOUBLE) / count(*)) AS BIGINT)
        AS m FROM hourly
    ), e AS (
      SELECT hr, (y - m) * (y - m) AS u
      FROM hourly CROSS JOIN mu
    ), p AS (
      SELECT u AS v, lag(u) OVER (ORDER BY hr) AS w
      FROM e
    ), m2 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sv,
             CAST(sum(w) AS BIGINT) AS sw,
             CAST(sum(v * v) AS BIGINT) AS svv,
             CAST(sum(w * w) AS BIGINT) AS sww,
             CAST(sum(v * w) AS BIGINT) AS svw
      FROM p WHERE w IS NOT NULL
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(
             CAST(n AS DOUBLE)
             * pow(CAST(n AS DOUBLE) * svw
                   - CAST(sv AS DOUBLE) * sw, 2)
             / ((CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv)
                * (CAST(n AS DOUBLE) * sww
                   - CAST(sw AS DOUBLE) * sw)),
             6) AS arch_lm
    FROM m2
    WHERE (CAST(n AS DOUBLE) * svv - CAST(sv AS DOUBLE) * sv) > 0
      AND (CAST(n AS DOUBLE) * sww - CAST(sw AS DOUBLE) * sw) > 0
    """,
)
def ts_arch_lm(spark, sf_dir):
    """ARCH LM: hourly counts -> integer-demeaned squared residuals
    -> lag-1 OLS R^2 from six BIGINT moments -> n * R^2. pow(x, 2) on
    a deterministic double is x*x — no libm risk (audit rule 1)."""
    hourly = _hourly(spark, sf_dir)
    mu = hourly.agg(
        F.floor(
            F.sum("y").cast("double") / F.count(F.lit(1))
        ).cast("bigint").alias("m")
    )
    e = hourly.crossJoin(F.broadcast(mu)).select(
        "hr",
        ((F.col("y") - F.col("m")) * (F.col("y") - F.col("m"))).alias(
            "u"
        ),
    )
    w = W.orderBy("hr")
    p = e.select(
        F.col("u").alias("v"), F.lag("u").over(w).alias("w")
    ).filter(F.col("w").isNotNull())
    m2 = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sv"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("svv"),
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("sww"),
        F.sum(F.col("v") * F.col("w")).cast("bigint").alias("svw"),
    )
    nd = F.col("n").cast("double")
    sv, sw = F.col("sv").cast("double"), F.col("sw").cast("double")
    svv, sww = F.col("svv").cast("double"), F.col("sww").cast("double")
    svw = F.col("svw").cast("double")
    dv = nd * svv - sv * sv
    dw = nd * sww - sw * sw
    num = nd * svw - sv * sw
    return m2.filter((dv > 0) & (dw > 0)).select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.round(nd * F.pow(num, 2) / (dv * dw), 6).alias("arch_lm"),
    )


@query(
    "ts_spectral_entropy",
    # Normalized spectral entropy per event type: the ts_periodogram
    # powers at k = 1..8 (daily counts, Fourier bases on exact
    # integer angles) normalized to a distribution; H = -sum p ln p /
    # ln 8. Near 1 = white noise, near 0 = one dominant cycle. The
    # inner sums carry the periodogram's measured fold bound (audit:
    # delta ~2e-8 at sf5); the entropy closes on RATIOS of those
    # sums, so the emission is O(1) with relative-error carryover —
    # margin >> the 6-dp grain.
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, day
    ), idx AS (
      SELECT event_type, c,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               - 1 AS tt,
             count(*) OVER (PARTITION BY event_type) AS n,
             avg(c) OVER (PARTITION BY event_type) AS mu
      FROM daily
    ), ks AS (SELECT unnest(generate_series(1, 8)) AS k), pw AS (
      SELECT event_type, k,
             pow(sum((c - mu) * cos(2 * pi() * k * tt / n)), 2)
             + pow(sum((c - mu) * sin(2 * pi() * k * tt / n)), 2)
               AS power
      FROM idx CROSS JOIN ks
      GROUP BY event_type, k
    ), tot AS (
      SELECT event_type, sum(power) AS tp FROM pw GROUP BY event_type
    )
    SELECT pw.event_type,
           round(-sum(CASE WHEN power > 0
                      THEN (power / tp) * ln(power / tp)
                      ELSE 0 END) / ln(8), 6) AS spectral_entropy
    FROM pw JOIN tot ON pw.event_type = tot.event_type
    WHERE tp > 0
    GROUP BY pw.event_type
    """,
)
def ts_spectral_entropy(spark, sf_dir):
    """Spectral entropy: one daily aggregate, 8 Fourier bases via an
    in-row explode (no extra scan), bounded window indexes, entropy
    identity over the 8-row-per-type power relation."""
    import math

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400)
        .cast("bigint")
        .alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wp = W.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "c",
        (F.row_number().over(wp.orderBy("day")) - 1).alias("tt"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.avg("c").over(wp).alias("mu"),
    )
    ks = F.explode(F.array(*[F.lit(k) for k in range(1, 9)])).alias("k")
    ang = 2 * math.pi * F.col("k") * F.col("tt") / F.col("n")
    pw = (
        idx.select("event_type", "c", "tt", "n", "mu", ks)
        .groupBy("event_type", "k")
        .agg(
            (
                F.pow(F.sum((F.col("c") - F.col("mu")) * F.cos(ang)), 2)
                + F.pow(
                    F.sum((F.col("c") - F.col("mu")) * F.sin(ang)), 2
                )
            ).alias("power")
        )
    )
    tot = pw.groupBy("event_type").agg(F.sum("power").alias("tp"))
    pr = F.col("power") / F.col("tp")
    return (
        pw.join(tot, "event_type")
        .filter(F.col("tp") > 0)
        .groupBy("event_type")
        .agg(
            F.round(
                -F.sum(
                    F.when(F.col("power") > 0, pr * F.log(pr)).otherwise(
                        0.0
                    )
                )
                / math.log(8),
                6,
            ).alias("spectral_entropy")
        )
    )


@query(
    "stat_mood_median",
    # Mood's median test: does the distribution of round(value, 2)
    # differ across event types? Grand median from the exact counts
    # tier (2-dp grain makes the order statistic discrete and
    # engine-identical); per-type above/below counts (ties at the
    # median excluded — the standard continuity treatment); chi2 =
    # sum (O-E)^2/E over the 2xk table on exact integers.
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(round(value, 2) AS DECIMAL(18,2)) AS x
      FROM events WHERE value IS NOT NULL
    ), cells AS (
      SELECT x, count(*) AS c FROM v GROUP BY x
    ), med AS (
      SELECT min(x) AS m FROM (
        SELECT x, sum(c) OVER (ORDER BY x) AS cum,
               sum(c) OVER () AS n
        FROM cells) z
      WHERE cum * 2 >= n
    ), ab AS (
      SELECT event_type,
             CAST(count(*) FILTER (WHERE x > m) AS BIGINT) AS above,
             CAST(count(*) FILTER (WHERE x < m) AS BIGINT) AS below
      FROM v CROSS JOIN med GROUP BY event_type
    ), tot AS (
      SELECT CAST(sum(above) AS BIGINT) AS ta,
             CAST(sum(below) AS BIGINT) AS tb
      FROM ab
    )
    SELECT CAST(count(*) AS BIGINT) AS k_groups,
           CAST(max(ta) AS BIGINT) + CAST(max(tb) AS BIGINT) AS n_used,
           round(sum(
             pow(above - (above + below)
                 * CAST(ta AS DOUBLE) / (ta + tb), 2)
               / ((above + below) * CAST(ta AS DOUBLE) / (ta + tb))
             + pow(below - (above + below)
                   * CAST(tb AS DOUBLE) / (ta + tb), 2)
               / ((above + below) * CAST(tb AS DOUBLE) / (ta + tb))
           ), 6) AS mood_chi2
    FROM ab CROSS JOIN tot
    WHERE ta > 0 AND tb > 0 AND above + below > 0
    """,
)
def stat_mood_median(spark, sf_dir):
    """Mood's median test: a counts-tier grand median (one cells
    aggregate + a bounded cumulative window), one conditional-count
    re-aggregate per type, a chi-square chain on exact integers."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.select(
        "event_type",
        F.round("value", 2).cast("decimal(18,2)").alias("x"),
    )
    cells = v.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    wc = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    med = (
        cells.select(
            "x",
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(W.partitionBy()).alias("n"),
        )
        .filter(F.col("cum") * 2 >= F.col("n"))
        .agg(F.min("x").alias("m"))
    )
    ab = (
        v.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count_if(F.col("x") > F.col("m"))
            .cast("bigint")
            .alias("above"),
            F.count_if(F.col("x") < F.col("m"))
            .cast("bigint")
            .alias("below"),
        )
    )
    tot = ab.agg(
        F.sum("above").cast("bigint").alias("ta"),
        F.sum("below").cast("bigint").alias("tb"),
    )
    ta, tb = F.col("ta").cast("double"), F.col("tb").cast("double")
    rowtot = F.col("above") + F.col("below")
    ea = rowtot * ta / (ta + tb)
    eb = rowtot * tb / (ta + tb)
    return (
        ab.crossJoin(F.broadcast(tot))
        .filter((F.col("ta") > 0) & (F.col("tb") > 0) & (rowtot > 0))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_groups"),
            (F.max("ta") + F.max("tb")).cast("bigint").alias("n_used"),
            F.round(
                F.sum(
                    F.pow(F.col("above") - ea, 2) / ea
                    + F.pow(F.col("below") - eb, 2) / eb
                ),
                6,
            ).alias("mood_chi2"),
        )
    )


@query(
    "stat_tost_equivalence",
    # TOST equivalence test (two one-sided Welch t-tests, literal
    # margin ±2.0): are 'click' and 'view' mean values equivalent
    # within the margin? Exact DECIMAL two-group moments, Welch se,
    # both one-sided statistics emitted (equivalence = both exceed
    # their critical value). The margin is a shared decimal literal.
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS s,
             sum(CAST(round(value, 2) AS DECIMAL(18,2))
                 * CAST(round(value, 2) AS DECIMAL(18,2))) AS ss
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
      GROUP BY event_type
    ), w AS (
      SELECT
        max(CASE WHEN event_type = 'click' THEN n END) AS n1,
        max(CASE WHEN event_type = 'view' THEN n END) AS n2,
        max(CASE WHEN event_type = 'click'
            THEN CAST(s AS DOUBLE) END) AS s1,
        max(CASE WHEN event_type = 'view'
            THEN CAST(s AS DOUBLE) END) AS s2,
        max(CASE WHEN event_type = 'click'
            THEN CAST(ss AS DOUBLE) END) AS ss1,
        max(CASE WHEN event_type = 'view'
            THEN CAST(ss AS DOUBLE) END) AS ss2
      FROM g
    ), v AS (
      SELECT n1, n2, s1 / n1 - s2 / n2 AS diff,
             (ss1 - s1 * s1 / n1) / (n1 - 1) / n1
             + (ss2 - s2 * s2 / n2) / (n2 - 1) / n2 AS se2
      FROM w WHERE n1 > 1 AND n2 > 1
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(diff, 6) AS mean_diff,
           round((diff + 2.0) / sqrt(se2), 6) AS t_lower,
           round((2.0 - diff) / sqrt(se2), 6) AS t_upper
    FROM v WHERE se2 > 0
    """,
)
def stat_tost_equivalence(spark, sf_dir):
    """TOST: one conditional two-group DECIMAL moment aggregate,
    Welch standard error, two closing one-sided chains (sqrt exact,
    margin a shared literal)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
        & F.col("value").isNotNull()
    )
    dec = F.round("value", 2).cast("decimal(18,2)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("ss"),
    )

    def pick(col, typ):
        return F.max(
            F.when(F.col("event_type") == typ, F.col(col))
        )

    w = g.agg(
        pick("n", "click").alias("n1"),
        pick("n", "view").alias("n2"),
        pick("s", "click").cast("double").alias("s1"),
        pick("s", "view").cast("double").alias("s2"),
        pick("ss", "click").cast("double").alias("ss1"),
        pick("ss", "view").cast("double").alias("ss2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    s1, s2 = F.col("s1"), F.col("s2")
    ss1, ss2 = F.col("ss1"), F.col("ss2")
    diff = s1 / n1 - s2 / n2
    se2 = (ss1 - s1 * s1 / n1) / (n1 - 1) / n1 + (
        ss2 - s2 * s2 / n2
    ) / (n2 - 1) / n2
    v = w.filter((n1 > 1) & (n2 > 1)).select(
        "n1", "n2", diff.alias("diff"), se2.alias("se2")
    )
    return v.filter(F.col("se2") > 0).select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round("diff", 6).alias("mean_diff"),
        F.round((F.col("diff") + 2.0) / F.sqrt("se2"), 6).alias(
            "t_lower"
        ),
        F.round((2.0 - F.col("diff")) / F.sqrt("se2"), 6).alias(
            "t_upper"
        ),
    )
