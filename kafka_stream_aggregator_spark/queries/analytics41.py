"""Round-10 wave 54b: multiple testing, survival, isotonic, drift.

stat_bh_fdr is the Benjamini-Hochberg procedure every metrics platform
runs over its per-segment test batteries — here 25 per-nation
two-sample KS tests (nation vs rest) whose D statistics come from
EXACT integer ECDF cross-products, with only the asymptotic
p = min(1, 2 exp(-2 D^2 n_e)) touching libm (quantized round-9 at
birth; every later comparison operates on the quantized value, so
rank order cannot diverge across engines). stat_logrank_test is the
standard two-group survival comparison on per-user lifetimes;
ml_isotonic_pava materializes the minimax characterization of
isotonic regression (fit_i = max_{j<=i} min_{k>=i} avg(y_j..y_k)) on
the bounded 50-cell quantity relation — prefix sums make every
interval average one IEEE division of exact integers;
events_psi_stability is the population-stability-index drift check
between timeline halves on a FULLY INTEGER bucket grid.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "stat_bh_fdr",
    # Per nation: two-sample KS of customer balances (nation vs all
    # other nations), D from integer ECDF cross-products on the
    # global distinct-cents grid (|icum * n_rest - rcum * n_i| in
    # DECIMAL(38,0) — overflow-proof at any scale), asymptotic
    # p = min(1, 2 exp(-2 D^2 n_e)) quantized round-9 at birth.
    # Then Benjamini-Hochberg at alpha = 0.05: rank by quantized p,
    # adjusted p = suffix-min of p*m/rank capped at 1, reject ranks
    # <= the largest rank with p <= rank/m * alpha.
    oracle="""
    WITH cv AS (
      SELECT n_name,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cnt
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, v
    ), dv AS (
      SELECT v, CAST(sum(cnt) AS BIGINT) AS gcnt FROM cv GROUP BY v
    ), gsz AS (
      SELECT CAST(sum(gcnt) AS BIGINT) AS n FROM dv
    ), nsz AS (
      SELECT n_name, CAST(sum(cnt) AS BIGINT) AS ni FROM cv
      GROUP BY n_name
    ), grid AS (
      SELECT nsz.n_name, nsz.ni, dv.v,
             CAST(coalesce(cv.cnt, 0) AS BIGINT) AS cnt,
             dv.gcnt
      FROM nsz CROSS JOIN dv
      LEFT JOIN cv ON cv.n_name = nsz.n_name AND cv.v = dv.v
    ), cums AS (
      SELECT n_name, ni, v,
             CAST(sum(cnt) OVER (PARTITION BY n_name ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS icum,
             CAST(sum(gcnt) OVER (PARTITION BY n_name ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS gcum
      FROM grid
    ), dstat AS (
      SELECT n_name, ni,
             CAST(max(abs(CAST(icum AS DECIMAL(38,0)) * (n - ni)
                          - CAST(gcum - icum AS DECIMAL(38,0)) * ni))
                  AS DECIMAL(38,0)) AS dnum,
             CAST(max(n) AS BIGINT) AS n
      FROM cums CROSS JOIN gsz GROUP BY n_name, ni
    ), pv AS (
      SELECT n_name, ni,
             round(CAST(dnum AS DOUBLE)
                   / (CAST(ni AS DOUBLE) * (n - ni)), 6) AS d_stat,
             round(least(1.0, 2 * exp(
               -2 * (CAST(dnum AS DOUBLE) / (CAST(ni AS DOUBLE)
                                             * (n - ni)))
                  * (CAST(dnum AS DOUBLE) / (CAST(ni AS DOUBLE)
                                             * (n - ni)))
                  * (CAST(ni AS DOUBLE) * (n - ni) / n))), 9) AS p9
      FROM dstat
    ), ranked AS (
      SELECT n_name, ni, d_stat, p9,
             CAST(row_number() OVER (ORDER BY p9, n_name) AS BIGINT)
               AS r,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pv
    ), adj AS (
      SELECT n_name, ni, d_stat, p9, r, m,
             least(1.0, min(p9 * m / r) OVER (ORDER BY r DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS p_adj,
             CAST(coalesce(max(CASE WHEN p9 * m <= 0.05 * r
                                    THEN r END) OVER (), 0) AS BIGINT)
               AS kstar
      FROM ranked
    )
    SELECT n_name, ni AS n_customers, d_stat,
           round(p9, 6) AS p_value,
           round(p_adj, 6) AS p_adjusted,
           CAST(r <= kstar AS BOOLEAN) AS rejected
    FROM adj
    """,
)
def stat_bh_fdr(spark, sf_dir):
    """BH-FDR over 25 per-nation KS tests: one groupBy to the
    (nation, cents) cell relation, a bounded nations x distinct-cents
    grid for the ECDF race, then pure window algebra on 25 rows.
    Only exp() touches libm and its output is quantized before any
    ordering depends on it."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    cv = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.round(F.col("c_acctbal") * 100, 0)
            .cast("bigint")
            .alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    dv = cv.groupBy("v").agg(
        F.sum("cnt").cast("bigint").alias("gcnt")
    )
    gsz = dv.agg(F.sum("gcnt").cast("bigint").alias("n"))
    nsz = cv.groupBy("n_name").agg(
        F.sum("cnt").cast("bigint").alias("ni")
    )
    grid = (
        nsz.crossJoin(dv)
        .join(cv, ["n_name", "v"], "left")
        .select(
            "n_name",
            "ni",
            "v",
            F.coalesce(F.col("cnt"), F.lit(0))
            .cast("bigint")
            .alias("cnt"),
            "gcnt",
        )
    )
    wc = (
        W.partitionBy("n_name")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cums = grid.select(
        "n_name",
        "ni",
        F.sum("cnt").over(wc).cast("bigint").alias("icum"),
        F.sum("gcnt").over(wc).cast("bigint").alias("gcum"),
    )
    dstat = (
        cums.crossJoin(F.broadcast(gsz))
        .groupBy("n_name", "ni")
        .agg(
            F.max(
                F.abs(
                    F.col("icum").cast("decimal(38,0)")
                    * (F.col("n") - F.col("ni"))
                    - (F.col("gcum") - F.col("icum")).cast(
                        "decimal(38,0)"
                    )
                    * F.col("ni")
                )
            )
            .cast("decimal(38,0)")
            .alias("dnum"),
            F.max("n").cast("bigint").alias("n"),
        )
    )
    d = F.col("dnum").cast("double") / (
        F.col("ni").cast("double") * (F.col("n") - F.col("ni"))
    )
    ne = (
        F.col("ni").cast("double")
        * (F.col("n") - F.col("ni"))
        / F.col("n")
    )
    pv = dstat.select(
        "n_name",
        "ni",
        F.round(d, 6).alias("d_stat"),
        F.round(
            F.least(F.lit(1.0), 2 * F.exp(-2 * d * d * ne)), 9
        ).alias("p9"),
    )
    ranked = pv.select(
        "n_name",
        "ni",
        "d_stat",
        "p9",
        F.row_number()
        .over(W.orderBy("p9", "n_name"))
        .cast("bigint")
        .alias("r"),
        F.count(F.lit(1))
        .over(W.partitionBy())
        .cast("bigint")
        .alias("m"),
    )
    wdesc = W.orderBy(F.desc("r")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    adj = ranked.select(
        "n_name",
        "ni",
        "d_stat",
        "p9",
        "r",
        F.least(
            F.lit(1.0),
            F.min(F.col("p9") * F.col("m") / F.col("r")).over(wdesc),
        ).alias("p_adj"),
        F.coalesce(
            F.max(
                F.when(
                    F.col("p9") * F.col("m") <= 0.05 * F.col("r"),
                    F.col("r"),
                )
            ).over(W.partitionBy()),
            F.lit(0),
        )
        .cast("bigint")
        .alias("kstar"),
    )
    return adj.select(
        "n_name",
        F.col("ni").alias("n_customers"),
        "d_stat",
        F.round("p9", 6).alias("p_value"),
        F.round("p_adj", 6).alias("p_adjusted"),
        (F.col("r") <= F.col("kstar")).alias("rejected"),
    )


@query(
    "stat_logrank_test",
    # Two-group log-rank test on per-user lifetimes (first-to-last
    # event seconds; every user "dies" — no censoring, under which
    # the log-rank machinery is exact integer counting). Groups =
    # user_id parity (deterministic, balanced). At each distinct
    # death time: at-risk = suffix sums of integer death counts,
    # E0 = d_t * n0_t / n_t and the hypergeometric variance — each
    # term one IEEE chain on exact integers, quantized DECIMAL(28,9)
    # before the O(distinct-times) sums (the windowed-double-fold
    # rule).
    oracle="""
    WITH life AS (
      SELECT user_id,
             CAST(user_id % 2 AS BIGINT) AS grp,
             CAST(floor(epoch(max(ts))) - floor(epoch(min(ts)))
                  AS BIGINT) AS dur
      FROM events GROUP BY user_id
    ), cells AS (
      SELECT grp, dur, CAST(count(*) AS BIGINT) AS d
      FROM life GROUP BY grp, dur
    ), times AS (
      SELECT DISTINCT dur FROM cells
    ), grid AS (
      SELECT g.grp, tm.dur, CAST(coalesce(c.d, 0) AS BIGINT) AS d
      FROM (SELECT 0 AS grp UNION ALL SELECT 1) g
      CROSS JOIN times tm
      LEFT JOIN cells c ON c.grp = g.grp AND c.dur = tm.dur
    ), risk AS (
      SELECT grp, dur, d,
             CAST(sum(d) OVER (PARTITION BY grp ORDER BY dur DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS at_risk
      FROM grid
    ), wide AS (
      SELECT a.dur,
             a.d AS d0, b.d AS d1,
             a.at_risk AS n0, b.at_risk AS n1
      FROM risk a JOIN risk b ON a.dur = b.dur
      WHERE a.grp = 0 AND b.grp = 1
    ), terms AS (
      SELECT CAST(round(d0 - CAST(d0 + d1 AS DOUBLE) * n0 / (n0 + n1),
                        9) AS DECIMAL(28,9)) AS oe,
             CAST(round(CASE WHEN n0 + n1 > 1 THEN
               CAST(d0 + d1 AS DOUBLE) * n0 / (n0 + n1)
                 * n1 / (n0 + n1)
                 * (n0 + n1 - d0 - d1) / (n0 + n1 - 1)
               ELSE 0 END, 9) AS DECIMAL(28,9)) AS vt
      FROM wide WHERE d0 + d1 > 0
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM life WHERE user_id % 2 = 0)
        AS n_group0,
      (SELECT CAST(count(*) AS BIGINT) FROM life WHERE user_id % 2 = 1)
        AS n_group1,
      CAST(count(*) AS BIGINT) AS n_times,
      round(CAST(sum(oe) AS DOUBLE), 6) AS o_minus_e,
      round(CAST(sum(vt) AS DOUBLE), 6) AS variance,
      round(CAST(sum(oe) AS DOUBLE) * CAST(sum(oe) AS DOUBLE)
            / CAST(sum(vt) AS DOUBLE), 6) AS logrank_chi2
    FROM terms
    """,
)
def stat_logrank_test(spark, sf_dir):
    """Log-rank: one per-user aggregate (a single fact shuffle on
    user_id), then integer death-count cells, suffix-sum at-risk
    windows over the bounded distinct-duration relation, and two
    quantized term sums. O(distinct durations) after the first
    shuffle — the duration grid is bounded by timeline seconds, not
    by fact rows."""
    ev = t(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        (
            F.floor(F.max(F.col("ts").cast("double")))
            - F.floor(F.min(F.col("ts").cast("double")))
        )
        .cast("bigint")
        .alias("dur"),
    ).select(
        (F.col("user_id") % 2).cast("bigint").alias("grp"), "dur"
    )
    cells = life.groupBy("grp", "dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    times = cells.select("dur").distinct()
    groups = spark.range(2).select(F.col("id").alias("grp"))
    grid = (
        groups.crossJoin(times)
        .join(cells, ["grp", "dur"], "left")
        .select(
            "grp",
            "dur",
            F.coalesce(F.col("d"), F.lit(0)).cast("bigint").alias("d"),
        )
    )
    wr = (
        W.partitionBy("grp")
        .orderBy(F.desc("dur"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    risk = grid.select(
        "grp",
        "dur",
        "d",
        F.sum("d").over(wr).cast("bigint").alias("at_risk"),
    )
    a = risk.filter("grp = 0").select(
        "dur", F.col("d").alias("d0"), F.col("at_risk").alias("n0")
    )
    b = risk.filter("grp = 1").select(
        "dur", F.col("d").alias("d1"), F.col("at_risk").alias("n1")
    )
    wide = a.join(b, "dur")
    dt = F.col("d0") + F.col("d1")
    nt = F.col("n0") + F.col("n1")
    e0 = dt.cast("double") * F.col("n0") / nt
    vt = (
        dt.cast("double")
        * F.col("n0")
        / nt
        * F.col("n1")
        / nt
        * (nt - dt)
        / (nt - 1)
    )
    terms = wide.filter(dt > 0).select(
        F.round(F.col("d0") - e0, 9)
        .cast("decimal(28,9)")
        .alias("oe"),
        F.round(F.when(nt > 1, vt).otherwise(0.0), 9)
        .cast("decimal(28,9)")
        .alias("vt"),
    )
    sizes = life.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng")
    )
    n0r = sizes.filter("grp = 0").select(
        F.col("ng").alias("n_group0")
    )
    n1r = sizes.filter("grp = 1").select(
        F.col("ng").alias("n_group1")
    )
    soe = F.sum("oe").cast("double")
    svt = F.sum("vt").cast("double")
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_times"),
        F.round(soe, 6).alias("o_minus_e"),
        F.round(svt, 6).alias("variance"),
        F.round(soe * soe / svt, 6).alias("logrank_chi2"),
    )
    return (
        n0r.crossJoin(n1r)
        .crossJoin(agg)
        .select(
            "n_group0", "n_group1", "n_times",
            "o_minus_e", "variance", "logrank_chi2",
        )
    )


@query(
    "ml_isotonic_pava",
    # Isotonic regression of mean line price on quantity via the
    # minimax characterization fit_i = max_{j<=i} min_{k>=i}
    # avg(y_j..y_k): prefix sums over the ~50-cell quantity relation
    # make every interval average (S_k - S_{j-1}) / (C_k - C_{j-1})
    # one IEEE division of exact integer cents/counts; the suffix-min
    # per start j and closing max per target i are pure window/group
    # algebra on the bounded triangular pair relation. The PAVA
    # pool-adjacent algorithm computes the same function in O(n) per
    # group (the applyInPandas scale path for long series); the
    # minimax form is chosen here because it is oracle-exact.
    oracle="""
    WITH cells AS (
      SELECT CAST(round(l_quantity, 0) AS BIGINT) AS qv,
             CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS c
      FROM lineitem GROUP BY qv
    ), pre AS (
      SELECT qv, s, c,
             CAST(sum(s) OVER (ORDER BY qv
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS ps,
             CAST(sum(c) OVER (ORDER BY qv
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS pc
      FROM cells
    ), pairs AS (
      SELECT a.qv AS j, b.qv AS k,
             CAST(b.ps - (a.ps - a.s) AS DOUBLE)
               / (b.pc - (a.pc - a.c)) AS iv_avg
      FROM pre a JOIN pre b ON b.qv >= a.qv
    ), suff AS (
      SELECT j, k AS i,
             min(iv_avg) OVER (PARTITION BY j ORDER BY k DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS m
      FROM pairs
    ), fit AS (
      SELECT i AS qv, max(m) AS iso
      FROM suff WHERE j <= i GROUP BY i
    )
    SELECT cells.qv, cells.c AS n_rows,
           round(CAST(cells.s AS DOUBLE) / cells.c / 100, 6)
             AS raw_avg,
           round(fit.iso / 100, 6) AS iso_fit
    FROM cells JOIN fit ON cells.qv = fit.qv
    """,
)
def ml_isotonic_pava(spark, sf_dir):
    """Isotonic fit on the bounded quantity-cell relation: one fact
    shuffle to ~50 cells, a 1275-row triangular pair self-join, one
    suffix-min window and one closing groupBy max. Monotone by
    construction; exact because every average is a single division
    of exact integers."""
    li = t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.round("l_quantity", 0).cast("bigint").alias("qv")
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        )
        .cast("bigint")
        .alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    wq = W.orderBy("qv").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    pre = cells.select(
        "qv",
        "s",
        "c",
        F.sum("s").over(wq).cast("bigint").alias("ps"),
        F.sum("c").over(wq).cast("bigint").alias("pc"),
    )
    a = pre.select(
        F.col("qv").alias("j"),
        (F.col("ps") - F.col("s")).alias("ps0"),
        (F.col("pc") - F.col("c")).alias("pc0"),
    )
    b = pre.select(
        F.col("qv").alias("k"),
        F.col("ps").alias("psk"),
        F.col("pc").alias("pck"),
    )
    pairs = a.join(b, F.col("k") >= F.col("j")).select(
        "j",
        "k",
        (
            (F.col("psk") - F.col("ps0")).cast("double")
            / (F.col("pck") - F.col("pc0"))
        ).alias("iv_avg"),
    )
    ws = (
        W.partitionBy("j")
        .orderBy(F.desc("k"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    suff = pairs.select(
        "j",
        F.col("k").alias("i"),
        F.min("iv_avg").over(ws).alias("m"),
    )
    fit = (
        suff.filter(F.col("j") <= F.col("i"))
        .groupBy("i")
        .agg(F.max("m").alias("iso"))
        .select(F.col("i").alias("qv"), "iso")
    )
    return cells.join(fit, "qv").select(
        "qv",
        F.col("c").alias("n_rows"),
        F.round(F.col("s").cast("double") / F.col("c") / 100, 6).alias(
            "raw_avg"
        ),
        F.round(F.col("iso") / 100, 6).alias("iso_fit"),
    )


@query(
    "events_psi_stability",
    # Population Stability Index between the first and second halves
    # of the event timeline, on a FULLY INTEGER bucket grid: values
    # as cents, bucket = ((v - min) * 10) integer-div (max - min + 1)
    # — no float edges anywhere. Halves split by the integer
    # midpoint test e*2 <= min+max. PSI = sum (p-q) ln(p/q) over
    # buckets populated on both sides (standard convention; the
    # bucket count is emitted so the domain is explicit); each libm
    # term quantized DECIMAL(28,9) before the 10-term sum.
    oracle="""
    WITH base AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS e,
             CAST(round(value * 100, 0) AS BIGINT) AS v
      FROM events
    ), rng AS (
      SELECT CAST(min(e) AS BIGINT) AS emin,
             CAST(max(e) AS BIGINT) AS emax,
             CAST(min(v) AS BIGINT) AS vmin,
             CAST(max(v) AS BIGINT) AS vmax
      FROM base
    ), bucketed AS (
      SELECT CASE WHEN e * 2 <= emin + emax THEN 0 ELSE 1 END AS half,
             CAST(least(9, floor(((v - vmin) * 10.0)
                                 / (vmax - vmin + 1))) AS BIGINT) AS b
      FROM base CROSS JOIN rng
    ), cnts AS (
      SELECT half, b, CAST(count(*) AS BIGINT) AS cnt
      FROM bucketed GROUP BY half, b
    ), tots AS (
      SELECT half, CAST(sum(cnt) AS BIGINT) AS n
      FROM cnts GROUP BY half
    ), wide AS (
      SELECT a.b,
             CAST(a.cnt AS DOUBLE) / an.n AS p,
             CAST(c.cnt AS DOUBLE) / cn.n AS q
      FROM cnts a JOIN cnts c ON a.b = c.b
      JOIN tots an ON an.half = 0
      JOIN tots cn ON cn.half = 1
      WHERE a.half = 0 AND c.half = 1
    )
    SELECT
      (SELECT n FROM tots WHERE half = 0) AS n_first_half,
      (SELECT n FROM tots WHERE half = 1) AS n_second_half,
      CAST(count(*) AS BIGINT) AS n_buckets_used,
      round(CAST(sum(CAST(round((p - q) * ln(p / q), 9)
                          AS DECIMAL(28,9))) AS DOUBLE), 6) AS psi
    FROM wide
    """,
)
def events_psi_stability(spark, sf_dir):
    """PSI drift check: one range aggregate (broadcast), one bucketed
    count per half, a 10-row bucket join, quantized ln terms. The
    integer bucket arithmetic (((v - vmin) * 10) div range) means
    bucket assignment can never straddle a float edge differently
    across engines."""
    ev = t(spark, sf_dir, "events")
    base = ev.select(
        F.floor(F.col("ts").cast("double")).cast("bigint").alias("e"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    rng = base.agg(
        F.min("e").cast("bigint").alias("emin"),
        F.max("e").cast("bigint").alias("emax"),
        F.min("v").cast("bigint").alias("vmin"),
        F.max("v").cast("bigint").alias("vmax"),
    )
    bucketed = base.crossJoin(F.broadcast(rng)).select(
        F.when(
            F.col("e") * 2 <= F.col("emin") + F.col("emax"), 0
        )
        .otherwise(1)
        .alias("half"),
        F.least(
            F.lit(9).cast("bigint"),
            F.floor(
                ((F.col("v") - F.col("vmin")) * 10.0)
                / (F.col("vmax") - F.col("vmin") + 1)
            ).cast("bigint"),
        )
        .cast("bigint")
        .alias("b"),
    )
    cnts = bucketed.groupBy("half", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tots = cnts.groupBy("half").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    n0 = tots.filter("half = 0").select(
        F.col("n").alias("n_first_half")
    )
    n1 = tots.filter("half = 1").select(
        F.col("n").alias("n_second_half")
    )
    a = cnts.filter("half = 0").select("b", F.col("cnt").alias("c0"))
    c = cnts.filter("half = 1").select("b", F.col("cnt").alias("c1"))
    wide = (
        a.join(c, "b")
        .crossJoin(F.broadcast(n0))
        .crossJoin(F.broadcast(n1))
        .select(
            (
                F.col("c0").cast("double") / F.col("n_first_half")
            ).alias("p"),
            (
                F.col("c1").cast("double") / F.col("n_second_half")
            ).alias("q"),
        )
    )
    agg = wide.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_used"),
        F.round(
            F.sum(
                F.round(
                    (F.col("p") - F.col("q"))
                    * F.log(F.col("p") / F.col("q")),
                    9,
                ).cast("decimal(28,9)")
            ).cast("double"),
            6,
        ).alias("psi"),
    )
    return (
        n0.crossJoin(n1)
        .crossJoin(agg)
        .select(
            "n_first_half", "n_second_half", "n_buckets_used", "psi"
        )
    )
