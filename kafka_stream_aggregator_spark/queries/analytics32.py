"""Round-8 wave 42: two-sample F variance test, Hill tail-index
estimator, and the Theil inequality between/within decomposition.

All three close on exact moment relations: DECIMAL power sums for the
F ratio, counts-tier order statistics with quantized log sums for
Hill, and per-nation DECIMAL revenue sums for Theil (the ln guards
follow the agg_theil_index sf5 lesson: strictly positive terms only).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "stat_f_two_sample_var",
    # F = s_purchase^2 / s_view^2 with sample variances from exact
    # DECIMAL power sums; df = (n1-1, n2-1).
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS s,
             sum(CAST(value AS DECIMAL(18,2))
                 * CAST(value AS DECIMAL(18,2))) AS ss
      FROM events WHERE event_type IN ('purchase', 'view')
      GROUP BY event_type
    ), m AS (
      SELECT
        max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
        max(CASE WHEN event_type = 'purchase'
                 THEN CAST(s AS DOUBLE) END) AS s1,
        max(CASE WHEN event_type = 'purchase'
                 THEN CAST(ss AS DOUBLE) END) AS ss1,
        max(CASE WHEN event_type = 'view' THEN n END) AS n2,
        max(CASE WHEN event_type = 'view'
                 THEN CAST(s AS DOUBLE) END) AS s2,
        max(CASE WHEN event_type = 'view'
                 THEN CAST(ss AS DOUBLE) END) AS ss2
      FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n2 AS BIGINT) AS n_view,
           CAST(n1 - 1 AS BIGINT) AS df1,
           CAST(n2 - 1 AS BIGINT) AS df2,
           round(((ss1 - s1 * s1 / n1) / (n1 - 1))
                 / ((ss2 - s2 * s2 / n2) / (n2 - 1)), 6) AS f_stat
    FROM m WHERE n1 > 1 AND n2 > 1 AND ss2 - s2 * s2 / n2 > 0
    """,
)
def stat_f_two_sample_var(spark, sf_dir):
    """Two-sample variance-ratio F test from one two-group exact
    decimal moment aggregate and a 1-row closing chain."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    dec = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("ss"),
    )

    def pick(col, ty, dbl=False):
        c = F.col(col)
        if dbl:
            c = c.cast("double")
        return F.max(F.when(F.col("event_type") == ty, c))

    m = g.agg(
        pick("n", "purchase").alias("n1"),
        pick("s", "purchase", True).alias("s1"),
        pick("ss", "purchase", True).alias("ss1"),
        pick("n", "view").alias("n2"),
        pick("s", "view", True).alias("s2"),
        pick("ss", "view", True).alias("ss2"),
    )
    v1 = (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1")) / (
        F.col("n1") - 1
    )
    v2 = (F.col("ss2") - F.col("s2") * F.col("s2") / F.col("n2")) / (
        F.col("n2") - 1
    )
    return m.filter(
        (F.col("n1") > 1)
        & (F.col("n2") > 1)
        & (F.col("ss2") - F.col("s2") * F.col("s2") / F.col("n2") > 0)
    ).select(
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_view"),
        (F.col("n1") - 1).cast("bigint").alias("df1"),
        (F.col("n2") - 1).cast("bigint").alias("df2"),
        F.round(v1 / v2, 6).alias("f_stat"),
    )


@query(
    "events_hill_tail_index",
    # Hill estimator of the power-law tail of per-user event counts:
    # the k = n//3 largest counts above the (k+1)-th order statistic,
    # alpha_hill = k / sum(ln(x_i / x_(k+1))). Order statistics come
    # from a rank over the user-bounded count relation; log terms are
    # quantized DECIMAL(20,9) pre-sum. k adapts so every tier
    # verifies non-trivially.
    oracle="""
    WITH uc AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ), nn AS (
      SELECT CAST(count(*) // 3 AS BIGINT) AS kk FROM uc
    ), r AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS rn
      FROM uc
    ), kth AS (
      SELECT r.c AS xk1, nn.kk FROM r CROSS JOIN nn
      WHERE r.rn = nn.kk + 1
    ), terms AS (
      SELECT CAST(round(ln(CAST(r.c AS DOUBLE) / kth.xk1), 9)
                  AS DECIMAL(20,9)) AS lt
      FROM r CROSS JOIN kth
      WHERE r.rn <= kth.kk AND r.c > 0 AND kth.xk1 > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS k,
           round(count(*) / CAST(sum(lt) AS DOUBLE), 6) AS hill_alpha
    FROM terms
    HAVING sum(lt) > 0
    """,
)
def events_hill_tail_index(spark, sf_dir):
    """Hill tail index over the top n//3 per-user activity counts: one
    fact aggregate, a rank over the user-bounded relation, quantized
    log-ratio terms, one division."""
    ev = t(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    nn = uc.agg(
        F.floor(F.count(F.lit(1)) / 3).cast("bigint").alias("kk")
    )
    r = uc.select(
        "c",
        F.row_number()
        .over(W.orderBy(F.desc("c"), F.col("user_id")))
        .alias("rn"),
    )
    kth = (
        r.crossJoin(F.broadcast(nn))
        .filter(F.col("rn") == F.col("kk") + 1)
        .select(F.col("c").alias("xk1"), "kk")
    )
    terms = (
        r.crossJoin(F.broadcast(kth))
        .filter(F.col("rn") <= F.col("kk"))
        .filter((F.col("c") > 0) & (F.col("xk1") > 0))
        .select(
            F.round(
                F.log(F.col("c").cast("double") / F.col("xk1")), 9
            )
            .cast("decimal(20,9)")
            .alias("lt")
        )
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("lt").cast("double").alias("slt"),
    )
    return agg.filter(F.col("slt") > 0).select(
        "k",
        F.round(F.col("k") / F.col("slt"), 6).alias("hill_alpha"),
    )


@query(
    "agg_theil_decomposition",
    # Theil-T inequality of supplier revenue decomposed into
    # between-nation and within-nation components:
    # T = sum_i (x_i/X) ln(x_i / mu)  with mu = X/N,
    # T_between = sum_g (X_g/X) ln((X_g/N_g)/(X/N)),
    # T_within  = sum_g (X_g/X) T_g. Revenue sums are DECIMAL-exact;
    # every ln argument is a ratio of exact positives (zero-revenue
    # suppliers excluded on both engines — the agg_theil_index rule);
    # per-group terms quantized DECIMAL(20,9) pre-sum.
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(5,2))) AS r
      FROM lineitem GROUP BY l_suppkey
    ), sn AS (
      SELECT n.n_name, CAST(rev.r AS DOUBLE) AS x
      FROM rev
      JOIN supplier s ON rev.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE rev.r > 0
    ), tot AS (
      SELECT CAST(sum(CAST(round(x, 2) AS DECIMAL(20,2))) AS DOUBLE)
               AS xt,
             CAST(count(*) AS BIGINT) AS nt
      FROM sn
    ), grp AS (
      SELECT n_name,
             CAST(sum(CAST(round(x, 2) AS DECIMAL(20,2))) AS DOUBLE)
               AS xg,
             CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(CAST(round(
               x * ln(x), 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxlnx
      FROM sn GROUP BY n_name
    ), comp AS (
      SELECT
        CAST(sum(CAST(round((xg / tot.xt)
            * ln((xg / ng) / (tot.xt / tot.nt)), 9)
            AS DECIMAL(20,9))) AS DOUBLE) AS t_between,
        CAST(sum(CAST(round((xg / tot.xt)
            * (sxlnx / xg - ln(xg / ng)), 9)
            AS DECIMAL(20,9))) AS DOUBLE) AS t_within,
        max(tot.nt) AS nt
      FROM grp CROSS JOIN tot
    )
    SELECT CAST(nt AS BIGINT) AS n_suppliers,
           round(t_between, 6) AS t_between,
           round(t_within, 6) AS t_within,
           round(t_between + t_within, 6) AS t_total
    FROM comp
    """,
)
def agg_theil_decomposition(spark, sf_dir):
    """Theil between/within decomposition: supplier revenue is the one
    fact shuffle; nation groups close on broadcast dims; T_g uses the
    identity sum(x ln x)/X_g - ln(mu_g) so no per-supplier share
    column materializes."""
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount")).cast("decimal(5,2)")
        ).alias("r")
    )
    sn = (
        rev.filter(F.col("r") > 0)
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", F.col("r").cast("double").alias("x"))
    )
    d2 = lambda c: F.sum(F.round(c, 2).cast("decimal(20,2)")).cast(
        "double"
    )
    tot = sn.agg(
        d2(F.col("x")).alias("xt"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    grp = sn.groupBy("n_name").agg(
        d2(F.col("x")).alias("xg"),
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum(
            F.round(F.col("x") * F.log("x"), 9).cast("decimal(28,9)")
        )
        .cast("double")
        .alias("sxlnx"),
    )
    j = grp.crossJoin(F.broadcast(tot))
    tb_term = F.round(
        (F.col("xg") / F.col("xt"))
        * F.log(
            (F.col("xg") / F.col("ng")) / (F.col("xt") / F.col("nt"))
        ),
        9,
    ).cast("decimal(20,9)")
    tw_term = F.round(
        (F.col("xg") / F.col("xt"))
        * (
            F.col("sxlnx") / F.col("xg")
            - F.log(F.col("xg") / F.col("ng"))
        ),
        9,
    ).cast("decimal(20,9)")
    comp = j.agg(
        F.sum(tb_term).cast("double").alias("t_between"),
        F.sum(tw_term).cast("double").alias("t_within"),
        F.max("nt").alias("nt"),
    )
    return comp.select(
        F.col("nt").cast("bigint").alias("n_suppliers"),
        F.round("t_between", 6).alias("t_between"),
        F.round("t_within", 6).alias("t_within"),
        F.round(F.col("t_between") + F.col("t_within"), 6).alias(
            "t_total"
        ),
    )
