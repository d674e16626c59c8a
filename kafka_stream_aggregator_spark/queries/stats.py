"""Hypothesis-testing wave: the four classical distribution-free /
variance-decomposition tests every experimentation or data-drift
pipeline needs — two-sample Kolmogorov-Smirnov, Mann-Whitney U
(rank-sum), Spearman rank correlation, and one-way ANOVA.

All four follow the engine's exactness discipline so the DuckDB
oracles hash-match at any scale:

- Rank statistics never sort raw rows on one reducer. Ranks are
  derived from per-DISTINCT-VALUE counts plus a distributed prefix
  sum (``ops.distributed_global_rank`` with ``prefix_sums``), so the
  tie-corrected average rank ``cnt_less + (t+1)/2`` arrives as the
  INTEGER ``2*avg_rank = 2*cnt_less + t + 1`` — no float ever enters
  a shuffle.
- Cross-group float totals use the chi-square pattern: per-row
  bit-identical double chains rounded to 9 dp, summed exactly in
  DECIMAL(38,9) (order-independent), final round at 6 dp.
- The KS supremum is maximized as the exact integer
  ``|F1*n2 - F2*n1|`` (DECIMAL-guarded), so the argmax cannot flip on
  a 1-ulp ECDF difference between engines.

Reference parity: the reference engine (consumer.rs/pipeline.rs)
exposes per-window aggregation only; these tests extend the §2.B
analytics surface in the same declarative style.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..ops import distributed_global_rank
from .base import query, t

_D19 = "decimal(19,0)"
_D38 = "decimal(38,0)"


@query(
    "stat_ks_test",
    # Two-sample KS on events.value: 'view' vs 'click'. ECDFs come
    # from per-distinct-value counts + an ordered prefix sum; the
    # supremum is the max over distinct values of the exact integer
    # |F1*n2 - F2*n1| (DECIMAL(19,0) products — overflow-proof to
    # ~1e19 rows/side), divided once at the end. sqrt is IEEE
    # correctly-rounded, so the scaled statistic is one identical
    # double chain in both engines.
    oracle="""
    WITH cell AS (
      SELECT value,
             CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS c1,
             CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS c2
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY value
    ), ecdf AS (
      SELECT CAST(sum(c1) OVER w AS DECIMAL(19,0)) AS f1,
             CAST(sum(c2) OVER w AS DECIMAL(19,0)) AS f2
      FROM cell
      WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ), tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2
      FROM cell
    )
    SELECT n1, n2,
           round(CAST(max(abs(f1 * CAST(n2 AS DECIMAL(19,0))
                              - f2 * CAST(n1 AS DECIMAL(19,0)))) AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat,
           round(sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))
                 * (CAST(max(abs(f1 * CAST(n2 AS DECIMAL(19,0))
                                 - f2 * CAST(n1 AS DECIMAL(19,0)))) AS DOUBLE)
                    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))), 6)
             AS ks_scaled
    FROM ecdf, tot
    GROUP BY n1, n2
    """,
)
def stat_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of 'view' and 'click' events — the standard
    nonparametric "did the distribution shift" test for drift
    monitoring and A/B sanity checks. Plan: one groupBy on the fact
    to the distinct-value cell relation (map-side combine), then the
    two-phase distributed prefix sum (never an unpartitioned window
    over an unbounded relation) for both ECDF numerators, and a 1-row
    max of the exact integer supremum |F1*n2 - F2*n1|."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    cell = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c2"),
    )
    ranked = distributed_global_rank(
        cell, ["value"], prefix_sums={"c1": "f1", "c2": "f2"}
    )
    tot = cell.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    num = F.abs(
        F.col("f1").cast(_D19) * F.col("n2").cast(_D19)
        - F.col("f2").cast(_D19) * F.col("n1").cast(_D19)
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    d = F.max(num).cast("double") / (n1d * n2d)
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.round(d, 6).alias("d_stat"),
            F.round(F.sqrt(n1d * n2d / (n1d + n2d)) * d, 6).alias(
                "ks_scaled"
            ),
        )
        .select("n1", "n2", "d_stat", "ks_scaled")
    )


@query(
    "stat_mannwhitney_u",
    # Mann-Whitney U on o_totalprice: '1-URGENT' vs '5-LOW' orders.
    # Tie-corrected average ranks arrive as the INTEGER
    # 2*avg_rank = 2*cnt_less + t + 1 from the distributed prefix sum;
    # 2*R1 and the tie term sum(t^3 - t) are exact DECIMAL(38,0) sums,
    # so U and the tie-corrected z are single identical double chains.
    oracle="""
    WITH cell AS (
      SELECT o_totalprice AS v,
             CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                  AS BIGINT) AS c1,
             CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW')
                  AS BIGINT) AS c2
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY o_totalprice
    ), ranked AS (
      SELECT c1, c2, c1 + c2 AS tt,
             CAST(sum(c1 + c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS ft
      FROM cell
    ), m AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n1,
             CAST(sum(c2) AS BIGINT) AS n2,
             CAST(sum(CAST(c1 AS DECIMAL(19,0))
                      * CAST(2 * ft - tt + 1 AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS r1x2,
             CAST(sum(CAST(tt AS DECIMAL(19,0)) * CAST(tt AS DECIMAL(19,0))
                      * CAST(tt AS DECIMAL(19,0))
                      - CAST(tt AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS ties
      FROM ranked
    )
    SELECT n1, n2,
           round((CAST(r1x2 AS DOUBLE)
                  - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
                 - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0, 6)
             AS u_centered,
           round(((CAST(r1x2 AS DOUBLE)
                   - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
                  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                 / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                        * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                           - CAST(ties AS DOUBLE)
                             / (CAST(n1 + n2 AS DOUBLE)
                                * (CAST(n1 + n2 AS DOUBLE) - 1.0)))), 6)
             AS z_stat
    FROM m
    """,
)
def stat_mannwhitney_u(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) test: do URGENT and LOW
    priority orders draw totalprice from the same distribution — the
    robust two-sample location test that tolerates the heavy-tailed
    money column where a t-test would not. Plan: one groupBy to the
    distinct-price cell relation, the distributed prefix sum for
    pooled tie-averaged ranks (integer form 2*cnt_less + t + 1), and
    one 1-row decimal moment aggregate; z carries the exact tie
    correction sum(t^3 - t)."""
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    cell = o.groupBy(F.col("o_totalprice").alias("v")).agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias(
            "c1"
        ),
        F.count(F.when(F.col("o_orderpriority") == "5-LOW", 1)).alias("c2"),
    )
    cell = cell.withColumn("tt", F.col("c1") + F.col("c2"))
    ranked = distributed_global_rank(cell, ["v"], prefix_sums={"tt": "ft"})
    two_r = (2 * F.col("ft") - F.col("tt") + 1).cast(_D19)
    td = F.col("tt").cast(_D19)
    m = ranked.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1").cast(_D19) * two_r).cast(_D38).alias("r1x2"),
        F.sum(td * td * td - td).cast(_D38).alias("ties"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u_centered = (
        (F.col("r1x2").cast("double") - n1d * (n1d + 1.0)) / 2.0
        - n1d * n2d / 2.0
    )
    sig2 = (n1d * n2d / 12.0) * (
        (nd + 1.0) - F.col("ties").cast("double") / (nd * (nd - 1.0))
    )
    return m.select(
        "n1",
        "n2",
        F.round(u_centered, 6).alias("u_centered"),
        F.round(u_centered / F.sqrt(sig2), 6).alias("z_stat"),
    )


@query(
    "stat_spearman_corr",
    # Spearman rank correlation between l_quantity and
    # l_extendedprice. Both rank sides arrive as the INTEGER
    # 2*avg_rank: quantity via a window over its <=50-value domain
    # aggregate, price via the distributed prefix sum over its
    # distinct-value relation. The five rank moments are exact
    # DECIMAL(38,0) sums of DECIMAL(19,0) products; rho is one
    # identical double chain on those exact moments.
    oracle="""
    WITH xr AS (
      SELECT l_quantity AS q,
             CAST(count(*) AS BIGINT) AS tx,
             CAST(2 * (sum(count(*)) OVER (ORDER BY l_quantity
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - count(*)) + count(*) + 1 AS BIGINT) AS two_rx
      FROM lineitem GROUP BY l_quantity
    ), yr AS (
      SELECT l_extendedprice AS p,
             CAST(2 * (sum(count(*)) OVER (ORDER BY l_extendedprice
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - count(*)) + count(*) + 1 AS BIGINT) AS two_ry
      FROM lineitem GROUP BY l_extendedprice
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(two_rx AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sa,
             CAST(sum(CAST(two_ry AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sb,
             CAST(sum(CAST(two_rx AS DECIMAL(19,0))
                      * CAST(two_rx AS DECIMAL(19,0))) AS DECIMAL(38,0))
               AS saa,
             CAST(sum(CAST(two_ry AS DECIMAL(19,0))
                      * CAST(two_ry AS DECIMAL(19,0))) AS DECIMAL(38,0))
               AS sbb,
             CAST(sum(CAST(two_rx AS DECIMAL(19,0))
                      * CAST(two_ry AS DECIMAL(19,0))) AS DECIMAL(38,0))
               AS sab
      FROM lineitem l
      JOIN xr ON l.l_quantity = xr.q
      JOIN yr ON l.l_extendedprice = yr.p
    )
    SELECT n,
           round((CAST(sab AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))
                 / (sqrt(CAST(saa AS DOUBLE) / CAST(n AS DOUBLE)
                         - (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(sa AS DOUBLE) / CAST(n AS DOUBLE)))
                    * sqrt(CAST(sbb AS DOUBLE) / CAST(n AS DOUBLE)
                           - (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE))
                             * (CAST(sb AS DOUBLE) / CAST(n AS DOUBLE)))),
                 6) AS rho
    FROM m
    """,
)
def stat_spearman_corr(spark, sf_dir):
    """Spearman rank correlation between quantity and extended price
    on the fact table — the monotone-association measure that survives
    the price column's skew (Pearson on ranks, with exact tie-averaged
    ranks). Plan: quantity ranks from a window over its bounded
    (<=50-value TPC-H domain) aggregate, broadcast back; price ranks
    from the distributed prefix sum over the distinct-price relation,
    joined back on price (one shuffle); then a single 1-row decimal
    moment aggregate. No float enters any groupBy — both rank columns
    are integers (2*avg_rank) and all five moments are exact
    DECIMAL(38,0)."""
    li = t(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    # x side: bounded domain (TPC-H quantity is 1..50) — window over
    # the Aggregate is audit-clean, mirroring diag_chi_square.
    wq = W.orderBy("q").rowsBetween(W.unboundedPreceding, 0)
    xr = (
        li.groupBy(F.col("l_quantity").alias("q"))
        .agg(F.count(F.lit(1)).alias("tx"))
        .select(
            "q",
            (
                2 * (F.sum("tx").over(wq) - F.col("tx"))
                + F.col("tx")
                + 1
            )
            .cast("bigint")
            .alias("two_rx"),
        )
    )
    ycell = li.groupBy(F.col("l_extendedprice").alias("p")).agg(
        F.count(F.lit(1)).alias("ty")
    )
    yranked = distributed_global_rank(ycell, ["p"], prefix_sums={"ty": "fy"})
    yr = yranked.select(
        "p",
        (2 * (F.col("fy") - F.col("ty")) + F.col("ty") + 1)
        .cast("bigint")
        .alias("two_ry"),
    )
    joined = li.join(
        F.broadcast(xr), li["l_quantity"] == xr["q"]
    ).join(yr, li["l_extendedprice"] == yr["p"])
    a = F.col("two_rx").cast(_D19)
    b = F.col("two_ry").cast(_D19)
    m = joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(a).cast(_D38).alias("sa"),
        F.sum(b).cast(_D38).alias("sb"),
        F.sum(a * a).cast(_D38).alias("saa"),
        F.sum(b * b).cast(_D38).alias("sbb"),
        F.sum(a * b).cast(_D38).alias("sab"),
    )
    nd = F.col("n").cast("double")
    ma = F.col("sa").cast("double") / nd
    mb = F.col("sb").cast("double") / nd
    cov = F.col("sab").cast("double") / nd - ma * mb
    va = F.col("saa").cast("double") / nd - ma * ma
    vb = F.col("sbb").cast("double") / nd - mb * mb
    return m.select(
        "n", F.round(cov / (F.sqrt(va) * F.sqrt(vb)), 6).alias("rho")
    )


@query(
    "stat_anova_oneway",
    # One-way ANOVA of events.value across event_type. The value
    # column is quantized once to DECIMAL(18,6) (the proven
    # double->decimal cast both engines share), making every group
    # moment an EXACT decimal: sums in (38,6), sums of squares in
    # (38,12). The cross-group sum of s_g^2/n_g is a FIXED-ORDER fold
    # over the event_type-sorted term list (list_reduce / F.aggregate
    # — one identical double chain): at sf5 the terms reach ~6e10,
    # where the double ulp (7.6e-6) exceeds both a round-9 grain and
    # the round-6 output grain, so the earlier round-9+DECIMAL-sum
    # pattern itself diverged (the engines' round() paths differ by an
    # ulp at that magnitude — caught by the round-7 sf5 window).
    # Outputs are emitted UNROUNDED; the driver rounds symmetrically.
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s_g,
             CAST(sum(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12))
               AS q_g
      FROM events GROUP BY event_type
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS DECIMAL(38,6)) AS s,
             CAST(sum(q_g) AS DECIMAL(38,12)) AS q,
             list_reduce(
               list_prepend(0.0,
                 list(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
                      / CAST(n_g AS DOUBLE) ORDER BY event_type)),
               (a, b) -> a + b) AS sg2
      FROM g
    )
    SELECT k, n,
           sg2 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 / CAST(n AS DOUBLE) AS ss_between,
           CAST(q AS DOUBLE) - sg2 AS ss_within,
           ((sg2 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
             / ((CAST(q AS DOUBLE) - sg2)
                / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))) AS f_stat,
           (sg2 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE))
             / (CAST(q AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(n AS DOUBLE)) AS eta_sq
    FROM m
    """,
)
def stat_anova_oneway(spark, sf_dir):
    """One-way ANOVA: does mean event value differ across event
    types — the k-group generalization of the t-test that an
    experimentation platform runs on every metric. Plan: one groupBy
    on the fact to k rows of exact decimal moments (map-side
    combine), then a 1-row aggregate; the only cross-group float
    total (sum of s_g^2/n_g) is order-safe via the round-9 decimal
    pattern. Emits the full decomposition (SSB, SSW, F, eta^2)."""
    ev = t(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(18,6)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(v).cast("decimal(38,6)").alias("s_g"),
        F.sum(v * v).cast("decimal(38,12)").alias("q_g"),
    )
    sgd = F.col("s_g").cast("double")
    term = sgd * sgd / F.col("n_g").cast("double")
    m = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("decimal(38,6)").alias("s"),
        F.sum("q_g").cast("decimal(38,12)").alias("q"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("event_type"), term.alias("t")))
                ),
                lambda x: x["t"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sg2"),
    )
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    sg2d = F.col("sg2")
    ssb = sg2d - sd * sd / nd
    ssw = qd - sg2d
    sst = qd - sd * sd / nd
    return m.select(
        "k",
        "n",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        ((ssb / (kd - 1.0)) / (ssw / (nd - kd))).alias("f_stat"),
        (ssb / sst).alias("eta_sq"),
    )
