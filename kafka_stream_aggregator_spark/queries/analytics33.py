"""Round-8 wave 43: Cochran's Q (k related binary treatments) and the
Atkinson inequality index (epsilon = 1).

Cochran's Q is pure INTEGER algebra end to end (presence matrix,
column/row sums, one closing division). Atkinson(1) = 1 - geomean/
mean needs one quantized log sum beside the DECIMAL-exact revenue
sums — the geometric side follows the established round-9 pre-sum
pattern and every ln argument is strictly positive.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t


@query(
    "stat_cochran_q",
    # Did users engage with the three core event types during the
    # FIRST observed week? Treatments k=3 (view/click/purchase),
    # blocks = users active in that week. Q = k(k-1) * sum_t (C_t -
    # (sum R)/k)^2 / (k*sum(R_u) - sum(R_u^2)) — all integer moments.
    oracle="""
    WITH w AS (
      SELECT min(ts) AS t0 FROM events
    ), x AS (
      SELECT e.user_id,
             CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x_view,
             CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x_click,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS x_purchase
      FROM events e CROSS JOIN w
      WHERE e.ts < w.t0 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_blocks,
             CAST(sum(x_view) AS BIGINT) AS c1,
             CAST(sum(x_click) AS BIGINT) AS c2,
             CAST(sum(x_purchase) AS BIGINT) AS c3,
             CAST(sum(x_view + x_click + x_purchase) AS BIGINT) AS sr,
             CAST(sum((x_view + x_click + x_purchase)
                      * (x_view + x_click + x_purchase)) AS BIGINT)
               AS sr2
      FROM x
    )
    SELECT n_blocks, c1 AS n_view, c2 AS n_click, c3 AS n_purchase,
           round(3.0 * 2
                 * ((c1 - CAST(sr AS DOUBLE) / 3)
                      * (c1 - CAST(sr AS DOUBLE) / 3)
                    + (c2 - CAST(sr AS DOUBLE) / 3)
                      * (c2 - CAST(sr AS DOUBLE) / 3)
                    + (c3 - CAST(sr AS DOUBLE) / 3)
                      * (c3 - CAST(sr AS DOUBLE) / 3))
                 / (3 * sr - sr2), 6) AS cochran_q
    FROM m WHERE 3 * sr - sr2 > 0
    """,
)
def stat_cochran_q(spark, sf_dir):
    """Cochran's Q over the first-week (user x event-type) presence
    matrix: one fact aggregate to the user-bounded relation, BIGINT
    column/row moments, one closing chain."""
    ev = t(spark, sf_dir, "events")
    w = ev.agg(F.min("ts").alias("t0"))
    x = (
        ev.crossJoin(F.broadcast(w))
        .filter(F.col("ts") < F.col("t0") + F.expr("INTERVAL 7 DAY"))
        .groupBy("user_id")
        .agg(
            *[
                F.max(
                    F.when(F.col("event_type") == ty, 1).otherwise(0)
                )
                .cast("bigint")
                .alias(f"x_{ty}")
                for ty in ("view", "click", "purchase")
            ]
        )
    )
    r = F.col("x_view") + F.col("x_click") + F.col("x_purchase")
    m = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("x_view").cast("bigint").alias("c1"),
        F.sum("x_click").cast("bigint").alias("c2"),
        F.sum("x_purchase").cast("bigint").alias("c3"),
        F.sum(r).cast("bigint").alias("sr"),
        F.sum(r * r).cast("bigint").alias("sr2"),
    )
    mu = F.col("sr").cast("double") / 3
    num = (
        (F.col("c1") - mu) * (F.col("c1") - mu)
        + (F.col("c2") - mu) * (F.col("c2") - mu)
        + (F.col("c3") - mu) * (F.col("c3") - mu)
    )
    den = 3 * F.col("sr") - F.col("sr2")
    return m.filter(den > 0).select(
        "n_blocks",
        F.col("c1").alias("n_view"),
        F.col("c2").alias("n_click"),
        F.col("c3").alias("n_purchase"),
        F.round(3.0 * 2 * num / den, 6).alias("cochran_q"),
    )


@query(
    "agg_atkinson_index",
    # Atkinson inequality (epsilon = 1) of supplier revenue per
    # nation: A = 1 - exp(sum(ln x)/n) / (sum(x)/n). Revenue sums are
    # DECIMAL-exact; ln terms quantized DECIMAL(28,9) pre-sum;
    # zero-revenue suppliers excluded on both engines.
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
    ), g AS (
      SELECT n_name,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(x, 2) AS DECIMAL(20,2))) AS DOUBLE)
               AS sx,
             CAST(sum(CAST(round(ln(x), 9) AS DECIMAL(28,9)))
                  AS DOUBLE) AS slnx
      FROM sn GROUP BY n_name
    )
    SELECT n_name, n AS n_suppliers,
           round(greatest(0, 1 - round(exp(slnx / n), 6) / (sx / n)), 6)
             AS atkinson_1
    FROM g WHERE n > 0 AND sx > 0
    """,
)
def agg_atkinson_index(spark, sf_dir):
    """Atkinson(1) per nation = 1 - geometric/arithmetic mean ratio of
    supplier revenue: one fact shuffle, broadcast dims, a quantized
    log sum beside the exact decimal sum, one closing chain."""
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
    g = sn.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("x"), 2).cast("decimal(20,2)"))
        .cast("double")
        .alias("sx"),
        F.sum(F.round(F.log("x"), 9).cast("decimal(28,9)"))
        .cast("double")
        .alias("slnx"),
    )
    # Cross-libm hardening (driver r8 hash-FAIL, VERDICT r8 item 1):
    # exp() is the one libm call in the closing chain; a 1-ulp delta
    # between the two engines' libm at geometric-mean magnitude
    # ~1e5-1e7 (ulp <= 2e-9) can cross the terminating-decimal tie of
    # the final 6-dp round. Quantize the geometric mean at 6 dp on
    # BOTH engines (250x margin: ulp 2e-9 << 5e-7 half-grain) before
    # the ratio — the ml_poisson_irls precedent (ROUND9_AUDIT_r08.md).
    # Negative-zero hardening (driver r8+r10 hash-FAIL, VERDICT r10
    # item 1): the 6-dp-quantized geometric mean can exceed the
    # arithmetic mean by ~1e-10, making the pre-round value tiny
    # negative; Spark round(-eps, 6) emits +0.0 (BigDecimal has no
    # -0) while DuckDB emits -0.0, and the driver's typed hash is
    # sign-aware. Atkinson(1) >= 0 by definition, so clamping with
    # greatest(0, .) on BOTH engines is semantics, not a fudge.
    return g.filter((F.col("n") > 0) & (F.col("sx") > 0)).select(
        "n_name",
        F.col("n").alias("n_suppliers"),
        F.round(
            F.greatest(
                F.lit(0.0),
                1
                - F.round(F.exp(F.col("slnx") / F.col("n")), 6)
                / (F.col("sx") / F.col("n")),
            ),
            6,
        ).alias("atkinson_1"),
    )
