"""Round-8 wave 36: a depth-2 CART regression tree fit relationally,
and binary-segmentation changepoint detection on the hourly series.

Both reduce to EXACT moment relations: the tree's split search runs on
the 24-row (hour-of-day, n, S, SS) relation with DECIMAL-exact value
sums; the changepoint scan runs on BIGINT prefix sums of the hourly
count series. Every SSE is a closed IEEE chain on exact inputs, and
every argmin/argmax tie-breaks on the split position, so both engines
pick identical structure.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


# --------------------------------------------------------------------------
# Depth-2 regression tree on hour-of-day -> value
# --------------------------------------------------------------------------


@query(
    "ml_regression_tree_depth2",
    # CART with feature x = hour-of-day (candidate splits x <= t,
    # t in 1..21 so every child keeps >= 2 hours) and target value.
    # Stage 1: the 24-row (hr, n, S, SS) moment relation (S, SS
    # DECIMAL-exact). Stage 2: prefix sums -> per-candidate
    # SSE_left + SSE_right, argmin by (sse, t). Stage 3: the same
    # search inside each child. Output: one row per leaf with its
    # hour range, n, mean, sse.
    oracle="""
    WITH hm AS (
      SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS s,
             sum(CAST(value AS DECIMAL(18,2))
                 * CAST(value AS DECIMAL(18,2))) AS ss
      FROM events GROUP BY hr
    ), pre AS (
      SELECT hr,
             sum(n)  OVER w AS cn,
             sum(s)  OVER w AS cs,
             sum(ss) OVER w AS css,
             sum(n)  OVER () AS tn,
             sum(s)  OVER () AS ts_,
             sum(ss) OVER () AS tss
      FROM hm
      WINDOW w AS (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ), cand AS (
      SELECT hr AS t,
             CAST(css AS DOUBLE)
               - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / cn
             + (CAST(tss - css AS DOUBLE)
               - CAST(ts_ - cs AS DOUBLE) * CAST(ts_ - cs AS DOUBLE)
                 / (tn - cn)) AS sse
      FROM pre WHERE hr BETWEEN 1 AND 21
    ), root AS (
      SELECT t AS t0 FROM cand ORDER BY sse, t LIMIT 1
    ), sides AS (
      SELECT hm.*, CASE WHEN hm.hr <= root.t0 THEN 'L' ELSE 'R' END
               AS side, root.t0
      FROM hm CROSS JOIN root
    ), spre AS (
      SELECT side, hr, t0,
             sum(n)  OVER w AS cn,
             sum(s)  OVER w AS cs,
             sum(ss) OVER w AS css,
             sum(n)  OVER sw AS tn,
             sum(s)  OVER sw AS ts_,
             sum(ss) OVER sw AS tss,
             max(hr) OVER sw AS hi
      FROM sides
      WINDOW w AS (PARTITION BY side ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             sw AS (PARTITION BY side)
    ), scand AS (
      SELECT side, hr AS t, t0,
             CAST(css AS DOUBLE)
               - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / cn
             + (CAST(tss - css AS DOUBLE)
               - CAST(ts_ - cs AS DOUBLE) * CAST(ts_ - cs AS DOUBLE)
                 / (tn - cn)) AS sse
      FROM spre WHERE hr < hi
    ), child AS (
      SELECT side, t AS t1 FROM (
        SELECT side, t, row_number() OVER (PARTITION BY side
                                           ORDER BY sse, t) AS rn
        FROM scand) z
      WHERE rn = 1
    ), leaves AS (
      SELECT s.side || CASE WHEN s.hr <= c.t1 THEN 'L' ELSE 'R' END
               AS leaf,
             s.n, s.s, s.ss, s.hr
      FROM sides s JOIN child c ON s.side = c.side
    )
    SELECT leaf,
           CAST(min(hr) AS BIGINT) AS hr_lo,
           CAST(max(hr) AS BIGINT) AS hr_hi,
           CAST(sum(n) AS BIGINT) AS n,
           round(CAST(sum(s) AS DOUBLE) / sum(n), 6) AS mean_value,
           round(CAST(sum(ss) AS DOUBLE)
                 - CAST(sum(s) AS DOUBLE) * CAST(sum(s) AS DOUBLE)
                   / sum(n), 6) AS sse
    FROM leaves GROUP BY leaf
    """,
)
def ml_regression_tree_depth2(spark, sf_dir):
    """Depth-2 CART: ONE fact-sized aggregate to the 24-row hour
    moment relation; both split searches are prefix-sum scans over it
    (never a re-scan of the data per candidate). Leaves report range,
    n, mean, SSE from the exact decimal moments."""
    ev = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    hm = ev.groupBy(
        F.hour("ts").cast("bigint").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("ss"),
    )
    wrun = W.orderBy("hr").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy()
    pre = hm.select(
        "hr",
        F.sum("n").over(wrun).alias("cn"),
        F.sum("s").over(wrun).alias("cs"),
        F.sum("ss").over(wrun).alias("css"),
        F.sum("n").over(wall).alias("tn"),
        F.sum("s").over(wall).alias("ts_"),
        F.sum("ss").over(wall).alias("tss"),
    )

    def sse_expr():
        left = F.col("css").cast("double") - F.col("cs").cast(
            "double"
        ) * F.col("cs").cast("double") / F.col("cn")
        rs = (F.col("ts_") - F.col("cs")).cast("double")
        right = (F.col("tss") - F.col("css")).cast("double") - rs * rs / (
            F.col("tn") - F.col("cn")
        )
        return left + right

    cand = pre.filter(
        (F.col("hr") >= 1) & (F.col("hr") <= 21)
    ).select(F.col("hr").alias("t"), sse_expr().alias("sse"))
    root = cand.orderBy("sse", "t").limit(1).select(
        F.col("t").alias("t0")
    )
    sides = hm.crossJoin(F.broadcast(root)).withColumn(
        "side", F.when(F.col("hr") <= F.col("t0"), "L").otherwise("R")
    )
    wside_run = (
        W.partitionBy("side").orderBy("hr").rowsBetween(
            W.unboundedPreceding, 0
        )
    )
    wside = W.partitionBy("side")
    spre = sides.select(
        "side",
        "hr",
        F.sum("n").over(wside_run).alias("cn"),
        F.sum("s").over(wside_run).alias("cs"),
        F.sum("ss").over(wside_run).alias("css"),
        F.sum("n").over(wside).alias("tn"),
        F.sum("s").over(wside).alias("ts_"),
        F.sum("ss").over(wside).alias("tss"),
        F.max("hr").over(wside).alias("hi"),
    )
    scand = spre.filter(F.col("hr") < F.col("hi")).select(
        "side", F.col("hr").alias("t"), sse_expr().alias("sse")
    )
    child = (
        scand.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("side").orderBy("sse", "t")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("side", F.col("t").alias("t1"))
    )
    leaves = sides.join(F.broadcast(child), "side").select(
        F.concat(
            F.col("side"),
            F.when(F.col("hr") <= F.col("t1"), "L").otherwise("R"),
        ).alias("leaf"),
        "n",
        "s",
        "ss",
        "hr",
    )
    return leaves.groupBy("leaf").agg(
        F.min("hr").cast("bigint").alias("hr_lo"),
        F.max("hr").cast("bigint").alias("hr_hi"),
        F.sum("n").cast("bigint").alias("n"),
        F.round(
            F.sum("s").cast("double") / F.sum("n"), 6
        ).alias("mean_value"),
        F.round(
            F.sum("ss").cast("double")
            - F.sum("s").cast("double")
            * F.sum("s").cast("double")
            / F.sum("n"),
            6,
        ).alias("sse"),
    )


# --------------------------------------------------------------------------
# Binary-segmentation changepoint on the hourly count series
# --------------------------------------------------------------------------


@query(
    "ts_binary_segmentation",
    # One binary-segmentation step per event_type: the split k
    # maximizing SSE(total) - SSE(left) - SSE(right) over the hourly
    # count series, from BIGINT prefix sums (cum n/S/SS); argmax
    # tie-breaks on the earliest position. Reports the split hour,
    # segment means, and the SSE reduction.
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, hr
    ), pre AS (
      SELECT event_type, hr,
             row_number() OVER w2 AS x,
             sum(c)     OVER w AS cs,
             sum(c * c) OVER w AS css,
             count(*)   OVER sw AS n,
             sum(c)     OVER sw AS ts_,
             sum(c * c) OVER sw AS tss
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             w2 AS (PARTITION BY event_type ORDER BY hr),
             sw AS (PARTITION BY event_type)
    ), cand AS (
      SELECT event_type, hr, x, n, cs, ts_,
             (CAST(tss AS DOUBLE)
               - CAST(ts_ AS DOUBLE) * CAST(ts_ AS DOUBLE) / n)
             - (CAST(css AS DOUBLE)
               - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / x)
             - (CAST(tss - css AS DOUBLE)
               - CAST(ts_ - cs AS DOUBLE) * CAST(ts_ - cs AS DOUBLE)
                 / (n - x)) AS reduction
      FROM pre WHERE x < n
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           CAST(hr AS BIGINT) AS split_hr,
           CAST(x AS BIGINT) AS split_pos,
           round(CAST(cs AS DOUBLE) / x, 6) AS mean_left,
           round(CAST(ts_ - cs AS DOUBLE) / (n - x), 6) AS mean_right,
           round(reduction, 6) AS sse_reduction
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY reduction DESC, x) AS rn
      FROM cand) z
    WHERE rn = 1
    """,
)
def ts_binary_segmentation(spark, sf_dir):
    """One binary-segmentation step: prefix BIGINT moments over the
    bounded hourly relation, per-candidate SSE-reduction chains, and a
    deterministic (reduction DESC, position) argmax — no per-candidate
    re-scan, no float accumulation."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 3600)
        .cast("bigint")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    worder = W.partitionBy("event_type").orderBy("hr")
    wrun = worder.rowsBetween(W.unboundedPreceding, 0)
    wside = W.partitionBy("event_type")
    pre = hourly.select(
        "event_type",
        "hr",
        F.row_number().over(worder).cast("bigint").alias("x"),
        F.sum("c").over(wrun).alias("cs"),
        F.sum(F.col("c") * F.col("c")).over(wrun).alias("css"),
        F.count(F.lit(1)).over(wside).cast("bigint").alias("n"),
        F.sum("c").over(wside).alias("ts_"),
        F.sum(F.col("c") * F.col("c")).over(wside).alias("tss"),
    )
    total = F.col("tss").cast("double") - F.col("ts_").cast(
        "double"
    ) * F.col("ts_").cast("double") / F.col("n")
    left = F.col("css").cast("double") - F.col("cs").cast(
        "double"
    ) * F.col("cs").cast("double") / F.col("x")
    rsum = (F.col("ts_") - F.col("cs")).cast("double")
    right = (F.col("tss") - F.col("css")).cast("double") - rsum * rsum / (
        F.col("n") - F.col("x")
    )
    cand = pre.filter(F.col("x") < F.col("n")).withColumn(
        "reduction", total - left - right
    )
    best = cand.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(
                F.desc("reduction"), F.col("x")
            )
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("hr").alias("split_hr"),
        F.col("x").alias("split_pos"),
        F.round(F.col("cs").cast("double") / F.col("x"), 6).alias(
            "mean_left"
        ),
        F.round(
            (F.col("ts_") - F.col("cs")).cast("double")
            / (F.col("n") - F.col("x")),
            6,
        ).alias("mean_right"),
        F.round("reduction", 6).alias("sse_reduction"),
    )
