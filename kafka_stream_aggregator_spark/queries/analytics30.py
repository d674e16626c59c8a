"""Round-8 wave 39: parametric Weibull fit of conversion latencies.

The duration relation is user-bounded (one first-view -> first-
purchase gap per converting user), so the probability-plot regression
(ln(-ln(1-F)) on ln(d), median-rank plotting positions) runs on an
aggregate output — the audited allowed shape for a global rank. The
plotting position (10i-3)/(10n+4) is an exact integer ratio; all
per-row log chains are IEEE-identical; regression moments are
quantized to DECIMAL(20,9) pre-sum (the established pattern).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "events_weibull_fit",
    # Weibull probability-plot fit: shape k = slope, scale (hours) =
    # exp(intercept_x_at_y0) = exp(-b/k) where y = k*x + b.
    oracle="""
    WITH fv AS (
      SELECT user_id, min(epoch_us(ts)) AS t0
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), fp AS (
      SELECT user_id, min(epoch_us(ts)) AS t1
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), d AS (
      SELECT fv.user_id,
             CAST(fp.t1 - fv.t0 AS DOUBLE) / 3600000000.0 AS dh
      FROM fv JOIN fp ON fv.user_id = fp.user_id
      WHERE fp.t1 > fv.t0
    ), ranked AS (
      SELECT dh,
             row_number() OVER (ORDER BY dh, user_id) AS i,
             count(*) OVER () AS n
      FROM d
    ), pts AS (
      SELECT ln(dh) AS x,
             ln(-ln(1 - CAST(10 * i - 3 AS DOUBLE) / (10 * n + 4)))
               AS y
      FROM ranked
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(x, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sx,
             CAST(sum(CAST(round(y, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sy,
             CAST(sum(CAST(round(x * y, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS sxy,
             CAST(sum(CAST(round(x * x, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS sxx
      FROM pts
    )
    SELECT k AS n_durations,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
             AS weibull_shape,
           round(exp(-(sy / k - (k * sxy - sx * sy)
                       / (k * sxx - sx * sx) * (sx / k))
                     / ((k * sxy - sx * sy) / (k * sxx - sx * sx))), 6)
             AS weibull_scale_hours
    FROM m WHERE k > 2 AND k * sxx - sx * sx <> 0
    """,
)
def events_weibull_fit(spark, sf_dir):
    """Weibull probability plot over first-view -> first-purchase
    latencies: two per-user min aggregates, a join on the user-bounded
    relation, a global (d, user) rank over that aggregate output,
    exact-rational median-rank positions, quantized regression
    moments, one closed chain for (shape, scale)."""
    ev = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))  # exact integer µs = epoch_us()
    fv = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min(us).alias("t0")
    )
    fp = ev.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.min(us).alias("t1"))
    d = (
        fv.join(fp, "user_id")
        .filter(F.col("t1") > F.col("t0"))
        .select(
            "user_id",
            ((F.col("t1") - F.col("t0")) / 3600000000.0).alias("dh"),
        )
    )
    ranked = d.select(
        "dh",
        F.row_number().over(W.orderBy("dh", "user_id")).alias("i"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    pts = ranked.select(
        F.log("dh").alias("x"),
        F.log(
            -F.log(
                1
                - (10 * F.col("i") - 3).cast("double")
                / (10 * F.col("n") + 4)
            )
        ).alias("y"),
    )
    q9 = lambda c: F.sum(F.round(c, 9).cast("decimal(20,9)")).cast(
        "double"
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        q9(F.col("x")).alias("sx"),
        q9(F.col("y")).alias("sy"),
        q9(F.col("x") * F.col("y")).alias("sxy"),
        q9(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    icept = F.col("sy") / F.col("k") - slope * (F.col("sx") / F.col("k"))
    return m.filter((F.col("k") > 2) & (den != 0)).select(
        F.col("k").alias("n_durations"),
        F.round(slope, 6).alias("weibull_shape"),
        F.round(F.exp(-icept / slope), 6).alias("weibull_scale_hours"),
    )
