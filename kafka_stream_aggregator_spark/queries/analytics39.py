"""Round-9 wave 52: directional statistics and drift detection.

stat_circular_hours treats hour-of-day as an angle (directional
statistics): the resultant length and Rayleigh test come from 24-cell
counts-tier sums of cos/sin at the 24 FIXED angles — libm cos/sin on
identical O(1) inputs, quantized round-9 DECIMAL per cell before the
bounded sum (the final-emission audit discipline).
events_page_hinkley is the classic drift detector on the hourly count
series, formulated PURELY in BIGINT: integer-floor mean (the ARCH LM
trick), integer drift margin, integer prefix extrema.
"""

from __future__ import annotations

import math

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "stat_circular_hours",
    # Per event type: circular mean hour, resultant length R-bar and
    # the Rayleigh uniformity statistic z = n * R-bar^2 over the
    # hour-of-day distribution. C = sum_h n_h cos(2 pi h / 24),
    # S likewise; cells quantized round-9 DECIMAL pre-sum (24 terms).
    # atan2 is avoided (cross-libm): the mean hour is reported via
    # the cell-argmax-free identity only when needed — here we emit
    # C, S normalized plus R-bar and z, all closed chains.
    oracle="""
    WITH hc AS (
      SELECT event_type,
             CAST(extract(hour FROM ts) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, hr
    ), m AS (
      SELECT event_type,
             CAST(sum(n) AS BIGINT) AS nt,
             CAST(sum(CAST(round(n * cos(2 * pi() * hr / 24), 9)
                           AS DECIMAL(28,9))) AS DOUBLE) AS c,
             CAST(sum(CAST(round(n * sin(2 * pi() * hr / 24), 9)
                           AS DECIMAL(28,9))) AS DOUBLE) AS s
      FROM hc GROUP BY event_type
    )
    SELECT event_type, nt AS n_events,
           round(c / nt, 6) AS mean_cos,
           round(s / nt, 6) AS mean_sin,
           round(sqrt(c * c + s * s) / nt, 6) AS resultant_length,
           round(nt * (c * c + s * s) / (CAST(nt AS DOUBLE) * nt), 6)
             AS rayleigh_z
    FROM m WHERE nt > 0
    """,
)
def stat_circular_hours(spark, sf_dir):
    """Directional stats from the 24-cell counts tier: fixed-angle
    cos/sin terms quantized DECIMAL, closed R-bar / Rayleigh chains
    (sqrt exact, trig at O(1) on 24 shared constants)."""
    ev = t(spark, sf_dir, "events")
    hc = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ang = 2 * math.pi * F.col("hr") / 24
    m = hc.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum(
            F.round(F.col("n") * F.cos(ang), 9).cast("decimal(28,9)")
        )
        .cast("double")
        .alias("c"),
        F.sum(
            F.round(F.col("n") * F.sin(ang), 9).cast("decimal(28,9)")
        )
        .cast("double")
        .alias("s"),
    )
    nt = F.col("nt")
    c, s = F.col("c"), F.col("s")
    return m.filter(nt > 0).select(
        "event_type",
        nt.alias("n_events"),
        F.round(c / nt, 6).alias("mean_cos"),
        F.round(s / nt, 6).alias("mean_sin"),
        F.round(F.sqrt(c * c + s * s) / nt, 6).alias(
            "resultant_length"
        ),
        F.round(
            nt * (c * c + s * s) / (nt.cast("double") * nt), 6
        ).alias("rayleigh_z"),
    )


@query(
    "events_page_hinkley",
    # Page-Hinkley drift detector on the hourly count series, pure
    # BIGINT: m_t = cumsum(x_t - floor(mean) - delta) with integer
    # drift margin delta = 2; PH = max prefix - min prefix; the
    # detector fires where the gap first exceeds an integer lambda.
    # Scaled-integer formulation means nothing can diverge across
    # engines — the drift MONITORING op every training pipeline runs
    # on its feature streams.
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY hr
    ), mu AS (
      SELECT CAST(floor(CAST(sum(y) AS DOUBLE) / count(*)) AS BIGINT)
        AS m FROM hourly
    ), c AS (
      SELECT hr,
             sum(y - m - 2) OVER (ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS mt
      FROM hourly CROSS JOIN mu
    ), agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hours,
             CAST(max(mt) AS BIGINT) AS mt_max,
             CAST(min(mt) AS BIGINT) AS mt_min
      FROM c
    ), fire AS (
      SELECT min(hr) AS first_alarm_hr FROM (
        SELECT hr, mt,
               max(mt) OVER (ORDER BY hr
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS run_max
        FROM c) z
      WHERE run_max - mt > 500
    )
    SELECT n_hours, mt_max, mt_min,
           CAST(mt_max - mt_min AS BIGINT) AS ph_range,
           CAST(first_alarm_hr AS BIGINT) AS first_alarm_hr
    FROM agg CROSS JOIN fire
    """,
)
def events_page_hinkley(spark, sf_dir):
    """Page-Hinkley: integer-floor mean, integer cumulative
    deviations (BIGINT prefix sums), running-max gap alarm — one
    hourly aggregate and two ordered windows over the bounded
    series."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 3600)
        .cast("bigint")
        .alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    mu = hourly.agg(
        F.floor(F.sum("y").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("m")
    )
    wc = W.orderBy("hr").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = hourly.crossJoin(F.broadcast(mu)).select(
        "hr",
        F.sum(F.col("y") - F.col("m") - 2).over(wc).alias("mt"),
    )
    agg = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.max("mt").cast("bigint").alias("mt_max"),
        F.min("mt").cast("bigint").alias("mt_min"),
    )
    z = c.select(
        "hr", "mt", F.max("mt").over(wc).alias("run_max")
    )
    fire = z.filter(F.col("run_max") - F.col("mt") > 500).agg(
        F.min("hr").alias("first_alarm_hr")
    )
    return agg.crossJoin(fire).select(
        "n_hours",
        "mt_max",
        "mt_min",
        (F.col("mt_max") - F.col("mt_min"))
        .cast("bigint")
        .alias("ph_range"),
        F.col("first_alarm_hr").cast("bigint").alias("first_alarm_hr"),
    )


@query(
    "ts_haar_energy",
    # Unnormalized Haar wavelet decomposition (3 unrolled levels) of
    # the hourly count series per event type: detail d = x_even -
    # x_odd, approx a = x_even + x_odd at each level — PURE INTEGER
    # pairwise sums over a dense row_number index (epoch-hour gaps
    # don't break pairing), detail energy per level = sum d^2 as
    # BIGINT. The multi-resolution energy split localizes WHERE the
    # series' variance lives (fast vs slow structure).
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, hr
    ), s0 AS (
      SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type ORDER BY hr)
               - 1 AS i
      FROM hourly
    ), l1 AS (
      SELECT event_type, i // 2 AS i,
             CAST(sum(CASE WHEN i % 2 = 0 THEN y ELSE -y END)
                  AS BIGINT) AS d,
             CAST(sum(y) AS BIGINT) AS a,
             count(*) AS cnt
      FROM s0 GROUP BY event_type, i // 2
    ), l2 AS (
      SELECT event_type, i // 2 AS i,
             CAST(sum(CASE WHEN i % 2 = 0 THEN a ELSE -a END)
                  AS BIGINT) AS d,
             CAST(sum(a) AS BIGINT) AS a,
             count(*) AS cnt
      FROM l1 WHERE cnt = 2 GROUP BY event_type, i // 2
    ), l3 AS (
      SELECT event_type, i // 2 AS i,
             CAST(sum(CASE WHEN i % 2 = 0 THEN a ELSE -a END)
                  AS BIGINT) AS d,
             count(*) AS cnt
      FROM l2 WHERE cnt = 2 GROUP BY event_type, i // 2
    )
    SELECT e1.event_type,
           CAST(e1.e AS BIGINT) AS energy_l1,
           CAST(e2.e AS BIGINT) AS energy_l2,
           CAST(e3.e AS BIGINT) AS energy_l3
    FROM (SELECT event_type, sum(d * d) AS e FROM l1 WHERE cnt = 2
          GROUP BY event_type) e1
    JOIN (SELECT event_type, sum(d * d) AS e FROM l2 WHERE cnt = 2
          GROUP BY event_type) e2 USING (event_type)
    JOIN (SELECT event_type, sum(d * d) AS e FROM l3 WHERE cnt = 2
          GROUP BY event_type) e3 USING (event_type)
    """,
)
def ts_haar_energy(spark, sf_dir):
    """Three Haar levels as three bounded pair-aggregates over a
    dense index; odd tails dropped per level (cnt = 2 guard); all
    energies exact BIGINT."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 3600)
        .cast("bigint")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    w = W.partitionBy("event_type").orderBy("hr")
    s0 = hourly.select(
        "event_type",
        "y",
        (F.row_number().over(w) - 1).alias("i"),
    )

    def level(df, val):
        sign = F.when(F.col("i") % 2 == 0, F.col(val)).otherwise(
            -F.col(val)
        )
        return df.groupBy(
            "event_type", (F.col("i") / 2).cast("bigint").alias("i")
        ).agg(
            F.sum(sign).cast("bigint").alias("d"),
            F.sum(val).cast("bigint").alias("a"),
            F.count(F.lit(1)).alias("cnt"),
        )

    l1 = level(s0, "y")
    l2 = level(l1.filter(F.col("cnt") == 2), "a")
    l3 = level(l2.filter(F.col("cnt") == 2), "a")

    def energy(df, name):
        return (
            df.filter(F.col("cnt") == 2)
            .groupBy("event_type")
            .agg(
                F.sum(F.col("d") * F.col("d"))
                .cast("bigint")
                .alias(name)
            )
        )

    return (
        energy(l1, "energy_l1")
        .join(energy(l2, "energy_l2"), "event_type")
        .join(energy(l3, "energy_l3"), "event_type")
    )
