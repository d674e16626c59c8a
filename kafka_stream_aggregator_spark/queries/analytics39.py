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


@query(
    "ts_matrix_profile",
    # Matrix-profile-lite motif discovery over the daily count
    # series: subsequences of length 4 (integer vectors via 3 leads),
    # UN-normalized squared Euclidean distance (stays exact BIGINT),
    # per-window nearest-neighbor distance (the matrix profile), the
    # global motif pair by (distance, i, j), and profile summary
    # stats. The all-pairs join is bounded by days^2 (the series is
    # calendar-bounded, not data-bounded — ~9M integer ops at sf5);
    # production uses banded/bucketed pruning at larger horizons.
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY day
    ), s AS (
      SELECT row_number() OVER (ORDER BY day) AS i, y,
             lead(y, 1) OVER (ORDER BY day) AS y1,
             lead(y, 2) OVER (ORDER BY day) AS y2,
             lead(y, 3) OVER (ORDER BY day) AS y3
      FROM daily
    ), w AS (
      SELECT i, y, y1, y2, y3 FROM s WHERE y3 IS NOT NULL
    ), d AS (
      SELECT a.i AS i, b.i AS j,
             (a.y - b.y) * (a.y - b.y)
             + (a.y1 - b.y1) * (a.y1 - b.y1)
             + (a.y2 - b.y2) * (a.y2 - b.y2)
             + (a.y3 - b.y3) * (a.y3 - b.y3) AS d2
      FROM w a JOIN w b ON abs(a.i - b.i) >= 4
    ), mp AS (
      SELECT i, CAST(min(d2) AS BIGINT) AS nnd FROM d GROUP BY i
    ), motif AS (
      SELECT i, j, CAST(d2 AS BIGINT) AS d2 FROM d
      WHERE i < j ORDER BY d2, i, j LIMIT 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_windows,
           CAST(min(nnd) AS BIGINT) AS mp_min,
           CAST(max(nnd) AS BIGINT) AS mp_max,
           CAST(sum(nnd) AS BIGINT) AS mp_sum,
           CAST(max(motif.i) AS BIGINT) AS motif_i,
           CAST(max(motif.j) AS BIGINT) AS motif_j,
           CAST(max(motif.d2) AS BIGINT) AS motif_d2
    FROM mp CROSS JOIN motif
    """,
)
def ts_matrix_profile(spark, sf_dir):
    """Matrix profile: 3 leads build the window vectors, one
    exclusion-zone self-join (|i-j| >= window) computes exact integer
    distances, a per-window min is the profile, a total-order LIMIT 1
    is the motif."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 86400)
        .cast("bigint")
        .alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    wd = W.orderBy("day")
    s = daily.select(
        F.row_number().over(wd).alias("i"),
        "y",
        F.lead("y", 1).over(wd).alias("y1"),
        F.lead("y", 2).over(wd).alias("y2"),
        F.lead("y", 3).over(wd).alias("y3"),
    ).filter(F.col("y3").isNotNull())
    a = s.select(
        F.col("i").alias("ia"),
        F.col("y").alias("a0"),
        F.col("y1").alias("a1"),
        F.col("y2").alias("a2"),
        F.col("y3").alias("a3"),
    )
    b = s.select(
        F.col("i").alias("jb"),
        F.col("y").alias("b0"),
        F.col("y1").alias("b1"),
        F.col("y2").alias("b2"),
        F.col("y3").alias("b3"),
    )
    d2 = (
        (F.col("a0") - F.col("b0")) * (F.col("a0") - F.col("b0"))
        + (F.col("a1") - F.col("b1")) * (F.col("a1") - F.col("b1"))
        + (F.col("a2") - F.col("b2")) * (F.col("a2") - F.col("b2"))
        + (F.col("a3") - F.col("b3")) * (F.col("a3") - F.col("b3"))
    )
    d = a.join(
        b, F.abs(F.col("ia") - F.col("jb")) >= 4
    ).select(F.col("ia").alias("i"), F.col("jb").alias("j"), d2.alias("d2"))
    mp = d.groupBy("i").agg(F.min("d2").cast("bigint").alias("nnd"))
    motif = (
        d.filter(F.col("i") < F.col("j"))
        .orderBy("d2", "i", "j")
        .limit(1)
        .select(
            F.col("i").alias("mi"),
            F.col("j").alias("mj"),
            F.col("d2").cast("bigint").alias("md2"),
        )
    )
    return mp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.min("nnd").cast("bigint").alias("mp_min"),
        F.max("nnd").cast("bigint").alias("mp_max"),
        F.sum("nnd").cast("bigint").alias("mp_sum"),
    ).crossJoin(F.broadcast(motif)).select(
        "n_windows",
        "mp_min",
        "mp_max",
        "mp_sum",
        F.col("mi").cast("bigint").alias("motif_i"),
        F.col("mj").cast("bigint").alias("motif_j"),
        F.col("md2").alias("motif_d2"),
    )


@query(
    "stat_ratio_metric_delta",
    # Delta-method standard error for a RATIO metric (the A/B-testing
    # classic: revenue per event, with USERS as the randomization
    # unit — naive per-event variance is wrong because events within
    # a user correlate). R = sum(x_u) / sum(y_u) over per-user totals
    # x (value sum, DECIMAL-exact) and y (event count); var(R) ~
    # (var_x + R^2 var_y - 2 R cov_xy) / (n ybar^2). Moments are
    # DECIMAL/BIGINT-exact; one closing chain per event type.
    oracle="""
    WITH u AS (
      SELECT event_type, user_id,
             sum(CAST(round(value, 2) AS DECIMAL(18,2))) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, user_id
    ), m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS BIGINT) AS sy_,
             CAST(sum(CAST(x AS DECIMAL(24,2)) * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(CAST(x AS DECIMAL(24,2)) * y) AS DOUBLE) AS sxy
      FROM u GROUP BY event_type
    ), r AS (
      SELECT event_type, n, sx, sy_,
             sx / sy_ AS ratio,
             (sxx - sx * sx / n) / (n - 1) AS vx,
             (CAST(syy AS DOUBLE) - CAST(sy_ AS DOUBLE) * sy_ / n)
               / (n - 1) AS vy,
             (sxy - sx * CAST(sy_ AS DOUBLE) / n) / (n - 1) AS cxy
      FROM m WHERE n > 1 AND sy_ > 0
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_users,
           round(ratio, 6) AS ratio,
           round(sqrt((vx + ratio * ratio * vy - 2 * ratio * cxy)
                      / (n * (CAST(sy_ AS DOUBLE) / n)
                           * (CAST(sy_ AS DOUBLE) / n))), 6)
             AS delta_se
    FROM r
    WHERE (vx + ratio * ratio * vy - 2 * ratio * cxy) >= 0
    """,
)
def stat_ratio_metric_delta(spark, sf_dir):
    """Ratio-metric delta SE with user-level randomization units:
    one per-user aggregate (DECIMAL x, integer y), one moment
    aggregate per type, one closed chain (sqrt exact)."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    )
    m = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("bigint").alias("sy_"),
        F.sum(F.col("x").cast("decimal(24,2)") * F.col("x"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x").cast("decimal(24,2)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
    )
    n = F.col("n")
    nd = n.cast("double")
    sx = F.col("sx")
    syd = F.col("sy_").cast("double")
    ratio = sx / F.col("sy_")
    vx = (F.col("sxx") - sx * sx / n) / (n - 1)
    vy = (F.col("syy").cast("double") - syd * F.col("sy_") / n) / (
        n - 1
    )
    cxy = (F.col("sxy") - sx * syd / n) / (n - 1)
    r = m.filter((n > 1) & (F.col("sy_") > 0)).select(
        "event_type",
        "n",
        "sy_",
        ratio.alias("ratio"),
        vx.alias("vx"),
        vy.alias("vy"),
        cxy.alias("cxy"),
    )
    num = (
        F.col("vx")
        + F.col("ratio") * F.col("ratio") * F.col("vy")
        - 2 * F.col("ratio") * F.col("cxy")
    )
    ybar = F.col("sy_").cast("double") / F.col("n")
    return r.filter(num >= 0).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_users"),
        F.round("ratio", 6).alias("ratio"),
        F.round(
            F.sqrt(num / (F.col("n") * ybar * ybar)), 6
        ).alias("delta_se"),
    )


@query(
    "join_asof_nearest",
    # pandas merge_asof(direction='nearest'): each purchase matches
    # its time-NEAREST click (either direction), backward winning
    # exact ties. Two linear as-of passes (the backward helper, and
    # the same helper on NEGATED microseconds for forward) — still
    # one group-key shuffle each, never a pairwise time join; the
    # oracle replays with a rank over the pair join (affordable at
    # oracle scale only).
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         j AS (
           SELECT p.event_id AS pid, c.value AS cv,
                  abs(epoch_us(p.ts) - epoch_us(c.ts)) AS gap,
                  row_number() OVER (
                    PARTITION BY p.event_id
                    ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)),
                             CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END,
                             c.event_id DESC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id
         )
    SELECT p.event_id,
           CAST(coalesce(j.gap, -1) AS BIGINT) AS gap_us,
           round(coalesce(j.cv, -1.0), 6) AS nearest_click_value
    FROM p LEFT JOIN (SELECT pid, cv, gap FROM j WHERE rn = 1) j
      ON p.event_id = j.pid
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest as-of: backward pass + forward pass (negated-time
    trick reuses the SAME linear backward helper), pick the smaller
    gap, backward on ties. Both passes are union+last_value scans —
    the sort-scaling shape."""
    from ..ops import asof_join

    e = t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.unix_micros("ts").alias("us"),
        (-F.unix_micros("ts")).alias("neg_us"),
    )
    rbase = e.filter(F.col("event_type") == "click")

    def side(neg):
        on = (-F.unix_micros("ts")).alias("r_on") if neg else (
            F.unix_micros("ts").alias("r_on")
        )
        return rbase.select(
            F.col("user_id").alias("r_user_id"),
            on,
            F.col("event_id").alias("r_event_id"),
            F.col("value").alias("r_value"),
            F.unix_micros("ts").alias("r_us"),
        )

    back = asof_join(
        left.withColumn("l_on", F.col("us")),
        side(False),
        left_on="l_on", right_on="r_on",
        left_by="user_id", right_by="r_user_id",
        right_tiebreak="r_event_id",
        value_cols=["r_value", "r_us"],
    ).select(
        "event_id", "us",
        F.col("r_value").alias("bv"), F.col("r_us").alias("bus"),
    )
    fwd = asof_join(
        left.withColumn("l_on", F.col("neg_us")),
        side(True),
        left_on="l_on", right_on="r_on",
        left_by="user_id", right_by="r_user_id",
        right_tiebreak="r_event_id",
        value_cols=["r_value", "r_us"],
    ).select(
        F.col("event_id").alias("f_event_id"),
        F.col("r_value").alias("fv"), F.col("r_us").alias("fus"),
    )
    m = back.join(fwd, back.event_id == fwd.f_event_id, "left")
    bgap = F.col("us") - F.col("bus")
    fgap = F.col("fus") - F.col("us")
    use_back = F.col("bus").isNotNull() & (
        F.col("fus").isNull() | (bgap <= fgap)
    )
    gap = F.when(use_back, bgap).otherwise(fgap)
    val = F.when(use_back, F.col("bv")).otherwise(F.col("fv"))
    matched = F.col("bus").isNotNull() | F.col("fus").isNotNull()
    return m.select(
        "event_id",
        F.when(matched, gap).otherwise(F.lit(-1))
        .cast("bigint")
        .alias("gap_us"),
        F.round(
            F.when(matched, val).otherwise(F.lit(-1.0)), 6
        ).alias("nearest_click_value"),
    )


@query(
    "ml_naive_bayes_gaussian",
    # Gaussian naive Bayes over the numeric feature (value): per-class
    # mean/variance from exact DECIMAL moments, log-densities scored
    # on the bounded eval slice (event_id < 2000), argmax by
    # round-9-QUANTIZED score (the langid discipline: a 1-ulp libm ln
    # delta cannot flip a quantized argmax; exact quantized ties break
    # on the class name). Emits the confusion-count table.
    oracle="""
    WITH m AS (
      SELECT event_type AS cls,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2)))
                  AS DOUBLE) AS s,
             CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))
                      * CAST(round(value, 2) AS DECIMAL(18,2)))
                  AS DOUBLE) AS ss
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM m), par AS (
      SELECT cls, n, s / n AS mu,
             (ss - s * s / n) / (n - 1) AS v,
             CAST(n AS DOUBLE) / nt AS prior
      FROM m CROSS JOIN tot WHERE n > 1
    ), ev AS (
      SELECT event_id, event_type AS truth,
             CAST(round(value, 2) AS DOUBLE) AS x
      FROM events WHERE value IS NOT NULL AND event_id < 2000
    ), sc AS (
      SELECT ev.event_id, ev.truth, par.cls,
             round(ln(par.prior) - 0.5 * ln(par.v)
                   - (ev.x - par.mu) * (ev.x - par.mu)
                     / (2 * par.v), 9) AS score
      FROM ev CROSS JOIN par WHERE par.v > 0
    ), pred AS (
      SELECT event_id, truth, cls AS predicted FROM (
        SELECT *, row_number() OVER (PARTITION BY event_id
                  ORDER BY score DESC, cls) AS rn
        FROM sc) z
      WHERE rn = 1
    )
    SELECT truth, predicted, CAST(count(*) AS BIGINT) AS n
    FROM pred GROUP BY truth, predicted
    """,
)
def ml_naive_bayes_gaussian(spark, sf_dir):
    """Gaussian NB: one exact per-class moment aggregate (broadcast),
    a cross join over the bounded eval slice, quantized log-density
    argmax, confusion counts."""
    ev0 = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    dec = F.round("value", 2).cast("decimal(18,2)")
    m = ev0.groupBy(F.col("event_type").alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec).cast("double").alias("s"),
        F.sum(dec * dec).cast("double").alias("ss"),
    )
    tot = m.agg(F.sum("n").cast("bigint").alias("nt"))
    n = F.col("n")
    par = (
        m.crossJoin(F.broadcast(tot))
        .filter(n > 1)
        .select(
            "cls",
            (F.col("s") / n).alias("mu"),
            ((F.col("ss") - F.col("s") * F.col("s") / n) / (n - 1))
            .alias("v"),
            (n.cast("double") / F.col("nt")).alias("prior"),
        )
        .filter(F.col("v") > 0)
    )
    evs = ev0.filter(F.col("event_id") < 2000).select(
        "event_id",
        F.col("event_type").alias("truth"),
        F.round("value", 2).cast("double").alias("x"),
    )
    score = F.round(
        F.log("prior")
        - 0.5 * F.log("v")
        - (F.col("x") - F.col("mu"))
        * (F.col("x") - F.col("mu"))
        / (2 * F.col("v")),
        9,
    )
    sc = evs.crossJoin(F.broadcast(par)).select(
        "event_id", "truth", "cls", score.alias("score")
    )
    rn = F.row_number().over(
        W.partitionBy("event_id").orderBy(
            F.col("score").desc(), "cls"
        )
    )
    pred = (
        sc.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("truth", F.col("cls").alias("predicted"))
    )
    return pred.groupBy("truth", "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


@query(
    "agg_quantiles_multi",
    # Five exact quantiles (p25/p50/p75/p90/p99) of l_quantity per
    # return flag from ONE counts-tier scan — the multi-quantile
    # companion to agg_percentiles: all five rank selections share the
    # same ~50-cell cumulative relation, so adding quantiles is free
    # (no extra scan, no extra shuffle).
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS p25,
           round(quantile_cont(l_quantity, 0.50), 6) AS p50,
           round(quantile_cont(l_quantity, 0.75), 6) AS p75,
           round(quantile_cont(l_quantity, 0.90), 6) AS p90,
           round(quantile_cont(l_quantity, 0.99), 6) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_quantiles_multi(spark, sf_dir):
    """One (flag, qty) counts aggregate, one bounded cumulative
    window, five interpolated boundary selections in one pass."""
    li = t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("v"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wc = (
        W.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("l_returnflag")
    cum = cells.select(
        "l_returnflag",
        "v",
        "c",
        (F.sum("c").over(wc) - F.col("c")).alias("below"),
        F.sum("c").over(wall).alias("n"),
    )

    def sel(q):
        pos = q * (F.col("n") - 1)
        lo = F.max(
            F.when(
                (F.col("below") <= F.floor(pos))
                & (F.floor(pos) < F.col("below") + F.col("c")),
                F.col("v"),
            )
        )
        hi = F.max(
            F.when(
                (F.col("below") <= F.ceil(pos))
                & (F.ceil(pos) < F.col("below") + F.col("c")),
                F.col("v"),
            )
        )
        return lo, hi

    aggs = []
    for q, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"),
                    (0.90, "p90"), (0.99, "p99")]:
        lo, hi = sel(q)
        aggs.append(lo.alias(f"lo_{name}"))
        aggs.append(hi.alias(f"hi_{name}"))
    g = cum.groupBy("l_returnflag").agg(
        F.max("n").alias("n"), *aggs
    )
    out = ["l_returnflag"]
    for q, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"),
                    (0.90, "p90"), (0.99, "p99")]:
        pos = q * (F.col("n") - 1)
        out.append(
            F.round(
                F.col(f"lo_{name}")
                + (pos - F.floor(pos))
                * (F.col(f"hi_{name}") - F.col(f"lo_{name}")),
                6,
            ).alias(name)
        )
    return g.select(*out)
