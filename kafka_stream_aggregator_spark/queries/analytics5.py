"""Fifth analytics wave: robust time-series decomposition — classical
additive seasonal decomposition and the Theil-Sen robust trend
estimator. Both run entirely on the calendar-bounded daily aggregate
after one data-sized groupBy, and both keep the analytics2+ rule: the
only shuffled arithmetic is integer; every float is a bit-identical
IEEE chain on exact integers.

The decomposition exploits a rationality trick: with a 7-row centered
moving average, 7*c - sum7(c) is an INTEGER, so sums of detrended
values across any number of rows stay exact (no float summation-order
exposure at all) and the seasonal means are single exact divisions.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


def _daily(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400)
        .cast("bigint")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))


_DAILY_SQL = """
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
"""


@query(
    "ts_stl_decompose",
    # Classical additive decomposition of the per-type daily series:
    # trend = centered 7-row moving average; seasonal = per-day-of-week
    # mean of detrended, centered by the grand detrended mean (the
    # weighted-centering variant — identical to the textbook one on a
    # gapless grid); residual = remainder. Every aggregate is integer:
    # detrended*7 = 7c - sum7 is exact, so s_num/s_cnt/g_num/n_tot are
    # integer sums and each emitted float is one exact-int division
    # chain — NO float ever enters a groupBy.
    oracle=f"""
    WITH daily AS (
      {_DAILY_SQL}
    ), framed AS (
      SELECT event_type, day, c,
             CAST(day AS BIGINT) % 7 AS dow,
             count(c) OVER w AS n7,
             CAST(sum(c) OVER w AS BIGINT) AS sx
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), interior AS (
      SELECT event_type, day, dow, c, sx, 7 * c - sx AS dn
      FROM framed WHERE n7 = 7
    ), seas AS (
      SELECT event_type, dow,
             CAST(sum(dn) AS BIGINT) AS s_num,
             CAST(count(*) AS BIGINT) AS s_cnt
      FROM interior GROUP BY 1, 2
    ), grand AS (
      SELECT event_type,
             CAST(sum(dn) AS BIGINT) AS g_num,
             CAST(count(*) AS BIGINT) AS n_tot
      FROM interior GROUP BY 1
    )
    SELECT i.event_type, i.day, i.c,
           round(i.sx / 7.0, 6) AS trend,
           round(s.s_num / (7.0 * s.s_cnt)
                 - g.g_num / (7.0 * g.n_tot), 6) AS seasonal,
           round(i.c - i.sx / 7.0
                 - (s.s_num / (7.0 * s.s_cnt)
                    - g.g_num / (7.0 * g.n_tot)), 6) AS resid
    FROM interior i
    JOIN seas s ON i.event_type = s.event_type AND i.dow = s.dow
    JOIN grand g ON i.event_type = g.event_type
    ORDER BY i.event_type, i.day
    """,
)
def ts_stl_decompose(spark, sf_dir):
    """Trend / seasonal / residual decomposition of the daily event
    series per type — the first step of any seasonality-aware anomaly
    or forecasting pipeline. Plan: one day-grain groupBy on the fact,
    a partitioned 7-row centered window, then two bounded aggregates
    (|type|x7 seasonal means, |type| grand means) joined back
    broadcast. The rationality trick (7c - sum7 is integer) means the
    seasonal/grand means are exact integer sums — the decomposition
    has zero float-summation-order exposure at any scale. Seasonal
    centering uses the grand detrended mean (count-weighted),
    identical to textbook centering on a gapless grid."""
    daily = _daily(spark, sf_dir)
    w7 = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    framed = daily.select(
        "event_type",
        "day",
        "c",
        (F.col("day") % 7).alias("dow"),
        F.count("c").over(w7).alias("n7"),
        F.sum("c").over(w7).alias("sx"),
    )
    interior = framed.filter(F.col("n7") == 7).select(
        "event_type",
        "day",
        "dow",
        "c",
        "sx",
        (7 * F.col("c") - F.col("sx")).alias("dn"),
    )
    seas = interior.groupBy("event_type", "dow").agg(
        F.sum("dn").alias("s_num"), F.count(F.lit(1)).alias("s_cnt")
    )
    grand = interior.groupBy("event_type").agg(
        F.sum("dn").alias("g_num"), F.count(F.lit(1)).alias("n_tot")
    )
    seasonal = F.col("s_num") / (7.0 * F.col("s_cnt")) - F.col("g_num") / (
        7.0 * F.col("n_tot")
    )
    trend = F.col("sx") / 7.0
    return (
        interior.join(F.broadcast(seas), ["event_type", "dow"])
        .join(F.broadcast(grand), "event_type")
        .select(
            "event_type",
            "day",
            "c",
            F.round(trend, 6).alias("trend"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(F.col("c") - trend - seasonal, 6).alias("resid"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "ts_theil_sen",
    # Theil-Sen robust trend: the MEDIAN of all pairwise slopes
    # (c_j - c_i)/(day_j - day_i) per type. Slopes are identical-chain
    # doubles (two exact ints, one subtraction each, one division) so
    # both engines materialize the identical multiset and sort it
    # identically; the median picks the middle one/two by row_number
    # (deterministic tie-break on the day pair) and averages at most
    # TWO doubles — IEEE addition of two terms is commutative, so no
    # order exposure. The pair join is calendar-bounded.
    oracle=f"""
    WITH daily AS (
      {_DAILY_SQL}
    ), slopes AS (
      SELECT a.event_type,
             (b.c - a.c) / CAST(b.day - a.day AS DOUBLE) AS slope,
             a.day AS da, b.day AS db
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ), ranked AS (
      SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY slope, da, db) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM slopes
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_slopes,
           round(sum(slope) / count(*), 6) AS slope_per_day,
           CASE WHEN sum(slope) > 0 THEN 'increasing'
                WHEN sum(slope) < 0 THEN 'decreasing'
                ELSE 'flat' END AS direction
    FROM ranked
    WHERE rn IN ((n + 1) // 2, n // 2 + 1)
    GROUP BY event_type ORDER BY event_type
    """,
)
def ts_theil_sen(spark, sf_dir):
    """Theil-Sen slope of the daily count series per type — the
    robust (29%-breakdown) trend rate that pairs with the
    Mann-Kendall significance verdict: MK says WHETHER the series
    drifts, Theil-Sen says HOW FAST. Plan: one day-grain groupBy on
    the fact, then a per-type pair self-join of the daily relation
    (calendar-bounded, ~|days|^2 per type at ANY fact scale) and a
    partitioned rank to select the median slope(s). The direction
    verdict reads the sign of the median sum — identical doubles both
    engines."""
    daily = _daily(spark, sf_dir)
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.c") - F.col("a.c"))
            / (F.col("b.day") - F.col("a.day")).cast("double")
        ).alias("slope"),
        F.col("a.day").alias("da"),
        F.col("b.day").alias("db"),
    )
    wp = W.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(wp.orderBy("slope", "da", "db")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor(F.col("n") / 2) + 1)
    )
    s = F.sum("slope")
    return (
        mid.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_slopes"),
            F.round(F.sum("slope") / F.count(F.lit(1)), 6).alias(
                "slope_per_day"
            ),
            F.when(s > 0, "increasing")
            .when(s < 0, "decreasing")
            .otherwise("flat")
            .alias("direction"),
        )
        .orderBy("event_type")
    )


@query(
    "events_funnel_latency",
    # Time-to-convert distribution for the view -> purchase funnel:
    # per user, the µs gap between FIRST view and the first purchase
    # after it; quartiles + p90 via the bucketed exact-percentile tier
    # (quantile_cont interpolation — the DuckDB twin function). Gaps
    # are exact integers; conversion_rate is one exact-int division.
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               AS t_view,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS t_buy
      FROM events GROUP BY user_id
    ), conv AS (
      SELECT t_buy - t_view AS gap_us FROM per_user
      WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy > t_view
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users FROM per_user
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           (SELECT n_users FROM tot) AS n_users,
           round(CASE WHEN (SELECT n_users FROM tot) > 0
                 THEN count(*) / CAST((SELECT n_users FROM tot) AS DOUBLE)
                 END, 6) AS conversion_rate,
           round(quantile_cont(gap_us, 0.25) / 1000000.0, 6) AS p25_s,
           round(quantile_cont(gap_us, 0.5) / 1000000.0, 6) AS p50_s,
           round(quantile_cont(gap_us, 0.75) / 1000000.0, 6) AS p75_s,
           round(quantile_cont(gap_us, 0.9) / 1000000.0, 6) AS p90_s
    FROM conv
    """,
)
def events_funnel_latency(spark, sf_dir):
    """How long conversion takes, not just whether it happens: the
    quartile/p90 distribution of first-view -> first-purchase-after-it
    latency, plus the conversion rate — the product-analytics
    complement to events_funnel's step counts. Plan: one per-user
    conditional-min aggregate on the fact (map-side combine), then the
    bucketed exact-percentile tier (ops.exact_percentiles_bucketed —
    three fully-parallel passes, no per-group reducer sort) over the
    converting-user gap relation; µs gaps are exact integers
    (F.unix_micros ↔ epoch_us)."""
    from ..ops import exact_percentiles_bucketed

    ev = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias(
            "t_buy"
        ),
    )
    per_user = per_user.localCheckpoint()  # feeds both conv and tot
    conv = per_user.filter(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") > F.col("t_view"))
    ).select((F.col("t_buy") - F.col("t_view")).alias("gap_us"))
    pct = exact_percentiles_bucketed(
        conv,
        "gap_us",
        [(0.25, "p25_us"), (0.5, "p50_us"), (0.75, "p75_us"),
         (0.9, "p90_us")],
    )
    counts = conv.agg(F.count(F.lit(1)).cast("bigint").alias("n_converted"))
    tot = per_user.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    # left join on a dummy key, not crossJoin: an empty gap relation
    # yields an EMPTY percentile frame, and crossJoin would erase the
    # 1-row counts output where the oracle still emits its null row
    pct1 = pct.withColumn("_k", F.lit(1))
    return (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(pct1), "_k", "left")
        .select(
            "n_converted",
            "n_users",
            F.round(
                F.when(
                    F.col("n_users") > 0,
                    F.col("n_converted") / F.col("n_users").cast("double"),
                ),
                6,
            ).alias("conversion_rate"),
            # seconds, not µs: the interpolated p90 at ~4e11 µs exposes
            # 1-ulp interpolation-formula differences ABOVE the 1e-6
            # rounding grain; at seconds magnitude the grain dominates
            F.round(F.col("p25_us") / 1e6, 6).alias("p25_s"),
            F.round(F.col("p50_us") / 1e6, 6).alias("p50_s"),
            F.round(F.col("p75_us") / 1e6, 6).alias("p75_s"),
            F.round(F.col("p90_us") / 1e6, 6).alias("p90_s"),
        )
    )
