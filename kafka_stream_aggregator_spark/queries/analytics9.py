"""Ninth analytics wave: ML evaluation + attribution + seasonal
smoothing — exact ROC AUC from rank sums, calibration/reliability
bins, linear multi-touch attribution, and Holt-Winters triple
exponential smoothing with a recursive-CTE oracle.

Determinism strategy:
- AUC reuses the Mann-Whitney machinery verbatim: tie-averaged ranks
  as the INTEGER 2*cnt_less + t + 1 from the distributed prefix sum,
  DECIMAL(38,0) rank moments, one final double chain;
- calibration bins cut on an EXACT RATIONAL predicted probability
  (stop_count / n_words — a single IEEE division both engines perform
  on identical integers), so bin assignment can never flip;
- attribution credits are 1/k rationals summed per channel — round-6
  absorbs accumulation order, while conversion counts stay integers;
- Holt-Winters folds sequentially per key in applyInPandas writing the
  arithmetic in EXACTLY the oracle's expression order (the proven
  ind_holt_trend device, extended with a seasonal-array state carried
  as a LIST through the recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..ops import distributed_global_rank
from .base import query, t

_D19 = "decimal(19,0)"
_D38 = "decimal(38,0)"

# --------------------------------------------------------------------------
# Exact ROC AUC
# --------------------------------------------------------------------------


@query(
    "ml_roc_auc",
    # Exact ROC AUC of `value` as a score for event_type='purchase':
    # AUC = (R1 - n1(n1+1)/2) / (n1*n0) with R1 the tie-averaged rank
    # sum of positives — the Mann-Whitney identity, so the whole
    # computation is integer/DECIMAL until one final division. Ranks
    # come from the raw parquet doubles (no arithmetic before the
    # ordering, so cross-engine order is identical).
    oracle="""
    WITH cell AS (
      SELECT value AS v,
             CAST(count(*) FILTER (WHERE event_type = 'purchase')
                  AS BIGINT) AS c1,
             CAST(count(*) FILTER (WHERE event_type <> 'purchase')
                  AS BIGINT) AS c0
      FROM events
      GROUP BY value
    ), ranked AS (
      SELECT c1, c0, c1 + c0 AS tt,
             CAST(sum(c1 + c0) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS ft
      FROM cell
    ), m AS (
      SELECT CAST(sum(c1) AS BIGINT) AS n_pos,
             CAST(sum(c0) AS BIGINT) AS n_neg,
             CAST(sum(CAST(c1 AS DECIMAL(19,0))
                      * CAST(2 * ft - tt + 1 AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS r1x2
      FROM ranked
    )
    SELECT n_pos, n_neg,
           round((CAST(r1x2 AS DOUBLE) / 2.0
                  - CAST(n_pos AS DOUBLE)
                    * (CAST(n_pos AS DOUBLE) + 1.0) / 2.0)
                 / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
             AS auc
    FROM m
    """,
)
def ml_roc_auc(spark, sf_dir):
    """Exact AUC without sorting all rows on one reducer: distinct
    score cells + the distributed prefix sum produce tie-averaged
    ranks, a 1-row DECIMAL moment aggregate produces R1, and AUC is
    one double chain. The standard offline-eval primitive for any
    scored classifier at corpus scale."""
    e = t(spark, sf_dir, "events")
    cell = e.groupBy(F.col("value").alias("v")).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") != "purchase", 1)).alias("c0"),
    )
    cell = cell.withColumn("tt", F.col("c1") + F.col("c0"))
    ranked = distributed_global_rank(
        cell, ["v"], prefix_sums={"tt": "ft"}
    )
    two_r = (2 * F.col("ft") - F.col("tt") + 1).cast(_D19)
    m = ranked.agg(
        F.sum("c1").cast("bigint").alias("n_pos"),
        F.sum("c0").cast("bigint").alias("n_neg"),
        F.sum(F.col("c1").cast(_D19) * two_r).cast(_D38).alias("r1x2"),
    )
    n1 = F.col("n_pos").cast("double")
    n0 = F.col("n_neg").cast("double")
    return m.select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("r1x2").cast("double") / 2.0 - n1 * (n1 + 1.0) / 2.0)
            / (n1 * n0),
            6,
        ).alias("auc"),
    )


# --------------------------------------------------------------------------
# Calibration / reliability bins
# --------------------------------------------------------------------------


@query(
    "ml_calibration_bins",
    # Reliability diagram + per-bin Brier for a deterministic
    # probability-like score: p = stopword_count / n_words predicting
    # lang='en'. p is ONE IEEE division of two integers, so
    # floor(p*10) bin assignment is bit-identical across engines; the
    # in-bin means are short double sums under round-6.
    oracle=r"""
    WITH s AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               CAST(len(list_filter(
                        regexp_extract_all(lower(trim(text)), '\S+'),
                        w -> w IN ('a', 'the'))) AS DOUBLE)
               / nullif(len(regexp_extract_all(lower(trim(text)),
                                               '\S+')), 0) AS p
        FROM documents
    ),
    b AS (
        SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin, p, y
        FROM s WHERE p IS NOT NULL
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(p), 6) AS mean_pred,
           round(avg(CAST(y AS DOUBLE)), 6) AS frac_pos,
           round(avg((p - y) * (p - y)), 6) AS bin_brier
    FROM b GROUP BY bin
    """,
)
def ml_calibration_bins(spark, sf_dir):
    """Calibration table for the stopword-fraction 'English-ness'
    score: 10 equal-width probability bins with observed positive
    rate and per-bin Brier contribution. Map-only scan into a
    10-row-bounded aggregate — the evaluation shape that stays this
    cheap at any corpus size."""
    d = t(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
    )
    s = d.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        (
            F.size(
                F.filter(ws, lambda w: w.isin("a", "the"))
            ).cast("double")
            / F.nullif(F.size(ws), F.lit(0))
        ).alias("p"),
    ).where(F.col("p").isNotNull())
    b = s.withColumn(
        "bin",
        F.least(F.floor(F.col("p") * 10).cast("long"), F.lit(9)),
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.avg("p"), 6).alias("mean_pred"),
        F.round(F.avg(F.col("y").cast("double")), 6).alias("frac_pos"),
        F.round(
            F.avg(
                (F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))
            ),
            6,
        ).alias("bin_brier"),
    )


# --------------------------------------------------------------------------
# Linear multi-touch attribution
# --------------------------------------------------------------------------


@query(
    "events_attribution_linear",
    # Linear multi-touch: every purchase splits one unit of credit equally
    # across ALL the user's non-purchase touches in the preceding 7
    # days. Complements events_attribution (last-touch): this is the
    # position-independent credit model. Touch counts are integers;
    # each credit term 1/k is ONE identical IEEE division quantized to
    # 9 dp and summed as DECIMAL(18,9) — order-independent, so the
    # total cannot drift past the round-6 grain at any scale (a float
    # sum FAILED exactly this way at the sf5 tier: 250k accumulation
    # reorderings crossed 5e-7). 1/k can never land on a 9-dp rounding
    # tie (that would need k ~ 2e9 with an odd factor of 5^10).
    oracle="""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT p.pid, e.event_type
        FROM p JOIN events e
          ON e.user_id = p.user_id
         AND e.event_type <> 'purchase'
         AND e.ts < p.pts
         AND e.ts >= p.pts - INTERVAL 7 DAY
    ),
    k AS (SELECT pid, count(*) AS kk FROM touch GROUP BY pid)
    SELECT event_type AS channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(count(DISTINCT touch.pid) AS BIGINT) AS n_conversions,
           round(CAST(sum(CAST(round(1.0 / kk, 9) AS DECIMAL(18,9)))
                      AS DOUBLE), 6) AS credit
    FROM touch JOIN k USING (pid)
    GROUP BY event_type
    """,
)
def events_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution. Plan: purchases and touches
    co-partition on user_id for the 7-day band join (one shuffle —
    the join Spark plans as an equi-join on user with range
    residuals), per-purchase touch count k reuses the joined relation
    (groupBy pid, broadcast-sized), credit 1/k aggregates per channel
    into a |types|-row result. At 100 TB the fan-out is bounded by
    touches-per-user-week, a data constant."""
    e = t(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("puser"),
        F.col("ts").alias("pts"),
    )
    touch = p.join(
        e,
        (F.col("user_id") == F.col("puser"))
        & (F.col("event_type") != "purchase")
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 7 DAYS")),
    ).select("pid", "event_type")
    k = touch.groupBy("pid").agg(F.count(F.lit(1)).alias("kk"))
    return (
        touch.join(k, "pid")
        .groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.countDistinct("pid").cast("bigint").alias("n_conversions"),
            F.round(
                F.sum(
                    F.round(1.0 / F.col("kk"), 9).cast("decimal(18,9)")
                ).cast("double"),
                6,
            ).alias("credit"),
        )
    )


# --------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing
# --------------------------------------------------------------------------

_HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M = 0.3, 0.1, 0.2, 7


@query(
    "ind_holt_winters",
    # Holt-Winters additive (level + trend + 7-step seasonal) per
    # event type, seeded l=x_1, b=0, s=zeros. The recursive CTE
    # carries the seasonal array as a LIST and steps the recurrence in
    # the IDENTICAL expression order as the Python fold, so IEEE
    # doubles agree bit-for-bit (the ind_holt_trend device, one state
    # dimension richer). Gate-tier oracle only, like ind_holt_trend:
    # a recursive CTE is O(steps) self-joins.
    oracle=f"""
    WITH RECURSIVE o AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id % 5 = 0
    ), nn AS (
      SELECT event_type, max(rn) AS n_rows FROM o GROUP BY event_type
    ), rec AS (
      SELECT o.event_type, o.rn, o.value AS l, 0.0::DOUBLE AS b,
             [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]::DOUBLE[] AS s
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.event_type, o.rn,
             {_HW_ALPHA} * (o.value - rec.s[CAST((o.rn - 1) % {_HW_M}
                                                 AS INTEGER) + 1])
               + (1.0 - {_HW_ALPHA}) * (rec.l + rec.b) AS l,
             {_HW_BETA} * (({_HW_ALPHA} * (o.value
                             - rec.s[CAST((o.rn - 1) % {_HW_M}
                                          AS INTEGER) + 1])
                            + (1.0 - {_HW_ALPHA}) * (rec.l + rec.b))
                           - rec.l)
               + (1.0 - {_HW_BETA}) * rec.b AS b,
             list_concat(
               rec.s[1:CAST((o.rn - 1) % {_HW_M} AS INTEGER)],
               list_concat(
                 [{_HW_GAMMA} * (o.value
                    - ({_HW_ALPHA} * (o.value
                         - rec.s[CAST((o.rn - 1) % {_HW_M}
                                      AS INTEGER) + 1])
                       + (1.0 - {_HW_ALPHA}) * (rec.l + rec.b)))
                   + (1.0 - {_HW_GAMMA})
                     * rec.s[CAST((o.rn - 1) % {_HW_M}
                                  AS INTEGER) + 1]],
                 rec.s[CAST((o.rn - 1) % {_HW_M} AS INTEGER) + 2:{_HW_M}]
               )) AS s
      FROM rec JOIN o ON o.event_type = rec.event_type
                     AND o.rn = rec.rn + 1
    )
    SELECT r.event_type, CAST(nn.n_rows AS BIGINT) AS n_rows,
           round(r.l, 6) AS level, round(r.b, 6) AS trend,
           round(r.l + r.b + r.s[CAST(nn.n_rows % {_HW_M}
                                      AS INTEGER) + 1], 6) AS forecast_1
    FROM rec r JOIN nn ON nn.event_type = r.event_type
                      AND r.rn = nn.n_rows
    """,
)
def ind_holt_winters(spark, sf_dir):
    """Holt-Winters additive smoothing per event type: the seasonal
    extension of ind_holt_trend. Per-key sequential fold in an
    Arrow-batched applyInPandas (one shuffle on the key, whole series
    per task — the per-entity time-series shape at any scale), with
    the seasonal index (rn-1) mod 7 over the (ts, event_id) order.
    The oracle replays the identical expression order with a LIST
    seasonal state; user_id%5 slice bounds its recursion depth at the
    gate tier."""
    import pandas as pd
    from pyspark.sql import types as T

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast_1", T.DoubleType()),
        ]
    )
    a, bta, g, m = _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        xs = pdf["value"].to_numpy()
        level = float(xs[0])
        b = 0.0
        s = [0.0] * m
        for rn0, x in enumerate(xs[1:], start=1):
            # rn0 = rn - 1 for this row (rn is 1-based, row 1 seeds)
            idx = rn0 % m
            x = float(x)
            l_new = a * (x - s[idx]) + (1.0 - a) * (level + b)
            b = bta * (l_new - level) + (1.0 - bta) * b
            s[idx] = g * (x - l_new) + (1.0 - g) * s[idx]
            level = l_new
        n = len(xs)
        fc = level + b + s[n % m]
        return pd.DataFrame(
            [[pdf.iloc[0]["event_type"], n, level, b, fc]],
            columns=["event_type", "n_rows", "level", "trend", "forecast_1"],
        )

    folded = ev.groupBy("event_type").applyInPandas(fold, out_schema)
    return folded.select(
        "event_type",
        "n_rows",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("forecast_1", 6).alias("forecast_1"),
    )
