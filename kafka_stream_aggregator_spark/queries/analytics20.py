"""Twentieth analytics wave (round 7): Wald's SPRT sequential test and
the Lo-MacKinlay variance-ratio test.

Determinism:
- the SPRT log-likelihood ratio at step t is k_t*L1 + (t-k_t)*L0 with
  INTEGER prefix counts and two shared literal constants — the whole
  trajectory is exact-input double chains, so the crossing position
  can never flip engines;
- the variance-ratio moments are DECIMAL sums of 6-dp returns at both
  horizons; the ratio is one chain.
"""

from __future__ import annotations

import math

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

# H0: success rate 0.3; H1: 0.5; success = value > 250; B = 19 (alpha
# = beta = 0.05). Constants shared literally with the oracle.
_L1 = math.log(0.5 / 0.3)
_L0 = math.log(0.5 / 0.7)
_UP = math.log(19.0)
_DN = -math.log(19.0)


@query(
    "ab_sprt_crossing",
    # Wald's sequential probability ratio test per event type over the
    # (ts, event_id)-ordered trial stream (bounded demo cohort,
    # user_id < 60 — SPRT is sequential by definition; the production
    # shape partitions per experiment arm): the first step where the
    # LLR leaves (ln 1/19, ln 19), with the decision.
    oracle=f"""
    WITH trials AS (
      SELECT event_type, ts, event_id,
             CASE WHEN value > 250 THEN 1 ELSE 0 END AS s
      FROM events WHERE user_id < 60
    ), walk AS (
      SELECT event_type,
             row_number() OVER w AS t,
             sum(s) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS k
      FROM trials
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), llr AS (
      -- CAST the literals: DuckDB parses bare float literals as
      -- DECIMAL, which would make this a decimal chain, not the
      -- shared IEEE double chain
      SELECT event_type, t,
             k * CAST({_L1!r} AS DOUBLE)
               + (t - k) * CAST({_L0!r} AS DOUBLE) AS llr
      FROM walk
    ), crossed AS (
      SELECT event_type, t, llr,
             row_number() OVER (PARTITION BY event_type ORDER BY t)
               AS cross_rank
      FROM llr WHERE llr >= CAST({_UP!r} AS DOUBLE)
               OR llr <= CAST({_DN!r} AS DOUBLE)
    )
    SELECT event_type,
           CAST(t AS BIGINT) AS crossing_step,
           round(llr, 6) AS llr_at_crossing,
           CASE WHEN llr >= CAST({_UP!r} AS DOUBLE) THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision
    FROM crossed WHERE cross_rank = 1
    """,
)
def ab_sprt_crossing(spark, sf_dir):
    """SPRT: one per-type ordered prefix count (integer k_t), the LLR
    as a map-only expression, first boundary crossing via rank. The
    trajectory is exact-integer-driven, so early stopping is
    bit-reproducible — what an experimentation platform needs before
    it trusts sequential stopping at all."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    s = F.when(F.col("value") > 250, 1).otherwise(0)
    worder = W.partitionBy("event_type").orderBy("ts", "event_id")
    cum = worder.rowsBetween(W.unboundedPreceding, W.currentRow)
    walk = ev.select(
        "event_type",
        F.row_number().over(worder).alias("t"),
        F.sum(s).over(cum).alias("k"),
    )
    llr = walk.select(
        "event_type",
        "t",
        (F.col("k") * _L1 + (F.col("t") - F.col("k")) * _L0).alias("llr"),
    )
    crossed = llr.filter(
        (F.col("llr") >= _UP) | (F.col("llr") <= _DN)
    ).withColumn(
        "cross_rank",
        F.row_number().over(W.partitionBy("event_type").orderBy("t")),
    )
    return crossed.filter(F.col("cross_rank") == 1).select(
        "event_type",
        F.col("t").cast("bigint").alias("crossing_step"),
        F.round("llr", 6).alias("llr_at_crossing"),
        F.when(F.col("llr") >= _UP, "accept_h1")
        .otherwise("accept_h0")
        .alias("decision"),
    )


@query(
    "ts_variance_ratio",
    # Lo-MacKinlay variance ratio VR(q) = Var(q-step diffs) /
    # (q * Var(1-step diffs)) on the per-type minute series, q = 4.
    # Both difference populations use 6-dp-rounded series points ->
    # exact decimal diffs -> DECIMAL moment sums; VR is one chain.
    # VR ~ 1 under a random walk; mean reversion < 1 < trending.
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute,
             CAST(round(CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                             AS DOUBLE) / count(*), 6) AS DECIMAL(18,6)) AS v
      FROM events GROUP BY 1, 2
    ), d AS (
      SELECT event_type,
             v - lag(v, 1) OVER w AS d1,
             v - lag(v, 4) OVER w AS d4
      FROM s WINDOW w AS (PARTITION BY event_type ORDER BY minute)
    ), m AS (
      SELECT event_type,
             CAST(count(d1) AS BIGINT) AS n1,
             CAST(sum(d1) AS DECIMAL(38,6)) AS s1,
             CAST(sum(CAST(d1 AS DECIMAL(20,6)) * d1) AS DECIMAL(38,12))
               AS ss1,
             CAST(count(d4) AS BIGINT) AS n4,
             CAST(sum(d4) AS DECIMAL(38,6)) AS s4,
             CAST(sum(CAST(d4 AS DECIMAL(20,6)) * d4) AS DECIMAL(38,12))
               AS ss4
      FROM d GROUP BY event_type
    )
    SELECT event_type, n1, n4,
           round(((CAST(ss4 AS DOUBLE)
                   - CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / n4) / (n4 - 1))
                 / (4 * ((CAST(ss1 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                         / (n1 - 1))), 6) AS variance_ratio
    FROM m WHERE n1 > 1 AND n4 > 1
    """,
)
def ts_variance_ratio(spark, sf_dir):
    """Variance ratio: one fact shuffle to the bounded minute series,
    two lag windows over it, one moment aggregate — the random-walk
    diagnostic beside ts_autocorrelation/ts_pacf."""
    ev = t(spark, sf_dir, "events")
    dec = F.round("value", 6).cast("decimal(18,6)")
    v = F.round(F.sum(dec).cast("double") / F.count("*"), 6).cast(
        "decimal(18,6)"
    )
    s = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 60).cast("bigint").alias("minute"),
    ).agg(v.alias("v"))
    w = W.partitionBy("event_type").orderBy("minute")
    d = s.select(
        "event_type",
        (F.col("v") - F.lag("v", 1).over(w)).alias("d1"),
        (F.col("v") - F.lag("v", 4).over(w)).alias("d4"),
    )
    m = d.groupBy("event_type").agg(
        F.count("d1").cast("bigint").alias("n1"),
        F.sum("d1").cast("decimal(38,6)").alias("s1"),
        F.sum(F.col("d1").cast("decimal(20,6)") * F.col("d1"))
        .cast("decimal(38,12)")
        .alias("ss1"),
        F.count("d4").cast("bigint").alias("n4"),
        F.sum("d4").cast("decimal(38,6)").alias("s4"),
        F.sum(F.col("d4").cast("decimal(20,6)") * F.col("d4"))
        .cast("decimal(38,12)")
        .alias("ss4"),
    ).filter((F.col("n1") > 1) & (F.col("n4") > 1))
    var1 = (
        F.col("ss1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n1")
    ) / (F.col("n1") - 1)
    var4 = (
        F.col("ss4").cast("double")
        - F.col("s4").cast("double") * F.col("s4").cast("double") / F.col("n4")
    ) / (F.col("n4") - 1)
    return m.select(
        "event_type",
        "n1",
        "n4",
        F.round(var4 / (4 * var1), 6).alias("variance_ratio"),
    )
