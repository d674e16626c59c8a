"""Tenth analytics wave: the distributed bootstrap, PR-curve
threshold sweeps, and irregular-time decay averaging.

Determinism strategy:
- the bootstrap replaces RNG resampling with PORTABLE-HASH Poisson
  weights (the Poisson bootstrap — the standard map-side bootstrap at
  scale, since exact-n resampling needs global coordination): the
  hash-uniform u is one IEEE division and the Poisson inverse-CDF is
  a CASE ladder over shared 10-dp literals, so both engines draw the
  IDENTICAL integer weight matrix and every replicate mean is an
  exact integer ratio;
- the PR curve derives every point from exact integer suffix counts
  (the ml_roc_auc prefix-sum machinery run in reverse);
- irregular EWMA normalizes exp() arguments to (t - t_max)/tau <= 0
  before summing, so weights stay in (0,1] at any time span (no
  overflow at 100 TB's multi-year timelines); cross-libm exp ulps sit
  ~10 orders below the round-6 grain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ops import distributed_global_rank
from ..sketches import portable_u64, portable_u64_sql
from .base import query, t

# --------------------------------------------------------------------------
# Poisson bootstrap confidence interval
# --------------------------------------------------------------------------

_BOOT_B = 100
# cumulative Poisson(1) CDF, 10 dp — shared literals on both sides
_POIS_CDF = [
    0.3678794412,
    0.7357588823,
    0.9196986029,
    0.9810118431,
    0.9963401532,
    0.9994058151,
    0.9999167589,
    0.9999897508,
]
_U_SCALE = float(1 << 60)


def _pois_case_sql(u_expr: str) -> str:
    w = f"CASE WHEN {u_expr} < {_POIS_CDF[0]} THEN 0 "
    for k in range(1, len(_POIS_CDF)):
        w += f"WHEN {u_expr} < {_POIS_CDF[k]} THEN {k} "
    return w + f"ELSE {len(_POIS_CDF)} END"


@query(
    "stat_bootstrap_ci",
    # 95% bootstrap CI for mean(n_chars) via the Poisson bootstrap
    # (Chamandy et al. 2012): replicate b gives row i the weight
    # Poisson^{-1}(u64(i:b)/2^60) ~ Poisson(1). Weights are integers,
    # values are integers, so each replicate mean is EXACT; the
    # percentile brackets run over the bounded 100-row replicate
    # relation.
    oracle=f"""
    WITH d AS (SELECT doc_id, n_chars FROM documents),
    w AS (
        SELECT b, n_chars,
               {_pois_case_sql(
                   "(" + portable_u64_sql("doc_id || ':' || b", "boot")
                   + " / " + repr(_U_SCALE) + ")"
               )} AS w
        FROM d CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b)
    ),
    reps AS (
        SELECT b,
               CAST(sum(w * n_chars) AS DOUBLE)
                 / nullif(sum(w), 0) AS m
        FROM w GROUP BY b
    ),
    obs AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               avg(CAST(n_chars AS DOUBLE)) AS mu
        FROM d
    )
    SELECT n_docs,
           round(mu, 6) AS obs_mean,
           round(stddev_pop(m), 6) AS boot_se,
           round(quantile_cont(m, 0.025), 6) AS ci_lo,
           round(quantile_cont(m, 0.975), 6) AS ci_hi
    FROM reps CROSS JOIN obs
    GROUP BY n_docs, mu
    """,
)
def stat_bootstrap_ci(spark, sf_dir):
    """Poisson-bootstrap CI for the corpus mean doc length. Plan: the
    B x N weight relation is MAP-ONLY (hash + CASE ladder) feeding a
    B-group combine — the one shape that lets a bootstrap run on an
    unsorted 100 TB table in a single pass; the replicate relation is
    bounded at B=100 rows, so the percentile bracket is free. Each
    replicate mean is an exact integer ratio (integer weights x
    integer values), which is what makes this oracle-exact where a
    float-weighted bootstrap would not be."""
    d = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (
        portable_u64(
            F.concat_ws(":", F.col("doc_id"), F.col("b")), salt="boot"
        )
        / F.lit(_U_SCALE)
    )
    w_col = F.when(u < _POIS_CDF[0], 0)
    for k in range(1, len(_POIS_CDF)):
        w_col = w_col.when(u < _POIS_CDF[k], k)
    w_col = w_col.otherwise(len(_POIS_CDF))
    w = d.select(
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "doc_id",
    ).select("b", "n_chars", w_col.alias("w"))
    reps = w.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("n_chars")).cast("double")
            / F.nullif(F.sum("w"), F.lit(0))
        ).alias("m")
    )
    obs = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.avg(F.col("n_chars").cast("double")).alias("mu"),
    )
    return (
        reps.crossJoin(F.broadcast(obs))
        .groupBy("n_docs", "mu")
        .agg(
            F.round(F.stddev_pop("m"), 6).alias("boot_se"),
            F.round(F.expr("percentile(m, 0.025)"), 6).alias("ci_lo"),
            F.round(F.expr("percentile(m, 0.975)"), 6).alias("ci_hi"),
        )
        .select(
            "n_docs",
            F.round(F.col("mu"), 6).alias("obs_mean"),
            "boot_se",
            "ci_lo",
            "ci_hi",
        )
    )


# --------------------------------------------------------------------------
# Precision-recall curve by threshold sweep
# --------------------------------------------------------------------------

_PR_POINTS = 20


@query(
    "ml_pr_curve",
    # Precision/recall/F1 at ~20 thresholds over `value` scoring
    # event_type='purchase'. Every curve point comes from exact
    # integer SUFFIX counts (predict positive when score >= t): the
    # ml_roc_auc prefix-sum machinery, subtracted from the totals.
    # Threshold selection is rank-based (every ceil(D/20)-th distinct
    # score), so it needs no quantile call and is integer-exact.
    oracle=f"""
    WITH cell AS (
      SELECT value AS v,
             CAST(count(*) FILTER (WHERE event_type = 'purchase')
                  AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS ct
      FROM events GROUP BY value
    ), ranked AS (
      SELECT v, c1, ct,
             CAST(sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
             CAST(sum(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS ftot,
             row_number() OVER (ORDER BY v) AS rn
      FROM cell
    ), tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS p_all,
             CAST(sum(ct) AS BIGINT) AS n_all,
             CAST(count(*) AS BIGINT) AS d
      FROM cell
    )
    SELECT v AS threshold,
           CAST(n_all - ftot + ct AS BIGINT) AS n_pred_pos,
           CAST(p_all - f1 + c1 AS BIGINT) AS tp,
           round(CAST(p_all - f1 + c1 AS DOUBLE)
                 / (n_all - ftot + ct), 6) AS precision,
           round(CAST(p_all - f1 + c1 AS DOUBLE) / p_all, 6) AS recall,
           round(2.0 * (p_all - f1 + c1)
                 / ((n_all - ftot + ct) + p_all), 6) AS f1_score
    FROM ranked CROSS JOIN tot
    WHERE (rn - 1) % (CAST(ceil(CAST(d AS DOUBLE) / {_PR_POINTS})
                           AS BIGINT)) = 0
    """,
)
def ml_pr_curve(spark, sf_dir):
    """PR curve without a single-reducer sort: distinct score cells,
    distributed prefix sums for cumulative positive/total counts, and
    suffix counts by subtraction from the broadcast totals. Predict
    positive at score >= t; points at every ceil(D/20)-th distinct
    score. F1 = 2TP/(pred_pos + all_pos) — the integer-safe identity
    (no precision*recall float product)."""
    e = t(spark, sf_dir, "events")
    cell = e.groupBy(F.col("value").alias("v")).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c1"),
        F.count(F.lit(1)).alias("ct"),
    )
    ranked = distributed_global_rank(
        cell, ["v"], prefix_sums={"c1": "f1", "ct": "ftot"}
    )
    tot = cell.agg(
        F.sum("c1").cast("bigint").alias("p_all"),
        F.sum("ct").cast("bigint").alias("n_all"),
        F.count(F.lit(1)).cast("bigint").alias("d"),
    )
    j = ranked.crossJoin(F.broadcast(tot))
    tp = (F.col("p_all") - F.col("f1") + F.col("c1")).cast("long")
    pp = (F.col("n_all") - F.col("ftot") + F.col("ct")).cast("long")
    step = F.ceil(F.col("d").cast("double") / _PR_POINTS).cast("long")
    return (
        j.where((F.col("rn") - 1) % step == 0)
        .select(
            F.col("v").alias("threshold"),
            pp.alias("n_pred_pos"),
            tp.alias("tp"),
            F.round(tp.cast("double") / pp, 6).alias("precision"),
            F.round(tp.cast("double") / F.col("p_all"), 6).alias(
                "recall"
            ),
            F.round(
                2.0 * tp / (pp + F.col("p_all")), 6
            ).alias("f1_score"),
        )
    )


# --------------------------------------------------------------------------
# Irregular-time decay EWMA
# --------------------------------------------------------------------------

_EWMA_TAU_S = 3600.0


@query(
    "ts_ewma_irregular",
    # Time-decay EWMA over IRREGULAR timestamps — the closed form
    # sum(x*e^((t-tmax)/tau)) / sum(e^((t-tmax)/tau)), which unlike the
    # sequential window EWMA is ORDER-INDEPENDENT (a plain aggregate,
    # no fold). Normalizing by t_max keeps every weight in (0,1] at
    # any time span. Epoch microseconds -> seconds is exact integer
    # arithmetic before the one division.
    oracle=f"""
    WITH e AS (
        SELECT event_type, value,
               epoch_us(ts) AS us
        FROM events
    ),
    mx AS (SELECT event_type, max(us) AS mxus FROM e GROUP BY 1)
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value * exp(CAST(us - mxus AS DOUBLE)
                                 / 1e6 / {_EWMA_TAU_S}))
                 / sum(exp(CAST(us - mxus AS DOUBLE)
                           / 1e6 / {_EWMA_TAU_S})), 6) AS ewma_decay,
           round(sum(exp(CAST(us - mxus AS DOUBLE)
                         / 1e6 / {_EWMA_TAU_S})), 6) AS eff_n
    FROM e JOIN mx USING (event_type)
    GROUP BY e.event_type
    """,
)
def ts_ewma_irregular(spark, sf_dir):
    """Decay-weighted average at the stream head, per event type, with
    a 1-hour time constant. The per-key max-timestamp relation is
    bounded and broadcast; the weighted aggregate is one map-side-
    combinable pass — the irregular-sampling companion to the
    window-grid ewma_5min, and the form that stays a plain aggregate
    (no stateful fold) at any scale. eff_n (the weight total) is the
    effective sample size the decay leaves alive."""
    e = t(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    mx = e.groupBy("event_type").agg(F.max("us").alias("mxus"))
    w = F.exp(
        (F.col("us") - F.col("mxus")).cast("double")
        / 1e6
        / _EWMA_TAU_S
    )
    return (
        e.join(F.broadcast(mx), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.col("value") * w) / F.sum(w), 6
            ).alias("ewma_decay"),
            F.round(F.sum(w), 6).alias("eff_n"),
        )
    )
