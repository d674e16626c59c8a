"""Eighteenth analytics wave (round 7): partial autocorrelation
(Durbin-Levinson, lags 1-3), as-of join with tolerance, and Poisson
regression via two unrolled IRLS iterations.

Determinism:
- PACF works entirely off INTEGER co-moments of the hourly count
  series (the ts_autocorrelation trick) — the Durbin-Levinson
  recursion unrolls to a fixed scalar chain on exact inputs;
- the tolerance join nulls matches by exact integer-microsecond gap;
- IRLS iteration 1 is EXACT (mu=1 => integer weighted OLS); iteration
  2's per-row exp terms round to 9 dp and sum in DECIMAL (the
  ln-precedent from agg_theil_index / doc_dsir_importance).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

# --------------------------------------------------------------------------
# PACF via Durbin-Levinson (lags 1-3)
# --------------------------------------------------------------------------

_PACF_MOMENTS_SQL = """
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, c,
             lag(c, 1) OVER w AS c1,
             lag(c, 2) OVER w AS c2,
             lag(c, 3) OVER w AS c3
      FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    ), m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS sxx,
             CAST(count(c1) AS BIGINT) AS n1,
             CAST(sum(c * c1) AS BIGINT) AS sp1,
             CAST(sum(CASE WHEN c1 IS NOT NULL THEN c END) AS BIGINT) AS sh1,
             CAST(sum(c1) AS BIGINT) AS st1,
             CAST(count(c2) AS BIGINT) AS n2,
             CAST(sum(c * c2) AS BIGINT) AS sp2,
             CAST(sum(CASE WHEN c2 IS NOT NULL THEN c END) AS BIGINT) AS sh2,
             CAST(sum(c2) AS BIGINT) AS st2,
             CAST(count(c3) AS BIGINT) AS n3,
             CAST(sum(c * c3) AS BIGINT) AS sp3,
             CAST(sum(CASE WHEN c3 IS NOT NULL THEN c END) AS BIGINT) AS sh3,
             CAST(sum(c3) AS BIGINT) AS st3
      FROM lagged GROUP BY event_type
    ), acf AS (
      SELECT event_type, n,
        (CAST(sp1 AS DOUBLE) - (CAST(s AS DOUBLE)/n) * (sh1 + st1)
           + n1 * (CAST(s AS DOUBLE)/n) * (CAST(s AS DOUBLE)/n))
        / (CAST(sxx AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS r1,
        (CAST(sp2 AS DOUBLE) - (CAST(s AS DOUBLE)/n) * (sh2 + st2)
           + n2 * (CAST(s AS DOUBLE)/n) * (CAST(s AS DOUBLE)/n))
        / (CAST(sxx AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS r2,
        (CAST(sp3 AS DOUBLE) - (CAST(s AS DOUBLE)/n) * (sh3 + st3)
           + n3 * (CAST(s AS DOUBLE)/n) * (CAST(s AS DOUBLE)/n))
        / (CAST(sxx AS DOUBLE) - CAST(s AS DOUBLE) * s / n) AS r3
      FROM m WHERE n >= 4
    )
"""


@query(
    "ts_pacf",
    # Durbin-Levinson partial autocorrelations at lags 1-3 of the
    # hourly count series per type: phi11 = r1;
    # phi22 = (r2 - r1^2)/(1 - r1^2); phi21 = r1(1 - r2)/(1 - r1^2);
    # phi33 = (r3 - phi21 r2 - phi22 r1)/(1 - phi21 r1 - phi22 r2).
    # The ACF inputs are one identical chain on INTEGER co-moments
    # (the ts_autocorrelation trick); the recursion is a fixed scalar
    # chain — no float-summation-order exposure anywhere.
    oracle=_PACF_MOMENTS_SQL
    + """
    SELECT event_type, n,
           round(r1, 6) AS pacf1,
           round((r2 - r1 * r1) / (1 - r1 * r1), 6) AS pacf2,
           round((r3 - (r1 * (1 - r2) / (1 - r1 * r1)) * r2
                     - ((r2 - r1 * r1) / (1 - r1 * r1)) * r1)
                 / (1 - (r1 * (1 - r2) / (1 - r1 * r1)) * r1
                      - ((r2 - r1 * r1) / (1 - r1 * r1)) * r2), 6) AS pacf3
    FROM acf
    """,
)
def ts_pacf(spark, sf_dir):
    """PACF 1-3: the only data-sized stage is the hourly groupBy
    (map-side combine); lags + moments run over the bounded hourly
    relation; Durbin-Levinson unrolls to scalar algebra per type.
    The AR-order identification probe beside ts_autocorrelation."""
    ev = t(spark, sf_dir, "events")
    hr = F.floor(F.col("ts").cast("double") / 3600).cast("bigint")
    hourly = ev.groupBy("event_type", hr.alias("hr")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = W.partitionBy("event_type").orderBy("hr")
    lagged = hourly.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 2).over(w).alias("c2"),
        F.lag("c", 3).over(w).alias("c3"),
    )

    def mom(k):
        lc = F.col(f"c{k}")
        return [
            F.count(lc).cast("bigint").alias(f"n{k}"),
            F.sum(F.col("c") * lc).cast("bigint").alias(f"sp{k}"),
            F.sum(F.when(lc.isNotNull(), F.col("c")))
            .cast("bigint")
            .alias(f"sh{k}"),
            F.sum(lc).cast("bigint").alias(f"st{k}"),
        ]

    m = lagged.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sxx"),
        *mom(1),
        *mom(2),
        *mom(3),
    ).filter(F.col("n") >= 4)

    mean = F.col("s").cast("double") / F.col("n")
    c0 = F.col("sxx").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")

    def r(k):
        return (
            F.col(f"sp{k}").cast("double")
            - mean * (F.col(f"sh{k}") + F.col(f"st{k}"))
            + F.col(f"n{k}") * mean * mean
        ) / c0

    acf = m.select("event_type", "n", r(1).alias("r1"), r(2).alias("r2"), r(3).alias("r3"))
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi21 = r1 * (1 - r2) / (1 - r1 * r1)
    phi33 = (r3 - phi21 * r2 - phi22 * r1) / (1 - phi21 * r1 - phi22 * r2)
    return acf.select(
        "event_type",
        "n",
        F.round(r1, 6).alias("pacf1"),
        F.round(phi22, 6).alias("pacf2"),
        F.round(phi33, 6).alias("pacf3"),
    )


# --------------------------------------------------------------------------
# As-of join with tolerance
# --------------------------------------------------------------------------


@query(
    "join_asof_tolerance",
    # join_asof's semantics plus a 600-second tolerance: the nearest
    # prior click older than that is NO match (pandas merge_asof
    # tolerance semantics). Gap test on exact integer microseconds.
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         j AS (
           SELECT p.event_id AS pid, c.value AS cv,
                  row_number() OVER (PARTITION BY p.event_id
                                     ORDER BY c.ts DESC, c.event_id DESC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
            AND epoch_us(p.ts) - epoch_us(c.ts) <= 600000000
         )
    SELECT p.event_id,
           CAST(CASE WHEN j.pid IS NOT NULL THEN 1.0 ELSE 0.0 END
                AS DOUBLE) AS has_click_10m,
           round(coalesce(j.cv, -1.0), 6) AS last_click_value
    FROM p LEFT JOIN (SELECT pid, cv FROM j WHERE rn = 1) j
      ON p.event_id = j.pid
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """Tolerance as-of: the SAME linear union+last_value shape as
    join_asof (ops.asof_join — one group-key shuffle, no pairwise
    time join); the matched right timestamp rides along as a value
    column and the tolerance nulls stale matches afterward — a
    map-only postfilter, so the scale story is unchanged."""
    from ..ops import asof_join

    e = t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
        F.col("ts").alias("r_matched_ts"),
    )
    joined = asof_join(
        left,
        right,
        left_on="ts",
        right_on="r_ts",
        left_by="user_id",
        right_by="r_user_id",
        right_tiebreak="r_event_id",
        value_cols=["r_value", "r_matched_ts"],
    )
    in_tol = (
        F.col("r_matched_ts").isNotNull()
        & (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("r_matched_ts"))
            <= 600_000_000
        )
    )
    return joined.select(
        "event_id",
        F.when(in_tol, 1.0).otherwise(0.0).alias("has_click_10m"),
        F.round(
            F.when(in_tol, F.col("r_value")).otherwise(F.lit(-1.0)), 6
        ).alias("last_click_value"),
    )


# --------------------------------------------------------------------------
# Poisson regression, two unrolled IRLS iterations
# --------------------------------------------------------------------------


@query(
    "ml_poisson_irls",
    # Poisson GLM (log link): per-user purchase count ~ view count.
    # IRLS from beta = (0,0), TWO unrolled iterations, each ONE
    # weighted-moments aggregate:
    #   iteration 1: mu = exp(0) = 1 exactly => w = 1, z = y - 1 —
    #     INTEGER moments, the first step is exact;
    #   iteration 2: mu = exp(a1 + b1 x) per row — each weighted
    #     moment term rounds to 9 dp and sums in DECIMAL (the
    #     ln-precedent: identical per-row chains, order-free sums).
    oracle="""
    WITH d AS (
      SELECT user_id,
             CAST(count_if(event_type = 'purchase') AS BIGINT) AS y,
             CAST(count_if(event_type = 'view') AS BIGINT) AS x
      FROM events GROUP BY user_id
    ), m1 AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y - 1) AS BIGINT) AS sz,
             CAST(sum(x * (y - 1)) AS BIGINT) AS sxz
      FROM d
    ), b1 AS (
      SELECT (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
             (CAST(sz AS DOUBLE)
              - (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sx) / n AS a
      FROM m1
    ), tq AS (
      -- ROUND9_AUDIT r8: mu reaches 4.3e5 and wxx 3.2e8 at sf5 — far
      -- past the magnitude where a cross-libm exp() ulp survives
      -- round-9 (the anova rule). Quantize mu to 6 dp ONCE (robust:
      -- exp ulp 9e-11 << the 0.5e-6 grain), so every downstream term
      -- is pure IEEE arithmetic on identical doubles in both engines.
      SELECT d.x, d.y, b1.a, b1.b,
             round(exp(b1.a + b1.b * d.x), 6) AS mu
      FROM d, b1
    ), t2 AS (
      SELECT x, a, b,
             round(mu, 9) AS w,
             round(mu * x, 9) AS wx,
             round(mu * x * x, 9) AS wxx,
             round(mu * ((a + b * x) + (y - mu) / mu), 9) AS wz,
             round(mu * x * ((a + b * x) + (y - mu) / mu), 9) AS wxz
      FROM tq
    ), m2 AS (
      SELECT max(a) AS a1, max(b) AS b1v,
             CAST(sum(CAST(w AS DECIMAL(30,9))) AS DOUBLE) AS sw,
             CAST(sum(CAST(wx AS DECIMAL(30,9))) AS DOUBLE) AS swx,
             CAST(sum(CAST(wxx AS DECIMAL(30,9))) AS DOUBLE) AS swxx,
             CAST(sum(CAST(wz AS DECIMAL(30,9))) AS DOUBLE) AS swz,
             CAST(sum(CAST(wxz AS DECIMAL(30,9))) AS DOUBLE) AS swxz
      FROM t2
    )
    SELECT round(a1, 6) AS intercept_iter1, round(b1v, 6) AS coef_iter1,
           round((sw * swxz - swx * swz) / (sw * swxx - swx * swx), 6)
             AS coef_iter2,
           round((swz - (sw * swxz - swx * swz)
                        / (sw * swxx - swx * swx) * swx) / sw, 6)
             AS intercept_iter2
    FROM m2
    """,
)
def ml_poisson_irls(spark, sf_dir):
    """Poisson IRLS as bounded scans: each iteration is ONE moments
    aggregate (map-side combinable) with the scalar coefficients
    broadcast — k iterations = k scans, no driver-side data movement.
    The canonical 'iterative ML on a relational engine' shape."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").cast("bigint").alias("y"),
        F.count_if(F.col("event_type") == "view").cast("bigint").alias("x"),
    )
    m1 = d.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") - 1).cast("bigint").alias("sz"),
        F.sum(F.col("x") * (F.col("y") - 1)).cast("bigint").alias("sxz"),
    )
    nn = F.col("n").cast("double")
    bb = (nn * F.col("sxz") - F.col("sx").cast("double") * F.col("sz")) / (
        nn * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    b1 = m1.select(
        bb.alias("b"),
        ((F.col("sz").cast("double") - bb * F.col("sx")) / F.col("n")).alias("a"),
    )
    eta = F.col("a") + F.col("b") * F.col("x")
    # mu quantized to 6 dp before ANY term algebra (ROUND9_AUDIT r8:
    # terms reach 3.2e8 at sf5; see the oracle comment) — keep the
    # intermediate under its own name, not a lateral alias
    tq = d.crossJoin(F.broadcast(b1)).select(
        "x", "y", "a", "b", F.round(F.exp(eta), 6).alias("mu")
    )
    zz = eta + (F.col("y") - F.col("mu")) / F.col("mu")
    mu = F.col("mu")
    t2 = tq.select(
        "x",
        "a",
        "b",
        F.round(mu, 9).alias("w"),
        F.round(mu * F.col("x"), 9).alias("wx"),
        F.round(mu * F.col("x") * F.col("x"), 9).alias("wxx"),
        F.round(mu * zz, 9).alias("wz"),
        F.round(mu * F.col("x") * zz, 9).alias("wxz"),
    )
    m2 = t2.agg(
        F.max("a").alias("a1"),
        F.max("b").alias("b1v"),
        F.sum(F.col("w").cast("decimal(30,9)")).cast("double").alias("sw"),
        F.sum(F.col("wx").cast("decimal(30,9)")).cast("double").alias("swx"),
        F.sum(F.col("wxx").cast("decimal(30,9)")).cast("double").alias("swxx"),
        F.sum(F.col("wz").cast("decimal(30,9)")).cast("double").alias("swz"),
        F.sum(F.col("wxz").cast("decimal(30,9)")).cast("double").alias("swxz"),
    )
    b2 = (
        F.col("sw") * F.col("swxz") - F.col("swx") * F.col("swz")
    ) / (F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx"))
    return m2.select(
        F.round("a1", 6).alias("intercept_iter1"),
        F.round("b1v", 6).alias("coef_iter1"),
        F.round(b2, 6).alias("coef_iter2"),
        F.round(
            (F.col("swz") - b2 * F.col("swx")) / F.col("sw"), 6
        ).alias("intercept_iter2"),
    )
