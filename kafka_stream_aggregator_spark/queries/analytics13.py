"""Thirteenth analytics wave: periodogram, Jarque-Bera normality, and
k-core decomposition.

Determinism strategy:
- the periodogram's cos/sin arguments are exact integer ratios
  (2*pi*k*t/N with integer k, t, N); cross-libm trig ulps on ~150-term
  sums sit far below round-6;
- Jarque-Bera is pure moment algebra over integer cents — one
  map-side-combinable aggregate, one identical chain;
- k-core peeling is a bounded driver-loop fixpoint (the k-hop/CC
  precedent) and registers oracle=None with an exact Python replay.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .base import query, t

# --------------------------------------------------------------------------
# Periodogram over the daily event-volume series
# --------------------------------------------------------------------------

_PGRAM_KS = [1, 2, 3, 5, 7, 14]


@query(
    "ts_periodogram",
    # Discrete-Fourier power at fixed cycle counts k over each event
    # type's mean-centered daily-volume series (t = 0..N-1 by day
    # rank): P_k = A_k^2 + B_k^2 with A_k = sum x_t cos(2 pi k t / N).
    # The spectral "which period dominates" probe; k=7 picks up weekly
    # seasonality. Trig arguments are exact integer ratios.
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    st AS (
        SELECT event_type, count(*) AS n, avg(c) AS mu
        FROM daily GROUP BY 1
    ),
    rk AS (
        SELECT d.event_type, c, mu, n,
               row_number() OVER (
                   PARTITION BY d.event_type ORDER BY day) - 1 AS tt
        FROM daily d JOIN st USING (event_type)
    ),
    ks AS (SELECT unnest([{", ".join(map(str, _PGRAM_KS))}]) AS k)
    SELECT event_type, k,
           CAST(any_value(n) AS BIGINT) AS series_len,
           round(pow(sum((c - mu) * cos(2 * pi() * k * tt / n)), 2)
                 + pow(sum((c - mu) * sin(2 * pi() * k * tt / n)), 2),
                 6) AS power
    FROM rk CROSS JOIN ks
    GROUP BY event_type, k
    """,
)
def ts_periodogram(spark, sf_dir):
    """Fixed-frequency periodogram per event type. The daily relation
    is bounded (|types| x |days|); the per-type rank window orders a
    bounded partition; the k-spine cross join fans each row out 6x
    before one map-side-combinable trig aggregate. At 100 TB the only
    data-scale stage is still the daily count."""
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.avg("c").alias("mu")
    )
    rk = daily.join(F.broadcast(st), "event_type").withColumn(
        "tt",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("day")
        )
        - 1,
    )
    ks = F.explode(
        F.array(*[F.lit(k) for k in _PGRAM_KS])
    ).alias("k")
    rkk = rk.select("event_type", "c", "mu", "n", "tt", ks)
    ang = 2 * math.pi * F.col("k") * F.col("tt") / F.col("n")
    return rkk.groupBy("event_type", "k").agg(
        F.first("n").cast("bigint").alias("series_len"),
        F.round(
            F.pow(F.sum((F.col("c") - F.col("mu")) * F.cos(ang)), 2)
            + F.pow(F.sum((F.col("c") - F.col("mu")) * F.sin(ang)), 2),
            6,
        ).alias("power"),
    )


# --------------------------------------------------------------------------
# Jarque-Bera normality statistic
# --------------------------------------------------------------------------


@query(
    "stat_jarque_bera",
    # JB = n/6 * (S^2 + K^2/4) from population skewness S and excess
    # kurtosis K of order value in integer cents — the
    # moments-only normality screen (no CDF needed for the statistic).
    # Raw power sums over exact integers; one identical chain at the
    # end.
    oracle="""
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    ),
    m AS (
        -- EXACT integer power sums (sf5 catch r8: double power sums at
        -- 1e31 magnitude diverge between fold orders, and JB's n/6
        -- factor amplifies the kurtosis ulp past round-6). HUGEINT
        -- holds sum(v^4) <= 7e37; both engines then cast the SAME
        -- integers to DOUBLE.
        SELECT count(*) AS n,
               CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) / count(*) AS m1,
               CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE) / count(*) AS m2,
               CAST(sum(CAST(v AS HUGEINT) * v * v) AS DOUBLE)
                 / count(*) AS m3,
               CAST(sum(CAST(v AS HUGEINT) * v * v * v) AS DOUBLE)
                 / count(*) AS m4
        FROM c
    ),
    k AS (
        SELECT n,
               m2 - m1 * m1 AS mu2,
               m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1 AS mu3,
               m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2
                  - 3 * m1 * m1 * m1 * m1 AS mu4
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(mu3 / pow(mu2, 1.5), 6) AS skewness,
           round(mu4 / (mu2 * mu2) - 3.0, 6) AS excess_kurtosis,
           round(n / 6.0 * (pow(mu3 / pow(mu2, 1.5), 2)
                 + pow(mu4 / (mu2 * mu2) - 3.0, 2) / 4.0), 6)
               AS jarque_bera
    FROM k
    """,
)
def stat_jarque_bera(spark, sf_dir):
    """Jarque-Bera over order totals: one moment aggregate (raw power
    sums of integer cents — map-side combinable), central moments by
    the binomial expansion, JB in a single chain. Large JB = the money
    column is nowhere near normal, which drives the robust-statistics
    tier choices elsewhere in this engine."""
    c = t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("v")
    )
    # exact integer power sums in DECIMAL (v is <= 9-digit cents, so
    # v^2/v^3/v^4 are exact at DECIMAL(19/29/38,0) and sum(v^4) fits
    # 38 digits at any realistic order count); the only doubles are
    # the final m_j = s_j / n divisions — identical in both engines
    v9 = F.col("v").cast("decimal(9,0)")
    v2 = v9 * v9
    v3 = v2 * v9
    v4 = v2 * v2
    m = c.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(v9).cast("double") / F.count(F.lit(1))).alias("m1"),
        (F.sum(v2).cast("double") / F.count(F.lit(1))).alias("m2"),
        (F.sum(v3).cast("double") / F.count(F.lit(1))).alias("m3"),
        (F.sum(v4).cast("double") / F.count(F.lit(1))).alias("m4"),
    )
    mu2 = F.col("m2") - F.col("m1") * F.col("m1")
    mu3 = (
        F.col("m3")
        - 3 * F.col("m1") * F.col("m2")
        + 2 * F.col("m1") * F.col("m1") * F.col("m1")
    )
    mu4 = (
        F.col("m4")
        - 4 * F.col("m1") * F.col("m3")
        + 6 * F.col("m1") * F.col("m1") * F.col("m2")
        - 3 * F.col("m1") * F.col("m1") * F.col("m1") * F.col("m1")
    )
    skew = mu3 / F.pow(mu2, 1.5)
    exk = mu4 / (mu2 * mu2) - 3.0
    return m.select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.round(skew, 6).alias("skewness"),
        F.round(exk, 6).alias("excess_kurtosis"),
        F.round(
            F.col("n") / 6.0 * (F.pow(skew, 2) + F.pow(exk, 2) / 4.0),
            6,
        ).alias("jarque_bera"),
    )


# --------------------------------------------------------------------------
# k-core decomposition
# --------------------------------------------------------------------------

_KCORE_KS = [2, 3, 4]


@query("graph_kcore", oracle=None)  # iterative fixpoint: replay-tested
def graph_kcore(spark, sf_dir):
    """k-core sizes of the user co-occurrence graph (graph2._edges —
    the SAME construction graph_triangle_count and link prediction
    use): repeatedly peel vertices with degree < k until stable, per
    k in {2,3,4}.

    Inherently a fixpoint (each peel changes neighbors' degrees), so
    like connected components this is a bounded driver loop —
    degree-filter + semi-join per round, localCheckpoint every
    iteration to truncate lineage — and registers oracle=None with an
    exact Python peeling replay in tests. Rounds are bounded by the
    peeling depth (graph diameter class), each round one vertex-keyed
    shuffle."""
    from .graph2 import _edges

    edges = _edges(spark, sf_dir).select(
        F.col("ua").alias("u"), F.col("ub").alias("v")
    )
    both = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()

    rows = []
    for k in _KCORE_KS:
        cur = both
        while True:
            deg = cur.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
            keep = deg.where(F.col("d") >= k).select("u")
            n_before = deg.count()
            n_keep = keep.count()
            if n_keep == n_before:
                rows.append((k, n_keep))
                break
            if n_keep == 0:
                rows.append((k, 0))
                break
            cur = (
                cur.join(keep, "u", "left_semi")
                .join(
                    keep.select(F.col("u").alias("v")), "v", "left_semi"
                )
                .localCheckpoint()
            )
        # loop always terminates: each round strictly shrinks vertices
    return spark.createDataFrame(
        rows, "k int, core_size bigint"
    )
