"""Round-8 wave 37: Kruskal-Wallis H via the counts tier.

Ranks are NEVER assigned row-by-row (that would be an unpartitioned
window over the fact table): the average rank of every distinct value
is computed on the bounded distinct-value relation — r(v) =
cum_before(v) + (cnt(v)+1)/2, exact at 0.5 grain, carried DOUBLED
as the pure-BIGINT r2 = 2*cum_before + cnt + 1 so no decimal division
semantics are involved — and joined back broadcast. Per-group doubled
rank sums are BIGINT-exact; H and its
tie-corrected form are closed chains. N^3 - N exceeds int64 at sf5,
so that denominator is computed in double from birth (the HUGEINT/
overflow divergence class)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "stat_kruskal_wallis",
    # H = 12/(N(N+1)) * sum(R_g^2/n_g) - 3(N+1), tie-corrected by
    # C = 1 - sum(t^3 - t)/(N^3 - N). Groups = event_type over value.
    oracle="""
    WITH vals AS (
      SELECT value AS v, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY value
    ), ranked AS (
      SELECT v, cnt,
             CAST(2 * coalesce(sum(cnt) OVER (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) + cnt + 1 AS BIGINT) AS r2
      FROM vals
    ), g AS (
      SELECT e.event_type,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(ranked.r2) AS BIGINT) AS rg2
      FROM events e JOIN ranked ON e.value = ranked.v
      GROUP BY e.event_type
    ), ties AS (
      SELECT CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS t3
      FROM vals
    ), tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n,
             sum((CAST(rg2 AS DOUBLE) / 2) * (CAST(rg2 AS DOUBLE) / 2)
                 / n_g) AS s,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    )
    SELECT tot.k, tot.n, CAST(tot.k - 1 AS BIGINT) AS df,
           round(12.0 / (CAST(tot.n AS DOUBLE) * (tot.n + 1)) * tot.s
                 - 3.0 * (tot.n + 1), 6) AS h,
           round((12.0 / (CAST(tot.n AS DOUBLE) * (tot.n + 1)) * tot.s
                 - 3.0 * (tot.n + 1))
                 / (1 - CAST(ties.t3 AS DOUBLE)
                        / (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)
                           * tot.n - tot.n)), 6) AS h_tie_corrected
    FROM tot CROSS JOIN ties
    """,
)
def stat_kruskal_wallis(spark, sf_dir):
    """Counts-tier Kruskal-Wallis: one distinct-value aggregate, one
    running sum over that bounded relation (aggregate output — the
    audited allowed shape), one broadcast join back for exact decimal
    rank sums, and a 1-row closing chain. sum(R_g^2/n_g) folds over
    <=|groups| terms only."""
    ev = t(spark, sf_dir, "events")
    vals = ev.groupBy(F.col("value").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wprev = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    ranked = vals.select(
        "v",
        "cnt",
        (
            2 * F.coalesce(F.sum("cnt").over(wprev), F.lit(0))
            + F.col("cnt")
            + 1
        )
        .cast("bigint")
        .alias("r2"),
    )
    g = (
        ev.join(F.broadcast(ranked), ev.value == ranked.v)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum("r2").cast("bigint").alias("rg2"),
        )
    )
    ties = vals.agg(
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        )
        .cast("bigint")
        .alias("t3")
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum(
            (F.col("rg2").cast("double") / 2)
            * (F.col("rg2").cast("double") / 2)
            / F.col("n_g")
        ).alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    j = tot.crossJoin(F.broadcast(ties))
    nd = F.col("n").cast("double")
    h = 12.0 / (nd * (F.col("n") + 1)) * F.col("s") - 3.0 * (
        F.col("n") + 1
    )
    c = 1 - F.col("t3").cast("double") / (nd * nd * F.col("n") - F.col("n"))
    return j.select(
        "k",
        "n",
        (F.col("k") - 1).cast("bigint").alias("df"),
        F.round(h, 6).alias("h"),
        F.round(h / c, 6).alias("h_tie_corrected"),
    )
