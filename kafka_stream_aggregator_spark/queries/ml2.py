"""Classical-ML wave 2: a decision stump trained by exact Gini scan
and closed-form multiple linear regression via the normal equations —
the two "training is just aggregation" models that need no iterative
solver and therefore fit the engine's exactness discipline end to end.

- The stump scans EVERY distinct threshold with cumulative class
  counts from the distributed prefix sum (no single-reducer sort); the
  Gini objective is a bit-identical chain on exact integers, rounded
  to 9 dp, and the argmin is two passes (min objective, then min
  threshold among ties) — deterministic cross-engine without any
  unpartitioned window.
- The regression collects the full exact moment matrix (DECIMAL sums
  of integer/cent-quantized products) in ONE aggregate row and solves
  the 3x3 normal system by Cramer's rule as a single identical double
  chain — distributed training with zero iterations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ops import distributed_global_rank
from .base import query, t

_D19 = "decimal(19,0)"
_D38 = "decimal(38,0)"


@query(
    "ml_decision_stump",
    # Best single threshold on o_totalprice for predicting "urgent-ish"
    # (priority 1/2). For each distinct price t: left = rows <= t.
    # Weighted Gini = (nL - (c0L^2+c1L^2)/nL) + (nR - ...) computed as
    # an identical chain on exact prefix-sum integers, rounded to 9.
    # Argmin = min(objective) then min(threshold) among ties — two
    # broadcast 1-row passes, no global rank window.
    oracle="""
    WITH lab AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ), cell AS (
      SELECT v,
             CAST(count(*) FILTER (WHERE y = 1) AS BIGINT) AS c1,
             CAST(count(*) FILTER (WHERE y = 0) AS BIGINT) AS c0
      FROM lab GROUP BY v
    ), pre AS (
      SELECT v,
             CAST(sum(c1) OVER w AS BIGINT) AS f1,
             CAST(sum(c0) OVER w AS BIGINT) AS f0,
             CAST(sum(c1) OVER () AS BIGINT) AS t1,
             CAST(sum(c0) OVER () AS BIGINT) AS t0
      FROM cell
      WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ), scored AS (
      SELECT v, f1, f0, t1, t0,
             round((CAST(f1 + f0 AS DOUBLE)
                    - (CAST(f1 AS DOUBLE) * f1 + CAST(f0 AS DOUBLE) * f0)
                      / CAST(f1 + f0 AS DOUBLE))
                   + (CAST(t1 - f1 + t0 - f0 AS DOUBLE)
                      - (CAST(t1 - f1 AS DOUBLE) * (t1 - f1)
                         + CAST(t0 - f0 AS DOUBLE) * (t0 - f0))
                        / CAST(t1 - f1 + t0 - f0 AS DOUBLE)), 9) AS g
      FROM pre WHERE f1 + f0 < t1 + t0
    ), best AS (
      SELECT min(g) AS gmin FROM scored
    )
    SELECT s.v AS threshold,
           s.g AS gini_weighted,
           CAST(s.f1 + s.f0 AS BIGINT) AS n_left,
           CAST(s.t1 + s.t0 - s.f1 - s.f0 AS BIGINT) AS n_right,
           CAST(CASE WHEN s.f1 * 2 >= s.f1 + s.f0 THEN 1 ELSE 0 END
                AS BIGINT) AS left_majority,
           CAST(CASE WHEN (s.t1 - s.f1) * 2 >= s.t1 + s.t0 - s.f1 - s.f0
                     THEN 1 ELSE 0 END AS BIGINT) AS right_majority
    -- plain column SELECT, not a grand aggregate: on EMPTY input a
    -- grand aggregate would emit one NULL row where the Spark join
    -- chain emits zero rows (caught by the empty-tier parity run)
    FROM scored s JOIN best b ON s.g = b.gmin
    WHERE s.v = (SELECT min(v) FROM scored s2 JOIN best b2
                 ON s2.g = b2.gmin)
    """,
)
def ml_decision_stump(spark, sf_dir):
    """Train a depth-1 decision tree: the single best totalprice
    threshold separating urgent (priority 1/2) from relaxed orders by
    weighted Gini — the building block of boosting and the strongest
    trivial baseline for any binary tabular task. Plan: distinct-value
    class counts (one groupBy), cumulative class counts from the
    distributed prefix sum, a map-only Gini chain per candidate
    (round-9), then argmin as two broadcast scalar passes (min
    objective, min threshold among exact ties) — never a global
    unpartitioned rank. Every count is an exact integer; the objective
    chain is identical IEEE both engines."""
    o = t(spark, sf_dir, "orders")
    lab = o.select(
        F.col("o_totalprice").alias("v"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    cell = lab.groupBy("v").agg(
        F.count(F.when(F.col("y") == 1, 1)).alias("c1"),
        F.count(F.when(F.col("y") == 0, 1)).alias("c0"),
    )
    pre = distributed_global_rank(
        cell, ["v"], prefix_sums={"c1": "f1", "c0": "f0"}
    )
    tot = cell.agg(
        F.sum("c1").cast("bigint").alias("t1"),
        F.sum("c0").cast("bigint").alias("t0"),
    )
    f1, f0 = F.col("f1"), F.col("f0")
    t1, t0 = F.col("t1"), F.col("t0")
    nl = (f1 + f0).cast("double")
    r1 = (t1 - f1).cast("double")
    r0 = (t0 - f0).cast("double")
    nr = (t1 - f1 + t0 - f0).cast("double")
    g = F.round(
        (nl - (f1.cast("double") * f1 + f0.cast("double") * f0) / nl)
        + (nr - (r1 * (t1 - f1) + r0 * (t0 - f0)) / nr),
        9,
    )
    scored = (
        pre.crossJoin(F.broadcast(tot))
        .filter((f1 + f0) < (t1 + t0))
        .select(
            "v",
            "f1",
            "f0",
            "t1",
            "t0",
            g.alias("g"),
        )
    ).localCheckpoint()  # feeds the min pass and the tie-filter pass
    best = scored.agg(F.min("g").alias("gmin"))
    ties = scored.join(F.broadcast(best), scored["g"] == best["gmin"])
    tmin = ties.agg(F.min("v").alias("vbest"))
    win = ties.join(F.broadcast(tmin), ties["v"] == tmin["vbest"])
    return win.select(
        F.col("v").alias("threshold"),
        F.col("g").alias("gini_weighted"),
        (f1 + f0).cast("bigint").alias("n_left"),
        (t1 + t0 - f1 - f0).cast("bigint").alias("n_right"),
        F.when(f1 * 2 >= f1 + f0, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("left_majority"),
        F.when((t1 - f1) * 2 >= t1 + t0 - f1 - f0, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("right_majority"),
    )


@query(
    "ml_linreg_normal_eq",
    # OLS with intercept: o_totalprice ~ total quantity + item count,
    # solved in closed form. The 3x3 normal matrix and X'y are ONE
    # exact-moment aggregate (integer features, cent-quantized y ->
    # DECIMAL(38,x) sums); Cramer determinants and R^2 are a single
    # identical double chain on those exact moments.
    oracle="""
    WITH feat AS (
      SELECT o.o_orderkey,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS y,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS x1,
             CAST(count(*) AS BIGINT) AS x2
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x1 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s1,
             CAST(sum(CAST(x2 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s2,
             CAST(sum(CAST(x1 AS DECIMAL(19,0)) * CAST(x1 AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS s11,
             CAST(sum(CAST(x1 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS s12,
             CAST(sum(CAST(x2 AS DECIMAL(19,0)) * CAST(x2 AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS s22,
             CAST(sum(y) AS DECIMAL(38,2)) AS sy,
             CAST(sum(CAST(x1 AS DECIMAL(19,0)) * y) AS DECIMAL(38,2))
               AS s1y,
             CAST(sum(CAST(x2 AS DECIMAL(19,0)) * y) AS DECIMAL(38,2))
               AS s2y,
             CAST(sum(y * y) AS DECIMAL(38,4)) AS syy
      FROM feat
    )
    SELECT n,
      round((CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
             - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
             + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)))
            / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
               - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
               + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS b0,
      round((CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))
             - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
             + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE)))
            / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
               - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
               + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS b1,
      round((CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE))
             - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))
             + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))
            / (CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))
               - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))
               + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS b2
    FROM m
    """,
)
def ml_linreg_normal_eq(spark, sf_dir):
    """Multiple linear regression in closed form: totalprice modeled
    from an order's total quantity and line count, trained by the
    normal equations — the "distributed training = one aggregate"
    pattern (moment matrix on the cluster, 3x3 solve as arithmetic).
    Plan: per-order integer features from one lineitem groupBy joined
    to orders (key-colocated shuffle), then ONE 1-row exact-moment
    aggregate (integer x's, cent-quantized y, DECIMAL sums — no
    float-summation-order exposure), and Cramer's-rule coefficients
    as a single identical double chain. Reference point: ml libraries
    run gradient descent here; the closed form is exact, one pass,
    and embarrassingly parallel."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    feat = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("x1"),
            F.count(F.lit(1)).cast("bigint").alias("x2"),
        )
        .select(
            F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
            "x1",
            "x2",
        )
    )
    x1 = F.col("x1").cast(_D19)
    x2 = F.col("x2").cast(_D19)
    y = F.col("y")
    m = feat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x1).cast(_D38).alias("s1"),
        F.sum(x2).cast(_D38).alias("s2"),
        F.sum(x1 * x1).cast(_D38).alias("s11"),
        F.sum(x1 * x2).cast(_D38).alias("s12"),
        F.sum(x2 * x2).cast(_D38).alias("s22"),
        F.sum(y).cast("decimal(38,2)").alias("sy"),
        F.sum(x1 * y).cast("decimal(38,2)").alias("s1y"),
        F.sum(x2 * y).cast("decimal(38,2)").alias("s2y"),
        F.sum(y * y).cast("decimal(38,4)").alias("syy"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s11 = F.col("s11").cast("double")
    s12 = F.col("s12").cast("double")
    s22 = F.col("s22").cast("double")
    sy = F.col("sy").cast("double")
    s1y = F.col("s1y").cast("double")
    s2y = F.col("s2y").cast("double")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    return m.select(
        "n",
        F.round(det0 / det, 6).alias("b0"),
        F.round(det1 / det, 6).alias("b1"),
        F.round(det2 / det, 6).alias("b2"),
    )
