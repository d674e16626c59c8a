"""Round-8 wave 41: price elasticity of demand and a Simpson's-paradox
slope diagnostic.

Elasticity is the classic econometrics log-log OLS; its per-row
ln chains are IEEE-identical and the regression moments are quantized
DECIMAL(20,9) sums. The Simpson check compares the pooled OLS slope
sign against every per-group slope computed from exact BIGINT/DECIMAL
moments — one of the canonical aggregation-bias screens a 100 TB
analytics engine should ship.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t


@query(
    "agg_price_elasticity",
    # Per brand: elasticity = OLS slope of ln(quantity) on
    # ln(unit price) with unit price = extendedprice / quantity.
    oracle="""
    WITH r AS (
      SELECT p.p_brand,
             ln(l.l_quantity) AS y,
             ln(l.l_extendedprice / l.l_quantity) AS x
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ), m AS (
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(x, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sx,
             CAST(sum(CAST(round(y, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sy,
             CAST(sum(CAST(round(x * y, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS sxy,
             CAST(sum(CAST(round(x * x, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS sxx
      FROM r GROUP BY p_brand
    )
    SELECT p_brand, n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS elasticity
    FROM m WHERE n > 2 AND n * sxx - sx * sx <> 0
    """,
)
def agg_price_elasticity(spark, sf_dir):
    """Log-log demand regression per brand: broadcast the part dim,
    one fact-sized aggregate of quantized moments, closed slope."""
    li = t(spark, sf_dir, "lineitem")
    pt = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    r = (
        li.filter(
            (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
        )
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(
            "p_brand",
            F.log("l_quantity").alias("y"),
            F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "x"
            ),
        )
    )
    q9 = lambda c: F.sum(F.round(c, 9).cast("decimal(20,9)")).cast(
        "double"
    )
    m = r.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        q9(F.col("x")).alias("sx"),
        q9(F.col("y")).alias("sy"),
        q9(F.col("x") * F.col("y")).alias("sxy"),
        q9(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.filter((F.col("n") > 2) & (den != 0)).select(
        "p_brand",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / den,
            6,
        ).alias("elasticity"),
    )


@query(
    "diag_simpson_slopes",
    # Pooled vs per-group OLS slope of value on hour-of-day: the
    # Simpson screen reports the pooled slope and how many groups
    # carry the OPPOSITE sign. x is a small integer and value 2-dp, so
    # every moment is BIGINT/DECIMAL-exact — slopes are closed chains
    # and sign comparisons can never flip across engines.
    oracle="""
    WITH r AS (
      SELECT event_type,
             CAST(extract(hour FROM ts) AS BIGINT) AS x,
             CAST(value AS DECIMAL(18,2)) AS y
      FROM events
    ), g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             sum(y) AS sy,
             sum(x * y) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM r GROUP BY event_type
    ), gs AS (
      SELECT event_type,
             (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
             / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
               AS slope
      FROM g WHERE n * sxx - sx * sx <> 0
    ), pooled AS (
      SELECT (sum(n) * CAST(sum(sxy) AS DOUBLE)
              - sum(sx) * CAST(sum(sy) AS DOUBLE))
             / (sum(n) * CAST(sum(sxx) AS DOUBLE)
                - CAST(sum(sx) AS DOUBLE) * sum(sx)) AS pooled_slope,
             CAST(sum(n) AS BIGINT) AS n_rows
      FROM g
    )
    SELECT pooled.n_rows,
           round(pooled.pooled_slope, 6) AS pooled_slope,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count_if(gs.slope * pooled.pooled_slope < 0) AS BIGINT)
             AS n_opposite_sign
    FROM gs CROSS JOIN pooled
    GROUP BY pooled.n_rows, pooled.pooled_slope
    """,
)
def diag_simpson_slopes(spark, sf_dir):
    """Simpson's-paradox screen: per-group and pooled slopes from ONE
    exact moment relation (the pooled moments are the group sums), a
    sign comparison, a 1-row report."""
    ev = t(spark, sf_dir, "events")
    r = ev.select(
        "event_type",
        F.hour("ts").cast("bigint").alias("x"),
        F.col("value").cast("decimal(18,2)").alias("y"),
    )
    g = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    gden = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    gs = g.filter(gden != 0).select(
        "event_type",
        (
            (
                F.col("n") * F.col("sxy").cast("double")
                - F.col("sx") * F.col("sy").cast("double")
            )
            / (
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            )
        ).alias("slope"),
    )
    pooled = g.agg(
        (
            (
                F.sum("n") * F.sum("sxy").cast("double")
                - F.sum("sx") * F.sum("sy").cast("double")
            )
            / (
                F.sum("n") * F.sum("sxx").cast("double")
                - F.sum("sx").cast("double") * F.sum("sx")
            )
        ).alias("pooled_slope"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
    j = gs.crossJoin(F.broadcast(pooled))
    return j.groupBy("n_rows", "pooled_slope").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.count_if(
            F.col("slope") * F.col("pooled_slope") < 0
        )
        .cast("bigint")
        .alias("n_opposite_sign"),
    ).select(
        "n_rows",
        F.round("pooled_slope", 6).alias("pooled_slope"),
        "n_groups",
        "n_opposite_sign",
    )
