"""Round-8 wave 38: Hurst exponent via rescaled-range (R/S) analysis.

The whole computation lives on the bounded hourly-count relation:
dyadic block sizes m in {16, 64, 256}, per-block cumulative-deviation
range over a within-block prefix sum (integer prefix minus t*mean —
one IEEE chain per row), per-block R/S, block means quantized to
DECIMAL(20,9) pre-average, and the final log-log slope closed-form on
three points whose x = ln(m) are identical constants on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

_BLOCKS = (16, 64, 256)


def _rs_sql(m: int) -> str:
    return f"""
    rs{m} AS (
      SELECT event_type, avg_rs, {m} AS m FROM (
        SELECT event_type,
               CAST(sum(CAST(round(rs, 9) AS DECIMAL(20,9))) AS DOUBLE)
                 / count(*) AS avg_rs
        FROM (
          SELECT event_type, blk,
                 (max(w) - min(w)) / sqrt((css - cs * cs / {m}.0) / {m})
                   AS rs
          FROM (
            SELECT event_type, blk,
                   sum(c) OVER pw - rn * (bs / {m}.0) AS w,
                   bs AS cs, bss AS css
            FROM (
              SELECT event_type, c, blk,
                     row_number() OVER (PARTITION BY event_type, blk
                                        ORDER BY hr) AS rn, hr,
                     CAST(sum(c) OVER bw AS DOUBLE) AS bs,
                     CAST(sum(c * c) OVER bw AS DOUBLE) AS bss,
                     count(*) OVER bw AS bn
              FROM (
                SELECT event_type, hr, c,
                       CAST((row_number() OVER (PARTITION BY event_type
                             ORDER BY hr) - 1) AS BIGINT) // {m} AS blk
                FROM hourly) t1
              WINDOW bw AS (PARTITION BY event_type, blk)) t2
            WHERE bn = {m}
            WINDOW pw AS (PARTITION BY event_type, blk ORDER BY hr
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)) t3
          GROUP BY event_type, blk, css, cs
          HAVING css - cs * cs / {m}.0 > 0
        ) t4 GROUP BY event_type) t5
    )"""


@query(
    "ts_hurst_rs",
    # H = slope of ln(R/S_m) on ln(m) over m in {16,64,256}; R/S_m is
    # the mean per-block rescaled range. Population std per block from
    # exact integer block moments; the 3-point slope is a closed chain.
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, hr
    ), {','.join(_rs_sql(m).lstrip() for m in _BLOCKS)},
    pts AS (
      SELECT event_type, ln(CAST(m AS DOUBLE)) AS x, ln(avg_rs) AS y
      FROM (SELECT * FROM rs16 UNION ALL SELECT * FROM rs64
            UNION ALL SELECT * FROM rs256) u
      WHERE avg_rs > 0
    ), fit AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(x, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sx,
             CAST(sum(CAST(round(y, 9) AS DECIMAL(20,9))) AS DOUBLE) AS sy,
             CAST(sum(CAST(round(x * y, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS sxy,
             CAST(sum(CAST(round(x * x, 9) AS DECIMAL(20,9))) AS DOUBLE)
               AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type, k AS n_scales,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS hurst
    FROM fit WHERE k > 1 AND k * sxx - sx * sx <> 0
    """,
)
def ts_hurst_rs(spark, sf_dir):
    """R/S Hurst: hourly aggregate (the only fact shuffle) -> dyadic
    blocks by row_number -> within-block prefix deviation range over
    exact integer sums -> quantized per-scale means -> 3-point log-log
    slope. Everything after the first aggregate is bounded."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 3600)
        .cast("bigint")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    worder = W.partitionBy("event_type").orderBy("hr")
    base = hourly.withColumn(
        "x0", F.row_number().over(worder).cast("bigint") - 1
    )
    scales = []
    for m in _BLOCKS:
        blk = base.withColumn("blk", (F.col("x0") / m).cast("bigint"))
        bw = W.partitionBy("event_type", "blk")
        pw = (
            W.partitionBy("event_type", "blk")
            .orderBy("hr")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        en = blk.select(
            "event_type",
            "blk",
            "hr",
            "c",
            F.row_number()
            .over(W.partitionBy("event_type", "blk").orderBy("hr"))
            .alias("rn"),
            F.sum("c").over(bw).cast("double").alias("bs"),
            F.sum(F.col("c") * F.col("c")).over(bw).cast("double").alias(
                "bss"
            ),
            F.count(F.lit(1)).over(bw).alias("bn"),
        ).filter(F.col("bn") == m)
        w = en.withColumn(
            "w",
            F.sum("c").over(pw) - F.col("rn") * (F.col("bs") / float(m)),
        )
        perblk = w.groupBy(
            "event_type", "blk", "bss", "bs"
        ).agg((F.max("w") - F.min("w")).alias("rng")).filter(
            F.col("bss") - F.col("bs") * F.col("bs") / float(m) > 0
        )
        rs = perblk.withColumn(
            "rs",
            F.col("rng")
            / F.sqrt(
                (F.col("bss") - F.col("bs") * F.col("bs") / float(m))
                / m
            ),
        )
        scales.append(
            rs.groupBy("event_type")
            .agg(
                (
                    F.sum(
                        F.round("rs", 9).cast("decimal(20,9)")
                    ).cast("double")
                    / F.count(F.lit(1))
                ).alias("avg_rs")
            )
            .withColumn("m", F.lit(m))
        )
    u = scales[0].unionByName(scales[1]).unionByName(scales[2])
    pts = u.filter(F.col("avg_rs") > 0).select(
        "event_type",
        F.log(F.col("m").cast("double")).alias("x"),
        F.log("avg_rs").alias("y"),
    )
    q9 = lambda c: F.sum(F.round(c, 9).cast("decimal(20,9)")).cast(
        "double"
    )
    fit = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        q9(F.col("x")).alias("sx"),
        q9(F.col("y")).alias("sy"),
        q9(F.col("x") * F.col("y")).alias("sxy"),
        q9(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    return fit.filter((F.col("k") > 1) & (den != 0)).select(
        "event_type",
        F.col("k").alias("n_scales"),
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / den,
            6,
        ).alias("hurst"),
    )
