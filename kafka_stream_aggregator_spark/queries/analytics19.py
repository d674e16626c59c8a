"""Nineteenth analytics wave (round 7): exponentially-weighted
volatility (closed form, no sequential fold) and two unrolled rounds
of frequency label propagation.

- EW mean/variance use the ADJUSTED closed form (pandas
  ewm(adjust=True)): weights (1-a)^k from the series end are per-row
  expressions, so the whole indicator is two weighted sums — no
  recursion, no fold, order-free once terms round to 9 dp and sum in
  DECIMAL (the chi-square pattern; pow's cross-libm ulps sit below
  the 9-dp grain).
- Label propagation's per-round vote (most frequent neighbor label,
  min-label ties) is a rank over the bounded (node, label) count
  relation; two rounds unroll to two such joins — deterministic,
  fully relational, exactly oracled.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

ALPHA = 0.1


@query(
    "ind_ewm_volatility",
    # Adjusted EW mean and variance of each type's minute-mean series,
    # evaluated at the series end: mean = S1/S0, var = S2/S0 - mean^2
    # (biased, pandas bias=True), with S_j = sum w_i x_i^j and
    # w_i = 0.9^(n-1-i). Minute means are the proven decimal-sum/count
    # chain; each w_i x_i^j term rounds to 9 dp and sums in DECIMAL.
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*) AS v
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT event_type, v,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               - row_number() OVER (PARTITION BY event_type
                                    ORDER BY minute) AS kk
      FROM s
    ), terms AS (
      SELECT event_type,
             round(pow(0.9, kk), 9) AS w0,
             round(pow(0.9, kk) * v, 9) AS w1,
             round(pow(0.9, kk) * v * v, 9) AS w2
      FROM r
    ), m AS (
      SELECT event_type,
             CAST(sum(CAST(w0 AS DECIMAL(30,9))) AS DOUBLE) AS s0,
             CAST(sum(CAST(w1 AS DECIMAL(30,9))) AS DOUBLE) AS s1,
             CAST(sum(CAST(w2 AS DECIMAL(30,9))) AS DOUBLE) AS s2
      FROM terms GROUP BY event_type
    )
    SELECT event_type,
           round(s1 / s0, 6) AS ewm_mean,
           round(s2 / s0 - (s1 / s0) * (s1 / s0), 6) AS ewm_var
    FROM m
    """,
)
def ind_ewm_volatility(spark, sf_dir):
    """EW volatility with zero recursion: the weight is a per-row
    expression of the row's distance from the series end, so the
    indicator is one window pass (bounded minute relation) + one
    decimal-sum aggregate — embarrassingly parallel where the textbook
    fold serializes."""
    ev = t(spark, sf_dir, "events")
    dec = F.round("value", 6).cast("decimal(18,6)")
    s = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 60).cast("bigint").alias("minute"),
    ).agg((F.sum(dec).cast("double") / F.count("*")).alias("v"))
    wfull = W.partitionBy("event_type")
    worder = W.partitionBy("event_type").orderBy("minute")
    r = s.select(
        "event_type",
        "v",
        (
            F.count("*").over(wfull).cast("bigint")
            - F.row_number().over(worder)
        ).alias("kk"),
    )
    w = F.pow(F.lit(0.9), F.col("kk"))
    terms = r.select(
        "event_type",
        F.round(w, 9).alias("w0"),
        F.round(w * F.col("v"), 9).alias("w1"),
        F.round(w * F.col("v") * F.col("v"), 9).alias("w2"),
    )
    m = terms.groupBy("event_type").agg(
        F.sum(F.col("w0").cast("decimal(30,9)")).cast("double").alias("s0"),
        F.sum(F.col("w1").cast("decimal(30,9)")).cast("double").alias("s1"),
        F.sum(F.col("w2").cast("decimal(30,9)")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("s0")
    return m.select(
        "event_type",
        F.round(mean, 6).alias("ewm_mean"),
        F.round(F.col("s2") / F.col("s0") - mean * mean, 6).alias("ewm_var"),
    )


_LP_EDGE_SQL = """
      SELECT DISTINCT a.user_id AS ua, b2.user_id AS ub
      FROM (SELECT DISTINCT user_id, event_type,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS w
            FROM events WHERE user_id < 120) a
      JOIN (SELECT DISTINCT user_id, event_type,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS w
            FROM events WHERE user_id < 120) b2
        ON a.event_type = b2.event_type AND a.w = b2.w
       AND a.user_id < b2.user_id
"""


@query(
    "graph_label_prop_2round",
    # Two SYNCHRONOUS rounds of frequency label propagation on the
    # co-occurrence graph (labels init to own id; each round every
    # node takes its neighbors' most frequent label, min-label ties,
    # keeping its own when it has no neighbors). Deterministic by
    # construction; reported as the community-size histogram.
    oracle=f"""
    WITH e AS ({_LP_EDGE_SQL}),
    adj AS (
      SELECT ua AS x, ub AS y FROM e
      UNION ALL SELECT ub AS x, ua AS y FROM e
    ), r1 AS (
      SELECT x AS v, y AS lab,
             row_number() OVER (PARTITION BY x ORDER BY count(*) DESC, y)
               AS rk
      FROM adj GROUP BY x, y
    ), lab1 AS (
      SELECT v, lab FROM r1 WHERE rk = 1
    ), nl1 AS (
      SELECT adj.x, lab1.lab
      FROM adj JOIN lab1 ON adj.y = lab1.v
    ), r2 AS (
      SELECT x AS v, lab,
             row_number() OVER (PARTITION BY x ORDER BY count(*) DESC, lab)
               AS rk
      FROM nl1 GROUP BY x, lab
    ), lab2 AS (
      SELECT v, lab FROM r2 WHERE rk = 1
    )
    SELECT lab AS community, CAST(count(*) AS BIGINT) AS size
    FROM lab2 GROUP BY lab
    """,
)
def graph_label_prop_2round(spark, sf_dir):
    """Frequency label propagation, 2 unrolled synchronous rounds:
    round 1's vote over initial labels (label(v) = v) reduces to the
    most frequent NEIGHBOR — a (node, neighbor) count + rank; round 2
    votes over round-1 labels via one join + the same rank. Per round:
    one vertex-keyed shuffle — the O(E) shape that scales to any
    round count."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 120)
    cell = F.floor(F.col("ts").cast("double") / 300).cast("bigint")
    b = ev.select("user_id", "event_type", cell.alias("w")).distinct()
    a1 = b.select(F.col("user_id").alias("ua"), "event_type", "w")
    a2 = b.select(F.col("user_id").alias("ub"), "event_type", "w")
    e = (
        a1.join(a2, ["event_type", "w"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )
    adj = e.select(F.col("ua").alias("x"), F.col("ub").alias("y")).unionAll(
        e.select(F.col("ub").alias("x"), F.col("ua").alias("y"))
    )
    rk1 = W.partitionBy("x").orderBy(F.col("c").desc(), "y")
    lab1 = (
        adj.groupBy("x", "y")
        .agg(F.count("*").alias("c"))
        .withColumn("rk", F.row_number().over(rk1))
        .filter(F.col("rk") == 1)
        .select(F.col("x").alias("v"), F.col("y").alias("lab"))
    )
    nl1 = adj.join(
        lab1.select(F.col("v").alias("y"), "lab"), "y"
    ).select("x", "lab")
    rk2 = W.partitionBy("x").orderBy(F.col("c").desc(), "lab")
    lab2 = (
        nl1.groupBy("x", "lab")
        .agg(F.count("*").alias("c"))
        .withColumn("rk", F.row_number().over(rk2))
        .filter(F.col("rk") == 1)
        .select(F.col("x").alias("v"), "lab")
    )
    return lab2.groupBy(F.col("lab").alias("community")).agg(
        F.count("*").cast("bigint").alias("size")
    )
