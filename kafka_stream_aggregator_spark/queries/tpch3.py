"""Third relational wave: multi-nation joins, conditional-share
aggregates, NOT IN subqueries — TPC-H Q7/Q8/Q9/Q14/Q16 shapes adapted
to the reduced synthetic schema (no partsupp/shipmode/commitdate
columns; p_retailprice stands in for supply cost, p_type 'ECONOMY' for
the promo class).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t


@query(
    "q7_volume_shipping",
    # revenue between two nation pairs by year (supplier nation x
    # customer nation), both directions
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q7_volume_shipping(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q8_market_share",
    # NATION_3's share of ASIA-region revenue per year: conditional sum
    # over a 6-way join
    oracle="""
    SELECT year(o_orderdate) AS o_year,
           round(sum(CASE WHEN n2.n_name = 'NATION_3'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY year(o_orderdate)
    """,
)
def q8_market_share(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_name")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_name") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_profit_by_nation",
    # profit variant: revenue minus retail-cost-weighted quantity
    # (p_retailprice stands in for ps_supplycost). The difference of two
    # large sums amplifies float noise, and at sf5 a whole-DOLLAR
    # rounding flipped between engines — so the per-row profit is one
    # exact INTEGER in 1e-4-dollar units (cents x cents-complement
    # minus cents x qty), summed in DECIMAL(38,0), emitted as the
    # identical double (cents-hybrid tier, see q1).
    oracle="""
    SELECT n_name, year(o_orderdate) AS o_year,
           CAST(sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                         - CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                           * CAST(l_quantity AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_profit_by_nation(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    pc = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    dc = F.floor(F.col("l_discount") * 100 + 0.5).cast("long")
    rc = F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long")
    profit_e4 = (
        pc * (100 - dc) - rc * F.col("l_quantity").cast("long")
    ).cast("decimal(38,0)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(profit_e4).cast("double") / 10000).alias("profit"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'ECONOMY'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-06-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-06-01 00:00:00").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "ECONOMY", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_pct")
        )
    )


@query(
    "q16_parts_supplier_count",
    # distinct suppliers per (brand, type, size bucket), excluding a
    # NOT IN supplier blacklist (negative-balance suppliers)
    oracle="""
    SELECT p_brand, p_type, CAST(p_size % 10 AS INT) AS size_bucket,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#2'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, CAST(p_size % 10 AS INT)
    """,
)
def q16_parts_supplier_count(spark, sf_dir):
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#2")
    l = t(spark, sf_dir, "lineitem")
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_key")
    )
    return (
        l.join(bad, l.l_suppkey == bad.bad_key, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand", "p_type", (F.col("p_size") % 10).cast("int").alias("size_bucket")
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )
