"""Second relational wave: correlated subqueries, scalar subqueries,
HAVING, IN/NOT-IN with aggregates, OR-of-ANDs pushdown — the Catalyst
rewrite surface (subquery decorrelation into joins) that TPC-H Q2/4/11/
13/17/18/19/22 exercise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t


def _views(spark, sf_dir, *names):
    """Register temp views with a per-call unique suffix (a shared name
    would race if the driver ever ran two queries concurrently on one
    session); returns the suffix to splice into the SQL."""
    import uuid

    sfx = uuid.uuid4().hex[:8]
    for n in names:
        t(spark, sf_dir, n).createOrReplaceTempView(f"{n}_v{sfx}")
    return sfx


@query(
    "q4_order_priority",
    # EXISTS-correlated subquery -> decorrelated to left-semi by Catalyst
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    sfx = _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders_v{sfx}
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem_v{sfx}
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@query(
    "q11_important_stock",
    # HAVING against a scalar subquery over the whole table
    # decimal-exact value sums: the HAVING threshold divides a
    # whole-table money sum — the 1-ulp cross-engine class; the whole
    # predicate (2 * part * n_parts > 3 * total, i.e. part value above
    # 1.5x the average part — DISTRIBUTION-relative, so the query is
    # non-vacuous at every scale tier, unlike the classic 0.001*total
    # which selected 0 rows at every gate SF) stays in exact decimals
    # and integers.
    oracle="""
    SELECT l_partkey,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))), 6)
                AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING 2 * sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_quantity AS DECIMAL(18,2)))
             * (SELECT count(DISTINCT l_partkey) FROM lineitem) >
           3 * (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_quantity AS DECIMAL(18,2)))
                FROM lineitem)
    """,
)
def q11_important_stock(spark, sf_dir):
    sfx = _views(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT l_partkey,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(l_quantity AS DECIMAL(18,2))), 6)
                    AS DOUBLE) AS part_value
        FROM lineitem_v{sfx}
        GROUP BY l_partkey
        HAVING 2 * sum(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2)))
                 * (SELECT count(DISTINCT l_partkey) FROM lineitem_v{sfx}) >
               3 * (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))
                               * CAST(l_quantity AS DECIMAL(18,2)))
                    FROM lineitem_v{sfx})
        """
    )


@query(
    "q13_customer_distribution",
    # join + group twice: distribution of customers by order count
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    # correlated scalar-avg subquery -> decorrelated to an aggregated join
    oracle="""
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = part.p_partkey)
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    sfx = _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        f"""
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                          AS DOUBLE) / 7.0, 6) AS avg_yearly
        FROM lineitem_v{sfx} JOIN part_v{sfx} ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#2'
          AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem_v{sfx} l2
                            WHERE l2.l_partkey = part_v{sfx}.p_partkey)
        """
    )


@query(
    "q18_large_orders",
    # IN over an aggregated subquery
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 6) AS total,
           round(sum(l_quantity), 6) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    GROUP BY c_custkey, o_orderkey, o_totalprice
    """,
)
def q18_large_orders(spark, sf_dir):
    sfx = _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT c_custkey, o_orderkey, round(o_totalprice, 6) AS total,
               round(sum(l_quantity), 6) AS sum_qty
        FROM customer_v{sfx} JOIN orders_v{sfx} ON c_custkey = o_custkey
                        JOIN lineitem_v{sfx} ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem_v{sfx} GROUP BY l_orderkey
          HAVING sum(l_quantity) > 150
        )
        GROUP BY c_custkey, o_orderkey, o_totalprice
        """
    )


@query(
    "q19_disjunctive_pushdown",
    # OR-of-ANDs predicate: Catalyst extracts the common l_partkey=p_partkey
    # equi condition so the join stays hash-based, not nested-loop
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
       OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30 AND l_quantity < 25)
       OR (p_type = 'ECONOMY' AND l_quantity BETWEEN 5 AND 35)
    """,
)
def q19_disjunctive_pushdown(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 10)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(10, 30)
            & (F.col("l_quantity") < 25)
        )
        | ((F.col("p_type") == "ECONOMY") & F.col("l_quantity").between(5, 35))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q22_global_acctbal",
    # NOT EXISTS + uncorrelated scalar subquery (anti condition narrowed
    # to urgent orders — every customer has SOME order in this corpus)
    oracle="""
    SELECT substring(c_name, 10, 2) AS cseg, count(*) AS numcust,
           CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100 AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    GROUP BY substring(c_name, 10, 2)
    """,
)
def q22_global_acctbal(spark, sf_dir):
    sfx = _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        f"""
        SELECT substring(c_name, 10, 2) AS cseg, count(*) AS numcust,
               CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100 AS totacctbal
        FROM customer_v{sfx}
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v{sfx} WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders_v{sfx} WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
        GROUP BY substring(c_name, 10, 2)
        """
    )


@query(
    "events_funnel",
    # conditional-aggregation funnel: view -> click -> purchase per user
    oracle="""
    WITH u AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch(ts) END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN epoch(ts) END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN epoch(ts) END) AS t_buy
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS saw,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         AND t_buy > t_click THEN 1 ELSE 0 END)
                AS BIGINT) AS bought_after
    FROM u
    """,
)
def events_funnel(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts").cast("timestamp").cast("double"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts").cast("timestamp").cast("double"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts").cast("timestamp").cast("double"))).alias("t_buy"),
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("saw"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1
            ).otherwise(0)
        ).alias("clicked_after"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_buy") > F.col("t_click")),
                1,
            ).otherwise(0)
        ).alias("bought_after"),
    )
