"""Fourth relational wave: the decorrelation stress shapes the suite
only grazed — TPC-H Q2/Q12/Q15/Q20/Q21 adapted to the reduced synthetic
schema (no partsupp/shipmode/commitdate: supply cost derives from
lineitem unit price, l_returnflag stands in for shipmode, and
"late" means shipped >60 days after the order date).

Q21 is the canonical multi-EXISTS/NOT-EXISTS stress: both subqueries
correlate on the outer order AND reference outer columns in inequality
predicates, so Catalyst must decorrelate to LeftSemi + LeftAnti joins
(asserted in tests/test_plans.py — no per-row subquery execution).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t
from .tpch2 import _views


@query(
    "q2_min_cost_supplier",
    # correlated scalar-min subquery over a derived supply-cost table
    # (Q2 shape; partsupp emulated as min unit price per (part, supp))
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             min(l_extendedprice / l_quantity) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           round(ps_supplycost, 6) AS min_cost
    FROM ps
      JOIN part ON p_partkey = ps_partkey
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_type = 'STANDARD' AND p_size < 10
      AND ps_supplycost = (SELECT min(ps2.ps_supplycost) FROM ps ps2
                           WHERE ps2.ps_partkey = ps.ps_partkey)
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    sfx = _views(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    return spark.sql(
        f"""
        WITH ps AS (
          SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                 min(l_extendedprice / l_quantity) AS ps_supplycost
          FROM lineitem_v{sfx} GROUP BY l_partkey, l_suppkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               round(ps_supplycost, 6) AS min_cost
        FROM ps
          JOIN part_v{sfx} ON p_partkey = ps_partkey
          JOIN supplier_v{sfx} ON s_suppkey = ps_suppkey
          JOIN nation_v{sfx} ON s_nationkey = n_nationkey
        WHERE p_type = 'STANDARD' AND p_size < 10
          AND ps_supplycost = (SELECT min(ps2.ps_supplycost) FROM ps ps2
                               WHERE ps2.ps_partkey = ps.ps_partkey)
        """
    )


@query(
    "q12_priority_linecount",
    # Q12 shape: CASE-conditional counts, shipmode -> returnflag proxy
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_linecount(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    # Q15 shape: view-max — suppliers whose windowed revenue equals the
    # global max. DECIMAL partials make the sum exact and associative,
    # so the self-equality survives nondeterministic partition order on
    # BOTH engines (a double sum could differ in the last ulp between
    # the two evaluations of the subquery and silently return 0 rows).
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18, 4)))
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    sfx = _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18, 4)))
                   AS total_revenue
          FROM lineitem_v{sfx}
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM supplier_v{sfx} JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        """
    )


@query(
    "q20_heavy_suppliers",
    # Q20 shape: nested IN chains with a HAVING aggregate inside
    oracle="""
    SELECT s_name, round(s_acctbal, 6) AS acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 330
    )
    """,
)
def q20_heavy_suppliers(spark, sf_dir):
    sfx = _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(
        f"""
        SELECT s_name, round(s_acctbal, 6) AS acctbal
        FROM supplier_v{sfx}
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem_v{sfx}
          WHERE l_partkey IN (SELECT p_partkey FROM part_v{sfx}
                              WHERE p_name LIKE 'red%')
            AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING sum(l_quantity) > 330
        )
        """
    )


@query(
    "q21_suppliers_kept_waiting",
    # Q21 shape: the multi-EXISTS/NOT-EXISTS decorrelation stress. Both
    # subqueries correlate on l1.l_orderkey AND reference outer columns
    # in non-equi predicates (l_suppkey <>, o_orderdate + interval).
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def q21_suppliers_kept_waiting(spark, sf_dir):
    sfx = _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        f"""
        SELECT s_name, count(*) AS numwait
        FROM supplier_v{sfx}
          JOIN lineitem_v{sfx} l1 ON s_suppkey = l1.l_suppkey
          JOIN orders_v{sfx} ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAYS
          AND EXISTS (SELECT 1 FROM lineitem_v{sfx} l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem_v{sfx} l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        GROUP BY s_name
        """
    )
