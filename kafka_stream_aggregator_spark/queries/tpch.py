"""Core relational queries (TPC-H-shaped) over the synthetic star schema.

Rounding note: whole-table monetary SUMs are rounded to 2 decimals
(cents), not 6 — at sf0.1 those sums reach ~3e9 where double precision
is ~1e-6 absolute, so different summation orders across engines
legitimately disagree in the 6th decimal. Per-group/filtered sums and
averages keep 6.

These exercise scan → filter → project → join → agg → sort/limit with the
physical plans we want at 100 TB: filters/projections pushed into the
parquet scan, dimension joins broadcast, fact-fact joins shuffled on the
join key with AQE, top-k via TakeOrderedAndProject (never a full sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t


@query(
    "q1_pricing_summary",
    bench=True,
    # money sums ride the cents-hybrid tier: per-row INTEGER cents
    # products (floor(x*100+0.5) — price/discount/tax are clean 2dp,
    # so the longs are exact; pure codegen, as fast as double sums —
    # 0.36s vs double 0.39s vs full decimal 0.81s measured on this
    # shape) summed in DECIMAL(38,0) (overflow-proof at any group
    # size; a pure long sum of the 3-factor product would wrap around
    # 8e7 rows/group), emitted as the identical double on both
    # engines. Double summation order flipped the 2dp rounding on 2 of
    # 6 groups at the 30M-row sf5 tier; this formulation is exact at
    # every scale. The avg columns stay double — their error is
    # sum_ulp/count ~ 1e-12, far inside the 6dp quantum.
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6) AS sum_qty,
           CAST(sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         AS DECIMAL(38,0))) AS DOUBLE) / 100
             AS sum_base_price,
           CAST(sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                         AS DECIMAL(38,0))) AS DOUBLE) / 10000
             AS sum_disc_price,
           CAST(sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                         * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT))
                         AS DECIMAL(38,0))) AS DOUBLE) / 1000000
             AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    # Round-12: the Column-object builder cost a measured ~0.13 s of
    # py4j plan construction per call (tools/bench_decompose.py); the
    # identical plan parses in ONE JVM round trip as a SQL statement
    # (guide §1 measurement -> the minhash_near_dup SQL-string lesson).
    # Expressions are the exact cents-hybrid tier documented above;
    # floor(double) already returns BIGINT in Spark SQL. Parity
    # re-verified at sf0.001/sf0.01/sf1.
    l = t(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 6) AS sum_qty,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                             AS DECIMAL(38,0))) AS DOUBLE) / 100
                 AS sum_base_price,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                             * (100 - floor(l_discount * 100 + 0.5))
                             AS DECIMAL(38,0))) AS DOUBLE) / 10000
                 AS sum_disc_price,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                             * (100 - floor(l_discount * 100 + 0.5))
                             * (100 + floor(l_tax * 100 + 0.5))
                             AS DECIMAL(38,0))) AS DOUBLE) / 1000000
                 AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM {l}
        WHERE l_shipdate <= TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
        l=l,
    )


@query(
    "q3_revenue_topk",
    bench=True,
    oracle="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_revenue_topk(spark, sf_dir):
    # Round-12: SQL-string construction (one JVM parse instead of ~0.15 s
    # of py4j Column building — tools/bench_decompose.py; guide §1).
    # Identical plan: customer broadcast after the segment filter,
    # left-deep l⋈o⋈c, TakeOrderedAndProject for the top-10.
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(c) */ o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate
        FROM {l} l JOIN {o} o ON l.l_orderkey = o.o_orderkey
                   JOIN {c} c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
        """,
        l=l,
        o=o,
        c=c,
    )


@query(
    "q5_regional_revenue",
    bench=True,
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                         AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_regional_revenue(spark, sf_dir):
    # Round-12: SQL-string construction (one JVM parse instead of ~0.13 s
    # of py4j Column building — tools/bench_decompose.py; guide §1).
    # Identical plan: same left-deep join order, dimension sides
    # (supplier/nation/region) broadcast, cents-hybrid decimal sum.
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(s), BROADCAST(n), BROADCAST(r) */ n_name,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                             * (100 - floor(l_discount * 100 + 0.5))
                             AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS revenue
        FROM {l} l
          JOIN {o} o ON l.l_orderkey = o.o_orderkey
          JOIN {s} s ON l.l_suppkey = s.s_suppkey
          JOIN {c} c ON o.o_custkey = c.c_custkey
                    AND c.c_nationkey = s.s_nationkey
          JOIN {n} n ON s.s_nationkey = n.n_nationkey
          JOIN {r} r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        """,
        l=l,
        o=o,
        c=c,
        s=s,
        n=n,
        r=r,
    )


@query(
    "q6_forecast_revenue",
    # price and discount are 2dp money values: cast each factor to
    # DECIMAL(18,2) (the nearest 2dp decimal — identical on both
    # engines since the doubles sit within 1e-12 of it) and sum the
    # exact 4dp products; double summation order flipped the 6dp
    # rounding at the sf1 tier (636866305.287999 vs .288).
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,2))), 6)
                AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.08)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ),
                6,
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q10_returned_items",
    bench=True,
    # per-order partials rounded to 6dp ride as DECIMAL(18,6) so the
    # outer per-customer sum is exact and order-independent on both
    # engines (see join_inner_large note).
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
               AS rev
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
    ), per_cust AS (
      SELECT o_custkey, sum(CAST(rev AS DECIMAL(38,0))) AS rev_c
      FROM per_order JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    )
    SELECT c_custkey, c_name,
           CAST(rev_c AS DOUBLE) / 10000 AS revenue,
           round(c_acctbal, 6) AS acctbal
    FROM per_cust JOIN customer ON o_custkey = c_custkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    # Pre-aggregate returned-line revenue per order before touching
    # orders/customer: the join then moves one row per order instead of
    # ~4 lineitem rows, and the customer attributes join happens after
    # the per-customer rollup (15k rows, broadcast). Same result, ~4x
    # less shuffle I/O — the plan shape that survives 100x data.
    # Round-12: SQL-string construction (one JVM parse instead of ~0.12 s
    # of py4j Column building — tools/bench_decompose.py; guide §1).
    # Identical plan: pre-agg per order, rollup per customer, broadcast
    # customer attributes last, TakeOrderedAndProject top-20.
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return spark.sql(
        """
        WITH per_order AS (
          SELECT l_orderkey,
                 sum(floor(l_extendedprice * 100 + 0.5)
                     * (100 - floor(l_discount * 100 + 0.5))) AS __rev
          FROM {l} WHERE l_returnflag = 'R' GROUP BY l_orderkey
        ), per_cust AS (
          SELECT o_custkey, sum(CAST(__rev AS DECIMAL(38,0))) AS __rev_c
          FROM per_order JOIN {o} o ON l_orderkey = o.o_orderkey
          GROUP BY o_custkey
        )
        SELECT /*+ BROADCAST(c) */ c_custkey, c_name,
               CAST(__rev_c AS DOUBLE) / 10000 AS revenue,
               round(c_acctbal, 6) AS acctbal
        FROM per_cust JOIN {c} c ON o_custkey = c.c_custkey
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
        """,
        l=l,
        o=o,
        c=c,
    )
