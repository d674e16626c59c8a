"""Set-operation inventory (SURVEY.md §2.B "Set operations")."""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t


def _year_keys(spark, sf_dir, year):
    return (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == year)
        .select("o_custkey")
    )


@query(
    "set_union_all",
    oracle="""
    SELECT o_custkey, count(*) AS n
    FROM (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      UNION ALL
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ) GROUP BY o_custkey
    """,
)
def set_union_all(spark, sf_dir):
    u = _year_keys(spark, sf_dir, 1995).unionAll(_year_keys(spark, sf_dir, 1996))
    return u.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    UNION
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_union_distinct(spark, sf_dir):
    return (
        _year_keys(spark, sf_dir, 1995)
        .union(_year_keys(spark, sf_dir, 1996))
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_intersect(spark, sf_dir):
    return _year_keys(spark, sf_dir, 1995).intersect(
        _year_keys(spark, sf_dir, 1996)
    )


@query(
    "set_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
)
def set_except(spark, sf_dir):
    return _year_keys(spark, sf_dir, 1995).subtract(
        _year_keys(spark, sf_dir, 1996)
    )


@query(
    "set_intersect_all",
    # Multiset semantics: per-custkey multiplicities min() across years.
    oracle="""
    SELECT o_custkey, count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    ) GROUP BY o_custkey
    """,
)
def set_intersect_all(spark, sf_dir):
    ia = _year_keys(spark, sf_dir, 1995).intersectAll(
        _year_keys(spark, sf_dir, 1996)
    )
    return ia.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_except_all",
    bench=True,
    # lineitem orderkeys EXCEPT ALL orders orderkeys: one survivor per
    # lineitem beyond the first for each order (multiset subtraction).
    oracle="""
    SELECT l_orderkey AS orderkey, count(*) AS n FROM (
      SELECT l_orderkey FROM lineitem
      EXCEPT ALL
      SELECT o_orderkey FROM orders
    ) GROUP BY l_orderkey
    """,
)
def set_except_all(spark, sf_dir):
    # EXCEPT ALL fused with the downstream count: Catalyst's
    # RewriteExceptAll plans union(+1/-1) -> sum -> Generate(replicate
    # rows) and our groupBy would then re-count the very rows the
    # Generate just replicated. Since count(k) = max(n_left - n_right, 0)
    # per key, emit the signed counts directly: one union, ONE shuffle,
    # no row replication — the plan you'd want when the left side is
    # 100 TB (the raw-operator form stays covered by
    # set_except_all_raw below).
    # Round-13 (guide §1): SQL-string twin — one JVM parse; plan
    # identical modulo expression IDs (plans/r13/).
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT orderkey, CAST(n AS BIGINT) AS n FROM (
          SELECT orderkey, sum(__w) AS n FROM (
            SELECT l_orderkey AS orderkey, 1 AS __w FROM {l}
            UNION ALL
            SELECT o_orderkey AS orderkey, -1 AS __w FROM {o}
          ) GROUP BY orderkey
        ) WHERE n > 0
        """,
        l=l,
        o=o,
    )


@query(
    "set_except_all_raw",
    # the undecorated exceptAll operator itself (multiset subtraction,
    # row-level output) — §2.B exceptAll coverage independent of the
    # fused bench variant above.
    oracle="""
    SELECT l_orderkey AS orderkey FROM (
      SELECT l_orderkey FROM lineitem
      EXCEPT ALL
      SELECT o_orderkey FROM orders
    )
    """,
)
def set_except_all_raw(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("orderkey"))
        .exceptAll(
            t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("orderkey"))
        )
    )
