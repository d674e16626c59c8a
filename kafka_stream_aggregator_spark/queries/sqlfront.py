"""SQL front-door wave (round 7): ONE ANSI statement, two engines.

sql_catalog_query runs a multi-table ANSI SQL string VERBATIM through
catalog.sql (the persistent-catalog entry point) — and the exact same
string is its DuckDB oracle. No dialect translation anywhere: the
statement is written in the common subset (CAST sums to BIGINT for
DuckDB's HUGEINT, round-before-cast for the truncate-vs-round cast
divergence, TIMESTAMP literals), which is precisely the portability
contract a SQL user of this engine gets.
"""

from __future__ import annotations

from .base import query

_STMT = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
GROUP BY c_mktsegment
"""


@query("sql_catalog_query", oracle=_STMT)
def sql_catalog_query(spark, sf_dir):
    """The catalog front door: register the testdata views, run the
    SAME ANSI text the oracle runs. Catalyst plans it as the usual
    broadcast-dim star join; the point of the row is the API — a SQL
    user needs no DataFrame code and no dialect changes."""
    from ..catalog import sql

    return sql(spark, sf_dir, _STMT)


# --------------------------------------------------------------------------
# Round-8 suite (VERDICT r7 item 7): one verbatim ANSI statement per row,
# run through the catalog front door on Spark and UNCHANGED as the DuckDB
# oracle. Coverage: correlated scalar subquery, inline VALUES relation,
# CTE + bounded window frame, EXISTS/NOT EXISTS semi/anti join,
# INTERSECT/EXCEPT set ops, HAVING + CASE aggregation. Dialect-common
# subset rules as above (BIGINT casts, cents for money sums).
# --------------------------------------------------------------------------


def _front_door(stmt):
    def fn(spark, sf_dir):
        from ..catalog import sql

        return sql(spark, sf_dir, stmt)

    return fn


_SQL_SUITE = {
    # correlated scalar subquery in WHERE — the classic decorrelation
    # test; Catalyst rewrites it to an aggregate + join
    "sql_correlated_subquery": """
SELECT c_custkey, c_name
FROM customer c
WHERE (SELECT CAST(count(*) AS BIGINT) FROM orders o
       WHERE o.o_custkey = c.c_custkey) > 8
""",
    # inline VALUES relation joined as a dimension (broadcast-able
    # literal table — the SQL twin of the DataFrame lookup-join rows)
    "sql_values_join": """
SELECT t.grade, CAST(count(*) AS BIGINT) AS n
FROM orders
JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
             ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
             ('5-LOW', 'cold')) AS t(prio, grade)
  ON o_orderpriority = t.prio
GROUP BY t.grade
""",
    # CTE + bounded ROWS frame; money in integer cents so the rolling
    # sum is exact on both engines
    "sql_cte_window_frame": """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_custkey < 200
)
SELECT o_custkey, o_orderkey,
       CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS rolling_cents
FROM o
""",
    # EXISTS semi join + NOT EXISTS anti join, both correlated
    "sql_exists_anti": """
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
  AND NOT EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_suppkey = s.s_suppkey
                    AND l2.l_quantity < 2 AND l2.l_discount > 0.09
                    AND l2.l_returnflag = 'R')
""",
    # INTERSECT / EXCEPT (both DISTINCT semantics on both engines)
    "sql_set_ops": """
SELECT 'both' AS tag, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') x
UNION ALL
SELECT 'f_only' AS tag, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') y
""",
    # GROUPING SETS with the full/partial/grand-total rollup levels
    # disambiguated by COALESCE sentinels (identical semantics and
    # syntax on both engines)
    "sql_grouping_sets": """
SELECT coalesce(l_returnflag, 'ALL') AS rf,
       coalesce(l_linestatus, 'ALL') AS ls,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
            AS BIGINT) AS cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), ())
""",
    # correlated LATERAL subquery with ORDER BY ... LIMIT — top-2
    # orders per customer; Catalyst decorrelates it to a ranked join
    "sql_lateral_topk": """
SELECT c.c_custkey, o.o_orderkey, o.cents
FROM customer c,
LATERAL (SELECT o_orderkey,
                CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
         FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY cents DESC, o_orderkey
         LIMIT 2) o
WHERE c.c_custkey < 100
""",
    # time-based RANGE frame (INTERVAL preceding) — the sliding-window
    # idiom in pure ANSI, identical syntax and peer semantics on both
    # engines; aggregated so the output is bounded
    "sql_range_interval_frame": """
SELECT user_id,
       CAST(max(n_1h) AS BIGINT) AS max_events_1h,
       CAST(count(*) AS BIGINT) AS n_events
FROM (
  SELECT user_id,
         count(*) OVER (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
              AND CURRENT ROW) AS n_1h
  FROM events) z
GROUP BY user_id
""",
    # timestamp + INTERVAL arithmetic, extract(), and date_trunc in one
    # verbatim statement (the dialect-common datetime subset)
    "sql_interval_arithmetic": """
SELECT CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN o_orderdate + INTERVAL 7 DAY
                          >= TIMESTAMP '1995-07-01 00:00:00'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_late_window,
       CAST(count(DISTINCT date_trunc('day', o_orderdate)) AS BIGINT)
         AS n_days
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY extract(month FROM o_orderdate)
""",
    # Round-9 suite (VERDICT r8 item 8): the remaining dialect-common
    # surface. PIVOT/UNPIVOT parse verbatim on BOTH engines (checked:
    # Spark 4.1 + DuckDB 1.0 share the relational PIVOT ... FOR ... IN
    # form with aliases); QUALIFY and DISTINCT-window aggregates do
    # NOT exist in Spark SQL, so those two rows are the PORTABLE
    # idioms every cross-engine SQL user writes instead — a ranked
    # subquery and the dense_rank trick — still one verbatim statement.
    #
    # PIVOT: wide order-status counts per market segment. count(*)
    # is BIGINT on both engines; a pivot cell with no rows is NULL on
    # Spark and 0 on DuckDB, so COALESCE in the outer projection is
    # part of the portable idiom.
    "sql_pivot": """
SELECT seg,
       CAST(coalesce(f, 0) AS BIGINT) AS n_f,
       CAST(coalesce(o, 0) AS BIGINT) AS n_o
FROM (
  SELECT c_mktsegment AS seg, o_orderstatus AS st
  FROM orders JOIN customer ON o_custkey = c_custkey) z
PIVOT (count(*) FOR st IN ('F' AS f, 'O' AS o))
""",
    # UNPIVOT: per-nation wide metrics back to long (metric, value)
    # rows; values pre-cast BIGINT so the unpivoted column has one
    # type on both engines
    "sql_unpivot": """
SELECT n_name, metric, CAST(val AS BIGINT) AS val
FROM (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_positive
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name) w
UNPIVOT (val FOR metric IN (n_customers, n_positive))
""",
    # QUALIFY-equivalent: top-1 order per customer via a ranked
    # subquery — the portable form of QUALIFY row_number() = 1
    # (DuckDB has QUALIFY, Spark does not; this statement is the
    # common subset both plan as one window + filter)
    "sql_qualify_equivalent": """
SELECT o_custkey, o_orderkey, cents
FROM (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY o_custkey
              ORDER BY round(o_totalprice * 100, 0) DESC, o_orderkey)
           AS rn
  FROM orders WHERE o_custkey < 300) z
WHERE rn = 1
""",
    # windowed DISTINCT aggregate: Spark rejects
    # count(DISTINCT x) OVER (...), so the portable idiom is
    # max(dense_rank) — the per-partition distinct count as a pure
    # window chain, then reduced to bounded output
    "sql_windowed_distinct": """
SELECT n_distinct_types,
       CAST(count(*) AS BIGINT) AS n_users
FROM (
  SELECT user_id,
         CAST(max(dr) AS BIGINT) AS n_distinct_types
  FROM (
    SELECT user_id,
           dense_rank() OVER (PARTITION BY user_id
                              ORDER BY event_type) AS dr
    FROM events) z
  GROUP BY user_id) g
GROUP BY n_distinct_types
""",
    # GROUP BY ROLLUP + CUBE in one verbatim statement (COALESCE
    # sentinels disambiguate the total rows, the grouping-sets
    # convention; NULL-free group keys so sentinels are unambiguous)
    "sql_rollup_cube": """
SELECT 'rollup' AS op, coalesce(l_returnflag, 'ALL') AS flag,
       coalesce(l_linestatus, 'ALL') AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
            AS BIGINT) AS cents
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
UNION ALL
SELECT 'cube' AS op, coalesce(l_returnflag, 'ALL') AS flag,
       coalesce(l_linestatus, 'ALL') AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
            AS BIGINT) AS cents
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
""",
    # named WINDOW clause shared by several window functions — the
    # reuse idiom; both engines bind w once (order keys NULL-free:
    # Spark sorts NULLS FIRST, DuckDB NULLS LAST)
    "sql_named_window": """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            OVER w AS BIGINT) AS run_cents,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(count(*) OVER w AS BIGINT) AS n_so_far
FROM orders
WHERE o_custkey < 150
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
""",
    # null-safe comparison surface: IS DISTINCT FROM / IS NOT
    # DISTINCT FROM, NULLIF and COALESCE in one statement over a
    # column made nullable by NULLIF
    "sql_is_distinct_from": """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN st IS DISTINCT FROM 'F'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_not_f_nullsafe,
       CAST(sum(CASE WHEN st IS NOT DISTINCT FROM NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(sum(CASE WHEN coalesce(st, 'P') = 'P'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_p_or_null
FROM (SELECT NULLIF(o_orderstatus, 'O') AS st FROM orders) z
""",
    # MERGE-upsert surface (VERDICT r9 item 6). Verbatim `MERGE INTO`
    # is IMPOSSIBLE on both engines here, probed 2026-08-16: Spark 4.1
    # raises UNSUPPORTED_FEATURE.TABLE_OPERATION on any non-v2 table
    # (row-level MERGE needs Delta/Iceberg; temp views and parquet
    # catalog tables are not row-level-capable), and DuckDB 1.0.0
    # predates MERGE entirely (parser error; MERGE landed in 1.4).
    # The dialect-common statement is the relational algebra a MERGE
    # plans to: FULL OUTER JOIN target/source, matched keys take the
    # source row (UPDATE), source-only keys insert, target-only keys
    # carry over — with the action tagged per row. The transactional
    # execution path of the same semantics is lakehouse merge()
    # (io_lakehouse_merge, pass r09).
    "sql_merge_upsert": """
WITH target AS (
  SELECT c_custkey AS k,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
  FROM customer WHERE c_custkey < 400),
source AS (
  SELECT o_custkey AS k,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS bal_cents
  FROM orders WHERE o_custkey < 600 GROUP BY o_custkey)
SELECT CAST(coalesce(s.k, t.k) AS BIGINT) AS k,
       CAST(CASE WHEN s.k IS NOT NULL THEN s.bal_cents
                 ELSE t.bal_cents END AS BIGINT) AS bal_cents,
       CASE WHEN s.k IS NOT NULL AND t.k IS NOT NULL THEN 'update'
            WHEN s.k IS NOT NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM target t FULL OUTER JOIN source s ON t.k = s.k
""",
    # HAVING over a joined aggregate + CASE-conditional count
    "sql_having_case": """
SELECT n_name,
       CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_positive,
       CAST(count(*) AS BIGINT) AS n_total
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING count(*) > 5
""",
}

for _name, _stmt in _SQL_SUITE.items():
    _fn = _front_door(_stmt)
    _fn.__name__ = _name
    _fn.__doc__ = (
        "SQL front-door suite row: this ANSI statement runs VERBATIM "
        "through catalog.sql on Spark and as its own DuckDB oracle.\n"
        + _stmt
    )
    query(_name, oracle=_stmt)(_fn)
