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
