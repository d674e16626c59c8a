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
    (`db_table`) — temp views have no namespace, so the prefix IS the
    database encoding (documented limitation until a real metastore
    ships in this sandbox)."""
    names = []
    for t in TABLES:
        name = f"{database}_{t}" if database else t
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, statement: str) -> DataFrame:
    """One-call SQL front door: register the catalog, run the statement."""
    register_tables(spark, sf_dir)
    return spark.sql(statement)
