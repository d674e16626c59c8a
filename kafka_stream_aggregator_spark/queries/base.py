"""Query registry.

Every operator from SURVEY.md §2.B lands here as a named QuerySpec:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where the
semantics are deterministic) an equivalent DuckDB SQL string the driver
hash-compares against. Naming contract: every computed column is aliased
identically on both sides; floats are rounded to 6 decimals; timestamps
are emitted as epoch-second BIGINTs and dates as 'yyyy-MM-dd' strings so
cross-engine hashing is stable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None => rows-only check
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}

# Append-only TRUE registration order. queries/__init__ destructively
# reorders REGISTRY to the driver-sampling window, which made any
# later in-process observer (tools/gen_window.py compute_order) see
# window order instead of registration order for bucket-1 tie-breaks
# (the r9 backlog-jump bug; ADVICE r10 low #1). This log is written
# once per @query and never reordered, so registration order survives
# regardless of import timing or SPARK_GRAFT_NO_REORDER.
REGISTRATION_ORDER: list[str] = []


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Register a query. Use as @query("name", oracle=SQL)."""

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, bench)
        REGISTRATION_ORDER.append(name)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
