"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query (the reference pipeline's EWMA, batch
                 event-time form) at sf0.001.
queries()     -> every implemented operator from SURVEY.md §2.B, keyed by
                 name; callables take (spark, sf_dir).
oracle_sql()  -> DuckDB-equivalent SQL per query (omitted for
                 probabilistic/streaming ops -> rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_stream_aggregator_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 5-min event-time tumbling EWMA (alpha=2/301, zero-seeded,
    >0-filtered — reference agg-producer parity) on sf0.001 events."""
    return REGISTRY["ewma_5min"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
