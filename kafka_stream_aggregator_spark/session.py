"""SparkSession factory.

Defaults are tuned so the same code is correct on local[N] (tests/bench)
and sane on a large cluster: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), shuffle partitions sized to the
parallelism at hand, UTC session time zone (determinism for the DuckDB
oracle), Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Read by tables.load_table for events.parquet (TIMESTAMP(NANOS) column);
# safe to set dynamically on any session.
NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def get_spark(
    app_name: str = "kafka_stream_aggregator_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) or 32. On a
    real cluster you would drop ``.master`` and let the submitter decide;
    every other conf below still applies.
    """
    n = int(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config(NANOS_CONF, "true")
        # 128 MB parquet split target: big enough to amortize task overhead
        # at 100 TB (≈800k tasks), small enough to fit executor memory.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if extra:
        for k, v in extra.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
