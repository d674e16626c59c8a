"""Round-9 IO wave: parquet bloom filters and dynamic partition
pruning — the two scan-elimination tiers the IO inventory lacked
(above row-group min/max stats and static partition pruning).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from .base import query, t


def _wipe(name: str, sf_dir: str) -> str:
    d = os.path.join(
        tempfile.gettempdir(),
        "ksa_io6",
        f"{name}-{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


@query(
    "io_parquet_bloom_roundtrip",
    # Parquet bloom filters: the write carries
    # parquet.bloom.filter.enabled#l_suppkey, and the query ASSERTS
    # the bloom bytes are physically present (the bloom copy is
    # strictly larger than a bloom-less copy of identical data —
    # pyarrow does not expose bloom offsets, so presence is pinned by
    # size) before answering a point-lookup IN query through it. At
    # 100 TB a bloom filter skips row groups for point predicates on
    # high-cardinality non-sorted columns where min/max stats cannot.
    oracle="""
    SELECT md5(CAST(l_orderkey AS VARCHAR) || ':'
               || CAST(l_linenumber AS VARCHAR)) AS row_key,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
             AS qty
    FROM lineitem
    WHERE md5(CAST(l_orderkey AS VARCHAR) || ':'
              || CAST(l_linenumber AS VARCHAR))
          IN (md5('1:1'), md5('3:2'), md5('5:1'))
    GROUP BY row_key
    """,
)
def io_parquet_bloom_roundtrip(spark, sf_dir):
    """Write with a column bloom filter on a HIGH-ENTROPY key (md5 of
    the row id — parquet-mr silently OMITS blooms for fully
    dictionary-encoded columns, so a low-cardinality key would pin
    nothing), assert the bloom bytes are physically present (size
    delta vs a bloom-less twin of identical data), then answer a
    point-lookup IN through it."""
    li = t(spark, sf_dir, "lineitem").select(
        F.md5(
            F.concat_ws(":", "l_orderkey", "l_linenumber")
        ).alias("row_key"),
        "l_quantity",
    )
    d = _wipe("bloom", sf_dir)
    with_b, without_b = os.path.join(d, "with"), os.path.join(d, "no")
    # dictionary OFF for the key in BOTH copies: parquet-mr omits
    # blooms for fully-dictionary-encoded columns (the dictionary is
    # already an exact filter), which at small SFs would silently
    # skip the bloom; with identical encodings the size delta is the
    # bloom bytes alone.
    (
        li.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.enable.dictionary#row_key", "false")
        .option("parquet.bloom.filter.enabled#row_key", "true")
        .option("parquet.bloom.filter.expected.ndv#row_key", "600000")
        .parquet(with_b)
    )
    (
        li.coalesce(1)
        .write.mode("overwrite")
        .option("parquet.enable.dictionary#row_key", "false")
        .parquet(without_b)
    )

    def psize(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )

    if not psize(with_b) > psize(without_b):
        raise AssertionError(
            "bloom-enabled file is not larger — no bloom bytes written"
        )
    import hashlib

    keys = [
        hashlib.md5(s.encode()).hexdigest()
        for s in ("1:1", "3:2", "5:1")
    ]
    return (
        spark.read.parquet(with_b)
        .filter(F.col("row_key").isin(keys))
        .groupBy("row_key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round("l_quantity", 0).cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
    )


@query(
    "join_dynamic_partition_pruning",
    # Dynamic partition pruning: the fact is partitioned by order
    # year; the dim filter (tag = 'hot' -> {1995, 1996}) is only
    # known at RUN time, and Catalyst injects
    # dynamicpruningexpression(oyear IN dynamicpruning#N) into the
    # fact scan's PartitionFilters — asserted in-flight — so only the
    # two hot years' files are ever read. The static twin
    # (io_partitioned_pruning) prunes on literals; this is the tier
    # that prunes through a JOIN.
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS oyear,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS cents
    FROM orders
    WHERE year(o_orderdate) IN (1995, 1996)
    GROUP BY year(o_orderdate)
    """,
)
def join_dynamic_partition_pruning(spark, sf_dir):
    """Year-partitioned fact x runtime-filtered dim: the DPP
    subquery broadcast prunes fact partitions at execution time; a
    missing dynamicpruningexpression fails the query outright."""
    d = _wipe("dpp", sf_dir)
    orders = t(spark, sf_dir, "orders")
    (
        orders.withColumn("oyear", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("oyear")
        .parquet(d)
    )
    fact = spark.read.parquet(d)
    dim = spark.createDataFrame(
        [(y, "hot" if y in (1995, 1996) else "cold")
         for y in range(1992, 1999)],
        "dy int, tag string",
    )
    j = (
        fact.join(
            dim.filter(F.col("tag") == "hot"),
            fact.oyear == F.col("dy"),
        )
        .groupBy(F.col("oyear").cast("bigint").alias("oyear"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    if "dynamicpruning" not in plan.lower():
        raise AssertionError("dynamic partition pruning did not engage")
    return j
