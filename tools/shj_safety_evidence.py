"""SHJ-at-scale safety evidence (VERDICT r12 item 3).

The session default `spark.sql.join.preferSortMergeJoin=false` (round
12) lets the planner pick shuffled-hash join when the per-partition
build side fits. Two safety properties must hold for that to be
trustworthy at 100 TB:

1. AQE's skew-join splitting fires on ShuffledHashJoin the same way it
   does on SortMergeJoin (OptimizeSkewedJoin handles both since Spark
   3.2) — otherwise a skewed fact partition would hot-spot one reducer
   with no runtime relief.
2. A build side whose estimate exceeds canBuildLocalHashMap
   (autoBroadcastJoinThreshold x shuffle partitions) must fall back to
   sort-merge — SHJ's hash map cannot spill, so the fallback is the
   spill-safety story.

This script demonstrates both on a synthetic skewed join (hot key owns
~90% of the fact) with AQE skew thresholds lowered so the split fires
at local scale, and writes the executed (final adaptive) plans to
plans/r13/. The plan-pin twin lives in tests/test_plans.py
(test_shj_build_side_guard).

Usage: python tools/shj_safety_evidence.py
"""

from __future__ import annotations

import io
import contextlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.session import get_spark


def final_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir = os.path.join(REPO, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        "shj_safety",
        extra={
            # make the skew machinery observable at MB scale: a
            # partition is "skewed" past 5x median AND 1 MB, split to
            # ~512 KB chunks. Production keeps the 256 MB defaults —
            # these only scale the demo down, not the mechanism.
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
            # the dim must not broadcast (we want a shuffle join) but
            # must fit the per-partition hash map: 256 KB x 32
            # partitions = 8 MB local-map bound vs ~3 MB dim.
            "spark.sql.autoBroadcastJoinThreshold": "256k",
        },
    )

    # fact: 4M rows, ~90% on key 0 -> one enormous reduce partition
    fact = spark.range(0, 4_000_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("payload"),
    )
    # dim: 100k distinct keys, ~3 MB shuffled — too big for the 256 KB
    # broadcast bound, small enough for the local hash map
    dim = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    j = fact.join(dim, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    j.collect()  # finalize the adaptive plan
    plan = final_plan(j)
    path = os.path.join(outdir, "shj_skew_split_evidence.txt")
    with open(path, "w") as f:
        f.write(plan)
    shj = "ShuffledHashJoin" in plan
    skewed = "skewed=true" in plan or "AQEShuffleRead" in plan
    print(f"skew demo: ShuffledHashJoin={shj}  skew-split-markers={skewed}")
    print(f"wrote {path}")

    # oversized build side: shrink the local-map bound below the dim's
    # estimate -> the planner must fall back to SortMergeJoin
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1k")
    j2 = fact.join(dim, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
    plan2 = final_plan(j2)
    path2 = os.path.join(outdir, "shj_oversized_build_fallback.txt")
    with open(path2, "w") as f:
        f.write(plan2)
    print(
        "oversized-build demo: SortMergeJoin="
        f"{'SortMergeJoin' in plan2}  ShuffledHashJoin={'ShuffledHashJoin' in plan2}"
    )
    print(f"wrote {path2}")


if __name__ == "__main__":
    main()
