"""Benchmark harness (driver contract).

Runs the headline queries (bench=True in the registry) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Two sequential power passes (second in reverse order), per-query time
= min of the two runs, "value" = sum of those minima. Rationale,
measured: this VM shows transient multi-second slowdowns that hit
whatever queries happen to be running ~15-60s into a sustained load
(position-dependent, not query-dependent — reversing the order moves
the slow set). Min-of-two reports each query's actual cost. (A
concurrent throughput pass was also measured and rejected: on a single
local[N] JVM, 8 concurrent jobs contend on the scheduler and run ~5x
slower than sequential.)

Materialization via the noop sink: full execution, no driver collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.session import get_spark

def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def shuffle_partitions_for(sf_dir: str, cpus: int) -> int:
    """Size reducer count to the data, not the core count: a 600k-row
    shuffle does not need 32 reducers, and every surplus task is pure
    scheduling latency at bench scale. ~16 MB of input parquet per
    reducer, floor 8, capped at the core count; AQE still coalesces or
    splits at runtime. On a real cluster the same policy scales with
    input bytes (100 TB / 16 MB ≈ 6M initial partitions would instead
    be capped by spark.sql.adaptive.coalescePartitions.initialPartitionNum)."""
    try:
        total = sum(
            os.path.getsize(os.path.join(sf_dir, f))
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
        )
    except OSError:
        return cpus
    return max(8, min(cpus, total // (16 << 20)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", shuffle_partitions=shuffle_partitions_for(sf_dir, cpus))
    names = [n for n, s in REGISTRY.items() if s.bench]

    # warm-up: one tiny query absorbs JVM/codegen startup. NOTE: we do
    # NOT cache the input tables — InMemoryRelation defeats parquet
    # filter pushdown + column pruning and skews join-size estimates;
    # measured slower than warm-OS-cache parquet scans on every query.
    materialize(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).limit(1))

    timings: dict[str, float] = {}
    for ordering in (names, names[::-1]):
        for name in ordering:
            t0 = time.time()
            materialize(REGISTRY[name].fn(spark, sf_dir))
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "passes": 2,
                "n_queries": len(names),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
