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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
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
