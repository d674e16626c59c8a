"""Benchmark harness (driver contract).

Runs the headline queries (bench=True in the registry) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Materialization is via the noop sink (full execution, no driver
collect) — measures engine time, not result-transfer time.
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
    timings: dict[str, float] = {}
    # one warm-up pass on a tiny query to absorb JVM/codegen startup
    materialize(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).limit(1))
    t_all = time.time()
    for name in names:
        t0 = time.time()
        materialize(REGISTRY[name].fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
