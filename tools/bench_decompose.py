"""Decompose each bench query's time into plan-construction (fn call,
py4j expression building + any eager construction jobs) vs execution
(noop materialization), guide §1: measure first, find where the time
actually goes before touching anything.

Usage: python tools/bench_decompose.py [query ...]
Prints a table; two rounds, min taken, after a warm-up query.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import materialize, shuffle_partitions_for

    from kafka_stream_aggregator_spark.queries import REGISTRY
    from kafka_stream_aggregator_spark.session import get_spark

    spark = get_spark(
        "bench_decompose", shuffle_partitions=shuffle_partitions_for(sf_dir, cpus)
    )
    names = sys.argv[1:] or [n for n, s in REGISTRY.items() if s.bench]
    materialize(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).limit(1))

    build: dict[str, float] = {}
    execute: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            spark.sparkContext.setJobDescription(f"decompose:{name}")
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            t1 = time.time()
            materialize(df)
            t2 = time.time()
            build[name] = min(build.get(name, 9e9), t1 - t0)
            execute[name] = min(execute.get(name, 9e9), t2 - t1)
    print(f"{'query':28s} {'build_s':>8s} {'exec_s':>8s} {'total_s':>8s}")
    tb = te = 0.0
    for name in names:
        tb += build[name]
        te += execute[name]
        print(
            f"{name:28s} {build[name]:8.3f} {execute[name]:8.3f}"
            f" {build[name] + execute[name]:8.3f}"
        )
    print(f"{'TOTAL':28s} {tb:8.3f} {te:8.3f} {tb + te:8.3f}")


if __name__ == "__main__":
    main()
