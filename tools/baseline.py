"""Reproducible Spark-vs-DuckDB bench comparison in ONE run.

Runs the bench headline queries (bench=True in the registry) at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1):

  * Spark: same protocol as bench.py (two power passes, second reversed,
    per-query min, noop-sink materialization).
  * DuckDB: each query's oracle SQL on the same parquet files, same
    two-pass/min protocol, fetchall() materialization.

Prints one JSON line with both totals, the per-query breakdown, and the
comparable ratio (Spark total over DuckDB total, restricted to queries
that HAVE an oracle — probabilistic/self-checked queries are reported
under "spark_only" and excluded from the ratio).

Usage: python tools/baseline.py [sf_dir] [--passes N]
(positional sf_dir overrides $SPARK_GRAFT_SF_DIR — used by
tools/ratio_curve.py to sweep the scale tiers from
tools/scale_testdata.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    passes = 2
    if "--passes" in sys.argv:
        passes = int(sys.argv[sys.argv.index("--passes") + 1])
    pos = [a for a in sys.argv[1:] if not a.startswith("--") and not a.isdigit()]
    sf_dir = (
        pos[0] if pos else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    names = [n for n, s in REGISTRY.items() if s.bench]
    comparable = [n for n in names if REGISTRY[n].oracle is not None]

    # --- DuckDB side (first: keep the Spark JVM out of the process) ---
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    duck: dict[str, float] = {}
    orders = [comparable, comparable[::-1]] + [comparable] * (passes - 2)
    for ordering in orders[:passes]:
        for name in ordering:
            t0 = time.time()
            con.execute(REGISTRY[name].oracle).fetchall()
            dt = round(time.time() - t0, 3)
            duck[name] = min(duck.get(name, dt), dt)

    # --- Spark side (bench.py protocol, incl. its data-sized reducers) ---
    from bench import shuffle_partitions_for

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "baseline", shuffle_partitions=shuffle_partitions_for(sf_dir, cpus)
    )

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    materialize(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).limit(1))
    sp: dict[str, float] = {}
    orders = [names, names[::-1]] + [names] * (passes - 2)
    for ordering in orders[:passes]:
        for name in ordering:
            t0 = time.time()
            materialize(REGISTRY[name].fn(spark, sf_dir))
            dt = round(time.time() - t0, 3)
            sp[name] = min(sp.get(name, dt), dt)

    spark_cmp = round(sum(sp[n] for n in comparable), 3)
    duck_total = round(sum(duck.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_vs_baseline",
                "sf_dir": sf_dir,
                "passes": passes,
                "spark_total_sec": round(sum(sp.values()), 3),
                "spark_comparable_sec": spark_cmp,
                "duckdb_total_sec": duck_total,
                "ratio_comparable": round(spark_cmp / duck_total, 2),
                "spark_only": {n: sp[n] for n in names if n not in comparable},
                "spark": sp,
                "duckdb": duck,
            }
        )
    )


if __name__ == "__main__":
    main()
