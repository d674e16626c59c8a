"""Bench noise characterization: N separate JVM launches of
tools/baseline.py, per-query spread across launches.

The judge protocol question (VERDICT r2): are per-query deltas between
rounds real regressions or machine noise? Each launch is a fresh JVM +
fresh DuckDB connection, so JIT state, page cache, and the VM's
transient multi-second slowdowns are all re-sampled. Output: one JSON
line with per-query min/median/max across launches for both engines,
plus the spread of the comparable totals and the ratio.

Usage: python tools/noise.py [--launches N]   (default 3)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n = 3
    if "--launches" in sys.argv:
        n = int(sys.argv[sys.argv.index("--launches") + 1])
    runs = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "baseline.py")],
            capture_output=True,
            text=True,
            check=True,
            cwd=ROOT,
        )
        runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(
            f"launch {i + 1}/{n}: spark_comparable "
            f"{runs[-1]['spark_comparable_sec']}s duckdb "
            f"{runs[-1]['duckdb_total_sec']}s ratio "
            f"{runs[-1]['ratio_comparable']}",
            file=sys.stderr,
            flush=True,
        )

    def spread(vals):
        return {
            "min": round(min(vals), 3),
            "median": round(statistics.median(vals), 3),
            "max": round(max(vals), 3),
        }

    queries = runs[0]["spark"].keys()
    print(
        json.dumps(
            {
                "metric": "bench_noise",
                "launches": n,
                "spark_comparable_sec": spread(
                    [r["spark_comparable_sec"] for r in runs]
                ),
                "duckdb_total_sec": spread([r["duckdb_total_sec"] for r in runs]),
                "ratio_comparable": spread([r["ratio_comparable"] for r in runs]),
                "ratio_minmin": round(
                    min(r["spark_comparable_sec"] for r in runs)
                    / min(r["duckdb_total_sec"] for r in runs),
                    2,
                ),
                "spark": {
                    q: spread([r["spark"][q] for r in runs]) for q in queries
                },
                "duckdb": {
                    q: spread([r["duckdb"][q] for r in runs])
                    for q in queries
                    if q in runs[0]["duckdb"]
                },
            }
        )
    )


if __name__ == "__main__":
    main()
