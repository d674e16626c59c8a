"""Capture .explain("formatted") for every bench query into plans/r12/.

Usage: python tools/capture_plans.py <suffix> [query ...]

Writes plans/r12/<query>_<suffix>.txt for each bench-flagged registry
query (or the explicit list). Driver-side only — no job is executed.
"""

from __future__ import annotations

import io
import contextlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    explicit = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kafka_stream_aggregator_spark.queries import REGISTRY
    from kafka_stream_aggregator_spark.session import get_spark

    spark = get_spark("capture_plans")
    names = explicit or [n for n, s in REGISTRY.items() if s.bench]
    outdir = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r12"))
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        txt = formatted_plan(df)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{name}: {txt.count('Exchange')} Exchange-mentions -> {path}")


if __name__ == "__main__":
    main()
