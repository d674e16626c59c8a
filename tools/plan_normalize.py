"""Normalize a physical plan for modulo-expression-ID comparison.

Usage: python tools/plan_normalize.py <query> [outfile]

Prints (or writes) the query's executedPlan with #NNN expression IDs,
plan_id=NNN, and ExistingRDD/checkpoint RDD numbers rewritten to
position-stable placeholders, so two plans that differ only in ID
assignment compare byte-equal. Used to prove SQL-string conversions
plan identically to their Column-built originals (guide §1; VERDICT
r12 item 4)."""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def normalize(plan: str) -> str:
    # expression IDs: rewrite each distinct #N to #eK in first-seen order
    ids: dict[str, str] = {}

    def sub_id(m: re.Match) -> str:
        k = m.group(0)
        if k not in ids:
            ids[k] = f"#e{len(ids)}"
        return ids[k]

    plan = re.sub(r"#\d+", sub_id, plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[N]", plan)
    plan = re.sub(r"cachedrdd_\d+", "cachedrdd_N", plan)
    # anonymous lambda/codegen object hashes
    plan = re.sub(r"@[0-9a-f]{6,}", "@HASH", plan)
    return plan


def main() -> None:
    name = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kafka_stream_aggregator_spark.queries import REGISTRY
    from kafka_stream_aggregator_spark.session import get_spark

    spark = get_spark("plan_normalize")
    df = REGISTRY[name].fn(spark, sf_dir)
    txt = normalize(df._jdf.queryExecution().executedPlan().toString())
    if out:
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out}")
    else:
        print(txt)


if __name__ == "__main__":
    main()
