"""Spark-vs-DuckDB ratio across scale tiers, with the fixed floor
measured instead of asserted.

Round-4 verdict: at sf0.1 the 2x bench bar is decided by a ~7 s fixed
JVM floor (16 queries x ~0.4-0.5 s of plan/schedule cost) against a
±3x-noisy ~1.6 s DuckDB total — plan quality is invisible in that
quotient. This runs tools/baseline.py (fresh process per tier) on:

  sf0    — scale_testdata --mult 0: EMPTY tables, same schema. The
           Spark total here IS the fixed floor (no data is touched);
           the DuckDB total is its (tiny) floor.
  sf0.1  — the driver's real testdata.
  sf1    — scale_testdata --mult 10 (6M lineitem / 1M events).
  sf5    — scale_testdata --mult 50 (30M lineitem / 5M events).

and reports, per tier: both totals, the raw comparable ratio, and the
floor-adjusted ratio (Spark minus the sf0 floor over DuckDB minus its
floor) — the marginal cost of the DATA, which is the quantity that
transfers to a 1000-executor 100 TB deployment where the per-query
floor is amortized to nothing.

Usage: python tools/ratio_curve.py [--tiers sf0,sf0.1,sf1,sf5]
                                   [--out docs/RATIO_CURVE_r05.json]
Writes one JSON artifact; prints a markdown summary table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TIER_DIRS = {
    "sf0": "/tmp/ksa_scale/sf0",
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/tmp/ksa_scale/sf1",
    "sf5": "/tmp/ksa_scale/sf5",
}
TIER_MULT = {"sf0": 0, "sf1": 10, "sf5": 50}


def ensure_tier(tier: str) -> str:
    d = TIER_DIRS[tier]
    if not os.path.exists(os.path.join(d, "lineitem.parquet")):
        if tier not in TIER_MULT:
            raise SystemExit(f"{d} missing and not generatable")
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "scale_testdata.py"),
             "--mult", str(TIER_MULT[tier]), "--out", d],
            check=True,
        )
    return d


def main() -> None:
    tiers = ["sf0", "sf0.1", "sf1", "sf5"]
    if "--tiers" in sys.argv:
        tiers = sys.argv[sys.argv.index("--tiers") + 1].split(",")
    out_path = os.path.join(ROOT, "docs", "RATIO_CURVE_r05.json")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    results: dict[str, dict] = {}
    for tier in tiers:
        d = ensure_tier(tier)
        print(f"== {tier} ({d}) ==", flush=True)
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "baseline.py"), d],
            capture_output=True, text=True, check=True, cwd=ROOT,
        )
        results[tier] = json.loads(out.stdout.strip().splitlines()[-1])
        r = results[tier]
        print(
            f"   spark_comparable {r['spark_comparable_sec']}s  "
            f"duckdb {r['duckdb_total_sec']}s  ratio {r['ratio_comparable']}",
            flush=True,
        )

    floor_sp = results.get("sf0", {}).get("spark_comparable_sec", 0.0)
    floor_dk = results.get("sf0", {}).get("duckdb_total_sec", 0.0)
    summary = {"floor_spark_sec": floor_sp, "floor_duckdb_sec": floor_dk, "tiers": {}}
    lines = [
        "| tier | spark_cmp (s) | duckdb (s) | raw ratio | floor-adj ratio |",
        "|---|---|---|---|---|",
    ]
    for tier in tiers:
        r = results[tier]
        sp, dk = r["spark_comparable_sec"], r["duckdb_total_sec"]
        adj = None
        if tier != "sf0" and dk - floor_dk > 0:
            adj = round(max(sp - floor_sp, 0.0) / (dk - floor_dk), 2)
        summary["tiers"][tier] = {
            "spark_comparable_sec": sp,
            "duckdb_total_sec": dk,
            "ratio_raw": r["ratio_comparable"],
            "ratio_floor_adjusted": adj,
            "spark_per_query": r["spark"],
            "duckdb_per_query": r["duckdb"],
        }
        lines.append(
            f"| {tier} | {sp} | {dk} | {r['ratio_comparable']} | {adj if adj is not None else '—'} |"
        )

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print("\n".join(lines))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
