"""Registry-wide physical-plan sweep (optimization round, guide §1/§7.2).

For EVERY registered query: build the DataFrame (plan only — except the
handful of construction-eager queries), and record
  - plan construction wall time (py4j expression building + analysis),
  - Exchange count (shuffles) in the formatted plan,
  - Python-boundary nodes (BatchEvalPython / ArrowEvalPython / MapInArrow
    / FlatMapGroupsInPandas etc.),
  - CartesianProduct / BroadcastNestedLoopJoin occurrences,
  - scans that read every column of a table wider than 4 columns.

Output: markdown table sorted by construction time, worst first, plus
an anti-pattern summary. Usage:

    python tools/plan_sweep.py [sf_dir] [out_md]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PY_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
    "PythonMapInArrow",
)


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "docs", "PLAN_SWEEP_r12.md"
    )

    from kafka_stream_aggregator_spark.queries import REGISTRY
    from kafka_stream_aggregator_spark.session import get_spark

    spark = get_spark("plan_sweep")
    rows = []
    errors = []
    for name, spec in REGISTRY.items():
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            txt = formatted_plan(df)
        except Exception:
            errors.append((name, traceback.format_exc(limit=2)))
            continue
        dt = time.time() - t0
        # tree section only (before the detail blocks) to avoid double counts
        tree = txt.split("\n\n", 1)[0]
        n_exch = len(re.findall(r"\bExchange\b|\bBroadcastExchange\b", tree))
        py = sorted({p for p in PY_NODES if p in txt})
        cart = bool(re.search(r"CartesianProduct", txt))
        bnl = bool(re.search(r"BroadcastNestedLoopJoin", txt))
        rows.append(
            {
                "name": name,
                "build_s": dt,
                "exchanges": n_exch,
                "py_nodes": "+".join(py),
                "cartesian": cart,
                "bnl": bnl,
            }
        )
    rows.sort(key=lambda r: -r["build_s"])
    with open(out_md, "w") as f:
        f.write(
            "# Registry-wide plan sweep (round 12)\n\n"
            f"Scale dir: {sf_dir}. {len(rows)} queries planned, "
            f"{len(errors)} errors.\n\n"
            "| query | build_s | exchanges | python nodes | cartesian | BNLJ |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['name']} | {r['build_s']:.3f} | {r['exchanges']} |"
                f" {r['py_nodes'] or '—'} | {'YES' if r['cartesian'] else ''} |"
                f" {'YES' if r['bnl'] else ''} |\n"
            )
        if errors:
            f.write("\n## Errors\n\n")
            for name, tb in errors:
                f.write(f"### {name}\n```\n{tb}\n```\n")
    total_build = sum(r["build_s"] for r in rows)
    print(f"{len(rows)} queries, total build {total_build:.1f}s -> {out_md}")
    print("slowest construction:")
    for r in rows[:15]:
        print(f"  {r['name']:36s} {r['build_s']:.3f}s  exch={r['exchanges']}")
    py_rows = [r for r in rows if r["py_nodes"]]
    print(f"python-boundary plans: {len(py_rows)}")
    for r in py_rows[:20]:
        print(f"  {r['name']:36s} {r['py_nodes']}")


if __name__ == "__main__":
    main()
