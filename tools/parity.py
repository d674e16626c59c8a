"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its DuckDB oracle on the same
parquet, canonicalizes (columns sorted by name, rows sorted, floats
already rounded by the queries themselves), and diffs. Usage:

    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _spark_cat(dt: str) -> str:
    dt = dt.lower()
    if dt.startswith(("tinyint", "smallint", "int", "bigint", "long", "short", "byte")):
        return "int"
    if dt.startswith(("double", "float")):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("boolean"):
        return "bool"
    if dt.startswith("timestamp"):
        return "ts"
    if dt.startswith("date"):
        return "date"
    if dt.startswith("string"):
        return "str"
    return dt


def _duck_cat(ty: str) -> str:
    ty = ty.upper()
    if ty in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT"):
        return "int"
    if ty in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if ty.startswith("DECIMAL"):
        return "decimal"
    if ty == "BOOLEAN":
        return "bool"
    if ty.startswith("TIMESTAMP"):
        return "ts"
    if ty == "DATE":
        return "date"
    if ty == "VARCHAR":
        return "str"
    return ty.lower()


def type_mismatches(s_schema, o_cols, o_types):
    """Cross-category dtype diffs (int vs float etc.) that Python value
    equality hides but the driver's typed hash catches (r2 lesson:
    fn_math_suite floor/ceil LONG-vs-DOUBLE, sign TINYINT-vs-DOUBLE)."""
    s_map = {name: _spark_cat(dt) for name, dt in s_schema}
    bad = []
    for c, ty in zip(o_cols, o_types):
        oc = _duck_cat(str(ty))
        sc = s_map.get(c)
        if sc is not None and sc != oc:
            bad.append((c, sc, oc))
    return bad


def _canon_val(v):
    # Floats become their repr AFTER the 6-dp round: Python float
    # equality is sign-blind (-0.0 == 0.0) but the driver's typed
    # hash is NOT — repr('-0.0') != repr('0.0') reproduces the
    # driver's sign-aware compare (VERDICT r10 item 1: the old
    # `-0.0 -> 0.0` mask here made this replica structurally blind
    # to the exact class the driver red-flagged on atkinson).
    if isinstance(v, float):
        return repr(round(v, 6))
    if isinstance(v, (list, tuple)):
        return tuple(_canon_val(x) for x in v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_canon_val(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    # no console progress bar: its \r rewrites garble FAIL diagnostics
    # in tee'd artifacts (VERDICT r7 item 6, docs/PARITY_r07_sf5_w1.txt)
    spark = get_spark(
        "parity",
        cpus=8,
        shuffle_partitions=8,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        max_rows = int(os.environ.get("SPARK_GRAFT_PARITY_MAX_ROWS", "0"))
        try:
            df = spec.fn(spark, sf_dir)
            s_cols = df.columns
            if max_rows and spec.oracle is not None:
                # scale-tier guard: a data-sized output (e.g. 30M window
                # rows at sf5) makes the in-Python canonicalize/compare
                # the bottleneck (hours + tens of GB), not the engines —
                # those queries are value-compared at tiers where the
                # output fits (sf0.01 driver gate + full sf1 coverage).
                n = df.count()
                if n > max_rows:
                    print(
                        f"SKIP {name}: output {n} rows > cap {max_rows} "
                        f"(value-compared at smaller tiers)"
                    )
                    continue
            s_rows = [tuple(r) for r in df.collect()]
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"self {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            rel = con.sql(spec.oracle)
            # The driver fetches oracle results through pandas, where
            # HUGEINT/DECIMAL become float64 and break value-hash parity
            # with Spark longs even when values are equal (r01 lesson:
            # sessionize_gap / cumulative_distinct_users). Fail early.
            unsafe = [
                (c, str(ty))
                for c, ty in zip(rel.columns, rel.types)
                if str(ty) in ("HUGEINT", "UHUGEINT")
                or str(ty).startswith("DECIMAL")
            ]
            if unsafe:
                print(f"FAIL {name}: driver-unsafe oracle types {unsafe} "
                      f"(CAST to BIGINT/DOUBLE in the oracle SQL)")
                n_fail += 1
                continue
            tbad = type_mismatches(df.dtypes, rel.columns,
                                   [str(t) for t in rel.types])
            if tbad:
                print(f"FAIL {name}: dtype category mismatch "
                      f"(col, spark, oracle): {tbad}")
                n_fail += 1
                continue
            cur = con.execute(spec.oracle)
            o_cols = [d[0] for d in cur.description]
            o_rows = cur.fetchall()
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR")
            traceback.print_exc()
            n_fail += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        oc, orows = canon(o_rows, o_cols)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if len(sr) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(sr)} oracle={len(orows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, orows) if a != b]
        if bad:
            def clean(v):  # keep FAIL rows single-line in artifacts
                return repr(v).replace("\r", "\\r").replace("\n", "\\n")

            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first: ")
            print(f"  cols:   {sc}")
            print(f"  spark:  {clean(bad[0][0])}")
            print(f"  oracle: {clean(bad[0][1])}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sr)} rows ({time.time()-t0:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
