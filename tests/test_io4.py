"""Replays for the fourth IO/feature wave (queries/io4.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.queries.io4 import (
    parquet_rowgroup_stats,
)

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_rowgroup_stats_match_parquet_metadata(spark, sf_dir):
    exp = {
        (f.rsplit("/", 1)[-1], rg): (n, int(mn), int(mx))
        for f, rg, n, mn, mx in _duck(
            f"""SELECT DISTINCT file_name, row_group_id,
                       row_group_num_rows, stats_min_value,
                       stats_max_value
                FROM parquet_metadata('{SF_DIR}/lineitem.parquet')
                WHERE path_in_schema = 'l_orderkey'"""
        )
    }
    out = parquet_rowgroup_stats(spark, sf_dir).collect()
    got = {
        (r["file_name"], r["row_group_id"]): (
            r["n_rows"],
            r["min_orderkey"],
            r["max_orderkey"],
        )
        for r in out
    }
    assert got == exp
    # and the registered aggregate equals the data
    [(n, mn, mx)] = _duck(
        f"""SELECT count(*), min(l_orderkey), max(l_orderkey)
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    )
    [r] = REGISTRY["io_parquet_rowgroup_stats"].fn(spark, sf_dir).collect()
    assert (r["n_rows"], r["min_orderkey"], r["max_orderkey"]) == (
        n,
        mn,
        mx,
    )


def test_target_encoding_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT o_orderkey, c_nationkey,
                   CAST(round(o_totalprice*100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') o
            JOIN read_parquet('{SF_DIR}/customer.parquet') c
              ON o.o_custkey = c.c_custkey"""
    )
    s, n = Counter(), Counter()
    for _k, nat, cents in rows:
        s[nat] += cents
        n[nat] += 1
    mu = sum(s.values()) / sum(n.values())
    out = REGISTRY["ml_target_encoding"].fn(spark, sf_dir).collect()
    assert len(out) == len(rows)
    got = {r["o_orderkey"]: r for r in out}
    for k, nat, cents in rows:
        enc = ((s[nat] - cents) + 10 * mu) / (n[nat] - 1 + 10) / 100.0
        r = got[k]
        assert r["nat"] == nat
        assert abs(r["nation_enc"] - enc) < 1e-5, k
    # leakage check: encoding differs per row within a nation
    by_nat = defaultdict(set)
    for r in out:
        by_nat[r["nat"]].add(r["nation_enc"])
    assert any(len(v) > 1 for v in by_nat.values())


def test_mutual_information_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT event_type, extract(hour FROM ts)
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    cell = Counter(rows)
    rx = Counter()
    cy = Counter()
    for (x, y), c in cell.items():
        rx[x] += c
        cy[y] += c
    nn = len(rows)
    mi = sum(
        c / nn * math.log(c * nn / (rx[x] * cy[y]))
        for (x, y), c in cell.items()
    )
    hx = -sum(r / nn * math.log(r / nn) for r in rx.values())
    hy = -sum(k / nn * math.log(k / nn) for k in cy.values())
    [r] = REGISTRY["ml_mutual_information"].fn(spark, sf_dir).collect()
    assert abs(r["mi_nats"] - mi) < 1e-5
    assert abs(r["h_x"] - hx) < 1e-5
    assert abs(r["h_y"] - hy) < 1e-5
    assert abs(r["nmi"] - mi / math.sqrt(hx * hy)) < 1e-5
    assert 0 <= r["nmi"] <= 1
