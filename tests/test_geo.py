"""Reference replays for the spatial wave (queries/geo.py): the grid
radius join is compared against a brute-force all-pairs loop, and
k-NN against a sorted-distance loop — both on the same hash-derived
integer coordinates."""

from __future__ import annotations

import duckdb
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.queries.geo import _R, _WORLD

from conftest import SF_DIR


@pytest.fixture(scope="module")
def points():
    con = duckdb.connect()
    return con.execute(
        f"""SELECT c_custkey,
                   CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                        || ':gx'), 1, 15) AS BIGINT) % {_WORLD},
                   CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                        || ':gy'), 1, 15) AS BIGINT) % {_WORLD}
            FROM read_parquet('{SF_DIR}/customer.parquet')"""
    ).fetchall()


def test_radius_pairs_matches_bruteforce(spark, sf_dir, points):
    brute = []
    for i, (pa, xa, ya) in enumerate(points):
        for pb, xb, yb in points[i + 1:]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= _R * _R:
                a, b = (pa, pb) if pa < pb else (pb, pa)
                brute.append((d2, a, b))
    brute.sort()
    out = REGISTRY["geo_radius_pairs"].fn(spark, sf_dir).collect()
    assert len(out) == min(20, len(brute))
    for row, (d2, a, b) in zip(out, brute[:20]):
        assert (row["pid_a"], row["pid_b"], row["d2"]) == (a, b, d2)
        assert row["n_pairs"] == len(brute)


def test_knn_matches_bruteforce(spark, sf_dir, points):
    qs = sorted(points)[:20]
    out = REGISTRY["geo_knn"].fn(spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r["qid"], []).append((r["rnk"], r["neighbor"], r["d2"]))
    assert len(got) == len(qs)
    for qid, qx, qy in qs:
        dists = sorted(
            ((qx - x) ** 2 + (qy - y) ** 2, p)
            for p, x, y in points
            if p != qid
        )[:3]
        expect = [(i + 1, p, d2) for i, (d2, p) in enumerate(dists)]
        assert got[qid] == expect
