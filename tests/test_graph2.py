"""Reference replays for the link-prediction / local-clustering wave
(queries/graph2.py): both are recomputed with explicit Python set
arithmetic on the same co-occurrence edge list."""

from __future__ import annotations

import math
from itertools import combinations

import duckdb
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


@pytest.fixture(scope="module")
def graph():
    con = duckdb.connect()
    rows = con.execute(
        f"""WITH b AS (
              SELECT DISTINCT user_id, event_type,
                     CAST(floor(epoch(ts)/300) AS BIGINT) AS w
              FROM read_parquet('{SF_DIR}/events.parquet')
              WHERE user_id < 120)
            SELECT DISTINCT a.user_id, b2.user_id
            FROM b a JOIN b b2
              ON a.event_type = b2.event_type AND a.w = b2.w
             AND a.user_id < b2.user_id"""
    ).fetchall()
    adj = {}
    for u, v in rows:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return adj, {(u, v) for u, v in rows}


def test_link_prediction_matches_loop(spark, sf_dir, graph):
    adj, edges = graph
    scores = {}
    for b, nbrs in adj.items():
        for x, y in combinations(sorted(nbrs), 2):
            if (x, y) in edges:
                continue
            cn, aa = scores.get((x, y), (0, 0.0))
            scores[(x, y)] = (cn + 1, aa + round(1 / math.log(len(adj[b])), 9))
    ranked = sorted(
        scores.items(), key=lambda kv: (-kv[1][0], kv[0][0], kv[0][1])
    )[:20]
    out = REGISTRY["graph_link_prediction"].fn(spark, sf_dir).collect()
    assert len(out) == len(ranked)
    for row, ((x, y), (cn, aa)) in zip(out, ranked):
        assert (row["ua"], row["ub"]) == (x, y)
        assert row["cn"] == cn
        jac = cn / (len(adj[x]) + len(adj[y]) - cn)
        assert row["jaccard"] == pytest.approx(jac, abs=1e-6)
        assert row["adamic_adar"] == pytest.approx(aa, abs=1e-6)


def test_clustering_local_matches_loop(spark, sf_dir, graph):
    adj, edges = graph
    ccs = []
    n_full = n_open = 0
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            ccs.append(0.0)
            n_open += 1
            continue
        links = sum(
            1 for a, b in combinations(sorted(nbrs), 2) if (a, b) in edges
        )
        c = 2 * links / (d * (d - 1))
        ccs.append(round(c, 9))
        if c >= 0.999999999:
            n_full += 1
        if c == 0.0:
            n_open += 1
    out = REGISTRY["graph_clustering_local"].fn(spark, sf_dir).collect()[0]
    assert out["n_vertices"] == len(adj)
    assert out["avg_local_cc"] == pytest.approx(sum(ccs) / len(ccs), abs=1e-6)
    assert out["n_fully_clustered"] == n_full
    assert out["n_open"] == n_open
