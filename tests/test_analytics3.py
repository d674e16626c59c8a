"""Reference-implementation replays for the retrieval/recommendation
wave (queries/analytics3.py): every algorithm is recomputed in plain
Python/pandas from the same parquet and compared exactly — independent
of the DuckDB oracles, which verify cross-engine parity but share the
SQL formulation."""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.queries.analytics3 import (
    _BM25_TERMS,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def pdf():
    con = duckdb.connect()
    out = {}
    for name in ["events", "orders", "lineitem", "documents", "supplier"]:
        out[name] = con.execute(
            f"SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        ).df()
    return out


def test_bm25_matches_pure_python(spark, sf_dir, pdf):
    """Okapi BM25 replayed from first principles (k1=1.2, b=0.75,
    idf = ln(1 + (N-df+0.5)/(df+0.5)), trailing-term tf norm with
    avgdl) — top-10 ids, ranks, and scores must match."""
    docs = pdf["documents"]
    toks = {
        r.doc_id: re.findall(r"\S+", r.text.strip().lower())
        for r in docs.itertuples()
    }
    dl = {d: len(ts) for d, ts in toks.items() if ts}
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    k1, b = 1.2, 0.75
    tf = {}
    for d, ts in toks.items():
        for term in _BM25_TERMS:
            c = ts.count(term)
            if c:
                tf[(d, term)] = c
    df = {
        term: sum(1 for (_, t2) in tf if t2 == term)
        for term in _BM25_TERMS
    }
    scores = {}
    for (d, term), c in tf.items():
        idf = math.log(1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
        s = idf * (c * (k1 + 1.0)) / (
            c + k1 * (1.0 - b + b * dl[d] / avgdl)
        )
        scores[d] = scores.get(d, 0.0) + s
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = (
        REGISTRY["doc_bm25_topk"].fn(spark, sf_dir)
        .orderBy("rank")
        .collect()
    )
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    assert [r["rank"] for r in got] == list(range(1, len(expect) + 1))
    for r, (_, s) in zip(got, expect):
        assert r["bm25"] == pytest.approx(s, abs=1e-6)


def test_item_affinity_matches_pandas(spark, sf_dir, pdf):
    """Co-purchase counts and cosine replayed with set arithmetic."""
    li = pdf["lineitem"][["l_orderkey", "l_partkey"]].drop_duplicates()
    by_order = li.groupby("l_orderkey")["l_partkey"].apply(sorted)
    item_n = li.groupby("l_partkey").size().to_dict()
    co = {}
    for parts in by_order:
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                co[(parts[i], parts[j])] = co.get((parts[i], parts[j]), 0) + 1
    expect = sorted(co.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = REGISTRY["rec_item_affinity"].fn(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r, ((pa, pb), c) in zip(got, expect):
        assert (r["part_a"], r["part_b"], r["co"]) == (pa, pb, c)
        cos = c / math.sqrt(item_n[pa] * item_n[pb])
        assert r["cosine"] == pytest.approx(cos, abs=1e-6)


def test_rolling_zscore_matches_pandas(spark, sf_dir, pdf):
    """Trailing 7-day z replayed with an explicit window loop; the
    current day must be excluded from its own baseline."""
    ev = pdf["events"].copy()
    ev["day"] = (
        ev["ts"].astype("datetime64[ns]").dt.strftime("%Y-%m-%d")
    )
    daily = (
        ev.groupby(["event_type", "day"]).size().rename("c").reset_index()
    )
    expect = {}
    for et, g in daily.groupby("event_type"):
        cs = g.sort_values("day")[["day", "c"]].values.tolist()
        for i in range(len(cs)):
            frame = [c for _, c in cs[max(0, i - 7): i]]
            if len(frame) != 7:
                continue
            sx, sxx = sum(frame), sum(c * c for c in frame)
            if 7 * sxx <= sx * sx:
                continue
            z = (cs[i][1] - sx / 7.0) / math.sqrt(
                (7.0 * sxx - float(sx * sx)) / 42.0
            )
            expect[(et, cs[i][0])] = z

    got = REGISTRY["ts_rolling_zscore"].fn(spark, sf_dir).collect()
    assert {(r["event_type"], r["day"]) for r in got} == set(expect)
    for r in got:
        z = expect[(r["event_type"], r["day"])]
        assert r["z"] == pytest.approx(z, abs=1e-6)
        assert r["is_anomaly"] == (1 if abs(z) >= 2.0 else 0)
        assert r["c"] >= 0


def test_mann_kendall_matches_pair_loop(spark, sf_dir, pdf):
    """S replayed as the literal double loop over ordered day pairs —
    an exact integer, so equality is strict."""
    ev = pdf["events"].copy()
    ns = ev["ts"].astype("datetime64[ns]").astype("int64")
    ev["day"] = ns // 10**9 // 86400
    daily = (
        ev.groupby(["event_type", "day"]).size().rename("c").reset_index()
    )
    got = {
        r["event_type"]: r
        for r in REGISTRY["ts_mann_kendall"].fn(spark, sf_dir).collect()
    }
    for et, g in daily.groupby("event_type"):
        cs = g.sort_values("day")["c"].tolist()
        s = sum(
            (cs[j] > cs[i]) - (cs[j] < cs[i])
            for i in range(len(cs))
            for j in range(i + 1, len(cs))
        )
        row = got[et]
        assert row["n_days"] == len(cs)
        assert row["s_stat"] == s
        n_pairs = len(cs) * (len(cs) - 1) // 2
        assert row["tau"] == pytest.approx(s / n_pairs, abs=1e-6)
        assert row["trend"] == (
            "increasing" if s > 0 else "decreasing" if s < 0 else "no-trend"
        )


def test_khop_reach_matches_set_bfs(spark, sf_dir, pdf):
    """2-hop reach replayed with adjacency sets."""
    o = pdf["orders"][["o_orderkey", "o_custkey"]]
    li = pdf["lineitem"][["l_orderkey", "l_suppkey"]]
    m = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    adj = {}
    for c, s in {
        (f"c:{r.o_custkey}", f"s:{r.l_suppkey}") for r in m.itertuples()
    }:
        adj.setdefault(c, set()).add(s)
        adj.setdefault(s, set()).add(c)
    seeds = {
        f"s:{k}" for k in pdf["supplier"]["s_suppkey"] if k <= 10
    }
    got = {
        r["seed"]: r["n_reachable"]
        for r in REGISTRY["graph_khop_reach"].fn(spark, sf_dir).collect()
    }
    assert set(got) == seeds
    for seed in seeds:
        reach = {seed}
        frontier = {seed}
        for _ in range(2):
            frontier = {
                n for f in frontier for n in adj.get(f, ())
            } - reach
            reach |= frontier
        assert got[seed] == len(reach), seed


def test_k_hop_reach_toy_graph(spark):
    """Unit semantics of the BFS primitive on a path graph
    a-b-c-d: k=0 is the seed alone, each k adds one ring, and the
    reach set saturates at the component."""
    from kafka_stream_aggregator_spark.graph import k_hop_reach

    undirected = [("a", "b"), ("b", "c"), ("c", "d")]
    edges = spark.createDataFrame(
        undirected + [(d, s) for s, d in undirected], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "seed string")
    for k, expect in [(0, {"a"}), (1, {"a", "b"}), (2, {"a", "b", "c"}),
                      (5, {"a", "b", "c", "d"})]:
        got = {r["node"] for r in k_hop_reach(edges, seeds, k).collect()}
        assert got == expect, k
    with pytest.raises(ValueError):
        k_hop_reach(edges, seeds, -1)
