"""Reference-implementation replays for the round-6-close analytics
wave (queries/analytics2.py): each nontrivial algorithm is recomputed
in plain Python/NumPy from the same parquet and compared exactly —
independent of the DuckDB oracles, which verify cross-engine parity
but share the SQL formulation."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


@pytest.fixture(scope="module")
def pdf():
    con = duckdb.connect()
    out = {}
    for name in ["events", "orders", "lineitem", "documents"]:
        out[name] = con.execute(
            f"SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        ).df()
    return out


def test_cusum_matches_sequential_fold(spark, sf_dir, pdf):
    """The prefix-sum closed form S_i = P_i - min_{j<=i} P_j must equal
    the literal recurrence S_i = max(0, S_{i-1} + (x_i - mean))."""
    got = {
        r["event_type"]: r
        for r in (
            x.asDict()
            for x in REGISTRY["ts_cusum_changepoint"].fn(spark, sf_dir).collect()
        )
    }
    ev = pdf["events"].copy()
    ns = ev["ts"].astype("datetime64[ns]").astype("int64")
    ev["slot"] = (ns // 10**9 // 3600) * 3600
    ev["x"] = (ev["value"] * 1_000_000 + 0.5).apply(math.floor).astype("int64")
    for et, g in ev.groupby("event_type"):
        hourly = g.groupby("slot")["x"].sum().sort_index()
        mean = hourly.sum() / len(hourly)
        s, best, best_slot = 0.0, 0.0, None
        for slot, x in hourly.items():
            s = max(0.0, s + (x - mean))
            # strictly-greater keeps the EARLIEST slot on exact ties,
            # matching the query's min(slot) tie-break
            if s > best:
                best, best_slot = s, slot
        row = got[et]
        assert row["n_hours"] == len(hourly)
        assert row["max_cusum"] == pytest.approx(best / 1e6, abs=1e-6)
        if best > 0:
            assert row["peak_slot"] == best_slot


def test_pagerank_matches_naive_reference(spark, sf_dir, pdf):
    merged = pdf["orders"][["o_orderkey", "o_custkey"]].merge(
        pdf["lineitem"][["l_orderkey", "l_suppkey"]],
        left_on="o_orderkey",
        right_on="l_orderkey",
    )
    pairs = {
        (f"c:{c}", f"s:{s}")
        for c, s in zip(merged["o_custkey"], merged["l_suppkey"])
    }
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg: dict[str, int] = {}
    for src, _ in edges:
        deg[src] = deg.get(src, 0) + 1
    rank = {n: 1_000_000 for n in deg}
    for _ in range(2):
        new = {n: 150_000 for n in deg}
        for src, dst in edges:
            new[dst] += (85 * (rank[src] // deg[src])) // 100
        rank = new
    top = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["node"], r["rank_fp"])
        for r in (
            x.asDict()
            for x in REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()
        )
    ]
    assert got == top


def test_simhash_matches_hashlib_replay(spark, sf_dir, pdf):
    rows = {
        r["doc_id"]: r
        for r in (
            x.asDict()
            for x in REGISTRY["doc_simhash_portable"].fn(spark, sf_dir).collect()
        )
    }
    docs = pdf["documents"].head(25)
    for _, d in docs.iterrows():
        toks = d["text"].split()
        if not toks:
            assert d["doc_id"] not in rows
            continue
        w = [0] * 16
        for tok in toks:
            h = int(hashlib.md5(f"{tok}:sh".encode()).hexdigest()[:15], 16)
            for j in range(16):
                w[j] += 1 if (h >> j) & 1 else -1
        fp = sum(1 << j for j in range(16) if w[j] > 0)
        row = rows[d["doc_id"]]
        assert row["n_tokens"] == len(toks)
        assert row["fp16"] == fp


def test_gini_matches_direct_formula(spark, sf_dir, pdf):
    got = {
        r["n_name"]: r
        for r in (
            x.asDict()
            for x in REGISTRY["agg_gini_concentration"].fn(spark, sf_dir).collect()
        )
    }
    con = duckdb.connect()
    spend = con.execute(
        f"""
        SELECT c_nationkey, n_name, o_custkey,
               sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS sp
        FROM read_parquet('{SF_DIR}/orders.parquet') o
        JOIN read_parquet('{SF_DIR}/customer.parquet') c ON o_custkey = c_custkey
        JOIN read_parquet('{SF_DIR}/nation.parquet') n ON n_nationkey = c_nationkey
        GROUP BY 1, 2, 3
        """
    ).df()
    for name, g in spend.groupby("n_name"):
        xs = sorted(g["sp"])
        n = len(xs)
        s0 = sum(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        gini = (2 * s1 - (n + 1) * s0) / (n * s0)
        assert got[name]["gini"] == pytest.approx(gini, abs=1e-9)
        assert 0.0 <= got[name]["gini"] < 1.0


def test_weighted_median_is_a_weighted_median(spark, sf_dir, pdf):
    li = pdf["lineitem"].copy()
    li["pc"] = (li["l_extendedprice"] * 100 + 0.5).apply(math.floor)
    li["w"] = (li["l_quantity"] + 0.5).apply(math.floor)
    rows = REGISTRY["agg_weighted_median"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        g = li[li["l_returnflag"] == r["l_returnflag"]]
        wm_c = round(r["weighted_median"] * 100)
        tw = g["w"].sum()
        assert r["total_weight"] == tw
        below = g.loc[g["pc"] < wm_c, "w"].sum()
        upto = g.loc[g["pc"] <= wm_c, "w"].sum()
        assert 2 * below < tw <= 2 * upto


def test_rfm_scores_partition_customers(spark, sf_dir, pdf):
    rows = REGISTRY["cohort_rfm_segments"].fn(spark, sf_dir).collect()
    n_cust = pdf["orders"]["o_custkey"].nunique()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_score"] <= 4
        assert 1 <= r["f_score"] <= 4
        assert 1 <= r["m_score"] <= 4


def test_seasonality_strength_bounded(spark, sf_dir):
    for r in REGISTRY["ts_seasonality_strength"].fn(spark, sf_dir).collect():
        # truncated fixed-point bucket means can only LOWER the
        # between-bucket sum, so the ratio stays within [0, 1]
        assert 0.0 <= r["seasonal_strength"] <= 1.0
        assert 0 <= r["peak_hod"] <= 23


def test_attribution_replay_one_user(spark, sf_dir, pdf):
    rows = [
        r.asDict()
        for r in REGISTRY["events_attribution"].fn(spark, sf_dir).collect()
    ]
    assert rows
    for r in rows:
        if r["click_us"] is not None:
            assert r["click_us"] <= r["purchase_us"]
            assert r["gap_us"] == r["purchase_us"] - r["click_us"]
            assert r["within_1h"] == (r["gap_us"] <= 3_600_000_000)
    uid = rows[0]["user_id"]
    ev = pdf["events"]
    g = ev[ev["user_id"] == uid].copy()
    g["us"] = g["ts"].astype("datetime64[ns]").astype("int64") // 1000
    g = g.sort_values(["us", "event_id"])
    last_click = None
    expect = {}
    for _, e in g.iterrows():
        if e["event_type"] == "click":
            last_click = e["us"]
        if e["event_type"] == "purchase":
            expect[e["event_id"]] = last_click
    mine = {r["event_id"]: r["click_us"] for r in rows if r["user_id"] == uid}
    assert mine == expect


def test_markov_probabilities_normalize(spark, sf_dir):
    rows = REGISTRY["ts_markov_transitions"].fn(spark, sf_dir).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r[
            "p_transition"
        ]
    for tot in by_from.values():
        assert tot == pytest.approx(1.0, abs=1e-9)


def test_table_profile_matches_pandas(spark, sf_dir, pdf):
    rows = {
        r["col_name"]: r.asDict()
        for r in REGISTRY["diag_table_profile"].fn(spark, sf_dir).collect()
    }
    li = pdf["lineitem"]
    assert len(rows) == 9
    for c in ["l_quantity", "l_extendedprice"]:
        assert rows[c]["n_rows"] == len(li)
        assert rows[c]["n_null"] == int(li[c].isna().sum())
        assert rows[c]["n_distinct"] == li[c].nunique()
        assert rows[c]["min_num"] == li[c].min()
        assert rows[c]["max_num"] == li[c].max()
    assert rows["l_returnflag"]["min_str"] == li["l_returnflag"].min()


def test_sampled_quantiles_sample_is_portable(spark, sf_dir, pdf):
    """The hash sample must be exactly the md5-predicate subset."""
    rows = REGISTRY["sketch_sampled_quantiles"].fn(spark, sf_dir).collect()
    li = pdf["lineitem"]

    def keep(ok, ln):
        h = int(
            hashlib.md5(f"{ok}:{ln}:sq".encode()).hexdigest()[:15], 16
        )
        return h % 1000 < 50
    sampled = li[
        [
            keep(ok, ln)
            for ok, ln in zip(li["l_orderkey"], li["l_linenumber"])
        ]
    ]
    got_n = {r["l_returnflag"]: r["n_sampled"] for r in rows}
    want_n = sampled.groupby("l_returnflag").size().to_dict()
    assert got_n == want_n
