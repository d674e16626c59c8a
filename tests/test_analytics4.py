"""Reference-implementation replays for the evaluation/survival wave
(queries/analytics4.py): each algorithm is recomputed in plain
Python/pandas from the same parquet and compared exactly — independent
of the DuckDB oracles, which verify cross-engine parity but share the
SQL formulation."""

from __future__ import annotations

import math
import re

import duckdb
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


def _epoch_days(ts_series):
    ns = ts_series.astype("datetime64[ns]").astype("int64")
    return ns // 10**9 // 86400


def test_km_survival_matches_loop(spark, sf_dir, pdf):
    """Kaplan-Meier replayed with the textbook sequential product over
    ascending distinct durations; n_risk/d are exact, survival to
    1e-6."""
    o = pdf["orders"].copy()
    o["day"] = _epoch_days(o["o_orderdate"])
    gaps = []
    for _, g in o.groupby("o_custkey"):
        days = g.sort_values(["day", "o_orderkey"])["day"].tolist()
        gaps.extend(b - a for a, b in zip(days, days[1:]))
    assert gaps, "testdata must contain repeat customers"
    by_t = {}
    for t_ in gaps:
        by_t[t_] = by_t.get(t_, 0) + 1
    total = len(gaps)
    expect = {}
    s, seen = 1.0, 0
    for t_ in sorted(by_t):
        d = by_t[t_]
        n_risk = total - seen
        s *= (n_risk - d) / n_risk
        seen += d
        expect[t_] = (n_risk, d, s)

    got = REGISTRY["surv_km_reorder"].fn(spark, sf_dir).collect()
    assert [r["t_days"] for r in got] == sorted(by_t)
    for r in got:
        n_risk, d, s = expect[r["t_days"]]
        assert (r["n_risk"], r["d_events"]) == (n_risk, d)
        assert r["survival"] == pytest.approx(s, abs=1e-6)
    # survival is a non-increasing curve ending at 0 (no censoring)
    curve = [r["survival"] for r in got]
    assert all(a >= b for a, b in zip(curve, curve[1:]))
    assert curve[-1] == 0.0


def test_chi_square_matches_loop(spark, sf_dir, pdf):
    """Pearson chi-square replayed cell-by-cell from contingency
    dicts."""
    ev = pdf["events"].copy()
    ev["dow"] = _epoch_days(ev["ts"]) % 7
    cells = ev.groupby(["event_type", "dow"]).size().to_dict()
    r_m, c_m = {}, {}
    for (et, dow), o in cells.items():
        r_m[et] = r_m.get(et, 0) + o
        c_m[dow] = c_m.get(dow, 0) + o
    n = sum(cells.values())
    chi2 = 0.0
    for (et, dow), o in cells.items():
        e = r_m[et] * c_m[dow] / n
        chi2 += (o - e) ** 2 / e
    dof = (len(r_m) - 1) * (len(c_m) - 1)

    row = REGISTRY["diag_chi_square"].fn(spark, sf_dir).collect()[0]
    assert row["n_total"] == n
    assert row["dof"] == dof
    assert row["chi2"] == pytest.approx(chi2, abs=1e-5)


def test_forecast_eval_matches_loop(spark, sf_dir, pdf):
    """Naive / seasonal-naive backtest metrics replayed with explicit
    offsets into the ordered per-type daily series."""
    ev = pdf["events"].copy()
    ev["day"] = _epoch_days(ev["ts"])
    daily = (
        ev.groupby(["event_type", "day"]).size().rename("c").reset_index()
    )
    expect = {}
    for et, g in daily.groupby("event_type"):
        cs = g.sort_values("day")["c"].tolist()
        for method, k in [("naive", 1), ("seasonal_naive", 7)]:
            errs = [(cs[i] - cs[i - k]) for i in range(k, len(cs))]
            if not errs:
                continue
            sae = sum(abs(e) for e in errs)
            sse = sum(e * e for e in errs)
            sc = sum(cs[k:])
            expect[(et, method)] = (
                len(errs),
                sae / len(errs),
                math.sqrt(sse / len(errs)),
                sae / sc,
            )

    got = REGISTRY["ts_forecast_eval"].fn(spark, sf_dir).collect()
    assert {(r["event_type"], r["method"]) for r in got} == set(expect)
    for r in got:
        n_eval, mae, rmse, wape = expect[(r["event_type"], r["method"])]
        assert r["n_eval"] == n_eval
        assert r["mae"] == pytest.approx(mae, abs=1e-6)
        assert r["rmse"] == pytest.approx(rmse, abs=1e-6)
        assert r["wape"] == pytest.approx(wape, abs=1e-6)


def test_degree_distribution_matches_sets(spark, sf_dir, pdf):
    """Degree histogram replayed with adjacency sets; the histogram
    must account for every node on both sides."""
    o = pdf["orders"][["o_orderkey", "o_custkey"]]
    li = pdf["lineitem"][["l_orderkey", "l_suppkey"]]
    m = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    edges = {(r.o_custkey, r.l_suppkey) for r in m.itertuples()}
    cdeg, sdeg = {}, {}
    for c, s in edges:
        cdeg[c] = cdeg.get(c, 0) + 1
        sdeg[s] = sdeg.get(s, 0) + 1
    expect = {}
    for side, degs in [("customer", cdeg), ("supplier", sdeg)]:
        for d in degs.values():
            expect[(side, d)] = expect.get((side, d), 0) + 1

    got = REGISTRY["graph_degree_distribution"].fn(spark, sf_dir).collect()
    assert {
        (r["side"], r["degree"]): r["n_nodes"] for r in got
    } == expect
    by_side = {"customer": len(cdeg), "supplier": len(sdeg)}
    for side, n_nodes in by_side.items():
        assert (
            sum(r["n_nodes"] for r in got if r["side"] == side) == n_nodes
        )


def test_readability_matches_formula(spark, sf_dir, pdf):
    """Flesch counts and score replayed with re.findall; sentence
    floor of 1 applies to the punctuation-free testdata corpus."""
    docs = pdf["documents"]
    got = {
        r["doc_id"]: r
        for r in REGISTRY["doc_readability"].fn(spark, sf_dir).collect()
    }
    checked = 0
    for row in docs.itertuples():
        words = re.findall(r"\S+", row.text)
        if not words:
            assert row.doc_id not in got
            continue
        sents = max(len(re.findall(r"[.!?]+", row.text)), 1)
        sylls = len(re.findall(r"[aeiouy]+", row.text.lower()))
        r = got[row.doc_id]
        assert (r["n_sentences"], r["n_words"], r["n_syllables"]) == (
            sents,
            len(words),
            sylls,
        )
        flesch = 206.835 - 1.015 * (len(words) / sents) - 84.6 * (
            sylls / len(words)
        )
        assert r["flesch"] == pytest.approx(flesch, abs=1e-9)
        checked += 1
    assert checked == len(got)


def test_inverted_index_matches_postings(spark, sf_dir, pdf):
    """Posting lists replayed with dict-of-sets; the 20-id cap must
    take the SMALLEST doc_ids."""
    docs = pdf["documents"]
    postings = {}
    for row in docs.itertuples():
        for term in set(re.findall(r"\S+", row.text.strip().lower())):
            postings.setdefault(term, set()).add(row.doc_id)
    top = sorted(postings, key=lambda t: (-len(postings[t]), t))[:50]

    got = REGISTRY["doc_inverted_index"].fn(spark, sf_dir).collect()
    assert [r["term"] for r in got] == top
    for r in got:
        ids = sorted(postings[r["term"]])
        assert r["df"] == len(ids)
        assert r["postings"] == ",".join(str(i) for i in ids[:20])
