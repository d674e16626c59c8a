"""Independent Python replays for the pipeline-rules wave
(queries/pipeline_rules.py): Gopher quality gate, duplicated-span
coverage, n-gram novelty, DSIR importance weights."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _docs():
    return duckdb.connect().execute(
        f"""SELECT doc_id, lang, source, lower(trim(text))
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    ).fetchall()


def _u64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_gopher_rules_match_loop(spark, sf_dir):
    per = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for _id, _lang, src, text in _docs():
        ws = text.split()
        n, nd, sl = len(ws), len(set(ws)), sum(len(w) for w in ws)
        ok_len = 15 <= n <= 120
        ok_mwl = 3 * n <= sl <= 10 * n
        ok_dup = 2 * nd > n
        ok_stop = bool({"a", "the"} & set(ws))
        row = per[src]
        row[0] += 1
        row[1] += not ok_len
        row[2] += not ok_mwl
        row[3] += not ok_dup
        row[4] += not ok_stop
        row[5] += ok_len and ok_mwl and ok_dup and ok_stop
    out = REGISTRY["doc_gopher_quality_rules"].fn(spark, sf_dir).collect()
    assert len(out) == len(per)
    for r in out:
        exp = per[r["source"]]
        got = [r["n_docs"], r["fail_len"], r["fail_mwl"],
               r["fail_dup"], r["fail_stop"], r["n_pass"]]
        assert got == exp, r["source"]


def test_dup_span_coverage_matches_loop(spark, sf_dir):
    docs = {d: t.split() for d, _l, _s, t in _docs()}
    gc = Counter()
    for ws in docs.values():
        for i in range(len(ws) - 4):
            gc[" ".join(ws[i : i + 5])] += 1
    expect = {}
    for d, ws in docs.items():
        cov = set()
        for i in range(len(ws) - 4):
            if gc[" ".join(ws[i : i + 5])] > 1:
                cov.update(range(i, i + 5))
        expect[d] = (len(ws), len(cov))
    out = REGISTRY["doc_dup_span_coverage"].fn(spark, sf_dir).collect()
    assert len(out) == len(expect)
    for r in out:
        n, c = expect[r["doc_id"]]
        assert (r["n_tokens"], r["covered_tokens"]) == (n, c), r["doc_id"]
        if n:
            assert abs(r["coverage"] - round(c / n, 6)) < 1e-9


def test_ngram_novelty_matches_loop(spark, sf_dir):
    docs = {d: t.split() for d, _l, _s, t in _docs()}
    first = {}
    grams = {}
    for d in sorted(docs):
        ws = docs[d]
        gs = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        grams[d] = gs
        for g in gs:
            first.setdefault(g, d)
    out = REGISTRY["doc_ngram_novelty"].fn(spark, sf_dir).collect()
    assert len(out) == len(docs)
    for r in out:
        gs = grams[r["doc_id"]]
        novel = sum(1 for g in gs if first[g] == r["doc_id"])
        assert (r["n_grams"], r["n_novel"]) == (len(gs), novel)


def test_dsir_importance_matches_loop(spark, sf_dir):
    B = 4096
    docs = _docs()
    buckets = {}

    def bkt(w):
        if w not in buckets:
            buckets[w] = _u64(f"{w}:dsir") % B
        return buckets[w]

    cr, ct = Counter(), Counter()
    for _d, lang, _s, text in docs:
        for w in text.split():
            b = bkt(w)
            cr[b] += 1
            if lang == "en":
                ct[b] += 1
    nr, nt = sum(cr.values()), sum(ct.values())
    out = REGISTRY["doc_dsir_importance"].fn(spark, sf_dir).collect()
    assert len(out) == len(docs)
    expect = {}
    for d, lang, _s, text in docs:
        ws = text.split()
        s = sum(
            math.log(ct[bkt(w)] + 1.0) - math.log(cr[bkt(w)] + 1.0)
            for w in ws
        ) + len(ws) * (math.log(nr + B) - math.log(nt + B))
        expect[d] = (lang, len(ws), s)
    # the en target slice must score higher on average than the rest
    en = [expect[d][2] for d in expect if expect[d][0] == "en"]
    rest = [expect[d][2] for d in expect if expect[d][0] != "en"]
    assert sum(en) / len(en) > sum(rest) / len(rest)
    for r in out:
        lang, n, s = expect[r["doc_id"]]
        assert (r["lang"], r["n_tokens"]) == (lang, n)
        assert abs(r["dsir_logw"] - s) < 1e-4, r["doc_id"]
