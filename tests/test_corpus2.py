"""Independent replays for the corpus-selection wave 2
(queries/corpus2.py)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_lang_temperature_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT lang, len(regexp_extract_all(lower(trim(text)), '\\S+'))
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    nd, nt = Counter(), Counter()
    for lang, n in rows:
        nd[lang] += 1
        nt[lang] += n
    tot = sum(nt.values())
    w = {lg: (nt[lg] / tot) ** 0.7 for lg in nt}
    z = sum(w.values())
    out = REGISTRY["corpus_lang_temperature"].fn(spark, sf_dir).collect()
    assert len(out) == len(nd)
    for r in out:
        lg = r["lang"]
        assert (r["n_docs"], r["n_tokens"]) == (nd[lg], nt[lg])
        p = nt[lg] / tot
        assert abs(r["token_share"] - p) < 1e-6
        assert abs(r["sample_share"] - w[lg] / z) < 1e-6
        assert abs(r["sampling_rate"] - w[lg] / z / p) < 1e-5
    # temperature must compress: rarest lang up-sampled, biggest down
    rates = {r["lang"]: r["sampling_rate"] for r in out}
    hi = max(nt, key=lambda lg: nt[lg])
    lo = min(nt, key=lambda lg: nt[lg])
    assert rates[hi] < 1.0 < rates[lo]


def test_perplexity_buckets_match_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT doc_id, lower(trim(text))
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    vocab = Counter()
    toks = {}
    for d, text in rows:
        ws = text.split()
        toks[d] = ws
        vocab.update(ws)
    n = sum(vocab.values())
    scores = {}
    for d, ws in toks.items():
        s = sum(math.log(vocab[w]) - math.log(n) for w in ws) / len(ws)
        scores[d] = round(s, 6)

    def q(p):
        xs = sorted(scores.values())
        i = p * (len(xs) - 1)
        lo, hi = int(math.floor(i)), int(math.ceil(i))
        return xs[lo] + (xs[hi] - xs[lo]) * (i - lo)

    t1, t2 = q(1 / 3), q(2 / 3)
    buckets = defaultdict(list)
    for d, s in scores.items():
        b = "tail" if s <= t1 else ("middle" if s <= t2 else "head")
        buckets[b].append(d)
    out = REGISTRY["doc_perplexity_buckets"].fn(spark, sf_dir).collect()
    got = {r["bucket"]: r for r in out}
    assert set(got) == set(buckets)
    for b, ds in buckets.items():
        assert got[b]["n_docs"] == len(ds), b
        assert got[b]["n_tokens"] == sum(len(toks[d]) for d in ds)
        exp = sum(scores[d] for d in ds) / len(ds)
        assert abs(got[b]["mean_score"] - exp) < 1e-5
    # terciles: the three buckets are within 1 of each other in size
    sizes = sorted(len(v) for v in buckets.values())
    assert sizes[-1] - sizes[0] <= max(2, len(rows) // 100)


def test_lift_gain_matches_loop(spark, sf_dir):
    rows = _duck(
        f"""SELECT value, event_type = 'purchase'
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    )
    cells = defaultdict(lambda: [0, 0])
    for v, y in rows:
        cells[v][0] += 1 if y else 0
        cells[v][1] += 1
    n_all = len(rows)
    p_all = sum(c[0] for c in cells.values())
    dec = defaultdict(lambda: [0, 0])
    start = 0
    for v in sorted(cells, reverse=True):
        c1, ct = cells[v]
        d = start * 10 // n_all
        dec[d][0] += c1
        dec[d][1] += ct
        start += ct
    out = REGISTRY["ml_lift_gain_chart"].fn(spark, sf_dir).collect()
    got = {r["decile"]: r for r in sorted(out, key=lambda r: r["decile"])}
    assert set(got) == set(dec)
    cum = 0
    for d in sorted(dec):
        n_pos, n_rows = dec[d]
        cum += n_pos
        r = got[d]
        assert (r["n_pos"], r["n_rows"]) == (n_pos, n_rows)
        assert abs(r["lift"] - n_pos * n_all / (n_rows * p_all)) < 1e-5
        assert abs(r["cum_gain"] - cum / p_all) < 1e-6
    assert abs(got[max(got)]["cum_gain"] - 1.0) < 1e-9
