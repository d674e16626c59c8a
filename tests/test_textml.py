"""Reference replays for the text-ML wave (queries/textml.py):
naive Bayes is retrained with a dict-based Python implementation,
collocation lift and vocabulary richness with Counters."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs():
    con = duckdb.connect()
    return con.execute(
        f"""SELECT doc_id, lang, source,
                   regexp_split_to_array(lower(trim(text)), '\\s+')
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    ).fetchall()


def test_naive_bayes_matches_loop(spark, sf_dir, docs):
    train = [(d, l, w) for d, l, _, w in docs if d % 5 != 0]
    test = [(d, l, w) for d, l, _, w in docs if d % 5 == 0]
    wc = defaultdict(Counter)
    docs_per = Counter()
    for _, l, words in train:
        wc[l].update(words)
        docs_per[l] += 1
    vocab = len({w for _, _, ws in train for w in ws})
    dtot = sum(docs_per.values())
    tok_c = {l: sum(c.values()) for l, c in wc.items()}
    langs = sorted(wc)
    conf = Counter()
    for _, true_l, words in test:
        best = None
        for cand in langs:
            s = math.log(docs_per[cand] / dtot)
            for w in words:
                c = wc[cand].get(w, 0)
                if c:
                    s += math.log(c + 1.0)
            s -= len(words) * math.log(tok_c[cand] + vocab)
            s = round(s, 6)
            # argmax with (score DESC, lang ASC) tie-break
            if best is None or s > best[0] or (s == best[0] and cand < best[1]):
                best = (s, cand)
        conf[(true_l, best[1])] += 1
    out = REGISTRY["ml_naive_bayes_langid"].fn(spark, sf_dir).collect()
    got = {(r["true_lang"], r["pred_lang"]): r["n"] for r in out}
    assert got == dict(conf)
    # NOTE: no accuracy floor — at sf0.001 the synthetic languages
    # share most vocabulary and NB lands ~30% (replay agrees exactly);
    # the contract here is the exact confusion-matrix match above.
    assert sum(got.values()) == len(test)


def test_collocation_lift_matches_loop(spark, sf_dir, docs):
    bg = Counter()
    uni = Counter()
    for _, _, _, ws in docs:
        for i in range(len(ws) - 1):
            bg[(ws[i], ws[i + 1])] += 1
        uni.update(ws)
    n1 = sum(uni.values())
    n2 = sum(bg.values())
    cand = [
        (x, y, c)
        for (x, y), c in bg.items()
        if c >= 3 and c * n1 * n1 > n2 * uni[x] * uni[y]
    ]
    cand.sort(key=lambda r: (-r[2], r[0], r[1]))
    out = REGISTRY["doc_collocation_lift"].fn(spark, sf_dir).collect()
    assert len(out) == min(30, len(cand))
    for row, (x, y, c) in zip(out, cand[:30]):
        assert (row["x"], row["y"], row["c_xy"]) == (x, y, c)
        lift = c * n1 * n1 / (n2 * uni[x] * uni[y])
        assert row["lift"] == pytest.approx(lift, rel=1e-6)
        assert row["lift"] > 1.0


def test_vocab_richness_matches_loop(spark, sf_dir, docs):
    freq = Counter()
    for _, _, _, ws in docs:
        freq.update(ws)
    per_src = defaultdict(list)
    for _, _, src, ws in docs:
        per_src[src].extend(ws)
    out = REGISTRY["doc_vocab_richness"].fn(spark, sf_dir).collect()
    assert len(out) == len(per_src)
    for row in out:
        toks = per_src[row["source"]]
        types = set(toks)
        hapax = {w for w in types if freq[w] == 1}
        assert row["n_tokens"] == len(toks)
        assert row["n_types"] == len(types)
        assert row["n_hapax"] == len(hapax)
        assert row["type_token_ratio"] == pytest.approx(
            len(types) / len(toks), abs=1e-6
        )
        assert row["hapax_share"] == pytest.approx(
            len(hapax) / len(types), abs=1e-6
        )
