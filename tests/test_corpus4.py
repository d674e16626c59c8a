"""Replays for corpus wave 4 (queries/corpus4.py) and the SQL
catalog front door."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def _duck(sql):
    return duckdb.connect().execute(sql).fetchall()


def _p60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_contamination_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT doc_id, lang, regexp_extract_all(lower(text), '\\S+')
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    train = set()
    ev = {}
    for did, lang, tk in rows:
        if len(tk) < 5:
            continue
        grams = {
            _p60(" ".join(tk[i: i + 5])) for i in range(len(tk) - 4)
        }
        if lang == "zh":
            ev[did] = grams
        else:
            train |= grams
    out = {r["doc_id"]: r for r in REGISTRY["doc_contamination_overlap"].fn(spark, sf_dir).collect()}
    assert set(out) == set(ev)
    for did, grams in ev.items():
        hit = len(grams & train)
        r = out[did]
        assert r["n_grams"] == len(grams)
        assert r["n_hit"] == hit
        assert r["contaminated"] == (2 * hit >= len(grams))


def test_fertility_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT lang,
               len(regexp_extract_all(lower(text), '\\S+')),
               len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')),
               strlen(text)
            FROM read_parquet('{SF_DIR}/documents.parquet')"""
    )
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for lang, w, b, by in rows:
        a = agg[lang]
        a[0] += 1
        a[1] += w
        a[2] += b
        a[3] += by
    out = {r["lang"]: r for r in REGISTRY["corpus_tokenizer_fertility"].fn(spark, sf_dir).collect()}
    for lang, (n, w, b, by) in agg.items():
        r = out[lang]
        assert (r["n_docs"], r["words"], r["bpe_tokens"], r["bytes"]) == (n, w, b, by)
        assert abs(r["fertility"] - b / w) < 1e-6
        assert r["fertility"] >= 1.0  # BPE-ish splits never merge words


def test_cosine_histogram_replay(spark, sf_dir):
    rows = _duck(
        f"""SELECT vec_id, CAST(embedding AS DOUBLE[])
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            ORDER BY vec_id"""
    )
    import math

    bins = Counter()
    n_pairs = 0
    for i in range(len(rows)):
        ia, va = rows[i]
        for j in range(i + 1, len(rows)):
            ib, vb = rows[j]
            if _p60(f"{ia}_{ib}:cp") % 50 != 0:
                continue
            n_pairs += 1
            d = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb2 = math.sqrt(sum(x * x for x in vb))
            bins[math.floor(d / (na * nb2) * 10)] += 1
    out = {r["bin"]: r["n_pairs"] for r in REGISTRY["emb_cosine_pair_histogram"].fn(spark, sf_dir).collect()}
    assert out == dict(bins)
    assert sum(out.values()) == n_pairs


def test_sql_catalog_front_door(spark, sf_dir):
    from kafka_stream_aggregator_spark.catalog import register_tables, sql

    names = register_tables(spark, sf_dir)
    assert "lineitem" in names and len(names) == 10
    n = sql(spark, sf_dir, "SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    (exp,) = _duck(f"SELECT count(*) FROM read_parquet('{SF_DIR}/lineitem.parquet')")[0]
    assert n == exp
    # prefixed database encoding
    pnames = register_tables(spark, sf_dir, database="sf")
    assert "sf__lineitem" in pnames
    n2 = spark.sql("SELECT count(*) AS n FROM sf__lineitem").collect()[0]["n"]
    assert n2 == exp
    # encoding is validated: '__' in the database name would be ambiguous
    import pytest

    with pytest.raises(ValueError):
        register_tables(spark, sf_dir, database="a__b")
    with pytest.raises(ValueError):
        register_tables(spark, sf_dir, database="not an ident")
