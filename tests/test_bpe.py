"""Distributed BPE training == pure-Python reference (same vocab
reduction, same argmax tiebreaks, same left-to-right merge fold)."""

from __future__ import annotations

from kafka_stream_aggregator_spark.llm.bpe import (
    reference_bpe,
    train_bpe,
    words_with_counts,
)
from kafka_stream_aggregator_spark.queries import REGISTRY


def test_bpe_matches_reference_synthetic(spark):
    texts = [
        "the cat sat on the mat",
        "the hat and the bat",
        "that cat that hat",
        "low lower lowest",
        "new newer newest",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert train_bpe(df, "text", n_merges=10) == reference_bpe(texts, 10)


def test_bpe_matches_reference_real_corpus(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    texts = [r["text"] for r in docs.select("text").collect()]
    got = train_bpe(docs, "text", n_merges=8)
    want = reference_bpe(texts, 8)
    assert got == want


def test_bpe_merge_is_nonoverlapping_left_to_right(spark):
    # 'aaa' under merge (a,a) must become [aa, a], never [a, aa] or [aa, aa]
    texts = ["aaa aaa aaa"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges = train_bpe(df, "text", n_merges=1)
    assert merges == reference_bpe(texts, 1)
    assert merges[0][1] == "a" and merges[0][2] == "a"


def test_bpe_registry_query(spark, sf_dir):
    rows = REGISTRY["corpus_bpe_merges"].fn(spark, sf_dir).collect()
    assert rows
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks)
    assert all(r["support"] >= 2 for r in rows)


def test_words_with_counts_symbols(spark):
    df = spark.createDataFrame([("Ab ab",)], "text string")
    rows = words_with_counts(df, "text").collect()
    assert len(rows) == 1
    assert rows[0]["sym"] == ["a", "b", "</w>"]
    assert rows[0]["cnt"] == 2
