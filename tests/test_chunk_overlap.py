"""Pure-Python replay of the sliding-window RAG chunker
(queries/corpus.py doc_chunk_overlap)."""

from __future__ import annotations

import hashlib
import re

import duckdb
import pytest

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.queries.corpus import (
    _RAG_STRIDE,
    _RAG_WIN,
)

from conftest import SF_DIR


def _u64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_chunk_overlap_matches_replay(spark, sf_dir):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    expect = []
    for doc_id, text in docs:
        tk = re.findall(r"\S+", text.strip().lower())
        n = len(tk)
        for g in range(-(-n // _RAG_STRIDE)):  # ceil(n/stride)
            start = g * _RAG_STRIDE
            window = tk[start: start + _RAG_WIN]
            expect.append(
                (
                    doc_id,
                    g,
                    start,
                    len(window),
                    _u64(" ".join(window)),
                )
            )
    expect.sort()

    got = [
        (
            r["doc_id"],
            r["chunk_idx"],
            r["start_token"],
            r["chunk_len"],
            r["chunk_hash"],
        )
        for r in REGISTRY["doc_chunk_overlap"].fn(spark, sf_dir).collect()
    ]
    assert got == expect
    # neighbor windows overlap by WIN - STRIDE tokens on full windows
    assert _RAG_WIN > _RAG_STRIDE
    full = [e for e in expect if e[3] == _RAG_WIN]
    assert full, "corpus must produce at least one full window"
