"""Tests for the third IO wave (queries/io3.py)."""

from __future__ import annotations

import duckdb

from kafka_stream_aggregator_spark.queries import REGISTRY

from conftest import SF_DIR


def test_avro_roundtrip_is_identity(spark, sf_dir):
    out = REGISTRY["io_avro_roundtrip"].fn(spark, sf_dir)
    src = duckdb.connect().execute(
        f"""SELECT doc_id, text, lang, source, n_chars
            FROM read_parquet('{SF_DIR}/documents.parquet')
            ORDER BY doc_id"""
    ).fetchall()
    got = [tuple(r) for r in out.collect()]
    assert got == src


def test_csv_malformed_drops_exactly_corrupt_lines(spark, sf_dir):
    out = REGISTRY["io_csv_malformed"].fn(spark, sf_dir).collect()
    con = duckdb.connect()
    expect = con.execute(
        f"""SELECT lang, count(*) FROM
            read_parquet('{SF_DIR}/documents.parquet')
            WHERE doc_id % 7 <> 0 GROUP BY lang ORDER BY lang"""
    ).fetchall()
    assert [(r["lang"], r["n_rows"]) for r in out] == [
        (l, n) for l, n in expect
    ]
    total_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    # every 7th doc corrupted and dropped, nothing else
    assert sum(r["n_rows"] for r in out) == total_docs - (
        total_docs + 6
    ) // 7
