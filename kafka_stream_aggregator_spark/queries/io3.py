"""Third IO wave: the Avro wire-format round-trip as a first-class
registered query (lossless ⇒ exactly oracled by a plain SELECT), and
malformed-CSV ingestion semantics (DROPMALFORMED) hash-checked against
DuckDB's ignore_errors reader on the identical fixture file.

Reference parity: producer.rs:42-56 / consumer.rs:56-111 speak Avro on
the wire; io_avro_roundtrip proves the engine's pure-python codec
(streaming/avro_codec.py) is lossless for a full record schema over
real table data — the batch twin of the trade_pipeline_ewma_avro
streaming row.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .base import query, t

_AVRO_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
        {"name": "lang", "type": "string"},
        {"name": "source", "type": "string"},
        {"name": "n_chars", "type": "long"},
    ],
}


@query(
    "io_avro_roundtrip",
    # encode -> binary -> decode must be the identity; the oracle is
    # therefore the plain projection of the source table. Any codec
    # bug (zigzag, utf-8 length prefix, field order) breaks the hash.
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents ORDER BY doc_id
    """,
)
def io_avro_roundtrip(spark, sf_dir):
    """Avro binary round-trip over the documents table with the
    engine's pure-python spec codec (streaming/avro_codec.py — the
    same bytes the reference's Kafka wire carries, minus the
    5-byte Confluent frame): every row is encoded to Avro binary and
    decoded back inside one Arrow-batched mapInPandas pass, and the
    result must hash-equal the plain projection. Cites reference
    producer.rs:42-56 (Avro encode against the registered schema).
    Plan: map-only, no shuffle; the codec runs on Arrow batches, the
    sanctioned python hot path."""
    import pandas as pd

    from ..streaming.avro_codec import decode, encode

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )

    def rt(batches):
        for pdf in batches:
            out = []
            for rec in pdf.to_dict("records"):
                buf = encode(_AVRO_SCHEMA, rec)
                back, pos = decode(_AVRO_SCHEMA, buf)
                assert pos == len(buf)
                out.append(back)
            yield pd.DataFrame(out, columns=list(pdf.columns))

    return docs.mapInPandas(rt, schema=docs.schema).orderBy("doc_id")


@query(
    "io_csv_malformed",
    # DROPMALFORMED semantics, oracled by the SEMANTIC INVARIANT on
    # the source table (the io_compact pattern): exactly the every-7th
    # corrupted lines must be dropped, so the survivor aggregate
    # equals the doc_id % 7 <> 0 aggregate of the original documents.
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id
    FROM documents WHERE doc_id % 7 <> 0
    GROUP BY lang ORDER BY lang
    """,
)
def io_csv_malformed(spark, sf_dir):
    """Malformed-record CSV ingestion: schema-enforced read where
    corrupt lines (wrong type in a BIGINT column) are DROPPED, not
    nulled and not fatal — Spark's mode=DROPMALFORMED, the standard
    dirty-feed posture. The fixture is generated from the documents
    table WITHOUT any driver collect (a map-only line projection +
    write.text), every 7th line corrupted deterministically; both
    engines then read the identical file and aggregate the
    survivors. Plan: text write once per (sf_dir) fixture key, then
    one schema'd CSV scan + groupBy."""
    path = _fixture_path(sf_dir)
    if not os.path.exists(path):
        docs = t(spark, sf_dir, "documents").select(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat_ws(
                    ",",
                    F.col("doc_id"),
                    F.lit("not_a_number"),
                    F.col("lang"),
                ),
            )
            .otherwise(
                F.concat_ws(
                    ",", F.col("doc_id"), F.col("n_chars"), F.col("lang")
                )
            )
            .alias("value")
        )
        docs.coalesce(1).write.mode("overwrite").text(path + ".tmp")
        os.rename(path + ".tmp", path)
    df = (
        spark.read.schema("doc_id BIGINT, n_chars BIGINT, lang STRING")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").cast("bigint").alias("min_id"),
            F.max("doc_id").cast("bigint").alias("max_id"),
        )
        .orderBy("lang")
    )


def _fixture_path(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(
        tempfile.gettempdir(), f"ksa_csv_malformed_{tag}"
    )
