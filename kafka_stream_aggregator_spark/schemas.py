"""Canonical schemas.

TRADE_SCHEMA mirrors the reference's Avro record ``TradesDataAvro``
(reference services/kstream-agg-rs/src/models.rs:31-44): doubles stay
doubles (IEEE, not decimal — parity requirement), ``timestamp`` is
epoch-millis i64 on the wire with a derived ``event_time`` TimestampType
column, enums become constrained strings (models.rs:7-23).

EWMA_SCHEMA mirrors the aggregate record (bin/agg-producer/indicators.rs:6-11).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Domain of models.rs:15-23 Direction enum (serde lowercase).
DIRECTIONS = ("buy", "sell", "zero")
# Domain of models.rs:7-12 LiquidationType (serde renames M/T/MT).
LIQUIDATIONS = ("M", "T", "MT")

TRADE_SCHEMA = T.StructType(
    [
        T.StructField("amount", T.DoubleType(), False),
        T.StructField("direction", T.StringType(), False),
        T.StructField("index_price", T.DoubleType(), False),
        T.StructField("instrument_name", T.StringType(), False),
        T.StructField("iv", T.DoubleType(), True),
        T.StructField("liquidation", T.StringType(), True),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("tick_direction", T.LongType(), False),
        T.StructField("timestamp", T.LongType(), False),  # epoch ms
        T.StructField("trade_id", T.StringType(), False),
        T.StructField("trade_seq", T.LongType(), False),
    ]
)

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("period", T.LongType(), False),
        T.StructField("alpha", T.DoubleType(), False),
        T.StructField("current", T.DoubleType(), False),
    ]
)

# Driver-generated synthetic tables (TESTDATA.md). Declared, not inferred,
# so scans prune columns and never pay schema inference.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
