"""Schema Registry dispatch + Avro schema evolution (reference parity).

The reference decodes by the schema id embedded in each message
(consumer.rs:76-85) with registry-resolved writer schemas
(registry_handler.rs:50-58) and claims backward-compatible evolution
(readme.md:27-28). These tests prove the engine's equivalents:
id-dispatch over a mixed-version topic, backward/forward resolution
with an added nullable field, malformed-record drop semantics, and the
union encoder's branch matching.
"""

from __future__ import annotations

import copy

import pytest

from kafka_stream_aggregator_spark.streaming.avro_codec import (
    TRADES_AVRO_SCHEMA,
    decode,
    encode,
)
from kafka_stream_aggregator_spark.streaming.registry import (
    SchemaRegistry,
    decode_framed_records,
    parse_frame,
    project_record,
)

TRADE_V1 = TRADES_AVRO_SCHEMA

# v2 = v1 + nullable 'venue' with default — the canonical
# backward-compatible evolution (readme.md:27-28).
TRADE_V2 = copy.deepcopy(TRADES_AVRO_SCHEMA)
TRADE_V2["fields"] = TRADE_V2["fields"] + [
    {"name": "venue", "type": ["null", "string"], "default": None}
]


def _trade(seq: int, **over):
    base = {
        "amount": 1.5,
        "direction": "buy",
        "index_price": 100.0,
        "instrument_name": "BTC-INSTR-0",
        "iv": None,
        "liquidation": None,
        "price": 42.5 + seq,
        "tick_direction": 1,
        "timestamp": 1_704_067_200_000 + seq,
        "trade_id": f"t-{seq}",
        "trade_seq": seq,
    }
    base.update(over)
    return base


def _frame(sid: int, schema, record) -> bytes:
    return b"\x00" + sid.to_bytes(4, "big") + encode(schema, record)


def test_registry_register_dedup_and_versions():
    reg = SchemaRegistry()
    subject = SchemaRegistry.subject_for_topic("trades-option-btc")
    assert subject == "trades-option-btc-value"
    id1 = reg.register(subject, TRADE_V1)
    id2 = reg.register(subject, TRADE_V2)
    assert id2 > id1
    # re-registering an identical schema returns the existing id
    assert reg.register(subject, TRADE_V1) == id1
    assert reg.versions(subject) == [id1, id2]
    assert reg.latest(subject)[0] == id2
    assert reg.by_id(id1) == TRADE_V1


def test_mixed_schema_id_topic_decodes_per_record():
    """A topic interleaving v1 and v2 frames (rolling producer upgrade):
    every record decodes against ITS writer schema, projected to the v2
    reader — v1 records surface venue=None via the default."""
    reg = SchemaRegistry()
    subject = SchemaRegistry.subject_for_topic("trades-option-btc")
    id1 = reg.register(subject, TRADE_V1)
    id2 = reg.register(subject, TRADE_V2)
    frames = []
    for seq in range(10):
        if seq % 2:
            rec = _trade(seq)
            rec["venue"] = "deribit"
            frames.append(_frame(id2, TRADE_V2, rec))
        else:
            frames.append(_frame(id1, TRADE_V1, _trade(seq)))
    out = decode_framed_records(frames, reg.snapshot(), TRADE_V2)
    assert all(r is not None for r in out)
    for seq, rec in enumerate(out):
        assert rec["trade_seq"] == seq
        assert rec["price"] == 42.5 + seq
        assert rec["venue"] == ("deribit" if seq % 2 else None)


def test_forward_resolution_drops_unknown_writer_field():
    """Old reader (v1) consuming v2 frames: the extra field is skipped."""
    reg = SchemaRegistry()
    id2 = reg.register("s-value", TRADE_V2)
    rec = _trade(3)
    rec["venue"] = "deribit"
    out = decode_framed_records([_frame(id2, TRADE_V2, rec)], reg.snapshot(), TRADE_V1)
    assert out[0] is not None
    assert "venue" not in out[0]
    assert out[0]["trade_id"] == "t-3"


def test_reader_field_without_default_rejected():
    v3 = copy.deepcopy(TRADE_V1)
    v3["fields"] = v3["fields"] + [{"name": "mandatory", "type": "string"}]
    with pytest.raises(ValueError, match="not backward compatible"):
        project_record(_trade(0), TRADE_V1, v3)


def test_numeric_promotion_int_writer_double_reader():
    w = {"type": "record", "name": "R", "fields": [{"name": "x", "type": "int"}]}
    r = {"type": "record", "name": "R", "fields": [{"name": "x", "type": "double"}]}
    rec, _ = decode(w, encode(w, {"x": 7}))
    out = project_record(rec, w, r)
    assert out["x"] == 7.0 and isinstance(out["x"], float)


def test_malformed_and_unknown_id_records_drop_not_raise():
    """Reference behavior: decode failures drop the record and move on
    (consumer.rs:106-108 commits even on decode error)."""
    reg = SchemaRegistry()
    id1 = reg.register("s-value", TRADE_V1)
    good = _frame(id1, TRADE_V1, _trade(0))
    unknown_id = _frame(999, TRADE_V1, _trade(1))
    not_framed = b"\x17garbage"
    out = decode_framed_records(
        [good, unknown_id, not_framed], reg.snapshot(), TRADE_V1
    )
    assert out[0] is not None and out[1] is None and out[2] is None
    with pytest.raises(Exception):
        decode_framed_records([not_framed], reg.snapshot(), TRADE_V1, on_error="raise")


def test_parse_frame_roundtrip():
    sid, body = parse_frame(b"\x00" + (7).to_bytes(4, "big") + b"abc")
    assert sid == 7 and body == b"abc"


def test_union_encode_picks_matching_branch():
    """ADVICE fix: multi-branch unions must dispatch on the VALUE's
    type, not blindly take the first non-null branch."""
    u = ["null", "string", "long"]
    assert decode(u, encode(u, None))[0] is None
    assert decode(u, encode(u, "abc"))[0] == "abc"
    assert decode(u, encode(u, 42))[0] == 42
    u2 = ["null", "long", "string"]
    assert decode(u2, encode(u2, "abc"))[0] == "abc"
    assert decode(u2, encode(u2, 42))[0] == 42


def test_spark_dispatch_chain_mixed_versions(spark):
    """End-to-end on Spark: frame synthetic trades under BOTH schema
    versions (even seq -> v1, odd -> v2), decode via the dispatching
    mapInPandas consumer, aggregate — equals the plain single-schema
    chain on the same trades."""
    import pandas as pd
    from pyspark.sql import functions as F

    from kafka_stream_aggregator_spark.schemas import TRADE_SCHEMA
    from kafka_stream_aggregator_spark.streaming.trade_pipeline import (
        aggregate_trades,
        decode_trades_avro_dispatch,
        synthetic_trades,
    )

    reg = SchemaRegistry()
    subject = SchemaRegistry.subject_for_topic("trades-option-btc")
    id1 = reg.register(subject, TRADE_V1)
    id2 = reg.register(subject, TRADE_V2)

    trades = synthetic_trades(spark, n=2000)
    cols = [f.name for f in TRADE_SCHEMA.fields]

    v1, v2 = TRADE_V1, TRADE_V2  # locals -> serialized by value into the closure

    def enc(batches):
        # self-contained: executors can't import the test module
        from kafka_stream_aggregator_spark.streaming.avro_codec import (
            encode as _enc,
        )

        for pdf in batches:
            values = []
            for row in pdf[cols].itertuples(index=False, name=None):
                rec = dict(zip(cols, row))
                if rec["trade_seq"] % 2:
                    rec["venue"] = "deribit"
                    values.append(
                        b"\x00" + id2.to_bytes(4, "big") + _enc(v2, rec)
                    )
                else:
                    values.append(
                        b"\x00" + id1.to_bytes(4, "big") + _enc(v1, rec)
                    )
            yield pd.DataFrame(
                {"key": pdf["timestamp"].astype(str), "value": values}
            )

    framed = trades.mapInPandas(enc, "key string, value binary")
    decoded = decode_trades_avro_dispatch(
        framed, reg.snapshot(), TRADE_V1, TRADE_SCHEMA
    )
    via_dispatch = {
        tuple(r) for r in aggregate_trades(decoded).collect()
    }
    via_plain = {tuple(r) for r in aggregate_trades(trades).collect()}
    assert via_dispatch == via_plain and len(via_dispatch) > 0


def test_forbidden_demotion_raises():
    """Avro 1.11 resolution forbids long->int and double->float: the
    incompatibility must surface, not silently pass the value through."""
    for wt, rt in (("long", "int"), ("double", "float"), ("string", "int")):
        w = {"type": "record", "name": "R", "fields": [{"name": "x", "type": wt}]}
        r = {"type": "record", "name": "R", "fields": [{"name": "x", "type": rt}]}
        val = "7" if wt == "string" else 7
        with pytest.raises(ValueError, match="not promotable"):
            project_record({"x": val}, w, r)


def test_writer_null_into_non_nullable_reader_raises():
    w = {
        "type": "record", "name": "R",
        "fields": [{"name": "x", "type": ["null", "double"], "default": None}],
    }
    r = {"type": "record", "name": "R", "fields": [{"name": "x", "type": "double"}]}
    with pytest.raises(ValueError, match="does not admit null"):
        project_record({"x": None}, w, r)
