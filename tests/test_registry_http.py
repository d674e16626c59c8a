"""Schema Registry REST shim: client <-> stdlib server round-trips,
and drop-in equivalence with the in-memory registry for the decode
chain (reference parity: producer.rs:43-47 registration,
registry_handler.rs:50-58 subject strategy, consumer.rs:76-85 id
dispatch)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from kafka_stream_aggregator_spark.streaming.avro_codec import encode
from kafka_stream_aggregator_spark.streaming.registry import (
    SchemaRegistry,
    decode_framed_records,
)


def make_frame(sid: int, body: bytes) -> bytes:
    return b"\x00" + sid.to_bytes(4, "big") + body
from kafka_stream_aggregator_spark.streaming.registry_http import (
    HttpSchemaRegistryClient,
    RegistryHttpServer,
)

V1 = {
    "type": "record",
    "name": "Trade",
    "fields": [
        {"name": "trade_id", "type": "string"},
        {"name": "price", "type": "double"},
    ],
}
V2 = {
    "type": "record",
    "name": "Trade",
    "fields": [
        {"name": "trade_id", "type": "string"},
        {"name": "price", "type": "double"},
        {"name": "venue", "type": "string", "default": "deribit"},
    ],
}


def test_http_register_resolve_roundtrip():
    with RegistryHttpServer() as srv:
        cli = HttpSchemaRegistryClient(srv.base_url)
        subject = cli.subject_for_topic("trades-option-btc")
        id1 = cli.register(subject, V1)
        id2 = cli.register(subject, V2)
        assert id1 != id2
        # re-registering an identical schema returns the existing id
        assert cli.register(subject, V1) == id1
        assert cli.by_id(id1) == V1
        assert cli.versions(subject) == [1, 2]
        lid, lschema = cli.latest(subject)
        assert lid == id2 and lschema == V2
        assert cli.subjects() == [subject]


def test_http_snapshot_feeds_decode_chain():
    """A snapshot fetched over HTTP decodes mixed-version frames exactly
    like the in-memory registry's snapshot."""
    reg = SchemaRegistry()
    with RegistryHttpServer(reg) as srv:
        cli = HttpSchemaRegistryClient(srv.base_url)
        subject = cli.subject_for_topic("t")
        id1 = cli.register(subject, V1)
        id2 = cli.register(subject, V2)
        frames = [
            make_frame(id1, encode(V1, {"trade_id": "a", "price": 1.5})),
            make_frame(
                id2, encode(V2, {"trade_id": "b", "price": 2.5, "venue": "x"})
            ),
        ]
        out = decode_framed_records(frames, cli.snapshot(), V2)
    assert out[0] == {"trade_id": "a", "price": 1.5, "venue": "deribit"}
    assert out[1] == {"trade_id": "b", "price": 2.5, "venue": "x"}
    assert cli.snapshot.__doc__  # snapshot is a one-shot fetch


def test_http_errors():
    with RegistryHttpServer() as srv:
        cli = HttpSchemaRegistryClient(srv.base_url)
        with pytest.raises(urllib.error.HTTPError):
            cli.by_id(999)
        with pytest.raises(urllib.error.HTTPError):
            cli.versions("nope")
        # malformed schema payload -> 422
        req = urllib.request.Request(
            srv.base_url + "/subjects/s/versions",
            data=json.dumps({"schema": "{not json"}).encode(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req)
