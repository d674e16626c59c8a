"""Confluent Schema Registry REST shim (client + embeddable server).

The reference talks to a real Schema Registry over HTTP: the producer
registers its value schema under the topic-name subject and embeds the
returned id in every frame (producer.rs:43-47, registry_handler.rs:50-58);
the consumer resolves ids back to writer schemas at decode time
(consumer.rs:76-85). This module closes that gap with ZERO dependencies:

* ``HttpSchemaRegistryClient`` — the standard REST endpoints
  (POST /subjects/{s}/versions, GET /schemas/ids/{id},
  GET /subjects, GET /subjects/{s}/versions[/{v}|/latest]) behind the
  SAME interface as the in-memory ``SchemaRegistry``, so
  ``decode_framed_records``/pipeline code takes either interchangeably.
  ``snapshot()`` walks subjects/versions into the plain ``{id: schema}``
  dict that ships to executors — the hot path never holds a connection.
* ``RegistryHttpServer`` — a stdlib http.server exposing an in-memory
  ``SchemaRegistry`` over those endpoints: the test double for the
  client, and a functioning single-process registry.

Wire format note: the REST payload carries the schema as a JSON-encoded
STRING under the "schema" key (Confluent convention), not as inline
JSON.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.request import Request, urlopen

from .registry import SchemaRegistry


class HttpSchemaRegistryClient:
    """Minimal Confluent REST client with the SchemaRegistry interface."""

    def __init__(self, base_url: str, timeout: float = 10.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    @staticmethod
    def subject_for_topic(topic: str) -> str:
        return f"{topic}-value"

    def _get(self, path: str) -> Any:
        with urlopen(self.base_url + path, timeout=self.timeout) as r:
            return json.loads(r.read())

    def _post(self, path: str, body: dict) -> Any:
        req = Request(
            self.base_url + path,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
            method="POST",
        )
        with urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def register(self, subject: str, schema: Any) -> int:
        out = self._post(
            f"/subjects/{subject}/versions", {"schema": json.dumps(schema)}
        )
        return int(out["id"])

    def by_id(self, schema_id: int) -> Any:
        return json.loads(self._get(f"/schemas/ids/{schema_id}")["schema"])

    def latest(self, subject: str) -> tuple[int, Any]:
        out = self._get(f"/subjects/{subject}/versions/latest")
        return int(out["id"]), json.loads(out["schema"])

    def versions(self, subject: str) -> list[int]:
        return [int(v) for v in self._get(f"/subjects/{subject}/versions")]

    def subjects(self) -> list[str]:
        return list(self._get("/subjects"))

    def snapshot(self) -> dict[int, Any]:
        """{id: schema} across all subjects/versions — the executor-side
        decode map; fetched once, no live registry in the hot path."""
        out: dict[int, Any] = {}
        for s in self.subjects():
            for v in self.versions(s):
                item = self._get(f"/subjects/{s}/versions/{v}")
                out[int(item["id"])] = json.loads(item["schema"])
        return out


class RegistryHttpServer:
    """stdlib HTTP server over an in-memory SchemaRegistry.

    Use as a context manager; ``base_url`` is ready after __enter__.
    Version numbers are 1-based positions in the subject's id list,
    matching Confluent.
    """

    def __init__(self, registry: SchemaRegistry | None = None, port: int = 0):
        self.registry = registry or SchemaRegistry()
        self._port = port
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def base_url(self) -> str:
        assert self._server is not None, "server not started"
        return f"http://127.0.0.1:{self._server.server_address[1]}"

    def __enter__(self) -> "RegistryHttpServer":
        reg = self.registry

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence test output
                pass

            def _send(self, code: int, payload: Any) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header(
                    "Content-Type", "application/vnd.schemaregistry.v1+json"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _err(self, code: int, msg: str) -> None:
                self._send(code, {"error_code": code * 100 + 1, "message": msg})

            def do_GET(self) -> None:
                if m := re.fullmatch(r"/schemas/ids/(\d+)", self.path):
                    sid = int(m.group(1))
                    try:
                        schema = reg.by_id(sid)
                    except KeyError:
                        return self._err(404, f"Schema {sid} not found")
                    return self._send(200, {"schema": json.dumps(schema)})
                if self.path == "/subjects":
                    return self._send(200, sorted(reg._subjects))
                if m := re.fullmatch(r"/subjects/([^/]+)/versions", self.path):
                    ids = reg.versions(m.group(1))
                    if not ids:
                        return self._err(404, "Subject not found")
                    return self._send(200, list(range(1, len(ids) + 1)))
                if m := re.fullmatch(
                    r"/subjects/([^/]+)/versions/(latest|\d+)", self.path
                ):
                    subject, ver = m.group(1), m.group(2)
                    ids = reg.versions(subject)
                    if not ids:
                        return self._err(404, "Subject not found")
                    idx = len(ids) if ver == "latest" else int(ver)
                    if not 1 <= idx <= len(ids):
                        return self._err(404, "Version not found")
                    sid = ids[idx - 1]
                    return self._send(
                        200,
                        {
                            "subject": subject,
                            "version": idx,
                            "id": sid,
                            "schema": json.dumps(reg.by_id(sid)),
                        },
                    )
                self._err(404, "Unknown path")

            def do_POST(self) -> None:
                m = re.fullmatch(r"/subjects/([^/]+)/versions", self.path)
                if not m:
                    return self._err(404, "Unknown path")
                length = int(self.headers.get("Content-Length", "0"))
                try:
                    body = json.loads(self.rfile.read(length))
                    schema = json.loads(body["schema"])
                except (json.JSONDecodeError, KeyError):
                    return self._err(422, "Invalid schema payload")
                sid = reg.register(m.group(1), schema)
                self._send(200, {"id": sid})

        self._server = ThreadingHTTPServer(("127.0.0.1", self._port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        assert self._server is not None
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)
