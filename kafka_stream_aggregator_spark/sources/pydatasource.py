"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic trade-tick generator.

Why this exists: the reference ingests an external feed it does not
control (WebSocket -> Kafka, consumer.rs:56-111); the engine-side
analogue of "a source Spark doesn't ship" is the Python DataSource
API — this module exercises that full surface (DataSource ->
DataSourceReader -> partitions() -> read(partition)) with a source
whose rows are a pure function of (seed, row index), so the custom
connector itself is exactly DuckDB-oracle-checkable: every field
derives from the md5-based portable 60-bit hash both engines can
rebuild.

Row schema mirrors the reference's TradesDataAvro essentials
(models.rs:31-44): instrument, direction, price, amount, seq, ts_ms.

Scale design: partitions() returns `n_parts` index ranges — Spark
schedules one task per range, so the generator parallelizes exactly
like a real partitioned source; no driver-side row materialization.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _h(s: str) -> int:
    """Portable 60-bit hash — same construction as sketches.portable_u64
    (md5 hex prefix), reproducible in DuckDB SQL."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


_INSTRUMENTS = ["BTC-OPT-A", "BTC-OPT-B", "ETH-OPT-A", "ETH-OPT-B"]
_DIRECTIONS = ["buy", "sell", "zero"]


def gen_row(seed: int, i: int):
    """The pure row function: everything derives from h(seed:i:field)."""
    hp = _h(f"{seed}:{i}:p")
    ha = _h(f"{seed}:{i}:a")
    hi = _h(f"{seed}:{i}:i")
    hd = _h(f"{seed}:{i}:d")
    return (
        i,
        _INSTRUMENTS[hi % 4],
        _DIRECTIONS[hd % 3],
        round(100.0 + (hp % 1_000_000) / 100.0, 6),
        round(1.0 + (ha % 1000) / 10.0, 6),
        1_700_000_000_000 + i * 250,
    )


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int
    seed: int


class TradeGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 4))
        self.seed = int(options.get("seed", 7))

    def partitions(self):
        per = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        return [
            _RangePartition(lo, min(lo + per, self.n_rows), self.seed)
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield gen_row(partition.seed, i)


class TradeGenStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched stream over the same deterministic generator:
    offsets are row indices; each trigger serves `batch_rows`; once
    `n_rows` are served the reader reports no new data (same offset),
    so availableNow triggers drain exactly the batch row set."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.batch_rows = int(options.get("batch_rows", 500))
        self.seed = int(options.get("seed", 7))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        lo = start["i"]
        hi = min(lo + self.batch_rows, self.n_rows)
        # iter(list), precisely: the runner's prefetch cache consumes
        # the result with next() (a bare list fails), but a generator
        # fails the planner's pickling — the materialized-list
        # iterator satisfies both.
        return iter([gen_row(self.seed, i) for i in range(lo, hi)]), {
            "i": hi
        }

    def readBetweenOffsets(self, start, end):
        return iter(
            [gen_row(self.seed, i) for i in range(start["i"], end["i"])]
        )


class TradeGenDataSource(DataSource):
    """spark.read.format("tradegen").option("n_rows", N).load() — and
    spark.readStream.format("tradegen")... for the micro-batched
    stream over the same rows."""

    @classmethod
    def name(cls) -> str:
        return "tradegen"

    def schema(self) -> str:
        return (
            "trade_seq long, instrument string, direction string,"
            " price double, amount double, ts_ms long"
        )

    def reader(self, schema) -> TradeGenReader:
        return TradeGenReader(self.options)

    def simpleStreamReader(self, schema) -> TradeGenStreamReader:
        return TradeGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(TradeGenDataSource)
