"""Stream sinks (R3/R4/R10/R11 parity).

The reference persists the raw topic to Postgres through Kafka Connect's
JdbcSinkConnector (config/raw-consumer-jdbc-sink/raw-pg.json: batches of
10, pk=timestamp, auto-create). Spark's shape for the same contract is
foreachBatch + batch.write.jdbc — upsert semantics live in the writer fn.
No JDBC server exists in this container, so the writer is pluggable and
tests exercise the machinery with a parquet writer; the jdbc writer is
the production path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def foreach_batch_jdbc_writer(
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """R11: per-micro-batch JDBC append (idempotent under checkpoint
    replay when the table has a PK and mode handles conflicts)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.jdbc(url, table, mode=mode, properties=properties or {})

    return write


def foreach_batch_parquet_writer(path: str) -> Callable[[DataFrame, int], None]:
    """Test/bench stand-in with the same foreachBatch contract."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    return write


def kafka_sink_writer(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """R4/R10: value as JSON (to_avro needs the spark-avro module; same
    wiring, different serializer expression)."""
    from pyspark.sql import functions as F

    return (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def start_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Debug/test sink: run a streaming DF to completion (availableNow)
    into an in-memory table; returns the query (caller awaits)."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


class ProgressListener:
    """R12 analogue: stream observability via StreamingQueryListener.

    The reference traces per-record spans through Kafka headers into
    Zipkin (registry_handler.rs:10-48); Spark's idiom is query-progress
    events — rows/sec, batch durations, watermark, state size — captured
    here into a list the caller can inspect or forward.
    """

    def __init__(self):
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                outer.started.append(event.id)

            def onQueryProgress(self, event):
                p = event.progress
                outer.progress.append(
                    {
                        "batchId": p.batchId,
                        "numInputRows": p.numInputRows,
                        "durationMs": dict(p.durationMs),
                    }
                )

            def onQueryTerminated(self, event):
                outer.terminated.append(event.id)

        self.started: list = []
        self.progress: list = []
        self.terminated: list = []
        self._listener = _L()

    def attach(self, spark) -> "ProgressListener":
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark) -> None:
        spark.streams.removeListener(self._listener)
