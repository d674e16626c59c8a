"""Continuously-maintained rollup tables (hypertable-rollup style).

A streaming aggregation in update mode hands each micro-batch's changed
windows to foreachBatch, which overwrites exactly the affected
date-partitions of a parquet rollup table (dynamic partition overwrite).
Re-delivery of a batch rewrites the same partitions with the same data —
idempotent, so checkpoint replay is safe (effectively-once).

The result is a queryable materialized aggregate that stays current as
the stream runs: the batch-side analogue of the reference's
Kafka->Postgres sink (R11), upgraded from row appends to maintained
aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_rollup(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "ts",
    group_cols: Sequence[str] = ("event_type",),
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    value_col: str = "value",
):
    """Start the maintenance query (update mode). Partition layout:
    day=YYYY-MM-DD so an incoming window only rewrites its own day."""
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            *group_cols,
            F.unix_timestamp("win.start").alias("window_start"),
            F.date_format("win.start", "yyyy-MM-dd").alias("day"),
            "n_rows",
            "sum_value",
            "min_value",
            "max_value",
        )
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # No driver round-trip: the touched-day set stays distributed as
        # a broadcast semi-join key (dynamic partition overwrite only
        # rewrites day partitions that receive rows, and the broadcast
        # join lets Spark runtime-prune the untouched day partitions of
        # the existing table scan). Write happens only after `updated`
        # is materialized via localCheckpoint — the lineage to the files
        # being overwritten is cut BEFORE the overwrite starts, so this
        # never reads and replaces the same path in one action.
        # Caveat (documented, single-writer design): the per-partition
        # commit itself is not atomic; a crash mid-commit can leave a
        # touched day partially rewritten until the checkpoint replays
        # the batch (same data, idempotent) on restart.
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            batch_days = F.broadcast(batch_df.select("day").distinct())
            try:
                current = spark.read.parquet(path).join(
                    batch_days, "day", "left_semi"
                )
            except Exception:  # first batch: table does not exist yet
                current = None
            updated = batch_df
            if current is not None:
                # windows not touched by this batch keep their rows
                untouched = current.join(
                    batch_df.select(*group_cols, "window_start"),
                    [*group_cols, "window_start"],
                    "left_anti",
                )
                updated = untouched.unionByName(batch_df)
            updated = updated.localCheckpoint(eager=True)
            if updated.isEmpty():
                return
            updated.write.mode("overwrite").partitionBy("day").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        agg.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
