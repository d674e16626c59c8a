"""The reference aggregation pipeline as Structured Streaming (R7-R10).

Reference behavior (bin/agg-producer/main.rs:100-131): a wall-clock
timer fires every `period` minutes; the buffered prices are folded
through the zero-seeded EWMA; results with ewma<=0 are suppressed;
output keyed by emit time. Canonical mode here upgrades to event-time
tumbling windows + watermark (late data handled, deterministic fold
order via (ts, tiebreak) sort — SURVEY S3/S5/S7); compat mode
reproduces the literal processing-time behavior with a
Trigger(processingTime=...) + foreachBatch fold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..indicators import ewma_alpha, ewma_fold, ordered_values


def streaming_windowed_ewma(
    stream: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: Sequence[str] = ("ts", "event_id"),
    group_cols: Sequence[str] = (),
    period_minutes: int = 5,
    watermark: str = "10 minutes",
    emit_positive_only: bool = True,
) -> DataFrame:
    """Event-time tumbling EWMA on a streaming DataFrame.

    groupBy(window(...)) + the same pure-Catalyst fold as batch — state
    store keeps one partial collect_list per open window; the watermark
    bounds state (windows older than it are finalized and evicted), so
    state size is O(open windows x rows-in-window), not O(stream).
    Append output mode -> each window emits exactly once, on close.
    """
    alpha = ewma_alpha(period_minutes)
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), f"{period_minutes} minutes").alias("win"),
            *group_cols,
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            ewma_fold(ordered_values(value_col, list(order_cols)), alpha).alias(
                "ewma"
            ),
        )
        .select(
            *group_cols,
            F.unix_timestamp("win.start").alias("window_start"),
            F.unix_timestamp("win.end").alias("window_end"),
            "n_rows",
            "ewma",
        )
    )
    if emit_positive_only:
        out = out.filter(F.col("ewma") > 0.0)  # R9, main.rs:118
    return out


def streaming_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state (watermarked)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(
        [*keys, ts_col]
    )


def streaming_dedup_within_watermark(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Dedup on the BUSINESS key only, state bounded by the watermark
    (dropDuplicatesWithinWatermark, Spark 3.5+).

    Difference from streaming_dedup: the event timestamp is NOT part of
    the key, so re-deliveries with a *different* timestamp (producer
    retries after a reconnect — the reference's at-least-once failure
    mode, SURVEY S6) still collapse, as long as they arrive within the
    watermark delay of the first copy. State per key expires at the
    watermark — the variant to run against at-least-once sources at
    100 TB."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def sliding_window_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
    group_cols: Sequence[str] = (),
) -> DataFrame:
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide).alias("win"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.avg(value_col).alias("avg_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            *group_cols,
            F.unix_timestamp("win.start").alias("window_start"),
            "n_rows",
            "avg_value",
            "max_value",
        )
    )


def session_window_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    group_cols: Sequence[str] = ("user_id",),
) -> DataFrame:
    """Native session windows (gap-based), streaming or batch."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *group_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *group_cols,
            F.unix_timestamp("win.start").alias("session_start"),
            F.unix_timestamp("win.end").alias("session_end"),
            "n_events",
        )
    )


def processing_time_ewma_query(
    stream: DataFrame,
    sink_fn,
    value_col: str = "value",
    period_minutes: int = 5,
    checkpoint: str | None = None,
):
    """S3 compat mode: literal reference semantics — a processing-time
    trigger fires every period; each micro-batch's buffered rows are
    folded in arrival order and the result (if > 0) handed to sink_fn
    as (ewma_row_df, batch_id). This is Trigger(processingTime) +
    foreachBatch, the direct analogue of the tokio interval + mutex
    buffer (main.rs:83-131)."""
    alpha = ewma_alpha(period_minutes)

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.agg(
            ewma_fold(
                F.collect_list(F.col(value_col)), alpha
            ).alias("current"),
            F.count(F.lit(1)).alias("n_rows"),
        ).select(
            F.lit(period_minutes).alias("period"),
            F.lit(alpha).alias("alpha"),
            "current",
            "n_rows",
        )
        out = agg.filter(F.col("current") > 0.0)
        sink_fn(out, batch_id)

    w = stream.writeStream.foreachBatch(fold_batch).trigger(
        processingTime=f"{period_minutes * 60} seconds"
    )
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w


def stream_static_join(
    stream: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Stream ⋈ static dimension. The static side is broadcast per
    micro-batch (re-resolved each trigger, so slowly-changing dims pick
    up updates without restarting the query)."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    watermark: str = "10 minutes",
    max_lag_seconds: int = 3600,
) -> DataFrame:
    """Watermarked stream-stream inner join with a time-bound condition.

    Both sides carry watermarks and the join condition bounds the event-
    time distance, so each side's state store holds only `watermark +
    max_lag` worth of rows — bounded state, the requirement for an
    unbounded stream pair at scale."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag_seconds} SECONDS"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return lw.join(rw, cond, "inner")


def stream_stream_outer_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    watermark: str = "10 minutes",
    max_lag_seconds: int = 3600,
) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join: identical bounded
    state to the inner form, but a left row whose time-bounded match
    window expires under the watermark is emitted once with NULLs on
    the right — the semantics a late-arrival audit needs (which
    purchases never saw a qualifying click?). Spark emits the null
    rows only when the watermark closes the state, so results are
    exact for the finalized region under availableNow."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {max_lag_seconds} SECONDS"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return lw.join(rw, cond, "left_outer")


def streaming_windowed_ewma_two_level(
    stream: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: Sequence[str] = ("ts", "event_id"),
    group_cols: Sequence[str] = (),
    period_minutes: int = 5,
    sub_window: str = "30 seconds",
    watermark: str = "10 minutes",
    emit_positive_only: bool = True,
) -> DataFrame:
    """Streaming EWMA via chained stateful aggregations (Spark >=3.5
    multiple-stateful-operator support): fold per sub-window first
    (bounded state per key), then re-window with window_time() and
    combine partials with the segment-composition rule
    S(c1++c2) = S(c2) + lam^n2 * S(c1). The streaming twin of
    indicators.windowed_ewma_two_level — per-reducer state never holds a
    whole 5-minute window's rows, only its sub-window partials."""
    alpha = ewma_alpha(period_minutes)
    lam = 1.0 - alpha
    partials = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), sub_window).alias("subwin"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            ewma_fold(ordered_values(value_col, list(order_cols)), alpha).alias(
                "__s"
            ),
        )
    )
    segs = F.array_sort(
        F.collect_list(
            F.struct(F.col("substart"), F.col("__n"), F.col("__s"))
        )
    )
    combined = F.aggregate(
        segs,
        F.named_struct(F.lit("s"), F.lit(0.0), F.lit("n"), F.lit(0).cast("long")),
        lambda acc, x: F.named_struct(
            F.lit("s"),
            x["__s"] + F.pow(F.lit(lam), x["__n"]) * acc["s"],
            F.lit("n"),
            acc["n"] + x["__n"],
        ),
    )
    out = (
        partials.withColumn("substart", F.col("subwin.start"))
        .groupBy(
            F.window(F.window_time("subwin"), f"{period_minutes} minutes").alias(
                "win"
            ),
            *group_cols,
        )
        .agg(combined.alias("__c"))
        .select(
            *group_cols,
            F.unix_timestamp("win.start").alias("window_start"),
            F.unix_timestamp("win.end").alias("window_end"),
            F.col("__c.n").alias("n_rows"),
            F.col("__c.s").alias("ewma"),
        )
    )
    if emit_positive_only:
        out = out.filter(F.col("ewma") > 0.0)
    return out
