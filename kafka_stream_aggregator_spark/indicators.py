"""Indicator fold expressions — the reference's one aggregate, generalized.

Reference parity (SURVEY.md S1-S5):
  * alpha = 2 / (period_minutes*60 + 1)    (indicators.rs:17, main.rs:111)
  * zero-seeded, per-window fold: current = alpha*x + (1-alpha)*current,
    starting from 0.0, state never crosses windows (indicators.rs:19-26,
    main.rs:113-116)
  * windows whose EWMA <= 0 emit nothing (main.rs:118)
  * fold order: reference uses Kafka arrival order (nondeterministic);
    we define it over ascending (order_cols) — documented divergence S5.

Everything here is a pure Catalyst expression (higher-order functions) —
no UDFs, so the fold stays inside whole-stage codegen and the groupBy is
a normal partial+final shuffle aggregate that scales to 100 TB: state per
group is one array of projected values, built map-side via collect_list.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ewma_alpha(period_minutes: int) -> float:
    """alpha = 2/(n+1) with n = period_minutes*60 (indicators.rs:17)."""
    return 2.0 / (period_minutes * 60 + 1)


def ewma_fold(values: Column, alpha: float, seed: float = 0.0) -> Column:
    """Fold an array<double> in element order: a*x + (1-a)*acc, seed 0.0."""
    a = float(alpha)
    return F.aggregate(
        values,
        F.lit(float(seed)),
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc,
    )


def ordered_values(
    value: Column | str, order_cols: Sequence[Column | str]
) -> Column:
    """Aggregate expression: values of `value` sorted by `order_cols`.

    collect_list(struct(order..., value)) -> array_sort -> project value.
    array_sort on structs orders lexicographically by field position, which
    is exactly the (timestamp, seq) ordering S5 requires. Deterministic
    regardless of partitioning — safe under shuffles.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    v = F.col(value) if isinstance(value, str) else value
    fields = [c.alias(f"o{i}") for i, c in enumerate(cols)] + [v.alias("v")]
    return F.transform(
        F.array_sort(F.collect_list(F.struct(*fields))), lambda s: s["v"]
    )


def sma_fold(values: Column) -> Column:
    """Simple moving average of an array<double> (companion indicator)."""
    n = F.size(values)
    return F.when(n > 0, F.aggregate(values, F.lit(0.0), lambda a, x: a + x) / n)


def windowed_ewma(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: Sequence[str] = ("ts", "event_id"),
    group_cols: Sequence[str] = (),
    period_minutes: int = 5,
    emit_positive_only: bool = True,
) -> DataFrame:
    """The reference pipeline's aggregation, batch/event-time form (R7+R8+R9).

    Tumbling `period_minutes` windows on event time; per window (and
    optional extra group columns) the zero-seeded EWMA fold in
    (order_cols) order; windows with ewma<=0 suppressed (S4).

    Output: group_cols..., window_start/window_end (epoch seconds, BIGINT —
    cross-engine-stable), n_rows, ewma.
    """
    alpha = ewma_alpha(period_minutes)
    secs = period_minutes * 60
    wstart = (F.floor(F.unix_timestamp(F.col(ts_col)) / secs) * secs).cast("long")
    out = (
        df.withColumn("window_start", wstart)
        .groupBy(*group_cols, "window_start")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            ewma_fold(ordered_values(value_col, list(order_cols)), alpha).alias(
                "ewma"
            ),
        )
        .withColumn("window_end", (F.col("window_start") + secs).cast("long"))
    )
    if emit_positive_only:
        out = out.filter(F.col("ewma") > 0.0)
    return out


def windowed_ewma_closed_form(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: Sequence[str] = ("ts", "event_id"),
    group_cols: Sequence[str] = (),
    period_minutes: int = 5,
    emit_positive_only: bool = True,
) -> DataFrame:
    """windowed_ewma as a rank-indexed SUM instead of an array fold.

    The zero-seeded fold expands to
        ewma = sum_i alpha * (1-alpha)^(n-i) * x_i      (i = 1..n in order)
    so ranking each row inside its (group, window) partition turns the
    whole aggregate into window-rank + one codegen'd sum — no
    collect_list arrays, no interpreted higher-order fold. Same single
    shuffle (the rank window and the groupBy share the partitioning, so
    Catalyst plans ONE Exchange). (1-alpha)^(n-i) stays in [0,1] — no
    overflow at any n, unlike the cumulative closed form's lam^-i.

    Numerically this matches the fold to well past 6 decimals (the
    DuckDB oracle for ewma_5min IS this closed form and hash-matches the
    fold), but it is not bit-identical; windowed_ewma remains the
    reference-semantics canonical. Use this variant for batch throughput
    on wide windows.

    Round-12 optimization (guide §2.4 — remove passes sharing one
    exchange): the exponent n - rn (rows AFTER this one in window
    order) is exactly rev_rn - 1 where rev_rn ranks the REVERSED total
    order, so one row_number over the descending order replaces the
    count(*) window + ascending row_number pair — one Sort + one
    Window node instead of two of each, same single Exchange.

    REQUIREMENT (ADVICE r12): ``order_cols`` MUST form a unique total
    order within each (group, window) partition — the reverse-rank
    identity n - rn = rev_rn - 1 is the ONLY implementation now, and it
    is well-defined only when the descending rank is the exact mirror
    of the ascending one. With ties, row_number breaks them
    nondeterministically in BOTH directions and the exponent assignment
    (hence the float sum) becomes run-dependent — same nondeterminism
    the old two-window form had, but callers should not rely on it.
    The default (ts, event_id) tiebreak is unique; the per-row term is
    then bit-identical to the old form. Plan diff pinned in
    plans/r12/ewma_5min_{before,after}.txt; parity re-verified at
    sf0.001/sf0.01/sf1.
    """
    alpha = ewma_alpha(period_minutes)
    lam = 1.0 - alpha
    secs = period_minutes * 60
    from pyspark.sql import Window as W

    wstart = (F.floor(F.unix_timestamp(F.col(ts_col)) / secs) * secs).cast("long")
    base = df.withColumn("window_start", wstart)
    part = W.partitionBy(*group_cols, "window_start")
    rev_rn = F.row_number().over(
        part.orderBy(*[F.col(c).desc() for c in order_cols])
    )
    term = (
        F.lit(alpha)
        * F.pow(F.lit(lam), (rev_rn - 1).cast("double"))
        * F.col(value_col)
    )
    out = (
        base.withColumn("__term", term)
        .groupBy(*group_cols, "window_start")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("__term").alias("ewma"))
        .withColumn("window_end", (F.col("window_start") + secs).cast("long"))
        .select(*group_cols, "window_start", "n_rows", "ewma", "window_end")
    )
    if emit_positive_only:
        out = out.filter(F.col("ewma") > 0.0)
    return out


def cumulative_ewma_col(
    value_col: str,
    alpha: float,
    partition_by: Sequence[str],
    order_by: Sequence[str],
) -> Column:
    """Continuous (cross-row) zero-seeded EWMA as a pure window expression.

    Closed form S_i = alpha * lam^i * sum_j(x_j * lam^-j) over a running
    window — one shuffle, JVM-side, no python. lam^-i overflows past
    ~100k rows per key (lam = 1 - 2/301), so this is the fast path for
    bounded key cardinality; for unbounded keys use the grouped-map fold
    (queries/windows.py win_cumulative_ewma docstring) or the streaming
    stateful op (streaming/stateful.py), both O(1) memory per row.
    """
    from pyspark.sql import Window as W

    a = float(alpha)
    lam = 1.0 - a
    w_rank = W.partitionBy(*partition_by).orderBy(*order_by)
    w_run = w_rank.rowsBetween(W.unboundedPreceding, W.currentRow)
    rn = F.row_number().over(w_rank).cast("double")
    scaled = F.col(value_col) * F.pow(F.lit(lam), -rn)
    return F.lit(a) * F.pow(F.lit(lam), rn) * F.sum(scaled).over(w_run)


def windowed_ewma_two_level(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    group_cols: Sequence[str] = (),
    period_minutes: int = 5,
    emit_positive_only: bool = True,
    sub_bucket_seconds: int = 1,
) -> DataFrame:
    """windowed_ewma for windows too large to collect on one reducer.

    The zero-seeded EWMA fold composes over ordered segments:
        S(c1 ++ c2) = S(c2) + lam^n2 * S(c1)
    so we fold per (group, window, sub-second-bucket) first — bounded
    arrays, map-side partials — then combine the per-bucket partials
    (n, S) in bucket order with the composition rule. Two shuffles,
    O(rows-per-sub-bucket) peak memory instead of O(rows-per-window):
    the shape that survives a window holding billions of rows at 100 TB.
    Bit-identical to windowed_ewma when each sub-bucket preserves the
    (ts, tiebreak) order (same fold, same order, same arithmetic).
    """
    alpha = ewma_alpha(period_minutes)
    lam = 1.0 - alpha
    secs = period_minutes * 60
    wstart = (F.floor(F.unix_timestamp(F.col(ts_col)) / secs) * secs).cast("long")
    sub = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / sub_bucket_seconds)
        * sub_bucket_seconds
    ).cast("long")

    partials = (
        df.withColumn("window_start", wstart)
        .withColumn("__sub", sub)
        .groupBy(*group_cols, "window_start", "__sub")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            ewma_fold(
                ordered_values(value_col, [ts_col, tiebreak_col]), alpha
            ).alias("__s"),
        )
    )
    segs = F.array_sort(
        F.collect_list(F.struct(F.col("__sub"), F.col("__n"), F.col("__s")))
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
        partials.groupBy(*group_cols, "window_start")
        .agg(combined.alias("__c"))
        .select(
            *group_cols,
            "window_start",
            (F.col("window_start") + secs).cast("long").alias("window_end"),
            F.col("__c.n").alias("n_rows"),
            F.col("__c.s").alias("ewma"),
        )
    )
    if emit_positive_only:
        out = out.filter(F.col("ewma") > 0.0)
    return out


def holt_smoothing(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    order_cols: Sequence[str],
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) per key —
    the next indicator tier above the reference's single EWMA (S1/S2):

        l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

    seeded l_1 = x_1, b_1 = 0. The coupled recurrence has no
    rank-indexed closed form (unlike plain EWMA, indicators.py:102),
    so each key's series folds sequentially in an Arrow-batched
    ``applyInPandas`` — the standard per-entity time-series shape: one
    shuffle on the key, each task owns whole series. Emits the final
    (level, trend, one-step forecast, n_rows) per key.

    The Python fold writes the arithmetic in EXACTLY the oracle's
    expression order (both are IEEE doubles, so same ops in same order
    = bit-identical results), which is what lets a sequential stateful
    fold be DuckDB-oracled via a recursive CTE (ind_holt_trend).
    """
    import pandas as pd
    from pyspark.sql import types as T

    keys = list(key_cols)
    # key columns keep their INPUT types (coercing keys to string breaks
    # join-back on bigint keys — same rule as streaming.stateful)
    in_types = {f.name: f.dataType for f in df.schema.fields}
    out_schema = T.StructType(
        [
            *[T.StructField(k, in_types[k]) for k in keys],
            T.StructField("n_rows", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast_1", T.DoubleType()),
        ]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        xs = pdf[value_col].to_numpy()
        l = float(xs[0])
        b = 0.0
        for x in xs[1:]:
            l_new = alpha * float(x) + (1.0 - alpha) * (l + b)
            b = beta * (l_new - l) + (1.0 - beta) * b
            l = l_new
        head = pdf.iloc[0]
        return pd.DataFrame(
            [[*(head[k] for k in keys), len(xs), l, b, l + b]],
            columns=[*keys, "n_rows", "level", "trend", "forecast_1"],
        )

    return df.groupBy(*keys).applyInPandas(fold, schema=out_schema)
