"""Reusable composite operators the built-in DataFrame API lacks.

Each is a pure DataFrame->DataFrame composition (no UDFs, no collect),
designed around one shuffle where possible so it scales to 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    right_tiebreak: str | None = None,
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """As-of (nearest-prior-event) join, backward direction, exact matches.

    For each left row: values from the latest right row of the same group
    with right_on <= left_on. Implemented as union + last(ignorenulls)
    over a (group) window ordered by (time, side, tiebreak) — a single
    shuffle on the group key and one per-partition sort; no pairwise
    cross-product, so it scales linearly unlike the naive time-bounded
    join. Ties on the timestamp resolve to the largest tiebreak value
    (deterministic).

    Right rows sort before left rows at equal timestamps, so an exact
    timestamp match is visible to the left row.
    """
    value_cols = list(value_cols or [])
    rtypes = dict(right.dtypes)
    tie_type = rtypes[right_tiebreak] if right_tiebreak else "long"

    lhs = left.select(
        F.col(left_by).alias("__by"),
        F.col(left_on).alias("__on"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tie_type).alias("__tie"),
        *[F.lit(None).cast(rtypes[v]).alias(v) for v in value_cols],
        *[F.col(c) for c in left.columns],
    )
    rhs = right.select(
        F.col(right_by).alias("__by"),
        F.col(right_on).alias("__on"),
        F.lit(0).alias("__side"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).cast(tie_type).alias(
            "__tie"
        ),
        *[F.col(v) for v in value_cols],
        *[F.lit(None).cast(dt).alias(c) for c, dt in left.dtypes],
    )
    w = (
        W.partitionBy("__by")
        .orderBy("__on", "__side", F.col("__tie").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = lhs.unionByName(rhs).select(
        *[F.col(c) for c in left.columns],
        F.col("__side"),
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in value_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    by: str = "user_id",
    gap_seconds: int = 1800,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Assign session ids per group: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``. Classic lag + cumulative
    sum over one partitioned window (single shuffle)."""
    w = W.partitionBy(by).orderBy(ts_col, tiebreak)
    sec = F.col(ts_col).cast("double")
    prev = F.lag(sec).over(w)
    new_sess = F.when(
        prev.isNull() | ((sec - prev) > gap_seconds), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(
            W.partitionBy(by)
            .orderBy(ts_col, tiebreak)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """Deterministic dropDuplicates: keep the first row per key under an
    explicit ordering (row_number()==1 — one shuffle on the keys)."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_group(
    df: DataFrame, by: Sequence[str], order_by: Sequence[Column | str], k: int
) -> DataFrame:
    """Top-k rows per group via row_number (shuffle on group key; Spark
    pushes a per-partition rank limit below the shuffle since 3.5)."""
    w = W.partitionBy(*by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def global_top_k(df: DataFrame, order_by: Sequence[Column | str], k: int) -> DataFrame:
    """orderBy().limit(k) — compiles to TakeOrderedAndProject: each task
    keeps a k-heap, driver merges; no global sort at any scale."""
    return df.orderBy(*order_by).limit(k)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: replicate the (small-ish) dim side across
    `salt_buckets` salts and spread the fact side's hot keys uniformly.

    A plain shuffle join sends every row of a hot key to ONE reducer; at
    100 TB a single skewed key (a null user_id, a default partition key)
    stalls the stage. Salting bounds any reducer at 1/salt_buckets of a
    key's rows. AQE skew-join handles sort-merge cases adaptively; this
    is the explicit tool for when the skew is known and extreme.
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(
        salted_dim,
        (F.col(fact_key) == F.col(dim_key)) & (salted_fact["__salt"] == salted_dim["__salt"]),
        how,
    )
    return out.drop("__salt")
