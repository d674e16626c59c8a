"""Property/randomized tests (SURVEY.md §5.2 item 4) — seed-pinned
hypothesis generators over small DataFrames.

Spark session startup is expensive, so examples are kept small and
deadlines disabled; the properties target algebraic invariants:
dedup idempotence, set-op algebra, window-frame invariants, as-of
join bounds, EWMA convexity.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.indicators import ewma_fold
from kafka_stream_aggregator_spark.ops import dedup_keep_first

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),               # key
        st.integers(0, 100),             # order
        st.floats(0.1, 100.0, allow_nan=False),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(
        [(i, k, o, float(v)) for i, (k, o, v) in enumerate(rows)],
        "id long, k long, o long, v double",
    )
    once = dedup_keep_first(df, ["k"], ["o", "id"])
    twice = dedup_keep_first(once, ["k"], ["o", "id"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    assert once.select("k").distinct().count() == once.count()


@given(rows=rows_strategy)
@SETTINGS
def test_setop_algebra(spark, rows):
    df = spark.createDataFrame([(k,) for k, _, _ in rows], "k long")
    half = df.filter(F.col("k") % 2 == 0)
    # (A except B) union (A intersect B) == distinct A   (for B subset A)
    left = df.subtract(half).union(df.intersect(half)).distinct()
    assert sorted(map(tuple, left.collect())) == sorted(
        map(tuple, df.distinct().collect())
    )
    # |A unionAll A| = 2|A|
    assert df.unionAll(df).count() == 2 * df.count()


@given(rows=rows_strategy)
@SETTINGS
def test_running_sum_monotone_and_total(spark, rows):
    df = spark.createDataFrame(
        [(i, k, o, float(v)) for i, (k, o, v) in enumerate(rows)],
        "id long, k long, o long, v double",
    )
    w = (
        W.partitionBy("k")
        .orderBy("o", "id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = df.withColumn("run", F.sum("v").over(w))
    # positive values -> running sum non-decreasing within each key
    w_ord = W.partitionBy("k").orderBy("o", "id")
    bad = out.withColumn("prev", F.lag("run").over(w_ord)).filter(
        F.col("prev").isNotNull() & (F.col("run") < F.col("prev") - 1e-9)
    )
    assert bad.count() == 0
    # last running value == group sum
    last = (
        out.withColumn("rn", F.row_number().over(w_ord))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("k")))
        .filter("rn = n")
        .select("k", "run")
    )
    totals = df.groupBy("k").agg(F.sum("v").alias("s"))
    j = last.join(totals, "k").filter(
        F.abs(F.col("run") - F.col("s")) > 1e-6
    )
    assert j.count() == 0


@given(
    vals=st.lists(
        st.floats(0.1, 1000.0, allow_nan=False), min_size=1, max_size=50
    ),
    alpha=st.floats(0.001, 0.999),
)
@SETTINGS
def test_ewma_bounds_and_reference(spark, vals, alpha):
    """Zero-seeded EWMA lies in [0, max(vals)] and matches the pure-python
    reference fold exactly."""
    df = spark.createDataFrame([([float(v) for v in vals],)], "v array<double>")
    got = df.select(ewma_fold(F.col("v"), alpha).alias("e")).first()["e"]
    cur = 0.0
    for x in vals:
        cur = alpha * float(x) + (1 - alpha) * cur
    assert math.isclose(got, cur, rel_tol=1e-9)
    assert 0.0 <= got <= max(float(v) for v in vals) + 1e-9


@given(
    left_rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=15
    ),
    right_rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50),
                  st.floats(1.0, 9.0, allow_nan=False)),
        min_size=0, max_size=15,
    ),
)
@SETTINGS
def test_asof_join_matches_bruteforce(spark, left_rows, right_rows):
    """ops.asof_join (union+window) == brute-force nearest-prior lookup
    on arbitrary generated event streams, including ts ties."""
    from kafka_stream_aggregator_spark.ops import asof_join

    left = spark.createDataFrame(
        [(i, g, ts) for i, (g, ts) in enumerate(left_rows)],
        "lid long, g long, ts long",
    )
    right = spark.createDataFrame(
        [(i, g, ts, float(v)) for i, (g, ts, v) in enumerate(right_rows)],
        "rid long, rg long, rts long, val double",
    )
    got = {
        r["lid"]: r["val"]
        for r in asof_join(
            left, right, "ts", "rts", "g", "rg",
            right_tiebreak="rid", value_cols=["val"],
        ).collect()
    }
    # brute force: latest right row (rts <= ts) per group; ties on rts
    # resolved by largest rid
    for i, (g, ts) in enumerate(left_rows):
        cands = [
            (rts, rid, v)
            for rid, (rg, rts, v) in enumerate(right_rows)
            if rg == g and rts <= ts
        ]
        want = max(cands)[2] if cands else None
        assert got[i] == (float(want) if want is not None else None), (
            f"lid={i} g={g} ts={ts}: got {got[i]} want {want}"
        )
