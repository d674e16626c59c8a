"""Engine-surface operators, part 2: relational reshaping + modern
aggregate/typed extensions.

- unpivot (wide->long melt), the inverse of agg_pivot.
- linear-regression aggregate family (regr_*), the OLAP statistical
  aggregates beyond stddev/corr.
- mode (most-frequent-value aggregate).
- HLL sketch build/merge/estimate — the MERGEABLE approx-distinct tier:
  at 100 TB you persist per-partition/per-day sketch bytes and union
  them later instead of re-scanning raw data (re-aggregatable rollups;
  approx_count_distinct alone cannot be merged after the fact).
- Spark 4 VARIANT ingestion (parse_json + variant_get): semi-structured
  JSON stored binary-typed with typed path extraction, the
  shred-on-read pattern for heterogeneous event payloads.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t


@query(
    "fn_unpivot",
    oracle="""
    SELECT metric, count(*) AS n, round(sum(val), 4) AS total
    FROM (
      SELECT 'qty' AS metric, l_quantity AS val
      FROM lineitem WHERE l_orderkey < 2000
      UNION ALL
      SELECT 'price', l_extendedprice FROM lineitem WHERE l_orderkey < 2000
      UNION ALL
      SELECT 'disc', l_discount FROM lineitem WHERE l_orderkey < 2000
    ) GROUP BY metric
    """,
)
def fn_unpivot(spark, sf_dir):
    """Wide->long melt via DataFrame.unpivot (SQL UNPIVOT). The inverse
    of agg_pivot; stays a narrow projection + Expand, no join."""
    df = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 2000)
        .select(
            "l_orderkey",
            F.col("l_quantity").alias("qty"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("disc"),
        )
        .unpivot("l_orderkey", ["qty", "price", "disc"], "metric", "val")
    )
    return df.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("val"), 4).alias("total")
    )


@query(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 6) AS avgx,
           round(regr_avgy(l_extendedprice, l_quantity), 6) AS avgy
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_regression(spark, sf_dir):
    """OLS regression aggregates (SQL:2016 regr_* family) — one-pass,
    partial-aggregatable moment sums, so they scale exactly like
    sum/avg: map-side combine then one shuffle on the group key."""
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.regr_count(y, x).alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("icept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.regr_avgx(y, x), 6).alias("avgx"),
            F.round(F.regr_avgy(y, x), 6).alias("avgy"),
        )
    )


@query(
    "agg_mode",
    # l_linenumber frequencies are strictly decreasing (every order has
    # line 1, fewer have line 2, ...), so the mode is unique — no
    # tie-break nondeterminism across engines.
    oracle="""
    SELECT l_returnflag,
           CAST(mode(l_linenumber) AS BIGINT) AS mode_line,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_mode(spark, sf_dir):
    """Most-frequent-value aggregate. Used on a column whose frequency
    ranking is strictly ordered (every order has line 1, strictly fewer
    have line 2, ...), so the mode is unique — on ties both Spark and
    DuckDB pick arbitrarily and results would be engine-dependent."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.mode("l_linenumber").cast("long").alias("mode_line"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query("agg_hll_sketch_union", oracle=None)  # binary sketch: self-validating
def agg_hll_sketch_union(spark, sf_dir):
    """Mergeable distinct-count sketches (Apache DataSketches HLL).

    Builds one sketch per group (hll_sketch_agg), then UNIONS the
    partial sketches (hll_union_agg) into a global estimate — the
    re-aggregatable rollup pattern: at 100 TB you persist per-day/
    per-partition sketch blobs (a few KB each) and answer "distinct
    users last quarter" by merging 90 blobs instead of re-scanning
    90 days of raw events. approx_count_distinct gives a number you
    can never merge again; sketches compose.

    Self-validating result: emits the merged estimate alongside the
    exact distinct count and a within-5%% flag (HLL lgK=12 standard
    error is ~1.6%%).
    """
    e = t(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count_distinct("user_id").alias("exact_type"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users"),
        F.sum(F.lit(1)).alias("n_groups"),
    )
    exact = e.agg(F.count_distinct("user_id").alias("exact_users"))
    return (
        merged.crossJoin(exact)  # two 1-row aggregates
        .select(
            F.col("n_groups").cast("long").alias("n_groups"),
            F.col("est_users").cast("long").alias("est_users"),
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                / F.col("exact_users")
                < 0.05
            ).alias("within_5pct"),
        )
    )


@query(
    "fn_variant_suite",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing
    FROM events WHERE event_id < 500
    """,
)
def fn_variant_suite(spark, sf_dir):
    """Spark 4 VARIANT: parse_json stores the payload as a typed binary
    variant; variant_get extracts paths with a target type at scan
    speed (no per-row string re-parse downstream). try_variant_get
    yields NULL on missing paths/cast failures — the tolerant-schema
    ingestion idiom for heterogeneous event payloads."""
    v = F.parse_json(F.col("props"))
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.variant_get(v, "$.k", "bigint").alias("k_int"),
            F.variant_get(v, "$.k", "string").alias("k_str"),
            F.try_variant_get(v, "$.missing", "bigint").alias("k_missing"),
        )
    )


@query(
    "agg_mad",
    # Median absolute deviation — the robust dispersion stat (outlier-
    # immune, unlike stddev). Both engines interpolate the continuous
    # median identically.
    oracle="""
    WITH med AS (
      SELECT l_returnflag, median(l_extendedprice) AS m
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           round(any_value(m), 6) AS med_price,
           round(median(abs(l_extendedprice - m)), 6) AS mad_price
    FROM lineitem l JOIN med USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def agg_mad(spark, sf_dir):
    """Two-pass robust stats: per-group median, broadcast back (the
    group table is tiny — one row per group at any scale), then median
    of absolute deviations. Exactly two shuffles on the group key; the
    join is a broadcast, so the second pass re-uses the first pass's
    partitioning."""
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    med = li.groupBy("l_returnflag").agg(F.median("l_extendedprice").alias("m"))
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.any_value("m"), 6).alias("med_price"),
            F.round(F.median(F.abs(F.col("l_extendedprice") - F.col("m"))), 6).alias(
                "mad_price"
            ),
        )
    )
