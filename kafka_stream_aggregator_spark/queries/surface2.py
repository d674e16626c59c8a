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

from pyspark.sql import Window as W
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
                F.try_divide(
                    F.abs(F.col("est_users") - F.col("exact_users")),
                    F.col("exact_users"),
                )
                < 0.05
            ).alias("within_5pct"),  # try_divide: empty input -> NULL, not DIVIDE_BY_ZERO
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


@query(
    "fn_bitwise_suite",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_orderkey) AS band,
           bit_or(o_orderkey) AS bor,
           bit_xor(o_orderkey) AS bxor,
           CAST(sum(o_orderkey << 2) AS BIGINT) AS shl,
           CAST(sum(o_orderkey >> 1) AS BIGINT) AS shr
    FROM orders WHERE o_orderkey < 4000 GROUP BY o_orderstatus
    """,
)
def fn_bitwise_suite(spark, sf_dir):
    """Bitwise scalar (shifts) + bitwise aggregates (bit_and/or/xor) —
    all codegen'd integer ops, partial-aggregatable like sum."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("band"),
        F.bit_or("o_orderkey").alias("bor"),
        F.bit_xor("o_orderkey").alias("bxor"),
        F.sum(F.shiftleft(F.col("o_orderkey"), 2)).alias("shl"),
        F.sum(F.shiftright(F.col("o_orderkey"), 1)).alias("shr"),
    )


@query(
    "fn_url_suite",
    # DuckDB has no parse_url; the oracle replicates HOST/PATH/QUERY
    # extraction with anchored regexes over the same synthesized URL.
    oracle="""
    WITH u AS (
      SELECT o_orderkey,
             concat('https://shop.example.com/orders/', o_orderkey,
                    '?prio=', replace(o_orderpriority, ' ', '+')) AS url
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '^([a-z]+):', 1) AS protocol
    FROM u
    """,
)
def fn_url_suite(spark, sf_dir):
    """URL decomposition via Spark's parse_url (HOST/PATH/QUERY/PROTOCOL),
    the log-ingestion workhorse; stays entirely JVM-side."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    url = F.concat(
        F.lit("https://shop.example.com/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?prio="),
        F.replace(F.col("o_orderpriority"), F.lit(" "), F.lit("+")),
    )
    u = o.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "io_schema_evolution_merge",
    # Two parquet generations: gen-1 lacks the later `disc` column;
    # mergeSchema unions the file schemas and back-fills NULL — the
    # lake-side analogue of the Avro writer->reader resolution the
    # Kafka path implements (streaming/avro_codec.py).
    oracle="""
    SELECT gen, count(*) AS n,
           round(sum(l_quantity), 4) AS qty,
           round(coalesce(sum(l_discount), 0), 4) AS disc_sum,
           CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_disc
    FROM (
      SELECT 1 AS gen, l_quantity, NULL::DOUBLE AS l_discount
      FROM lineitem WHERE l_orderkey < 1000
      UNION ALL
      SELECT 2, l_quantity, l_discount
      FROM lineitem WHERE l_orderkey >= 1000 AND l_orderkey < 2000
    ) GROUP BY gen
    """,
)
def io_schema_evolution_merge(spark, sf_dir):
    import tempfile

    d = tempfile.mkdtemp(prefix="pq_evo_")
    li = t(spark, sf_dir, "lineitem")
    # generation 1: narrow schema
    li.filter(F.col("l_orderkey") < 1000).select(
        F.lit(1).alias("gen"), "l_quantity"
    ).write.mode("overwrite").parquet(d + "/g1")
    # generation 2: adds l_discount
    li.filter((F.col("l_orderkey") >= 1000) & (F.col("l_orderkey") < 2000)).select(
        F.lit(2).alias("gen"), "l_quantity", "l_discount"
    ).write.mode("overwrite").parquet(d + "/g2")
    back = spark.read.option("mergeSchema", True).parquet(d + "/g1", d + "/g2")
    return back.groupBy("gen").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("qty"),
        F.round(F.coalesce(F.sum("l_discount"), F.lit(0.0)), 4).alias("disc_sum"),
        F.sum(F.when(F.col("l_discount").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_disc"),
    )


@query(
    "agg_bool_suite",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(sum(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_over_200k
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_bool_suite(spark, sf_dir):
    """Boolean aggregates (every/any — SQL bool_and/bool_or):
    partial-aggregatable single-bit state, the cheapest reduction
    there is."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0))
        .cast("long")
        .alias("n_over_200k"),
    )


@query(
    "fn_try_arithmetic",
    # ANSI-safe arithmetic: divide-by-zero yields NULL instead of a
    # job-killing exception — at 100 TB one poisoned row must never
    # fail the stage. DuckDB's float division already NULLs on /0.
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / nullif(l_quantity - 25, 0), 6)
             AS price_per_excess,
           round(coalesce(l_extendedprice / nullif(l_quantity - 25, 0), -1), 6)
             AS safe_ratio
    FROM lineitem WHERE l_orderkey < 1500
    """,
)
def fn_try_arithmetic(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1500)
    ratio = F.try_divide("l_extendedprice", F.col("l_quantity") - 25)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(ratio, 6).alias("price_per_excess"),
        F.round(F.coalesce(ratio, F.lit(-1.0)), 6).alias("safe_ratio"),
    )


@query(
    "fn_explode_outer",
    # explode_outer keeps rows whose array is empty (NULL element) —
    # the row-preserving flatten. DuckDB lacks an outer unnest; the
    # oracle pads empty arrays with [NULL] before unnesting.
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE string_split(o_orderpriority, '-') END AS parts
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey, u AS part
    FROM t, unnest(CASE WHEN len(parts) = 0
                        THEN [CAST(NULL AS VARCHAR)]
                        ELSE parts END) AS s(u)
    """,
)
def fn_explode_outer(spark, sf_dir):
    """Row-preserving flatten: explode_outer emits (key, NULL) for an
    empty/NULL array instead of dropping the row — the difference
    between an inner and outer lateral flatten."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    parts = F.when(
        F.col("o_orderkey") % 3 == 0, F.array().cast("array<string>")
    ).otherwise(F.split("o_orderpriority", "-"))
    return o.select(
        "o_orderkey", F.explode_outer(parts).alias("part")
    )


@query(
    "agg_count_if",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_if(spark, sf_dir):
    """Conditional count aggregate — the filtered-count idiom without a
    CASE/sum dance; partial-aggregatable like count."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "fn_interval_suite",
    # Calendar-interval arithmetic: month addition clamps to month end
    # identically in both engines (2024-01-31 + 1 month = 2024-02-29).
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d')
             AS plus_1mo,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
           CAST(datediff('month', DATE '1995-01-01',
                         date_trunc('month', CAST(o_orderdate AS DATE)))
                AS BIGINT) AS months_since,
           strftime(CAST(o_orderdate AS TIMESTAMP) + INTERVAL 90 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS plus_90min
    FROM orders WHERE o_orderkey < 2500
    """,
)
def fn_interval_suite(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("plus_1mo"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("eom"),
        F.months_between(F.date_trunc("month", d), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("months_since"),
        F.date_format(
            F.col("o_orderdate").cast("timestamp")
            + F.expr("INTERVAL 90 MINUTES"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("plus_90min"),
    )


@query(
    "agg_listagg",
    # Ordered string concatenation per group (SQL:2023 LISTAGG /
    # string_agg): deterministic via explicit element ordering.
    oracle="""
    SELECT o_orderpriority,
           string_agg(o_orderstatus, '|' ORDER BY o_orderkey) AS statuses,
           count(*) AS n
    FROM orders WHERE o_orderkey < 400 GROUP BY o_orderpriority
    """,
)
def agg_listagg(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.groupBy("o_orderpriority").agg(
        F.expr("listagg(o_orderstatus, '|') WITHIN GROUP (ORDER BY o_orderkey)")
        .alias("statuses"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "io_zstd_roundtrip",
    # Codec control: zstd is the 100 TB default recommendation
    # (snappy-class decode speed at gzip-class ratios); the round-trip
    # proves content-identity under the codec switch.
    oracle="""
    SELECT l_linestatus, count(*) AS n, round(sum(l_tax), 6) AS tax
    FROM lineitem WHERE l_orderkey < 6000 GROUP BY l_linestatus
    """,
)
def io_zstd_roundtrip(spark, sf_dir):
    import tempfile

    d = tempfile.mkdtemp(prefix="zstd_rt_")
    t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 6000).select(
        "l_linestatus", "l_tax"
    ).write.mode("overwrite").option("compression", "zstd").parquet(d)
    return (
        spark.read.parquet(d)
        .groupBy("l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_tax"), 6).alias("tax"))
    )


@query(
    "fn_collation_suite",
    # Spark 4 collations: UTF8_LCASE makes comparison/equality/ordering
    # case-insensitive AT THE TYPE LEVEL (no lower() rewrites at every
    # call site). The oracle models the same semantics with explicit
    # lower() — equivalent on this ASCII corpus.
    oracle="""
    SELECT o_orderkey,
           (lower(o_orderpriority) = lower(upper(o_orderpriority)))
             AS eq_ci,
           (lower(o_orderstatus) < lower('p')) AS lt_ci,
           CAST(contains(lower(o_orderpriority), lower('URGENT')) AS BOOLEAN)
             AS contains_ci
    FROM orders WHERE o_orderkey < 1500
    """,
)
def fn_collation_suite(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1500)
    ci = lambda c: F.collate(c, "UTF8_LCASE")  # noqa: E731
    return o.select(
        "o_orderkey",
        (ci(F.col("o_orderpriority")) == ci(F.upper("o_orderpriority"))).alias(
            "eq_ci"
        ),
        (ci(F.col("o_orderstatus")) < ci(F.lit("p"))).alias("lt_ci"),
        F.contains(ci(F.col("o_orderpriority")), ci(F.lit("URGENT"))).alias(
            "contains_ci"
        ),
    )


@query(
    "agg_corr_matrix",
    # Pairwise correlation matrix over the lineitem numeric columns,
    # long form (one row per pair) — every corr is a one-pass moment
    # aggregate, all six computed in a single scan + single reduce.
    oracle="""
    SELECT 'qty_price' AS pair, round(corr(l_quantity, l_extendedprice), 6) AS r
    FROM lineitem
    UNION ALL SELECT 'qty_disc', round(corr(l_quantity, l_discount), 6) FROM lineitem
    UNION ALL SELECT 'qty_tax', round(corr(l_quantity, l_tax), 6) FROM lineitem
    UNION ALL SELECT 'price_disc', round(corr(l_extendedprice, l_discount), 6) FROM lineitem
    UNION ALL SELECT 'price_tax', round(corr(l_extendedprice, l_tax), 6) FROM lineitem
    UNION ALL SELECT 'disc_tax', round(corr(l_discount, l_tax), 6) FROM lineitem
    """,
)
def agg_corr_matrix(spark, sf_dir):
    cols = [
        ("qty", "l_quantity"),
        ("price", "l_extendedprice"),
        ("disc", "l_discount"),
        ("tax", "l_tax"),
    ]
    li = t(spark, sf_dir, "lineitem")
    # one aggregate row with all six moments, then unpivot to long form
    aggs = []
    names = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            n = f"{cols[i][0]}_{cols[j][0]}"
            names.append(n)
            aggs.append(F.round(F.corr(cols[i][1], cols[j][1]), 6).alias(n))
    wide = li.agg(*aggs)
    return wide.unpivot([], names, "pair", "r")


@query(
    "fn_format_suite",
    # C-style formatting — both engines implement printf semantics.
    oracle="""
    SELECT o_orderkey,
           printf('%08d', o_orderkey) AS padded,
           printf('%.2f', o_totalprice) AS price2dp,
           printf('order %d: %s', o_orderkey, o_orderstatus) AS label
    FROM orders WHERE o_orderkey < 1200
    """,
)
def fn_format_suite(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1200)
    return o.select(
        "o_orderkey",
        F.format_string("%08d", "o_orderkey").alias("padded"),
        F.format_string("%.2f", "o_totalprice").alias("price2dp"),
        F.format_string("order %d: %s", "o_orderkey", "o_orderstatus").alias(
            "label"
        ),
    )


@query(
    "win_percent_of_total",
    # Share-of-total analytics: an unframed partition window (whole
    # partition aggregate broadcast back to every row).
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           round(o_totalprice / sum(o_totalprice)
                 OVER (PARTITION BY o_orderpriority), 9) AS share,
           round(o_totalprice / sum(o_totalprice) OVER (), 9) AS share_global
    FROM orders WHERE o_orderkey < 3000
    """,
)
def win_percent_of_total(spark, sf_dir):
    """Per-group share via an unframed partition window; GLOBAL share
    via a broadcast 1-row aggregate — an empty-partition window
    (sum OVER ()) would move the whole table to one reducer, the
    classic scale anti-pattern this query deliberately avoids."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    w_grp = W.partitionBy("o_orderpriority")
    total = o.agg(F.sum("o_totalprice").alias("__tot"))
    return (
        o.crossJoin(F.broadcast(total))
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round(
                F.col("o_totalprice") / F.sum("o_totalprice").over(w_grp), 9
            ).alias("share"),
            F.round(F.col("o_totalprice") / F.col("__tot"), 9).alias(
                "share_global"
            ),
        )
    )
