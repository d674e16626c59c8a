"""Aggregation operator inventory (SURVEY.md §2.B "Aggregations").

All plain groupBy aggregates here compile to partial (map-side) + final
(reduce-side) HashAggregate — one shuffle on the group keys, which is the
scalable shape. Statistical moments beyond Spark's built-in definitions
are oracle-matched by explicit-moment SQL (Spark's skewness/kurtosis are
population g1/g2; DuckDB's builtins are sample stats, so the oracle
computes the population formulas directly).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "agg_basic_stats",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_rows,
           round(sum(l_quantity), 6) AS sum_qty,
           round(avg(l_quantity), 6) AS avg_qty,
           round(min(l_extendedprice), 6) AS min_price,
           round(max(l_extendedprice), 6) AS max_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                AS DOUBLE) AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_basic_stats(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.min("l_extendedprice"), 6).alias("min_price"),
            F.round(F.max("l_extendedprice"), 6).alias("max_price"),
            # decimal-exact: money sums over data-sized groups are the
            # cross-engine 1-ulp class the sf1 rotation keeps catching
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT year(o_orderdate)) AS n_years
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct(F.year("o_orderdate")).alias("n_years"),
        )
    )


@query(
    "agg_stddev_corr",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(stddev_pop(l_extendedprice), 6) AS sdpop_price,
           round(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qty_price,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stddev_corr(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.stddev_pop("l_extendedprice"), 6).alias("sdpop_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
                "cov_qty_price"
            ),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
        )
    )


@query(
    "agg_skew_kurt",
    # Spark: population skewness g1 = m3/m2^1.5, kurtosis g2 = m4/m2^2 - 3.
    oracle="""
    WITH m AS (
      SELECT l_linestatus,
             avg(l_quantity) AS mu,
             avg(l_quantity * l_quantity) AS m2r,
             avg(l_quantity * l_quantity * l_quantity) AS m3r,
             avg(l_quantity * l_quantity * l_quantity * l_quantity) AS m4r
      FROM lineitem GROUP BY l_linestatus
    )
    SELECT l_linestatus,
           round((m3r - 3*mu*m2r + 2*mu*mu*mu)
                 / pow(m2r - mu*mu, 1.5), 6) AS skew_qty,
           round((m4r - 4*mu*m3r + 6*mu*mu*m2r - 3*mu*mu*mu*mu)
                 / pow(m2r - mu*mu, 2) - 3, 6) AS kurt_qty
    FROM m
    """,
)
def agg_skew_kurt(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
            F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
        )
    )


_PCT_CACHE: dict = {}


def _source_fingerprint(path: str) -> tuple:
    """Stable identity of a parquet source for plan-cache keying:
    the full (relative path, mtime_ns, size) listing — a tier stored
    as a multi-file directory, or regenerated in place, invalidates
    correctly (ADVICE r9: a single hard-coded filename's mtime missed
    both cases; size catches same-mtime rewrites)."""
    if os.path.isdir(path):
        items = []
        # dirs.sort() pins os.walk's otherwise-unspecified traversal
        # order so identical on-disk state always yields an identical
        # cache key (ADVICE r10: unordered walks caused spurious
        # plan-cache misses on multi-level parquet directories).
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                items.append(
                    (os.path.relpath(p, path), st.st_mtime_ns, st.st_size)
                )
        return tuple(items)
    st = os.stat(path)
    return ((path, st.st_mtime_ns, st.st_size),)


@query(
    "agg_percentiles",
    bench=True,
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           round(median(l_extendedprice), 6) AS med_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact grouped percentiles, round-9 shape (VERDICT r8 item 4:
    the fused-SQL version ran 3 full fact scans and sat ~6.6x DuckDB
    at sf1; this runs 1 full scan + 1 range-pruned scan, measured
    ~2.3x):

    - Pass 1 (the ONLY full scan): GROUPING SETS ((flag, qty),
      (flag, price_bucket)) — one codegen hash-agg produces BOTH
      branches' cells; the Expand is in-memory, the shuffle is
      O(cells). Cell count is scale-INVARIANT: l_quantity has ~50
      distinct values and the static step-64 price buckets ~1.7k at
      any SF, so collecting the cells to the driver is bounded
      metadata (a histogram), not data — the classic two-phase exact
      quantile algorithm.
    - Driver rank math on the cells (exact integer counts): qty
      percentile boundary VALUES fall straight out of the counts; for
      the continuous price column only the 1-2 hot buckets covering
      the target ranks are identified.
    - Pass 2: a scan FILTERED to the union of hot-bucket price ranges
      (a pushable range predicate — no join, no bucket compute for
      cold rows), ranked within (flag, bucket) over ~n/1700 rows.

    Emission semantics stay bit-identical to the SQL tiers and the
    oracle: the collected doubles pass through Python untouched (IEEE
    doubles both sides of py4j), interpolation lo + frac*(hi-lo) is
    the same IEEE chain, and round-6 uses Decimal HALF_UP on the
    exact binary value — exactly Spark's round(double, 6) (Python's
    builtin round() is banker's and would NOT match).
    """
    li = t(spark, sf_dir, "lineitem")
    # Statement cache: Catalyst analysis+optimization of a fresh plan
    # costs a measured ~0.3 s per call — 2x the actual execution at
    # sf1. Cache the ANALYZED DataFrames per (session, tier, file
    # mtime) and re-execute them (data is re-scanned every call; only
    # the plan is reused — what any engine's prepared-statement cache
    # does). The mtime key drops the cache when a tier is regenerated
    # in place.
    # applicationId is a stable per-session identity — id(spark) can
    # be REUSED by a new session after the old one is gc'd (ADVICE r9),
    # which would hand the new session a dead session's cached plans.
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        _source_fingerprint(os.path.join(sf_dir, "lineitem.parquet")),
    )
    cache = _PCT_CACHE.setdefault(key, {})
    if len(_PCT_CACHE) > 8:  # bound: a handful of live tiers
        _PCT_CACHE.clear()
        cache = _PCT_CACHE.setdefault(key, {})
    if "cells" not in cache:
        cache["cells"] = spark.sql(
            """
            SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS v,
                   CAST(floor(CAST(l_extendedprice AS DOUBLE) / 64)
                        AS BIGINT) AS b,
                   count(*) AS c
            FROM {li}
            GROUP BY GROUPING SETS ((l_returnflag, v), (l_returnflag, b))
            """,
            li=li,
        )
    cells = cache["cells"].collect()
    qty: dict[str, list] = {}
    buck: dict[str, list] = {}
    for r in cells:
        if r["v"] is not None:
            qty.setdefault(r["l_returnflag"], []).append((r["v"], r["c"]))
        elif r["b"] is not None:
            buck.setdefault(r["l_returnflag"], []).append((r["b"], r["c"]))

    def boundaries(pairs, q):
        """quantile_cont boundary values from (value, count) cells:
        (n, frac_rank, lo_value, hi_value) — integer rank walk."""
        pairs.sort()
        n = sum(c for _, c in pairs)
        pos = q * (n - 1)
        flo, fhi = int(math.floor(pos)), int(math.ceil(pos))
        lo = hi = None
        below = 0
        for v, c in pairs:
            if lo is None and below <= flo < below + c:
                lo = v
            if hi is None and below <= fhi < below + c:
                hi = v
            below += c
        return n, lo, hi

    # hot-bucket targets per flag: global ranks floor/ceil(0.5*(n-1))
    # and the bucket(s) covering them
    if not qty:  # empty tier: zero groups, stable schema
        return spark.createDataFrame(
            [],
            "l_returnflag string, p50_qty double, p90_qty double, "
            "med_price double",
        )
    targets: dict[str, dict] = {}
    for flag, bl in buck.items():
        bl.sort()
        np_ = sum(c for _, c in bl)
        pos = 0.5 * (np_ - 1)
        flo, fhi = int(math.floor(pos)), int(math.ceil(pos))
        hot = []
        below = 0
        for b, c in bl:
            if below <= flo < below + c or below <= fhi < below + c:
                hot.append((b, below))
            below += c
        targets[flag] = {"n": np_, "flo": flo, "fhi": fhi, "hot": hot}

    # Pass 2: ONE scan filtered to the union of hot price ranges (a
    # plain range predicate on the money column — cold rows never
    # reach the join-free pipeline), collected (bounded: ~n/1700 rows
    # per hot bucket) and rank-selected on the driver. At cluster
    # scale, hot buckets outgrow the driver; the loop re-buckets the
    # hot range with a 256x finer step (one more distributed counts
    # pass per level, log_256 levels total) until the collect is
    # bounded again — the classic iterative exact-quantile recursion.
    COLLECT_LIMIT = 4_000_000
    step = 64.0
    while True:
        est = sum(
            c
            for flag, tg in targets.items()
            for (b, _) in tg["hot"]
            for (bb, c) in buck[flag]
            if bb == b
        )
        if est <= COLLECT_LIMIT or step < 1e-4:
            break
        step /= 256.0
        ranges = sorted(
            {b for tg in targets.values() for b, _ in tg["hot"]}
        )
        # refine: counts of 256 sub-buckets inside each hot bucket
        pred = None
        for b in ranges:
            lo, hi = b * (step * 256), (b + 1) * (step * 256)
            p = (F.col("v") >= lo) & (F.col("v") < hi)
            pred = p if pred is None else (pred | p)
        sub = (
            li.select(
                "l_returnflag",
                F.col("l_extendedprice").cast("double").alias("v"),
            )
            .filter(pred)
            .groupBy(
                "l_returnflag",
                F.floor(F.col("v") / step).cast("bigint").alias("b"),
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        fine: dict[str, list] = {}
        for r in sub:
            fine.setdefault(r["l_returnflag"], []).append((r["b"], r["c"]))
        for flag, tg in targets.items():
            bl = sorted(fine.get(flag, []))
            coarse = {b: below for b, below in tg["hot"]}
            hot = []
            for cb, cbelow in sorted(coarse.items()):
                below = cbelow
                for b, c in bl:
                    if b * step >= cb * step * 256 and (b + 1) * step <= (
                        cb + 1
                    ) * step * 256:
                        if (
                            below <= tg["flo"] < below + c
                            or below <= tg["fhi"] < below + c
                        ):
                            hot.append((b, below))
                        below += c
            tg["hot"] = hot
        buck = fine

    ranges = sorted(
        {
            (b * step, (b + 1) * step)
            for tg in targets.values()
            for b, _ in tg["hot"]
        }
    )
    # pass-2 plan cached too, keyed by the hot ranges (stable for a
    # static tier; any data change shifts the ranges and rebuilds)
    if cache.get("ranges") != ranges:
        pred = None
        for lo, hi in ranges:
            p = (F.col("v") >= lo) & (F.col("v") < hi)
            pred = p if pred is None else (pred | p)
        cache["ranges"] = ranges
        cache["vals"] = li.select(
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("v"),
        ).filter(pred)
    vals = cache["vals"].collect()
    byflag: dict[str, list] = {}
    for r in vals:
        byflag.setdefault(r["l_returnflag"], []).append(r["v"])

    def hidec(x):
        """Spark/DuckDB round(double, 6): HALF_UP on the double's
        exact binary value — Python's Decimal reproduces it bit-for-
        bit (Python round() is banker's and would NOT)."""
        import decimal

        return float(
            decimal.Decimal(x).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
        )

    def interp(lo, hi, pos):
        return lo + (pos - math.floor(pos)) * (hi - lo)

    out = []
    for flag in sorted(qty):
        n0, lo0, hi0 = boundaries(qty[flag], 0.5)
        _, lo1, hi1 = boundaries(qty[flag], 0.9)
        tg = targets[flag]
        vs = sorted(
            v
            for v in byflag.get(flag, [])
            if any(
                b * step <= v < (b + 1) * step for b, _ in tg["hot"]
            )
        )
        below = min(bw for _, bw in tg["hot"])
        plo = vs[tg["flo"] - below]
        phi = vs[tg["fhi"] - below]
        out.append(
            (
                flag,
                hidec(interp(lo0, hi0, 0.5 * (n0 - 1))),
                hidec(interp(lo1, hi1, 0.9 * (n0 - 1))),
                hidec(interp(plo, phi, 0.5 * (tg["n"] - 1))),
            )
        )
    return spark.createDataFrame(
        out,
        "l_returnflag string, p50_qty double, p90_qty double, "
        "med_price double",
    )


@query("agg_percentiles_approx", oracle=None)
def agg_percentiles_approx(spark, sf_dir):
    """The 100 TB path for agg_percentiles (docs/SCALING.md): GK-sketch
    percentile_approx mergeable partials — O(1/accuracy) state per group
    regardless of value cardinality, vs the exact operator's
    O(distinct-values) counts-map. Accuracy 10000 ≈ 0.01% rank error.
    Bounds vs the exact result are asserted in tests."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.percentile_approx("l_quantity", F.lit(0.5), F.lit(10000)), 6
            ).alias("p50_qty"),
            F.round(
                F.percentile_approx("l_quantity", F.lit(0.9), F.lit(10000)), 6
            ).alias("p90_qty"),
            F.round(
                F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)), 6
            ).alias("med_price"),
        )
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
           array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
    FROM lineitem
    WHERE l_orderkey < 400
    GROUP BY l_orderkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 400)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("l_linenumber")), ",").alias(
                "linenumbers"
            ),
            F.array_join(F.array_sort(F.collect_set("l_returnflag")), ",").alias(
                "flags"
            ),
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           grouping(l_returnflag)*2 + grouping(l_linestatus) AS gid,
           round(sum(l_quantity), 6) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """Hierarchical subtotals (flag, flag+status, grand total) in one
    pass — Spark expands grouping sets BEFORE the shuffle, so partial
    aggregation still applies per set.

    Empty-input divergence, documented by design (r5 parity empty
    tier): on an ALL-EMPTY input Spark emits 0 rows for
    ROLLUP/CUBE/GROUPING SETS, where DuckDB (per ANSI) still emits
    the grand-total row (count 0 / NULL sums). Both engines agree
    on ANY non-empty input; the divergence is pinned in
    tests/test_edge_cases.py::test_rollup_cube_gsets_empty_input_semantics."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "gid",
            "sum_qty",
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(CAST(year(l_shipdate) AS VARCHAR), '<all>') AS shipyear,
           count(*) AS n_rows,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(38,6))), 2)
                AS DOUBLE) AS sum_price
    FROM lineitem GROUP BY CUBE (l_returnflag, year(l_shipdate))
    """,
)
def agg_cube(spark, sf_dir):
    """All 2^k grouping combinations over (flag, shipyear).

    Empty-input divergence, documented by design (r5 parity empty
    tier): on an ALL-EMPTY input Spark emits 0 rows for
    ROLLUP/CUBE/GROUPING SETS, where DuckDB (per ANSI) still emits
    the grand-total row (count 0 / NULL sums). Both engines agree
    on ANY non-empty input; the divergence is pinned in
    tests/test_edge_cases.py::test_rollup_cube_gsets_empty_input_semantics."""
    l = t(spark, sf_dir, "lineitem").withColumn(
        "shipyear_i", F.year("l_shipdate")
    )
    return (
        l.cube("l_returnflag", "shipyear_i")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # decimal-exact sum: double summation order differs between
            # engines and a 1-ulp flip at ~3e11 magnitude survives
            # round(,2) (seen at the sf1 tier); decimal is associative
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,6)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce(F.col("shipyear_i").cast("string"), F.lit("<all>")).alias(
                "shipyear"
            ),
            "n_rows",
            "sum_price",
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 1000000 + 0.5)
                         AS DECIMAL(38,0))) AS DOUBLE) / 1000000
             AS sum_total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit grouping-set selection ((status), (priority), ()) via
    SQL — the DataFrame API has no grouping-sets verb (SPARK-34932
    added SQL-only GROUP BY GROUPING SETS).

    Empty-input divergence, documented by design (r5 parity empty
    tier): on an ALL-EMPTY input Spark emits 0 rows for
    ROLLUP/CUBE/GROUPING SETS, where DuckDB (per ANSI) still emits
    the grand-total row (count 0 / NULL sums). Both engines agree
    on ANY non-empty input; the divergence is pinned in
    tests/test_edge_cases.py::test_rollup_cube_gsets_empty_input_semantics."""
    import uuid

    view = "orders_gs" + uuid.uuid4().hex[:8]
    t(spark, sf_dir, "orders").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT coalesce(o_orderstatus, '<all>') AS status,
               coalesce(o_orderpriority, '<all>') AS priority,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 1000000 + 0.5)
                             AS DECIMAL(38,0))) AS DOUBLE) / 1000000
                 AS sum_total
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 6) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark, sf_dir):
    out = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_returnflag",
        F.round(F.col("O"), 6).alias("qty_O"),
        F.round(F.col("F"), 6).alias("qty_F"),
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           count(*) AS n_orders,
           round(CAST(sum(CAST(round(o_totalprice, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / count(*), 6) AS avg_total
    FROM orders GROUP BY 1
    """,
)
def agg_histogram(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.round("o_totalprice", 6).cast("decimal(18,6)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_total"),
        )
    )


@query(
    "agg_minmax_by",
    # arg-max/arg-min with an explicit unique tiebreak (struct ordering) so
    # both engines pick the same row even on value ties.
    oracle="""
    WITH mx AS (
      SELECT o_orderpriority, o_orderkey, row_number() OVER (
        PARTITION BY o_orderpriority
        ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn FROM orders),
    mn AS (
      SELECT o_orderpriority, o_orderkey, row_number() OVER (
        PARTITION BY o_orderpriority
        ORDER BY o_totalprice, o_orderkey) AS rn FROM orders),
    ag AS (
      SELECT o_orderpriority,
             round(max(o_totalprice), 6) AS max_total,
             round(min(o_totalprice), 6) AS min_total
      FROM orders GROUP BY o_orderpriority)
    SELECT ag.o_orderpriority,
           mx.o_orderkey AS max_order,
           mn.o_orderkey AS min_order,
           max_total, min_total
    FROM ag
    JOIN mx ON ag.o_orderpriority = mx.o_orderpriority AND mx.rn = 1
    JOIN mn ON ag.o_orderpriority = mn.o_orderpriority AND mn.rn = 1
    """,
)
def agg_minmax_by(spark, sf_dir):
    # Coverage row for the min_by/max_by builtins (few groups, so the
    # object-hash aggregate is fine here). For HIGH-cardinality group
    # keys prefer declarative struct extremes (see ind_ohlc_5min):
    # min_by/max_by fall back to sort-based aggregation past 128
    # groups/partition — 12x slower at 10M rows (docs/SCALING.md).
    tie = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", tie).alias("max_order"),
            F.min_by("o_orderkey", tie).alias("min_order"),
            F.round(F.max("o_totalprice"), 6).alias("max_total"),
            F.round(F.min("o_totalprice"), 6).alias("min_total"),
        )
    )


@query(
    "agg_first_last_ordered",
    oracle="""
    WITH o AS (SELECT * FROM orders WHERE o_custkey < 200),
    fst AS (
      SELECT o_custkey, o_totalprice, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM o),
    lst AS (
      SELECT o_custkey, o_totalprice, row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM o),
    ag AS (SELECT o_custkey, count(*) AS n_orders FROM o GROUP BY o_custkey)
    SELECT ag.o_custkey,
           fst.o_totalprice AS first_total,
           lst.o_totalprice AS last_total,
           n_orders
    FROM ag
    JOIN fst ON ag.o_custkey = fst.o_custkey AND fst.rn = 1
    JOIN lst ON ag.o_custkey = lst.o_custkey AND lst.rn = 1
    """,
)
def agg_first_last_ordered(spark, sf_dir):
    ordk = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .groupBy("o_custkey")
        .agg(
            F.min_by("o_totalprice", ordk).alias("first_total"),
            F.max_by("o_totalprice", ordk).alias("last_total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query("agg_approx_distinct", oracle=None)
def agg_approx_distinct(spark, sf_dir):
    """HLL++ approx distinct (self-checked: within 5% of exact in tests)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )


@query("agg_sampling", oracle=None)
def agg_sampling(spark, sf_dir):
    """Bernoulli TABLESAMPLE with a pinned seed — deterministic within
    Spark (self-checked: repeatability + fraction tolerance in tests);
    no cross-engine oracle because RNG streams differ by engine."""
    s = t(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42)
    return s.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
    )
