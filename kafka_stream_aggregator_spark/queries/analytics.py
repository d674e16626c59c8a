"""Time-series / product-analytics operators over the event stream —
the composite shapes a real pipeline needs beyond raw SQL primitives:
gap filling, cohort retention, cumulative distinct counts, embedding
quantization. All pure DataFrame expressions with exact SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sketches import U64_SQL_TEMPLATE as _U64
from .base import query, t


@query(
    "ts_gap_fill",
    # dense 1-hour grid per event_type via sequence + left join; missing
    # slots carry 0 events. The grid generation is a tiny cross join
    # (types x hours), never a per-row explosion.
    oracle="""
    WITH bounds AS (
      SELECT CAST(floor(epoch(min(ts)) / 3600) * 3600 AS BIGINT) AS lo,
             CAST(floor(epoch(max(ts)) / 3600) * 3600 AS BIGINT) AS hi
      FROM events
    ), grid AS (
      SELECT t.event_type, g.slot
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(range(lo, hi + 3600, 3600)) AS slot
                  FROM bounds) g
    ), agg AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS slot,
             count(*) AS n, round(sum(value), 6) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT grid.event_type, grid.slot,
           coalesce(n, 0) AS n_events,
           coalesce(sv, 0.0) AS sum_value
    FROM grid LEFT JOIN agg
      ON grid.event_type = agg.event_type AND grid.slot = agg.slot
    """,
)
def ts_gap_fill(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    slot = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    agg = e.groupBy(
        "event_type", slot.alias("slot")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sv"))
    bounds = e.agg(
        (F.floor(F.min(F.unix_timestamp("ts")) / 3600) * 3600)
        .cast("long")
        .alias("lo"),
        (F.floor(F.max(F.unix_timestamp("ts")) / 3600) * 3600)
        .cast("long")
        .alias("hi"),
    )
    grid = (
        e.select("event_type")
        .distinct()
        .crossJoin(
            bounds.select(
                F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("slot")
            )
        )
    )
    return grid.join(agg, ["event_type", "slot"], "left").select(
        "event_type",
        "slot",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.coalesce("sv", F.lit(0.0)).alias("sum_value"),
    )


@query(
    "cohort_retention",
    # classic retention matrix: users bucketed by first-seen week, counted
    # as active in each later week. Two aggregations + one join, all
    # shuffles on user_id/week — the scalable cohort shape.
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
      FROM events
    )
    SELECT cohort_week,
           week - cohort_week AS week_offset,
           count(*) AS n_active
    FROM active JOIN firsts USING (user_id)
    GROUP BY cohort_week, week - cohort_week
    """,
)
def cohort_retention(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    week = (F.floor(F.unix_timestamp("ts") / 604800)).cast("long")
    firsts = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = e.select("user_id", week.alias("week")).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "cumulative_distinct_users",
    # running distinct-user count per day: windowed countDistinct isn't a
    # Spark window function, so mark each user's first day (row_number==1
    # over user) and run a cumulative sum of first-appearances — the
    # standard scalable rewrite.
    oracle="""
    WITH day_first AS (
      SELECT CAST(floor(epoch(min(ts)) / 86400) AS BIGINT) AS day
      FROM events GROUP BY user_id
    ), per_day AS (
      SELECT day, count(*) AS new_users FROM day_first GROUP BY day
    ), all_days AS (
      SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events
    )
    SELECT a.day,
           CAST(sum(coalesce(new_users, 0))
             OVER (ORDER BY a.day ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS cum_users
    FROM all_days a LEFT JOIN per_day p ON a.day = p.day
    """,
)
def cumulative_distinct_users(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    day = (F.floor(F.unix_timestamp("ts") / 86400)).cast("long")
    day_first = e.groupBy("user_id").agg(F.min(day).alias("day"))
    per_day = day_first.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    all_days = e.select(day.alias("day")).distinct()
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        all_days.join(per_day, "day", "left")
        .select(
            "day",
            F.sum(F.coalesce("new_users", F.lit(0))).over(w).alias("cum_users"),
        )
    )


@query(
    "emb_quantize_int8",
    # scalar int8 quantization of embeddings (storage/IO reduction at
    # 100 TB): per-vector absmax scale, symmetric round-to-nearest;
    # reports reconstruction error. Pure higher-order expressions.
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200
    ), s AS (
      SELECT vec_id, v,
             greatest(list_aggregate(list_transform(v, x -> abs(x)), 'max'),
                      1e-12) AS scale
      FROM e
    )
    SELECT vec_id, round(scale, 6) AS scale,
           CAST(floor(v[1] / scale * 127 + 0.5) AS INT) AS q_first,
           round(list_aggregate(list_transform(v,
                 x -> abs(x - floor(x / scale * 127 + 0.5) / 127.0 * scale)),
                 'max'), 6) AS max_abs_err
    FROM s
    """,
)
def emb_quantize_int8(spark, sf_dir):
    from ..llm.similarity import as_double

    e = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
    )
    scale = F.greatest(
        F.array_max(F.transform("v", lambda x: F.abs(x))), F.lit(1e-12)
    )
    # internal name "__scale" — the output column is aliased "scale",
    # and Spark's lateral column aliases (3.4+) would make later
    # references in the SAME select resolve to the rounded alias,
    # silently corrupting the error computation.
    s = e.withColumn("__scale", scale)
    # floor(x+0.5) instead of round(): identical half-way behavior in
    # both engines (Spark/DuckDB round() disagree on some double halves)
    dequant_err = F.transform(
        "v",
        lambda x: F.abs(
            x
            - F.floor(x / F.col("__scale") * 127 + 0.5) / 127.0 * F.col("__scale")
        ),
    )
    return s.select(
        "vec_id",
        F.round("__scale", 6).alias("scale"),
        F.floor(F.element_at("v", 1) / F.col("__scale") * 127 + 0.5)
        .cast("int")
        .alias("q_first"),
        F.round(F.array_max(dequant_err), 6).alias("max_abs_err"),
    )


@query(
    "agg_winsorized_stats",
    # Exact per-group p05/p95 (quantile_cont == Spark percentile
    # interpolation, pinned by agg_percentiles), then clip-and-agg.
    # Moments ride exact integer CENTS (the winsorized value is
    # cent-quantized: prices are 2dp already, only the two interpolated
    # bound values round to the cent — a semantic choice that makes
    # mean/std integer-exact: avg() over 10M clipped doubles flipped
    # the 6th decimal between engines at sf5). Sum and sum-of-squares
    # are DECIMAL(38,0)-exact; mean/std are then one identical double
    # chain; n_clipped still compares RAW values against the bounds.
    oracle="""
    WITH q AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS p05,
             quantile_cont(l_extendedprice, 0.95) AS p95
      FROM lineitem GROUP BY l_returnflag
    ), c AS (
      SELECT l.l_returnflag,
             CAST(floor(least(greatest(l_extendedprice, p05), p95) * 100
                        + 0.5) AS BIGINT) AS wc,
             CASE WHEN l_extendedprice < p05 OR l_extendedprice > p95
                  THEN 1 ELSE 0 END AS clip
      FROM lineitem l JOIN q USING (l_returnflag)
    ), m AS (
      SELECT l_returnflag,
             count(*) AS n,
             sum(CAST(wc AS DECIMAL(38,0))) AS sx,
             sum(CAST(wc AS DECIMAL(38,0)) * CAST(wc AS DECIMAL(38,0))) AS sxx,
             sum(clip) AS n_clipped
      FROM c GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(sx AS DOUBLE) / n / 100 AS wins_mean,
           sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / n / (n - 1)) / 100
             AS wins_std,
           CAST(n_clipped AS BIGINT) AS n_clipped
    FROM m
    """,
)
def agg_winsorized_stats(spark, sf_dir):
    """Winsorized (outlier-clipped) moments: exact per-group 5th/95th
    percentiles, values clamped into [p05, p95], then mean/std — the
    robust-statistics screen a feature pipeline runs before training
    on heavy-tailed columns.

    Plan: percentile pass -> tiny per-group bounds relation (3 rows)
    broadcast back into a second column-pruned scan; the clip itself
    is pure codegen (least/greatest). At 100 TB swap the builtin
    percentile for ops.exact_percentiles_auto's bucketed tier — same
    bounds relation, fully parallel first pass."""
    li = t(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05)").alias("p05"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95"))
    wc = F.floor(clipped * 100 + 0.5).cast("long").cast("decimal(38,0)")
    m = (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(wc).alias("sx"),
            F.sum(wc * wc).alias("sxx"),
            F.sum(
                (
                    (F.col("l_extendedprice") < F.col("p05"))
                    | (F.col("l_extendedprice") > F.col("p95"))
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_clipped"),
        )
    )
    n = F.col("n")
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        (F.col("sx").cast("double") / n / 100).alias("wins_mean"),
        (
            F.sqrt(
                (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
                / n
                / (n - 1)
            )
            / 100
        ).alias("wins_std"),
        "n_clipped",
    )


@query(
    "doc_kfold_assign",
    # Deterministic 5-fold cross-validation assignment from the
    # portable hash — reproducible across engines and runs, no RNG.
    oracle=f"""
    WITH f AS (
      SELECT doc_id, n_chars,
             {_U64.format(expr="CAST(doc_id AS VARCHAR) || ':fold'")} % 5 AS fold
      FROM documents
    )
    SELECT fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(n_chars), 6) AS avg_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM f GROUP BY fold
    """,
)
def doc_kfold_assign(spark, sf_dir):
    """Deterministic k-fold CV assignment (k=5): fold = portable hash
    of the doc key mod k — row-local, engine-portable, reproducible,
    the same mechanism as doc_train_split's md5-nibble split
    generalized to arbitrary k. Per-fold size/length stats confirm the
    hash balances folds. Pure map + one bounded groupBy."""
    from ..sketches import portable_u64

    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            (portable_u64(F.col("doc_id"), salt="fold") % 5).alias("fold"),
            "doc_id",
            "n_chars",
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
    )


@query(
    "diag_key_skew",
    oracle="""
    WITH k AS (
      SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM k
    ), top AS (
      SELECT l_orderkey, n,
             row_number() OVER (ORDER BY n DESC, l_orderkey) AS rk
      FROM k
    )
    SELECT t.rk, t.l_orderkey AS hot_key, CAST(t.n AS BIGINT) AS n_rows,
           round(CAST(t.n * tot.n_keys AS DOUBLE) / tot.total, 6) AS x_mean,
           round(CAST(t.n AS DOUBLE) / tot.total, 6) AS share
    FROM top t CROSS JOIN tot WHERE t.rk <= 10
    """,
)
def diag_key_skew(spark, sf_dir):
    """Join-key skew diagnosis — the pre-flight a 100 TB join runs
    before choosing between plain shuffle, AQE skew-join, and
    ops.salted_join: per-key cardinalities, the 10 hottest keys, each
    key's multiple of the mean and share of total rows. A key at
    1000x the mean is the one that pins a reducer for hours; this
    report is one groupBy + a TakeOrdered top-10 + a broadcast 1-row
    totals join (the percent-of-total pattern — never sum OVER ())."""
    li = t(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    # x_mean = n / (total / n_keys) computed as n*n_keys/total: the
    # numerator and denominator stay EXACT integers, so the one float
    # division is bit-identical cross-engine (a float avg()'s summation
    # order differs between engines -- 1-ulp flip seen at sf0.1).
    tot = F.broadcast(
        k.agg(
            F.sum("n").cast("bigint").alias("total"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        )
    )
    top = (
        k.orderBy(F.desc("n"), "l_orderkey")
        .limit(10)
        .withColumn(
            "rk",
            F.row_number().over(
                W.orderBy(F.desc("n"), "l_orderkey")
            ),
        )
    )
    return top.crossJoin(tot).select(
        "rk",
        F.col("l_orderkey").alias("hot_key"),
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(
            (F.col("n") * F.col("n_keys")).cast("double") / F.col("total"), 6
        ).alias("x_mean"),
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
    )


@query(
    "diag_data_quality",
    # One-scan expectations report over events: null rates, range
    # violations, distinctness — every check a codegen conditional agg.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS null_rate_user,
           round(CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS null_rate_value,
           CAST(sum(CASE WHEN value < -1000000 OR value > 1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS range_violations,
           CAST(sum(CASE WHEN event_type NOT IN
                          ('click','view','purchase','signup','logout',
                           'login','error','refund')
                         THEN 1 ELSE 0 END) AS BIGINT) AS domain_violations,
           CAST(count(DISTINCT event_id) AS BIGINT) AS distinct_ids,
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS dup_ids
    FROM events
    """,
)
def diag_data_quality(spark, sf_dir):
    """One-scan data-quality expectations report (null rates, numeric
    range violations, categorical domain violations, key uniqueness)
    — the ingest gate of a production pipeline. Every check is a
    conditional aggregate over the SAME scan (no per-check passes);
    at 100 TB this is one map-side-combined aggregation, and the
    distinct-key check is the only part that shuffles (swap in HLL
    via approx_count_distinct when exactness isn't required)."""
    ev = t(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    valid_types = [
        "click", "view", "purchase", "signup", "logout", "login", "error",
        "refund",
    ]
    return ev.agg(
        n.cast("bigint").alias("n_rows"),
        F.round(F.sum(F.col("user_id").isNull().cast("int")).cast("double") / n, 6)
        .alias("null_rate_user"),
        F.round(F.sum(F.col("value").isNull().cast("int")).cast("double") / n, 6)
        .alias("null_rate_value"),
        F.sum(
            ((F.col("value") < -1000000) | (F.col("value") > 1000000)).cast("int")
        )
        .cast("bigint")
        .alias("range_violations"),
        F.sum((~F.col("event_type").isin(valid_types)).cast("int"))
        .cast("bigint")
        .alias("domain_violations"),
        F.countDistinct("event_id").cast("bigint").alias("distinct_ids"),
        (n - F.countDistinct("event_id")).cast("bigint").alias("dup_ids"),
    )


@query(
    "fn_feature_scaling",
    # Per-group z-score + min-max scaling: stats pass -> tiny bounds
    # relation broadcast back (same two-pass shape as winsorize).
    # Sample stddev on both engines.
    oracle="""
    WITH s AS (
      SELECT event_type,
             avg(value) AS mu, stddev(value) AS sd,
             min(value) AS lo, max(value) AS hi
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           round((value - mu) / sd, 6) AS z,
           round((value - lo) / (hi - lo), 6) AS minmax
    FROM events e JOIN s USING (event_type)
    WHERE event_id % 100 = 0
    """,
)
def fn_feature_scaling(spark, sf_dir):
    """Feature scaling for ML prep: per-group z-score and min-max
    normalization — one stats aggregation broadcast back into the
    scan (never a window over the full table: the per-group stats
    relation is tiny and the big side stays map-only). Output sampled
    to every 100th event to keep the gate small; the plan is
    identical unsampled."""
    ev = t(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev("value").alias("sd"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )
    return (
        ev.join(F.broadcast(s), "event_type")
        .filter(F.col("event_id") % 100 == 0)
        .select(
            "event_id",
            "event_type",
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6).alias("z"),
            F.round(
                (F.col("value") - F.col("lo")) / (F.col("hi") - F.col("lo")), 6
            ).alias("minmax"),
        )
    )


@query(
    "fn_label_index",
    # StringIndexer analogue: labels indexed by (frequency desc, label
    # asc) — deterministic, so the mapping is exactly oracled.
    oracle="""
    WITH c AS (
      SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(row_number() OVER (ORDER BY n DESC, event_type) - 1
                AS BIGINT) AS label_idx
    FROM c
    """,
)
def fn_label_index(spark, sf_dir):
    """Deterministic label indexing (the StringIndexer shape):
    categorical values ranked by frequency with a lexicographic
    tiebreak get dense integer ids — reproducible across runs and
    engines, unlike hash-based encodings. The mapping table is
    vocabulary-sized; downstream encoding is a broadcast join against
    it. One groupBy + a window over the tiny mapping only."""
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w = W.orderBy(F.desc("n"), "event_type")
    return c.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (F.row_number().over(w) - 1).cast("bigint").alias("label_idx"),
    )


@query(
    "diag_distribution_drift",
    # PSI between the first and second half of the event stream (by
    # event_id parity as a deterministic split), fixed value bins.
    # Counts are exact integers; the PSI formula is one deterministic
    # float expression per bin.
    oracle="""
    WITH b AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS half,
             least(greatest(CAST(floor(value / 10) AS BIGINT), -10), 10) AS bin
      FROM events WHERE value IS NOT NULL
    ), c AS (
      SELECT half, bin, count(*) AS n FROM b GROUP BY half, bin
    ), tot AS (
      SELECT half, sum(n) AS t FROM c GROUP BY half
    ), p AS (
      SELECT bin,
             CAST(max(CASE WHEN half = 'a' THEN n ELSE 0 END) AS DOUBLE) AS na,
             CAST(max(CASE WHEN half = 'b' THEN n ELSE 0 END) AS DOUBLE) AS nb,
             (SELECT CAST(t AS DOUBLE) FROM tot WHERE half = 'a') AS ta,
             (SELECT CAST(t AS DOUBLE) FROM tot WHERE half = 'b') AS tb
      FROM c GROUP BY bin
    )
    SELECT bin,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(((na + 1) / (ta + 1) - (nb + 1) / (tb + 1))
                 * ln(((na + 1) / (ta + 1)) / ((nb + 1) / (tb + 1))), 6)
             AS psi_term
    FROM p
    """,
)
def diag_distribution_drift(spark, sf_dir):
    """Distribution-drift monitor (PSI, population stability index):
    bin a numeric feature, compare the binned distribution between two
    deterministic cohorts (here: even/odd event ids standing in for
    reference-vs-current windows), emit the per-bin PSI term —
    Σ psi_term > 0.2 is the standard retrain/alert threshold. Add-one
    smoothing keeps empty bins finite.

    100 TB shape: one scan → one bounded groupBy (cohort × bin, ≤ 42
    cells here) → the PSI arithmetic runs on the tiny binned relation.
    The expensive part is exactly one map-side-combined count, which is
    as cheap as distribution monitoring can be."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    b = ev.select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("half"),
        F.least(
            F.greatest(F.floor(F.col("value") / 10).cast("bigint"), F.lit(-10)),
            F.lit(10),
        ).alias("bin"),
    )
    c = b.groupBy("half", "bin").agg(F.count(F.lit(1)).alias("n"))
    wide = c.groupBy("bin").agg(
        F.max(F.when(F.col("half") == "a", F.col("n")).otherwise(0))
        .cast("double")
        .alias("na"),
        F.max(F.when(F.col("half") == "b", F.col("n")).otherwise(0))
        .cast("double")
        .alias("nb"),
    )
    tot = F.broadcast(
        c.groupBy()
        .agg(
            F.sum(F.when(F.col("half") == "a", F.col("n")).otherwise(0))
            .cast("double")
            .alias("ta"),
            F.sum(F.when(F.col("half") == "b", F.col("n")).otherwise(0))
            .cast("double")
            .alias("tb"),
        )
    )
    pa = (F.col("na") + 1) / (F.col("ta") + 1)
    pb = (F.col("nb") + 1) / (F.col("tb") + 1)
    return wide.crossJoin(tot).select(
        "bin",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_term"),
    )


@query(
    "ab_test_ztest",
    # Two-sample z-test per metric pair (purchase vs click value):
    # moments are exact-integer-count + float-sum aggregates over one
    # scan; the z arithmetic is one deterministic expression.
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             avg(value) AS mu,
             var_samp(value) AS v
      FROM events
      WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
      GROUP BY event_type
    ), w AS (
      SELECT max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
             max(CASE WHEN event_type = 'purchase' THEN mu END) AS mu1,
             max(CASE WHEN event_type = 'purchase' THEN v END) AS v1,
             max(CASE WHEN event_type = 'click' THEN n END) AS n2,
             max(CASE WHEN event_type = 'click' THEN mu END) AS mu2,
             max(CASE WHEN event_type = 'click' THEN v END) AS v2
      FROM s
    )
    SELECT CAST(n1 AS BIGINT) AS n_treat, CAST(n2 AS BIGINT) AS n_ctrl,
           round(mu1, 6) AS mean_treat, round(mu2, 6) AS mean_ctrl,
           round(mu1 - mu2, 6) AS lift,
           round((mu1 - mu2) / sqrt(v1 / n1 + v2 / n2), 6) AS z_score,
           abs((mu1 - mu2) / sqrt(v1 / n1 + v2 / n2)) > 1.959964 AS significant_95
    FROM w
    """,
)
def ab_test_ztest(spark, sf_dir):
    """Two-sample z-test (Welch form) between cohorts — the A/B
    readout every event pipeline serves: per-cohort moments from ONE
    map-side-combined aggregation, then the lift / standard-error /
    z-score arithmetic on the 1-row moments relation. At 100 TB the
    entire test costs one scan; nothing downstream of the groupBy
    touches more than two rows. var_samp on both engines (sample
    variance), matching the classic Welch denominator."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
        & F.col("value").isNotNull()
    )
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mu"),
        F.var_samp("value").alias("v"),
    )
    w = s.groupBy().agg(
        *[
            F.max(F.when(F.col("event_type") == typ, F.col(c))).alias(f"{c}{i}")
            for i, typ in ((1, "purchase"), (2, "click"))
            for c in ("n", "mu", "v")
        ]
    )
    se = F.sqrt(F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2"))
    z = (F.col("mu1") - F.col("mu2")) / se
    return w.select(
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("n2").cast("bigint").alias("n_ctrl"),
        F.round("mu1", 6).alias("mean_treat"),
        F.round("mu2", 6).alias("mean_ctrl"),
        F.round(F.col("mu1") - F.col("mu2"), 6).alias("lift"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.959964).alias("significant_95"),
    )


@query(
    "ts_sliding_distinct_users",
    # Exact distinct users per 2h window sliding by 1h: each event
    # lands in exactly 2 slide buckets (explode), then one
    # count-distinct per bucket. Spark's window() can't host a
    # DISTINCT aggregate in a window FUNCTION; the explode + groupBy
    # formulation is the standard exact shape.
    oracle="""
    WITH e AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr
      FROM events
    ), fan AS (
      SELECT user_id, (hr - s) * 3600 AS win_start
      FROM e, unnest(range(0, 2)) AS u(s)
    )
    SELECT win_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM fan GROUP BY win_start
    """,
)
def ts_sliding_distinct_users(spark, sf_dir):
    """Exact distinct users per 2-hour window sliding hourly. DISTINCT
    cannot ride a window function, so each event fans out into its 2
    covering slide buckets (bounded explode = window/slide ratio) and
    a plain count-distinct runs per bucket — one shuffle on
    (bucket, user) at any scale; swap in approx_count_distinct for the
    HLL tier when exactness can yield (agg_hll_sketch_union)."""
    ev = t(spark, sf_dir, "events")
    hr = F.floor(F.col("ts").cast("double") / 3600).cast("bigint")
    fan = ev.select(
        "user_id", hr.alias("hr"), F.explode(F.array(F.lit(0), F.lit(1))).alias("s")
    ).select("user_id", ((F.col("hr") - F.col("s")) * 3600).alias("win_start"))
    return fan.groupBy("win_start").agg(
        F.countDistinct("user_id").cast("bigint").alias("distinct_users")
    )


@query(
    "ts_period_over_period",
    # Daily revenue per event type with previous-day delta and pct
    # change — integer-exact until the final division.
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             round(sum(value), 6) AS revenue
      FROM events WHERE event_type IN ('purchase', 'refund')
      GROUP BY 1, 2
    )
    SELECT event_type, day, revenue,
           round(revenue - lag(revenue) OVER w, 6) AS delta,
           round((revenue - lag(revenue) OVER w)
                 / nullif(abs(lag(revenue) OVER w), 0) * 100, 4) AS pct_change
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def ts_period_over_period(spark, sf_dir):
    """Period-over-period reporting: daily aggregates per type, then
    lag-window deltas and percent change — the DoD/WoW/MoM readout.
    The window partitions by type over the aggregated (tiny) relation,
    never the raw events; at 100 TB the only big-data stage is the
    day-grain groupBy with map-side combine."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "refund")
    )
    day = F.floor(F.col("ts").cast("double") / 86400).cast("bigint")
    d = ev.groupBy("event_type", day.alias("day")).agg(
        F.round(F.sum("value"), 6).alias("revenue")
    )
    w = W.partitionBy("event_type").orderBy("day")
    prev = F.lag("revenue").over(w)
    return d.select(
        "event_type",
        "day",
        "revenue",
        F.round(F.col("revenue") - prev, 6).alias("delta"),
        F.round(
            (F.col("revenue") - prev) / F.nullif(F.abs(prev), F.lit(0)) * 100, 4
        ).alias("pct_change"),
    )


@query(
    "diag_referential_integrity",
    # FK conformance across the star schema in one report: orphan
    # counts via anti-join semantics per relationship.
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM customer) AS BIGINT)
    """,
)
def diag_referential_integrity(spark, sf_dir):
    """Referential-integrity report across the star schema: orphan
    counts for each FK relationship via left-anti joins (broadcast
    where the parent is a dimension). The ingest-gate companion to
    diag_data_quality: at 100 TB each check is one anti-join whose
    parent side is either broadcast (dims) or the join the pipeline
    would run anyway (facts), and the report is three 1-row counts."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")

    # fully declarative: each check is (anti-join count) x (total) as
    # 1-row relations — no driver-side .count() actions, one lazy plan
    def check(name, child, child_key, parent, parent_key, bcast):
        p = parent.select(parent_key)
        p = F.broadcast(p) if bcast else p
        orphans = (
            child.join(p, child[child_key] == p[parent_key], "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        )
        total = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        return (
            orphans.crossJoin(total)
            .select(F.lit(name).alias("fk"), "n_orphans", "n_rows")
        )

    checks = [
        check("lineitem.l_orderkey -> orders", li, "l_orderkey", o, "o_orderkey", False),
        check("orders.o_custkey -> customer", o, "o_custkey", c, "c_custkey", False),
        check("customer.c_nationkey -> nation", c, "c_nationkey", n, "n_nationkey", True),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


@query(
    "agg_equidepth_histogram",
    # Equi-depth (quantile-binned) histogram: ntile(8) with a full
    # deterministic tiebreak, then per-bin stats. Complements the
    # equi-width agg_histogram.
    oracle="""
    WITH b AS (
      SELECT l_extendedprice AS v,
             ntile(8) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber)
               AS bin
      FROM lineitem
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           round(min(v), 6) AS lo,
           round(max(v), 6) AS hi,
           round(CAST(sum(CAST(round(v, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / count(*), 6) AS mean_v
    FROM b GROUP BY bin
    """,
)
def agg_equidepth_histogram(spark, sf_dir):
    """Equi-depth histogram: 8 quantile bins of equal population via an
    exact global rank with a fully deterministic tiebreak, then per-bin
    bounds and means — the distribution summary that adapts bin edges
    to the data (where equi-width agg_histogram wastes bins on empty
    tails).

    Scale shape (reshaped in round 6 — the old plan was a global
    `ntile(8)` over an unpartitioned window, i.e. a single-reducer sort
    of the whole fact table): ops.distributed_global_rank, the shared
    two-phase ranking. Approximate quantile edges (1-row
    broadcast aggregate) pre-bucket every row into one of ~64
    near-uniform ranges; each pre-bucket is ranked independently by a
    PARTITIONED window, and a broadcast ≤64-row cumulative-offset
    relation lifts local ranks to exact global ranks. Rows with equal
    values always share a pre-bucket (edges cut on the value alone), so
    ordering by (bucket, v, tiebreak) == ordering by (v, tiebreak) and
    the result is bit-identical to the single-sort ntile. The ntile bin
    is then a closed-form function of (rank, N): the first N%8 bins get
    ceil(N/8) rows, the rest floor(N/8). No unpartitioned window
    touches the fact table; the only global window runs over the
    bounded pre-bucket-counts aggregate."""
    from ..ops import distributed_global_rank

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"), "l_orderkey", "l_linenumber"
    )
    total = li.agg(F.count(F.lit(1)).alias("n_total"))
    ranked = distributed_global_rank(
        li, ["v", "l_orderkey", "l_linenumber"], rank_col="rn"
    ).crossJoin(F.broadcast(total))
    # ntile(8) closed form: first rem bins take base+1 rows each
    base_sz = F.floor(F.col("n_total") / 8)
    rem = F.col("n_total") % 8
    big = base_sz + F.lit(1)
    bin_col = (
        F.when(
            F.col("rn") <= big * rem, F.floor((F.col("rn") - 1) / big) + 1
        )
        .otherwise(rem + F.floor((F.col("rn") - big * rem - 1) / base_sz) + 1)
        .cast("int")
        .alias("bin")
    )
    return (
        ranked.select("v", bin_col)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
            F.round(
                F.sum(F.round("v", 6).cast("decimal(18,6)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_v"),
        )
    )


@query(
    "corpus_top_ngrams",
    # WIMBD-style corpus analysis: the 20 most-duplicated 5-grams
    # corpus-wide with occurrence and document counts; ties broken
    # lexicographically.
    oracle="""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS tk
      FROM documents
    ), g AS (
      SELECT doc_id, array_to_string(tk[i:i+4], ' ') AS gram
      FROM tk, unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS u(i)
    ), c AS (
      SELECT gram, count(*) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM g GROUP BY gram
    )
    SELECT gram, n_occurrences, n_docs
    FROM c ORDER BY n_occurrences DESC, gram LIMIT 20
    """,
)
def corpus_top_ngrams(spark, sf_dir):
    """Corpus-wide most-duplicated n-grams (the WIMBD 'what's in my
    big data' analysis): 5-gram occurrence + document counts, top 20.
    One explode -> one groupBy on the gram (map-side partial counts;
    count(DISTINCT doc) rides the same shuffle as a two-level agg) ->
    TakeOrderedAndProject top-k (per-task heaps, never a global sort).
    The gram travels as its string here because the top-k output IS
    the string; the counting shuffle at 100 TB would pre-hash to 8
    bytes and join the winners' strings back (the composed-hash trick
    every dedup op here uses)."""
    from ..ops import data_sized_partitions, global_top_k

    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    toks = F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
    )
    grams = F.when(
        F.size(toks) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 4),
            lambda i: F.array_join(F.slice(toks, i, 5), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", F.explode(grams).alias("gram"))
    c = g.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
    )
    return global_top_k(
        c, [F.col("n_occurrences").desc(), F.col("gram")], 20
    )


@query(
    "fn_quantile_bin",
    # QuantileDiscretizer shape: quartile edges (type-7 interpolated,
    # the quantile_cont/Spark-percentile convention) computed once,
    # every row binned by value against the broadcast edges. Unlike
    # agg_equidepth_histogram (exact equal-count rank binning), equal
    # values ALWAYS share a bin here — the feature-engineering
    # discretizer semantics.
    oracle="""
    WITH e AS (
      SELECT quantile_cont(value, 0.25) AS q1,
             quantile_cont(value, 0.50) AS q2,
             quantile_cont(value, 0.75) AS q3
      FROM events
    ), b AS (
      SELECT CASE WHEN value <= q1 THEN 0
                  WHEN value <= q2 THEN 1
                  WHEN value <= q3 THEN 2
                  ELSE 3 END AS bin,
             value
      FROM events, e
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n,
           round(min(value), 6) AS lo,
           round(max(value), 6) AS hi,
           CAST(round(sum(CAST(value AS DECIMAL(38,6))), 4) AS DOUBLE)
             AS sum_v
    FROM b GROUP BY bin
    """,
)
def fn_quantile_bin(spark, sf_dir):
    """Quantile discretization (the ml.QuantileDiscretizer semantics,
    declaratively): exact interpolated quartile edges, then a map-only
    broadcast-edges CASE bins every row; per-bin stats in one more
    map-side-combinable agg. The edges use the BUCKETED exact tier
    explicitly (ops.exact_percentiles_bucketed): with no group columns
    the ladder's sort tier is a global rank window — precisely the
    shape the suite-wide no-unpartitioned-Window assertion keeps out.
    The binning pass is pure codegen; sums ride DECIMAL so cross-engine
    grand totals are order-independent."""
    from ..ops import exact_percentiles_bucketed

    ev = t(spark, sf_dir, "events").select("value")
    edges = exact_percentiles_bucketed(
        ev, "value", [(0.25, "q1"), (0.5, "q2"), (0.75, "q3")]
    )
    v = F.col("value")
    binned = ev.crossJoin(F.broadcast(edges)).select(
        F.when(v <= F.col("q1"), 0)
        .when(v <= F.col("q2"), 1)
        .when(v <= F.col("q3"), 2)
        .otherwise(3)
        .alias("bin"),
        "value",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
        F.round(F.sum(v.cast("decimal(38,6)")), 4)
        .cast("double")
        .alias("sum_v"),
    )


@query(
    "agg_mad_robust",
    # Median absolute deviation per event type — the robust dispersion
    # estimator (breakdown point 0.5 vs stddev's 0): med = median(v),
    # mad = median(|v - med|), both type-7 interpolated.
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med_v
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           round(max(med_v), 6) AS med_v,
           round(median(abs(value - med_v)), 6) AS mad_v,
           round(1.4826 * median(abs(value - med_v)), 6) AS mad_sigma
    FROM events e JOIN med USING (event_type)
    GROUP BY e.event_type
    """,
)
def agg_mad_robust(spark, sf_dir):
    """Median absolute deviation per group — the outlier-resistant
    dispersion metric (with the 1.4826 normal-consistency factor, the
    robust sigma that anomaly gates use where stddev is poisoned by the
    outliers it should detect). Two passes of the size-tiered exact
    percentile ladder: group medians (tiny relation) broadcast back
    into |v - med|, then the deviation median the same way. Same
    two-pass broadcast shape as agg_winsorized_stats; no stage holds
    more than one group's sort chain, no unpartitioned windows."""
    from ..ops import exact_percentiles_auto

    ev = t(spark, sf_dir, "events").select("event_type", "value")
    med = exact_percentiles_auto(
        ev, "value", [(0.5, "med_v")], group_cols=("event_type",)
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med_v"))
    )
    mad = exact_percentiles_auto(
        dev, "adev", [(0.5, "mad_v")], group_cols=("event_type",)
    )
    return (
        med.join(mad, "event_type")
        .select(
            "event_type",
            F.round("med_v", 6).alias("med_v"),
            F.round("mad_v", 6).alias("mad_v"),
            F.round(1.4826 * F.col("mad_v"), 6).alias("mad_sigma"),
        )
    )


@query(
    "graph_triangle_count",
    # Triangle census over the user co-occurrence graph (edge = two
    # users sharing a (type, 5-min window) cell, user_id < 120): edge /
    # wedge / triangle counts + global clustering coefficient. The
    # oracle counts each triangle once via the a<b<c convention;
    # counts are orientation-independent, so it equals the engine's
    # degree-oriented count exactly.
    oracle="""
    WITH b AS (
      SELECT DISTINCT user_id, event_type,
             CAST(floor(epoch(ts) / 300) AS BIGINT) AS w
      FROM events WHERE user_id < 120
    ), e AS (
      SELECT DISTINCT a.user_id AS ua, b2.user_id AS ub
      FROM b a JOIN b b2 ON a.event_type = b2.event_type AND a.w = b2.w
       AND a.user_id < b2.user_id
    ), deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT ua AS v FROM e UNION ALL SELECT ub FROM e
      ) GROUP BY v
    ), tri AS (
      SELECT count(*) AS n_tri
      FROM e e1 JOIN e e2 ON e1.ub = e2.ua
      JOIN e e3 ON e1.ua = e3.ua AND e2.ub = e3.ub
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_vertices,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT sum(d * (d - 1) / 2) FROM deg) AS BIGINT)
             AS n_wedges,
           CAST(n_tri AS BIGINT) AS n_triangles,
           round(3.0 * n_tri / (SELECT sum(d * (d - 1) / 2) FROM deg), 6)
             AS clustering
    FROM tri
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Distributed triangle counting — the graph-analytics primitive
    (community detection, spam/bot rings, clustering coefficient) —
    via DEGREE ORIENTATION (compact-forward / MapReduce node-iterator):
    orient every undirected edge from its lower-(degree, id) endpoint
    to the higher one; every out-neighborhood then has size O(sqrt(m))
    REGARDLESS of raw degree skew, so the wedge join that explodes on
    celebrity vertices under a naive orientation is bounded here — the
    classic trick that makes triangle counting survive power-law
    graphs at 100 TB. Wedges from each source's oriented neighbor
    pairs, closed by one join back against the oriented edge list;
    each triangle is produced exactly once (its minimum-key vertex is
    the wedge center). Three shuffles total (degree count, wedge join,
    closing join), all on vertex ids; the graph here is user
    co-occurrence in (event_type, 5-minute) cells."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 120)
    cell = F.floor(F.col("ts").cast("double") / 300).cast("bigint")
    b = ev.select(
        "user_id", "event_type", cell.alias("w")
    ).distinct()
    a1 = b.select(
        F.col("user_id").alias("ua"), "event_type", "w"
    )
    a2 = b.select(F.col("user_id").alias("ub"), "event_type", "w")
    edges = (
        a1.join(a2, ["event_type", "w"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )
    deg = (
        edges.select(F.explode(F.array("ua", "ub")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        edges.join(deg.withColumnRenamed("v", "ua").withColumnRenamed("d", "da"), "ua")
        .join(deg.withColumnRenamed("v", "ub").withColumnRenamed("d", "db"), "ub")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ua") < F.col("ub"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("ua")).otherwise(F.col("ub")).alias("src"),
        F.when(a_first, F.col("ub")).otherwise(F.col("ua")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_d"),
    )
    e1 = oriented.select("src", F.col("dst").alias("v"), F.col("dst_d").alias("dv"))
    e2 = oriented.select("src", F.col("dst").alias("w2"), F.col("dst_d").alias("dw"))
    wedge_order = (F.col("dv") < F.col("dw")) | (
        (F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w2"))
    )
    wedges = e1.join(e2, "src").filter(wedge_order).select("v", "w2")
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w2")
    )
    n_tri = wedges.join(closing, ["v", "w2"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )
    n_e = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    vstats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
    )
    return (
        n_tri.crossJoin(F.broadcast(n_e))
        .crossJoin(F.broadcast(vstats))
        .select(
            "n_vertices",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering"),
        )
    )


@query(
    "ts_autocorrelation",
    # Lag-1 and lag-24 autocorrelation of the hourly event-count series
    # per type — seasonality detection. All moments are INTEGER sums
    # (counts are ints), so the final Pearson arithmetic is a fixed
    # chain of identical double ops on exact inputs: cross-engine
    # deterministic with no float-summation-order exposure.
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, c,
             lag(c, 1) OVER w AS c1,
             lag(c, 24) OVER w AS c24
      FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    ), m AS (
      SELECT event_type,
             count(c1) AS n1, sum(CASE WHEN c1 IS NOT NULL THEN c END) AS sx1,
             sum(c1) AS sy1, sum(CASE WHEN c1 IS NOT NULL THEN c * c END) AS sxx1,
             sum(c1 * c1) AS syy1, sum(c * c1) AS sxy1,
             count(c24) AS n24, sum(CASE WHEN c24 IS NOT NULL THEN c END) AS sx24,
             sum(c24) AS sy24, sum(CASE WHEN c24 IS NOT NULL THEN c * c END) AS sxx24,
             sum(c24 * c24) AS syy24, sum(c * c24) AS sxy24
      FROM lagged GROUP BY event_type
    )
    SELECT event_type,
           CAST(n1 AS BIGINT) AS n_lag1,
           round((n1 * sxy1 - sx1 * sy1)
                 / sqrt(CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE)
                        * CAST(n1 * syy1 - sy1 * sy1 AS DOUBLE)), 6)
             AS acf_lag1,
           round((n24 * sxy24 - sx24 * sy24)
                 / sqrt(CAST(n24 * sxx24 - sx24 * sx24 AS DOUBLE)
                        * CAST(n24 * syy24 - sy24 * sy24 AS DOUBLE)), 6)
             AS acf_lag24
    FROM m
    """,
)
def ts_autocorrelation(spark, sf_dir):
    """Autocorrelation of the hourly event-count series per type at
    lag 1 (momentum) and lag 24 (daily seasonality) — the
    stationarity/seasonality probe that decides windowing and forecast
    features. Plan: the only data-sized stage is the hour-grain
    groupBy (map-side combine); the lag windows run per type over the
    tiny hourly relation; Pearson is computed from INTEGER co-moments
    (counts are exact), so both engines evaluate the identical double
    expression — the same trick diag_key_skew uses for its exact
    means, avoiding corr()'s float-accumulation order entirely."""
    ev = t(spark, sf_dir, "events")
    hr = F.floor(F.col("ts").cast("double") / 3600).cast("bigint")
    hourly = ev.groupBy("event_type", hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("event_type").orderBy("hr")
    lagged = hourly.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("c1"),
        F.lag("c", 24).over(w).alias("c24"),
    )

    def moments(lag_col, sfx):
        lc = F.col(lag_col)
        present = lc.isNotNull()
        return [
            F.count(lag_col).alias(f"n{sfx}"),
            F.sum(F.when(present, F.col("c"))).alias(f"sx{sfx}"),
            F.sum(lag_col).alias(f"sy{sfx}"),
            F.sum(F.when(present, F.col("c") * F.col("c"))).alias(f"sxx{sfx}"),
            F.sum(lc * lc).alias(f"syy{sfx}"),
            F.sum(F.col("c") * lc).alias(f"sxy{sfx}"),
        ]

    m = lagged.groupBy("event_type").agg(
        *moments("c1", "1"), *moments("c24", "24")
    )

    def acf(sfx):
        n, sx, sy = F.col(f"n{sfx}"), F.col(f"sx{sfx}"), F.col(f"sy{sfx}")
        sxx, syy, sxy = (
            F.col(f"sxx{sfx}"),
            F.col(f"syy{sfx}"),
            F.col(f"sxy{sfx}"),
        )
        return F.round(
            (n * sxy - sx * sy)
            / F.sqrt(
                (n * sxx - sx * sx).cast("double")
                * (n * syy - sy * sy).cast("double")
            ),
            6,
        )

    return m.select(
        "event_type",
        F.col("n1").cast("bigint").alias("n_lag1"),
        acf("1").alias("acf_lag1"),
        acf("24").alias("acf_lag24"),
    )


@query(
    "ts_correlated_users",
    # Behavioral similarity search: hour-of-day activity profiles (24
    # integer buckets) per user (< 80), top-20 most Pearson-correlated
    # pairs. Sparse formulation: sxy from an hour-keyed join (zero
    # buckets contribute nothing), per-user moments joined back, fixed
    # n=24. Integer moments -> identical doubles -> identical top-20.
    oracle="""
    WITH prof AS (
      SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hod,
             count(*) AS c
      FROM events WHERE user_id < 80 GROUP BY 1, 2
    ), mom AS (
      SELECT user_id, sum(c) AS sx, sum(c * c) AS sxx FROM prof GROUP BY 1
    ), sxy AS (
      SELECT a.user_id AS ua, b.user_id AS ub, sum(a.c * b.c) AS sxy
      FROM prof a JOIN prof b ON a.hod = b.hod AND a.user_id < b.user_id
      GROUP BY 1, 2
    ), corr AS (
      SELECT ua, ub,
             (24 * sxy - ma.sx * mb.sx)
               / sqrt(CAST(24 * ma.sxx - ma.sx * ma.sx AS DOUBLE)
                      * CAST(24 * mb.sxx - mb.sx * mb.sx AS DOUBLE)) AS r
      FROM sxy JOIN mom ma ON ua = ma.user_id JOIN mom mb ON ub = mb.user_id
    )
    SELECT ua, ub, round(r, 6) AS pearson_r
    FROM corr ORDER BY r DESC, ua, ub LIMIT 20
    """,
)
def ts_correlated_users(spark, sf_dir):
    """Time-series similarity search over user behavior: each user's
    hour-of-day activity profile (24 integer buckets), top-20 most
    correlated pairs — the 'users who act alike' primitive behind
    cohorting and anomaly rings. SPARSE co-moment formulation: the
    cross term joins profiles on the hour bucket (zero buckets drop
    out of the sum exactly), per-user moments are a tiny relation
    joined back, and n is the fixed 24 — so Pearson comes out of pure
    integer sums and one fixed chain of double ops (identical
    cross-engine, so even the top-20 ORDER is identical). At 100 TB
    the hour join keys on a 24-value domain per user pair — the real
    scale lever is the profile groupBy, map-side combined; the pair
    space is bounded by co-active users per bucket, the standard
    item-item similarity shape. Top-20 via TakeOrderedAndProject."""
    from ..ops import global_top_k

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 80)
    hod = (F.floor(F.col("ts").cast("double") / 3600) % 24).cast("bigint")
    prof = ev.groupBy("user_id", hod.alias("hod")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mom = prof.groupBy("user_id").agg(
        F.sum("c").alias("sx"), F.sum(F.col("c") * F.col("c")).alias("sxx")
    )
    a = prof.select(
        F.col("user_id").alias("ua"), "hod", F.col("c").alias("ca")
    )
    b = prof.select(
        F.col("user_id").alias("ub"), "hod", F.col("c").alias("cb")
    )
    sxy = (
        a.join(b, "hod")
        .filter(F.col("ua") < F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("sxy"))
    )
    ma = mom.select(
        F.col("user_id").alias("ua"),
        F.col("sx").alias("sxa"),
        F.col("sxx").alias("sxxa"),
    )
    mb = mom.select(
        F.col("user_id").alias("ub"),
        F.col("sx").alias("sxb"),
        F.col("sxx").alias("sxxb"),
    )
    r = (F.lit(24) * F.col("sxy") - F.col("sxa") * F.col("sxb")) / F.sqrt(
        (F.lit(24) * F.col("sxxa") - F.col("sxa") * F.col("sxa")).cast(
            "double"
        )
        * (F.lit(24) * F.col("sxxb") - F.col("sxb") * F.col("sxb")).cast(
            "double"
        )
    )
    scored = (
        sxy.join(F.broadcast(ma), "ua")
        .join(F.broadcast(mb), "ub")
        .withColumn("r", r)
    )
    return global_top_k(
        scored, [F.col("r").desc(), F.col("ua"), F.col("ub")], 20
    ).select("ua", "ub", F.round("r", 6).alias("pearson_r"))


@query(
    "assoc_rules_pairs",
    # Market-basket association over user "baskets" (the set of event
    # types a user ever performs): support / confidence / lift for
    # every type pair. Counts are exact ints; the three ratios are
    # fixed double chains. The pair space is C(|types|,2) = bounded.
    oracle="""
    WITH basket AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), n_users AS (
      SELECT count(DISTINCT user_id) AS nu FROM events
    ), item AS (
      SELECT event_type, count(*) AS n_item FROM basket GROUP BY 1
    ), pair AS (
      SELECT a.event_type AS ante, b.event_type AS cons, count(*) AS n_pair
      FROM basket a JOIN basket b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT ante, cons,
           CAST(n_pair AS BIGINT) AS n_pair,
           round(n_pair::DOUBLE / nu, 6) AS support,
           round(n_pair::DOUBLE / ia.n_item, 6) AS confidence,
           round(n_pair::DOUBLE * nu / (ia.n_item * ic.n_item), 6) AS lift
    FROM pair
    JOIN item ia ON ante = ia.event_type
    JOIN item ic ON cons = ic.event_type
    CROSS JOIN n_users
    """,
)
def assoc_rules_pairs(spark, sf_dir):
    """Association-rule mining at pair grain (the A-priori first
    pass): baskets = the distinct event types each user performs;
    emit support, confidence and lift for every co-occurring pair.
    Lift > 1 is the cross-sell / behavioral-coupling signal. Plan:
    one distinct (user, type) projection (map-side combinable), a
    user-keyed self-join whose per-user fan-out is bounded by
    |types|^2 (the small-domain side — for high-cardinality item
    domains the standard refinement is frequent-item pruning before
    the pair join, exactly the Bloom/CMS prefilter shape this engine
    already ships), then bounded pair aggregation with broadcast item
    counts and a broadcast 1-row user total. All counts integer-exact;
    ratios are single divisions."""
    ev = t(spark, sf_dir, "events")
    basket = ev.select("user_id", "event_type").distinct()
    n_users = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("nu")
    )
    item = basket.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item")
    )
    a = basket.select("user_id", F.col("event_type").alias("ante"))
    b = basket.select("user_id", F.col("event_type").alias("cons"))
    pair = (
        a.join(b, "user_id")
        .filter(F.col("ante") < F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    ia = item.select(
        F.col("event_type").alias("ante"), F.col("n_item").alias("na")
    )
    ic = item.select(
        F.col("event_type").alias("cons"), F.col("n_item").alias("nc")
    )
    return (
        pair.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(n_users))
        .select(
            "ante",
            "cons",
            "n_pair",
            F.round(F.col("n_pair") / F.col("nu"), 6).alias("support"),
            F.round(F.col("n_pair") / F.col("na"), 6).alias("confidence"),
            F.round(
                F.col("n_pair") * F.col("nu") / (F.col("na") * F.col("nc")), 6
            ).alias("lift"),
        )
    )


@query(
    "ts_burst_detection",
    # Burst detection on the hourly series per type: hours whose count
    # exceeds the Poisson 3-sigma gate (mean + 3*sqrt(mean), mean from
    # the type's own series). Integer counts -> exact moments; the
    # gate is one fixed double chain, so the flagged set is identical
    # cross-engine.
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type, sum(c) AS sc, count(*) AS nh
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, hr, CAST(c AS BIGINT) AS n_events,
           round(CAST(sc AS DOUBLE) / nh, 6) AS hourly_mean,
           round((c - CAST(sc AS DOUBLE) / nh)
                 / sqrt(CAST(sc AS DOUBLE) / nh), 4) AS poisson_z
    FROM hourly h JOIN m USING (event_type)
    WHERE c > CAST(sc AS DOUBLE) / nh
              + 3 * sqrt(CAST(sc AS DOUBLE) / nh)
    """,
)
def ts_burst_detection(spark, sf_dir):
    """Burst (anomaly) detection over event-rate series: flag hours
    whose count clears the Poisson 3-sigma gate mean + 3*sqrt(mean),
    with the z-score reported — the ops-monitoring primitive (traffic
    spikes, bot bursts, incident detection). One hour-grain groupBy
    (the only data-sized stage, map-side combined), per-type means as
    a broadcast |types|-row relation, and a codegen filter — no
    windows at all, so the plan is two shuffles bounded by (types x
    hours) and scale-independent of the raw event count. Counts are
    integers, so the gate arithmetic is deterministic cross-engine."""
    ev = t(spark, sf_dir, "events")
    hr = F.floor(F.col("ts").cast("double") / 3600).cast("bigint")
    hourly = ev.groupBy("event_type", hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    m = hourly.groupBy("event_type").agg(
        F.sum("c").alias("sc"), F.count(F.lit(1)).alias("nh")
    )
    mean = F.col("sc").cast("double") / F.col("nh")
    return (
        hourly.join(F.broadcast(m), "event_type")
        .filter(F.col("c") > mean + 3 * F.sqrt(mean))
        .select(
            "event_type",
            "hr",
            F.col("c").cast("bigint").alias("n_events"),
            F.round(mean, 6).alias("hourly_mean"),
            F.round((F.col("c") - mean) / F.sqrt(mean), 4).alias("poisson_z"),
        )
    )
