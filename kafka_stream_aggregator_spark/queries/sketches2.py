"""Sketch-suite wave 2: query-planning estimators — CMS inner-product
join-cardinality estimation, KMV (k-minimum-values) distinct/Jaccard
estimation, and the AMS second-frequency-moment (self-join size)
estimator. These are the statistics a distributed optimizer consults
before committing to a join strategy; at 100 TB each replaces an
exact computation (which is also produced here, purely to exhibit the
bounds) with a bounded-size summary.

Every oracle REPLAYS the sketch construction exactly (portable
md5-derived 60-bit hash, the queries/sketches.py discipline), so even
the estimation error must match bit-for-bit. All sketch state is
integer; ratios are single final double chains.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sketches import (
    U64_SQL_TEMPLATE as U64,
    cms_build,
    portable_u64,
)
from .base import query, t

CMS_D = 4
CMS_W = 512
KMV_K = 256
AMS_D = 8

_ROW_SEEDED = "CAST({key} AS VARCHAR) || ':' || CAST(i AS VARCHAR)"


@query(
    "diag_join_size_sketch",
    # |orders ⋈ events ON o_custkey = user_id| estimated from two
    # Count-Min sketches via the classic inner-product bound:
    # est = min over hash rows of Σ_cell cntA·cntB ≥ true size
    # (colliding keys only ever ADD mass). The oracle replays both
    # d=4 × w=512 sketches cell-exactly; absent (row,cell) pairs are
    # zero on both engines via a generated row spine + coalesce.
    oracle=f"""
    WITH a AS (
      SELECT i AS rw,
             {U64.format(expr=_ROW_SEEDED.format(key="o_custkey"))}
               % {CMS_W} AS cell,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders, unnest(range(0, {CMS_D})) AS u(i) GROUP BY 1, 2
    ), b AS (
      SELECT i AS rw,
             {U64.format(expr=_ROW_SEEDED.format(key="user_id"))}
               % {CMS_W} AS cell,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events, unnest(range(0, {CMS_D})) AS u(i) GROUP BY 1, 2
    ), dots AS (
      SELECT s.rw,
             coalesce(sum(a.cnt * b.cnt), 0) AS dot
      FROM unnest(range(0, {CMS_D})) AS s(rw)
      LEFT JOIN a ON a.rw = s.rw
      LEFT JOIN b ON b.rw = a.rw AND b.cell = a.cell
      GROUP BY s.rw
    ), exact AS (
      SELECT coalesce(sum(oc.n * ec.n), 0) AS true_size
      FROM (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1) oc
      JOIN (SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1) ec
        USING (k)
    )
    SELECT CAST(min(dot) AS BIGINT) AS est_join_size,
           CAST(max(true_size) AS BIGINT) AS exact_join_size,
           round(CASE WHEN max(true_size) > 0
                 THEN min(dot) / CAST(max(true_size) AS DOUBLE) END, 6)
             AS over_ratio
    FROM dots CROSS JOIN exact
    """,
)
def diag_join_size_sketch(spark, sf_dir):
    """Join-cardinality estimation from two Count-Min sketches — the
    pre-join planner statistic ("will orders ⋈ events explode?")
    computed WITHOUT running the join. Plan: each build is one
    d-explode + groupBy bounded at d·w cells (map-side combine); the
    dot products join two ≤2048-row relations on a generated d-row
    spine so missing rows count as zero; the exact side (two key
    groupBys + a key join) exists only to exhibit est ≥ true and is
    exactly what production would skip. CMS guarantee pinned in
    tests/test_sketches2.py."""
    o = t(spark, sf_dir, "orders")
    ev = t(spark, sf_dir, "events")
    a = cms_build(o, "o_custkey", CMS_D, CMS_W)
    b = cms_build(ev, "user_id", CMS_D, CMS_W)
    spine = spark.range(CMS_D).select(F.col("id").alias("row"))
    prods = a.join(
        b.withColumnRenamed("cnt", "cnt_b"), ["row", "cell"]
    ).groupBy("row").agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("dot"))
    dots = spine.join(F.broadcast(prods), "row", "left").select(
        F.coalesce("dot", F.lit(0)).alias("dot")
    )
    oc = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    ec = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("n_e")
    )
    exact = oc.join(ec, "k").agg(
        F.coalesce(F.sum(F.col("n") * F.col("n_e")), F.lit(0)).alias(
            "true_size"
        )
    )
    return dots.crossJoin(F.broadcast(exact)).agg(
        F.min("dot").cast("bigint").alias("est_join_size"),
        F.max("true_size").cast("bigint").alias("exact_join_size"),
        F.round(
            F.when(
                F.max("true_size") > 0,
                F.min("dot") / F.max("true_size").cast("double"),
            ),
            6,
        ).alias("over_ratio"),
    )


@query(
    "sketch_kmv_jaccard",
    # K-minimum-values signature over the UNION of two key sets
    # (customers that ordered vs all customers): the k smallest
    # portable hashes of the union, with per-element membership flags.
    # est_jaccard = |minima in both| / |minima|; est distinct union
    # = (k-1)·2^60 / h_(k). Exact values computed beside them. The
    # oracle replays the identical hash order, so the SPECIFIC minima
    # (and thus the estimates, errors included) must match.
    oracle=f"""
    WITH a AS (
      SELECT DISTINCT o_custkey AS key FROM orders
    ), b AS (
      SELECT DISTINCT c_custkey AS key FROM customer
    ), u AS (
      SELECT coalesce(a.key, b.key) AS key,
             a.key IS NOT NULL AS ina, b.key IS NOT NULL AS inb
      FROM a FULL OUTER JOIN b ON a.key = b.key
    ), h AS (
      SELECT key, ina, inb,
             {U64.format(expr="CAST(key AS VARCHAR)")} AS hv
      FROM u
    ), mins AS (
      SELECT * FROM h ORDER BY hv, key LIMIT {KMV_K}
    ), ex AS (
      SELECT CAST(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_inter,
             CAST(count(*) AS BIGINT) AS n_union
      FROM u
    )
    SELECT CAST(count(*) AS BIGINT) AS n_kmv,
           round(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS est_jaccard,
           round(max(n_inter) / CAST(max(n_union) AS DOUBLE), 6)
             AS exact_jaccard,
           round((count(*) - 1) * 1152921504606846976.0 / max(hv), 6)
             AS est_union_distinct,
           CAST(max(n_union) AS BIGINT) AS exact_union_distinct
    FROM mins CROSS JOIN ex
    """,
)
def sketch_kmv_jaccard(spark, sf_dir):
    """KMV distinct/Jaccard estimation between the ordered-customer
    key set and the full customer key set — the mergeable set-overlap
    summary (two KMV signatures union by keeping the k smallest of
    their concatenation). Plan: one distinct per side, a full outer
    join for membership flags, then a distributed k-smallest
    (TakeOrderedAndProject — never a global sort) over the hashed
    union; every aggregate after that runs on ≤k rows. Estimates and
    exact values emitted side by side; the KMV error bound is pinned
    in tests/test_sketches2.py."""
    a = (
        t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
        .withColumn("ina", F.lit(True))
    )
    b = (
        t(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("key"))
        .distinct()
        .withColumn("inb", F.lit(True))
    )
    u = (
        a.join(b, "key", "full_outer")
        .select(
            "key",
            F.coalesce("ina", F.lit(False)).alias("ina"),
            F.coalesce("inb", F.lit(False)).alias("inb"),
        )
    )
    h = u.withColumn("hv", portable_u64(F.col("key")))
    mins = h.orderBy("hv", "key").limit(KMV_K)
    ex = u.agg(
        F.sum(
            F.when(F.col("ina") & F.col("inb"), 1).otherwise(0)
        ).cast("bigint").alias("n_inter"),
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
    )
    inter_flag = F.when(F.col("ina") & F.col("inb"), 1).otherwise(0)
    return mins.crossJoin(F.broadcast(ex)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kmv"),
        F.round(
            F.sum(inter_flag) / F.count(F.lit(1)).cast("double"), 6
        ).alias("est_jaccard"),
        F.round(
            F.max("n_inter") / F.max("n_union").cast("double"), 6
        ).alias("exact_jaccard"),
        F.round(
            (F.count(F.lit(1)) - 1)
            * F.lit(1152921504606846976.0)
            / F.max("hv"),
            6,
        ).alias("est_union_distinct"),
        F.max("n_union").cast("bigint").alias("exact_union_distinct"),
    )


@query(
    "sketch_ams_f2",
    # AMS (Alon-Matias-Szegedy) estimator of the second frequency
    # moment F2 = Σ_k f_k² of event user activity — the self-join
    # size. d=8 independent ±1 sign functions from the portable hash;
    # Z_i = Σ_k f_k·s(k,i); est = mean(Z_i²), an unbiased estimator.
    # Everything through Z_i² is exact integer; est = Σ Z²/8 is an
    # exact power-of-two division. Oracle replays the signs exactly.
    oracle=f"""
    WITH freq AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS f
      FROM events GROUP BY user_id
    ), z AS (
      SELECT i,
             coalesce(sum(f * (1 - 2 * (
               {U64.format(expr=_ROW_SEEDED.format(key="user_id"))} % 2
             ))), 0) AS zi
      FROM freq, unnest(range(0, {AMS_D})) AS u(i)
      GROUP BY i
    ), ex AS (
      SELECT coalesce(sum(f * f), 0) AS f2 FROM freq
    )
    SELECT round(sum(zi * zi) / {AMS_D}.0, 6) AS est_f2,
           CAST(max(f2) AS BIGINT) AS exact_f2,
           round(CASE WHEN max(f2) > 0
                 THEN sum(zi * zi) / {AMS_D}.0 / max(f2) END, 6)
             AS est_over_exact
    FROM z CROSS JOIN ex
    """,
)
def sketch_ams_f2(spark, sf_dir):
    """AMS F2 (self-join size) estimation over event user activity —
    the skew statistic a planner wants before a self-join or a
    groupBy on a possibly-degenerate key. Plan: one key groupBy on
    the fact (the relation a production system keeps anyway), then an
    8-way explode of the BOUNDED frequency relation into signed sums
    — d rows of integer state; the exact F2 comes from the same
    frequency relation. Unbiasedness (mean over many sign seeds →
    F2) is pinned in tests/test_sketches2.py."""
    ev = t(spark, sf_dir, "events")
    freq = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("f"))
    sign = 1 - 2 * (
        portable_u64(
            F.concat(
                F.col("user_id").cast("string"),
                F.lit(":"),
                F.col("i").cast("string"),
            )
        )
        % 2
    )
    z = (
        freq.select(
            "user_id",
            "f",
            F.explode(F.array(*[F.lit(i) for i in range(AMS_D)])).alias("i"),
        )
        .groupBy("i")
        .agg(F.coalesce(F.sum(F.col("f") * sign), F.lit(0)).alias("zi"))
    )
    ex = freq.agg(
        F.coalesce(F.sum(F.col("f") * F.col("f")), F.lit(0)).alias("f2")
    )
    return z.crossJoin(F.broadcast(ex)).agg(
        F.round(F.sum(F.col("zi") * F.col("zi")) / F.lit(float(AMS_D)), 6)
        .alias("est_f2"),
        F.max("f2").cast("bigint").alias("exact_f2"),
        F.round(
            F.when(
                F.max("f2") > 0,
                F.sum(F.col("zi") * F.col("zi"))
                / F.lit(float(AMS_D))
                / F.max("f2"),
            ),
            6,
        ).alias("est_over_exact"),
    )
