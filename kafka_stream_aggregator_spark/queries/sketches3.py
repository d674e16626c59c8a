"""Third sketch wave (round 7): theta-sketch set operations over KMV
signatures, Johnson-Lindenstrauss random projection, and per-edge
embeddedness.

Like every portable sketch here (sketches.py, sketches2.py), the
oracle REPLAYS the construction — same md5-derived 60-bit hashes, same
k-smallest selection — so the PROBABILISTIC behavior itself
(estimation error included) is hash-checked, not just the happy path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sketches import U64_SQL_TEMPLATE as U64
from ..sketches import portable_u64
from .base import query, t

THETA_K = 128
U60_MAX = 1152921504606846976  # 2^60: portable_u64 range


def _kmv_sql(side: str, etype: str) -> str:
    """DuckDB CTE body: the THETA_K smallest portable hashes of the
    distinct user set for one event type."""
    return f"""
      SELECT key, hv FROM (
        SELECT key, {U64.format(expr="(CAST(key AS VARCHAR) || ':theta')")}
                 AS hv
        FROM (SELECT DISTINCT user_id AS key FROM events
              WHERE event_type = '{etype}')
      ) ORDER BY hv, key LIMIT {THETA_K}
    """


@query(
    "sketch_theta_setops",
    # Theta-sketch algebra between the click and purchase user sets:
    # two KMV signatures (k=128), union / intersection / a-not-b
    # estimates against the exact values. theta = min of the two
    # k-th minima (2^60 when a side is in exact mode, i.e. |set| < k);
    # every element of either sketch below theta is RETAINED BY
    # CONSTRUCTION in both sketches, so membership tests against the
    # sketch are exact there — the standard theta-sketch guarantee.
    # All counts/hashes are exact integers; estimates are one double
    # chain each.
    oracle=f"""
    WITH a_all AS (
      SELECT DISTINCT user_id AS key FROM events WHERE event_type = 'click'
    ), b_all AS (
      SELECT DISTINCT user_id AS key FROM events WHERE event_type = 'purchase'
    ), kmv_a AS ({_kmv_sql('a', 'click')}),
    kmv_b AS ({_kmv_sql('b', 'purchase')}),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM a_all),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM b_all),
    ta AS (
      SELECT CASE WHEN (SELECT count(*) FROM kmv_a) >= {THETA_K}
                  THEN (SELECT max(hv) FROM kmv_a)
                  ELSE {U60_MAX} END AS theta_a
    ), tb AS (
      SELECT CASE WHEN (SELECT count(*) FROM kmv_b) >= {THETA_K}
                  THEN (SELECT max(hv) FROM kmv_b)
                  ELSE {U60_MAX} END AS theta_b
    ), th AS (
      SELECT least(theta_a, theta_b) AS theta FROM ta, tb
    ), inter_s AS (
      SELECT CAST(count(*) AS BIGINT) AS c_inter
      FROM kmv_a JOIN kmv_b USING (key), th
      WHERE kmv_a.hv < th.theta
    ), anotb_s AS (
      SELECT CAST(count(*) AS BIGINT) AS c_anotb
      FROM kmv_a, th
      WHERE kmv_a.hv < th.theta
        AND kmv_a.key NOT IN (SELECT key FROM kmv_b)
    ), ex AS (
      SELECT CAST((SELECT count(*) FROM a_all JOIN b_all USING (key))
                  AS BIGINT) AS exact_inter,
             CAST((SELECT count(*) FROM a_all
                   WHERE key NOT IN (SELECT key FROM b_all))
                  AS BIGINT) AS exact_anotb
    )
    SELECT
      n_a AS exact_a, n_b AS exact_b,
      round(CASE WHEN theta_a = {U60_MAX} THEN CAST(n_a AS DOUBLE)
                 ELSE ({THETA_K} - 1) * {U60_MAX}.0 / theta_a END, 6)
        AS est_a,
      round(CASE WHEN theta_b = {U60_MAX} THEN CAST(n_b AS DOUBLE)
                 ELSE ({THETA_K} - 1) * {U60_MAX}.0 / theta_b END, 6)
        AS est_b,
      exact_inter,
      round(c_inter * {U60_MAX}.0 / theta, 6) AS est_inter,
      exact_anotb,
      round(c_anotb * {U60_MAX}.0 / theta, 6) AS est_anotb
    FROM na, nb, ta, tb, th, inter_s, anotb_s, ex
    """,
)
def sketch_theta_setops(spark, sf_dir):
    """Theta-sketch union/intersect/difference: each KMV is a
    distributed k-smallest (TakeOrderedAndProject — never a global
    sort); every downstream relation is <= k rows, so the set algebra
    itself is broadcast-trivial. Mergeability (the 100 TB story):
    per-partition KMVs union by keeping the k smallest of the
    concatenation — same bound as sketch_kmv_jaccard."""
    ev = t(spark, sf_dir, "events")

    def side(etype):
        keys = (
            ev.filter(F.col("event_type") == etype)
            .select(F.col("user_id").alias("key"))
            .distinct()
        )
        kmv = (
            keys.withColumn("hv", portable_u64(F.col("key"), salt="theta"))
            .orderBy("hv", "key")
            .limit(THETA_K)
        )
        return keys, kmv

    a_all, kmv_a = side("click")
    b_all, kmv_b = side("purchase")

    na = a_all.agg(F.count("*").cast("bigint").alias("n_a"))
    nb = b_all.agg(F.count("*").cast("bigint").alias("n_b"))
    ta = kmv_a.agg(
        F.when(F.count("*") >= THETA_K, F.max("hv"))
        .otherwise(F.lit(U60_MAX))
        .alias("theta_a")
    )
    tb = kmv_b.agg(
        F.when(F.count("*") >= THETA_K, F.max("hv"))
        .otherwise(F.lit(U60_MAX))
        .alias("theta_b")
    )
    th = ta.crossJoin(tb).select(
        "theta_a", "theta_b", F.least("theta_a", "theta_b").alias("theta")
    )
    inter_s = (
        kmv_a.join(kmv_b.select("key"), "key")
        .crossJoin(F.broadcast(th.select("theta")))
        .filter(F.col("hv") < F.col("theta"))
        .agg(F.count("*").cast("bigint").alias("c_inter"))
    )
    anotb_s = (
        kmv_a.join(kmv_b.select("key"), "key", "left_anti")
        .crossJoin(F.broadcast(th.select("theta")))
        .filter(F.col("hv") < F.col("theta"))
        .agg(F.count("*").cast("bigint").alias("c_anotb"))
    )
    ex = (
        a_all.join(b_all, "key")
        .agg(F.count("*").cast("bigint").alias("exact_inter"))
        .crossJoin(
            a_all.join(b_all, "key", "left_anti").agg(
                F.count("*").cast("bigint").alias("exact_anotb")
            )
        )
    )
    big = F.lit(float(U60_MAX))
    return (
        na.crossJoin(nb)
        .crossJoin(th)
        .crossJoin(inter_s)
        .crossJoin(anotb_s)
        .crossJoin(ex)
        .select(
            F.col("n_a").alias("exact_a"),
            F.col("n_b").alias("exact_b"),
            F.round(
                F.when(
                    F.col("theta_a") == U60_MAX, F.col("n_a").cast("double")
                ).otherwise((THETA_K - 1) * big / F.col("theta_a")),
                6,
            ).alias("est_a"),
            F.round(
                F.when(
                    F.col("theta_b") == U60_MAX, F.col("n_b").cast("double")
                ).otherwise((THETA_K - 1) * big / F.col("theta_b")),
                6,
            ).alias("est_b"),
            "exact_inter",
            F.round(F.col("c_inter") * big / F.col("theta"), 6).alias(
                "est_inter"
            ),
            "exact_anotb",
            F.round(F.col("c_anotb") * big / F.col("theta"), 6).alias(
                "est_anotb"
            ),
        )
    )


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss sign random projection
# --------------------------------------------------------------------------

JL_DIMS = 16


@query(
    "emb_random_projection",
    # JL projection to 16 dims with a +-1 sign matrix derived from the
    # portable hash of 'j:d' — both engines rebuild the identical
    # matrix, project with an index-ordered dot product
    # (list_dot_product / F.aggregate — the proven-identical fold
    # pair), and report the squared-norm preservation ratio
    # ||Pv||^2 / (m * ||v||^2), the quantity JL bounds around 1.
    oracle=f"""
    WITH sgn AS (
      SELECT j, list(s ORDER BY d) AS srow FROM (
        SELECT j.j, d.d,
               CASE WHEN {U64.format(expr="(CAST(j.j AS VARCHAR) || ':' || CAST(d.d AS VARCHAR) || ':jl')")}
                    % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
        FROM generate_series(0, {JL_DIMS - 1}) j(j)
        CROSS JOIN generate_series(0, 63) d(d)
      ) GROUP BY j
    ), smat AS (
      SELECT list(srow ORDER BY j) AS rows FROM sgn
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), p AS (
      SELECT vec_id, v,
             list_transform(smat.rows, r -> list_dot_product(v, r)) AS proj
      FROM v, smat
    )
    SELECT vec_id,
           round(proj[1], 6) AS p0,
           round(proj[2], 6) AS p1,
           round(list_dot_product(proj, proj)
                 / ({JL_DIMS} * list_dot_product(v, v)), 6) AS norm_ratio
    FROM p
    """,
)
def emb_random_projection(spark, sf_dir):
    """JL sign projection: the 16 x 64 sign matrix is built ONCE as a
    bounded relation and broadcast as a single nested-array row; the
    projection is a map-only in-row pass — zero shuffles over the
    vectors, the shape that projects 100 TB of embeddings in one
    scan."""
    spark_u = spark
    jd = (
        spark_u.range(JL_DIMS)
        .select(F.col("id").alias("j"))
        .crossJoin(spark_u.range(64).select(F.col("id").alias("d")))
    )
    s = jd.select(
        "j",
        "d",
        F.when(
            portable_u64(
                F.concat_ws(":", F.col("j"), F.col("d")), salt="jl"
            )
            % 2
            == 0,
            F.lit(1.0),
        )
        .otherwise(F.lit(-1.0))
        .alias("s"),
    )
    sgn = s.groupBy("j").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "s"))), lambda x: x["s"]
        ).alias("srow")
    )
    smat = sgn.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "srow"))),
            lambda x: x["srow"],
        ).alias("rows")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    v = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    p = v.join(F.broadcast(smat)).select(
        "vec_id",
        "v",
        F.transform(F.col("rows"), lambda r: dot(F.col("v"), r)).alias("proj"),
    )
    return p.select(
        "vec_id",
        F.round(F.col("proj")[0], 6).alias("p0"),
        F.round(F.col("proj")[1], 6).alias("p1"),
        F.round(
            dot(F.col("proj"), F.col("proj"))
            / (F.lit(JL_DIMS) * dot(F.col("v"), F.col("v"))),
            6,
        ).alias("norm_ratio"),
    )


# --------------------------------------------------------------------------
# Per-edge embeddedness (common neighbors + Jaccard of adjacent pairs)
# --------------------------------------------------------------------------


@query(
    "graph_edge_embeddedness",
    # For every EDGE of the co-occurrence graph (graph2's construction):
    # the number of common neighbors (embeddedness) and the neighbor
    # Jaccard cn / (deg_a + deg_b - 2 - cn) — endpoints excluded from
    # each other's sets. CN and degrees are exact integers; one double
    # division per edge.
    oracle="""
    WITH e AS (
      SELECT DISTINCT a.user_id AS ua, b2.user_id AS ub
      FROM (SELECT DISTINCT user_id, event_type,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS w
            FROM events WHERE user_id < 120) a
      JOIN (SELECT DISTINCT user_id, event_type,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS w
            FROM events WHERE user_id < 120) b2
        ON a.event_type = b2.event_type AND a.w = b2.w
       AND a.user_id < b2.user_id
    ), adj AS (
      SELECT ua AS x, ub AS y FROM e
      UNION ALL SELECT ub AS x, ua AS y FROM e
    ), deg AS (
      SELECT x AS v, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY x
    ), wedge AS (
      SELECT a1.x AS ua, a2.x AS ub, CAST(count(*) AS BIGINT) AS cn
      FROM adj a1 JOIN adj a2 ON a1.y = a2.y AND a1.x < a2.x
      GROUP BY a1.x, a2.x
    )
    SELECT e.ua, e.ub,
           CAST(coalesce(w.cn, 0) AS BIGINT) AS cn,
           round(CASE WHEN da.d + db.d - 2 - coalesce(w.cn, 0) = 0 THEN 0.0
                      ELSE coalesce(w.cn, 0)
                           / CAST(da.d + db.d - 2 - coalesce(w.cn, 0)
                                  AS DOUBLE) END, 6) AS jaccard
    FROM e
    LEFT JOIN wedge w ON e.ua = w.ua AND e.ub = w.ub
    JOIN deg da ON e.ua = da.v
    JOIN deg db ON e.ub = db.v
    """,
)
def graph_edge_embeddedness(spark, sf_dir):
    """Edge embeddedness: the wedge join is vertex-keyed (quadratic in
    center degree — the textbook exact-CN cost, celebrity-capped in
    production per graph2's notes); degree joins broadcast the bounded
    degree relation. Cited: graph2._EDGE_SQL construction."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 120)
    cell = F.floor(F.col("ts").cast("double") / 300).cast("bigint")
    b = ev.select("user_id", "event_type", cell.alias("w")).distinct()
    a1 = b.select(F.col("user_id").alias("ua"), "event_type", "w")
    a2 = b.select(F.col("user_id").alias("ub"), "event_type", "w")
    e = (
        a1.join(a2, ["event_type", "w"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )
    adj = e.select(F.col("ua").alias("x"), F.col("ub").alias("y")).unionAll(
        e.select(F.col("ub").alias("x"), F.col("ua").alias("y"))
    )
    deg = adj.groupBy(F.col("x").alias("v")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    w1 = adj.select(F.col("x").alias("wa"), "y")
    w2 = adj.select(F.col("x").alias("wb"), "y")
    wedge = (
        w1.join(w2, "y")
        .filter(F.col("wa") < F.col("wb"))
        .groupBy("wa", "wb")
        .agg(F.count("*").cast("bigint").alias("cn"))
    )
    out = (
        e.join(
            wedge,
            (e["ua"] == wedge["wa"]) & (e["ub"] == wedge["wb"]),
            "left",
        )
        .join(F.broadcast(deg.select(F.col("v").alias("ua"), F.col("d").alias("da"))), "ua")
        .join(F.broadcast(deg.select(F.col("v").alias("ub"), F.col("d").alias("db"))), "ub")
        .select(
            "ua",
            "ub",
            F.coalesce("cn", F.lit(0)).cast("bigint").alias("cn"),
        F.col("da").alias("da"),
            F.col("db").alias("db"),
        )
    )
    den = F.col("da") + F.col("db") - 2 - F.col("cn")
    return out.select(
        "ua",
        "ub",
        "cn",
        F.round(
            F.when(den == 0, F.lit(0.0)).otherwise(
                F.col("cn") / den.cast("double")
            ),
            6,
        ).alias("jaccard"),
    )
