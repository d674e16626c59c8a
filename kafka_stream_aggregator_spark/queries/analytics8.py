"""Eighth analytics wave: relationally-unrolled k-means, hash-derived
permutation testing, MAD-robust anomaly flags, and SAX symbolization.

Determinism strategy:
- k-means unrolls EXACTLY TWO Lloyd iterations as relational algebra
  (no driver loop at all); assignment argmin compares ROUND-6 squared
  distances with a centroid-id tie-break, the same
  rounded-score-total-order device ml_naive_bayes proved;
- the permutation test replaces RNG with the portable 60-bit hash, so
  both engines materialize the identical 200 label reassignments;
- MAD flags and SAX breakpoints compare 0.5-granular-exact medians /
  round-6 normalized values against shared literals — never two
  independently-computed floats against each other.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sketches import portable_u64, portable_u64_sql
from .base import query, t

# --------------------------------------------------------------------------
# k-means, two Lloyd iterations, fully relational
# --------------------------------------------------------------------------

_KM_K = 8


@query(
    "emb_kmeans_2step_exact",
    # Two Lloyd iterations from a deterministic seed (the k lowest
    # vec_ids), unrolled as pure relational algebra so the WHOLE
    # computation — assignment, centroid update, re-assignment — is
    # replayed by this oracle. Assignment = argmin over round-6 squared
    # euclidean distance, centroid-id tie-break. Complements
    # emb_kmeans_clusters (the convergent driver-loop variant, self-
    # checked): this one is the exactly-verifiable fixed-depth core.
    oracle=f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    seed AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
        FROM v ORDER BY vec_id LIMIT {_KM_K}
    ),
    d1 AS (
        SELECT vec_id, cid,
               round(list_inner_product(v.v, v.v)
                     - 2 * list_inner_product(v.v, seed.v)
                     + list_inner_product(seed.v, seed.v), 6) AS d2,
               v.v AS vec
        FROM v CROSS JOIN seed
    ),
    a1 AS (
        SELECT vec_id, cid, vec
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cid) AS rn
              FROM d1)
        WHERE rn = 1
    ),
    flat AS (
        SELECT cid, generate_subscripts(vec, 1) AS dim, unnest(vec) AS x
        FROM a1
    ),
    c2 AS (
        SELECT cid, list(ax ORDER BY dim) AS v
        FROM (SELECT cid, dim, avg(x) AS ax FROM flat GROUP BY cid, dim)
        GROUP BY cid
    ),
    d2s AS (
        SELECT vec_id, cid,
               round(list_inner_product(v.v, v.v)
                     - 2 * list_inner_product(v.v, c2.v)
                     + list_inner_product(c2.v, c2.v), 6) AS d2
        FROM v CROSS JOIN c2
    ),
    a2 AS (
        SELECT vec_id, cid, d2
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, cid) AS rn
              FROM d2s)
        WHERE rn = 1
    )
    SELECT cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           round(avg(d2), 6) AS avg_dist2
    FROM a2 GROUP BY cid
    """,
)
def emb_kmeans_2step_exact(spark, sf_dir):
    """Fixed-depth k-means whose every step is relational: seed = k
    lowest vec_ids, assign (argmin round-6 dist2, cid tie-break),
    recompute centroids as per-dimension means, re-assign, report
    cluster sizes and mean squared distance. Plan: the centroid
    relation is bounded at k rows and BROADCAST into both assignment
    joins, so the fact table is never shuffled — the only exchanges
    are the k*64-cell centroid aggregations. The d2 expansion
    |v|^2 - 2<v,c> + |c|^2 keeps the fold per pair at one zip_with."""
    emb = t(spark, sf_dir, "embeddings")
    v = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    if emb.isEmpty():
        return spark.createDataFrame(
            [], "cluster_id long, n_members bigint, avg_dist2 double"
        )
    dim = len(v.first()["v"])

    seed = (
        v.orderBy("vec_id")
        .limit(_KM_K)
        .select(
            (
                F.row_number().over(W.orderBy("vec_id")) - 1
            ).cast("long").alias("cid"),
            F.col("v").alias("c"),
        )
    )

    def assign(cent):
        d = v.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "cid",
            "v",
            F.round(
                dot(F.col("v"), F.col("v"))
                - 2 * dot(F.col("v"), F.col("c"))
                + dot(F.col("c"), F.col("c")),
                6,
            ).alias("d2"),
        )
        rn = F.row_number().over(
            W.partitionBy("vec_id").orderBy("d2", "cid")
        )
        return d.withColumn("rn", rn).where(F.col("rn") == 1)

    a1 = assign(seed)
    c2 = a1.groupBy("cid").agg(
        F.array(*[F.avg(F.col("v")[i]) for i in range(dim)]).alias("c")
    )
    a2 = assign(c2)
    return a2.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.round(F.avg("d2"), 6).alias("avg_dist2"),
    )


# --------------------------------------------------------------------------
# Hash-derived permutation (randomization) test
# --------------------------------------------------------------------------

_PERM_B = 200


@query(
    "stat_permutation_test",
    # Monte-Carlo randomization test for mean(n_chars | lang='en') -
    # mean(n_chars | lang<>'en'): 200 label reassignments drawn NOT
    # from an RNG but from the portable hash (doc in perm b is 'A' iff
    # u64(doc_id:b:perm) < theta with theta = floor(2^60 * n_A / N)),
    # so both engines materialize the identical resamples and the
    # extreme-count is an exact integer. Label sizes are binomial
    # around n_A (documented Monte-Carlo variant — not the exact
    # hypergeometric resample, which would need a per-perm global
    # rank).
    oracle=f"""
    WITH d AS (
        SELECT doc_id, n_chars,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_a
        FROM documents
    ),
    obs AS (
        SELECT sum(CASE WHEN is_a = 1 THEN n_chars END)
                 / CAST(sum(is_a) AS DOUBLE)
               - sum(CASE WHEN is_a = 0 THEN n_chars END)
                 / CAST(count(*) - sum(is_a) AS DOUBLE) AS stat,
               CAST(floor(1152921504606846976.0 * sum(is_a) / count(*))
                    AS BIGINT) AS theta
        FROM d
    ),
    perms AS (
        SELECT b, doc_id, n_chars,
               CASE WHEN {portable_u64_sql("doc_id || ':' || b", "perm")}
                         < theta
                    THEN 1 ELSE 0 END AS pa
        FROM d CROSS JOIN obs CROSS JOIN
             (SELECT unnest(range(0, {_PERM_B})) AS b)
    ),
    ps AS (
        SELECT b,
               sum(CASE WHEN pa = 1 THEN n_chars END)
                 / CAST(nullif(sum(pa), 0) AS DOUBLE)
               - sum(CASE WHEN pa = 0 THEN n_chars END)
                 / CAST(nullif(count(*) - sum(pa), 0) AS DOUBLE) AS stat
        FROM perms GROUP BY b
    )
    SELECT round(any_value(obs.stat), 6) AS obs_diff,
           CAST(count(*) AS BIGINT) AS n_perms,
           CAST(sum(CASE WHEN abs(ps.stat) >= abs(obs.stat)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           round((1.0 + sum(CASE WHEN abs(ps.stat) >= abs(obs.stat)
                                 THEN 1 ELSE 0 END))
                 / (count(*) + 1.0), 6) AS p_value
    FROM ps CROSS JOIN obs
    """,
)
def stat_permutation_test(spark, sf_dir):
    """Randomization test via deterministic hash labels. Plan: the
    observed stat and theta form a 1-row broadcast; the perm relation
    is B x N rows but map-only (hash + comparison) feeding a B-group
    aggregate with map-side combine — embarrassingly parallel, no
    global sort, B bounds the blow-up explicitly. p = (1+extreme)/(B+1)
    per Phipson & Smyth."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (F.col("lang") == "en").cast("int").alias("is_a"),
    )
    obs = d.agg(
        (
            F.sum(F.when(F.col("is_a") == 1, F.col("n_chars")))
            / F.sum("is_a").cast("double")
            - F.sum(F.when(F.col("is_a") == 0, F.col("n_chars")))
            / (F.count(F.lit(1)) - F.sum("is_a")).cast("double")
        ).alias("stat"),
        F.floor(
            1152921504606846976.0
            * F.sum("is_a")
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("theta"),
    )
    perms = (
        d.crossJoin(F.broadcast(obs))
        .select(
            "doc_id",
            "n_chars",
            "stat",
            F.explode(
                F.sequence(F.lit(0), F.lit(_PERM_B - 1))
            ).alias("b"),
            "theta",
        )
        .withColumn(
            "pa",
            (
                portable_u64(
                    F.concat_ws(":", F.col("doc_id"), F.col("b")),
                    salt="perm",
                )
                < F.col("theta")
            ).cast("int"),
        )
    )
    ps = perms.groupBy("b").agg(
        (
            F.sum(F.when(F.col("pa") == 1, F.col("n_chars")))
            / F.nullif(F.sum("pa"), F.lit(0)).cast("double")
            - F.sum(F.when(F.col("pa") == 0, F.col("n_chars")))
            / F.nullif(
                F.count(F.lit(1)) - F.sum("pa"), F.lit(0)
            ).cast("double")
        ).alias("pstat"),
        F.first("stat").alias("stat"),
    )
    return ps.agg(
        F.round(F.first("stat"), 6).alias("obs_diff"),
        F.count(F.lit(1)).cast("bigint").alias("n_perms"),
        F.sum(
            (F.abs(F.col("pstat")) >= F.abs(F.col("stat"))).cast("long")
        )
        .cast("bigint")
        .alias("n_extreme"),
        F.round(
            (
                1.0
                + F.sum(
                    (
                        F.abs(F.col("pstat")) >= F.abs(F.col("stat"))
                    ).cast("long")
                )
            )
            / (F.count(F.lit(1)) + 1.0),
            6,
        ).alias("p_value"),
    )


# --------------------------------------------------------------------------
# MAD-robust daily anomaly flags
# --------------------------------------------------------------------------


@query(
    "diag_anomaly_mad",
    # Robust anomaly detection on daily event volumes: flag days where
    # |count - median| > 3 * 1.4826 * MAD, per event type. Counts are
    # ints, medians of ints are 0.5-granular-exact, so both engines
    # compare identical doubles against the same literal product.
    oracle="""
    WITH daily AS (
        SELECT event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    med AS (
        SELECT event_type, median(c) AS md FROM daily GROUP BY 1
    ),
    dev AS (
        SELECT d.event_type, d.day, d.c, md, abs(d.c - md) AS ad
        FROM daily d JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type, median(ad) AS mad FROM dev GROUP BY 1
    )
    SELECT dev.event_type, day, CAST(c AS BIGINT) AS n_events,
           round((c - md) / (1.4826 * nullif(mad, 0)), 6) AS robust_z,
           CASE WHEN mad > 0 AND abs(c - md) > 3 * 1.4826 * mad
                THEN TRUE ELSE FALSE END AS is_anomaly
    FROM dev JOIN mad USING (event_type)
    """,
)
def diag_anomaly_mad(spark, sf_dir):
    """Median/MAD daily volume anomalies per event type. The daily
    relation is bounded at |types| x |days|; both medians are exact
    percentiles over those bounded groups; everything after the first
    (map-side-combinable) count is broadcast algebra. The 3-sigma
    equivalent threshold uses the shared 1.4826 literal, never an
    engine-computed constant."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
    ).agg(F.count(F.lit(1)).alias("c"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(c, 0.5)").alias("md")
    )
    dev = daily.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("c") - F.col("md"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "day",
        F.col("c").cast("bigint").alias("n_events"),
        F.round(
            (F.col("c") - F.col("md"))
            / (1.4826 * F.nullif(F.col("mad"), F.lit(0.0))),
            6,
        ).alias("robust_z"),
        (
            (F.col("mad") > 0)
            & (F.col("ad") > 3 * 1.4826 * F.col("mad"))
        ).alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# SAX symbolization
# --------------------------------------------------------------------------

_SAX_W = 8


@query(
    "ts_sax_symbols",
    # Symbolic Aggregate approXimation (Lin et al. 2003) of each event
    # type's daily-count series: z-normalize, integer-boundary PAA into
    # 8 segments (segment = floor(rank*8/L) — no fractional weighting,
    # so segmentation is exact integer arithmetic), 4-symbol alphabet
    # at the N(0,1) quartile breakpoints +-0.6745/0. Binning compares
    # the ROUND-6 PAA mean against shared literals.
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               date_trunc('day', ts) AS day,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    st AS (
        SELECT event_type, count(*) AS l,
               avg(c) AS mu,
               stddev_pop(c) AS sd
        FROM daily GROUP BY 1
    ),
    rk AS (
        SELECT d.event_type, c, mu, sd, l,
               row_number() OVER (
                   PARTITION BY d.event_type ORDER BY day) - 1 AS i
        FROM daily d JOIN st USING (event_type)
    ),
    seg AS (
        SELECT event_type, l,
               CAST(floor(i * {_SAX_W} / l) AS BIGINT) AS s,
               avg((c - mu) / nullif(sd, 0)) AS z
        FROM rk GROUP BY event_type, l, CAST(floor(i * {_SAX_W} / l) AS BIGINT)
    ),
    sym AS (
        SELECT event_type, l, s,
               CASE WHEN round(z, 6) < -0.6745 THEN 'a'
                    WHEN round(z, 6) < 0.0 THEN 'b'
                    WHEN round(z, 6) < 0.6745 THEN 'c'
                    ELSE 'd' END AS ch
        FROM seg
    )
    SELECT event_type,
           CAST(any_value(l) AS BIGINT) AS series_len,
           string_agg(ch, '' ORDER BY s) AS sax
    FROM sym GROUP BY event_type
    """,
)
def ts_sax_symbols(spark, sf_dir):
    """SAX word per event type over its daily-volume series. The
    series relation is bounded (|types| x |days|); the per-type window
    orders a bounded partition (each type's day count), so the plan
    stays inside the partitioned-window invariant. PAA segmentation is
    pure integer floor arithmetic — both engines cut the series at
    identical boundaries regardless of float behavior."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    st = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("l"),
        F.avg("c").alias("mu"),
        F.stddev_pop("c").alias("sd"),
    )
    rk = daily.join(F.broadcast(st), "event_type").withColumn(
        "i",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("day")
        )
        - 1,
    )
    seg = (
        rk.withColumn(
            "s",
            F.floor(F.col("i") * _SAX_W / F.col("l")).cast("long"),
        )
        .groupBy("event_type", "l", "s")
        .agg(
            F.avg(
                (F.col("c") - F.col("mu"))
                / F.nullif(F.col("sd"), F.lit(0.0))
            ).alias("z")
        )
    )
    z6 = F.round(F.col("z"), 6)
    sym = seg.withColumn(
        "ch",
        F.when(z6 < -0.6745, "a")
        .when(z6 < 0.0, "b")
        .when(z6 < 0.6745, "c")
        .otherwise("d"),
    )
    return sym.groupBy("event_type").agg(
        F.first("l").cast("bigint").alias("series_len"),
        F.concat_ws(
            "", F.transform(F.array_sort(
                F.collect_list(F.struct("s", "ch"))
            ), lambda x: x["ch"])
        ).alias("sax"),
    )
