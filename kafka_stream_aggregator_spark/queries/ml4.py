"""Fourth ML wave: nearest-centroid classification, Zipf's-law
fitting, and Cronbach's alpha.

Determinism strategy:
- centroid assignment uses the proven round-6-distance + label
  tie-break argmin; centroids are per-label means whose accumulation
  ulps sit far below the rounding grain;
- the Zipf fit ranks the vocabulary with the distributed prefix-sum
  rank (integer ranks) and runs closed-form OLS on (ln rank, ln freq)
  — both logs of exact integers;
- Cronbach's alpha is pure moment algebra over three integer-valued
  per-doc metrics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ops import distributed_global_rank
from .base import query, t

# --------------------------------------------------------------------------
# Nearest-centroid (Rocchio) classification
# --------------------------------------------------------------------------


@query(
    "emb_centroid_classifier",
    # Rocchio: per-label mean vectors, every vector assigned to its
    # nearest centroid (round-6 squared distance, label tie-break),
    # reported as the integer confusion matrix — the fastest
    # embedding-space sanity classifier, one broadcast join where k-NN
    # needs a candidate search.
    oracle="""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ),
    flat AS (
        SELECT label, generate_subscripts(v, 1) AS dim, unnest(v) AS x
        FROM v
    ),
    cent AS (
        SELECT label AS c_label, list(ax ORDER BY dim) AS c
        FROM (SELECT label, dim, avg(x) AS ax
              FROM flat GROUP BY label, dim)
        GROUP BY label
    ),
    d AS (
        SELECT vec_id, label, c_label,
               round(list_inner_product(v.v, v.v)
                     - 2 * list_inner_product(v.v, cent.c)
                     + list_inner_product(cent.c, cent.c), 6) AS d2
        FROM v CROSS JOIN cent
    ),
    a AS (
        SELECT vec_id, label, c_label
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY d2, c_label) AS rn
              FROM d)
        WHERE rn = 1
    )
    SELECT label AS true_label, c_label AS pred_label,
           CAST(count(*) AS BIGINT) AS n
    FROM a GROUP BY label, c_label
    """,
)
def emb_centroid_classifier(spark, sf_dir):
    """Nearest-centroid confusion matrix. The centroid relation is
    bounded at |labels| rows (k x dim aggregate) and BROADCAST into a
    map-only assignment — the shape that classifies 100 TB of vectors
    in one pass, which is why Rocchio is the standard first probe
    before k-NN's candidate search."""
    emb = t(spark, sf_dir, "embeddings")
    v = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    if emb.isEmpty():
        return spark.createDataFrame(
            [], "true_label int, pred_label int, n bigint"
        )
    dim = len(v.first()["v"])
    cent = v.groupBy(F.col("label").alias("c_label")).agg(
        F.array(*[F.avg(F.col("v")[i]) for i in range(dim)]).alias("c")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    from pyspark.sql import Window as W

    d = v.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "c_label",
        F.round(
            dot(F.col("v"), F.col("v"))
            - 2 * dot(F.col("v"), F.col("c"))
            + dot(F.col("c"), F.col("c")),
            6,
        ).alias("d2"),
    )
    a = d.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("vec_id").orderBy("d2", "c_label")
        ),
    ).where(F.col("rn") == 1)
    return a.groupBy(
        F.col("label").alias("true_label"),
        F.col("c_label").alias("pred_label"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


# --------------------------------------------------------------------------
# Zipf's-law fit
# --------------------------------------------------------------------------


@query(
    "doc_zipf_fit",
    # Zipf exponent by OLS on (ln rank, ln freq) over the full
    # vocabulary — the companion diagnostic to corpus_heaps_fit.
    # Ranks are exact integers from the distributed prefix-sum rank
    # (freq desc, word asc); slope/intercept are one closed-form chain
    # over moment sums of logs-of-integers.
    oracle="""
    WITH vc AS (
        SELECT word, count(*) AS c
        FROM (SELECT unnest(regexp_extract_all(lower(trim(text)),
                                               '\\S+')) AS word
              FROM documents)
        GROUP BY word
    ),
    rk AS (
        SELECT c, row_number() OVER (ORDER BY c DESC, word) AS r
        FROM vc
    ),
    m AS (
        SELECT count(*) AS n,
               sum(ln(CAST(r AS DOUBLE))) AS sx,
               sum(ln(CAST(c AS DOUBLE))) AS sy,
               sum(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))) AS sxx,
               sum(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))) AS sxy
        FROM rk
    )
    SELECT CAST(n AS BIGINT) AS vocab_size,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
               AS zipf_slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                 / n, 6) AS intercept
    FROM m
    """,
)
def doc_zipf_fit(spark, sf_dir):
    """Zipf slope of the corpus vocabulary (healthy natural text:
    ~-1). Plan: one tokenize-explode into the vocabulary count
    relation, rank via the distributed two-phase rank (no
    single-reducer sort over the vocabulary — millions of rows at web
    scale), one moment aggregate, closed-form OLS. The float moment
    sums sit under round-6 as in corpus_heaps_fit."""
    d = t(spark, sf_dir, "documents")
    vc = (
        d.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # rank by freq desc, word asc == rank by (-c, word) ascending
    rk = distributed_global_rank(
        vc.select("word", "c", (-F.col("c")).alias("negc")),
        ["negc", "word"],
        rank_col="r",
    )
    lr = F.log(F.col("r").cast("double"))
    lc = F.log(F.col("c").cast("double"))
    m = rk.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lr).alias("sx"),
        F.sum(lc).alias("sy"),
        F.sum(lr * lr).alias("sxx"),
        F.sum(lr * lc).alias("sxy"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return m.select(
        F.col("n").cast("bigint").alias("vocab_size"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
    )


# --------------------------------------------------------------------------
# Cronbach's alpha
# --------------------------------------------------------------------------


@query(
    "stat_cronbach_alpha",
    # Internal-consistency reliability of a 3-item "document quality
    # scale": items = n_words, distinct words, chars-per-10 (integer
    # metrics on the same scale class). alpha = k/(k-1) *
    # (1 - sum(var_i)/var(total)) with POPULATION variances over exact
    # integer items — one moment aggregate, one identical chain.
    oracle="""
    WITH it AS (
        SELECT len(regexp_extract_all(lower(trim(text)), '\\S+')) AS i1,
               len(list_distinct(regexp_extract_all(
                   lower(trim(text)), '\\S+'))) AS i2,
               n_chars // 10 AS i3
        FROM documents
    ),
    m AS (
        SELECT count(*) AS n,
               avg(CAST(i1 AS DOUBLE)) AS m1, var_pop(i1) AS v1,
               avg(CAST(i2 AS DOUBLE)) AS m2, var_pop(i2) AS v2,
               avg(CAST(i3 AS DOUBLE)) AS m3, var_pop(i3) AS v3,
               var_pop(i1 + i2 + i3) AS vt
        FROM it
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           round(v1 + v2 + v3, 6) AS sum_item_var,
           round(vt, 6) AS total_var,
           round(3.0 / 2.0 * (1.0 - (v1 + v2 + v3) / vt), 6)
               AS cronbach_alpha
    FROM m
    """,
)
def stat_cronbach_alpha(spark, sf_dir):
    """Cronbach's alpha over three integer document-size items — the
    scale-reliability statistic, computed in ONE map-side-combinable
    moment aggregate (variances of ints are exact sums under the
    double grain). alpha near 1 = the items measure the same
    construct, which size metrics do."""
    d = t(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
    )
    it = d.select(
        F.size(ws).cast("long").alias("i1"),
        F.size(F.array_distinct(ws)).cast("long").alias("i2"),
        F.floor(F.col("n_chars") / 10).cast("long").alias("i3"),
    )
    m = it.agg(
        F.count(F.lit(1)).alias("n"),
        F.var_pop("i1").alias("v1"),
        F.var_pop("i2").alias("v2"),
        F.var_pop("i3").alias("v3"),
        F.var_pop(F.col("i1") + F.col("i2") + F.col("i3")).alias("vt"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(F.col("v1") + F.col("v2") + F.col("v3"), 6).alias(
            "sum_item_var"
        ),
        F.round(F.col("vt"), 6).alias("total_var"),
        F.round(
            3.0
            / 2.0
            * (
                1.0
                - (F.col("v1") + F.col("v2") + F.col("v3"))
                / F.col("vt")
            ),
            6,
        ).alias("cronbach_alpha"),
    )
