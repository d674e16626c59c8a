"""Third ML wave: exact k-NN classification, Markov next-event
evaluation, and top-percentile concentration.

Determinism strategy:
- k-NN neighbor order is (round-6 distance, vec_id) — the proven
  rounded-score total order — and the label vote is an integer
  majority with a label-asc tie-break;
- the Markov evaluation's argmax compares exact integer transition
  COUNTS (never probabilities), tie-broken by next-type asc;
- top-percentile contribution is pure integer rank + cent arithmetic
  from the distributed prefix sum.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..ops import distributed_global_rank
from .base import query, t

# --------------------------------------------------------------------------
# Exact k-NN classification over embeddings
# --------------------------------------------------------------------------

_KNN_K = 5


@query(
    "ml_knn_classifier",
    # Leave-one-out 5-NN classification of each vector's label from
    # its neighbors — the standard embedding-quality probe. Output is
    # the integer confusion matrix (true label x predicted label).
    # Neighbor order: (round-6 squared distance, vec_id); vote:
    # majority count, ties to the smaller label. The EVAL set is
    # BOUNDED to vec_id < 500 (the r11 class-1 lesson: an unbounded
    # eval set makes brute-force work quadratic in corpus size) — at
    # the driver gate tiers ALL 500 vectors qualify, so this is the
    # full LOO there; at sf5 it is 500 queries x the full corpus of
    # candidates, linear in corpus size. Squared norms are hoisted
    # per ROW (not per pair) on both engines with identical op order,
    # so d2 is bit-identical to the inline form.
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               list_inner_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])) AS n2
        FROM embeddings
    ),
    d AS (
        SELECT a.vec_id AS qid, a.label AS yt, b.label AS yn,
               round(a.n2 - 2 * list_inner_product(a.v, b.v) + b.n2,
                     6) AS d2,
               b.vec_id AS nid
        FROM v a JOIN v b ON a.vec_id <> b.vec_id
        WHERE a.vec_id < 500
    ),
    nn AS (
        SELECT qid, yt, yn
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY d2, nid) AS rn
              FROM d)
        WHERE rn <= {_KNN_K}
    ),
    vote AS (
        SELECT qid, yt, yn AS yp,
               row_number() OVER (
                   PARTITION BY qid
                   ORDER BY count(*) DESC, yn) AS vr
        FROM nn GROUP BY qid, yt, yn
    )
    SELECT yt AS true_label, yp AS pred_label,
           CAST(count(*) AS BIGINT) AS n
    FROM vote WHERE vr = 1
    GROUP BY yt, yp
    """,
)
def ml_knn_classifier(spark, sf_dir):
    """LOO 5-NN label prediction, reported as the confusion matrix.
    Plan: the id-bounded eval set (constant 500 rows beyond the gate
    tiers, where it IS the whole relation) broadcasts against ONE
    scan of the candidate corpus — linear in corpus size, never the
    all-pairs cross product; squared norms are computed once per row.
    Per-query neighbor rank under a PARTITIONED window, integer vote.
    At 100 TB the identical rank/vote tail runs on IVF-pruned
    candidates (ann_ivf_topk) instead of the full candidate scan —
    the vote semantics here are what that path shares."""
    emb = t(spark, sf_dir, "embeddings")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    v = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").alias("label"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("n2", dot(F.col("v"), F.col("v")))
    q = v.filter(F.col("vec_id") < 500).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("yt"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    d = v.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("qid")
    ).select(
        "qid",
        "yt",
        F.col("label").alias("yn"),
        F.col("vec_id").alias("nid"),
        F.round(
            F.col("qn2") - 2 * dot(F.col("qv"), F.col("v")) + F.col("n2"),
            6,
        ).alias("d2"),
    )
    nn = d.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("qid").orderBy("d2", "nid")),
    ).where(F.col("rn") <= _KNN_K)
    vote = (
        nn.groupBy("qid", "yt", "yn")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "vr",
            F.row_number().over(
                W.partitionBy("qid").orderBy(
                    F.col("c").desc(), F.col("yn")
                )
            ),
        )
        .where(F.col("vr") == 1)
    )
    return vote.groupBy(
        F.col("yt").alias("true_label"), F.col("yn").alias("pred_label")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))


# --------------------------------------------------------------------------
# Markov next-event prediction evaluation
# --------------------------------------------------------------------------


@query(
    "events_markov_eval",
    # Close the loop on ts_markov_transitions: predict each next event
    # type by the argmax TRANSITION COUNT from the current type
    # (integer argmax, next-type-asc tie-break) and measure accuracy
    # per current type. Model fit and evaluation in one relational
    # plan — the train/test leakage is deliberate (in-sample fit, the
    # standard first sanity check).
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    pairs AS (SELECT cur, nxt FROM seq WHERE nxt IS NOT NULL),
    tc AS (SELECT cur, nxt, count(*) AS c FROM pairs GROUP BY 1, 2),
    pred AS (
        SELECT cur, nxt AS p
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY cur ORDER BY c DESC, nxt) AS rn
              FROM tc)
        WHERE rn = 1
    )
    SELECT cur AS event_type,
           CAST(count(*) AS BIGINT) AS n_transitions,
           any_value(p) AS predicted_next,
           CAST(sum(CASE WHEN nxt = p THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           round(sum(CASE WHEN nxt = p THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pairs JOIN pred USING (cur)
    GROUP BY cur
    """,
)
def events_markov_eval(spark, sf_dir):
    """First-order Markov next-event accuracy per current type. One
    per-user lag window builds the transition stream; the count matrix
    is bounded at |types|^2 and its argmax is an integer comparison;
    the evaluation re-joins the broadcast 1-row-per-type predictor
    onto the same transition stream."""
    e = t(spark, sf_dir, "events")
    seq = e.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    pairs = seq.where(F.col("nxt").isNotNull()).select("cur", "nxt")
    tc = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    pred = (
        tc.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("cur").orderBy(
                    F.col("c").desc(), F.col("nxt")
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("p"))
    )
    return (
        pairs.join(F.broadcast(pred), "cur")
        .groupBy(F.col("cur").alias("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.first("p").alias("predicted_next"),
            F.sum((F.col("nxt") == F.col("p")).cast("long"))
            .cast("bigint")
            .alias("n_correct"),
            F.round(
                F.sum((F.col("nxt") == F.col("p")).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("accuracy"),
        )
    )


# --------------------------------------------------------------------------
# Top-percentile concentration
# --------------------------------------------------------------------------


@query(
    "agg_top_percentile_share",
    # Whale analysis: what share of total order value do the top 1% /
    # 5% / 10% of orders carry? Ranks from the distributed prefix sum
    # (never a single-reducer sort), shares as exact integer cent
    # ratios. The concentration view Gini compresses into one number,
    # kept as the three operational cut points.
    oracle="""
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    cell AS (
        SELECT cents, count(*) AS ct, sum(cents) AS sc
        FROM c GROUP BY cents
    ),
    ranked AS (
        SELECT cents, ct, sc,
               CAST(sum(ct) OVER (ORDER BY cents DESC ROWS BETWEEN
                    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS topn
        FROM cell
    ),
    tot AS (
        SELECT CAST(sum(ct) AS BIGINT) AS n,
               CAST(sum(sc) AS BIGINT) AS s
        FROM cell
    ),
    p AS (SELECT unnest([1, 5, 10]) AS pct)
    SELECT pct,
           CAST(((n * pct) // 100) AS BIGINT) AS n_top,
           CAST(sum(CASE WHEN topn <= (n * pct) // 100
                         THEN sc ELSE 0 END) AS BIGINT)
               AS top_cents,
           round(sum(CASE WHEN topn <= (n * pct) // 100
                          THEN sc ELSE 0 END)
                 / CAST(s AS DOUBLE), 6) AS share
    FROM ranked CROSS JOIN tot CROSS JOIN p
    GROUP BY pct, n, s
    """,
)
def agg_top_percentile_share(spark, sf_dir):
    """Top-k% value concentration. Distinct cent cells + the
    distributed prefix sum (descending via ascending rank subtraction
    is avoided — the prefix runs on the DESC order directly in the
    oracle; Spark ranks ascending and converts with n - below). The
    boundary is the exact integer n*pct//100; partial cells beyond the
    boundary are excluded on both sides identically (cell granularity,
    documented)."""
    c = t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    cell = c.groupBy("cents").agg(
        F.count(F.lit(1)).alias("ct"), F.sum("cents").alias("sc")
    )
    ranked = distributed_global_rank(
        cell, ["cents"], prefix_sums={"ct": "ft"}
    )
    # ft = cumulative count ascending INCLUSIVE; top-count of a cell
    # (itself + all strictly larger cells) = n - ft + ct
    tot = cell.agg(
        F.sum("ct").cast("bigint").alias("n"),
        F.sum("sc").cast("bigint").alias("s"),
    )
    j = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "topn", F.col("n") - F.col("ft") + F.col("ct")
    )
    p = spark.range(0, 3).select(
        F.element_at(
            F.array(F.lit(1), F.lit(5), F.lit(10)),
            (F.col("id") + 1).cast("int"),
        ).alias("pct")
    )
    jp = j.crossJoin(F.broadcast(p))
    cut = (F.col("n") * F.col("pct") / 100).cast("long")
    return jp.groupBy("pct", "n", "s").agg(
        F.sum(
            F.when(F.col("topn") <= cut, F.col("sc")).otherwise(0)
        )
        .cast("bigint")
        .alias("top_cents"),
        F.round(
            F.sum(
                F.when(F.col("topn") <= cut, F.col("sc")).otherwise(0)
            )
            / F.col("s").cast("double"),
            6,
        ).alias("share"),
    ).select(
        "pct",
        (F.col("n") * F.col("pct") / 100).cast("bigint").alias("n_top"),
        "top_cents",
        "share",
    )
