"""Seventh analytics wave: distribution entropy, Brown-Forsythe
variance-equality testing, CDC snapshot diffing, and MMR-diversified
top-k retrieval.

Determinism strategy:
- entropy / Brown-Forsythe follow the proven moments pattern: exact
  integer (or 0.5-granular) count relations first, one float transform
  at the end, round-6;
- the snapshot diff converts DOUBLE prices to integer CENTS up front
  (round(p*100) is bit-identical across engines on identical parquet
  doubles), so every delta aggregate is exact BIGINT arithmetic;
- MMR is inherently iterative (each pick changes the next penalty), so
  it registers oracle=None like BPE; the pytest replay re-runs the
  identical fold order in pure Python and pins exact selection
  equality, and the argmax compares ROUND-6 scores with a vec_id
  tie-break so the pick is stable under accumulation-order ulps.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t

# --------------------------------------------------------------------------
# Shannon entropy of a per-group categorical distribution
# --------------------------------------------------------------------------


@query(
    "agg_group_entropy",
    # Per event_type: Shannon entropy (nats) of its hour-of-day
    # histogram — the "is this event type bursty or uniform" signal.
    # entropy = ln(N) - sum(c*ln(c))/N over the exact integer counts;
    # the (type, hour) relation is bounded at |types| * 24 rows.
    oracle="""
    WITH h AS (
        SELECT event_type,
               CAST(extract(hour FROM ts) AS BIGINT) AS hr,
               count(*) AS c
        FROM events
        GROUP BY event_type, hr
    )
    SELECT event_type,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_hours,
           round(ln(CAST(sum(c) AS DOUBLE))
                 - sum(c * ln(CAST(c AS DOUBLE)))
                   / CAST(sum(c) AS DOUBLE), 6) AS entropy_nats
    FROM h
    GROUP BY event_type
    """,
)
def agg_group_entropy(spark, sf_dir):
    """Hour-of-day entropy per event type. Two groupBys, the second
    over a relation bounded at |event_types| x 24 rows — the first is
    the only fact-sized shuffle and it map-side combines. The entropy
    identity ln(N) - sum(c ln c)/N needs no probability column, so the
    float appears exactly once per output row."""
    e = t(spark, sf_dir, "events")
    h = e.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    return h.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
            / F.sum("c").cast("double"),
            6,
        ).alias("entropy_nats"),
    )


# --------------------------------------------------------------------------
# Brown-Forsythe (median-based Levene) variance-equality test
# --------------------------------------------------------------------------


@query(
    "stat_levene_bf",
    # Brown-Forsythe: one-way ANOVA F-statistic on |x - median_g|,
    # robust to non-normality (Levene 1960 / Brown & Forsythe 1974).
    # Groups = lang, response = n_chars. Medians of integers are
    # 0.5-granular and |int - 0.5-granular| sums are exact in double,
    # so both engines' moment relations agree bit-for-bit; the single
    # F division is round-6.
    oracle="""
    WITH med AS (
        SELECT lang, median(n_chars) AS md
        FROM documents GROUP BY lang
    ),
    z AS (
        SELECT d.lang, abs(d.n_chars - md) AS z
        FROM documents d JOIN med USING (lang)
    ),
    g AS (
        SELECT lang, count(*) AS n, sum(z) AS s1, sum(z * z) AS s2
        FROM z GROUP BY lang
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nn,
               sum(s1) AS ts1
        FROM g
    )
    SELECT k AS n_groups,
           nn AS n_obs,
           CAST(k - 1 AS BIGINT) AS df1,
           CAST(nn - k AS BIGINT) AS df2,
           round(
             (CAST(nn - k AS DOUBLE) / (k - 1))
             * sum(n * (s1 / n - ts1 / nn) * (s1 / n - ts1 / nn))
             / sum(s2 - s1 * s1 / n),
             6) AS f_stat
    FROM g CROSS JOIN tot
    GROUP BY k, nn, ts1
    """,
)
def stat_levene_bf(spark, sf_dir):
    """Brown-Forsythe variance-equality F across languages on doc
    length. Plan: exact per-lang medians (tiny group count -> the
    built-in exact percentile is fine), broadcast back onto the scan,
    per-lang moment relation (|langs| rows), all final algebra on that
    bounded relation. One fact shuffle total."""
    d = t(spark, sf_dir, "documents")
    med = d.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("md")
    )
    z = d.join(F.broadcast(med), "lang").select(
        "lang", F.abs(F.col("n_chars") - F.col("md")).alias("z")
    )
    g = z.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z").alias("s1"),
        F.sum(F.col("z") * F.col("z")).alias("s2"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s1").alias("ts1"),
    )
    dev = F.col("s1") / F.col("n") - F.col("ts1") / F.col("nn")
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy("k", "nn", "ts1")
        .agg(
            F.round(
                ((F.col("nn") - F.col("k")).cast("double") / (F.col("k") - 1))
                * F.sum(F.col("n") * dev * dev)
                / F.sum(
                    F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
                ),
                6,
            ).alias("f_stat"),
        )
        .select(
            F.col("k").alias("n_groups"),
            F.col("nn").alias("n_obs"),
            (F.col("k") - 1).cast("bigint").alias("df1"),
            (F.col("nn") - F.col("k")).cast("bigint").alias("df2"),
            "f_stat",
        )
    )


# --------------------------------------------------------------------------
# CDC snapshot diff
# --------------------------------------------------------------------------


@query(
    "io_snapshot_diff",
    # Classic warehouse CDC: diff two snapshots of orders into
    # added/removed/changed/unchanged classes with exact integer-cent
    # delta totals. Snapshots are derived deterministically from the
    # base table: OLD = keys with o_orderkey%5 != 0; NEW = keys with
    # o_orderkey%7 != 0, price bumped by 150 cents where key%3 = 0.
    oracle="""
    WITH src AS (
        SELECT o_orderkey AS k,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    old AS (SELECT k, cents FROM src WHERE k % 5 <> 0),
    new AS (
        SELECT k,
               cents + CASE WHEN k % 3 = 0 THEN 150 ELSE 0 END AS cents
        FROM src WHERE k % 7 <> 0
    ),
    d AS (
        SELECT coalesce(old.k, new.k) AS k,
               old.cents AS oc, new.cents AS nc
        FROM old FULL OUTER JOIN new ON old.k = new.k
    )
    SELECT CASE WHEN oc IS NULL THEN 'added'
                WHEN nc IS NULL THEN 'removed'
                WHEN oc <> nc THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(abs(coalesce(nc, 0) - coalesce(oc, 0))) AS BIGINT)
               AS abs_delta_cents
    FROM d
    GROUP BY change_type
    """,
)
def io_snapshot_diff(spark, sf_dir):
    """Snapshot diff via one full-outer join on the snapshot key, then
    a 4-row classification aggregate. Prices become integer cents
    BEFORE the join so every total is exact int arithmetic. At 100 TB
    both snapshots arrive key-partitioned from storage, so the full
    outer join is the single co-partitioned shuffle CDC fundamentally
    needs; the classification is map-side after it."""
    src = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    old = src.where(F.col("k") % 5 != 0)
    new = src.where(F.col("k") % 7 != 0).select(
        "k",
        (
            F.col("cents")
            + F.when(F.col("k") % 3 == 0, F.lit(150)).otherwise(F.lit(0))
        ).alias("cents"),
    )
    d = old.alias("o").join(
        new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer"
    ).select(
        F.col("o.cents").alias("oc"), F.col("n.cents").alias("nc")
    )
    ct = (
        F.when(F.col("oc").isNull(), "added")
        .when(F.col("nc").isNull(), "removed")
        .when(F.col("oc") != F.col("nc"), "changed")
        .otherwise("unchanged")
    )
    return d.groupBy(ct.alias("change_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(
            F.abs(
                F.coalesce(F.col("nc"), F.lit(0))
                - F.coalesce(F.col("oc"), F.lit(0))
            )
        )
        .cast("bigint")
        .alias("abs_delta_cents"),
    )


# --------------------------------------------------------------------------
# MMR-diversified top-k retrieval
# --------------------------------------------------------------------------

_MMR_K = 10
_MMR_LAMBDA = 0.7


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@query("emb_mmr_diversify", oracle=None)  # iterative argmax: replay-tested
def emb_mmr_diversify(spark, sf_dir):
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998) top-10
    against the corpus mean vector: each step picks
    argmax lambda*rel(v) - (1-lambda)*max_{s in S} cos(v, s).

    Inherently sequential (the penalty depends on every prior pick), so
    like BPE this is a bounded driver loop: k passes, each a map-only
    scan scoring candidates against <=k broadcast literal vectors and a
    TakeOrdered(1) — no shuffle ever touches the candidate relation.
    The argmax orders by round-6 score with a vec_id tie-break, so the
    pick is deterministic under float accumulation ulps; the pytest
    replay re-runs the identical left-fold in pure Python and pins the
    exact selection. oracle=None: a recursive-CTE oracle would re-state
    the same loop, not independently check it."""
    emb = t(spark, sf_dir, "embeddings")
    schema = (
        "step int, vec_id long, relevance double, mmr_score double"
    )
    if emb.isEmpty():
        return spark.createDataFrame([], schema)

    v = F.col("embedding").cast("array<double>")
    cand = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), v.alias("v")
    ).withColumn(
        "nrm", F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    dim = len(cand.first()["v"])
    mean_row = cand.agg(
        F.array(
            *[F.avg(F.col("v")[i]) for i in range(dim)]
        ).alias("q")
    ).first()
    q = mean_row["q"]
    qn = sum(x * x for x in q) ** 0.5
    ql = F.array(*[F.lit(float(x)) for x in q])
    cand = cand.withColumn(
        "rel", _dot(F.col("v"), ql) / (F.col("nrm") * F.lit(float(qn)))
    ).persist()
    try:
        picked = []  # (step, vec_id, rel, score, vec, nrm)
        for step in range(_MMR_K):
            if picked:
                pens = [
                    _dot(
                        F.col("v"),
                        F.array(*[F.lit(float(x)) for x in p[4]]),
                    )
                    / (F.col("nrm") * F.lit(float(p[5])))
                    for p in picked
                ]
                pen = F.greatest(*pens) if len(pens) > 1 else pens[0]
                ids = [p[1] for p in picked]
                pool = cand.where(~F.col("vec_id").isin(ids))
            else:
                pen = F.lit(0.0)
                pool = cand
            score = (
                F.lit(_MMR_LAMBDA) * F.col("rel")
                - F.lit(1.0 - _MMR_LAMBDA) * pen
            )
            top = (
                pool.withColumn("score", score)
                .orderBy(
                    F.round(F.col("score"), 6).desc(), F.col("vec_id")
                )
                .limit(1)
                .select("vec_id", "rel", "score", "v", "nrm")
                .first()
            )
            if top is None:
                break
            picked.append(
                (
                    step,
                    top["vec_id"],
                    top["rel"],
                    top["score"],
                    top["v"],
                    top["nrm"],
                )
            )
        rows = [
            (p[0], p[1], round(p[2], 6), round(p[3], 6)) for p in picked
        ]
        return spark.createDataFrame(rows, schema)
    finally:
        cand.unpersist()
