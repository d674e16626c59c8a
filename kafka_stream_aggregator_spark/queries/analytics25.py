"""Round-8 wave 34: Lorenz concentration curve, Poisson dispersion
index, per-source length-distribution KL divergence, and a fully
relational 2-round AdaBoost with decision stumps.

Determinism: spend/curve sums are DECIMAL-exact; dispersion moments
are pure BIGINT; KL terms are quantized to DECIMAL(16,12) pre-sum;
AdaBoost candidate errors are INTEGER counts (round 1) and closed
integer-weighted chains (round 2), with (err, theta) tie-breaks so
both engines pick identical stumps.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


# --------------------------------------------------------------------------
# Lorenz curve by customer spend decile
# --------------------------------------------------------------------------


@query(
    "agg_lorenz_deciles",
    # Customers ranked by DECIMAL-exact total spend ((spend, custkey)
    # tie-break), cut into integer deciles via (rn-1)*10 // n — the
    # counts-tier rule, never ntile over raw rows; per-decile and
    # cumulative spend shares close the curve.
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY o_custkey
    ), r AS (
      SELECT spend,
             row_number() OVER (ORDER BY spend, o_custkey) AS rn,
             count(*) OVER () AS n
      FROM s
    ), d AS (
      SELECT CAST((rn - 1) * 10 // n AS BIGINT) + 1 AS decile, spend
      FROM r
    ), per AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             sum(spend) AS ds
      FROM d GROUP BY decile
    ), c AS (
      SELECT decile, n_customers, ds,
             sum(ds) OVER (ORDER BY decile
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum,
             sum(ds) OVER () AS total
      FROM per
    )
    SELECT decile, n_customers,
           round(CAST(ds AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS spend_share,
           round(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6)
             AS cum_share
    FROM c
    """,
)
def agg_lorenz_deciles(spark, sf_dir):
    """Lorenz curve: one fact-sized aggregate (per-customer spend),
    then rank/decile/cumulate on the customer-bounded relation. The
    global row_number is a single-partition window over customers
    only (documented: at 100 TB the rank goes through the two-phase
    distributed rank used by doc_train_split)."""
    o = t(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    r = s.select(
        "spend",
        F.row_number()
        .over(W.orderBy("spend", "o_custkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n"),
    )
    d = r.select(
        (F.floor((F.col("rn") - 1) * 10 / F.col("n")).cast("bigint") + 1)
        .alias("decile"),
        "spend",
    )
    per = d.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("spend").alias("ds"),
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    c = per.select(
        "decile",
        "n_customers",
        "ds",
        F.sum("ds").over(wc).alias("cum"),
        F.sum("ds").over(wall).alias("total"),
    )
    return c.select(
        "decile",
        "n_customers",
        F.round(
            F.col("ds").cast("double") / F.col("total").cast("double"), 6
        ).alias("spend_share"),
        F.round(
            F.col("cum").cast("double") / F.col("total").cast("double"), 6
        ).alias("cum_share"),
    )


# --------------------------------------------------------------------------
# Poisson dispersion (variance-to-mean ratio) of hourly counts
# --------------------------------------------------------------------------


@query(
    "stat_poisson_dispersion",
    # Per event_type: VMR = sample_var/mean and the chi-square index of
    # dispersion sum((c-mean)^2)/mean on the hourly count series. Both
    # reduce to pure-BIGINT moment identities:
    # VMR = (n*sqq - sy^2) / ((n-1)*sy), chi2 = (n*sqq - sy^2) / (n*sy)
    # * n ... = (n*sqq - sy^2)/sy with df = n-1. One division each.
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             count(*) AS c
      FROM events GROUP BY event_type, hr
    ), m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS sy,
             CAST(sum(c * c) AS BIGINT) AS sqq
      FROM hourly GROUP BY event_type
    )
    SELECT event_type, n AS n_hours, CAST(n - 1 AS BIGINT) AS df,
           round(CAST(sy AS DOUBLE) / n, 6) AS mean_count,
           round(CAST(n * sqq - sy * sy AS DOUBLE)
                 / (CAST(n - 1 AS DOUBLE) * sy), 6) AS vmr,
           round(CAST(n * sqq - sy * sy AS DOUBLE)
                 / CAST(sy AS DOUBLE), 6) AS chi2_dispersion
    FROM m WHERE n > 1 AND sy > 0
    """,
)
def stat_poisson_dispersion(spark, sf_dir):
    """Overdispersion test: the hourly aggregate is the only fact
    shuffle; VMR and the chi-square index are integer-moment
    identities with one closing division each (no float mean ever
    accumulates)."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 3600)
        .cast("bigint")
        .alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sy"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sqq"),
    )
    num = (F.col("n") * F.col("sqq") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.filter((F.col("n") > 1) & (F.col("sy") > 0)).select(
        "event_type",
        F.col("n").alias("n_hours"),
        (F.col("n") - 1).cast("bigint").alias("df"),
        F.round(F.col("sy").cast("double") / F.col("n"), 6).alias(
            "mean_count"
        ),
        F.round(
            num / ((F.col("n") - 1).cast("double") * F.col("sy")), 6
        ).alias("vmr"),
        F.round(num / F.col("sy").cast("double"), 6).alias(
            "chi2_dispersion"
        ),
    )


# --------------------------------------------------------------------------
# Per-source KL divergence of the document-length distribution
# --------------------------------------------------------------------------


@query(
    "corpus_length_kl",
    # KL(P_source || P_corpus) over capped 100-char length buckets
    # (bucket = least(n_chars // 100, 20) — integer floor division,
    # never float log buckets). Terms are exact-integer ratios inside
    # ln, quantized to DECIMAL(16,12) before the <=21-term sum.
    oracle="""
    WITH b AS (
      SELECT source, least(n_chars // 100, 20) AS bkt
      FROM documents
    ), sb AS (
      SELECT source, bkt, CAST(count(*) AS BIGINT) AS c
      FROM b GROUP BY source, bkt
    ), cb AS (
      SELECT bkt, CAST(sum(c) AS BIGINT) AS cb FROM sb GROUP BY bkt
    ), ns AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM sb GROUP BY source
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n FROM sb
    ), terms AS (
      SELECT sb.source, ns.ns,
             CAST(round(
               (CAST(sb.c AS DOUBLE) / ns.ns)
               * ln(CAST(sb.c * tot.n AS DOUBLE)
                    / CAST(ns.ns * cb.cb AS DOUBLE)), 12)
               AS DECIMAL(16,12)) AS term
      FROM sb
      JOIN ns ON sb.source = ns.source
      JOIN cb ON sb.bkt = cb.bkt
      CROSS JOIN tot
    )
    SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
           round(CAST(sum(term) AS DOUBLE), 6) AS kl_nats
    FROM terms GROUP BY source
    """,
)
def corpus_length_kl(spark, sf_dir):
    """Length-distribution drift per source: one fact-sized aggregate
    to the (source, bucket) relation, then broadcast re-joins of the
    bucket/source/corpus marginals; KL terms quantized pre-sum."""
    d = t(spark, sf_dir, "documents")
    b = d.select(
        "source",
        F.least(F.floor(F.col("n_chars") / 100), F.lit(20))
        .cast("bigint")
        .alias("bkt"),
    )
    sb = b.groupBy("source", "bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cb = sb.groupBy("bkt").agg(F.sum("c").cast("bigint").alias("cb"))
    ns = sb.groupBy("source").agg(F.sum("c").cast("bigint").alias("ns"))
    tot = sb.agg(F.sum("c").cast("bigint").alias("n"))
    term = F.round(
        (F.col("c").cast("double") / F.col("ns"))
        * F.log(
            (F.col("c") * F.col("n")).cast("double")
            / (F.col("ns") * F.col("cb")).cast("double")
        ),
        12,
    ).cast("decimal(16,12)")
    terms = (
        sb.join(F.broadcast(ns), "source")
        .join(F.broadcast(cb), "bkt")
        .crossJoin(F.broadcast(tot))
        .select("source", "ns", term.alias("term"))
    )
    return terms.groupBy("source").agg(
        F.max("ns").cast("bigint").alias("n_docs"),
        F.round(F.sum("term").cast("double"), 6).alias("kl_nats"),
    )


# --------------------------------------------------------------------------
# AdaBoost, 2 rounds, decision stumps on n_chars
# --------------------------------------------------------------------------


@query(
    "ml_adaboost_stump_2round",
    # Fully relational AdaBoost (2 rounds) for y = (lang='en') on
    # x = n_chars. Stump h_t(x) = +1 iff x <= theta, candidate thetas =
    # the 9 counts-tier deciles (integer cross-multiplied thresholds).
    # Round-1 errors are INTEGER counts; round-2 weights take only two
    # values (exp(+-alpha1)) so weighted errors are closed chains on
    # the four integer cells (A, B, M1, C1); argmin tie-breaks on
    # (err, theta) are deterministic on both engines. alpha =
    # 0.5 ln((1-e)/e); ensemble error re-counts sign(a1 h1 + a2 h2).
    oracle="""
    WITH d AS (
      SELECT n_chars AS x,
             CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
      FROM documents
    ), nn AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM d
    ), cnt AS (
      SELECT x, count(*) AS c FROM d GROUP BY x
    ), cum AS (
      SELECT x, sum(c) OVER (ORDER BY x
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cm
      FROM cnt
    ), th AS (
      SELECT DISTINCT theta FROM (
        SELECT k, min(x) AS theta
        FROM cum CROSS JOIN nn
        CROSS JOIN (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS k) ks
        WHERE cm * 10 >= k * n
        GROUP BY k) z
    ), r1 AS (
      SELECT theta,
             CAST(count_if((x <= theta AND y = -1)
                           OR (x > theta AND y = 1)) AS BIGINT) AS err
      FROM d CROSS JOIN th GROUP BY theta
    ), p1 AS (
      SELECT theta AS theta1, err AS err1 FROM r1
      ORDER BY err, theta LIMIT 1
    ), c1 AS (
      SELECT theta1, err1, n,
             CAST(err1 AS DOUBLE) / n AS e1,
             0.5 * ln((n - CAST(err1 AS DOUBLE)) / err1) AS alpha1,
             sqrt((n - CAST(err1 AS DOUBLE)) / err1) AS wi,
             sqrt(CAST(err1 AS DOUBLE) / (n - err1)) AS wc
      FROM p1 CROSS JOIN nn
    ), r2 AS (
      SELECT th.theta,
             CAST(count_if(((x <= th.theta AND y = -1)
                            OR (x > th.theta AND y = 1))
                           AND ((x <= c1.theta1 AND y = -1)
                                OR (x > c1.theta1 AND y = 1)))
                  AS BIGINT) AS a,
             CAST(count_if(((x <= th.theta AND y = -1)
                            OR (x > th.theta AND y = 1))
                           AND NOT ((x <= c1.theta1 AND y = -1)
                                    OR (x > c1.theta1 AND y = 1)))
                  AS BIGINT) AS b
      FROM d CROSS JOIN th CROSS JOIN c1
      GROUP BY th.theta
    ), e2c AS (
      SELECT theta,
             (c1.wi * a + c1.wc * b)
             / (c1.wi * c1.err1 + c1.wc * (c1.n - c1.err1)) AS e2
      FROM r2 CROSS JOIN c1
    ), p2 AS (
      SELECT theta AS theta2, e2 FROM e2c ORDER BY e2, theta LIMIT 1
    ), c2 AS (
      SELECT theta2, e2, 0.5 * ln((1 - e2) / e2) AS alpha2 FROM p2
    ), ens AS (
      SELECT CAST(count_if(
               (CASE WHEN (c1.alpha1 * CASE WHEN x <= c1.theta1
                                            THEN 1 ELSE -1 END
                           + c2.alpha2 * CASE WHEN x <= c2.theta2
                                              THEN 1 ELSE -1 END) > 0
                     THEN 1 ELSE -1 END) <> y) AS BIGINT) AS ens_err
      FROM d CROSS JOIN c1 CROSS JOIN c2
    )
    SELECT c1.n, c1.theta1, c1.err1, round(c1.alpha1, 6) AS alpha1,
           c2.theta2, round(c2.e2, 6) AS werr2,
           round(c2.alpha2, 6) AS alpha2,
           ens.ens_err,
           round(CAST(ens.ens_err AS DOUBLE) / c1.n, 6) AS ens_error_rate
    FROM c1 CROSS JOIN c2 CROSS JOIN ens
    """,
)
def ml_adaboost_stump_2round(spark, sf_dir):
    """2-round AdaBoost over broadcast candidate thresholds: the data
    side is scanned three times (round-1 errors, round-2 cells,
    ensemble error), each a map-side-combined aggregate against a
    <=9-row broadcast candidate relation — no weight column is ever
    materialized per row, because the round-2 weights are the two
    closed-form exp(+-alpha1) values."""
    docs = t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("x"),
        F.when(F.col("lang") == "en", 1).otherwise(-1).alias("y"),
    )
    nn = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cnt = docs.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    cum = cnt.select(
        "x",
        F.sum("c")
        .over(W.orderBy("x").rowsBetween(W.unboundedPreceding, 0))
        .alias("cm"),
    )
    ks = spark.range(1, 10).select(F.col("id").alias("k"))
    th = (
        cum.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(ks))
        .filter(F.col("cm") * 10 >= F.col("k") * F.col("n"))
        .groupBy("k")
        .agg(F.min("x").alias("theta"))
        .select("theta")
        .distinct()
    )

    def mis(theta_col):
        return ((F.col("x") <= theta_col) & (F.col("y") == -1)) | (
            (F.col("x") > theta_col) & (F.col("y") == 1)
        )

    r1 = (
        docs.crossJoin(F.broadcast(th))
        .groupBy("theta")
        .agg(
            F.count_if(mis(F.col("theta"))).cast("bigint").alias("err")
        )
    )
    p1 = (
        r1.orderBy("err", "theta")
        .limit(1)
        .select(F.col("theta").alias("theta1"), F.col("err").alias("err1"))
    )
    c1 = p1.crossJoin(F.broadcast(nn)).select(
        "theta1",
        "err1",
        "n",
        (F.col("err1").cast("double") / F.col("n")).alias("e1"),
        (
            0.5
            * F.log(
                (F.col("n") - F.col("err1").cast("double"))
                / F.col("err1")
            )
        ).alias("alpha1"),
        F.sqrt(
            (F.col("n") - F.col("err1").cast("double")) / F.col("err1")
        ).alias("wi"),
        F.sqrt(
            F.col("err1").cast("double") / (F.col("n") - F.col("err1"))
        ).alias("wc"),
    )
    r2 = (
        docs.crossJoin(F.broadcast(th))
        .crossJoin(F.broadcast(c1))
        .groupBy("theta")
        .agg(
            F.count_if(mis(F.col("theta")) & mis(F.col("theta1")))
            .cast("bigint")
            .alias("a"),
            F.count_if(mis(F.col("theta")) & ~mis(F.col("theta1")))
            .cast("bigint")
            .alias("b"),
        )
    )
    e2c = r2.crossJoin(F.broadcast(c1)).select(
        "theta",
        (
            (F.col("wi") * F.col("a") + F.col("wc") * F.col("b"))
            / (
                F.col("wi") * F.col("err1")
                + F.col("wc") * (F.col("n") - F.col("err1"))
            )
        ).alias("e2"),
    )
    p2 = (
        e2c.orderBy("e2", "theta")
        .limit(1)
        .select(F.col("theta").alias("theta2"), "e2")
    )
    c2 = p2.select(
        "theta2",
        "e2",
        (0.5 * F.log((1 - F.col("e2")) / F.col("e2"))).alias("alpha2"),
    )
    h1 = F.when(F.col("x") <= F.col("theta1"), 1).otherwise(-1)
    h2 = F.when(F.col("x") <= F.col("theta2"), 1).otherwise(-1)
    pred = F.when(
        F.col("alpha1") * h1 + F.col("alpha2") * h2 > 0, 1
    ).otherwise(-1)
    ens = (
        docs.crossJoin(F.broadcast(c1))
        .crossJoin(F.broadcast(c2))
        .agg(F.count_if(pred != F.col("y")).cast("bigint").alias("ens_err"))
    )
    return (
        c1.crossJoin(c2)
        .crossJoin(ens)
        .select(
            "n",
            "theta1",
            "err1",
            F.round("alpha1", 6).alias("alpha1"),
            "theta2",
            F.round("e2", 6).alias("werr2"),
            F.round("alpha2", 6).alias("alpha2"),
            "ens_err",
            F.round(
                F.col("ens_err").cast("double") / F.col("n"), 6
            ).alias("ens_error_rate"),
        )
    )
