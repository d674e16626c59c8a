"""Round-9 wave 49: gradient boosting (2 rounds, depth-1 stumps,
squared loss, learning rate 0.5) fit relationally on the 24-cell
hour-of-day moment relation — the boosting-family companion to
ml_adaboost_stump_2round (exponential loss / classification) and
ml_regression_tree_depth2 (single tree).

Determinism discipline: the round-1 split search runs on DECIMAL
prefix sums of the raw moments (residual shift by a constant does not
change the split); round-2 residual cells are quantized round(., 6)
DECIMAL at birth before their prefix sums (windowed double sums are
NOT order-fixed on DuckDB — segment-tree aggregation — so doubles
never enter a windowed fold); every SSE/gamma/MSE is a literal-
identical IEEE chain on those exact inputs, argmins tie-break on the
split position.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

_LR = "0.5"


@query(
    "ml_gbm_2round",
    oracle=f"""
    WITH hm AS (
      SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(value AS DECIMAL(18,2))) AS s,
             sum(CAST(value AS DECIMAL(18,2))
                 * CAST(value AS DECIMAL(18,2))) AS ss
      FROM events GROUP BY hr
    ), pre AS (
      SELECT hr, sum(n) OVER w AS cn, sum(s) OVER w AS cs,
             sum(n) OVER () AS tn, sum(s) OVER () AS ts_,
             sum(ss) OVER () AS tss
      FROM hm
      WINDOW w AS (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ), cand AS (
      SELECT hr AS t, cn, cs, tn, ts_,
             - CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE) / cn
             - CAST(ts_ - cs AS DOUBLE) * CAST(ts_ - cs AS DOUBLE)
               / (tn - cn) AS obj
      FROM pre WHERE hr BETWEEN 1 AND 21
    ), r1 AS (
      SELECT t AS t1,
             CAST(ts_ AS DOUBLE) / tn AS f0,
             CAST(cs AS DOUBLE) / cn - CAST(ts_ AS DOUBLE) / tn AS g1l,
             CAST(ts_ - cs AS DOUBLE) / (tn - cn)
               - CAST(ts_ AS DOUBLE) / tn AS g1r,
             tn
      FROM cand ORDER BY obj, t LIMIT 1
    ), c2 AS (
      SELECT hm.hr, hm.n,
             CASE WHEN hm.hr <= r1.t1
                  THEN r1.f0 + {_LR} * r1.g1l
                  ELSE r1.f0 + {_LR} * r1.g1r END AS f1,
             hm.s, hm.ss, r1.t1, r1.g1l, r1.g1r, r1.tn
      FROM hm CROSS JOIN r1
    ), q2 AS (
      SELECT hr, n, f1, t1, g1l, g1r, tn,
             CAST(round(CAST(s AS DOUBLE) - n * f1, 6)
                  AS DECIMAL(24,6)) AS rs,
             CAST(round(CAST(ss AS DOUBLE) - 2 * f1 * CAST(s AS DOUBLE)
                        + n * f1 * f1, 6) AS DECIMAL(28,6)) AS rss
      FROM c2
    ), pre2 AS (
      SELECT hr, f1, t1, g1l, g1r, tn,
             sum(n) OVER w AS cn, sum(rs) OVER w AS crs,
             sum(rs) OVER () AS trs, sum(rss) OVER () AS trss,
             max(CASE WHEN hr <= t1 THEN 1 ELSE 0 END) OVER () AS dummy
      FROM q2
      WINDOW w AS (ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ), cand2 AS (
      SELECT hr AS t, t1, g1l, g1r, tn, trs, trss,
             - CAST(crs AS DOUBLE) * CAST(crs AS DOUBLE) / cn
             - CAST(trs - crs AS DOUBLE) * CAST(trs - crs AS DOUBLE)
               / (tn - cn) AS obj,
             CAST(crs AS DOUBLE) / cn AS ml,
             CAST(trs - crs AS DOUBLE) / (tn - cn) AS mr
      FROM pre2 WHERE hr BETWEEN 1 AND 21
    ), r2 AS (
      SELECT t AS t2, t1, g1l, g1r, tn, trs, trss,
             ml AS g2l, mr AS g2r
      FROM cand2 ORDER BY obj, t LIMIT 1
    ), fin AS (
      SELECT q2.hr, q2.n, q2.rs, q2.rss, r2.*,
             CASE WHEN q2.hr <= r2.t2
                  THEN {_LR} * r2.g2l ELSE {_LR} * r2.g2r END AS step
      FROM q2 CROSS JOIN r2
    ), mse AS (
      SELECT max(t1) AS t1, max(g1l) AS g1l, max(g1r) AS g1r,
             max(t2) AS t2, max(g2l) AS g2l, max(g2r) AS g2r,
             max(tn) AS tn, max(trss) AS trss,
             sum(CAST(round(CAST(rss AS DOUBLE)
                            - 2 * step * CAST(rs AS DOUBLE)
                            + n * step * step, 6)
                      AS DECIMAL(28,6))) AS sse2
      FROM fin
    )
    SELECT CAST(t1 AS BIGINT) AS t1,
           round(g1l, 6) AS gamma1_left,
           round(g1r, 6) AS gamma1_right,
           CAST(t2 AS BIGINT) AS t2,
           round(g2l, 6) AS gamma2_left,
           round(g2r, 6) AS gamma2_right,
           round(CAST(trss AS DOUBLE) / tn, 6) AS mse_round1,
           round(CAST(sse2 AS DOUBLE) / tn, 6) AS mse_round2
    FROM mse
    """,
)
def ml_gbm_2round(spark, sf_dir):
    """Two unrolled boosting rounds: stump 1's split search = the
    raw-moment search (constant shift preserves argmin); F1 per cell;
    round-2 residual cells quantized DECIMAL at birth; stump 2 on
    their DECIMAL prefix sums; training MSE after each round from the
    same exact cells."""
    lr = float(_LR)
    ev = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    hm = ev.groupBy(
        F.hour("ts").cast("bigint").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("ss"),
    )
    wcum = W.orderBy("hr").rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy()
    pre = hm.select(
        "hr",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("s").over(wcum).alias("cs"),
        F.sum("n").over(wall).alias("tn"),
        F.sum("s").over(wall).alias("ts_"),
        F.sum("ss").over(wall).alias("tss"),
    )
    cnd = F.col("cn").cast("double")
    csd = F.col("cs").cast("double")
    tnd = F.col("tn").cast("double")
    tsd = F.col("ts_").cast("double")
    obj = -csd * csd / cnd - (tsd - csd) * (tsd - csd) / (
        tnd - cnd
    )
    cand = pre.filter(
        (F.col("hr") >= 1) & (F.col("hr") <= 21)
    ).select(
        F.col("hr").alias("t"), "cn", "cs", "tn", "ts_", obj.alias("obj")
    )
    r1 = (
        cand.orderBy("obj", "t")
        .limit(1)
        .select(
            F.col("t").alias("t1"),
            (tsd / F.col("tn")).alias("f0"),
            (csd / F.col("cn") - tsd / F.col("tn")).alias("g1l"),
            (
                (tsd - csd) / (F.col("tn") - F.col("cn"))
                - tsd / F.col("tn")
            ).alias("g1r"),
            "tn",
        )
    )
    c2 = hm.crossJoin(F.broadcast(r1)).select(
        "hr",
        "n",
        F.when(
            F.col("hr") <= F.col("t1"),
            F.col("f0") + lr * F.col("g1l"),
        )
        .otherwise(F.col("f0") + lr * F.col("g1r"))
        .alias("f1"),
        "s",
        "ss",
        "t1",
        "g1l",
        "g1r",
        "tn",
    )
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    q2 = c2.select(
        "hr",
        "n",
        "f1",
        "t1",
        "g1l",
        "g1r",
        "tn",
        F.round(sd - F.col("n") * F.col("f1"), 6)
        .cast("decimal(24,6)")
        .alias("rs"),
        F.round(
            ssd - 2 * F.col("f1") * sd + F.col("n") * F.col("f1") * F.col("f1"),
            6,
        )
        .cast("decimal(28,6)")
        .alias("rss"),
    )
    pre2 = q2.select(
        "hr",
        "t1",
        "g1l",
        "g1r",
        "tn",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("rs").over(wcum).alias("crs"),
        F.sum("rs").over(wall).alias("trs"),
        F.sum("rss").over(wall).alias("trss"),
    )
    crsd = F.col("crs").cast("double")
    trsd = F.col("trs").cast("double")
    cnd2 = F.col("cn").cast("double")
    tnd2 = F.col("tn").cast("double")
    obj2 = -crsd * crsd / cnd2 - (trsd - crsd) * (trsd - crsd) / (
        tnd2 - cnd2
    )
    cand2 = pre2.filter(
        (F.col("hr") >= 1) & (F.col("hr") <= 21)
    ).select(
        F.col("hr").alias("t"),
        "t1",
        "g1l",
        "g1r",
        "tn",
        "trs",
        "trss",
        obj2.alias("obj"),
        (crsd / cnd2).alias("ml"),
        ((trsd - crsd) / (tnd2 - cnd2)).alias("mr"),
    )
    r2 = (
        cand2.orderBy("obj", "t")
        .limit(1)
        .select(
            F.col("t").alias("t2"),
            "t1",
            "g1l",
            "g1r",
            "tn",
            "trs",
            "trss",
            F.col("ml").alias("g2l"),
            F.col("mr").alias("g2r"),
        )
    )
    fin = q2.select("hr", "n", "rs", "rss").crossJoin(
        F.broadcast(r2)
    ).select(
        "*",
        F.when(F.col("hr") <= F.col("t2"), lr * F.col("g2l"))
        .otherwise(lr * F.col("g2r"))
        .alias("step"),
    )
    rsd = F.col("rs").cast("double")
    rssd = F.col("rss").cast("double")
    mse = fin.agg(
        F.max("t1").alias("t1"),
        F.max("g1l").alias("g1l"),
        F.max("g1r").alias("g1r"),
        F.max("t2").alias("t2"),
        F.max("g2l").alias("g2l"),
        F.max("g2r").alias("g2r"),
        F.max("tn").alias("tn"),
        F.max("trss").alias("trss"),
        F.sum(
            F.round(
                rssd - 2 * F.col("step") * rsd + F.col("n")
                * F.col("step") * F.col("step"),
                6,
            ).cast("decimal(28,6)")
        ).alias("sse2"),
    )
    return mse.select(
        F.col("t1").cast("bigint").alias("t1"),
        F.round("g1l", 6).alias("gamma1_left"),
        F.round("g1r", 6).alias("gamma1_right"),
        F.col("t2").cast("bigint").alias("t2"),
        F.round("g2l", 6).alias("gamma2_left"),
        F.round("g2r", 6).alias("gamma2_right"),
        F.round(F.col("trss").cast("double") / F.col("tn"), 6).alias(
            "mse_round1"
        ),
        F.round(F.col("sse2").cast("double") / F.col("tn"), 6).alias(
            "mse_round2"
        ),
    )


@query(
    "doc_rake_keywords",
    # RAKE keyword extraction (Rose et al. 2010) over the bounded doc
    # slice: token runs between stopwords {a, the} are candidate
    # phrases; word score = degree/frequency where degree counts
    # phrase-mates (phrase length per occurrence) and frequency counts
    # occurrences; phrase score = sum of its words' scores. Emits each
    # doc's top phrase by (score DESC, phrase ASC) — everything is an
    # integer ratio until the final rounding, and the tie-break is
    # total, so both engines pick identical keywords.
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(generate_subscripts(
               regexp_extract_all(lower(text), '\\S+'), 1) AS BIGINT)
               AS idx,
             unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
      FROM documents WHERE doc_id < 60
    ), ns AS (
      SELECT doc_id, idx, tok,
             idx - row_number() OVER (PARTITION BY doc_id
                                      ORDER BY idx) AS grp
      FROM toks WHERE tok NOT IN ('a', 'the')
    ), ph AS (
      SELECT doc_id, grp, tok, idx,
             count(*) OVER (PARTITION BY doc_id, grp) AS plen
      FROM ns
    ), wscore AS (
      SELECT doc_id, tok,
             CAST(sum(plen) AS DOUBLE) / count(*) AS score
      FROM ph GROUP BY doc_id, tok
    ), pscore AS (
      SELECT ph.doc_id, ph.grp,
             string_agg(ph.tok, ' ' ORDER BY ph.idx) AS phrase,
             round(sum(wscore.score), 6) AS rake_score,
             CAST(max(ph.plen) AS BIGINT) AS phrase_len
      FROM ph JOIN wscore
        ON ph.doc_id = wscore.doc_id AND ph.tok = wscore.tok
      GROUP BY ph.doc_id, ph.grp
    )
    SELECT doc_id, phrase, phrase_len, rake_score
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                ORDER BY rake_score DESC, phrase) AS rn
      FROM pscore) z
    WHERE rn = 1
    """,
)
def doc_rake_keywords(spark, sf_dir):
    """RAKE: one posexplode, stopword gap-islands segmentation
    (idx - row_number), two bounded aggregates (word scores, phrase
    scores) joined back, a rank-1 window. The degree/frequency ratio
    is exact-integer division; the only float is the final sum of
    per-word ratios, identical 24-term-bounded chains both engines."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"\S+"), 0)
        ).alias("pos", "tok"),
    ).select(
        "doc_id", (F.col("pos") + 1).cast("bigint").alias("idx"), "tok"
    )
    ns = toks.filter(~F.col("tok").isin("a", "the")).select(
        "doc_id",
        "idx",
        "tok",
        (
            F.col("idx")
            - F.row_number().over(
                W.partitionBy("doc_id").orderBy("idx")
            )
        ).alias("grp"),
    )
    ph = ns.select(
        "doc_id",
        "grp",
        "tok",
        "idx",
        F.count(F.lit(1))
        .over(W.partitionBy("doc_id", "grp"))
        .alias("plen"),
    )
    wscore = ph.groupBy("doc_id", "tok").agg(
        (F.sum("plen").cast("double") / F.count(F.lit(1))).alias(
            "score"
        )
    )
    pscore = (
        ph.join(wscore, ["doc_id", "tok"])
        .groupBy("doc_id", "grp")
        .agg(
            F.concat_ws(
                " ", F.array_sort(F.collect_list(F.struct("idx", "tok")))
                .getField("tok")
            ).alias("phrase"),
            F.round(F.sum("score"), 6).alias("rake_score"),
            F.max("plen").cast("bigint").alias("phrase_len"),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("doc_id").orderBy(
            F.col("rake_score").desc(), "phrase"
        )
    )
    return (
        pscore.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", "phrase", "phrase_len", "rake_score")
    )


@query(
    "events_did_estimator",
    # Difference-in-differences: users whose FIRST event is a 'view'
    # (treated) vs others (control), outcome = mean event value,
    # periods split at the timeline midpoint (integer epoch-second
    # midpoint from exact min/max). DiD = (T,post - T,pre) -
    # (C,post - C,pre); all four cell means are exact DECIMAL
    # sums / integer counts.
    oracle="""
    WITH span AS (
      SELECT (CAST(floor(epoch(min(ts))) AS BIGINT)
              + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS mid
      FROM events
    ), treat AS (
      SELECT user_id,
             CAST(CASE WHEN arg_min(event_type, ts) = 'view'
                  THEN 1 ELSE 0 END AS BIGINT) AS treated
      FROM events GROUP BY user_id
    ), cells AS (
      SELECT treat.treated,
             CAST(CASE WHEN floor(epoch(e.ts)) >= span.mid
                  THEN 1 ELSE 0 END AS BIGINT) AS post,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(round(e.value, 2) AS DECIMAL(18,2))) AS s
      FROM events e JOIN treat ON e.user_id = treat.user_id
      CROSS JOIN span
      WHERE e.value IS NOT NULL
      GROUP BY treat.treated, post
    ), w AS (
      SELECT
        max(CASE WHEN treated = 1 AND post = 0
            THEN CAST(s AS DOUBLE) / n END) AS tpre,
        max(CASE WHEN treated = 1 AND post = 1
            THEN CAST(s AS DOUBLE) / n END) AS tpost,
        max(CASE WHEN treated = 0 AND post = 0
            THEN CAST(s AS DOUBLE) / n END) AS cpre,
        max(CASE WHEN treated = 0 AND post = 1
            THEN CAST(s AS DOUBLE) / n END) AS cpost,
        CAST(sum(n) AS BIGINT) AS n_total
      FROM cells
    )
    SELECT n_total,
           round(tpost - tpre, 6) AS treated_delta,
           round(cpost - cpre, 6) AS control_delta,
           round((tpost - tpre) - (cpost - cpre), 6) AS did
    FROM w
    WHERE tpre IS NOT NULL AND tpost IS NOT NULL
      AND cpre IS NOT NULL AND cpost IS NOT NULL
    """,
)
def events_did_estimator(spark, sf_dir):
    """DiD: first-event treatment assignment (arg_min by ts — the
    deterministic struct-min idiom), integer midpoint period split,
    four exact cell means, one closing chain."""
    ev = t(spark, sf_dir, "events")
    span = ev.agg(
        (
            (
                F.floor(F.min(F.col("ts").cast("double"))).cast("bigint")
                + F.floor(F.max(F.col("ts").cast("double"))).cast(
                    "bigint"
                )
            )
            / 2
        )
        .cast("bigint")
        .alias("mid")
    )
    treat = ev.groupBy("user_id").agg(
        F.when(
            F.min(F.struct(F.col("ts"), F.col("event_type")))[
                "event_type"
            ]
            == "view",
            F.lit(1),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("treated")
    )
    cells = (
        ev.filter(F.col("value").isNotNull())
        .join(treat, "user_id")
        .crossJoin(F.broadcast(span))
        .groupBy(
            "treated",
            F.when(
                F.floor(F.col("ts").cast("double")).cast("bigint")
                >= F.col("mid"),
                F.lit(1),
            )
            .otherwise(0)
            .cast("bigint")
            .alias("post"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("s"),
        )
    )

    def cell(tr, po):
        return F.max(
            F.when(
                (F.col("treated") == tr) & (F.col("post") == po),
                F.col("s").cast("double") / F.col("n"),
            )
        )

    w = cells.agg(
        cell(1, 0).alias("tpre"),
        cell(1, 1).alias("tpost"),
        cell(0, 0).alias("cpre"),
        cell(0, 1).alias("cpost"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return w.filter(
        F.col("tpre").isNotNull()
        & F.col("tpost").isNotNull()
        & F.col("cpre").isNotNull()
        & F.col("cpost").isNotNull()
    ).select(
        "n_total",
        F.round(F.col("tpost") - F.col("tpre"), 6).alias(
            "treated_delta"
        ),
        F.round(F.col("cpost") - F.col("cpre"), 6).alias(
            "control_delta"
        ),
        F.round(
            (F.col("tpost") - F.col("tpre"))
            - (F.col("cpost") - F.col("cpre")),
            6,
        ).alias("did"),
    )


@query(
    "stat_meta_fixed_effect",
    # Fixed-effect (inverse-variance) meta-analysis: each nation's
    # customer-balance mean is a "study" (effect = mean, variance =
    # s^2/n from exact DECIMAL moments); pooled effect = sum(w x) /
    # sum(w) with w = 1/v. Per-study w and wx are round-9-quantized
    # into DECIMAL sums (bounded 25-study relation), so the pooled
    # chain is engine-identical. Q heterogeneity emitted alongside.
    oracle="""
    WITH g AS (
      SELECT n_name,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
             sum(CAST(c_acctbal AS DECIMAL(18,2))
                 * CAST(c_acctbal AS DECIMAL(18,2))) AS ss
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    ), eff AS (
      SELECT n_name,
             CAST(s AS DOUBLE) / n AS x,
             (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)
              * CAST(s AS DOUBLE) / n) / (n - 1) / n AS v
      FROM g WHERE n > 1
    ), q AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(round(1.0 / v, 9) AS DECIMAL(24,9)))
                  AS DOUBLE) AS sw,
             CAST(sum(CAST(round(x / v, 9) AS DECIMAL(24,9)))
                  AS DOUBLE) AS swx,
             CAST(sum(CAST(round(x * x / v, 9) AS DECIMAL(28,9)))
                  AS DOUBLE) AS swxx
      FROM eff WHERE v > 0
    )
    SELECT k AS n_studies,
           round(swx / sw, 6) AS pooled_effect,
           round(sqrt(1.0 / sw), 6) AS pooled_se,
           round(swxx - swx * swx / sw, 6) AS q_heterogeneity
    FROM q WHERE sw > 0
    """,
)
def stat_meta_fixed_effect(spark, sf_dir):
    """Inverse-variance pooling across the bounded per-nation study
    relation: exact DECIMAL moments per study, round-9+DECIMAL
    weight sums, closed pooled-effect / SE / Cochran-Q chains."""
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    dec = F.col("c_acctbal").cast("decimal(18,2)")
    g = (
        cust.join(
            F.broadcast(nat),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(dec).alias("s"),
            F.sum(dec * dec).alias("ss"),
        )
    )
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    n = F.col("n")
    eff = g.filter(n > 1).select(
        "n_name",
        (sd / n).alias("x"),
        ((ssd - sd * sd / n) / (n - 1) / n).alias("v"),
    )

    def q9(col, prec):
        return F.sum(F.round(col, 9).cast(f"decimal({prec},9)")).cast(
            "double"
        )

    q = eff.filter(F.col("v") > 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        q9(1.0 / F.col("v"), 24).alias("sw"),
        q9(F.col("x") / F.col("v"), 24).alias("swx"),
        q9(F.col("x") * F.col("x") / F.col("v"), 28).alias("swxx"),
    )
    return q.filter(F.col("sw") > 0).select(
        F.col("k").alias("n_studies"),
        F.round(F.col("swx") / F.col("sw"), 6).alias("pooled_effect"),
        F.round(F.sqrt(1.0 / F.col("sw")), 6).alias("pooled_se"),
        F.round(
            F.col("swxx") - F.col("swx") * F.col("swx") / F.col("sw"), 6
        ).alias("q_heterogeneity"),
    )


@query(
    "ml_als_rank1",
    # One alternating-least-squares round for rank-1 matrix
    # factorization of the (user, event_type) mean-value matrix —
    # the recsys companion to the regression family. With item
    # factors initialized to 1, the closed user-factor update is the
    # user's mean rating; user factors are quantized round(., 6)
    # DECIMAL before the item-side update so every cross-user sum is
    # DECIMAL-exact (no double folds). Emits per-item factors and the
    # global reconstruction RMSE after the round.
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             CAST(round(avg(CAST(round(value, 2) AS DECIMAL(18,2))), 6)
                  AS DECIMAL(18,6)) AS rat
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, event_type
    ), u AS (
      SELECT user_id,
             CAST(round(CAST(sum(rat) AS DOUBLE) / count(*), 6)
                  AS DECIMAL(18,6)) AS uf
      FROM r GROUP BY user_id
    ), v AS (
      SELECT r.event_type,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(CAST(r.rat AS DECIMAL(20,6)) * u.uf) AS DOUBLE)
               / CAST(sum(CAST(u.uf AS DECIMAL(20,6)) * u.uf)
                      AS DOUBLE) AS vf
      FROM r JOIN u ON r.user_id = u.user_id
      GROUP BY r.event_type
    ), e AS (
      SELECT r.event_type, v.n_users, v.vf,
             CAST(sum(CAST(round(
               pow(CAST(r.rat AS DOUBLE)
                   - CAST(u.uf AS DOUBLE) * v.vf, 2), 9)
               AS DECIMAL(28,9))) AS DOUBLE) AS sse,
             CAST(count(*) AS BIGINT) AS n_cells
      FROM r JOIN u ON r.user_id = u.user_id
      JOIN v ON r.event_type = v.event_type
      GROUP BY r.event_type, v.n_users, v.vf
    )
    SELECT event_type, n_users,
           round(vf, 6) AS item_factor,
           round(sqrt(sse / n_cells), 6) AS rmse
    FROM e
    """,
)
def ml_als_rank1(spark, sf_dir):
    """Rank-1 ALS round: ratings matrix as a grouped mean (DECIMAL),
    user factors = quantized row means, item factors = exact-DECIMAL
    weighted ratios, per-item RMSE from round-9 quantized squared
    errors. One fact shuffle per step — the O(nnz) ALS shape."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    r = ev.groupBy("user_id", "event_type").agg(
        F.round(
            F.avg(F.round("value", 2).cast("decimal(18,2)")), 6
        )
        .cast("decimal(18,6)")
        .alias("rat")
    )
    u = r.groupBy("user_id").agg(
        F.round(
            F.sum("rat").cast("double") / F.count(F.lit(1)), 6
        )
        .cast("decimal(18,6)")
        .alias("uf")
    )
    ru = r.join(u, "user_id")
    v = ru.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (
            F.sum(F.col("rat").cast("decimal(20,6)") * F.col("uf"))
            .cast("double")
            / F.sum(F.col("uf").cast("decimal(20,6)") * F.col("uf"))
            .cast("double")
        ).alias("vf"),
    )
    err = F.round(
        F.pow(
            F.col("rat").cast("double")
            - F.col("uf").cast("double") * F.col("vf"),
            2,
        ),
        9,
    ).cast("decimal(28,9)")
    e = (
        ru.join(v, "event_type")
        .groupBy("event_type", "n_users", "vf")
        .agg(
            F.sum(err).cast("double").alias("sse"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        )
    )
    return e.select(
        "event_type",
        "n_users",
        F.round("vf", 6).alias("item_factor"),
        F.round(F.sqrt(F.col("sse") / F.col("n_cells")), 6).alias(
            "rmse"
        ),
    )


@query(
    "events_matched_att",
    # Covariate-matched treatment effect (the DiD row's sibling):
    # each treated user (first event = 'view') is matched to the
    # nearest CONTROL cell by pre-period activity count, and ATT =
    # mean over matched treated of (y_treated - y_matched_control).
    # Matching is the union-window as-of idiom — last/first_value
    # IGNORE NULLS over (n_pre, is_treated, user) order — never an
    # all-pairs join, so it scales like a sort. Control cells are
    # keyed by n_pre with the min-user representative (struct-min);
    # backward wins distance ties. Outcomes are 6-dp decimal means;
    # ATT terms quantized DECIMAL pre-sum.
    oracle="""
    WITH span AS (
      SELECT (CAST(floor(epoch(min(ts))) AS BIGINT)
              + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS mid
      FROM events
    ), u AS (
      SELECT user_id,
             CAST(CASE WHEN arg_min(event_type, ts) = 'view'
                  THEN 1 ELSE 0 END AS BIGINT) AS treated,
             CAST(count(*) FILTER (
               WHERE floor(epoch(ts)) < mid) AS BIGINT) AS n_pre,
             CAST(round(avg(CASE WHEN floor(epoch(ts)) >= mid
                            THEN value END), 6) AS DECIMAL(18,6)) AS y
      FROM events CROSS JOIN span
      WHERE value IS NOT NULL
      GROUP BY user_id, mid
    ), uu AS (
      SELECT * FROM u WHERE y IS NOT NULL AND n_pre > 0
    ), ctrl AS (
      SELECT n_pre,
             CAST(arg_min(y, user_id) AS DECIMAL(18,6)) AS cy
      FROM uu WHERE treated = 0 GROUP BY n_pre
    ), unioned AS (
      SELECT n_pre, 0 AS is_t, NULL::BIGINT AS user_id,
             NULL::DECIMAL(18,6) AS y, cy, n_pre AS cnp
      FROM ctrl
      UNION ALL
      SELECT n_pre, 1, user_id, y, NULL, NULL
      FROM uu WHERE treated = 1
    ), scanned AS (
      SELECT n_pre, is_t, user_id, y,
             last_value(cy IGNORE NULLS) OVER wb AS bcy,
             last_value(cnp IGNORE NULLS) OVER wb AS bnp,
             first_value(cy IGNORE NULLS) OVER wf AS fcy,
             first_value(cnp IGNORE NULLS) OVER wf AS fnp
      FROM unioned
      WINDOW wb AS (ORDER BY n_pre, is_t, user_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (ORDER BY n_pre, is_t, user_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ), matched AS (
      SELECT n_pre, user_id, y,
             CASE WHEN bnp IS NOT NULL AND (fnp IS NULL
                       OR n_pre - bnp <= fnp - n_pre)
                  THEN bcy ELSE fcy END AS my,
             CASE WHEN bnp IS NOT NULL AND (fnp IS NULL
                       OR n_pre - bnp <= fnp - n_pre)
                  THEN n_pre - bnp ELSE fnp - n_pre END AS dist
      FROM scanned WHERE is_t = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_treated,
           round(CAST(sum(CAST(y - my AS DECIMAL(20,6))) AS DOUBLE)
                 / count(*), 6) AS att,
           CAST(sum(dist) AS BIGINT) AS total_match_distance
    FROM matched WHERE my IS NOT NULL
    """,
)
def events_matched_att(spark, sf_dir):
    """Matched ATT: pre-period covariate per user, control cells by
    covariate value, union + two IGNORE-NULLS window scans for the
    bidirectional nearest match, decimal-exact effect sum."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    span = ev.agg(
        (
            (
                F.floor(F.min(F.col("ts").cast("double"))).cast("bigint")
                + F.floor(F.max(F.col("ts").cast("double"))).cast(
                    "bigint"
                )
            )
            / 2
        )
        .cast("bigint")
        .alias("mid")
    )
    sec = F.floor(F.col("ts").cast("double")).cast("bigint")
    u = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.when(
                F.min(F.struct(F.col("ts"), F.col("event_type")))[
                    "event_type"
                ]
                == "view",
                F.lit(1),
            )
            .otherwise(0)
            .cast("bigint")
            .alias("treated"),
            F.count_if(sec < F.col("mid"))
            .cast("bigint")
            .alias("n_pre"),
            F.round(
                F.avg(
                    F.when(sec >= F.col("mid"), F.col("value"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("y"),
        )
    )
    uu = u.filter(F.col("y").isNotNull() & (F.col("n_pre") > 0))
    ctrl = (
        uu.filter(F.col("treated") == 0)
        .groupBy("n_pre")
        .agg(
            F.min(F.struct("user_id", "y"))["y"]
            .cast("decimal(18,6)")
            .alias("cy")
        )
    )
    unioned = ctrl.select(
        "n_pre",
        F.lit(0).alias("is_t"),
        F.lit(None).cast("bigint").alias("user_id"),
        F.lit(None).cast("decimal(18,6)").alias("y"),
        "cy",
        F.col("n_pre").alias("cnp"),
    ).unionByName(
        uu.filter(F.col("treated") == 1).select(
            "n_pre",
            F.lit(1).alias("is_t"),
            "user_id",
            "y",
            F.lit(None).cast("decimal(18,6)").alias("cy"),
            F.lit(None).cast("bigint").alias("cnp"),
        )
    )
    wb = W.orderBy("n_pre", "is_t", "user_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wf = W.orderBy("n_pre", "is_t", "user_id").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    scanned = unioned.select(
        "n_pre",
        "is_t",
        "user_id",
        "y",
        F.last("cy", ignorenulls=True).over(wb).alias("bcy"),
        F.last("cnp", ignorenulls=True).over(wb).alias("bnp"),
        F.first("cy", ignorenulls=True).over(wf).alias("fcy"),
        F.first("cnp", ignorenulls=True).over(wf).alias("fnp"),
    )
    back = F.col("bnp").isNotNull() & (
        F.col("fnp").isNull()
        | (
            F.col("n_pre") - F.col("bnp")
            <= F.col("fnp") - F.col("n_pre")
        )
    )
    matched = scanned.filter(F.col("is_t") == 1).select(
        "n_pre",
        "user_id",
        "y",
        F.when(back, F.col("bcy")).otherwise(F.col("fcy")).alias("my"),
        F.when(back, F.col("n_pre") - F.col("bnp"))
        .otherwise(F.col("fnp") - F.col("n_pre"))
        .alias("dist"),
    )
    return matched.filter(F.col("my").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_treated"),
        F.round(
            F.sum((F.col("y") - F.col("my")).cast("decimal(20,6)"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("att"),
        F.sum("dist").cast("bigint").alias("total_match_distance"),
    )


@query(
    "ml_croston_forecast",
    # Croston's method for INTERMITTENT demand (the sparse-series
    # case naive EWMA mishandles): per part, demand days are the
    # distinct ship-days with any lineitem; z = zero-seeded EWMA of
    # the demand sizes over the nonzero subsequence, p = the same
    # EWMA of the inter-demand-day gaps; forecast = z / p. Both
    # EWMAs use the codegen closed form sum(a (1-a)^(n-i) x_i) — the
    # ewma_5min discipline, alpha = 0.2 literal — over the bounded
    # per-part sequences (l_partkey < 40).
    oracle="""
    WITH dd AS (
      SELECT l_partkey,
             CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS size
      FROM lineitem WHERE l_partkey < 40
      GROUP BY l_partkey, day
    ), seq AS (
      SELECT l_partkey, size,
             day - lag(day) OVER w AS gap,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY l_partkey) AS n
      FROM dd WINDOW w AS (PARTITION BY l_partkey ORDER BY day)
    ), z AS (
      SELECT l_partkey, max(n) AS n_demands,
             round(sum(0.2 * pow(0.8, n - rn) * size), 6) AS z_hat,
             round(sum(CASE WHEN gap IS NOT NULL
                       THEN 0.2 * pow(0.8, n - rn) * gap END), 6)
               AS p_hat
      FROM seq GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(n_demands AS BIGINT) AS n_demands,
           z_hat, p_hat,
           round(z_hat / p_hat, 6) AS croston_rate
    FROM z WHERE p_hat > 0
    """,
)
def ml_croston_forecast(spark, sf_dir):
    """Croston: one (part, day) aggregate, one lag/row_number window
    per part, two closed-form EWMAs, one ratio. pow(0.8, k) at k up
    to |days| underflows gracefully and sits at O(1) — inside the
    audit margin, same class as the flagship ewma."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 40)
    dd = li.groupBy(
        "l_partkey",
        F.floor(F.col("l_shipdate").cast("double") / 86400)
        .cast("bigint")
        .alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("size"))
    w = W.partitionBy("l_partkey").orderBy("day")
    seq = dd.select(
        "l_partkey",
        "size",
        (F.col("day") - F.lag("day").over(w)).alias("gap"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("l_partkey")).alias("n"),
    )
    wgt = 0.2 * F.pow(F.lit(0.8), F.col("n") - F.col("rn"))
    z = seq.groupBy("l_partkey").agg(
        F.max("n").cast("bigint").alias("n_demands"),
        F.round(F.sum(wgt * F.col("size")), 6).alias("z_hat"),
        F.round(
            F.sum(
                F.when(F.col("gap").isNotNull(), wgt * F.col("gap"))
            ),
            6,
        ).alias("p_hat"),
    )
    return z.filter(F.col("p_hat") > 0).select(
        "l_partkey",
        "n_demands",
        "z_hat",
        "p_hat",
        F.round(F.col("z_hat") / F.col("p_hat"), 6).alias(
            "croston_rate"
        ),
    )
