"""Fifteenth analytics wave (round 7): Hampel outlier filter, Theil
inequality index, NDCG@k ranking quality, classification
precision/recall/F1, ridge regression, and rolling regression slope.

Determinism notes:
- Hampel's rolling median and MAD are EXACT SELECTIONS (odd windows,
  array-sort + element_at) on identically-constructed doubles — no
  interpolation, no arithmetic on the selected values;
- Theil follows the chi-square pattern: per-row term rounded to 9 dp,
  summed in DECIMAL(38,9);
- NDCG per-position weights are ln(i+1) of the same 10 small integers
  in both engines (any cross-libm divergence would break EVERY row at
  the smallest tier — a loud failure, not a scale landmine);
- ridge moments are exact DECIMAL sums; the 3x3 Cramer solve is one
  double chain;
- the rolling slope uses integer row indices (never epoch doubles) so
  every windowed moment is an exact integer/decimal sum.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t
from .llm import _LANG_ID_ORACLE, doc_lang_id_heuristic

# --------------------------------------------------------------------------
# Hampel filter — rolling-median/MAD outliers on the minute series
# --------------------------------------------------------------------------


@query(
    "ts_hampel_filter",
    # Classic Hampel identifier over each event type's per-minute mean
    # series: a point is an outlier when |x - med7| > 3 * 1.4826 *
    # MAD7 over the centered 7-point window. Only full windows emit
    # (odd count -> median and MAD are exact element selections).
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*) AS v
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT event_type, minute, v,
             list(v) OVER (PARTITION BY event_type ORDER BY minute
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win
      FROM s
    ), m AS (
      SELECT event_type, minute, v,
             list_sort(win)[4] AS med
      FROM w WHERE len(win) = 7
    ), d AS (
      SELECT m.event_type, m.minute, m.v, m.med,
             list_sort(list_transform(w.win, x -> abs(x - m.med)))[4] AS mad
      FROM m JOIN w ON m.event_type = w.event_type AND m.minute = w.minute
    )
    SELECT event_type, minute, round(v, 6) AS value,
           round(med, 6) AS rolling_med, round(mad, 6) AS mad
    FROM d
    WHERE abs(v - med) > 3 * 1.4826 * mad
    """,
)
def ts_hampel_filter(spark, sf_dir):
    """Hampel outliers on the bounded minute-series aggregate: one
    fact shuffle into (type, minute) cells, one partitioned window
    collecting the 7-point neighborhood, in-row array algebra — the
    aggregate-first shape that never windows raw rows."""
    ev = t(spark, sf_dir, "events")
    dec = F.round("value", 6).cast("decimal(18,6)")
    s = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 60).cast("bigint").alias("minute"),
    ).agg((F.sum(dec).cast("double") / F.count("*")).alias("v"))
    win7 = (
        W.partitionBy("event_type").orderBy("minute").rowsBetween(-3, 3)
    )
    w = s.select(
        "event_type", "minute", "v", F.collect_list("v").over(win7).alias("win")
    ).filter(F.size("win") == 7)
    m = w.select(
        "event_type",
        "minute",
        "v",
        "win",
        F.array_sort("win")[3].alias("med"),
    )
    d = m.select(
        "event_type",
        "minute",
        "v",
        "med",
        F.array_sort(
            F.transform("win", lambda x: F.abs(x - F.col("med")))
        )[3].alias("mad"),
    )
    return (
        d.filter(F.abs(F.col("v") - F.col("med")) > 3 * 1.4826 * F.col("mad"))
        .select(
            "event_type",
            "minute",
            F.round("v", 6).alias("value"),
            F.round("med", 6).alias("rolling_med"),
            F.round("mad", 6).alias("mad"),
        )
    )


# --------------------------------------------------------------------------
# Theil T inequality index
# --------------------------------------------------------------------------


@query(
    "agg_theil_index",
    # Theil T per event type over value: (1/n) sum (x/mu) ln(x/mu),
    # mu = exact-decimal-sum / n (identical chain). Per-row terms
    # round to 9 dp and sum in DECIMAL(38,9) — accumulation order can
    # never flip the hash (the chi-square pattern).
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DECIMAL(38,6)) AS s
      FROM events GROUP BY event_type
    ), terms AS (
      -- x = 0 contributes lim x->0 (x/mu)ln(x/mu) = 0 (events carry
      -- exact zeros at sf0.1+; unguarded ln(0) is an error)
      SELECT e.event_type, g.n,
             CASE WHEN round(e.value, 6) > 0 THEN
               round((round(e.value, 6) / (CAST(g.s AS DOUBLE) / g.n))
                     * ln(round(e.value, 6) / (CAST(g.s AS DOUBLE) / g.n)),
                     9) ELSE 0 END AS term
      FROM events e JOIN g ON e.event_type = g.event_type
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           round(CAST(sum(CAST(term AS DECIMAL(20,9))) AS DOUBLE)
                 / max(n), 6) AS theil_t
    FROM terms GROUP BY event_type
    """,
)
def agg_theil_index(spark, sf_dir):
    """Theil T index: one aggregate for the per-type mean (bounded,
    broadcast back), one map-side term pass, one decimal-sum reduce —
    two scans, zero wide rows, the 100 TB inequality-audit shape."""
    ev = t(spark, sf_dir, "events")
    dec = F.round("value", 6).cast("decimal(18,6)")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("decimal(38,6)").alias("s"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    x = F.round("value", 6)
    terms = ev.join(F.broadcast(g), "event_type").select(
        "event_type",
        "n",
        F.when(x > 0, F.round((x / mu) * F.log(x / mu), 9))
        .otherwise(F.lit(0.0))
        .alias("term"),
    )
    return terms.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(
            F.sum(F.col("term").cast("decimal(20,9)")).cast("double")
            / F.max("n"),
            6,
        ).alias("theil_t"),
    )


# --------------------------------------------------------------------------
# NDCG@10 ranking quality
# --------------------------------------------------------------------------


@query(
    "ml_ndcg_at_k",
    # Per user: the arrival-order ranking (ts, event_id) of the first
    # 10 events scored by relevance = round(value, 6) against the
    # ideal ordering (relevance desc, ts, event_id). Gains are linear
    # (rel / log2(pos+1)); log2 via ln(pos+1)/ln(2) on the integers
    # 2..11 in both engines. Users with < 2 events drop (NDCG of a
    # single item is identically 1 — noise rows).
    oracle="""
    WITH r AS (
      SELECT user_id, round(value, 6) AS rel,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS pos,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY round(value, 6) DESC, ts, event_id)
               AS ideal_pos,
             count(*) OVER (PARTITION BY user_id) AS cnt
      FROM events
    ), d AS (
      SELECT user_id,
             sum(CASE WHEN pos <= 10
                      THEN rel / (ln(pos + 1) / ln(2)) END) AS dcg,
             sum(CASE WHEN ideal_pos <= 10
                      THEN rel / (ln(ideal_pos + 1) / ln(2)) END) AS idcg
      FROM r WHERE cnt >= 2 GROUP BY user_id
    )
    SELECT user_id, round(dcg / idcg, 6) AS ndcg10
    FROM d
    """,
)
def ml_ndcg_at_k(spark, sf_dir):
    """NDCG@10 per user: two row_number passes over ONE user_id
    exchange (same partitioning, local sorts only), then a per-user
    aggregate on the same key — a single fact shuffle end to end."""
    ev = t(spark, sf_dir, "events")
    rel = F.round("value", 6)
    wp = W.partitionBy("user_id").orderBy("ts", "event_id")
    wi = W.partitionBy("user_id").orderBy(
        F.round("value", 6).desc(), "ts", "event_id"
    )
    r = ev.select(
        "user_id",
        rel.alias("rel"),
        F.row_number().over(wp).alias("pos"),
        F.row_number().over(wi).alias("ideal_pos"),
        F.count("*").over(W.partitionBy("user_id")).alias("cnt"),
    ).filter(F.col("cnt") >= 2)
    ln2 = F.log(F.lit(2.0))
    d = r.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("pos") <= 10,
                F.col("rel") / (F.log(F.col("pos") + 1) / ln2),
            )
        ).alias("dcg"),
        F.sum(
            F.when(
                F.col("ideal_pos") <= 10,
                F.col("rel") / (F.log(F.col("ideal_pos") + 1) / ln2),
            )
        ).alias("idcg"),
    )
    return d.select(
        "user_id", F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg10")
    )


# --------------------------------------------------------------------------
# Multi-class precision / recall / F1 from the lang-id heuristic
# --------------------------------------------------------------------------


@query(
    "ml_confusion_metrics",
    # Per-true-class precision/recall/F1 of the stopword-vote language
    # classifier (doc_lang_id_heuristic), plus a '__macro__' row with
    # unweighted means. All counts are exact integers off the bounded
    # confusion relation; metrics are one double chain per class.
    # Zero-denominator classes report 0 (standard sklearn convention).
    oracle=f"""
    WITH conf AS ({_LANG_ID_ORACLE}),
    cls AS (SELECT DISTINCT lang FROM conf),
    tp AS (
      SELECT c.lang,
             CAST(coalesce(sum(CASE WHEN conf.pred_lang = c.lang
                                    THEN conf.n END), 0) AS BIGINT) AS tp,
             CAST(coalesce(sum(conf.n), 0) AS BIGINT) AS support
      FROM cls c LEFT JOIN conf ON conf.lang = c.lang
      GROUP BY c.lang
    ), pred AS (
      SELECT c.lang,
             CAST(coalesce(sum(conf.n), 0) AS BIGINT) AS n_pred
      FROM cls c LEFT JOIN conf ON conf.pred_lang = c.lang
      GROUP BY c.lang
    ), m AS (
      SELECT tp.lang, tp.tp, tp.support, pred.n_pred,
             CASE WHEN pred.n_pred = 0 THEN 0.0
                  ELSE CAST(tp.tp AS DOUBLE) / pred.n_pred END AS p,
             CASE WHEN tp.support = 0 THEN 0.0
                  ELSE CAST(tp.tp AS DOUBLE) / tp.support END AS r
      FROM tp JOIN pred ON tp.lang = pred.lang
    ), px AS (
      SELECT lang, support, p, r,
             CASE WHEN p + r = 0 THEN 0.0
                  ELSE 2 * p * r / (p + r) END AS f1
      FROM m
    )
    SELECT lang, support, round(p, 6) AS precision_,
           round(r, 6) AS recall_, round(f1, 6) AS f1
    FROM px
    UNION ALL
    SELECT '__macro__' AS lang, CAST(sum(support) AS BIGINT) AS support,
           round(avg(p), 6) AS precision_, round(avg(r), 6) AS recall_,
           round(avg(f1), 6) AS f1
    FROM px
    """,
)
def ml_confusion_metrics(spark, sf_dir):
    """Classification metrics off the bounded (true, pred, n)
    confusion relation — the heavy work is the classifier's one scan;
    everything here is algebra on <= |classes|^2 rows."""
    conf = doc_lang_id_heuristic(spark, sf_dir).localCheckpoint(eager=True)
    cls = conf.select("lang").distinct()
    tp = (
        cls.join(conf, "lang", "left")
        .groupBy("lang")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("pred_lang") == F.col("lang"), F.col("n"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tp"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("support"),
        )
    )
    pred = (
        cls.join(conf, cls["lang"] == conf["pred_lang"], "left")
        .groupBy(cls["lang"])
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_pred"))
    )
    m = tp.join(pred, "lang").select(
        "lang",
        "support",
        F.when(F.col("n_pred") == 0, F.lit(0.0))
        .otherwise(F.col("tp").cast("double") / F.col("n_pred"))
        .alias("p"),
        F.when(F.col("support") == 0, F.lit(0.0))
        .otherwise(F.col("tp").cast("double") / F.col("support"))
        .alias("r"),
    )
    px = m.select(
        "lang",
        "support",
        "p",
        "r",
        F.when(F.col("p") + F.col("r") == 0, F.lit(0.0))
        .otherwise(2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r")))
        .alias("f1"),
    )
    per_class = px.select(
        "lang",
        "support",
        F.round("p", 6).alias("precision_"),
        F.round("r", 6).alias("recall_"),
        F.round("f1", 6).alias("f1"),
    )
    macro = px.agg(
        F.lit("__macro__").alias("lang"),
        F.sum("support").cast("bigint").alias("support"),
        F.round(F.avg("p"), 6).alias("precision_"),
        F.round(F.avg("r"), 6).alias("recall_"),
        F.round(F.avg("f1"), 6).alias("f1"),
    )
    return per_class.unionAll(macro)


# --------------------------------------------------------------------------
# Ridge regression (normal equations, closed form)
# --------------------------------------------------------------------------


@query(
    "ml_ridge_normal_eq",
    # Ridge on lineitem: l_extendedprice ~ l_quantity + l_discount,
    # lambda = 1000 (intercept NOT penalized via centered formulation
    # avoided — plain 3x3 (X'X + diag(0,L,L)) for transparency). All
    # seven moments are exact DECIMAL sums of 6-dp-rounded inputs; the
    # Cramer solve is one double chain.
    oracle="""
    WITH d AS (
      -- the DECIMAL(20,6) twin of each column forces DuckDB's HUGEINT
      -- multiply path (p<=18 products stay int64 and overflow on
      -- price^2); values are identical, only storage widens
      SELECT CAST(round(l_quantity, 6) AS DECIMAL(12,6)) AS x1,
             CAST(round(l_quantity, 6) AS DECIMAL(20,6)) AS x1w,
             CAST(round(l_discount, 6) AS DECIMAL(12,6)) AS x2,
             CAST(round(l_discount, 6) AS DECIMAL(20,6)) AS x2w,
             CAST(round(l_extendedprice, 6) AS DECIMAL(14,6)) AS y,
             CAST(round(l_extendedprice, 6) AS DECIMAL(20,6)) AS yw
      FROM lineitem
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x1) AS DECIMAL(38,6)) AS s1,
             CAST(sum(x2) AS DECIMAL(38,6)) AS s2,
             CAST(sum(y)  AS DECIMAL(38,6)) AS sy,
             CAST(sum(x1w*x1) AS DECIMAL(38,12)) AS s11,
             CAST(sum(x1w*x2) AS DECIMAL(38,12)) AS s12,
             CAST(sum(x2w*x2) AS DECIMAL(38,12)) AS s22,
             CAST(sum(x1w*y) AS DECIMAL(38,12)) AS s1y,
             CAST(sum(x2w*y) AS DECIMAL(38,12)) AS s2y
      FROM d
    ), a AS (
      SELECT CAST(n AS DOUBLE) AS a11, CAST(s1 AS DOUBLE) AS a12,
             CAST(s2 AS DOUBLE) AS a13,
             CAST(s1 AS DOUBLE) AS a21,
             CAST(s11 AS DOUBLE) + 1000 AS a22, CAST(s12 AS DOUBLE) AS a23,
             CAST(s2 AS DOUBLE) AS a31, CAST(s12 AS DOUBLE) AS a32,
             CAST(s22 AS DOUBLE) + 1000 AS a33,
             CAST(sy AS DOUBLE) AS b1, CAST(s1y AS DOUBLE) AS b2,
             CAST(s2y AS DOUBLE) AS b3
      FROM m WHERE n > 0
    )
    SELECT
      round(( b1*(a22*a33 - a23*a32) - a12*(b2*a33 - a23*b3)
              + a13*(b2*a32 - a22*b3))
            / (a11*(a22*a33 - a23*a32) - a12*(a21*a33 - a23*a31)
               + a13*(a21*a32 - a22*a31)), 6) AS intercept,
      round(( a11*(b2*a33 - a23*b3) - b1*(a21*a33 - a23*a31)
              + a13*(a21*b3 - b2*a31))
            / (a11*(a22*a33 - a23*a32) - a12*(a21*a33 - a23*a31)
               + a13*(a21*a32 - a22*a31)), 6) AS coef_qty,
      round(( a11*(a22*b3 - b2*a32) - a12*(a21*b3 - b2*a31)
              + b1*(a21*a32 - a22*a31))
            / (a11*(a22*a33 - a23*a32) - a12*(a21*a33 - a23*a31)
               + a13*(a21*a32 - a22*a31)), 6) AS coef_disc
    FROM a
    """,
)
def ml_ridge_normal_eq(spark, sf_dir):
    """Ridge closed form: ONE codegen hash aggregate for the 9
    moments (map-side partial), then a scalar 3x3 Cramer solve — the
    shape that fits any feature count k with O(k^2) state, one pass,
    no iteration."""
    li = t(spark, sf_dir, "lineitem")
    x1 = F.round("l_quantity", 6).cast("decimal(12,6)")
    x2 = F.round("l_discount", 6).cast("decimal(12,6)")
    y = F.round("l_extendedprice", 6).cast("decimal(14,6)")
    m = li.agg(
        F.count("*").alias("n"),
        F.sum(x1).cast("decimal(38,6)").alias("s1"),
        F.sum(x2).cast("decimal(38,6)").alias("s2"),
        F.sum(y).cast("decimal(38,6)").alias("sy"),
        F.sum(x1 * x1).cast("decimal(38,12)").alias("s11"),
        F.sum(x1 * x2).cast("decimal(38,12)").alias("s12"),
        F.sum(x2 * x2).cast("decimal(38,12)").alias("s22"),
        F.sum(x1 * y).cast("decimal(38,12)").alias("s1y"),
        F.sum(x2 * y).cast("decimal(38,12)").alias("s2y"),
    ).filter(F.col("n") > 0)
    a = m.select(
        F.col("n").cast("double").alias("a11"),
        F.col("s1").cast("double").alias("a12"),
        F.col("s2").cast("double").alias("a13"),
        F.col("s1").cast("double").alias("a21"),
        (F.col("s11").cast("double") + 1000).alias("a22"),
        F.col("s12").cast("double").alias("a23"),
        F.col("s2").cast("double").alias("a31"),
        F.col("s12").cast("double").alias("a32"),
        (F.col("s22").cast("double") + 1000).alias("a33"),
        F.col("sy").cast("double").alias("b1"),
        F.col("s1y").cast("double").alias("b2"),
        F.col("s2y").cast("double").alias("b3"),
    )
    det = (
        F.col("a11") * (F.col("a22") * F.col("a33") - F.col("a23") * F.col("a32"))
        - F.col("a12") * (F.col("a21") * F.col("a33") - F.col("a23") * F.col("a31"))
        + F.col("a13") * (F.col("a21") * F.col("a32") - F.col("a22") * F.col("a31"))
    )
    d0 = (
        F.col("b1") * (F.col("a22") * F.col("a33") - F.col("a23") * F.col("a32"))
        - F.col("a12") * (F.col("b2") * F.col("a33") - F.col("a23") * F.col("b3"))
        + F.col("a13") * (F.col("b2") * F.col("a32") - F.col("a22") * F.col("b3"))
    )
    d1 = (
        F.col("a11") * (F.col("b2") * F.col("a33") - F.col("a23") * F.col("b3"))
        - F.col("b1") * (F.col("a21") * F.col("a33") - F.col("a23") * F.col("a31"))
        + F.col("a13") * (F.col("a21") * F.col("b3") - F.col("b2") * F.col("a31"))
    )
    d2 = (
        F.col("a11") * (F.col("a22") * F.col("b3") - F.col("b2") * F.col("a32"))
        - F.col("a12") * (F.col("a21") * F.col("b3") - F.col("b2") * F.col("a31"))
        + F.col("b1") * (F.col("a21") * F.col("a32") - F.col("a22") * F.col("a31"))
    )
    return a.select(
        F.round(d0 / det, 6).alias("intercept"),
        F.round(d1 / det, 6).alias("coef_qty"),
        F.round(d2 / det, 6).alias("coef_disc"),
    )


# --------------------------------------------------------------------------
# Rolling regression slope (trailing 20 events per user)
# --------------------------------------------------------------------------


@query(
    "win_rolling_slope",
    # Trailing-20 OLS slope of value against the in-user arrival index
    # (row_number — an exact integer x-axis; epoch doubles would put
    # 1e15 magnitudes through the moment algebra). Windowed moments
    # are exact integer/decimal sums; only full windows emit; the
    # slope is one double chain. Users < 40 keep the output a
    # deterministic spot-check relation.
    oracle="""
    WITH r AS (
      SELECT user_id,
             CAST(round(value, 6) AS DECIMAL(18,6)) AS y,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT) AS i
      FROM events WHERE user_id < 40
    ), w AS (
      SELECT user_id, i,
             CAST(count(*) OVER tw AS BIGINT) AS n,
             CAST(sum(i) OVER tw AS DECIMAL(38,0)) AS sx,
             CAST(sum(y) OVER tw AS DECIMAL(38,6)) AS sy,
             CAST(sum(i * i) OVER tw AS DECIMAL(38,0)) AS sxx,
             CAST(sum(i * CAST(y AS DECIMAL(28,6))) OVER tw
                  AS DECIMAL(38,6)) AS sxy
      FROM r
      WINDOW tw AS (PARTITION BY user_id ORDER BY i
                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, i AS pos,
           round((n * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope
    FROM w WHERE n = 20
    """,
)
def win_rolling_slope(spark, sf_dir):
    """Rolling OLS slope: the row_number pass and all four windowed
    moments share ONE user_id exchange (local sorts only) — a single
    fact shuffle end to end, per-user state O(window)."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    wp = W.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id",
        F.round("value", 6).cast("decimal(18,6)").alias("y"),
        F.row_number().over(wp).cast("bigint").alias("i"),
    )
    tw = W.partitionBy("user_id").orderBy("i").rowsBetween(-19, 0)
    w = r.select(
        "user_id",
        "i",
        F.count("*").over(tw).cast("bigint").alias("n"),
        F.sum("i").over(tw).cast("decimal(38,0)").alias("sx"),
        F.sum("y").over(tw).cast("decimal(38,6)").alias("sy"),
        F.sum(F.col("i") * F.col("i")).over(tw).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("i") * F.col("y").cast("decimal(28,6)"))
        .over(tw)
        .cast("decimal(38,6)")
        .alias("sxy"),
    ).filter(F.col("n") == 20)
    n = F.col("n")
    return w.select(
        "user_id",
        F.col("i").alias("pos"),
        F.round(
            (n * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (n * F.col("sxx").cast("double")
               - F.col("sx").cast("double") * F.col("sx").cast("double")),
            6,
        ).alias("slope"),
    )
