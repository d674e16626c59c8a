"""Round-11 wave 55: recursion, robust stats, survival, retrieval
eval, fractal scaling, richness, hard negatives.

sql_recursive_cte exercises Spark 4's WITH RECURSIVE (one verbatim
dialect-common statement, same text on both engines — the first
recursive row in the SQL front door). win_max_subarray is Kadane's
maximum-subarray as pure window algebra (prefix sums minus running
minimum prefix — one pass, fully integer). stat_hodges_lehmann and
stat_ansari_bradley are the rank/robust siblings the stat_ family
lacked (location via Walsh-average median on a calendar-bounded
relation; dispersion via an all-integer midrank score).
events_aalen_johansen is the competing-risks cumulative incidence
(the multi-cause generalization of surv_km_reorder / the logrank
pair). ml_map_mrr adds the retrieval-eval pair every ranking
pipeline reports. ts_dfa is detrended fluctuation analysis with
exact-integer profile numerators. agg_chao1_richness estimates
unseen-species mass (Chao1 + Good-Turing coverage).
emb_hard_negatives is the contrastive-training mining step: top-k
most-similar WRONG-label vectors per query.

Float discipline (docs/ROUND9_AUDIT + r10 sign-of-zero rule): money
and count sums are BIGINT/DECIMAL; every libm call (ln/exp) is
quantized at birth; double sums over relations are quantized to
DECIMAL pre-sum (engine sum order differs); no emission can be a
tiny negative that rounds to -0.0 (all clamped or structurally >= 0).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

# ---------------------------------------------------------------- recursion

_RCTE_STMT = """
WITH RECURSIVE up (k, cur, d) AS (
  SELECT s_suppkey, s_suppkey, CAST(0 AS BIGINT) FROM supplier
  UNION ALL
  SELECT k, CAST(floor(cur / 2.0) AS BIGINT), d + 1
  FROM up WHERE cur > 1
),
depth AS (
  SELECT k, CAST(max(d) AS BIGINT) AS depth FROM up GROUP BY k
)
SELECT depth,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(sum(CAST(round(s_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM depth JOIN supplier ON k = s_suppkey
GROUP BY depth
"""


@query("sql_recursive_cte", oracle=_RCTE_STMT)
def sql_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE through the catalog front door — supported by
    Spark since 4.0 (SPARK-24497), so the recursive ancestor walk
    (each supplier key halves until 1: depth = floor(log2 k)) runs as
    ONE verbatim statement on both engines. Scale: recursion depth is
    O(log max_key) — each iteration is one filter+project over the
    frontier, no joins; floor(cur/2.0) stays dialect-common (DuckDB
    CAST rounds, Spark truncates, but floor output is integral)."""
    from ..catalog import sql

    return sql(spark, sf_dir, _RCTE_STMT)


# ---------------------------------------------------------- window / Kadane


@query(
    "win_max_subarray",
    # Kadane as window algebra: best subarray ending at i =
    # prefix_i - min(0, min prefix before i); answer = max over i.
    # Signed series = value cents - 5000 (mean-ish threshold), so
    # runs of above/below-average events form the subarrays. Fully
    # integer end to end.
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 100, 0) AS BIGINT) - 5000 AS x
      FROM events
    ), p AS (
      SELECT user_id, x,
             CAST(sum(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS pre,
             ts, event_id
      FROM s
    ), b AS (
      SELECT user_id,
             pre - least(CAST(0 AS BIGINT), coalesce(
               CAST(min(pre) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS BIGINT),
               CAST(0 AS BIGINT))) AS ending_here
      FROM p
    )
    SELECT user_id,
           CAST(max(ending_here) AS BIGINT) AS best_run_cents,
           CAST(count(*) AS BIGINT) AS n_events
    FROM b GROUP BY user_id
    """,
)
def win_max_subarray(spark, sf_dir):
    """Maximum-subarray (Kadane) per user without a sequential fold:
    running prefix sum minus the running minimum prefix, both plain
    window functions — one user-keyed shuffle, codegen end to end,
    integer cents so the window sums are exact at any scale."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    x = (F.round(F.col("value") * 100, 0).cast("bigint") - 5000)
    pre = F.sum(x).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s = ev.select(
        "user_id", "ts", "event_id", pre.alias("pre")
    )
    minpre = F.min("pre").over(
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ending = F.col("pre") - F.least(
        F.lit(0).cast("bigint"),
        F.coalesce(minpre, F.lit(0).cast("bigint")),
    )
    return (
        s.select("user_id", ending.alias("ending_here"))
        .groupBy("user_id")
        .agg(
            F.max("ending_here").cast("bigint").alias("best_run_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


# ------------------------------------------------------------ robust stats


@query(
    "stat_hodges_lehmann",
    # HL location estimator per event_type: median of Walsh averages
    # (m_a + m_b)/2 over day-pairs a <= b of the DAILY mean value —
    # the calendar bounds the pair relation (<= ~31^2/2 per type at
    # any fact scale). Daily mean = exact cents / exact count (one
    # IEEE division); Walsh average and the interpolated median are
    # division-free IEEE, so both engines agree bit-for-bit.
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                  AS DOUBLE)
               / count(*) AS m
      FROM events GROUP BY event_type, day
    ), walsh AS (
      SELECT a.event_type, (a.m + b.m) / 2 AS w
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day <= b.day
    )
    SELECT w.event_type,
           CAST(d.n_days AS BIGINT) AS n_days,
           round(quantile_cont(w.w, 0.5) / 100, 6) AS hl_estimate
    FROM walsh w
    JOIN (SELECT event_type, count(*) AS n_days FROM daily
          GROUP BY event_type) d
      ON w.event_type = d.event_type
    GROUP BY w.event_type, d.n_days
    """,
)
def stat_hodges_lehmann(spark, sf_dir):
    """Hodges-Lehmann pseudo-median of daily mean value per event
    type: one fact shuffle to the (type, day) relation, then the
    Walsh self-join and interpolated median run on a calendar-bounded
    few hundred rows — the classic robust location estimate with a
    100 TB-safe shape (the quadratic step never touches fact rows)."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400)
        .cast("bigint")
        .alias("day"),
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    a = daily.select("event_type", F.col("day").alias("da"), F.col("m").alias("ma"))
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("db"),
        F.col("m").alias("mb"),
    )
    walsh = a.join(
        b,
        (a.event_type == b.et_b) & (a.da <= b.db),
    ).select("event_type", ((F.col("ma") + F.col("mb")) / 2).alias("w"))
    ndays = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        walsh.groupBy("event_type")
        .agg(F.expr("percentile(w, 0.5)").alias("med"))
        .join(ndays, "event_type")
        .select(
            "event_type",
            "n_days",
            F.round(F.col("med") / 100, 6).alias("hl_estimate"),
        )
    )


@query(
    "stat_ansari_bradley",
    # Ansari-Bradley dispersion test, click vs error values, midrank
    # tie handling on the value-grouped relation — the 2x-scaled
    # scores 2a(v) = min(2*below + cnt + 1, 2(N+1) - (2*below+cnt+1))
    # are INTEGERS (midranks step by 0.5), so the statistic and its
    # permutation moments are exact bigint sums; only the closing
    # z-ratio is IEEE. z can be a tiny +/- eps in principle, so the
    # emission normalizes sign-of-zero with + 0.0 (r10 -0.0 rule).
    oracle="""
    WITH pool AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(count(*) FILTER (WHERE event_type = 'click')
                  AS BIGINT) AS cnt1
      FROM events WHERE event_type IN ('click', 'error')
      GROUP BY v
    ), tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt1) AS BIGINT) AS n1
      FROM pool
    ), ranked AS (
      SELECT v, cnt, cnt1,
             CAST(coalesce(sum(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS below
      FROM pool
    ), scored AS (
      SELECT cnt, cnt1,
             least(2 * below + cnt + 1,
                   2 * (SELECT n FROM tot) + 2
                     - (2 * below + cnt + 1)) AS a2
      FROM ranked
    ), sums AS (
      SELECT CAST(sum(a2 * cnt1) AS BIGINT) AS ab2,
             CAST(sum(a2 * cnt) AS BIGINT) AS s1,
             CAST(sum(a2 * a2 * cnt) AS BIGINT) AS s2
      FROM scored
    )
    SELECT n1 AS n_click, n - n1 AS n_error,
           round(ab2 / 2.0, 6) AS ab_stat,
           round((ab2 / 2.0 - n1 * (s1 / 2.0) / n)
                 / sqrt(CAST(n1 AS DOUBLE) * (n - n1) / (n * (n - 1.0))
                        * (s2 / 4.0 - n * (s1 / 2.0 / n)
                                        * (s1 / 2.0 / n)))
                 + 0.0, 6) AS z
    FROM sums CROSS JOIN tot
    WHERE n > 0
    """,
)
def stat_ansari_bradley(spark, sf_dir):
    """Ansari-Bradley on the value-grouped relation: one groupBy to
    distinct cents, a window for cumulative counts, integer score
    algebra, one closing ratio — no per-row ranking shuffle, so the
    pooled-rank test costs one aggregation at any scale."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    pool = ev.groupBy(
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("bigint")
        .alias("cnt1"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
    ranked = pool.select(
        "cnt",
        "cnt1",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint").alias("below"),
    )
    tot = pool.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("cnt1").cast("bigint").alias("n1"),
    )
    scored = ranked.crossJoin(F.broadcast(tot)).select(
        "cnt",
        "cnt1",
        "n",
        "n1",
        F.least(
            2 * F.col("below") + F.col("cnt") + 1,
            2 * F.col("n") + 2 - (2 * F.col("below") + F.col("cnt") + 1),
        ).alias("a2"),
    )
    sums = scored.groupBy("n", "n1").agg(
        F.sum(F.col("a2") * F.col("cnt1")).cast("bigint").alias("ab2"),
        F.sum(F.col("a2") * F.col("cnt")).cast("bigint").alias("s1"),
        F.sum(F.col("a2") * F.col("a2") * F.col("cnt"))
        .cast("bigint")
        .alias("s2"),
    )
    n, n1 = F.col("n"), F.col("n1")
    mean_a = (F.col("s1") / 2.0) / n
    var = (
        n1.cast("double")
        * (n - n1)
        / (n * (n - 1.0))
        * (F.col("s2") / 4.0 - n * mean_a * mean_a)
    )
    return sums.select(
        n1.alias("n_click"),
        (n - n1).alias("n_error"),
        F.round(F.col("ab2") / 2.0, 6).alias("ab_stat"),
        F.round(
            (F.col("ab2") / 2.0 - n1 * mean_a) / F.sqrt(var) + 0.0, 6
        ).alias("z"),
    )


# ------------------------------------------------------------ richness


@query(
    "agg_chao1_richness",
    # Chao1 species-richness and Good-Turing coverage per event_type,
    # species = user_id: D observed, f1 singletons, f2 doubletons;
    # chao1 = D + f1(f1-1)/(2(f2+1)) (bias-corrected, div-zero-free),
    # coverage = 1 - f1/N. The unseen-mass estimate every corpus
    # profiler wants; everything integer until the closing divisions.
    oracle="""
    WITH per AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS d_observed,
           CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS f1,
           CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS f2,
           round(count(*)
                 + (count(*) FILTER (WHERE c = 1))
                   * (count(*) FILTER (WHERE c = 1) - 1.0)
                   / (2.0 * ((count(*) FILTER (WHERE c = 2)) + 1)),
                 6) AS chao1,
           round(1.0 - CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE)
                       / sum(c), 6) AS gt_coverage
    FROM per GROUP BY event_type
    """,
)
def agg_chao1_richness(spark, sf_dir):
    """Two partial-aggregating shuffles ((type,user) then type) —
    the frequency-of-frequencies profile compresses at the map side,
    so the estimator costs a groupBy at any scale."""
    ev = t(spark, sf_dir, "events")
    per = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    d = F.count(F.lit(1)).cast("bigint")
    f1 = F.count(F.when(F.col("c") == 1, 1)).cast("bigint")
    f2 = F.count(F.when(F.col("c") == 2, 1)).cast("bigint")
    return per.groupBy("event_type").agg(
        d.alias("d_observed"),
        f1.alias("f1"),
        f2.alias("f2"),
        F.round(
            d + f1 * (f1 - 1.0) / (2.0 * (f2 + 1)), 6
        ).alias("chao1"),
        F.round(
            1.0 - f1.cast("double") / F.sum("c"), 6
        ).alias("gt_coverage"),
    )


# -------------------------------------------------------- retrieval eval


@query(
    "ml_map_mrr",
    # MAP@10 + MRR: per user the "retrieved list" is the top-10
    # events by (value DESC, event_id), relevant = purchase. AP@10
    # normalizes by min(total relevant, 10); users with no purchases
    # are excluded (standard). P@k terms and the per-user ap/rr are
    # DECIMAL-quantized before every cross-row sum (engine sum order
    # differs); all inputs are exact-integer ratios.
    oracle="""
    WITH ranked AS (
      SELECT user_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id) AS rk
      FROM events
    ), rtot AS (
      SELECT user_id, CAST(sum(rel) AS BIGINT) AS r_total
      FROM ranked GROUP BY user_id
    ), top AS (
      SELECT user_id, rel, rk,
             CAST(sum(rel) OVER (PARTITION BY user_id ORDER BY rk)
                  AS BIGINT) AS cum
      FROM ranked WHERE rk <= 10
    ), peru AS (
      SELECT t.user_id,
             CAST(sum(CASE WHEN rel = 1 THEN
                 CAST(round(CAST(cum AS DOUBLE) / rk, 12)
                      AS DECIMAL(18,12))
               ELSE CAST(0 AS DECIMAL(18,12)) END) AS DOUBLE)
               / least(r.r_total, 10) AS ap,
             coalesce(max(CASE WHEN rel = 1 AND cum = 1
                               THEN 1.0 / rk END), 0.0) AS rr
      FROM top t JOIN rtot r ON t.user_id = r.user_id
      WHERE r.r_total > 0
      GROUP BY t.user_id, r.r_total
    )
    SELECT user_id % 10 AS bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(CAST(round(ap, 9) AS DECIMAL(18,9)))
                      AS DOUBLE) / count(*), 6) AS map10,
           round(CAST(sum(CAST(round(rr, 9) AS DECIMAL(18,9)))
                      AS DOUBLE) / count(*), 6) AS mrr
    FROM peru GROUP BY bucket
    """,
)
def ml_map_mrr(spark, sf_dir):
    """Retrieval eval over per-user ranked lists: one user-keyed
    window pass builds ranks and cumulative relevance, the AP/RR
    algebra runs on <= 10 rows per user, and the bucket rollup is a
    second tiny shuffle — no per-pair work anywhere."""
    ev = t(spark, sf_dir, "events")
    rel = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    wr = W.partitionBy("user_id").orderBy(
        F.col("value").desc(), "event_id"
    )
    ranked = ev.select(
        "user_id",
        rel.alias("rel"),
        F.row_number().over(wr).alias("rk"),
    )
    rtot = ranked.groupBy("user_id").agg(
        F.sum("rel").cast("bigint").alias("r_total")
    )
    top = ranked.filter(F.col("rk") <= 10).withColumn(
        "cum",
        F.sum("rel")
        .over(W.partitionBy("user_id").orderBy("rk"))
        .cast("bigint"),
    )
    pk = F.when(
        F.col("rel") == 1,
        F.round(F.col("cum").cast("double") / F.col("rk"), 12).cast(
            "decimal(18,12)"
        ),
    ).otherwise(F.lit(0).cast("decimal(18,12)"))
    peru = (
        top.join(rtot, "user_id")
        .filter(F.col("r_total") > 0)
        .groupBy("user_id", "r_total")
        .agg(
            (
                F.sum(pk).cast("double")
                / F.least(F.col("r_total"), F.lit(10))
            ).alias("ap"),
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("rel") == 1) & (F.col("cum") == 1),
                        1.0 / F.col("rk"),
                    )
                ),
                F.lit(0.0),
            ).alias("rr"),
        )
    )
    return peru.groupBy((F.col("user_id") % 10).alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(
            F.sum(F.round("ap", 9).cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("map10"),
        F.round(
            F.sum(F.round("rr", 9).cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mrr"),
    )


# ---------------------------------------------------- competing risks


@query(
    "events_aalen_johansen",
    # Aalen-Johansen cumulative incidence with two competing causes:
    # per user, duration (hours from first event) to the FIRST
    # purchase-or-error (cause = whichever arrives first, (ts,
    # event_id)-ordered); users with neither are censored at their
    # last event. n(u) via a suffix sum over the all-durations
    # histogram; overall survival via exp of the DECIMAL-summed
    # round-9 ln(1 - d/n); each CIF increment S(u-) d_k(u)/n(u)
    # quantized DECIMAL(28,12) pre-sum. CIF >= 0 structurally (sums
    # of positive terms), so no -0.0 hazard.
    oracle="""
    WITH ue AS (
      SELECT user_id, event_type, epoch(ts) AS te, event_id
      FROM events
    ), span AS (
      SELECT user_id, min(te) AS t0, max(te) AS tlast
      FROM ue GROUP BY user_id
    ), ce AS (
      SELECT user_id, event_type, te,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY te, event_id) AS rn
      FROM ue WHERE event_type IN ('purchase', 'error')
    ), firstc AS (
      SELECT user_id, event_type AS cause, te AS tc
      FROM ce WHERE rn = 1
    ), dur AS (
      SELECT s.user_id,
             CASE WHEN f.user_id IS NULL
                  THEN CAST(floor((s.tlast - s.t0) / 3600) AS BIGINT)
                  ELSE CAST(floor((f.tc - s.t0) / 3600) AS BIGINT)
             END AS dur,
             coalesce(f.cause, 'censored') AS status
      FROM span s LEFT JOIN firstc f ON s.user_id = f.user_id
    ), hist AS (
      SELECT dur AS u, CAST(count(*) AS BIGINT) AS cnt,
             CAST(count(*) FILTER (WHERE status = 'purchase')
                  AS BIGINT) AS dp,
             CAST(count(*) FILTER (WHERE status = 'error')
                  AS BIGINT) AS de
      FROM dur GROUP BY dur
    ), risk AS (
      SELECT u, dp, de,
             CAST(sum(cnt) OVER (ORDER BY u DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n
      FROM hist
    ), lns AS (
      SELECT u, dp, de, n,
             CASE WHEN dp + de = 0 THEN CAST(0 AS DECIMAL(28,9))
                  WHEN n > dp + de THEN
                    CAST(round(ln(1.0 - CAST(dp + de AS DOUBLE) / n),
                               9) AS DECIMAL(28,9))
                  ELSE NULL END AS l
      FROM risk
    ), surv AS (
      SELECT u, dp, de, n,
             CAST(coalesce(sum(l) OVER (ORDER BY u
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS DECIMAL(28,9))) AS DECIMAL(28,9)) AS lpre
      FROM lns
    ), terms AS (
      SELECT u,
             CAST(round(exp(CAST(lpre AS DOUBLE)) * dp / n, 12)
                  AS DECIMAL(28,12)) AS tp,
             CAST(round(exp(CAST(lpre AS DOUBLE)) * de / n, 12)
                  AS DECIMAL(28,12)) AS te
      FROM surv WHERE dp + de > 0
    ), nu AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users FROM dur
    )
    SELECT h.h AS horizon_h, nu.n_users,
           round(coalesce(CAST(sum(tp) AS DOUBLE), 0.0), 6)
             AS cif_purchase,
           round(coalesce(CAST(sum(te) AS DOUBLE), 0.0), 6)
             AS cif_error
    FROM (VALUES (CAST(72 AS BIGINT)), (CAST(168 AS BIGINT)),
                 (CAST(336 AS BIGINT))) h(h)
    CROSS JOIN nu
    LEFT JOIN terms ON terms.u <= h.h
    GROUP BY h.h, nu.n_users
    """,
)
def events_aalen_johansen(spark, sf_dir):
    """Competing-risks CIF on a calendar-bounded grid: one shuffle to
    per-user spans/first-causes, then the estimator runs on the
    <= 720-row duration histogram (suffix-sum risk sets, decimal-
    summed log-survival, quantized increments) — fact rows are
    touched exactly twice regardless of scale."""
    ev = t(spark, sf_dir, "events")
    te = F.col("ts").cast("double")
    span = ev.groupBy("user_id").agg(
        F.min(te).alias("t0"), F.max(te).alias("tlast")
    )
    ce = ev.filter(
        F.col("event_type").isin("purchase", "error")
    ).select(
        "user_id",
        "event_type",
        te.alias("tc"),
        F.row_number()
        .over(
            W.partitionBy("user_id").orderBy(
                F.col("ts"), F.col("event_id")
            )
        )
        .alias("rn"),
    )
    firstc = ce.filter(F.col("rn") == 1).select(
        "user_id", F.col("event_type").alias("cause"), "tc"
    )
    dur = span.join(firstc, "user_id", "left").select(
        "user_id",
        F.when(
            F.col("cause").isNull(),
            F.floor((F.col("tlast") - F.col("t0")) / 3600),
        )
        .otherwise(F.floor((F.col("tc") - F.col("t0")) / 3600))
        .cast("bigint")
        .alias("dur"),
        F.coalesce(F.col("cause"), F.lit("censored")).alias("status"),
    )
    hist = dur.groupBy(F.col("dur").alias("u")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.count(F.when(F.col("status") == "purchase", 1))
        .cast("bigint")
        .alias("dp"),
        F.count(F.when(F.col("status") == "error", 1))
        .cast("bigint")
        .alias("de"),
    )
    risk = hist.select(
        "u",
        "dp",
        "de",
        F.sum("cnt")
        .over(
            W.orderBy(F.col("u").desc()).rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
        )
        .cast("bigint")
        .alias("n"),
    )
    dtot = F.col("dp") + F.col("de")
    lns = risk.select(
        "u",
        "dp",
        "de",
        "n",
        F.when(dtot == 0, F.lit(0).cast("decimal(28,9)"))
        .when(
            F.col("n") > dtot,
            F.round(
                F.log(1.0 - dtot.cast("double") / F.col("n")), 9
            ).cast("decimal(28,9)"),
        )
        .alias("l"),
    )
    surv = lns.select(
        "u",
        "dp",
        "de",
        "n",
        F.coalesce(
            F.sum("l").over(
                W.orderBy("u").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0).cast("decimal(28,9)"),
        )
        .cast("decimal(28,9)")
        .alias("lpre"),
    )
    s_pre = F.exp(F.col("lpre").cast("double"))
    terms = surv.filter(dtot > 0).select(
        "u",
        F.round(s_pre * F.col("dp") / F.col("n"), 12)
        .cast("decimal(28,12)")
        .alias("tp"),
        F.round(s_pre * F.col("de") / F.col("n"), 12)
        .cast("decimal(28,12)")
        .alias("te"),
    )
    nu = dur.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    horizons = spark.createDataFrame(
        [(72,), (168,), (336,)], "h bigint"
    )
    return (
        horizons.crossJoin(F.broadcast(nu))
        .join(F.broadcast(terms), F.col("u") <= F.col("h"), "left")
        .groupBy(F.col("h").alias("horizon_h"), F.col("n_users"))
        .agg(
            F.round(
                F.coalesce(F.sum("tp").cast("double"), F.lit(0.0)), 6
            ).alias("cif_purchase"),
            F.round(
                F.coalesce(F.sum("te").cast("double"), F.lit(0.0)), 6
            ).alias("cif_error"),
        )
    )


# ------------------------------------------------------------ DFA


@query(
    "ts_dfa",
    # Detrended fluctuation analysis of the hourly cents-volume
    # series, box sizes 4 and 8. Exactness strategy: the centered
    # profile is kept as an INTEGER numerator N_k = H*cum_k - k*S
    # (profile = N_k/H), per-box OLS coefficients come from exact
    # integer sums (one IEEE expression each), squared residuals are
    # DECIMAL(38,6)-quantized pre-sum, and the only libm is the
    # closing ln pair at magnitude ~15 (safe unquantized by the
    # M*8.9e-16 rule); ln(2) is an embedded literal. alpha is
    # normalized + 0.0 (sign-of-zero rule).
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(sum(CAST(round(value * 100, 0) AS BIGINT))
                  AS BIGINT) AS y
      FROM events GROUP BY hr
    ), idx AS (
      SELECT CAST(row_number() OVER (ORDER BY hr) AS BIGINT) AS k, y
      FROM hourly
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS hn,
             CAST(sum(y) AS BIGINT) AS s
      FROM idx
    ), prof AS (
      SELECT k,
             hn * CAST(sum(y) OVER (ORDER BY k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) - k * s AS nk,
             hn
      FROM idx CROSS JOIN tot
    ), boxed AS (
      SELECT sc.s AS bs, p.hn, p.nk,
             CAST(floor((p.k - 1.0) / sc.s) AS BIGINT) AS box,
             p.k - CAST(floor((p.k - 1.0) / sc.s) AS BIGINT) * sc.s
               AS tt
      FROM prof p
      CROSS JOIN (VALUES (CAST(4 AS BIGINT)), (CAST(8 AS BIGINT)))
        sc(s)
      WHERE CAST(floor((p.k - 1.0) / sc.s) AS BIGINT)
            < CAST(floor(CAST(p.hn AS DOUBLE) / sc.s) AS BIGINT)
    ), bsum AS (
      SELECT bs, hn, box, nk, tt,
             CAST(sum(nk) OVER (PARTITION BY bs, box) AS BIGINT)
               AS sp,
             CAST(sum(tt * nk) OVER (PARTITION BY bs, box) AS BIGINT)
               AS stp
      FROM boxed
    ), coefs AS (
      SELECT bs, hn, nk, tt, sp, stp,
             (bs * CAST(stp AS DOUBLE)
                - (bs * (bs + 1) / 2) * CAST(sp AS DOUBLE))
               / (CAST(bs AS DOUBLE)
                    * (bs * (bs + 1) * (2 * bs + 1) / 6)
                  - CAST(bs * (bs + 1) / 2 AS DOUBLE)
                    * (bs * (bs + 1) / 2)) AS b
      FROM bsum
    ), resid AS (
      SELECT bs, hn,
             CAST(round(
               (nk - (sp - b * (bs * (bs + 1) / 2)) / bs - b * tt)
               * (nk - (sp - b * (bs * (bs + 1) / 2)) / bs - b * tt),
               6) AS DECIMAL(38,6)) AS r2
      FROM coefs
    ), fs AS (
      SELECT bs, hn,
             sqrt(CAST(sum(r2) AS DOUBLE)
                  / (CAST(floor(CAST(hn AS DOUBLE) / bs) AS BIGINT)
                     * bs)) / hn AS f
      FROM resid GROUP BY bs, hn
    )
    SELECT max(hn) AS n_hours,
           round(max(CASE WHEN bs = 4 THEN f END), 6) AS f4,
           round(max(CASE WHEN bs = 8 THEN f END), 6) AS f8,
           round((ln(max(CASE WHEN bs = 8 THEN f END))
                  - ln(max(CASE WHEN bs = 4 THEN f END)))
                 / 0.6931471805599453 + 0.0, 6) AS alpha
    FROM fs
    """,
)
def ts_dfa(spark, sf_dir):
    """DFA without a sequential pass: the profile's integer numerator
    rides a window cumsum, per-box OLS comes from two window sums
    over fixed-size partitions, and the residual energy is a decimal
    aggregation — three window stages on a calendar-bounded series,
    fact rows touched once."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 3600)
        .cast("bigint")
        .alias("hr")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    idx = hourly.select(
        F.row_number().over(W.orderBy("hr")).cast("bigint").alias("k"),
        "y",
    )
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("hn"),
        F.sum("y").cast("bigint").alias("s"),
    )
    prof = idx.crossJoin(F.broadcast(tot)).select(
        "k",
        (
            F.col("hn")
            * F.sum("y")
            .over(W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("bigint")
            - F.col("k") * F.col("s")
        ).alias("nk"),
        "hn",
    )
    scales = spark.createDataFrame([(4,), (8,)], "bs bigint")
    box = ((F.col("k") - 1) / F.col("bs")).cast("bigint")
    boxed = (
        prof.crossJoin(F.broadcast(scales))
        .withColumn("box", box)
        .withColumn("tt", F.col("k") - F.col("box") * F.col("bs"))
        .filter(F.col("box") < (F.col("hn") / F.col("bs")).cast("bigint"))
    )
    wb = W.partitionBy("bs", "box")
    bsum = boxed.select(
        "bs",
        "hn",
        "nk",
        "tt",
        F.sum("nk").over(wb).cast("bigint").alias("sp"),
        F.sum(F.col("tt") * F.col("nk")).over(wb).cast("bigint").alias("stp"),
    )
    bs = F.col("bs")
    st = bs * (bs + 1) / 2  # integer: bs even
    stt = bs * (bs + 1) * (2 * bs + 1) / 6
    denom = bs.cast("double") * stt - st.cast("double") * st
    # stp/sp go to DOUBLE before the bs* multiply: nk ~ hn * total_cents
    # puts bs*stp near int64 range at extreme tiers, where DuckDB errors
    # and Spark wraps silently (r11 ADVICE). The quotient is consumed as
    # double anyway, and IEEE multiply is bit-identical on both engines.
    b = (bs * F.col("stp").cast("double") - st * F.col("sp").cast("double")) / denom
    a = (F.col("sp") - b * st) / bs
    r = F.col("nk") - a - b * F.col("tt")
    resid = bsum.select(
        "bs",
        "hn",
        F.round(r * r, 6).cast("decimal(38,6)").alias("r2"),
    )
    fs = resid.groupBy("bs", "hn").agg(
        (
            F.sqrt(
                F.sum("r2").cast("double")
                / ((F.col("hn") / F.col("bs")).cast("bigint") * F.col("bs"))
            )
            / F.col("hn")
        ).alias("f")
    )
    f4 = F.max(F.when(F.col("bs") == 4, F.col("f")))
    f8 = F.max(F.when(F.col("bs") == 8, F.col("f")))
    return fs.agg(
        F.max("hn").alias("n_hours"),
        F.round(f4, 6).alias("f4"),
        F.round(f8, 6).alias("f8"),
        F.round(
            (F.log(f8) - F.log(f4)) / 0.6931471805599453 + 0.0, 6
        ).alias("alpha"),
    )


# ------------------------------------------------------ hard negatives


@query(
    "emb_hard_negatives",
    # Contrastive-training hard-negative mining: for each query
    # vector (vec_id % 97 = 0, BOUNDED to vec_id < 5000 so the query
    # set is constant beyond sf0.1 — an unbounded sample would make
    # the brute-force work quadratic in corpus size, the SF5_SKIPS
    # class-1 artifact), the top-3 most-cosine-similar vectors with a
    # DIFFERENT label. Both engines fold the dot product in
    # array-index order (F.aggregate / list_dot_product), so the
    # scores are bit-identical and the (cos DESC, id) order agrees.
    oracle="""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
      SELECT * FROM e WHERE vec_id % 97 = 0 AND vec_id < 5000
    ), scored AS (
      SELECT q.vec_id AS q_id, q.label AS q_label,
             c.vec_id AS neg_id, c.label AS neg_label,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cos
      FROM q JOIN e c ON c.label <> q.label
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY cos DESC, neg_id) AS rk
      FROM scored
    )
    SELECT q_id, CAST(rk AS BIGINT) AS rk, neg_id,
           q_label, neg_label, round(cos, 6) AS cos_sim
    FROM ranked WHERE rk <= 3
    """,
)
def emb_hard_negatives(spark, sf_dir):
    """Hard negatives at scale: the query set is tiny (sampled ids),
    so it broadcasts and the scan stays one pass over the candidate
    vectors with a per-query top-k heap (window over the bounded
    per-query candidate rank) — the brute-force oracle twin of the
    IVF-pruned mining a trainer would run at 100 TB."""
    from ..llm.similarity import as_double, dot

    # Round-13 (guide §2.4/§4 — don't recompute per pair what is fixed
    # per row): each side's norm sqrt(dot(x,x)) is hoisted OUT of the
    # O(Q x N) scored projection into a per-row column — the candidate
    # norm was re-folded Q times per vector and the query norm N times.
    # Bit-identical: sqrt(dot(v,v)) is the same fold in both places and
    # cos = dot/(nq*nv) is the same expression tree (the ml3.py knn
    # hoist, proven bit-equal there); oracle unchanged and re-gated.
    # sf5: 140.6 s -> see OPTIMIZATION_r13.md for the measured number.
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    e = e.withColumn("nv", F.sqrt(dot(F.col("v"), F.col("v"))))
    q = e.filter(
        (F.col("vec_id") % 97 == 0) & (F.col("vec_id") < 5000)
    ).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    scored = e.crossJoin(F.broadcast(q)).filter(
        F.col("label") != F.col("q_label")
    ).select(
        "q_id",
        "q_label",
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        (
            dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
        ).alias("cos"),
    )
    ranked = scored.withColumn(
        "rk",
        F.row_number()
        .over(
            W.partitionBy("q_id").orderBy(F.col("cos").desc(), "neg_id")
        )
        .cast("bigint"),
    )
    return ranked.filter(F.col("rk") <= 3).select(
        "q_id", "rk", "neg_id", "q_label", "neg_label",
        F.round("cos", 6).alias("cos_sim"),
    )
