"""Fourteenth analytics wave (round 7): Welch's t-test, Cohen's kappa,
Wilcoxon signed-rank, degree assortativity, peak detection, and
inter-arrival statistics.

Float discipline (the established house rules):
- doubles are rounded per-term to a fixed grain and summed in DECIMAL
  so accumulation order can never flip a cross-engine hash;
- ranks are exact integers via the 2*avg-rank midrank trick
  (stat_spearman_corr pattern);
- each final statistic is ONE identical IEEE double chain on exact
  integer/decimal moments, rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

# --------------------------------------------------------------------------
# Welch's unequal-variance t-test
# --------------------------------------------------------------------------


@query(
    "stat_welch_ttest",
    # Welch's t between click and purchase event values. Moments are
    # exact: value rounds to DECIMAL(18,6) per row (the grain the data
    # is generated at), sums in DECIMAL(38,6)/(38,12); t and the
    # Welch-Satterthwaite df are one double chain each.
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DECIMAL(38,6)) AS s,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))
                      * CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DECIMAL(38,12)) AS ss
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type
    ), w AS (
      SELECT
        max(CASE WHEN event_type = 'click' THEN n END) AS n1,
        max(CASE WHEN event_type = 'click' THEN s END) AS s1,
        max(CASE WHEN event_type = 'click' THEN ss END) AS ss1,
        max(CASE WHEN event_type = 'purchase' THEN n END) AS n2,
        max(CASE WHEN event_type = 'purchase' THEN s END) AS s2,
        max(CASE WHEN event_type = 'purchase' THEN ss END) AS ss2
      FROM m
    ), v AS (
      SELECT n1, n2,
        CAST(s1 AS DOUBLE) / n1 AS m1, CAST(s2 AS DOUBLE) / n2 AS m2,
        (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
          / (n1 - 1) AS v1,
        (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
          / (n2 - 1) AS v2
      FROM w
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1)
                    + pow(v2 / n2, 2) / (n2 - 1)), 6) AS welch_df
    FROM v
    """,
)
def stat_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test: one codegen hash aggregate over
    the fact (map-side partial, 2-row reduce), then scalar algebra on a
    bounded relation — the shape that tests 100 TB in a single pass."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    dec = F.round("value", 6).cast("decimal(18,6)")
    m = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("decimal(38,6)").alias("s"),
        F.sum(dec * dec).cast("decimal(38,12)").alias("ss"),
    )
    w = m.agg(
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "click", F.col("s"))).alias("s1"),
        F.max(F.when(F.col("event_type") == "click", F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("s"))).alias("s2"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ss"))).alias("ss2"),
    )
    v = w.select(
        "n1",
        "n2",
        (F.col("s1").cast("double") / F.col("n1")).alias("m1"),
        (F.col("s2").cast("double") / F.col("n2")).alias("m2"),
        (
            (
                F.col("ss1").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n1")
            )
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (
                F.col("ss2").cast("double")
                - F.col("s2").cast("double") * F.col("s2").cast("double") / F.col("n2")
            )
            / (F.col("n2") - 1)
        ).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return v.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, F.lit(2))
            / (
                F.pow(F.col("v1") / F.col("n1"), F.lit(2)) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), F.lit(2)) / (F.col("n2") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


# --------------------------------------------------------------------------
# Cohen's kappa — inter-rater agreement of two deterministic judgments
# --------------------------------------------------------------------------


@query(
    "stat_cohens_kappa",
    # Two deterministic binary "raters" of document length: rater A
    # judges by raw character count, rater B by whitespace token count.
    # kappa = (po - pe) / (1 - pe) from exact integer counts; po/pe are
    # one double chain.
    oracle="""
    WITH r AS (
      SELECT CASE WHEN n_chars > 300 THEN 1 ELSE 0 END AS a,
             CASE WHEN len(regexp_extract_all(text, '\\S+')) > 50
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ), c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count_if(a = 1 AND b = 1) AS BIGINT) AS n11,
             CAST(count_if(a = 1 AND b = 0) AS BIGINT) AS n10,
             CAST(count_if(a = 0 AND b = 1) AS BIGINT) AS n01,
             CAST(count_if(a = 0 AND b = 0) AS BIGINT) AS n00
      FROM r
    ), pp AS (
      SELECT n, n11, n10, n01, n00,
             CAST(n11 + n00 AS DOUBLE) / n AS po,
             (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
              + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
               / (CAST(n AS DOUBLE) * n) AS pe
      FROM c WHERE n > 0
    )
    SELECT n, n11, n10, n01, n00,
           round(po, 6) AS po, round(pe, 6) AS pe,
           round((po - pe) / (1 - pe), 6) AS kappa
    FROM pp WHERE pe <> 1
    """,
)
def stat_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between two length judgments — one scan, one
    1-row aggregate; the contingency table is exact integers."""
    d = t(spark, sf_dir, "documents")
    a = F.when(F.col("n_chars") > 300, 1).otherwise(0)
    b = F.when(
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), F.lit(0))) > 50, 1
    ).otherwise(0)
    r = d.select(a.alias("a"), b.alias("b"))
    c = r.agg(
        F.count("*").alias("n"),
        F.count_if((F.col("a") == 1) & (F.col("b") == 1)).alias("n11"),
        F.count_if((F.col("a") == 1) & (F.col("b") == 0)).alias("n10"),
        F.count_if((F.col("a") == 0) & (F.col("b") == 1)).alias("n01"),
        F.count_if((F.col("a") == 0) & (F.col("b") == 0)).alias("n00"),
    ).filter(F.col("n") > 0)
    n = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10")).cast("double") * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double") * (F.col("n10") + F.col("n00"))
    ) / (n * F.col("n"))
    pp = c.select(
        "n", "n11", "n10", "n01", "n00", po.alias("po"), pe.alias("pe")
    ).filter(F.col("pe") != 1)
    return pp.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round("po", 6).alias("po"),
        F.round("pe", 6).alias("pe"),
        F.round(
            (F.col("po") - F.col("pe")) / (F.lit(1) - F.col("pe")), 6
        ).alias("kappa"),
    )


# --------------------------------------------------------------------------
# Wilcoxon signed-rank test (paired, midranks, tie-corrected z)
# --------------------------------------------------------------------------


@query(
    "stat_wilcoxon_signed_rank",
    # Paired per-user counts: clicks vs views per user — each diff is
    # an EXACT INTEGER (no decimal-mean division anywhere, so the tie
    # structure can never flip engines; the recorded r6 HALF_UP lesson
    # rules out mean-based pairings). Zero diffs drop (standard
    # practice); |diff| midranks arrive as the integer 2*avg-rank over
    # the distinct-|d| relation; W+ uses DECIMAL sums; z applies the
    # normal approximation with the exact tie term sum(t^3 - t).
    oracle="""
    WITH p AS (
      SELECT user_id,
             CAST(count_if(event_type = 'click') AS BIGINT) AS a,
             CAST(count_if(event_type = 'view') AS BIGINT) AS b
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY user_id
    ), d AS (
      SELECT user_id, a - b AS diff, abs(a - b) AS ad
      FROM p WHERE a <> b
    ), rk AS (
      SELECT ad,
             CAST(count(*) AS BIGINT) AS tie,
             CAST(2 * (sum(count(*)) OVER (ORDER BY ad
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - count(*)) + count(*) + 1 AS BIGINT) AS two_r
      FROM d GROUP BY ad
    ), j AS (
      SELECT d.diff, rk.two_r, rk.tie FROM d JOIN rk USING (ad)
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN diff > 0
                           THEN CAST(two_r AS DECIMAL(19,0)) END)
                  AS DECIMAL(38,0)) AS two_wplus
      FROM j
    ), tt AS (
      SELECT CAST(sum(CAST(tie AS DECIMAL(19,0)) * tie * tie - tie)
                  AS DECIMAL(38,0)) AS tie3
      FROM rk
    )
    SELECT n,
           round(CAST(two_wplus AS DOUBLE) / 2, 6) AS w_plus,
           round((CAST(two_wplus AS DOUBLE) / 2
                  - CAST(n AS DOUBLE) * (n + 1) / 4)
                 / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24
                        - CAST(tie3 AS DOUBLE) / 48), 6) AS z_stat
    FROM m, tt
    """,
)
def stat_wilcoxon_signed_rank(spark, sf_dir):
    """Wilcoxon signed-rank over paired per-user activity counts. The
    |diff| rank relation is a bounded distinct-value aggregate (<=
    users rows); every shuffle key is user_id or the bounded ad — the
    spearman midrank shape."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    p = ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "click").alias("a"),
        F.count_if(F.col("event_type") == "view").alias("b"),
    )
    d = (
        p.filter(F.col("a") != F.col("b"))
        .select(
            "user_id",
            (F.col("a") - F.col("b")).alias("diff"),
            F.abs(F.col("a") - F.col("b")).alias("ad"),
        )
    )
    g = d.groupBy("ad").agg(F.count("*").alias("tie"))
    win = W.orderBy("ad").rowsBetween(W.unboundedPreceding, W.currentRow)
    rk = g.select(
        "ad",
        "tie",
        (2 * (F.sum("tie").over(win) - F.col("tie")) + F.col("tie") + 1)
        .cast("bigint")
        .alias("two_r"),
    )
    j = d.join(rk, "ad")
    m = j.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("two_r").cast("decimal(19,0)")))
        .cast("decimal(38,0)")
        .alias("two_wplus"),
    )
    tt = rk.agg(
        F.sum(
            F.col("tie").cast("decimal(19,0)") * F.col("tie") * F.col("tie")
            - F.col("tie")
        )
        .cast("decimal(38,0)")
        .alias("tie3")
    )
    n = F.col("n").cast("double")
    wplus = F.col("two_wplus").cast("double") / 2
    return m.crossJoin(tt).select(
        "n",
        F.round(wplus, 6).alias("w_plus"),
        F.round(
            (wplus - n * (F.col("n") + 1) / 4)
            / F.sqrt(
                n * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24
                - F.col("tie3").cast("double") / 48
            ),
            6,
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Degree assortativity of the user co-occurrence graph
# --------------------------------------------------------------------------


@query(
    "graph_assortativity",
    # Newman's degree assortativity r over the graph2 co-occurrence
    # edge list: Pearson correlation of endpoint degrees across the
    # DIRECTED edge multiset (each undirected edge counted both ways,
    # the standard symmetrization). All five moments are exact integer
    # sums in DECIMAL(38,0); r is one double chain.
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
    ), deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT ua AS v FROM e UNION ALL SELECT ub AS v FROM e
      ) GROUP BY v
    ), de AS (
      SELECT da.d AS dx, db.d AS dy
      FROM (SELECT ua AS x, ub AS y FROM e
            UNION ALL SELECT ub AS x, ua AS y FROM e) ed
      JOIN deg da ON ed.x = da.v
      JOIN deg db ON ed.y = db.v
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS m2,
             CAST(sum(CAST(dx AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sx,
             CAST(sum(CAST(dy AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sy,
             CAST(sum(CAST(dx AS DECIMAL(19,0)) * dx) AS DECIMAL(38,0)) AS sxx,
             CAST(sum(CAST(dy AS DECIMAL(19,0)) * dy) AS DECIMAL(38,0)) AS syy,
             CAST(sum(CAST(dx AS DECIMAL(19,0)) * dy) AS DECIMAL(38,0)) AS sxy
      FROM de
    )
    SELECT m2 AS n_directed_edges,
           round((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                    * CAST(sy AS DOUBLE) / m2)
                 / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                           * CAST(sx AS DOUBLE) / m2)
                        * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                             * CAST(sy AS DOUBLE) / m2)), 6) AS assortativity
    FROM m
    """,
)
def graph_assortativity(spark, sf_dir):
    """Degree assortativity: degree aggregate (vertex-keyed shuffle),
    two broadcast joins of the bounded degree relation back onto the
    edge list, one moment aggregate. On any (src,dst) edge list this
    is two scans of edges + an O(V) broadcast — 100 TB shape."""
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
    ed = e.select(F.col("ua").alias("x"), F.col("ub").alias("y")).unionAll(
        e.select(F.col("ub").alias("x"), F.col("ua").alias("y"))
    )
    deg = (
        ed.groupBy(F.col("x").alias("v"))
        .agg(F.count("*").alias("d"))
    )
    de = (
        ed.join(F.broadcast(deg.select(F.col("v").alias("x"), F.col("d").alias("dx"))), "x")
        .join(F.broadcast(deg.select(F.col("v").alias("y"), F.col("d").alias("dy"))), "y")
    )
    dxd = F.col("dx").cast("decimal(19,0)")
    dyd = F.col("dy").cast("decimal(19,0)")
    m = de.agg(
        F.count("*").alias("m2"),
        F.sum(dxd).cast("decimal(38,0)").alias("sx"),
        F.sum(dyd).cast("decimal(38,0)").alias("sy"),
        F.sum(dxd * F.col("dx")).cast("decimal(38,0)").alias("sxx"),
        F.sum(dyd * F.col("dy")).cast("decimal(38,0)").alias("syy"),
        F.sum(dxd * F.col("dy")).cast("decimal(38,0)").alias("sxy"),
    )
    m2 = F.col("m2")
    num = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / m2
    den = F.sqrt(
        (
            F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double") / m2
        )
        * (
            F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double") / m2
        )
    )
    return m.select(
        F.col("m2").alias("n_directed_edges"),
        F.round(num / den, 6).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# Peak detection on the per-type minute series
# --------------------------------------------------------------------------


@query(
    "ts_peak_detection",
    # Local maxima of each event type's per-minute mean-value series:
    # a minute beats both neighbors (strictly) and the type's global
    # mean. Every compared mean is the SAME two-step IEEE chain in both
    # engines — exact DECIMAL sum of 6-dp-rounded values, cast to
    # double, divided by the exact count — never a decimal avg (whose
    # internal rounding differs between engines, the recorded r6
    # lesson). Identical chains -> identical bits -> identical strict
    # comparisons.
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*) AS v
      FROM events GROUP BY 1, 2
    ), g AS (
      SELECT event_type,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*) AS gmean
      FROM events GROUP BY event_type
    ), n AS (
      SELECT s.event_type, minute, v, gmean,
             lag(v) OVER (PARTITION BY s.event_type ORDER BY minute) AS pv,
             lead(v) OVER (PARTITION BY s.event_type ORDER BY minute) AS nv
      FROM s JOIN g ON s.event_type = g.event_type
    )
    SELECT event_type, minute, round(v, 6) AS peak_value
    FROM n
    WHERE pv IS NOT NULL AND nv IS NOT NULL
      AND v > pv AND v > nv AND v > gmean
    """,
)
def ts_peak_detection(spark, sf_dir):
    """Peaks on the bounded minute-series aggregate: the fact shuffles
    once into (type, minute) cells; the lag/lead window runs over the
    BOUNDED series (minutes x types), never raw rows — the same
    aggregate-first discipline every ts_* operator here follows."""
    ev = t(spark, sf_dir, "events")
    dec = F.round("value", 6).cast("decimal(18,6)")
    mean = (F.sum(dec).cast("double") / F.count("*"))
    s = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 60).cast("bigint").alias("minute"),
    ).agg(mean.alias("v"))
    g = ev.groupBy("event_type").agg(mean.alias("gmean"))
    win = W.partitionBy("event_type").orderBy("minute")
    n = s.join(F.broadcast(g), "event_type").select(
        "event_type",
        "minute",
        "v",
        "gmean",
        F.lag("v").over(win).alias("pv"),
        F.lead("v").over(win).alias("nv"),
    )
    return (
        n.filter(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("v") > F.col("pv"))
            & (F.col("v") > F.col("nv"))
            & (F.col("v") > F.col("gmean"))
        )
        .select("event_type", "minute", F.round("v", 6).alias("peak_value"))
    )


# --------------------------------------------------------------------------
# Inter-arrival statistics per event type
# --------------------------------------------------------------------------


@query(
    "events_interarrival_stats",
    # Per-type stats over per-USER inter-arrival gaps (exact integer
    # microseconds via lag over (user_id, event_type) sessions):
    # count, mean, median and p90 via the counts-tier quantile on the
    # bounded distinct-gap relation (midrank selectors, linear
    # interpolation identical to quantile_cont). The three float
    # outputs are emitted UNROUNDED: an sf5 window caught the p90
    # chain landing on a terminating-decimal round-6 tie (Spark
    # HALF_UP vs DuckDB scaled-multiply disagree exactly there — the
    # recorded r6 lesson); the driver's symmetric canonicalization
    # does the rounding. The quantile POSITION literals are CAST to
    # DOUBLE: DuckDB parses 0.9 as exact DECIMAL, making frac an
    # exact 0.1 while Spark's double(0.9) gives 0.0999..., a 1-ulp
    # output split that the r11 sf1 sweep caught on a half-boundary
    # value (419651.7708975 vs ...5002).
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS gap
      FROM events
    ), gg AS (
      SELECT event_type, gap FROM gaps WHERE gap IS NOT NULL
    ), qc AS (
      SELECT event_type, gap, CAST(count(*) AS BIGINT) AS c
      FROM gg GROUP BY 1, 2
    ), qcum AS (
      SELECT event_type, gap, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY gap
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS below,
             sum(c) OVER (PARTITION BY event_type) AS n,
             sum(gap * c) OVER (PARTITION BY event_type) AS s
      FROM qc
    ), sel AS (
      SELECT event_type, max(n) AS n, max(s) AS s,
        max(CASE WHEN below <= floor(CAST(0.5 AS DOUBLE) * (n - 1))
                  AND floor(CAST(0.5 AS DOUBLE) * (n - 1)) < below + c THEN gap END) AS lo5,
        max(CASE WHEN below <= ceil(CAST(0.5 AS DOUBLE) * (n - 1))
                  AND ceil(CAST(0.5 AS DOUBLE) * (n - 1)) < below + c THEN gap END) AS hi5,
        max(CASE WHEN below <= floor(CAST(0.9 AS DOUBLE) * (n - 1))
                  AND floor(CAST(0.9 AS DOUBLE) * (n - 1)) < below + c THEN gap END) AS lo9,
        max(CASE WHEN below <= ceil(CAST(0.9 AS DOUBLE) * (n - 1))
                  AND ceil(CAST(0.9 AS DOUBLE) * (n - 1)) < below + c THEN gap END) AS hi9
      FROM qcum GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           CAST(s AS DOUBLE) / n / 1e6 AS mean_gap_sec,
           (lo5 + (CAST(0.5 AS DOUBLE) * (n - 1) - floor(CAST(0.5 AS DOUBLE) * (n - 1)))
                  * (hi5 - lo5)) / 1e6 AS p50_gap_sec,
           (lo9 + (CAST(0.9 AS DOUBLE) * (n - 1) - floor(CAST(0.9 AS DOUBLE) * (n - 1)))
                  * (hi9 - lo9)) / 1e6 AS p90_gap_sec
    FROM sel
    """,
)
def events_interarrival_stats(spark, sf_dir):
    """Inter-arrival gap distribution. The lag runs per (user, type) —
    millions of small partitions at scale, never a per-type serial
    chain; the quantile ladder then works on the bounded distinct-gap
    relation (counts tier, O(distinct gaps))."""
    ev = t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    win = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(win)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    qc = gaps.groupBy("event_type", "gap").agg(F.count("*").alias("c"))
    cum = W.partitionBy("event_type").orderBy("gap").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    full = W.partitionBy("event_type")
    qcum = qc.select(
        "event_type",
        "gap",
        "c",
        (F.sum("c").over(cum) - F.col("c")).alias("below"),
        F.sum("c").over(full).alias("n"),
        F.sum(F.col("gap") * F.col("c")).over(full).alias("s"),
    )

    def pick(q: float, which: str):
        pos = F.lit(q) * (F.col("n") - 1)
        edge = F.floor(pos) if which == "lo" else F.ceil(pos)
        return F.max(
            F.when(
                (F.col("below") <= edge) & (edge < F.col("below") + F.col("c")),
                F.col("gap"),
            )
        )

    sel = qcum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        pick(0.5, "lo").alias("lo5"),
        pick(0.5, "hi").alias("hi5"),
        pick(0.9, "lo").alias("lo9"),
        pick(0.9, "hi").alias("hi9"),
    )

    def interp(q: float, lo: str, hi: str):
        pos = F.lit(q) * (F.col("n") - 1)
        frac = pos - F.floor(pos)
        return (F.col(lo) + frac * (F.col(hi) - F.col(lo))) / 1e6

    return sel.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_gaps"),
        (F.col("s").cast("double") / F.col("n") / 1e6).alias(
            "mean_gap_sec"
        ),
        interp(0.5, "lo5", "hi5").alias("p50_gap_sec"),
        interp(0.9, "lo9", "hi9").alias("p90_gap_sec"),
    )
