"""Round-8 wave 31: Brier (Murphy) decomposition, two-sample effect
sizes, and the Markov entropy rate.

All three are evaluation/diagnostic ops whose data-sized stage is one
scan; the statistics run on bounded relations (10 bins, 2 groups,
|types|^2 transition cells) with the house exact-moment discipline.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "ml_brier_decomposition",
    # Murphy decomposition of the Brier score for the stopword-
    # fraction Englishness score (the ml_calibration_bins setup,
    # analytics9.py): Brier = REL - RES + UNC over 10 equal-width
    # bins. Bin label sums are INTEGER; score sums are [0,1] doubles
    # (order-safe at round-6 under any corpus size measured);
    # the K=10 closing relation is bounded.
    oracle=r"""
    WITH s AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               CAST(len(list_filter(
                        regexp_extract_all(lower(trim(text)), '\S+'),
                        w -> w IN ('a', 'the'))) AS DOUBLE)
               / nullif(len(regexp_extract_all(lower(trim(text)),
                                               '\S+')), 0) AS p
        FROM documents
    ), b AS (
        SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin, p, y
        FROM s WHERE p IS NOT NULL
    ), per AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS nk,
               sum(p) AS sp, CAST(sum(y) AS BIGINT) AS sy,
               sum((p - y) * (p - y)) AS sbr
        FROM b GROUP BY bin
    ), m AS (
        SELECT CAST(sum(nk) AS BIGINT) AS n,
               CAST(sum(sy) AS BIGINT) AS tot_pos,
               sum(sbr) AS sbr,
               sum(nk * pow(sp / nk - CAST(sy AS DOUBLE) / nk, 2)) AS rel_n,
               sum(CAST(sy AS DOUBLE) * sy / nk) AS sy2_over_nk
        FROM per
    )
    SELECT n,
           round(sbr / n, 6) AS brier,
           round(rel_n / n, 6) AS reliability,
           -- RES = (1/N) sum nk*(yk - ybar)^2 expands to
           -- sum(sy^2/nk)/N - ybar^2 on exact integers
           round(sy2_over_nk / n
                 - pow(CAST(tot_pos AS DOUBLE) / n, 2), 6) AS resolution,
           round((CAST(tot_pos AS DOUBLE) / n)
                 * (1 - CAST(tot_pos AS DOUBLE) / n), 6) AS uncertainty
    FROM m
    """,
)
def ml_brier_decomposition(spark, sf_dir):
    """Murphy decomposition: one scan -> 10-bin aggregate of
    (n, sum p, sum y, sum sq err); REL/RES/UNC close on the bounded
    bin relation with integer y-sums carrying the exact parts."""
    d = t(spark, sf_dir, "documents")
    ws = F.regexp_extract_all(F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0)
    s = d.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        (
            F.size(F.filter(ws, lambda w: w.isin("a", "the"))).cast("double")
            / F.nullif(F.size(ws), F.lit(0))
        ).alias("p"),
    ).where(F.col("p").isNotNull())
    b = s.withColumn(
        "bin", F.least(F.floor(F.col("p") * 10).cast("long"), F.lit(9))
    )
    per = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.sum("p").alias("sp"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
            "sbr"
        ),
    )
    m = per.agg(
        F.sum("nk").cast("bigint").alias("n"),
        F.sum("sy").cast("bigint").alias("tot_pos"),
        F.sum("sbr").alias("sbr"),
        F.sum(
            F.col("nk")
            * F.pow(
                F.col("sp") / F.col("nk")
                - F.col("sy").cast("double") / F.col("nk"),
                2,
            )
        ).alias("rel_n"),
        F.sum(F.col("sy").cast("double") * F.col("sy") / F.col("nk")).alias(
            "sy2_over_nk"
        ),
    )
    ybar = F.col("tot_pos").cast("double") / F.col("n")
    return m.select(
        "n",
        F.round(F.col("sbr") / F.col("n"), 6).alias("brier"),
        F.round(F.col("rel_n") / F.col("n"), 6).alias("reliability"),
        F.round(
            F.col("sy2_over_nk") / F.col("n") - F.pow(ybar, 2), 6
        ).alias("resolution"),
        F.round(ybar * (1 - ybar), 6).alias("uncertainty"),
    )


@query(
    "stat_effect_sizes",
    # Two-sample effect sizes for value: purchase vs view — Cohen's d
    # (pooled), Hedges' g (small-sample corrected), Glass's delta
    # (control = view). Group moments are exact DECIMAL sums of the
    # 6-dp value; the three sizes are one closed chain.
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) AS sx,
             CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))
                      * CAST(round(value, 6) AS DECIMAL(18,6)))
                  AS DOUBLE) AS sxx
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('purchase', 'view')
      GROUP BY event_type
    ), m AS (
      SELECT
        max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
        max(CASE WHEN event_type = 'purchase' THEN sx END) AS sx1,
        max(CASE WHEN event_type = 'purchase' THEN sxx END) AS sxx1,
        max(CASE WHEN event_type = 'view' THEN n END) AS n2,
        max(CASE WHEN event_type = 'view' THEN sx END) AS sx2,
        max(CASE WHEN event_type = 'view' THEN sxx END) AS sxx2
      FROM g
    )
    SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_view,
      round((sx1 / n1 - sx2 / n2)
            / sqrt(((sxx1 - sx1 * sx1 / n1) + (sxx2 - sx2 * sx2 / n2))
                   / (n1 + n2 - 2)), 6) AS cohens_d,
      round(((sx1 / n1 - sx2 / n2)
            / sqrt(((sxx1 - sx1 * sx1 / n1) + (sxx2 - sx2 * sx2 / n2))
                   / (n1 + n2 - 2)))
            * (1 - 3.0 / (4 * (n1 + n2) - 9)), 6) AS hedges_g,
      round((sx1 / n1 - sx2 / n2)
            / sqrt((sxx2 - sx2 * sx2 / n2) / (n2 - 1)), 6) AS glass_delta
    FROM m
    """,
)
def stat_effect_sizes(spark, sf_dir):
    """Effect sizes from one two-group aggregate of exact decimal
    moments; pivot to a single row, then three closed-form chains."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("purchase", "view")
    )
    x = F.round("value", 6).cast("decimal(18,6)")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
    )

    def pick(col, ty):
        return F.max(F.when(F.col("event_type") == ty, F.col(col)))

    m = g.agg(
        pick("n", "purchase").alias("n1"),
        pick("sx", "purchase").alias("sx1"),
        pick("sxx", "purchase").alias("sxx1"),
        pick("n", "view").alias("n2"),
        pick("sx", "view").alias("sx2"),
        pick("sxx", "view").alias("sxx2"),
    )
    m1 = F.col("sx1") / F.col("n1")
    m2 = F.col("sx2") / F.col("n2")
    ss1 = F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1")
    ss2 = F.col("sxx2") - F.col("sx2") * F.col("sx2") / F.col("n2")
    d = (m1 - m2) / F.sqrt((ss1 + ss2) / (F.col("n1") + F.col("n2") - 2))
    return m.select(
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_view"),
        F.round(d, 6).alias("cohens_d"),
        F.round(
            d * (1 - 3.0 / (4 * (F.col("n1") + F.col("n2")) - 9)), 6
        ).alias("hedges_g"),
        F.round((m1 - m2) / F.sqrt(ss2 / (F.col("n2") - 1)), 6).alias(
            "glass_delta"
        ),
    )


@query(
    "events_markov_entropy_rate",
    # Entropy rate of the first-order event-type chain
    # (ts_markov_transitions' construction, analytics2.py):
    # H = sum_ij (c_ij / N) ln(c_i / c_ij) — all from INTEGER
    # transition counts; the <= |types|^2 terms sum round-9 in
    # DECIMAL. Also emits the stationary-marginal entropy H0 for the
    # predictability ratio 1 - H/H0.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), c AS (
      SELECT prev AS f, event_type AS t2, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n FROM c
    ), rowm AS (
      SELECT f, CAST(sum(c) AS BIGINT) AS cf FROM c GROUP BY f
    ), terms AS (
      SELECT c.c, rowm.cf, tot.n,
             round((CAST(c.c AS DOUBLE) / tot.n)
                   * ln(CAST(rowm.cf AS DOUBLE) / c.c), 9) AS h_term,
             round((CAST(rowm.cf AS DOUBLE) / tot.n)
                   * ln(CAST(tot.n AS DOUBLE) / rowm.cf), 9)
               / count(*) OVER (PARTITION BY rowm.f) AS h0_term
      FROM c JOIN rowm ON c.f = rowm.f CROSS JOIN tot
    )
    SELECT CAST(max(n) AS BIGINT) AS n_transitions,
           round(CAST(sum(CAST(h_term AS DECIMAL(38,9))) AS DOUBLE), 6)
             AS entropy_rate,
           round(CAST(sum(CAST(round(h0_term, 9) AS DECIMAL(38,9)))
                      AS DOUBLE), 6) AS marginal_entropy
    FROM terms
    """,
)
def events_markov_entropy_rate(spark, sf_dir):
    """Markov entropy rate: one user-keyed lag window (the sessionize
    shuffle), a bounded |types|^2 cell aggregate, round-9 DECIMAL term
    sums — how predictable the event stream is, in nats/step."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    c = seq.groupBy(
        F.col("prev").alias("f"), F.col("event_type").alias("t2")
    ).agg(F.count("*").cast("bigint").alias("c"))
    rowm = c.groupBy("f").agg(F.sum("c").cast("bigint").alias("cf"))
    tot = c.agg(F.sum("c").cast("bigint").alias("n"))
    terms = (
        c.join(rowm, "f")
        .crossJoin(F.broadcast(tot))
        .select(
            "f",
            F.round(
                (F.col("c").cast("double") / F.col("n"))
                * F.log(F.col("cf").cast("double") / F.col("c")),
                9,
            ).alias("h_term"),
            (
                F.round(
                    (F.col("cf").cast("double") / F.col("n"))
                    * F.log(F.col("n").cast("double") / F.col("cf")),
                    9,
                )
                / F.count("*").over(W.partitionBy("f"))
            ).alias("h0_term"),
            "n",
        )
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n_transitions"),
        F.round(
            F.sum(F.col("h_term").cast("decimal(38,9)")).cast("double"), 6
        ).alias("entropy_rate"),
        F.round(
            F.sum(F.round(F.col("h0_term"), 9).cast("decimal(38,9)")).cast(
                "double"
            ),
            6,
        ).alias("marginal_entropy"),
    )


@query(
    "win_session_concurrency",
    # Max concurrent sessions per day (sweep line / interval
    # stabbing): session = [first, last] active minute per
    # (user, day); +1 at start, -1 at end+1; per-minute deltas
    # aggregate first (so ordering ties never matter), then a running
    # sum ORDERED WITHIN THE DAY PARTITION gives the concurrency
    # profile; max + first argmax minute per day. All integers.
    oracle="""
    WITH s AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS dy,
             CAST(min(floor(epoch(ts) / 60)) AS BIGINT) AS m0,
             CAST(max(floor(epoch(ts) / 60)) AS BIGINT) AS m1
      FROM events GROUP BY 1, 2
    ), deltas AS (
      SELECT dy, m0 AS minute, 1 AS d FROM s
      UNION ALL
      SELECT dy, m1 + 1 AS minute, -1 AS d FROM s
    ), per_min AS (
      SELECT dy, minute, CAST(sum(d) AS BIGINT) AS d
      FROM deltas GROUP BY dy, minute
    ), sweep AS (
      SELECT dy, minute,
             CAST(sum(d) OVER (PARTITION BY dy ORDER BY minute
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS conc
      FROM per_min
    ), mx AS (
      SELECT dy, max(conc) AS max_conc FROM sweep GROUP BY dy
    )
    SELECT s2.dy, CAST(mx.max_conc AS BIGINT) AS max_concurrency,
           CAST(min(s2.minute) AS BIGINT) AS first_peak_minute
    FROM sweep s2 JOIN mx ON s2.dy = mx.dy AND s2.conc = mx.max_conc
    GROUP BY s2.dy, mx.max_conc
    """,
)
def win_session_concurrency(spark, sf_dir):
    """Sweep-line concurrency: the data-sized stage is the (user, day)
    session aggregate; the sweep runs on the bounded per-minute delta
    relation, PARTITIONED BY DAY (sessions never span days by
    construction), so no global-order window exists at any scale."""
    ev = t(spark, sf_dir, "events")
    dy = F.floor(F.col("ts").cast("double") / 86400).cast("bigint")
    mn = F.floor(F.col("ts").cast("double") / 60).cast("bigint")
    s = ev.groupBy("user_id", dy.alias("dy")).agg(
        F.min(mn).alias("m0"), F.max(mn).alias("m1")
    )
    deltas = s.select(
        "dy", F.col("m0").alias("minute"), F.lit(1).alias("d")
    ).unionAll(
        s.select("dy", (F.col("m1") + 1).alias("minute"), F.lit(-1).alias("d"))
    )
    per_min = deltas.groupBy("dy", "minute").agg(
        F.sum("d").cast("bigint").alias("d")
    )
    w = (
        W.partitionBy("dy")
        .orderBy("minute")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sweep = per_min.select(
        "dy", "minute", F.sum("d").over(w).cast("bigint").alias("conc")
    )
    mx = sweep.groupBy("dy").agg(F.max("conc").alias("max_conc")).select(
        F.col("dy").alias("mdy"), "max_conc"
    )
    return (
        sweep.join(
            mx,
            (F.col("dy") == F.col("mdy"))
            & (F.col("conc") == F.col("max_conc")),
        )
        .groupBy("dy", "max_conc")
        .agg(F.min("minute").cast("bigint").alias("first_peak_minute"))
        .select(
            "dy",
            F.col("max_conc").cast("bigint").alias("max_concurrency"),
            "first_peak_minute",
        )
    )
