"""Round-10 wave 54: process control, skyline, post-hoc and G tests.

events_control_chart is the Shewhart X-bar monitor every feature
pipeline runs on its ingest rates, formulated FULLY in integers: the
3-sigma rule compares (y*n - sy)^2 against 9*(n*syy - sy^2) — the
cross-multiplied form of |y - mean| > 3*sigma — in DECIMAL(38,0), and
the Western-Electric run rule sides with sign(y*n - sy), so nothing
can diverge across engines. agg_skyline_pareto is the O(n log n)
sweep-line skyline (dominance frontier) over distinct value cells —
integer comparisons only. stat_tukey_pairs and stat_g_test follow the
exact-moment discipline: DECIMAL sums, divisions late (IEEE-exact),
libm ln terms quantized DECIMAL at birth before any multi-term sum.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "events_control_chart",
    # Shewhart X-bar + Western Electric rules over the hourly event-
    # count series. Centerline and sigma come from exact integer
    # moments (n, sum y, sum y^2); rule 1 (|y-mu| > 3 sigma) is the
    # cross-multiplied integer comparison (y*n - sy)^2 > 9*(n*syy -
    # sy^2) in DECIMAL(38,0) (y*n ~ 1e10 squares past int64); rule 2
    # (>= 9 consecutive hours on one side of the mean) sides with the
    # integer sign(y*n - sy) and counts runs by the row_number gap-
    # islands identity. Zero floating point anywhere.
    oracle="""
    WITH hourly AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY hr
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM hourly
    ), sided AS (
      SELECT hr, y,
             CASE WHEN y * n - sy > 0 THEN 1
                  WHEN y * n - sy < 0 THEN -1 ELSE 0 END AS side,
             (CAST(y * n - sy AS DECIMAL(38,0))
              * CAST(y * n - sy AS DECIMAL(38,0))) >
               9 * (CAST(n AS DECIMAL(38,0)) * syy
                    - CAST(sy AS DECIMAL(38,0)) * sy) AS rule1
      FROM hourly CROSS JOIN m
    ), isl AS (
      SELECT side,
             row_number() OVER (ORDER BY hr)
               - row_number() OVER (PARTITION BY side ORDER BY hr)
               AS grp
      FROM sided
    ), runs AS (
      SELECT CAST(count(*) AS BIGINT) AS len FROM isl
      WHERE side <> 0 GROUP BY side, grp
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM hourly) AS n_hours,
      (SELECT CAST(count(*) AS BIGINT) FROM sided WHERE rule1)
        AS n_rule1,
      (SELECT CAST(coalesce(min(hr), -1) AS BIGINT) FROM sided
       WHERE rule1) AS first_rule1_hr,
      (SELECT CAST(count(*) AS BIGINT) FROM runs WHERE len >= 9)
        AS n_rule2_runs,
      (SELECT CAST(coalesce(max(len), 0) AS BIGINT) FROM runs)
        AS longest_run
    """,
)
def events_control_chart(spark, sf_dir):
    """X-bar control chart: one hourly aggregate, one moment
    aggregate, integer cross-multiplied 3-sigma rule, gap-islands run
    rule. The hourly relation is bounded (hours in the timeline), so
    the windows are cheap at any fact scale; the fact table is
    touched exactly once."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.floor(F.col("ts").cast("double") / 3600)
        .cast("bigint")
        .alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    m = hourly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    dev = F.col("y") * F.col("n") - F.col("sy")
    sided = hourly.crossJoin(F.broadcast(m)).select(
        "hr",
        "y",
        F.when(dev > 0, 1).when(dev < 0, -1).otherwise(0).alias("side"),
        (
            dev.cast("decimal(38,0)") * dev.cast("decimal(38,0)")
            > 9
            * (
                F.col("n").cast("decimal(38,0)") * F.col("syy")
                - F.col("sy").cast("decimal(38,0)") * F.col("sy")
            )
        ).alias("rule1"),
    )
    # One aggregate pass over the enriched relation (hr, rule1, side,
    # island length, island head) instead of three cross-joined
    # single-row aggregates — the latter re-derived the whole lineage
    # per output and tripled both the scan count and the Catalyst
    # analysis cost (measured 7.4 s cold / 3 jobs vs one job here).
    isl = sided.withColumn(
        "grp",
        F.row_number().over(W.orderBy("hr"))
        - F.row_number().over(W.partitionBy("side").orderBy("hr")),
    )
    wisl = W.partitionBy("side", "grp")
    enriched = isl.select(
        "hr",
        "side",
        "rule1",
        F.count(F.lit(1)).over(wisl).cast("bigint").alias("len"),
        (F.row_number().over(wisl.orderBy("hr")) == 1).alias("head"),
    )
    nonzero = F.col("side") != 0
    return enriched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.coalesce(F.sum(F.col("rule1").cast("bigint")), F.lit(0))
        .cast("bigint")
        .alias("n_rule1"),
        F.coalesce(F.min(F.when(F.col("rule1"), F.col("hr"))), F.lit(-1))
        .cast("bigint")
        .alias("first_rule1_hr"),
        F.coalesce(
            F.sum(
                F.when(
                    nonzero & F.col("head") & (F.col("len") >= 9), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_rule2_runs"),
        F.coalesce(
            F.max(F.when(nonzero, F.col("len")).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("longest_run"),
    )


@query(
    "agg_skyline_pareto",
    # Skyline (Pareto frontier) of parts: minimize retail price,
    # maximize size. Dedup to distinct (price_cents, size) cells,
    # sweep in (price asc, size desc) order: a cell survives iff its
    # size strictly exceeds the running max size of all preceding
    # cells (any preceding cell with size >= this one strictly
    # dominates — it has strictly lower price, or equal price and
    # strictly larger size). O(n log n), pure integers — the
    # NOT-EXISTS all-pairs formulation this replaces is quadratic.
    oracle="""
    WITH cells AS (
      SELECT CAST(round(p_retailprice * 100, 0) AS BIGINT)
               AS price_cents,
             CAST(p_size AS BIGINT) AS size,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM part GROUP BY price_cents, size
    ), swept AS (
      SELECT price_cents, size, n_parts,
             max(size) OVER (ORDER BY price_cents ASC, size DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM cells
    )
    SELECT price_cents, size, n_parts
    FROM swept WHERE prev_max IS NULL OR size > prev_max
    """,
)
def agg_skyline_pareto(spark, sf_dir):
    """Sweep-line skyline over the distinct-cell relation: one
    groupBy shuffle to cells (map-side combine), one ordered window
    over the bounded cell set. At 100 TB the cell relation is
    |distinct (price, size)| — the frontier never touches row-scale
    data twice."""
    p = t(spark, sf_dir, "part")
    cells = p.groupBy(
        F.round(F.col("p_retailprice") * 100, 0)
        .cast("bigint")
        .alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    w = (
        W.orderBy(F.asc("price_cents"), F.desc("size"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    swept = cells.withColumn("prev_max", F.max("size").over(w))
    return swept.filter(
        F.col("prev_max").isNull() | (F.col("size") > F.col("prev_max"))
    ).select("price_cents", "size", "n_parts")


@query(
    "stat_tukey_pairs",
    # Tukey-Kramer post-hoc pairwise contrasts after ANOVA: per-region
    # customer balance means from exact integer cent sums, pooled
    # within-group variance from DECIMAL(38,0) moments, and per pair
    # q = |mean_i - mean_j| / sqrt((s2/2) * (1/n_i + 1/n_j)). The
    # studentized-range critical value q_crit(k=5, df=inf, 0.05) =
    # 3.858 is the SAME decimal literal on both engines (the libm-
    # constant rule). Divisions and sqrt are IEEE-exact; no libm in
    # the chain.
    oracle="""
    WITH g AS (
      SELECT r_name,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT))
                  AS BIGINT) AS s,
             CAST(sum(CAST(round(c_acctbal * 100, 0) AS DECIMAL(38,0))
                      * CAST(round(c_acctbal * 100, 0)
                             AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ss
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
    ), pool AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt,
             CAST(count(*) AS BIGINT) AS k,
             sum(CAST(ss AS DOUBLE)
                 - CAST(s AS DOUBLE) * s / n) AS sse
      FROM g
    )
    SELECT a.r_name AS region_a, b.r_name AS region_b,
           round(CAST(a.s AS DOUBLE) / a.n / 100
                 - CAST(b.s AS DOUBLE) / b.n / 100, 6) AS mean_diff,
           round(abs(CAST(a.s AS DOUBLE) / a.n
                     - CAST(b.s AS DOUBLE) / b.n)
                 / sqrt((sse / (nt - k)) / 2
                        * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat,
           CAST(abs(CAST(a.s AS DOUBLE) / a.n
                    - CAST(b.s AS DOUBLE) / b.n)
                / sqrt((sse / (nt - k)) / 2
                       * (1.0 / a.n + 1.0 / b.n)) > 3.858 AS BOOLEAN)
             AS significant
    FROM g a JOIN g b ON a.r_name < b.r_name CROSS JOIN pool
    """,
)
def stat_tukey_pairs(spark, sf_dir):
    """Pairwise Tukey-Kramer from one exact-moment aggregate: 5
    region rows self-joined into 10 pairs — the moment relation is
    bounded so the pair join never touches the fact table again.
    SSE is a 5-term sum of per-group (ss - s^2/n) doubles: each term
    is one IEEE division on exact integers, identical both engines."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    cents = F.round(F.col("c_acctbal") * 100, 0)
    g = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(cents.cast("bigint")).cast("bigint").alias("s"),
            F.sum(
                cents.cast("decimal(38,0)") * cents.cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("ss"),
        )
    )
    pool = g.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        ).alias("sse"),
    )
    a = g.select(
        F.col("r_name").alias("region_a"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = g.select(
        F.col("r_name").alias("region_b"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    mean_a = F.col("sa").cast("double") / F.col("na")
    mean_b = F.col("sb").cast("double") / F.col("nb")
    se = F.sqrt(
        (F.col("sse") / (F.col("nt") - F.col("k")))
        / 2
        * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    qs = F.abs(mean_a - mean_b) / se
    return (
        a.join(b, F.col("region_a") < F.col("region_b"))
        .crossJoin(F.broadcast(pool))
        .select(
            "region_a",
            "region_b",
            F.round(mean_a / 100 - mean_b / 100, 6).alias("mean_diff"),
            F.round(qs, 6).alias("q_stat"),
            (qs > 3.858).alias("significant"),
        )
    )


@query(
    "stat_g_test",
    # G-test of independence (likelihood-ratio chi-square) on the
    # 2 x k table weekend-vs-weekday x event_type. Day-of-week uses
    # the PORTABLE integer identity floor(epoch/86400) % 7 (Spark
    # dayofweek is 1-based, DuckDB 0-based — neither appears).
    # G = 2 * sum O*ln(O/E): each libm ln term is quantized
    # DECIMAL(28,9) at birth before the bounded (2k-cell) sum — the
    # final-emission audit rule.
    oracle="""
    WITH obs AS (
      SELECT CASE WHEN CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7
                  IN (2, 3) THEN 1 ELSE 0 END AS wk,
             event_type,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY wk, event_type
    ), tot AS (
      SELECT CAST(sum(o) AS BIGINT) AS n FROM obs
    ), rowt AS (
      SELECT wk, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY wk
    ), colt AS (
      SELECT event_type, CAST(sum(o) AS BIGINT) AS ct
      FROM obs GROUP BY event_type
    ), terms AS (
      SELECT CAST(round(
               o * ln(CAST(o AS DOUBLE)
                      / (CAST(rt AS DOUBLE) * ct / n)), 9)
             AS DECIMAL(28,9)) AS term
      FROM obs JOIN rowt USING (wk) JOIN colt USING (event_type)
      CROSS JOIN tot
    )
    SELECT CAST((SELECT count(*) FROM colt) - 1 AS BIGINT) AS df,
           (SELECT n FROM tot) AS n_events,
           round(2 * CAST(sum(term) AS DOUBLE), 6) AS g_stat
    FROM terms
    """,
)
def stat_g_test(spark, sf_dir):
    """Likelihood-ratio independence test: one groupBy to the 2k-cell
    observed relation, broadcast margins, quantized ln terms. The
    fact table is scanned once; everything after is O(cells)."""
    ev = t(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.when(
            (
                F.floor(F.col("ts").cast("double") / 86400).cast(
                    "bigint"
                )
                % 7
            ).isin(2, 3),
            1,
        )
        .otherwise(0)
        .alias("wk"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    tot = obs.agg(F.sum("o").cast("bigint").alias("n"))
    rowt = obs.groupBy("wk").agg(
        F.sum("o").cast("bigint").alias("rt")
    )
    colt = obs.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("ct")
    )
    terms = (
        obs.join(F.broadcast(rowt), "wk")
        .join(F.broadcast(colt), "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                F.col("o")
                * F.log(
                    F.col("o").cast("double")
                    / (
                        F.col("rt").cast("double")
                        * F.col("ct")
                        / F.col("n")
                    )
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("term")
        )
    )
    df_ = colt.agg(
        (F.count(F.lit(1)) - 1).cast("bigint").alias("df")
    )
    g = terms.agg(
        F.round(2 * F.sum("term").cast("double"), 6).alias("g_stat")
    )
    return (
        df_.crossJoin(F.broadcast(tot))
        .crossJoin(g)
        .select("df", F.col("n").alias("n_events"), "g_stat")
    )
