"""Sixth analytics wave: the SQL-surface lateral-join row plus four
cross-series / robust-stats operators — lead-lag cross-correlation,
Kendall tau-b, IQR outlier fencing, and a Heaps'-law vocabulary-growth
fit.

Exactness per query: cross-correlation and tau-b are built on INTEGER
daily-count moments (identical chains only at the final division);
the IQR fences replay the engine's own quantile interpolation formula
(lo + frac*(hi-lo) at pos = q*(n-1)) in the oracle — never
quantile_cont — so the raw fence comparison each row makes is the
same double in both engines; the Heaps fit rounds each per-source
ln-term to 9 dp and sums in DECIMAL(38,9) (bounded 20-source
relation, order-safe anyway).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

_D38_9 = "decimal(38,9)"


@query(
    "join_lateral_topk",
    # Correlated LATERAL subquery with LIMIT: top-3 customers by
    # account balance per nation — the SQL-surface twin of
    # win_topk_per_group (same semantics, the lateral spelling).
    # Parquet doubles order identically in both engines; (acctbal
    # DESC, c_name) is a total order.
    oracle="""
    SELECT n.n_name, t.c_name, t.c_acctbal
    FROM nation n JOIN LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 3
    ) t ON TRUE
    ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
    """,
)
def join_lateral_topk(spark, sf_dir):
    """Correlated LATERAL join — the modern SQL spelling of 'top-k
    rows of B for every row of A'. Spark (3.2+) plans the correlated
    LIMIT subquery as a partitioned rank under the hood — no
    per-nation driver loop, one customer shuffle keyed by nationkey —
    so the lateral form costs the same as the explicit window
    rewrite; this row pins that the engine accepts the declarative
    spelling. cites reference pipeline.rs:34-58 (projection +
    grouping) for the capability class."""
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM {n} n JOIN LATERAL (
          SELECT c_name, c_acctbal FROM {c} c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 3
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_name
        """,
        n=n,
        c=c,
    )


_DAILY2_SQL = """
      SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
               AS x,
             CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
               AS y
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY 1
"""


def _daily2(spark, sf_dir):
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    return ev.groupBy(
        F.floor(F.col("ts").cast("double") / 86400)
        .cast("bigint")
        .alias("day")
    ).agg(
        F.count(F.when(F.col("event_type") == "view", 1))
        .cast("bigint")
        .alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("bigint")
        .alias("y"),
    )


@query(
    "ts_cross_correlation",
    # Lead-lag scan: Pearson corr between daily views and purchases
    # shifted by lag in [-3, 3]. Each lag's moments are exact INTEGER
    # sums over the inner-joined day grid; corr is one identical
    # double chain. The lag spine is a 7-row literal.
    oracle=f"""
    WITH daily AS (
      {_DAILY2_SQL}
    ), lags AS (
      SELECT unnest(range(-3, 4)) AS lag
    ), m AS (
      SELECT l.lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a.x) AS BIGINT) AS sx,
             CAST(sum(b.y) AS BIGINT) AS sy,
             CAST(sum(a.x * a.x) AS BIGINT) AS sxx,
             CAST(sum(b.y * b.y) AS BIGINT) AS syy,
             CAST(sum(a.x * b.y) AS BIGINT) AS sxy
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + l.lag
      GROUP BY l.lag
    )
    SELECT lag, n,
           round((CAST(sxy AS DOUBLE) / n
                  - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                 / (sqrt(CAST(sxx AS DOUBLE) / n
                         - (CAST(sx AS DOUBLE) / n)
                           * (CAST(sx AS DOUBLE) / n))
                    * sqrt(CAST(syy AS DOUBLE) / n
                           - (CAST(sy AS DOUBLE) / n)
                             * (CAST(sy AS DOUBLE) / n))), 6) AS xcorr
    FROM m ORDER BY lag
    """,
)
def ts_cross_correlation(spark, sf_dir):
    """Does view volume LEAD purchase volume? The +/-3-day lead-lag
    cross-correlation scan — the first question of any
    marketing-attribution or demand-forecast exercise. Plan: one
    day-grain groupBy on the fact (map-side combine), a 7-row lag
    spine exploded against the bounded daily relation, a self-join on
    the shifted day key, then per-lag INTEGER moment aggregates;
    corr is a single identical double chain per lag."""
    daily = _daily2(spark, sf_dir).localCheckpoint()  # feeds both sides
    lags = F.array([F.lit(i) for i in range(-3, 4)])
    a = daily.select("day", "x").withColumn("lag", F.explode(lags))
    b = daily.select(
        F.col("day").alias("bday"), "y"
    )
    j = a.join(b, F.col("bday") == F.col("day") + F.col("lag"))
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / nd
    my = F.col("sy").cast("double") / nd
    cov = F.col("sxy").cast("double") / nd - mx * my
    vx = F.col("sxx").cast("double") / nd - mx * mx
    vy = F.col("syy").cast("double") / nd - my * my
    return m.select(
        "lag", "n", F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("xcorr")
    ).orderBy("lag")


@query(
    "stat_kendall_tau",
    # Kendall tau-b between the daily view and purchase counts:
    # concordant/discordant/tied pair counts are PURE INTEGERS from
    # the calendar-bounded day-pair self-join (the Mann-Kendall
    # shape); tau-b is one identical chain with the tie-corrected
    # denominator sqrt((n0-n1)(n0-n2)).
    oracle=f"""
    WITH daily AS (
      {_DAILY2_SQL}
    ), pairs AS (
      SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END AS c,
             CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END AS d,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b ON a.day < b.day
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(c) AS BIGINT) AS nc,
             CAST(sum(d) AS BIGINT) AS nd,
             CAST(sum(tx) AS BIGINT) AS n1,
             CAST(sum(ty) AS BIGINT) AS n2
      FROM pairs
    )
    SELECT n0, nc, nd,
           round((nc - nd) / (sqrt(CAST(n0 - n1 AS DOUBLE))
                              * sqrt(CAST(n0 - n2 AS DOUBLE))), 6)
             AS tau_b
    FROM m
    """,
)
def stat_kendall_tau(spark, sf_dir):
    """Kendall tau-b rank concordance between daily view and purchase
    volumes — the robust 'do these two series move together'
    coefficient whose verdict is driven by PURE INTEGER concordance
    counts (it cannot flip engines, unlike a float correlation).
    Plan: day-grain conditional-count groupBy, calendar-bounded
    day-pair self-join (~|days|^2 at any fact scale), one 1-row
    integer aggregate, one final chain with the tie-corrected
    denominator."""
    daily = _daily2(spark, sf_dir)
    a = daily.select(
        F.col("day").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    p = a.join(b, F.col("da") < F.col("db"))
    prod = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    m = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.when(prod > 0, 1).otherwise(0)).cast("bigint").alias("nc"),
        F.sum(F.when(prod < 0, 1).otherwise(0)).cast("bigint").alias("nd"),
        F.sum(F.when(F.col("xa") == F.col("xb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("ya") == F.col("yb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    return m.select(
        "n0",
        "nc",
        "nd",
        F.round(
            (F.col("nc") - F.col("nd"))
            / (
                F.sqrt((F.col("n0") - F.col("n1")).cast("double"))
                * F.sqrt((F.col("n0") - F.col("n2")).cast("double"))
            ),
            6,
        ).alias("tau_b"),
    )


@query(
    "diag_outlier_iqr",
    # Tukey-fence outlier census per event type. The oracle replays
    # the ENGINE'S interpolation (lo + frac*(hi-lo) at pos=q*(n-1))
    # with explicit rank windows — not quantile_cont — so the fence
    # doubles are bit-identical and the per-row fence comparison can
    # never flip engines.
    oracle="""
    WITH ranked AS (
      SELECT event_type, value AS v,
             row_number() OVER (PARTITION BY event_type ORDER BY value)
               - 1 AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), q AS (
      SELECT event_type,
             max(n) AS n,
             max(CASE WHEN rn = CAST(floor(0.25 * (n - 1)) AS BIGINT)
                      THEN v END) AS q1_lo,
             max(CASE WHEN rn = CAST(ceil(0.25 * (n - 1)) AS BIGINT)
                      THEN v END) AS q1_hi,
             max(CASE WHEN rn = CAST(floor(0.75 * (n - 1)) AS BIGINT)
                      THEN v END) AS q3_lo,
             max(CASE WHEN rn = CAST(ceil(0.75 * (n - 1)) AS BIGINT)
                      THEN v END) AS q3_hi
      FROM ranked GROUP BY event_type
    ), f AS (
      SELECT event_type, n,
             q1_lo + (0.25 * (n - 1) - floor(0.25 * (n - 1)))
                     * (q1_hi - q1_lo) AS q1,
             q3_lo + (0.75 * (n - 1) - floor(0.75 * (n - 1)))
                     * (q3_hi - q3_lo) AS q3
      FROM q
    )
    SELECT e.event_type,
           CAST(max(f.n) AS BIGINT) AS n,
           round(max(f.q1), 6) AS q1,
           round(max(f.q3), 6) AS q3,
           CAST(count(*) FILTER (WHERE e.value
                < f.q1 - 1.5 * (f.q3 - f.q1)) AS BIGINT) AS n_low,
           CAST(count(*) FILTER (WHERE e.value
                > f.q3 + 1.5 * (f.q3 - f.q1)) AS BIGINT) AS n_high
    FROM events e JOIN f ON e.event_type = f.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def diag_outlier_iqr(spark, sf_dir):
    """Tukey 1.5-IQR outlier census per event type — the
    box-plot-fence anomaly count every data-quality dashboard starts
    with. Plan: exact q1/q3 from the bucketed percentile tier (no
    per-group reducer sort), fences broadcast back onto one fact
    scan, conditional-count aggregate. The oracle replays the
    engine's own interpolation formula so the fence comparison is
    the same double on both sides."""
    from ..ops import exact_percentiles_auto

    ev = t(spark, sf_dir, "events")
    q = exact_percentiles_auto(
        ev, "value", [(0.25, "q1"), (0.75, "q3")], group_cols=("event_type",)
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.max("q1"), 6).alias("q1"),
            F.round(F.max("q3"), 6).alias("q3"),
            F.count(F.when(F.col("value") < lo, 1))
            .cast("bigint")
            .alias("n_low"),
            F.count(F.when(F.col("value") > hi, 1))
            .cast("bigint")
            .alias("n_high"),
        )
        .orderBy("event_type")
    )


@query(
    "corpus_heaps_fit",
    # Heaps'-law fit V = K * n^beta over the per-source
    # (tokens, types) points: ln-ln OLS on the bounded |sources|
    # relation; each ln term rounded to 9 dp and summed in
    # DECIMAL(38,9); slope/intercept/r2 identical chains.
    oracle=r"""
    WITH pts AS (
      SELECT source,
             round(ln(CAST(count(*) AS DOUBLE)), 9) AS lx,
             round(ln(CAST(count(DISTINCT word) AS DOUBLE)), 9) AS ly
      FROM (SELECT source,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                     AS word
            FROM documents)
      GROUP BY source
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(CAST(lx AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS sx,
             CAST(sum(CAST(ly AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS sy,
             CAST(sum(CAST(round(lx * lx, 9) AS DECIMAL(38,9)))
                  AS DECIMAL(38,9)) AS sxx,
             CAST(sum(CAST(round(lx * ly, 9) AS DECIMAL(38,9)))
                  AS DECIMAL(38,9)) AS sxy,
             CAST(sum(CAST(round(ly * ly, 9) AS DECIMAL(38,9)))
                  AS DECIMAL(38,9)) AS syy
      FROM pts
    )
    SELECT k AS n_sources,
           round((CAST(sxy AS DOUBLE) / k
                  - (CAST(sx AS DOUBLE) / k) * (CAST(sy AS DOUBLE) / k))
                 / (CAST(sxx AS DOUBLE) / k
                    - (CAST(sx AS DOUBLE) / k) * (CAST(sx AS DOUBLE) / k)),
                 6) AS beta,
           round(CAST(sy AS DOUBLE) / k
                 - ((CAST(sxy AS DOUBLE) / k
                     - (CAST(sx AS DOUBLE) / k) * (CAST(sy AS DOUBLE) / k))
                    / (CAST(sxx AS DOUBLE) / k
                       - (CAST(sx AS DOUBLE) / k)
                         * (CAST(sx AS DOUBLE) / k)))
                   * (CAST(sx AS DOUBLE) / k), 6) AS ln_k
    FROM m
    """,
)
def corpus_heaps_fit(spark, sf_dir):
    """Heaps'-law vocabulary-growth exponent: fit types = K * tokens^b
    across sources (ln-ln least squares) — the scaling constant that
    predicts how a tokenizer's vocabulary grows with corpus size, and
    a drift alarm when a source's richness falls off the corpus line.
    Plan: one explode + per-source (tokens, distinct-types) aggregate
    (the only data-sized stage), then a 1-row OLS over the bounded
    source relation with round-9 DECIMAL moment sums."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "word"
        ),
    )
    pts = tok.groupBy("source").agg(
        F.round(F.log(F.count(F.lit(1)).cast("double")), 9).alias("lx"),
        F.round(F.log(F.countDistinct("word").cast("double")), 9).alias(
            "ly"
        ),
    )
    dec = lambda c: F.round(c, 9).cast(_D38_9)  # noqa: E731
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.col("lx").cast(_D38_9)).cast(_D38_9).alias("sx"),
        F.sum(F.col("ly").cast(_D38_9)).cast(_D38_9).alias("sy"),
        F.sum(dec(F.col("lx") * F.col("lx"))).cast(_D38_9).alias("sxx"),
        F.sum(dec(F.col("lx") * F.col("ly"))).cast(_D38_9).alias("sxy"),
        F.sum(dec(F.col("ly") * F.col("ly"))).cast(_D38_9).alias("syy"),
    )
    kd = F.col("k").cast("double")
    mx = F.col("sx").cast("double") / kd
    my = F.col("sy").cast("double") / kd
    beta = (F.col("sxy").cast("double") / kd - mx * my) / (
        F.col("sxx").cast("double") / kd - mx * mx
    )
    return m.select(
        F.col("k").alias("n_sources"),
        F.round(beta, 6).alias("beta"),
        F.round(my - beta * mx, 6).alias("ln_k"),
    )
