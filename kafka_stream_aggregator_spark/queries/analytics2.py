"""Second analytics wave (round 6 close): sequence/graph/segmentation
shapes a production analytics engine is expected to ship — Markov
transition matrices, RFM segmentation, Gini concentration, weighted
medians, integer-exact CUSUM changepoint detection, Benford digit
diagnostics, and session path mining. All pure DataFrame expressions
with exact DuckDB oracles; money and CUSUM arithmetic ride the
round-6 integer/DECIMAL discipline so hashes are portable at any
scale tier.
"""

from __future__ import annotations

import math

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

# Benford first-digit expectations as shared 10-dp literals: both
# engines parse the identical decimal strings, so the doubles are
# bit-equal — no cross-libm log10 in either plan.
_BENFORD = [round(math.log10(1.0 + 1.0 / d), 10) for d in range(1, 10)]
_BENFORD_SQL = ", ".join(f"{p:.10f}" for p in _BENFORD)


def _cents(col):
    """floor(x*100+0.5) AS BIGINT — the repo-wide exact-money idiom."""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


@query(
    "ts_markov_transitions",
    # First-order Markov chain over per-user event sequences: one
    # partitioned lag window on the fact (the sessionize shape), then
    # a bounded |types|^2 aggregate; the row probability is a single
    # exact double division. Scales as one shuffle on user_id.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), c AS (
      SELECT prev AS from_type, event_type AS to_type, count(*) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
           CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY from_type) AS p_transition
    FROM c
    """,
)
def ts_markov_transitions(spark, sf_dir):
    """Event-type transition matrix (from, to, count, probability).

    Per-user ordering is (ts, event_id) — the engine's canonical total
    order for event streams. The window that normalizes counts into
    probabilities runs over the post-aggregation relation (bounded at
    |event_types|^2 rows), never the fact."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c = seq.groupBy(
        F.col("prev").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = W.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        F.col("n").alias("n_transitions"),
        (F.col("n").cast("double") / F.sum("n").over(tot)).alias(
            "p_transition"
        ),
    )


@query(
    "cohort_rfm_segments",
    # RFM segmentation with DETERMINISTIC quartile-threshold binning
    # (score = 1 + [x>q1] + [x>q2] + [x>q3]) instead of ntile: ntile
    # both breaks ties arbitrarily and is the global single-reducer
    # shape this engine bans. Quartiles come from the distributed
    # exact-percentile ladder and broadcast into a map-only scorer.
    # Monetary is exact integer cents.
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
               AS recency_days,
             count(*) AS frequency,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS monetary_c
      FROM orders GROUP BY o_custkey
    ), q AS (
      SELECT quantile_cont(recency_days, 0.25) AS r1,
             quantile_cont(recency_days, 0.50) AS r2,
             quantile_cont(recency_days, 0.75) AS r3,
             quantile_cont(frequency, 0.25) AS f1,
             quantile_cont(frequency, 0.50) AS f2,
             quantile_cont(frequency, 0.75) AS f3,
             quantile_cont(monetary_c, 0.25) AS m1,
             quantile_cont(monetary_c, 0.50) AS m2,
             quantile_cont(monetary_c, 0.75) AS m3
      FROM cust
    ), scored AS (
      SELECT 1 + CAST(recency_days > r1 AS INT)
               + CAST(recency_days > r2 AS INT)
               + CAST(recency_days > r3 AS INT) AS r_score,
             1 + CAST(frequency > f1 AS INT)
               + CAST(frequency > f2 AS INT)
               + CAST(frequency > f3 AS INT) AS f_score,
             1 + CAST(monetary_c > m1 AS INT)
               + CAST(monetary_c > m2 AS INT)
               + CAST(monetary_c > m3 AS INT) AS m_score,
             monetary_c
      FROM cust CROSS JOIN q
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(monetary_c AS DECIMAL(38,0))) AS DOUBLE)
             / count(*) / 100 AS avg_monetary
    FROM scored GROUP BY 1, 2, 3
    """,
)
def cohort_rfm_segments(spark, sf_dir):
    """Recency/Frequency/Monetary segmentation of the customer base.

    Three exact global quartile relations (1 row each, via the
    BUCKETED exact-percentile tier — with no group columns the
    ladder's sort tier is a global rank window, the shape the
    suite-wide no-unpartitioned-Window assertion keeps out, cf.
    fn_quantile_bin) broadcast into the per-customer scorer; the
    output is the bounded 4^3 segment grid. avg_monetary is the
    IDENTICAL double chain on both engines (exact DECIMAL cents sum
    -> double -> /n -> /100) and is deliberately NOT engine-side
    rounded: with n a 2^a*5^b multiple the quotient is a terminating
    decimal that lands exactly on a 6dp rounding tie, where Spark's
    BigDecimal HALF_UP and DuckDB's scaled-multiply round() disagree
    on which side falls (observed live at sf0.01, segment n=32);
    bit-equal unrounded doubles hash identically under the driver's
    symmetric canonicalization."""
    from ..ops import exact_percentiles_bucketed

    o = t(spark, sf_dir, "orders")
    gmax = o.agg(F.max(F.to_date("o_orderdate")).alias("gmax"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("cmax"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(_cents(F.col("o_totalprice"))).alias("monetary_c"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            F.datediff("gmax", "cmax").alias("recency_days"),
            "frequency",
            "monetary_c",
        )
    )
    cust = cust.localCheckpoint()  # reused by 3 percentile passes + scorer
    qs = [(0.25, "{}1"), (0.50, "{}2"), (0.75, "{}3")]
    bounds = None
    for col, tag in [
        ("recency_days", "r"),
        ("frequency", "f"),
        ("monetary_c", "m"),
    ]:
        b = exact_percentiles_bucketed(
            cust, col, [(p, name.format(tag)) for p, name in qs]
        )
        bounds = b if bounds is None else bounds.crossJoin(b)

    def score(col, tag):
        return (
            F.lit(1)
            + (F.col(col) > F.col(f"{tag}1")).cast("int")
            + (F.col(col) > F.col(f"{tag}2")).cast("int")
            + (F.col(col) > F.col(f"{tag}3")).cast("int")
        )

    scored = cust.crossJoin(F.broadcast(bounds)).select(
        score("recency_days", "r").alias("r_score"),
        score("frequency", "f").alias("f_score"),
        score("monetary_c", "m").alias("m_score"),
        "monetary_c",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (
            F.sum(F.col("monetary_c").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / 100
        ).alias("avg_monetary"),
    )


@query(
    "agg_gini_concentration",
    # Gini coefficient of customer spend per nation — market
    # concentration. With x sorted ascending and 1-based rank i:
    # G = (2*sum(i*x) - (n+1)*sum(x)) / (n*sum(x)). Everything up to
    # the final division is exact integer cents in DECIMAL(38,0)
    # (i*x alone reaches ~1e21 at large SF — past int64), and the
    # rank is tie-invariant for Gini (equal x values contribute the
    # same sum(i) regardless of tie order), so the hash is portable.
    oracle="""
    WITH spend AS (
      SELECT c_nationkey, o_custkey,
             sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS sp
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT c_nationkey, sp,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY sp, o_custkey) AS i
      FROM spend
    ), g AS (
      SELECT c_nationkey, count(*) AS n,
             sum(CAST(sp AS DECIMAL(38,0))) AS s0,
             sum(CAST(i AS DECIMAL(38,0)) * CAST(sp AS DECIMAL(38,0))) AS s1
      FROM ranked GROUP BY 1
    )
    SELECT n_name,
           CAST(n AS BIGINT) AS n_customers,
           CAST(s0 AS DOUBLE) / 100 AS total_spend,
           CAST(2 * s1 - (n + 1) * s0 AS DOUBLE)
             / CAST(n * s0 AS DOUBLE) AS gini
    FROM g JOIN nation ON n_nationkey = c_nationkey
    """,
)
def agg_gini_concentration(spark, sf_dir):
    """Per-nation Gini of customer order spend.

    The rank window runs per nation over the PER-CUSTOMER aggregate
    (already one reduction smaller than the fact); at extreme scale a
    per-group distributed_global_rank would replace it, and the
    docstring records that trade. All sums DECIMAL(38,0)-exact."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("sp"))
    )
    w = W.partitionBy("c_nationkey").orderBy("sp", "o_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w))
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    g = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("sp")).alias("s0"),
        F.sum(dec("i") * dec("sp")).alias("s1"),
    )
    return (
        g.join(F.broadcast(n), g.c_nationkey == n.n_nationkey)
        .select(
            "n_name",
            F.col("n").alias("n_customers"),
            (F.col("s0").cast("double") / 100).alias("total_spend"),
            (
                (2 * F.col("s1") - (F.col("n") + 1) * F.col("s0")).cast(
                    "double"
                )
                / (F.col("n") * F.col("s0")).cast("double")
            ).alias("gini"),
        )
    )


@query(
    "agg_weighted_median",
    # Quantity-weighted median price per return flag via cumulative
    # weights: the (flag, price-cent) pre-aggregate is bounded by the
    # VALUE DOMAIN, not the row count (the exact_percentiles_counts
    # argument), so the per-flag cumulative window never sees the
    # fact. Lower-weighted-median convention: smallest price with
    # 2*cumw >= total weight — all-integer comparisons, exact at any
    # scale.
    oracle="""
    WITH pc AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
             sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT l_returnflag, price_c, w,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_c
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM pc
    )
    SELECT l_returnflag,
           CAST(tw AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN 2 * cw >= tw THEN price_c END)
                AS DOUBLE) / 100 AS weighted_median
    FROM cum GROUP BY l_returnflag, tw
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Weighted median l_extendedprice (weight = l_quantity) per
    l_returnflag — the order-statistics shape SQL's percentile family
    cannot express. price_c is unique within the pre-aggregate, so the
    cumulative ordering is total without a tiebreaker."""
    li = t(spark, sf_dir, "lineitem")
    pc = li.groupBy(
        "l_returnflag", _cents(F.col("l_extendedprice")).alias("price_c")
    ).agg(F.sum(F.floor(F.col("l_quantity") + 0.5).cast("long")).alias("w"))
    wcum = (
        W.partitionBy("l_returnflag")
        .orderBy("price_c")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wtot = W.partitionBy("l_returnflag")
    cum = pc.select(
        "l_returnflag",
        "price_c",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wtot).alias("tw"),
    )
    return cum.groupBy("l_returnflag", "tw").agg(
        (
            F.min(
                F.when(2 * F.col("cw") >= F.col("tw"), F.col("price_c"))
            ).cast("double")
            / 100
        ).alias("weighted_median")
    ).select(
        "l_returnflag",
        F.col("tw").alias("total_weight"),
        "weighted_median",
    )


@query(
    "ts_cusum_changepoint",
    # One-sided CUSUM per event type over the hourly series — but as
    # PREFIX SUMS, not a fold: S_i = max(0, S_{i-1} + (x_i - mean))
    # has the closed form S_i = P_i - min_{0<=j<=i} P_j with
    # P_i = sum_{t<=i}(x_t - mean) and P_0 = 0 — the EMPTY prefix must
    # participate in the min (least(min OVER ..., 0)); dropping it
    # deviates from the recurrence whenever every prefix sum is
    # positive (caught by the sequential-fold replay in
    # test_analytics2.py, invisible to cross-engine parity because the
    # oracle shared the formulation). Two partitioned windows replace
    # the sequential recurrence entirely (cf. ind_holt_trend, whose
    # recurrence has no such form and needs applyInPandas). The
    # whole chain is integer-exact: x in micro-units, and P scaled by
    # n (P'_i = n*cumx_i - i*sumx) so the per-type mean never becomes
    # a float until the single final division.
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS slot,
             sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS x
      FROM events GROUP BY 1, 2
    ), p AS (
      SELECT event_type, slot,
             CAST(count(*) OVER (PARTITION BY event_type) AS DECIMAL(38,0))
               AS n,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY slot)
                  AS DECIMAL(38,0)) AS i,
             CAST(sum(x) OVER (PARTITION BY event_type ORDER BY slot
                               ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38,0)) AS cumx,
             CAST(sum(x) OVER (PARTITION BY event_type) AS DECIMAL(38,0))
               AS sumx
      FROM hourly
    ), s AS (
      SELECT event_type, slot, n,
             (n * cumx - i * sumx)
               - least(min(n * cumx - i * sumx)
                         OVER (PARTITION BY event_type ORDER BY slot
                               ROWS UNBOUNDED PRECEDING),
                       0) AS cusum_scaled
      FROM p
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           CAST(max(cusum_scaled) AS DOUBLE)
             / CAST(n AS DOUBLE) / 1000000 AS max_cusum,
           CAST(min(CASE WHEN cusum_scaled = max_cusum_s THEN slot END)
                AS BIGINT) AS peak_slot
    FROM (SELECT *, max(cusum_scaled) OVER (PARTITION BY event_type)
                      AS max_cusum_s
          FROM s)
    GROUP BY event_type, n
    """,
)
def ts_cusum_changepoint(spark, sf_dir):
    """Changepoint scan: per event type, the maximum one-sided CUSUM
    of hourly value sums against the series mean, and the hour where
    it peaks (earliest on exact ties). Windows run over the hourly
    aggregate (time-bounded), partitioned by type."""
    ev = t(spark, sf_dir, "events")
    slot = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    hourly = ev.groupBy("event_type", slot.alias("slot")).agg(
        F.sum(
            F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
        ).alias("x")
    )
    by_t = W.partitionBy("event_type")
    ordered = by_t.orderBy("slot").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    dec = "decimal(38,0)"
    p = hourly.select(
        "event_type",
        "slot",
        F.count(F.lit(1)).over(by_t).cast(dec).alias("n"),
        F.row_number().over(by_t.orderBy("slot")).cast(dec).alias("i"),
        F.sum("x").over(ordered).cast(dec).alias("cumx"),
        F.sum("x").over(by_t).cast(dec).alias("sumx"),
    )
    pp = p.withColumn(
        "pscaled", F.col("n") * F.col("cumx") - F.col("i") * F.col("sumx")
    )
    s = pp.withColumn(
        "cusum_scaled",
        F.col("pscaled")
        - F.least(
            F.min("pscaled").over(ordered), F.lit(0).cast(dec)
        ),
    )
    s = s.withColumn("max_cusum_s", F.max("cusum_scaled").over(by_t))
    return s.groupBy("event_type", "n").agg(
        (
            F.max("cusum_scaled").cast("double")
            / F.col("n").cast("double")
            / 1000000
        ).alias("max_cusum"),
        F.min(
            F.when(
                F.col("cusum_scaled") == F.col("max_cusum_s"), F.col("slot")
            )
        ).alias("peak_slot"),
    ).select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        "max_cusum",
        "peak_slot",
    )


@query(
    "diag_benford_digits",
    # Benford's-law first-digit audit of order totals. The digit is
    # the leading digit of the CENT-QUANTIZED price (substring of the
    # integer's decimal string — no cross-libm log10 anywhere), and
    # the expected frequencies are shared 10-dp literals, so every
    # value in the row is either exact or a single identical double
    # chain. One scan, bounded 9-row output.
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT) AS VARCHAR), 1, 1) AS INT)
               AS first_digit
      FROM orders
    ), c AS (
      SELECT first_digit, count(*) AS n FROM d GROUP BY 1
    )
    SELECT first_digit, CAST(n AS BIGINT) AS n_orders,
           CAST(n AS DOUBLE) / sum(n) OVER () AS obs_freq,
           CAST(e.p AS DOUBLE) AS exp_freq,
           abs(CAST(n AS DOUBLE) / sum(n) OVER ()
               - CAST(e.p AS DOUBLE)) AS abs_dev
    FROM c JOIN (SELECT unnest(range(1, 10)) AS dig,
                        unnest([{_BENFORD_SQL}]) AS p) e
           ON e.dig = first_digit
    """,
)
def diag_benford_digits(spark, sf_dir):
    """First-digit distribution of o_totalprice vs Benford
    expectation — the classic synthetic-data / fraud diagnostic. The
    unpartitioned total window runs over the 9-row digit aggregate
    (bounded), never the fact."""
    o = t(spark, sf_dir, "orders")
    d = o.select(
        F.substring(
            _cents(F.col("o_totalprice")).cast("string"), 1, 1
        )
        .cast("int")
        .alias("first_digit")
    )
    c = d.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n"))
    exp = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD]), F.col("first_digit")
    )
    tot = F.sum("n").over(W.partitionBy())
    obs = F.col("n").cast("double") / tot
    return c.select(
        "first_digit",
        F.col("n").alias("n_orders"),
        obs.alias("obs_freq"),
        exp.alias("exp_freq"),
        F.abs(obs - exp).alias("abs_dev"),
    )


@query(
    "events_top_paths",
    # Session path mining: the 20 most common event-type trigrams
    # across per-user ordered streams. Two lags in ONE window spec
    # (single shuffle on user_id), bounded |types|^3 aggregate, and a
    # fully deterministic top-k order (count desc, then the path).
    oracle="""
    WITH seq AS (
      SELECT event_type AS c,
             lag(event_type, 1) OVER w AS b,
             lag(event_type, 2) OVER w AS a
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT a AS step1, b AS step2, c AS step3,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM seq WHERE a IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n_paths DESC, step1, step2, step3
    LIMIT 20
    """,
)
def events_top_paths(spark, sf_dir):
    """Top-20 event-type trigram paths over (ts, event_id)-ordered
    per-user streams. The final top-k is a TakeOrderedAndProject over
    the bounded trigram aggregate, not a global sort."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("c"),
        F.lag("event_type", 1).over(w).alias("b"),
        F.lag("event_type", 2).over(w).alias("a"),
    ).filter(F.col("a").isNotNull())
    return (
        seq.groupBy(
            F.col("a").alias("step1"),
            F.col("b").alias("step2"),
            F.col("c").alias("step3"),
        )
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(
            F.desc("n_paths"), "step1", "step2", "step3"
        )
        .limit(20)
    )


@query(
    "sketch_sampled_quantiles",
    # Quantile estimation over a PORTABLE Bernoulli sample: membership
    # is pmod(portable_u64(key), 1000) < 50 (an exact 5% hash sample,
    # mergeable across partitions and engines), so the oracle replays
    # the identical sample and the "approximate" quantiles hash-match
    # exactly — the sampling tier of the percentile ladder gets the
    # same oracle-replayed treatment as the Bloom/CMS/HLL/MinHash
    # family. Quantile values are the identical interpolation chain on
    # both engines (quantile_cont parity pinned by agg_percentiles),
    # left unrounded.
    oracle="""
    WITH s AS (
      SELECT l_returnflag, l_extendedprice
      FROM lineitem
      WHERE CAST('0x' || substr(md5(
              CAST(l_orderkey AS VARCHAR) || ':' ||
              CAST(l_linenumber AS VARCHAR) || ':sq'), 1, 15) AS BIGINT)
            % 1000 < 50
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_sampled,
           quantile_cont(l_extendedprice, 0.50) AS p50,
           quantile_cont(l_extendedprice, 0.90) AS p90,
           quantile_cont(l_extendedprice, 0.99) AS p99
    FROM s GROUP BY l_returnflag
    """,
)
def sketch_sampled_quantiles(spark, sf_dir):
    """Per-flag p50/p90/p99 over a reproducible 5% hash sample of
    lineitem. The sample predicate is map-only codegen; the percentile
    pass uses the size-tiered ladder on the 20x-reduced relation
    (grouped, partitioned windows only)."""
    from ..ops import exact_percentiles_auto
    from ..sketches import portable_u64

    li = t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        ":", F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    s = li.filter(F.pmod(portable_u64(key, salt="sq"), 1000) < 50).select(
        "l_returnflag", "l_extendedprice"
    )
    n = s.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_sampled"))
    q = exact_percentiles_auto(
        s,
        "l_extendedprice",
        [(0.50, "p50"), (0.90, "p90"), (0.99, "p99")],
        group_cols=("l_returnflag",),
    )
    return n.join(q, "l_returnflag").select(
        "l_returnflag", "n_sampled", "p50", "p90", "p99"
    )


@query(
    "graph_pagerank",
    # Two damped PageRank iterations over the undirected
    # customer-supplier bipartite graph (edge = at least one order
    # line), in FIXED-POINT integer arithmetic: rank unit 1e-6,
    # contribution = (85 * (r div deg)) div 100 — every operation is
    # integer division/truncation, so the result is deterministic,
    # summation-order-independent, and exactly reproducible across
    # engines (floating PageRank sums flip ulps under Spark's
    # nondeterministic aggregation order). Long-arithmetic bounds:
    # max node rank <= total mass = N*1e6 (< 2^63 up to ~9e12 nodes);
    # 85*r <= 8.5e16. Each iteration is one vertex-keyed shuffle; the
    # final top-20 is a TakeOrderedAndProject.
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
                      's:' || CAST(l_suppkey AS VARCHAR) AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
      SELECT c AS src, s AS dst FROM e0
      UNION ALL
      SELECT s AS src, c AS dst FROM e0
    ), deg AS (
      SELECT src AS node, count(*) AS d FROM edges GROUP BY 1
    ), r1 AS (
      SELECT dst AS node,
             150000 + sum((85 * (1000000 // d)) // 100) AS r
      FROM edges JOIN deg ON edges.src = deg.node
      GROUP BY dst
    ), r2 AS (
      SELECT dst AS node,
             150000 + sum((85 * (r // d)) // 100) AS r
      FROM edges
      JOIN deg ON edges.src = deg.node
      JOIN r1 ON edges.src = r1.node
      GROUP BY dst
    )
    SELECT node, CAST(r AS BIGINT) AS rank_fp,
           CAST(r AS DOUBLE) / 1000000 AS rank
    FROM r2
    ORDER BY rank_fp DESC, node
    LIMIT 20
    """,
)
def graph_pagerank(spark, sf_dir):
    """Top-20 nodes by 2-iteration fixed-point PageRank (damping 0.85)
    on the customer-supplier graph. Undirected doubling means no
    dangling nodes; supplier hubs are high in-degree but the per-dst
    sum is map-side combinable, so skew costs a hot combiner, not a
    hot reducer."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "c"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "s"
            ),
        )
        .distinct()
    )
    edges = e0.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        e0.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    edges = edges.localCheckpoint()  # reused by both iterations
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))

    def iterate(rank_df):
        # rank_df: (node, r) longs
        contrib = (
            edges.join(deg, "src")
            .join(rank_df, edges.src == rank_df.node)
            .select(
                "dst",
                F.expr("(85 * (r div d)) div 100").alias("contrib"),
            )
        )
        return contrib.groupBy("dst").agg(
            (F.lit(150000) + F.sum("contrib")).alias("r")
        ).select(F.col("dst").alias("node"), "r")

    r0 = deg.select("src").select(
        F.col("src").alias("node"), F.lit(1000000).cast("long").alias("r")
    )
    r2 = iterate(iterate(r0))
    return (
        r2.select(
            "node",
            F.col("r").alias("rank_fp"),
            (F.col("r").cast("double") / 1000000).alias("rank"),
        )
        .orderBy(F.desc("rank_fp"), "node")
        .limit(20)
    )


_PROFILE_NUM = [
    "l_orderkey", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
]
_PROFILE_STR = ["l_returnflag", "l_linestatus"]


@query(
    "diag_table_profile",
    # Data profiling: per-column row/null/distinct counts + extremes
    # over lineitem. One INDEPENDENT aggregate per column (9 pruned
    # parquet scans, each reading exactly one column) instead of one
    # multi-count-distinct aggregate — Spark plans N distincts in a
    # single agg as an N-way Expand that replicates every input row
    # N times, which is the wrong shape at scale; per-column scans
    # are columnar-cheap and each distinct shuffles only its own
    # column. Numeric extremes stay DOUBLE (stored values, no
    # cross-engine string formatting); string extremes stay VARCHAR.
    oracle="""
    {unions}
    """.format(
        unions="\n    UNION ALL\n    ".join(
            [
                f"""SELECT '{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS DOUBLE) AS min_num,
               CAST(max({c}) AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str,
               CAST(NULL AS VARCHAR) AS max_str
        FROM lineitem"""
                for c in _PROFILE_NUM
            ]
            + [
                f"""SELECT '{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(NULL AS DOUBLE) AS min_num,
               CAST(NULL AS DOUBLE) AS max_num,
               min({c}) AS min_str,
               max({c}) AS max_str
        FROM lineitem"""
                for c in _PROFILE_STR
            ]
        )
    ),
)
def diag_table_profile(spark, sf_dir):
    """Column profile of lineitem: rows, nulls, exact distinct count,
    min/max per column — the discovery query every pipeline runs
    first. Bounded 9-row output."""
    li = t(spark, sf_dir, "lineitem")

    def prof(c, numeric):
        base = li.select(c)
        return base.agg(
            F.lit(c).alias("col_name"),
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias("n_null"),
            F.count_distinct(F.col(c)).alias("n_distinct"),
            (
                F.min(c).cast("double")
                if numeric
                else F.lit(None).cast("double")
            ).alias("min_num"),
            (
                F.max(c).cast("double")
                if numeric
                else F.lit(None).cast("double")
            ).alias("max_num"),
            (F.min(c) if not numeric else F.lit(None).cast("string")).alias(
                "min_str"
            ),
            (F.max(c) if not numeric else F.lit(None).cast("string")).alias(
                "max_str"
            ),
        )

    parts = [prof(c, True) for c in _PROFILE_NUM] + [
        prof(c, False) for c in _PROFILE_STR
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "ts_seasonality_strength",
    # Hour-of-day seasonality per event type, entirely in FIXED-POINT
    # integers: hour-bucket means are truncated micro-unit integers
    # (m_h = s_h div n_h), the between-bucket sum of squares rides
    # DECIMAL(38,0), and total variance is the exact integer moment
    # N*sum(x^2) - S^2 — so the strength ratio is a single identical
    # double division, order-independent at any scale (a float
    # version's 24-term between-variance sum flips ulps under
    # nondeterministic aggregation order). nullif guards the
    # zero-variance degenerate case identically on both engines.
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS hod,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
      FROM events
    ), hodagg AS (
      SELECT event_type, hod,
             count(*) AS n_h,
             sum(CAST(v AS DECIMAL(38,0))) AS s_h
      FROM x GROUP BY 1, 2
    ), tot AS (
      SELECT event_type,
             sum(n_h) AS n,
             sum(s_h) AS s,
             (SELECT sum(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)))
              FROM x xi WHERE xi.event_type = hodagg.event_type) AS sxx
      FROM hodagg GROUP BY event_type
    ), m AS (
      SELECT h.event_type, h.hod, h.n_h, t.n,
             s_h // n_h AS m_h,
             t.s // t.n AS m_all,
             t.sxx, t.s
      FROM hodagg h JOIN tot t USING (event_type)
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_events,
           CAST(max(n) * sum(CAST(n_h AS DECIMAL(38,0))
                             * (m_h - m_all) * (m_h - m_all)) AS DOUBLE)
             / CAST(nullif(max(n) * max(sxx) - max(s) * max(s), 0) AS DOUBLE)
             AS seasonal_strength,
           CAST(min(CASE WHEN m_h = max_mh THEN hod END) AS BIGINT)
             AS peak_hod
    FROM (SELECT *, max(m_h) OVER (PARTITION BY event_type) AS max_mh FROM m)
    GROUP BY event_type
    """,
)
def ts_seasonality_strength(spark, sf_dir):
    """Fraction of per-type value variance explained by hour-of-day
    (between-bucket over total), plus the peak hour (earliest on exact
    ties). Windows and the 24-row between-sum run over the (type, hod)
    aggregate only."""
    ev = t(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    x = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    hodagg = x.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n_h"), F.sum(F.col("v").cast(dec)).alias("s_h")
    )
    tot = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast(dec)).alias("s"),
        F.sum(F.col("v").cast(dec) * F.col("v").cast(dec)).alias("sxx"),
    )
    m = hodagg.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "hod",
        "n_h",
        "n",
        F.expr("s_h div n_h").cast(dec).alias("m_h"),
        F.expr("s div n").cast(dec).alias("m_all"),
        "sxx",
        "s",
    )
    m = m.withColumn(
        "max_mh", F.max("m_h").over(W.partitionBy("event_type"))
    )
    return m.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_events"),
        (
            (
                F.max("n")
                * F.sum(
                    F.col("n_h").cast(dec)
                    * (F.col("m_h") - F.col("m_all"))
                    * (F.col("m_h") - F.col("m_all"))
                )
            ).cast("double")
            / F.nullif(
                F.max("n") * F.max("sxx") - F.max("s") * F.max("s"), F.lit(0)
            ).cast("double")
        ).alias("seasonal_strength"),
        F.min(
            F.when(F.col("m_h") == F.col("max_mh"), F.col("hod"))
        )
        .cast("long")
        .alias("peak_hod"),
    )


@query(
    "events_attribution",
    # Last-touch attribution: every purchase joined to the user's most
    # recent preceding click — expressed as ONE conditional running
    # max over the (ts, event_id)-ordered per-user stream (no
    # self-join, no as-of shuffle beyond the single user_id window).
    # Microsecond epochs keep sub-second ordering exact; the gap and
    # the 1h flag are pure integer arithmetic.
    oracle="""
    WITH o AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
             max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id
                     ROWS UNBOUNDED PRECEDING) AS click_us
      FROM events
    )
    SELECT event_id, user_id,
           us AS purchase_us,
           click_us,
           us - click_us AS gap_us,
           (us - click_us) <= 3600000000 AS within_1h
    FROM o WHERE event_type = 'purchase'
    """,
)
def events_attribution(spark, sf_dir):
    """Purchase→click last-touch attribution with microsecond-exact
    gaps. Purchases with no prior click keep NULL attribution (and a
    NULL flag) identically on both engines."""
    ev = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        W.partitionBy("user_id")
        .orderBy(us, "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    o = ev.select(
        "event_id",
        "user_id",
        "event_type",
        us.alias("us"),
        F.max(F.when(F.col("event_type") == "click", us)).over(w).alias(
            "click_us"
        ),
    )
    return o.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("us").alias("purchase_us"),
        "click_us",
        (F.col("us") - F.col("click_us")).alias("gap_us"),
        ((F.col("us") - F.col("click_us")) <= 3600000000).alias("within_1h"),
    )


_SH_BITS = 16

_SH_W_SQL = ",\n             ".join(
    f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS w{j}"
    for j in range(_SH_BITS)
)
_SH_FP_SQL = " + ".join(
    f"(CASE WHEN w{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SH_BITS)
)


@query(
    "doc_simhash_portable",
    # SimHash with a fully oracle-replayed construction (the portable
    # twin of llm.dedup's 64-bit xxhash64 production SimHash, the same
    # relationship sketch_minhash_portable has to the MinHash tier):
    # per-token portable_u64, 16 bit-weight sums in ONE groupBy (no
    # per-bit explode), sign-threshold fingerprint. Every step is
    # integer-exact, so fingerprints — and therefore any downstream
    # banding/recall behavior — hash-match across engines.
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(t || ':sh'), 1, 15) AS BIGINT) AS h
      FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t
            FROM documents)
    ), w AS (
      SELECT doc_id, count(*) AS n_tokens,
             {_SH_W_SQL}
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST({_SH_FP_SQL} AS BIGINT) AS fp16
    FROM w
    """,
)
def doc_simhash_portable(spark, sf_dir):
    """Per-document 16-bit portable SimHash fingerprint (multiset
    token weighting, zero-weight bits resolve to 0). One explode + one
    aggregate; the 16 weight sums are map-side-combinable longs."""
    from ..sketches import portable_u64

    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(r"regexp_extract_all(text, '\\S+', 0)")
        ).alias("tok"),
    ).select("doc_id", portable_u64(F.col("tok"), salt="sh").alias("h"))
    aggs = [F.count(F.lit(1)).alias("n_tokens")] + [
        F.sum(
            F.when(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"w{j}")
        for j in range(_SH_BITS)
    ]
    w = toks.groupBy("doc_id").agg(*aggs)
    fp = None
    for j in range(_SH_BITS):
        term = F.when(F.col(f"w{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return w.select(
        "doc_id", "n_tokens", fp.cast("long").alias("fp16")
    )
