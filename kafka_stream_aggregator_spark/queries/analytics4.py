"""Fourth analytics wave (round 6 continuation): evaluation and
survival shapes — Kaplan-Meier reorder survival, chi-square
independence, forecast backtesting metrics, graph degree
distributions, Flesch readability, and inverted-index construction.

Portability discipline (the analytics2/3 rules): every data-sized
computation is integer; libm calls (ln/exp/sqrt) appear only in final
rounded expressions or behind order-independent DECIMAL sums of
rounded bit-identical terms; cumulative chains run as ordered window
sums over BOUNDED aggregate relations (deterministic accumulation
order in both engines, and the shape tools/window_audit.py allows);
every top-k orders on exact-integer keys with total tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "surv_km_reorder",
    # Kaplan-Meier survival over customer reorder intervals: the gap
    # (days) between consecutive orders of one customer is a complete
    # (uncensored) duration observation. For each distinct duration t:
    # n_risk = gaps >= t, d = gaps == t, S(t) = prod_{t'<=t}
    # (1 - d/n). The product is exp of an ORDERED cumulative window
    # sum of per-t ln terms — each term a double computed from exact
    # integers, accumulated in ascending-t order by both engines, so
    # only libm 1-ulp noise (<< the 1e-6 rounding grain) can differ.
    # ln(0) at the final duration (n_risk == d there and only there)
    # is sidestepped with an exact-integer CASE.
    oracle="""
    WITH ordered AS (
      SELECT o_custkey,
             CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
             lag(CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT),
                        o_orderkey) AS prev_day
      FROM orders
    ), gaps AS (
      SELECT day - prev_day AS t FROM ordered WHERE prev_day IS NOT NULL
    ), byt AS (
      SELECT t, CAST(count(*) AS BIGINT) AS d FROM gaps GROUP BY t
    ), risk AS (
      SELECT t, d,
             CAST(sum(d) OVER () AS BIGINT)
               - CAST(sum(d) OVER (ORDER BY t) AS BIGINT) + d AS n_risk
      FROM byt
    )
    SELECT t AS t_days, n_risk, d AS d_events,
           round(CASE WHEN n_risk = d THEN 0.0 ELSE exp(sum(
             CASE WHEN n_risk > d
                  THEN ln((n_risk - d) / CAST(n_risk AS DOUBLE))
                  ELSE 0.0 END) OVER (ORDER BY t)) END, 6) AS survival
    FROM risk ORDER BY t_days
    """,
)
def surv_km_reorder(spark, sf_dir):
    """Kaplan-Meier survival curve of customer reorder intervals —
    the time-to-repeat-purchase / churn primitive ("what fraction of
    customers have NOT reordered within t days"). Plan: one
    partitioned lag on orders (the sessionize shape) produces gap
    durations; everything after runs on the (duration, count)
    aggregate, bounded by the calendar span at ANY fact scale. The
    at-risk count n_risk = total - cum(d) + d and the survival
    product both come from ordered cumulative windows over that
    bounded relation — unpartitioned Window over an Aggregate, the
    shape tools/window_audit.py explicitly allows."""
    o = t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.floor(F.col("o_orderdate").cast("double") / 86400)
        .cast("bigint")
        .alias("day"),
    )
    wlag = W.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        o.select((F.col("day") - F.lag("day").over(wlag)).alias("t"))
        .filter(F.col("t").isNotNull())
    )
    byt = gaps.groupBy("t").agg(F.count(F.lit(1)).alias("d"))
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    wcum = W.orderBy("t")
    risk = byt.select(
        "t",
        "d",
        (
            F.sum("d").over(wall) - F.sum("d").over(wcum) + F.col("d")
        ).alias("n_risk"),
    )
    term = F.when(
        F.col("n_risk") > F.col("d"),
        F.log(
            (F.col("n_risk") - F.col("d")) / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    survival = F.when(F.col("n_risk") == F.col("d"), F.lit(0.0)).otherwise(
        F.exp(F.sum(term).over(wcum))
    )
    return risk.select(
        F.col("t").alias("t_days"),
        "n_risk",
        F.col("d").alias("d_events"),
        F.round(survival, 6).alias("survival"),
    ).orderBy("t_days")


@query(
    "diag_chi_square",
    # Pearson chi-square test of independence between event_type and
    # day-of-week (portable dow = epoch-day mod 7 — engine-native
    # dayofweek bases differ). Observed/margin counts are exact
    # integers; each cell contribution (o-e)^2/e with e = r*c/n is a
    # bit-identical IEEE chain on those integers (+,-,*,/ only); the
    # total is an ORDER-INDEPENDENT exact DECIMAL(38,9) sum of the
    # per-cell contributions rounded to 9 dp (1e-9 grain << the 1e-6
    # output grain; a tie at the half-1e-9 boundary would need the
    # chain to land on a terminating decimal — measure-zero for these
    # rational-but-nonterminating values).
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ), marg AS (
      SELECT event_type, dow, o,
             CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
             CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS c,
             CAST(sum(o) OVER () AS BIGINT) AS n
      FROM obs
    )
    SELECT round(CAST(sum(CAST(round(
             (o - r * c / CAST(n AS DOUBLE))
             * (o - r * c / CAST(n AS DOUBLE))
             / (r * c / CAST(n AS DOUBLE)), 9) AS DECIMAL(38,9)))
           AS DOUBLE), 6) AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
           CAST(max(n) AS BIGINT) AS n_total
    FROM marg
    """,
)
def diag_chi_square(spark, sf_dir):
    """Chi-square independence test: is event mix independent of
    day-of-week — the categorical drift / experiment-balance check.
    Plan: one groupBy on the fact to the |types|x7 cell relation
    (map-side combine); margins via window sums over that BOUNDED
    aggregate (partitioned and unpartitioned-over-Aggregate, both
    audit-clean); the statistic is a 1-row decimal aggregate. n_total
    is recovered as sum(o)/|dow| because each cell row carries the
    full-table n in its margin product."""
    ev = t(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        (F.floor(F.col("ts").cast("double") / 86400).cast("bigint") % 7)
        .alias("dow"),
    ).agg(F.count(F.lit(1)).alias("o"))
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    marg = obs.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("r"),
        F.sum("o").over(W.partitionBy("dow")).alias("c"),
        F.sum("o").over(wall).alias("n"),
    )
    e = F.col("r") * F.col("c") / F.col("n").cast("double")
    contrib = (F.col("o") - e) * (F.col("o") - e) / e
    return marg.agg(
        F.round(
            F.sum(F.round(contrib, 9).cast("decimal(38,9)")).cast("double"),
            6,
        ).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1)
            * (F.countDistinct("dow") - 1)
        )
        .cast("bigint")
        .alias("dof"),
        F.max("n").cast("bigint").alias("n_total"),
    )


@query(
    "ts_forecast_eval",
    # Backtest of the two standard baseline forecasters on the daily
    # event-count series per type: naive (previous observation) and
    # seasonal-naive (observation 7 rows back). Errors are INTEGER
    # (count - lagged count), so the MAE/RMSE/WAPE moments are exact
    # integer sums and each metric is one final double chain.
    # Magnitude bound: sum(e^2) fits int64 up to ~3e9 events/day-cell.
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, c,
             lag(c, 1) OVER w AS f_naive,
             lag(c, 7) OVER w AS f_seasonal
      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), m AS (
      SELECT event_type, 'naive' AS method,
             CAST(count(*) AS BIGINT) AS n_eval,
             CAST(sum(abs(c - f_naive)) AS BIGINT) AS sae,
             CAST(sum((c - f_naive) * (c - f_naive)) AS BIGINT) AS sse,
             CAST(sum(c) AS BIGINT) AS sc
      FROM lagged WHERE f_naive IS NOT NULL GROUP BY 1
      UNION ALL
      SELECT event_type, 'seasonal_naive' AS method,
             CAST(count(*) AS BIGINT) AS n_eval,
             CAST(sum(abs(c - f_seasonal)) AS BIGINT) AS sae,
             CAST(sum((c - f_seasonal) * (c - f_seasonal)) AS BIGINT)
               AS sse,
             CAST(sum(c) AS BIGINT) AS sc
      FROM lagged WHERE f_seasonal IS NOT NULL GROUP BY 1
    )
    SELECT event_type, method, n_eval,
           round(sae / CAST(n_eval AS DOUBLE), 6) AS mae,
           round(sqrt(sse / CAST(n_eval AS DOUBLE)), 6) AS rmse,
           round(sae / CAST(sc AS DOUBLE), 6) AS wape
    FROM m ORDER BY event_type, method
    """,
)
def ts_forecast_eval(spark, sf_dir):
    """MAE / RMSE / WAPE of naive and seasonal-naive forecasts on the
    per-type daily series — the forecast-backtesting primitive (any
    real model must beat these baselines). Plan: the only data-sized
    stage is the day-grain groupBy; both lags come from ONE window
    spec over the bounded daily relation; the metric aggregates are
    integer moments per (type, method). Forecast = k rows back (the
    previous OBSERVED day), the standard formulation on a gapless
    daily grid and well-defined on a gappy one."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("double") / 86400)
        .cast("bigint")
        .alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("f_naive"),
        F.lag("c", 7).over(w).alias("f_seasonal"),
    )

    def metrics(fcol: str, method: str):
        e = F.col("c") - F.col(fcol)
        return (
            lagged.filter(F.col(fcol).isNotNull())
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_eval"),
                F.sum(F.abs(e)).alias("sae"),
                F.sum(e * e).alias("sse"),
                F.sum("c").alias("sc"),
            )
            .select("event_type", F.lit(method).alias("method"),
                    "n_eval", "sae", "sse", "sc")
        )

    m = metrics("f_naive", "naive").unionByName(
        metrics("f_seasonal", "seasonal_naive")
    )
    return m.select(
        "event_type",
        "method",
        "n_eval",
        F.round(F.col("sae") / F.col("n_eval").cast("double"), 6).alias(
            "mae"
        ),
        F.round(
            F.sqrt(F.col("sse") / F.col("n_eval").cast("double")), 6
        ).alias("rmse"),
        F.round(F.col("sae") / F.col("sc").cast("double"), 6).alias("wape"),
    ).orderBy("event_type", "method")


@query(
    "graph_degree_distribution",
    # Degree distribution of the customer-supplier bipartite graph
    # (the graph_khop_reach edge set): per side, how many nodes have
    # each distinct-neighbor degree. Pure integer counting end-to-end.
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), deg AS (
      SELECT 'customer' AS side, c AS node, count(*) AS degree
      FROM e0 GROUP BY c
      UNION ALL
      SELECT 'supplier' AS side, s AS node, count(*) AS degree
      FROM e0 GROUP BY s
    )
    SELECT side, CAST(degree AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY side, degree ORDER BY side, degree
    """,
)
def graph_degree_distribution(spark, sf_dir):
    """Degree histogram per side of the customer-supplier graph —
    the first diagnostic run on any large graph (skew detection: a
    power-law tail here predicts hot keys in every downstream
    traversal). Plan: one distinct on the joined edge projection,
    one groupBy per side for node degrees, one bounded groupBy for
    the histogram — pure integers, exactly portable."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = (
        e0.groupBy("c")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(
            F.lit("customer").alias("side"),
            F.col("c").alias("node"),
            "degree",
        )
        .unionByName(
            e0.groupBy("s")
            .agg(F.count(F.lit(1)).alias("degree"))
            .select(
                F.lit("supplier").alias("side"),
                F.col("s").alias("node"),
                "degree",
            )
        )
    )
    return (
        deg.groupBy("side", F.col("degree").cast("bigint").alias("degree"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy("side", "degree")
    )


@query(
    "doc_readability",
    # Flesch reading ease per document from three regexp counts —
    # sentences ([.!?]+ runs, floored at 1: a punctuation-free doc is
    # one sentence), words (\S+ runs), syllables ([aeiouy]+ vowel
    # groups, the standard heuristic). The score is a bit-identical
    # IEEE chain (+,-,*,/ on exact integers and decimal literals),
    # emitted UNROUNDED per the analytics2 rule.
    oracle="""
    WITH c AS (
      SELECT doc_id,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS BIGINT) AS n_sentences,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
               AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_sentences, n_words, n_syllables,
           206.835 - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                   - 84.6 * (n_syllables / CAST(n_words AS DOUBLE))
             AS flesch
    FROM c WHERE n_words > 0
    ORDER BY doc_id
    """,
)
def doc_readability(spark, sf_dir):
    """Flesch reading ease per document — the classic text-quality /
    audience-level signal for corpus filtering (very low scores flag
    boilerplate and code; very high, fragment spam). Plan: map-only —
    three regexp counts and one arithmetic chain per row, no shuffle
    except the output sort; predicate-pushdown friendly (doc_id,
    text scan only)."""
    d = t(spark, sf_dir, "documents")
    c = d.select(
        "doc_id",
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), 0)),
            F.lit(1),
        )
        .cast("bigint")
        .alias("n_sentences"),
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0))
        .cast("bigint")
        .alias("n_words"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
        )
        .cast("bigint")
        .alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words") / F.col("n_sentences").cast("double"))
        - F.lit(84.6)
        * (F.col("n_syllables") / F.col("n_words").cast("double"))
    )
    return (
        c.filter(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_sentences",
            "n_words",
            "n_syllables",
            flesch.alias("flesch"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_inverted_index",
    # Inverted-index construction for the top-50 document-frequency
    # terms: per term, df and the first-20 posting list (ascending
    # doc_id, comma-joined — string form keeps the cross-engine hash
    # stable). The posting cap is applied BEFORE any collection (a
    # per-term rank filter), so no executor ever materializes an
    # unbounded list — at 100 TB a stopword's full posting list is
    # billions of ids; the capped relation is 50x20 rows.
    oracle="""
    WITH tk AS (
      SELECT DISTINCT doc_id,
             unnest(regexp_extract_all(lower(trim(text)), '\\S+')) AS term
      FROM documents
    ), df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tk GROUP BY term
    ), top AS (
      SELECT term, df FROM df ORDER BY df DESC, term LIMIT 50
    ), ranked AS (
      SELECT tk.term, tk.doc_id,
             row_number() OVER (PARTITION BY tk.term
                                ORDER BY tk.doc_id) AS rn
      FROM tk JOIN top ON tk.term = top.term
    )
    SELECT top.term, top.df,
           string_agg(CAST(ranked.doc_id AS VARCHAR), ','
                      ORDER BY ranked.doc_id) AS postings
    FROM top JOIN ranked ON top.term = ranked.term AND ranked.rn <= 20
    GROUP BY top.term, top.df
    ORDER BY top.df DESC, top.term
    """,
)
def doc_inverted_index(spark, sf_dir):
    """Posting lists for the 50 highest-df terms — the retrieval
    index-build primitive (BM25/boolean search both consume this
    layout). Plan: one tokenize-explode + distinct for (doc, term);
    df groupBy; top-50 via TakeOrderedAndProject then BROADCAST into
    a semi-filter so the rank window only ever sees 50 terms' rows;
    per-term row_number caps postings at 20 BEFORE collect_list, so
    list state is bounded regardless of term popularity. Ranking and
    tie-breaks are exact (df desc, term; postings by doc_id)."""
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
            )
        ).alias("term"),
    ).distinct()
    df = tk.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    top = df.orderBy(F.desc("df"), "term").limit(50)
    wr = W.partitionBy("term").orderBy("doc_id")
    ranked = (
        tk.join(F.broadcast(top.select("term")), "term")
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= 20)
    )
    # sort numerically THEN render: sort_array on string ids would
    # misorder ("10" < "9"), while DuckDB's ORDER BY doc_id is numeric.
    postings = ranked.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings")
    )
    return (
        top.join(postings, "term")
        .select("term", "df", "postings")
        .orderBy(F.desc("df"), "term")
    )
