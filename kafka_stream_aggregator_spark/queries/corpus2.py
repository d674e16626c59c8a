"""Corpus-selection wave 2: temperature-scaled multilingual sampling,
CCNet perplexity-tercile bucketing, and decile gains/lift charts.

Determinism strategy:
- temperature weights are a bounded |langs|-row relation; the one pow()
  per row and the |langs|-term normalizing sum sit ~10 orders below the
  round-6 grain;
- the CCNet split buckets on the ROUND-6 per-doc score, so both
  engines see the identical score multiset, hence identical
  interpolated tercile edges and identical bucket membership;
- lift/gain deciles are assigned from exact INTEGER cumulative counts
  (cell start index * 10 / N), so decile boundaries cannot flip.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..ops import distributed_global_rank, exact_percentiles_bucketed
from .base import query, t

_TEMP = 0.7

# --------------------------------------------------------------------------
# Temperature-scaled language sampling
# --------------------------------------------------------------------------


@query(
    "corpus_lang_temperature",
    # Multilingual sampling weights with temperature T=0.7 (mC4 /
    # XLM-R recipe): q_l ∝ p_l^T where p_l is the language's token
    # share. rate = q_l / p_l is the up/down-sampling factor the data
    # loader applies — the standard fix for high-resource languages
    # drowning the mix.
    oracle=f"""
    WITH d AS (
        SELECT lang,
               len(regexp_extract_all(lower(trim(text)), '\\S+')) AS nt
        FROM documents
    ),
    g AS (
        SELECT lang, count(*) AS n_docs, sum(nt) AS n_tokens
        FROM d GROUP BY lang
    ),
    tot AS (SELECT sum(n_tokens) AS tt FROM g),
    w AS (
        SELECT lang, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / tt AS p,
               pow(CAST(n_tokens AS DOUBLE) / tt, {_TEMP}) AS wgt
        FROM g CROSS JOIN tot
    ),
    z AS (SELECT sum(wgt) AS zz FROM w)
    SELECT lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           round(p, 6) AS token_share,
           round(wgt / zz, 6) AS sample_share,
           round(wgt / zz / p, 6) AS sampling_rate
    FROM w CROSS JOIN z
    """,
)
def corpus_lang_temperature(spark, sf_dir):
    """Temperature sampling table per language. One token-count scan
    (map-side combine into |langs| rows); everything after is algebra
    on that bounded relation with broadcast 1-row totals. The rate
    column > 1 marks languages the loader up-samples."""
    d = t(spark, sf_dir, "documents").select(
        "lang",
        F.size(
            F.regexp_extract_all(
                F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
            )
        ).cast("long").alias("nt"),
    )
    g = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
    )
    tot = g.agg(F.sum("n_tokens").alias("tt"))
    w = g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("tt")).alias("p"),
        F.pow(
            F.col("n_tokens").cast("double") / F.col("tt"), _TEMP
        ).alias("wgt"),
    )
    z = w.agg(F.sum("wgt").alias("zz"))
    return w.crossJoin(F.broadcast(z)).select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round("p", 6).alias("token_share"),
        F.round(F.col("wgt") / F.col("zz"), 6).alias("sample_share"),
        F.round(F.col("wgt") / F.col("zz") / F.col("p"), 6).alias(
            "sampling_rate"
        ),
    )


# --------------------------------------------------------------------------
# CCNet perplexity-tercile bucketing
# --------------------------------------------------------------------------


@query(
    "doc_perplexity_buckets",
    # CCNet's head/middle/tail split (Wenzek et al. 2020): rank docs
    # by LM quality (here the corpus-unigram mean log-prob, the same
    # signal class as CCNet's KenLM perplexity) and cut at the exact
    # terciles. Buckets compare the ROUND-6 score against edges
    # interpolated FROM those same rounded scores, so membership is
    # engine-invariant.
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                   AS word
        FROM documents
    ),
    vocab AS (SELECT word, count(*) AS c FROM w GROUP BY word),
    tot AS (SELECT sum(c) AS n FROM vocab),
    lp AS (
        SELECT w.doc_id,
               count(*) AS nt,
               round(avg(ln(CAST(c AS DOUBLE)) - ln(CAST(n AS DOUBLE))),
                     6) AS s
        FROM w JOIN vocab USING (word) CROSS JOIN tot
        GROUP BY w.doc_id
    ),
    e AS (
        SELECT quantile_cont(s, 1.0/3.0) AS t1,
               quantile_cont(s, 2.0/3.0) AS t2
        FROM lp
    )
    SELECT CASE WHEN s <= t1 THEN 'tail'
                WHEN s <= t2 THEN 'middle'
                ELSE 'head' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           round(avg(s), 6) AS mean_score
    FROM lp CROSS JOIN e
    GROUP BY bucket
    """,
)
def doc_perplexity_buckets(spark, sf_dir):
    """CCNet-style corpus split by LM quality terciles. The per-doc
    score reuses llm.pipeline.unigram_logprob (broadcast vocabulary,
    one explode); tercile edges come from the bucketed exact-percentile
    tier (three parallel passes, no per-group sort) as a broadcast
    1-row relation; bucketing is a map-only CASE. head = most fluent
    (highest log-prob), the slice CCNet keeps for LM training."""
    from ..llm.pipeline import unigram_logprob

    lp = unigram_logprob(
        t(spark, sf_dir, "documents"), "doc_id", "text"
    ).select(
        "doc_id",
        F.col("n_tokens").alias("nt"),
        F.col("mean_logprob").alias("s"),
    )
    edges = exact_percentiles_bucketed(
        lp, "s", [(1.0 / 3.0, "t1"), (2.0 / 3.0, "t2")]
    )
    b = lp.crossJoin(F.broadcast(edges)).withColumn(
        "bucket",
        F.when(F.col("s") <= F.col("t1"), "tail")
        .when(F.col("s") <= F.col("t2"), "middle")
        .otherwise("head"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("n_tokens"),
        F.round(F.avg("s"), 6).alias("mean_score"),
    )


# --------------------------------------------------------------------------
# Decile gains / lift chart
# --------------------------------------------------------------------------


@query(
    "ml_lift_gain_chart",
    # Cumulative gains and lift by score decile — the campaign-targeting
    # evaluation standard. Score = `value` (desc), response =
    # event_type='purchase'. A distinct-score cell belongs to the
    # decile of its FIRST row in descending order:
    # floor(10 * start_index / N) on exact integers.
    oracle="""
    WITH cell AS (
      SELECT value AS v,
             CAST(count(*) FILTER (WHERE event_type = 'purchase')
                  AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS ct
      FROM events GROUP BY value
    ), ranked AS (
      SELECT c1, ct,
             CAST(sum(ct) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS BIGINT) AS ftot
      FROM cell
    ), tot AS (
      SELECT CAST(sum(c1) AS BIGINT) AS p_all,
             CAST(sum(ct) AS BIGINT) AS n_all
      FROM cell
    ), dec AS (
      SELECT CAST(((n_all - ftot) * 10) // n_all AS BIGINT) AS decile,
             sum(c1) AS n_pos, sum(ct) AS n_rows,
             any_value(p_all) AS p_all, any_value(n_all) AS n_all
      FROM ranked CROSS JOIN tot
      GROUP BY CAST(((n_all - ftot) * 10) // n_all AS BIGINT)
    )
    SELECT decile,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_pos AS BIGINT) AS n_pos,
           round(CAST(n_pos AS DOUBLE) * n_all
                 / (CAST(n_rows AS DOUBLE) * p_all), 6) AS lift,
           round(CAST(sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN
                       UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / p_all, 6) AS cum_gain
    FROM dec
    """,
)
def ml_lift_gain_chart(spark, sf_dir):
    """Gains/lift table without a global sort: distinct score cells +
    the distributed prefix sum give each cell's exact start index in
    descending-score order; decile assignment is integer arithmetic;
    the cumulative gain window runs over the bounded 10-row decile
    relation. Decile 0's lift is the 'how much better than random is
    our best 10%' number."""
    e = t(spark, sf_dir, "events")
    cell = e.groupBy(F.col("value").alias("v")).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("c1"),
        F.count(F.lit(1)).alias("ct"),
    )
    ranked = distributed_global_rank(
        cell, ["v"], prefix_sums={"ct": "ftot"}
    )
    tot = cell.agg(
        F.sum("c1").cast("bigint").alias("p_all"),
        F.sum("ct").cast("bigint").alias("n_all"),
    )
    dec = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(
            "decile",
            (
                (F.col("n_all") - F.col("ftot")) * 10 / F.col("n_all")
            ).cast("long"),
        )
        .groupBy("decile")
        .agg(
            F.sum("c1").cast("bigint").alias("n_pos"),
            F.sum("ct").cast("bigint").alias("n_rows"),
            F.first("p_all").alias("p_all"),
            F.first("n_all").alias("n_all"),
        )
    )
    wd = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return dec.select(
        "decile",
        "n_rows",
        "n_pos",
        F.round(
            F.col("n_pos").cast("double")
            * F.col("n_all")
            / (F.col("n_rows").cast("double") * F.col("p_all")),
            6,
        ).alias("lift"),
        F.round(
            F.sum("n_pos").over(wd).cast("double") / F.col("p_all"), 6
        ).alias("cum_gain"),
    )
