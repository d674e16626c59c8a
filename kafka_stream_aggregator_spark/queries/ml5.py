"""Fifth ML wave (round 7): weight-of-evidence encoding and Cramér's V.

- WoE is the credit-scoring categorical encoder: per value-decile bin,
  ln( (pos_i/POS) / (neg_i/NEG) ), with information value as the
  summary. Counts are exact integers off the counts-tier decile
  assignment (integer rank thresholds — never ntile over raw rows);
  each WoE is one ln chain; IV sums round-9 terms in DECIMAL.
- Cramér's V is the chi-square effect size over the (lang, source)
  contingency — exact integer counts, one closed-form chain.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "ml_woe_encoding",
    # Deciles of `value` via the counts tier (distinct-value cum
    # counts -> integer rank thresholds, the equidepth pattern);
    # target = event_type 'purchase'. Zero-cell bins drop (standard
    # practice, documented). Emits per-bin WoE and the total IV.
    oracle="""
    WITH v AS (
      SELECT round(value, 6) AS x,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events WHERE value IS NOT NULL
    ), qc AS (
      SELECT x, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(count(*)) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - count(*) AS BIGINT) AS below,
             CAST(sum(count(*)) OVER () AS BIGINT) AS n
      FROM v GROUP BY x
    ), binned AS (
      -- decile of a row = floor(10 * below / n) of its VALUE's bucket
      -- (ties share a bin: deterministic, rank thresholds integer)
      SELECT x, CAST((10 * below) // n AS BIGINT) AS bin FROM qc
    ), j AS (
      SELECT binned.bin, v.y FROM v JOIN binned ON v.x = binned.x
    ), cells AS (
      SELECT bin,
             CAST(count_if(y = 1) AS BIGINT) AS pos,
             CAST(count_if(y = 0) AS BIGINT) AS neg
      FROM j GROUP BY bin
    ), tot AS (
      SELECT CAST(sum(pos) AS BIGINT) AS tpos,
             CAST(sum(neg) AS BIGINT) AS tneg
      FROM cells
    )
    , kept AS (
      SELECT bin, pos, neg,
             round(ln((CAST(pos AS DOUBLE) / tpos)
                      / (CAST(neg AS DOUBLE) / tneg)), 6) AS woe,
             CAST(pos AS DOUBLE) / tpos - CAST(neg AS DOUBLE) / tneg
               AS diff
      FROM cells, tot
      WHERE pos > 0 AND neg > 0
    )
    SELECT bin, pos, neg, woe,
           round(CAST(sum(CAST(round(diff * woe, 9) AS DECIMAL(20,9)))
                      OVER () AS DOUBLE), 6) AS iv
    FROM kept
    """,
)
def ml_woe_encoding(spark, sf_dir):
    """WoE: counts-tier decile assignment (O(distinct values) state,
    integer thresholds), one (bin, target) cell aggregate, ln chains
    on exact integer ratios."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = ev.select(
        F.round("value", 6).alias("x"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    cum = W.orderBy("x").rowsBetween(W.unboundedPreceding, W.currentRow)
    qc = (
        v.groupBy("x")
        .agg(F.count("*").alias("c"))
        .select(
            "x",
            (F.sum("c").over(cum) - F.col("c")).cast("bigint").alias("below"),
            F.sum("c").over(W.partitionBy()).cast("bigint").alias("n"),
        )
    )
    binned = qc.select(
        "x",
        F.floor(10 * F.col("below") / F.col("n")).cast("bigint").alias("bin"),
    )
    j = v.join(binned, "x")
    cells = j.groupBy("bin").agg(
        F.count_if(F.col("y") == 1).cast("bigint").alias("pos"),
        F.count_if(F.col("y") == 0).cast("bigint").alias("neg"),
    )
    tot = cells.agg(
        F.sum("pos").cast("bigint").alias("tpos"),
        F.sum("neg").cast("bigint").alias("tneg"),
    )
    kept = (
        cells.crossJoin(F.broadcast(tot))
        .filter((F.col("pos") > 0) & (F.col("neg") > 0))
        .select(
            "bin",
            "pos",
            "neg",
            F.round(
                F.log(
                    (F.col("pos").cast("double") / F.col("tpos"))
                    / (F.col("neg").cast("double") / F.col("tneg"))
                ),
                6,
            ).alias("woe"),
            (
                F.col("pos").cast("double") / F.col("tpos")
                - F.col("neg").cast("double") / F.col("tneg")
            ).alias("diff"),
        )
    )
    # IV = sum over kept bins of (dist_pos - dist_neg) * WoE; terms use
    # the ROUNDED woe (round-6 ln is the cross-libm-safe value) and the
    # exact double diff chain, round-9 + DECIMAL sum (house pattern;
    # magnitudes < 1 so the anova magnitude rule is satisfied)
    iv = F.round(
        F.sum(
            F.round(F.col("diff") * F.col("woe"), 9).cast("decimal(20,9)")
        )
        .over(W.partitionBy())
        .cast("double"),
        6,
    )
    return kept.select("bin", "pos", "neg", "woe", iv.alias("iv"))


@query(
    "stat_cramers_v",
    # Cramér's V over the (lang, source) contingency: chi2 from exact
    # integer observed/expected cell algebra (expected = row*col/n as
    # one double chain per cell, round-9 + DECIMAL sum — the
    # chi-square pattern), V = sqrt(chi2 / (n * min(r-1, c-1))).
    oracle="""
    WITH c AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY lang, source
    ), rm AS (
      SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM c GROUP BY lang
    ), cm AS (
      SELECT source, CAST(sum(o) AS BIGINT) AS m FROM c GROUP BY source
    ), n AS (
      SELECT CAST(sum(o) AS BIGINT) AS n,
             CAST(count(DISTINCT lang) AS BIGINT) AS nr,
             CAST(count(DISTINCT source) AS BIGINT) AS nc
      FROM c
    ), cells AS (
      SELECT rm.lang, cm.source,
             coalesce(c.o, 0) AS o,
             CAST(rm.r AS DOUBLE) * cm.m / n.n AS e
      FROM rm CROSS JOIN cm
      LEFT JOIN c ON c.lang = rm.lang AND c.source = cm.source
      CROSS JOIN n
    ), chi AS (
      SELECT CAST(sum(CAST(round((o - e) * (o - e) / e, 9)
                           AS DECIMAL(30,9))) AS DOUBLE) AS chi2
      FROM cells
    )
    SELECT n, nr, nc, round(chi2, 6) AS chi2,
           round(sqrt(chi2 / (n * least(nr - 1, nc - 1))), 6) AS cramers_v
    FROM chi, n
    WHERE nr > 1 AND nc > 1
    """,
)
def stat_cramers_v(spark, sf_dir):
    """Cramér's V: one contingency aggregate, bounded margins
    broadcast, chi-square-pattern exact accumulation."""
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count("*").cast("bigint").alias("o"))
    rm = c.groupBy("lang").agg(F.sum("o").cast("bigint").alias("r"))
    cm = c.groupBy("source").agg(F.sum("o").cast("bigint").alias("m"))
    n = c.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("lang").cast("bigint").alias("nr"),
        F.countDistinct("source").cast("bigint").alias("nc"),
    )
    cells = (
        rm.crossJoin(cm)
        .join(c, ["lang", "source"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            F.coalesce("o", F.lit(0)).alias("o"),
            (F.col("r").cast("double") * F.col("m") / F.col("n")).alias("e"),
        )
    )
    chi = cells.agg(
        F.sum(
            F.round(
                (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"),
                9,
            ).cast("decimal(30,9)")
        )
        .cast("double")
        .alias("chi2")
    )
    return (
        chi.crossJoin(F.broadcast(n))
        .filter((F.col("nr") > 1) & (F.col("nc") > 1))
        .select(
            "n",
            "nr",
            "nc",
            F.round("chi2", 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
    )
