"""Fifth corpus wave (round 8): DoReMi-style domain-weight step,
token-overlap F1 pairs, and curriculum-phase assignment — three
training-data curation ops a large pipeline runs between curation and
sampling.

Determinism discipline: difficulty/loss proxies are exact integer
ratios (chars per token); exp/normalization only ever runs over the
bounded |sources| relation; pair scoring is an equi join on tokens,
never all-pairs text.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

_TOK = r"\S+"


@query(
    "corpus_doremi_step",
    # One DoReMi reweighting step over sources ("domains"): from
    # uniform weights, w'_d ∝ w_d * exp(eta * excess_d) with
    # excess_d = loss_d - min(loss), eta = 1, loss_d = the domain's
    # mean chars-per-token (a deterministic difficulty proxy from
    # exact integer sums — stand-in for the reference-model excess
    # loss a production DoReMi uses). Normalization runs over the
    # bounded |sources| relation.
    oracle=f"""
    WITH d AS (
      SELECT source,
             CAST(sum(len(replace(text, ' ', ''))) AS BIGINT) AS chars,
             CAST(sum(len(regexp_extract_all(lower(text), '{_TOK}')))
                  AS BIGINT) AS toks
      FROM documents GROUP BY source
    ), l AS (
      SELECT source, chars, toks,
             CAST(chars AS DOUBLE) / toks AS loss
      FROM d
    ), e AS (
      SELECT source, chars, toks, loss,
             exp(loss - min(loss) OVER ()) AS boost
      FROM l
    )
    SELECT source, chars, toks, round(loss, 6) AS loss,
           round(boost / sum(boost) OVER (), 6) AS weight_new
    FROM e
    """,
)
def corpus_doremi_step(spark, sf_dir):
    """DoReMi step: ONE corpus scan builds exact integer (chars,
    tokens) per source; everything after runs on the bounded source
    relation (the min/sum windows see |sources| rows, never data)."""
    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.lower("text"), F.lit(_TOK), 0)
    g = d.groupBy("source").agg(
        F.sum(F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
        .cast("bigint")
        .alias("chars"),
        F.sum(F.size(toks)).cast("bigint").alias("toks"),
    )
    loss = F.col("chars").cast("double") / F.col("toks")
    l = g.select("source", "chars", "toks", loss.alias("loss"))
    wall = W.partitionBy()  # bounded: |sources| rows
    e = l.select(
        "source",
        "chars",
        "toks",
        "loss",
        F.exp(F.col("loss") - F.min("loss").over(wall)).alias("boost"),
    )
    return e.select(
        "source",
        "chars",
        "toks",
        F.round("loss", 6).alias("loss"),
        F.round(F.col("boost") / F.sum("boost").over(wall), 6).alias(
            "weight_new"
        ),
    )


@query(
    "doc_token_f1_pairs",
    # Token-overlap F1 between same-language doc pairs in a bounded
    # slice (doc_id < 40): 2|A∩B|/(|A|+|B|) over DISTINCT lowercased
    # tokens. The intersection is a token equi join (never an
    # all-pairs text comparison); set sizes are exact integers.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             list_distinct(regexp_extract_all(lower(text), '{_TOK}')) AS tk
      FROM documents WHERE doc_id < 40
    ), sizes AS (
      SELECT doc_id, lang, CAST(len(tk) AS BIGINT) AS n_tok FROM d
    ), e AS (
      SELECT doc_id, lang, unnest(tk) AS tok FROM d
    ), i AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter
      FROM e a JOIN e b
        ON a.tok = b.tok AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, inter, sa.n_tok AS n_a, sb.n_tok AS n_b,
           round(2.0 * inter / (sa.n_tok + sb.n_tok), 6) AS f1
    FROM i JOIN sizes sa ON i.doc_a = sa.doc_id
           JOIN sizes sb ON i.doc_b = sb.doc_id
    """,
)
def doc_token_f1_pairs(spark, sf_dir):
    """Token-F1 pairs: explode distinct tokens once, self equi join on
    (token, lang) with id ordering, count per pair, join back the two
    exact set sizes. At scale the join is bounded by token postings,
    the shape every dedup path here uses."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.regexp_extract_all(F.lower("text"), F.lit(_TOK), 0)
            ).alias("tk"),
        )
    )
    sizes = d.select(
        "doc_id", "lang", F.size("tk").cast("bigint").alias("n_tok")
    )
    e = d.select("doc_id", "lang", F.explode("tk").alias("tok"))
    a = e.select(
        F.col("doc_id").alias("doc_a"), "lang", F.col("tok").alias("tok_a")
    )
    b = e.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("tok").alias("tok_b"),
    )
    i = (
        a.join(
            b,
            (F.col("tok_a") == F.col("tok_b"))
            & (F.col("lang") == F.col("lang_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_tok").alias("n_a")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_tok").alias("n_b")
    )
    return (
        i.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "n_a",
            "n_b",
            F.round(
                2.0 * F.col("inter") / (F.col("n_a") + F.col("n_b")), 6
            ).alias("f1"),
        )
    )


@query(
    "corpus_curriculum_order",
    # Curriculum phases: rank every doc by a deterministic difficulty
    # proxy (chars per token, exact integer ratio) with the counts
    # tier (distinct-value cumulative counts -> integer thresholds,
    # the ml_woe_encoding decile pattern), cut into terciles, report
    # per (phase, source) doc counts and the exact mean difficulty.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             round(CAST(len(replace(text, ' ', '')) AS DOUBLE)
                   / greatest(len(regexp_extract_all(lower(text),
                                                     '{_TOK}')), 1), 6)
               AS diff
      FROM documents
    ), qc AS (
      SELECT diff, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(count(*)) OVER (ORDER BY diff
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - count(*) AS BIGINT) AS below,
             CAST(sum(count(*)) OVER () AS BIGINT) AS n
      FROM d GROUP BY diff
    ), binned AS (
      SELECT diff, CAST((3 * below) // n AS BIGINT) AS phase FROM qc
    )
    SELECT phase, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(d.diff AS DECIMAL(18,6)))
                      AS DOUBLE) / count(*), 6) AS mean_difficulty
    FROM d JOIN binned USING (diff)
    GROUP BY phase, source
    """,
)
def corpus_curriculum_order(spark, sf_dir):
    """Curriculum assignment: difficulty is a 6-dp exact ratio, phase
    thresholds come from the counts tier (O(distinct difficulties)
    window state, never a global row sort), and the report is one
    keyed aggregate with a DECIMAL-exact mean."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.round(
            F.length(
                F.replace(F.col("text"), F.lit(" "), F.lit(""))
            ).cast("double")
            / F.greatest(
                F.size(
                    F.regexp_extract_all(F.lower("text"), F.lit(_TOK), 0)
                ),
                F.lit(1),
            ),
            6,
        ).alias("diff"),
    )
    cum = W.orderBy("diff").rowsBetween(W.unboundedPreceding, W.currentRow)
    qc = (
        d.groupBy("diff")
        .agg(F.count("*").alias("c"))
        .select(
            "diff",
            (F.sum("c").over(cum) - F.col("c")).cast("bigint").alias("below"),
            F.sum("c").over(W.partitionBy()).cast("bigint").alias("n"),
        )
    )
    binned = qc.select(
        "diff",
        F.floor(3 * F.col("below") / F.col("n")).cast("bigint").alias(
            "phase"
        ),
    )
    return (
        d.join(binned, "diff")
        .groupBy("phase", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("diff").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_difficulty"),
        )
    )
