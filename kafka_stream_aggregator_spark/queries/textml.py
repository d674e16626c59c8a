"""Text-ML wave: a trained-and-scored multinomial naive Bayes
language classifier, collocation mining by lift, and hapax/vocabulary
richness — the corpus-statistics layer between the raw text-quality
signals (llm/text.py) and the model-ready pipelines (llm/pipeline.py).

Determinism strategy per query:
- naive Bayes: per-(doc,class) scores are float ln-sums (the proven
  doc_unigram_logprob pattern — round-6 absorbs accumulation-order
  ulps at these magnitudes), but the PREDICTION argmax compares
  ROUND-6 scores with a total tie-break (score DESC, lang), so both
  engines pick the same class even on a rounded tie; the emitted
  confusion matrix is then pure integers.
- collocation lift: the interestingness filter lift > 1 is evaluated
  as the EXACT integer cross-product inequality
  c_xy * N1^2 > N2 * c_x * c_y (DECIMAL-guarded) — never a float
  comparison; ranking is on the integer bigram count.
- hapax: pure integer counts and one exact division per source.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t

_TOK = r"\s+"


def _tokens(df, extra=()):
    """(doc_id, word) token stream — the corpus-wide convention:
    lower(trim(text)) split on whitespace."""
    return df.select(
        "doc_id",
        *extra,
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), _TOK)
        ).alias("word"),
    )


_TOK_SQL = r"unnest(regexp_split_to_array(lower(trim(text)), '\s+'))"


@query(
    "ml_naive_bayes_langid",
    # Multinomial NB trained on the doc_id%5!=0 split, scored on the
    # %5==0 holdout; add-1 smoothing over the train vocabulary. Only
    # observed (word,class) cells contribute (ln(0+1)=0), so the score
    # needs no dense spine join; unseen-in-class mass enters through
    # n_tokens * ln(tok_c + V). Prediction = row_number over
    # (round(score,6) DESC, lang) — deterministic cross-engine. Output
    # is the integer confusion matrix.
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, {_TOK_SQL} AS word FROM documents
    ), train AS (
      SELECT * FROM tok WHERE doc_id % 5 <> 0
    ), test AS (
      SELECT * FROM tok WHERE doc_id % 5 = 0
    ), wc AS (
      SELECT lang, word, CAST(count(*) AS BIGINT) AS c
      FROM train GROUP BY 1, 2
    ), cls AS (
      SELECT lang, CAST(sum(c) AS BIGINT) AS tok_c
      FROM wc GROUP BY lang
    ), vocab AS (
      SELECT CAST(count(DISTINCT word) AS BIGINT) AS v FROM train
    ), prior AS (
      SELECT lang,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS dc,
             CAST(sum(count(DISTINCT doc_id)) OVER () AS BIGINT) AS dtot
      FROM train GROUP BY lang
    ), dsum AS (
      SELECT te.doc_id, wc.lang,
             sum(ln(CAST(wc.c + 1 AS DOUBLE))) AS sumln
      FROM test te JOIN wc ON te.word = wc.word
      GROUP BY te.doc_id, wc.lang
    ), dlen AS (
      SELECT doc_id, max(lang) AS true_lang,
             CAST(count(*) AS BIGINT) AS n_tok
      FROM test GROUP BY doc_id
    ), scored AS (
      SELECT d.doc_id, d.true_lang, p.lang AS cand,
             round(ln(CAST(p.dc AS DOUBLE) / p.dtot)
                   + COALESCE(s.sumln, 0.0)
                   - d.n_tok * ln(CAST(c.tok_c + v.v AS DOUBLE)), 6)
               AS score
      FROM dlen d
      CROSS JOIN prior p
      JOIN cls c ON p.lang = c.lang
      CROSS JOIN vocab v
      LEFT JOIN dsum s ON s.doc_id = d.doc_id AND s.lang = p.lang
    ), pred AS (
      SELECT doc_id, true_lang, cand AS pred_lang,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cand) AS rn
      FROM scored
    )
    SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n
    FROM pred WHERE rn = 1
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ml_naive_bayes_langid(spark, sf_dir):
    """Train a multinomial naive Bayes language classifier on 80% of
    the corpus (deterministic doc_id%5 split) and score the holdout —
    the classical counts-only text classifier, expressed entirely as
    joins and aggregates (training IS a groupBy; no iterative solver).
    Plan: (word,class) count relation from one explode+groupBy; test
    tokens join it on word (the only data-sized shuffle) — absent
    cells contribute ln(1)=0 so no dense spine is materialized; class
    totals / vocab / priors are broadcast 1-row or |langs|-row
    relations; prediction via a per-doc window over the |langs|-wide
    candidate relation on round-6 scores with a lang tie-break.
    Output: the integer confusion matrix (true x predicted)."""
    docs = t(spark, sf_dir, "documents")
    tok = _tokens(docs, extra=("lang",))
    train = tok.filter(F.col("doc_id") % 5 != 0)
    test = tok.filter(F.col("doc_id") % 5 == 0)
    wc = train.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cls = wc.groupBy("lang").agg(F.sum("c").cast("bigint").alias("tok_c"))
    vocab = train.agg(
        F.countDistinct("word").cast("bigint").alias("v")
    )
    prior = train.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("bigint").alias("dc")
    )
    prior = prior.crossJoin(
        F.broadcast(prior.agg(F.sum("dc").cast("bigint").alias("dtot")))
    )
    dsum = (
        test.join(wc.withColumnRenamed("lang", "cand"), "word")
        .groupBy("doc_id", "cand")
        .agg(F.sum(F.log(F.col("c") + 1.0)).alias("sumln"))
        .withColumnRenamed("doc_id", "s_doc_id")
    )
    dlen = test.groupBy("doc_id").agg(
        F.max("lang").alias("true_lang"),
        F.count(F.lit(1)).cast("bigint").alias("n_tok"),
    )
    scored = (
        dlen.crossJoin(F.broadcast(prior))
        .join(F.broadcast(cls), "lang")
        .crossJoin(F.broadcast(vocab))
        .join(
            dsum,
            (F.col("s_doc_id") == F.col("doc_id"))
            & (dsum["cand"] == F.col("lang")),
            "left",
        )
        .select(
            "doc_id",
            "true_lang",
            F.col("lang").alias("cand"),
            F.round(
                F.log(F.col("dc").cast("double") / F.col("dtot"))
                + F.coalesce(F.col("sumln"), F.lit(0.0))
                - F.col("n_tok")
                * F.log((F.col("tok_c") + F.col("v")).cast("double")),
                6,
            ).alias("score"),
        )
    )
    wdoc = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
    pred = scored.withColumn("rn", F.row_number().over(wdoc)).filter(
        F.col("rn") == 1
    )
    return (
        pred.groupBy("true_lang", F.col("cand").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


@query(
    "doc_collocation_lift",
    # Top-30 adjacent-bigram collocations: ranked by the INTEGER
    # bigram count (tie-break on the bigram string), kept only when
    # lift > 1 evaluated as the exact integer inequality
    # c_xy * N1 * N1 > N2 * c_x * c_y in DECIMAL(38,0) — the float
    # lift is emitted as decoration only.
    oracle=f"""
    WITH ws AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS w
      FROM documents
    ), bg AS (
      SELECT w[i] AS x, w[i+1] AS y
      FROM ws, unnest(range(1, len(w))) AS t(i)
    ), bgc AS (
      SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy FROM bg GROUP BY 1, 2
    ), uni AS (
      SELECT x AS word, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT x FROM bg UNION ALL
        SELECT y FROM (SELECT doc_id, w FROM ws) s,
             LATERAL (SELECT w[len(w)] AS y) WHERE len(w) >= 1
      ) GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n1,
             (SELECT CAST(sum(c_xy) AS BIGINT) FROM bgc) AS n2
      FROM uni
    )
    SELECT b.x, b.y, b.c_xy,
           round(CAST(b.c_xy AS DOUBLE) * n1 * n1
                 / (CAST(n2 AS DOUBLE) * ux.c * uy.c), 6) AS lift
    FROM bgc b
    JOIN uni ux ON b.x = ux.word
    JOIN uni uy ON b.y = uy.word
    CROSS JOIN tot
    WHERE CAST(b.c_xy AS DECIMAL(19,0)) * CAST(n1 AS DECIMAL(19,0))
          * CAST(n1 AS HUGEINT)
          > CAST(n2 AS DECIMAL(19,0)) * CAST(ux.c AS DECIMAL(19,0))
            * CAST(uy.c AS HUGEINT)
      AND b.c_xy >= 3
    ORDER BY b.c_xy DESC, b.x, b.y
    LIMIT 30
    """,
)
def doc_collocation_lift(spark, sf_dir):
    """Collocation mining: which adjacent word pairs co-occur far more
    than their unigram frequencies predict (lift = P(xy)/(P(x)P(y))) —
    the counts-only cousin of PMI that needs no log and therefore
    admits an EXACT integer significance filter. Plan: one explode to
    the bigram stream (map-only slice of the token array), two bounded
    groupBys (bigram counts, unigram counts), broadcast totals, and a
    TakeOrderedAndProject top-30 on the integer count. The lift > 1
    cut is the decimal cross-product inequality — a float lift
    comparison could flip engines on a 1-ulp boundary; the integer
    form cannot. Unigram counts here are TOKEN-STREAM counts (every
    bigram position's x plus each doc's final token), so N1 = total
    tokens and the lift estimator matches the textbook MLE."""
    docs = t(spark, sf_dir, "documents")
    ws = docs.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), _TOK).alias("w")
    )
    # bigram stream: positions 0..len-2
    bg = ws.select(
        F.posexplode(F.slice(F.col("w"), 1, F.size("w") - 1)).alias(
            "i", "x"
        ),
        F.col("w"),
    ).select(
        "x", F.col("w").getItem(F.col("i") + 1).alias("y")
    )
    bgc = bg.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_xy")
    )
    uni = (
        bg.select(F.col("x").alias("word"))
        .unionAll(
            ws.filter(F.size("w") >= 1).select(
                F.element_at("w", -1).alias("word")
            )
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("bigint").alias("n1")).crossJoin(
        bgc.agg(F.sum("c_xy").cast("bigint").alias("n2"))
    )
    ux = uni.select(F.col("word").alias("x"), F.col("c").alias("cx"))
    uy = uni.select(F.col("word").alias("y"), F.col("c").alias("cy"))
    d19 = "decimal(19,0)"
    lhs = (
        F.col("c_xy").cast(d19)
        * F.col("n1").cast(d19)
        * F.col("n1").cast(d19)
    )
    rhs = (
        F.col("n2").cast(d19)
        * F.col("cx").cast(d19)
        * F.col("cy").cast(d19)
    )
    return (
        bgc.join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(tot))
        .filter((lhs > rhs) & (F.col("c_xy") >= 3))
        .select(
            "x",
            "y",
            "c_xy",
            F.round(
                F.col("c_xy").cast("double")
                * F.col("n1")
                * F.col("n1")
                / (
                    F.col("n2").cast("double")
                    * F.col("cx")
                    * F.col("cy")
                ),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("c_xy").desc(), "x", "y")
        .limit(30)
    )


@query(
    "doc_vocab_richness",
    # Per-source vocabulary richness: distinct words, hapax legomena
    # (corpus-frequency-1 words appearing in the source), type-token
    # ratio and hapax share — all integer counts + exact divisions.
    oracle=f"""
    WITH tok AS (
      SELECT source, {_TOK_SQL} AS word FROM documents
    ), freq AS (
      SELECT word, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY word
    )
    SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT t.word) AS BIGINT) AS n_types,
           CAST(count(DISTINCT CASE WHEN f.c = 1 THEN t.word END)
                AS BIGINT) AS n_hapax,
           round(count(DISTINCT t.word) / CAST(count(*) AS DOUBLE), 6)
             AS type_token_ratio,
           round(count(DISTINCT CASE WHEN f.c = 1 THEN t.word END)
                 / CAST(count(DISTINCT t.word) AS DOUBLE), 6)
             AS hapax_share
    FROM tok t JOIN freq f ON t.word = f.word
    GROUP BY t.source ORDER BY t.source
    """,
)
def doc_vocab_richness(spark, sf_dir):
    """Vocabulary-richness profile per source: type-token ratio and
    hapax-legomena share — the fastest template/boilerplate detector
    (templated sources have collapsed TTR) and the standard Heaps'-law
    input. Plan: one explode, one corpus frequency groupBy joined back
    on word (shuffle on word), one per-source aggregate; every output
    is an integer count or a single exact division."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), _TOK)).alias(
            "word"
        ),
    )
    freq = tok.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    hapax_word = F.when(F.col("c") == 1, F.col("word"))
    return (
        tok.join(freq, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.countDistinct("word").cast("bigint").alias("n_types"),
            F.countDistinct(hapax_word).cast("bigint").alias("n_hapax"),
            F.round(
                F.countDistinct("word") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("type_token_ratio"),
            F.round(
                F.countDistinct(hapax_word)
                / F.countDistinct("word").cast("double"),
                6,
            ).alias("hapax_share"),
        )
        .orderBy("source")
    )
