"""Fourth corpus wave (round 7): eval-set n-gram contamination
measurement, tokenizer fertility, and the embedding cosine-pair
histogram.

All three are curation diagnostics an LLM-data pipeline runs before
training: how much of the eval set leaks into train (the Brown et al.
n-gram overlap check), how many tokens the tokenizer spends per word
per language, and whether the embedding space is anisotropic (random
pairs should NOT all look alike).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sketches import U64_SQL_TEMPLATE as U64
from ..sketches import portable_u64, portable_u64_sql
from .base import query, t


@query(
    "doc_contamination_overlap",
    # Contamination rate of the 'zh' slice (stand-in eval set) against
    # the rest of the corpus (train): per eval doc, the fraction of
    # its distinct 5-gram hashes that occur anywhere in train, plus
    # the contaminated flag at the standard >= 0.5 threshold. The gram
    # membership test is a semi-join on 8-byte hashes — strings never
    # move.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             regexp_extract_all(lower(text), '\\S+') AS tk
      FROM documents
    ), grams AS (
      SELECT doc_id, lang,
             {U64.format(expr="array_to_string(tk[i:i+4], ' ')")} AS g
      FROM (SELECT doc_id, lang, tk, unnest(range(1, len(tk) - 3)) AS i
            FROM toks WHERE len(tk) >= 5)
    ), train AS (
      SELECT DISTINCT g FROM grams WHERE lang <> 'zh'
    ), ev AS (
      SELECT doc_id, g FROM (SELECT DISTINCT doc_id, g FROM grams
                             WHERE lang = 'zh')
    ), per AS (
      SELECT ev.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(count(train.g) AS BIGINT) AS n_hit
      FROM ev LEFT JOIN train ON ev.g = train.g
      GROUP BY ev.doc_id
    )
    SELECT doc_id, n_grams, n_hit,
           round(CAST(n_hit AS DOUBLE) / n_grams, 6) AS contamination,
           CAST(n_hit * 2 >= n_grams AS BOOLEAN) AS contaminated
    FROM per
    """,
)
def doc_contamination_overlap(spark, sf_dir):
    """Eval-vs-train n-gram contamination: one tokenize scan, gram
    hashes via the portable hash, the train side reduced to DISTINCT
    gram hashes (the only shuffled relation), eval membership via a
    hash equi-join. The >= 0.5 flag is integer arithmetic."""
    d = t(spark, sf_dir, "documents")
    # regexp_extract_all('\S+') not split('\s+'): split yields spurious
    # empty tokens on boundary whitespace, diverging 5-grams from the
    # oracle's tokenizer (ADVICE r7; house rule analytics17.py:127)
    tk = F.regexp_extract_all(F.lower("text"), F.lit(r"\S+"), 0)
    toks = d.select("doc_id", "lang", tk.alias("tk")).filter(
        F.size("tk") >= 5
    )
    grams = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 4),
                lambda i: F.array_join(F.slice("tk", i, 5), " "),
            )
        ).alias("gs"),
    ).select("doc_id", "lang", portable_u64(F.col("gs")).alias("g"))
    train = grams.filter(F.col("lang") != "zh").select("g").distinct()
    ev = grams.filter(F.col("lang") == "zh").select("doc_id", "g").distinct()
    hits = ev.join(
        train.withColumn("hit", F.lit(1)), "g", "left"
    )
    per = hits.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_grams"),
        F.count("hit").cast("bigint").alias("n_hit"),
    )
    return per.select(
        "doc_id",
        "n_grams",
        "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 6).alias(
            "contamination"
        ),
        (F.col("n_hit") * 2 >= F.col("n_grams")).alias("contaminated"),
    )


@query(
    "corpus_tokenizer_fertility",
    # Tokenizer fertility per language: BPE-ish tokens per whitespace
    # word and bytes per BPE-ish token — the two numbers that decide a
    # tokenizer's cost on a corpus slice. Counts are exact integers
    # (the doc_token_stats tokenizer definitions); ratios one chain.
    oracle="""
    WITH d AS (
      SELECT lang,
             CAST(len(regexp_extract_all(lower(text), '\\S+')) AS BIGINT)
               AS n_words,
             CAST(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS n_bpe,
             CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS words,
           CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
           CAST(sum(n_bytes) AS BIGINT) AS bytes,
           round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_words), 6)
             AS fertility,
           round(CAST(sum(n_bytes) AS DOUBLE) / sum(n_bpe), 6)
             AS bytes_per_token
    FROM d GROUP BY lang
    """,
)
def corpus_tokenizer_fertility(spark, sf_dir):
    """Fertility: one scan, integer counts per doc, one lang
    aggregate."""
    d = t(spark, sf_dir, "documents")
    words = F.size(F.regexp_extract_all(F.lower("text"), F.lit(r"\S+"), F.lit(0)))
    bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )
    per = d.select(
        "lang",
        words.cast("bigint").alias("n_words"),
        bpe.cast("bigint").alias("n_bpe"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    )
    return per.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("words"),
        F.sum("n_bpe").cast("bigint").alias("bpe_tokens"),
        F.sum("n_bytes").cast("bigint").alias("bytes"),
        F.round(
            F.sum("n_bpe").cast("double") / F.sum("n_words"), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_bytes").cast("double") / F.sum("n_bpe"), 6
        ).alias("bytes_per_token"),
    )


@query(
    "emb_cosine_pair_histogram",
    # Anisotropy probe: cosine similarity distribution over a
    # DETERMINISTIC pseudo-random pair sample (pairs whose portable
    # pair-hash lands under ~2%), bucketed to 0.1-wide bins. If the
    # histogram's mass sits far from 0, the space is anisotropic and
    # cosine thresholds need recalibration. Every pair is replayed by
    # the oracle (list_dot_product / F.aggregate — the proven-identical
    # fold pair); bin edges are exact multiples of 0.1 via
    # floor(cos * 10).
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, a.v AS va, b.v AS vb
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE {U64.format(expr="(CAST(a.vec_id AS VARCHAR) || '_' || CAST(b.vec_id AS VARCHAR) || ':cp')")}
            % 50 = 0
    ), cs AS (
      SELECT CAST(floor(list_dot_product(va, vb)
                  / (sqrt(list_dot_product(va, va))
                     * sqrt(list_dot_product(vb, vb))) * 10) AS BIGINT)
               AS bin
      FROM pairs
    )
    SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs
    FROM cs GROUP BY bin
    """,
)
def emb_cosine_pair_histogram(spark, sf_dir):
    """Pair sample via the portable pair hash (the join is still
    all-pairs at this demo scale — at 100 TB the sample predicate
    pushes into a hash-bucketed self-join exactly like the LSH
    family); cosine per pair in-row; 0.1-bin histogram."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    a = e.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = (
        a.join(b, F.col("ia") < F.col("ib"))
        .filter(
            portable_u64(
                F.concat(F.col("ia"), F.lit("_"), F.col("ib")), salt="cp"
            )
            % 50
            == 0
        )
    )
    cs = pairs.select(
        F.floor(
            dot(F.col("va"), F.col("vb"))
            / (F.sqrt(dot(F.col("va"), F.col("va"))) * F.sqrt(dot(F.col("vb"), F.col("vb"))))
            * 10
        )
        .cast("bigint")
        .alias("bin")
    )
    return cs.groupBy("bin").agg(F.count("*").cast("bigint").alias("n_pairs"))
