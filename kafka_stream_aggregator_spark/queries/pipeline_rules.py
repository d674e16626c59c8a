"""Pipeline-rules wave: the classic published data-curation rule sets
re-expressed as exactly-oracled relational plans — Gopher-style quality
gating, RefinedWeb-style duplicated-span coverage, first-occurrence
n-gram novelty, and DSIR importance weighting for targeted data
selection.

Determinism strategy (the round-6 lessons applied from the start):
- every keep/drop threshold is an EXACT INTEGER inequality (e.g. the
  mean-word-length band [3,10] is ``3*n <= sum_len <= 10*n``, never a
  float division compared to a float literal);
- n-gram identity travels as the portable 60-bit md5 hash
  (sketches.portable_u64), so the oracle replays the exact grouping and
  the shuffled key is an 8-byte int, not the gram string;
- the one float aggregate (DSIR's ln-ratio sum) follows the proven
  doc_unigram_logprob / ml_naive_bayes pattern: per-(doc,bucket)
  multiplicities first, ln terms summed once per distinct bucket,
  round-6 absorbing accumulation-order ulps.

Scale shapes: everything is scan -> bounded groupBy -> (broadcast-able
or key-bounded) join. No global sort, no unpartitioned window, no
driver loop, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sketches import portable_u64, portable_u64_sql
from .base import query, t

# Corpus-wide token convention (ADVICE r5: regexp_extract_all('\S+'),
# never split('\s+'), so empty/whitespace-only text yields [] not [""]).
_WS = r"\S+"
_TOK_SQL = r"regexp_extract_all(lower(trim(text)), '\S+')"


def _ws_col():
    return F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(_WS), 0
    )


# --------------------------------------------------------------------------
# Gopher-style quality rules
# --------------------------------------------------------------------------


@query(
    "doc_gopher_quality_rules",
    # Per-source rule-failure counts for a Gopher-style quality gate
    # (Rae et al. 2021, "Scaling Language Models: ... Gopher", app. A:
    # word-count band, mean-word-length band, duplicate-word mass,
    # stop-word presence), with every band evaluated as an exact
    # integer inequality so both engines agree bit-for-bit:
    #   r_len : n_words in [15, 120]
    #   r_mwl : 3*n_words <= sum(len(word)) <= 10*n_words
    #   r_dup : 2*distinct_words > n_words   (dup fraction < 1/2)
    #   r_stop: contains 'a' or 'the'
    oracle=f"""
    WITH w AS (
        SELECT source,
               {_TOK_SQL} AS ws
        FROM documents
    ),
    m AS (
        SELECT source,
               len(ws) AS n,
               len(list_distinct(ws)) AS nd,
               coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS sl,
               list_has_any(ws, ['a', 'the']) AS has_stop
        FROM w
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n BETWEEN 15 AND 120 THEN 0 ELSE 1 END)
                AS BIGINT) AS fail_len,
           CAST(sum(CASE WHEN 3 * n <= sl AND sl <= 10 * n
                         THEN 0 ELSE 1 END) AS BIGINT) AS fail_mwl,
           CAST(sum(CASE WHEN 2 * nd > n THEN 0 ELSE 1 END)
                AS BIGINT) AS fail_dup,
           CAST(sum(CASE WHEN has_stop THEN 0 ELSE 1 END)
                AS BIGINT) AS fail_stop,
           CAST(sum(CASE WHEN n BETWEEN 15 AND 120
                          AND 3 * n <= sl AND sl <= 10 * n
                          AND 2 * nd > n
                          AND has_stop
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM m
    GROUP BY source
    """,
)
def doc_gopher_quality_rules(spark, sf_dir):
    """Gopher-rule quality gate, reported per source: how many docs
    fail each rule and how many pass all four. One codegen'd scan —
    every signal (word count, summed word length, distinct count,
    stop-word overlap) is computed inside the array functions on the
    same row, so the only shuffle is the tiny per-source groupBy. At
    100 TB this is the map-side-combine shape: |sources| rows move."""
    d = t(spark, sf_dir, "documents")
    ws = _ws_col()
    m = d.select(
        "source",
        F.size(ws).cast("long").alias("n"),
        F.size(F.array_distinct(ws)).cast("long").alias("nd"),
        F.aggregate(
            F.transform(ws, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sl"),
        F.arrays_overlap(ws, F.array(F.lit("a"), F.lit("the"))).alias(
            "has_stop"
        ),
    )
    ok_len = F.col("n").between(15, 120)
    ok_mwl = (3 * F.col("n") <= F.col("sl")) & (
        F.col("sl") <= 10 * F.col("n")
    )
    ok_dup = 2 * F.col("nd") > F.col("n")
    ok_stop = F.col("has_stop")
    as_fail = lambda ok: F.sum((~ok).cast("long")).cast("bigint")  # noqa: E731
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        as_fail(ok_len).alias("fail_len"),
        as_fail(ok_mwl).alias("fail_mwl"),
        as_fail(ok_dup).alias("fail_dup"),
        as_fail(ok_stop).alias("fail_stop"),
        F.sum((ok_len & ok_mwl & ok_dup & ok_stop).cast("long"))
        .cast("bigint")
        .alias("n_pass"),
    )


# --------------------------------------------------------------------------
# Duplicated-span coverage (RefinedWeb / WIMBD exact-substring measure)
# --------------------------------------------------------------------------


@query(
    "doc_dup_span_coverage",
    # Fraction of each document's token POSITIONS covered by at least
    # one corpus-duplicated 5-gram (occurrence count > 1, including
    # within-doc repeats) — the exact-substring removal measure of
    # RefinedWeb (Penedo et al. 2023) as a position-coverage relation.
    # Differs from doc_repeated_ngram_frac (distinct-gram recurrence):
    # this unions the covered intervals, i.e. what span-dedup would
    # actually cut. Gram identity = portable 60-bit hash of the joined
    # 5 tokens, replayed verbatim by this oracle.
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {_TOK_SQL} AS ws FROM documents
    ),
    b AS (SELECT doc_id, ws, len(ws) AS n FROM w),
    g0 AS (
        SELECT doc_id, ws,
               unnest(range(1, n - 3)) AS i
        FROM b WHERE n >= 5
    ),
    g AS (
        SELECT doc_id, i,
               {portable_u64_sql("array_to_string(ws[i:i+4], ' ')")} AS gh
        FROM g0
    ),
    gc AS (SELECT gh, count(*) AS c FROM g GROUP BY gh),
    dup AS (
        SELECT g.doc_id, g.i FROM g JOIN gc USING (gh) WHERE c > 1
    ),
    cov AS (
        SELECT DISTINCT doc_id, i + unnest(range(0, 5)) AS p FROM dup
    ),
    cnt AS (SELECT doc_id, count(*) AS covered FROM cov GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(coalesce(covered, 0) AS BIGINT) AS covered_tokens,
           round(CAST(coalesce(covered, 0) AS DOUBLE)
                 / nullif(n, 0), 6) AS coverage
    FROM b LEFT JOIN cnt USING (doc_id)
    """,
)
def doc_dup_span_coverage(spark, sf_dir):
    """Duplicated-5-gram span coverage per document. Plan: one token
    scan -> gram hashes via a transform over sequence(1, n-4) (no
    per-token explode; the array never leaves the row until the gram
    relation) -> count per 60-bit gram key -> join back the duplicated
    grams -> interval union as DISTINCT (doc, position). Three
    shuffles, all on bounded 8-byte keys; the gram relation is ~n rows
    of (long, int, long) — at 100 TB that is the same order as any
    n-gram pass, and the string gram itself is never shuffled."""
    d = t(spark, sf_dir, "documents")
    ws = _ws_col()
    b = d.select(
        "doc_id", ws.alias("ws"), F.size(ws).cast("long").alias("n")
    )
    g = (
        b.where(F.col("n") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), (F.col("n") - 4).cast("int")),
                    lambda i: F.struct(
                        i.alias("i"),
                        portable_u64(
                            F.concat_ws(
                                " ", F.slice(F.col("ws"), i, F.lit(5))
                            )
                        ).alias("gh"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.i").alias("i"), F.col("s.gh").alias("gh"))
    )
    gc = g.groupBy("gh").agg(F.count(F.lit(1)).alias("c"))
    dup = g.join(gc.where(F.col("c") > 1), "gh").select("doc_id", "i")
    cov = dup.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("i"), F.col("i") + 4)
        ).alias("p"),
    ).distinct()
    cnt = cov.groupBy("doc_id").agg(F.count(F.lit(1)).alias("covered"))
    return (
        b.select("doc_id", "n")
        .join(cnt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("covered"), F.lit(0))
            .cast("bigint")
            .alias("covered_tokens"),
            F.round(
                F.coalesce(F.col("covered"), F.lit(0))
                / F.nullif(F.col("n"), F.lit(0)),
                6,
            ).alias("coverage"),
        )
    )


# --------------------------------------------------------------------------
# First-occurrence n-gram novelty
# --------------------------------------------------------------------------


@query(
    "doc_ngram_novelty",
    # Per document (corpus ordered by doc_id): the share of its
    # DISTINCT 3-grams whose first corpus occurrence is this document —
    # the "how much new text does each crawl slice add" curve used to
    # decide when a source is mined out. min(doc_id) per gram is the
    # exact first-occurrence relation; novelty is an integer ratio.
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {_TOK_SQL} AS ws FROM documents
    ),
    b AS (SELECT doc_id, ws, len(ws) AS n FROM w),
    g AS (
        SELECT DISTINCT doc_id,
               {portable_u64_sql("array_to_string(ws[i:i+2], ' ')")} AS gh
        FROM (SELECT doc_id, ws, unnest(range(1, n - 1)) AS i
              FROM b WHERE n >= 3)
    ),
    fo AS (SELECT gh, min(doc_id) AS first_doc FROM g GROUP BY gh),
    per AS (
        SELECT g.doc_id,
               count(*) AS n_grams,
               sum(CASE WHEN first_doc = g.doc_id THEN 1 ELSE 0 END)
                   AS n_novel
        FROM g JOIN fo USING (gh)
        GROUP BY g.doc_id
    )
    SELECT b.doc_id,
           CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
           round(CAST(n_novel AS DOUBLE) / nullif(n_grams, 0), 6)
               AS novelty
    FROM b LEFT JOIN per USING (doc_id)
    """,
)
def doc_ngram_novelty(spark, sf_dir):
    """Distinct-3-gram novelty per document vs. all lower doc_ids.
    Plan: per-doc distinct gram hashes (array_distinct inside the row,
    THEN explode — the dedup costs nothing), min(doc_id) per gram (one
    key-bounded shuffle), join back, integer ratio. The join is
    gram-key partitioned on both sides so it reuses the aggregation's
    exchange. Docs with <3 tokens surface with zero counts and NULL
    novelty via the left join, matching the oracle exactly."""
    d = t(spark, sf_dir, "documents")
    ws = _ws_col()
    b = d.select(
        "doc_id", ws.alias("ws"), F.size(ws).cast("long").alias("n")
    )
    g = (
        b.where(F.col("n") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), (F.col("n") - 2).cast("int")),
                        lambda i: portable_u64(
                            F.concat_ws(
                                " ", F.slice(F.col("ws"), i, F.lit(3))
                            )
                        ),
                    )
                )
            ).alias("gh"),
        )
    )
    fo = g.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    per = (
        g.join(fo, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .alias("n_novel"),
        )
    )
    return (
        b.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0))
            .cast("bigint")
            .alias("n_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0))
            .cast("bigint")
            .alias("n_novel"),
            F.round(
                F.col("n_novel") / F.nullif(F.col("n_grams"), F.lit(0)), 6
            ).alias("novelty"),
        )
    )


# --------------------------------------------------------------------------
# DSIR importance weighting
# --------------------------------------------------------------------------

_DSIR_B = 4096


@query(
    "doc_dsir_importance",
    # Data Selection via Importance Resampling (Xie et al. 2023):
    # hashed-unigram bag-of-words importance log-weight of every doc
    # toward an English target slice.  Features are
    # portable_u64(word:dsir) % 4096; the weight is
    #   sum_b m_b * [ln((ct_b+1)/(Nt+B)) - ln((cr_b+1)/(Nr+B))]
    # with ct/cr the target/raw bucket counts.  Both engines compute
    # identical integer count relations; the ln-sum is round-6.
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest({_TOK_SQL}) AS w
        FROM documents
    ),
    tb AS (
        SELECT doc_id, lang,
               {portable_u64_sql("w", "dsir")} % {_DSIR_B} AS b
        FROM tok
    ),
    bc AS (
        SELECT b,
               count(*) AS cr,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        FROM tb GROUP BY b
    ),
    tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt FROM bc),
    dt AS (
        SELECT doc_id, lang, b, count(*) AS m
        FROM tb GROUP BY doc_id, lang, b
    )
    SELECT doc_id, lang,
           CAST(sum(m) AS BIGINT) AS n_tokens,
           round(sum(m * (ln(CAST(ct AS DOUBLE) + 1.0)
                          - ln(CAST(cr AS DOUBLE) + 1.0)))
                 + sum(m) * (ln(CAST(any_value(nr) AS DOUBLE) + {_DSIR_B}.0)
                             - ln(CAST(any_value(nt) AS DOUBLE) + {_DSIR_B}.0)),
                 6) AS dsir_logw
    FROM dt JOIN bc USING (b) CROSS JOIN tot
    GROUP BY doc_id, lang
    """,
)
def doc_dsir_importance(spark, sf_dir):
    """DSIR importance log-weights against the lang='en' target slice.
    Plan: token scan -> 4096-bucket hashed features -> the bucket count
    relation is BOUNDED at 4096 rows (broadcast), the totals at 1 row
    (broadcast) — so after the per-(doc,bucket) multiplicity groupBy
    (the one fact-sized shuffle, on the doc key the corpus is already
    laid out by) everything is map-side. The add-1 smoothing keeps
    every bucket defined without a dense spine. Positive dsir_logw =
    more target-like; downstream selection samples proportional to
    exp(logw), which a later stage can do with the existing
    doc_weighted_sample machinery."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(_ws_col()).alias("w"),
    )
    tb = tok.select(
        "doc_id",
        "lang",
        F.pmod(portable_u64(F.col("w"), salt="dsir"), F.lit(_DSIR_B)).alias(
            "b"
        ),
    )
    bc = tb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum((F.col("lang") == "en").cast("long")).alias("ct"),
    )
    tot = bc.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    dt = tb.groupBy("doc_id", "lang", "b").agg(
        F.count(F.lit(1)).alias("m")
    )
    joined = dt.join(F.broadcast(bc), "b").crossJoin(F.broadcast(tot))
    return joined.groupBy("doc_id", "lang").agg(
        F.sum("m").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum(
                F.col("m")
                * (
                    F.log(F.col("ct").cast("double") + 1.0)
                    - F.log(F.col("cr").cast("double") + 1.0)
                )
            )
            + F.sum("m")
            * (
                F.log(F.first("nr").cast("double") + float(_DSIR_B))
                - F.log(F.first("nt").cast("double") + float(_DSIR_B))
            ),
            6,
        ).alias("dsir_logw"),
    )
