"""LLM-data-pipeline queries over documents + embeddings (SURVEY.md §2.B).

Deterministic ops (exact dedup, token stats, quality, fingerprints,
n-gram Jaccard, brute-force cosine top-k) are DuckDB-oracle-checked.
Probabilistic ops (MinHash LSH, SimHash, IVF ANN) are registered without
an oracle (rows-only check) and verified in tests against brute force.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..llm.dedup import minhash_near_dup, simhash_near_dup
from ..ops import data_sized_partitions
from ..llm.similarity import as_double, brute_force_topk, cosine_sim, ivf_topk, pseudo_centroids
from ..llm.text import STOPWORDS, fingerprint, lang_id, quality_score, token_stats
from .base import query, t


@query(
    "doc_exact_dedup",
    oracle="""
    SELECT md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS content_hash,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def doc_exact_dedup(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    h = F.md5(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return (
        d.groupBy(h.alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "doc_token_stats",
    bench=True,
    oracle="""
    WITH toks AS (
      SELECT doc_id, n_chars,
             regexp_extract_all(lower(text), '\\S+') AS tk,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
               AS bpe_tokens,
             length(text) AS true_chars
      FROM documents
    )
    SELECT doc_id,
           true_chars AS n_chars_measured,
           len(tk) AS n_tokens,
           len(list_distinct(tk)) AS n_uniq_tokens,
           round(list_aggregate(list_transform(tk, x -> CAST(length(x) AS DOUBLE)),
                                'sum') / greatest(len(tk), 1), 6) AS mean_token_len,
           round(n_punct / greatest(true_chars, 1), 6) AS punct_ratio,
           bpe_tokens
    FROM toks
    """,
)
def doc_token_stats(spark, sf_dir):
    # Round-12: exact inlined SQL twin of llm.text.token_stats for this
    # fixed shape (the struct helper stays the generic surface): ~0.14 s
    # of py4j Column building per call replaced by one JVM parse
    # (tools/bench_decompose.py; guide §1). Same single-scan plan.
    # spread the single-file corpus across cores before the regex work
    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    return spark.sql(
        """
        WITH tk AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 regexp_extract_all(lower(text), '\\\\S+', 0) AS toks,
                 size(regexp_extract_all(text, '[^\\\\w\\\\s]', 0)) AS n_punct,
                 size(regexp_extract_all(text,
                      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)) AS bpe_tokens
          FROM {d}
        )
        SELECT doc_id,
               n_chars AS n_chars_measured,
               size(toks) AS n_tokens,
               size(array_distinct(toks)) AS n_uniq_tokens,
               round(aggregate(transform(toks, x -> CAST(length(x) AS DOUBLE)),
                               0.0D, (a, x) -> a + x)
                     / greatest(size(toks), 1), 6) AS mean_token_len,
               round(n_punct / greatest(n_chars, 1), 6) AS punct_ratio,
               bpe_tokens
        FROM tk
        """,
        d=d,
    )


@query(
    "doc_quality_by_source",
    oracle="""
    WITH q AS (
      SELECT source,
             regexp_extract_all(lower(text), '\\S+') AS tk,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
      FROM documents
    ), scored AS (
      SELECT source,
             (CASE WHEN len(tk) BETWEEN 5 AND 100000 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN len(list_filter(tk, x -> list_contains(
                ['the','and','of','to','in','is','that','for','with','it'], x)))
                / greatest(len(tk), 1) > 0.01 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN n_punct / greatest(n_chars, 1) < 0.3 THEN 0.25 ELSE 0.0 END)
           + (CASE WHEN list_aggregate(list_transform(tk,
                x -> CAST(length(x) AS DOUBLE)), 'sum') / greatest(len(tk), 1)
                BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END) AS score
      FROM q
    )
    SELECT source, count(*) AS n_docs,
           round(avg(score), 6) AS avg_quality,
           round(CAST(min(score) AS DOUBLE), 6) AS min_quality
    FROM scored GROUP BY source
    """,
)
def doc_quality_by_source(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    return (
        d.withColumn("score", quality_score(F.col("text")))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("score"), 6).alias("avg_quality"),
            F.round(F.min("score"), 6).alias("min_quality"),
        )
    )


@query(
    "doc_token_heavy_hitters",
    # vocabulary heavy hitters: top 10 tokens per language by count
    # (deterministic tiebreak on token). Scale shape: explode ->
    # map-side partial count -> one shuffle on (lang, token) -> rank
    # with per-partition rank-limit pushdown. The classic corpus-stats
    # pass a training pipeline runs before building tokenizers/filters.
    oracle="""
    WITH tok AS (
      SELECT lang, unnest(regexp_extract_all(lower(text), '\\S+')) AS token
      FROM documents
    ), counts AS (
      SELECT lang, token, count(*) AS n FROM tok GROUP BY lang, token
    ), ranked AS (
      SELECT lang, token, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, token) AS rnk
      FROM counts
    )
    SELECT lang, token, n, rnk FROM ranked WHERE rnk <= 10
    """,
)
def doc_token_heavy_hitters(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    counts = (
        d.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = counts.withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
        ),
    )
    return ranked.filter(F.col("rnk") <= 10).select("lang", "token", "n", "rnk")


@query(
    "doc_fingerprint_groups",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(
             regexp_extract_all(lower(regexp_replace(lower(text),
               '[^\\w\\s]', '', 'g')), '\\S+'))), ' ')) AS fp,
           count(*) AS n_docs,
           min(doc_id) AS canonical_id
    FROM documents GROUP BY 1
    """,
)
def doc_fingerprint_groups(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    return (
        d.groupBy(fingerprint(F.col("text")).alias("fp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_id"),
        )
    )


@query(
    "ngram_jaccard_pairs",
    bench=True,
    # Exact word-3-gram Jaccard for doc pairs of the same lang (bounded id
    # range keeps the pair count honest for the oracle; the scalable
    # unbounded path is minhash_near_dup below).
    oracle="""
    WITH dt AS (
      SELECT doc_id, lang, regexp_extract_all(lower(trim(text)), '\\S+') AS tk
      FROM documents WHERE doc_id < 120
    ), sh0 AS (
      SELECT doc_id, lang, array_to_string(tk[g:g+2], ' ') AS sh
      FROM dt, unnest(range(1, greatest(len(tk) - 2, 0) + 1)) AS u(g)
    ), sh AS (
      SELECT DISTINCT doc_id, lang, sh FROM sh0
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b
        ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
    FROM inter JOIN sizes sa ON id_a = sa.doc_id
               JOIN sizes sb ON id_b = sb.doc_id
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.01
    """,
)
def ngram_jaccard_pairs(spark, sf_dir):
    # Round-12 shape (guide §2.4/§2.3). The r11 form joined a separate
    # per-doc `sizes` aggregate onto the pair counts, so the plan held
    # FOUR scan+explode subtrees (a side, b side, size-a, size-b), two
    # extra agg Exchanges and two extra broadcast joins. Since the
    # shingle array already exists pre-explode, its size() IS n_sh —
    # carrying it through the explode (2 extra ints per row into the
    # candidate join, which min() collapses per pair) deletes the size
    # subtrees outright: 10 Exchanges -> 5, 4 parquet scans -> 2, and
    # one groupBy instead of three (plans/r12/ngram_jaccard_pairs_*).
    # Built as ONE spark.sql statement: the Column-object original cost
    # a measured 0.28 s of py4j plan construction per call (bench_
    # decompose) — the same plan parses in one JVM round trip (the
    # minhash_near_dup lesson). Join stays on 8-byte xxhash64 shingle
    # hashes, not strings: same jaccard (collision odds ~n^2/2^64),
    # ~10x smaller shuffle for the self-join. Parity re-verified at
    # sf0.001/sf0.01/sf1.
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 120)
        .repartition(data_sized_partitions(t(spark, sf_dir, "documents")))
    )
    return spark.sql(
        """
        WITH dt AS (
          SELECT doc_id, lang,
                 CASE WHEN size(split(lower(trim(text)), '\\\\s+')) >= 3
                      THEN array_distinct(transform(
                             sequence(1, size(split(lower(trim(text)), '\\\\s+')) - 2),
                             i -> array_join(slice(split(lower(trim(text)), '\\\\s+'), i, 3), ' ')))
                      ELSE CAST(array() AS ARRAY<STRING>) END AS arr
          FROM {d}
        ), sh AS (
          SELECT doc_id, lang, size(arr) AS n_sh, xxhash64(s) AS sh
          FROM dt LATERAL VIEW explode(arr) AS s
        ), agg AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 count(*) AS n_inter, min(a.n_sh) AS n_a, min(b.n_sh) AS n_b
          FROM sh a JOIN sh b
            ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT id_a, id_b,
               round(n_inter / (n_a + n_b - n_inter), 6) AS jaccard
        FROM agg
        WHERE n_inter / (n_a + n_b - n_inter) >= 0.01
        """,
        d=d,
    )


@query(
    "cos_topk_bruteforce",
    bench=True,
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
         scored AS (
           SELECT q_id, e.vec_id AS c_id,
                  list_dot_product(qv, v)
                    / (sqrt(list_dot_product(qv, qv))
                       * sqrt(list_dot_product(v, v))) AS cos_sim
           FROM q JOIN e ON e.vec_id <> q_id
         ), ranked AS (
           SELECT q_id, c_id, cos_sim,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cos_sim DESC, c_id) AS rank
           FROM scored
         )
    SELECT q_id, c_id, round(cos_sim, 6) AS cos_sim, rank
    FROM ranked WHERE rank <= 5
    """,
)
def cos_topk_bruteforce(spark, sf_dir):
    # Round-12: exact inlined SQL twin of llm.similarity.brute_force_topk
    # for this fixed shape (the helper stays the generic surface): the
    # Column/HOF builders cost a measured ~0.20 s of py4j plan
    # construction per call (tools/bench_decompose.py; guide §1). Same
    # plan: norms hoisted out of the O(Q*N) pair loop, query side
    # broadcast into a nested-loop join on q_id != c_id, per-query
    # rank-5 with WindowGroupLimit pushdown. Parity re-verified at
    # sf0.001/sf0.01/sf1.
    emb = t(spark, sf_dir, "embeddings")
    return spark.sql(
        """
        WITH e AS (
          SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM {emb}
        ), qn AS (
          SELECT vec_id AS q_id, v AS q_vec,
                 sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D,
                                (acc, x) -> acc + x)) AS __qnorm
          FROM e WHERE vec_id < 10
        ), cn AS (
          SELECT vec_id AS c_id, v AS c_vec,
                 sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D,
                                (acc, x) -> acc + x)) AS __cnorm
          FROM e
        ), scored AS (
          SELECT /*+ BROADCAST(qn) */ q_id, c_id,
                 aggregate(zip_with(q_vec, c_vec, (x, y) -> x * y), 0.0D,
                           (acc, x) -> acc + x)
                   / (__qnorm * __cnorm) AS cos_sim
          FROM cn JOIN qn ON q_id != c_id
        ), ranked AS (
          SELECT q_id, c_id, cos_sim,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos_sim DESC, c_id) AS rank
          FROM scored
        )
        SELECT q_id, c_id, round(cos_sim, 6) AS cos_sim, rank
        FROM ranked WHERE rank <= 5
        """,
        emb=emb,
    )


@query(
    "emb_label_stats",
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT label, count(*) AS n_vecs,
           round(avg(sqrt(list_dot_product(v, v))), 6) AS avg_norm,
           round(avg(v[1]), 6) AS avg_first
    FROM e GROUP BY label
    """,
)
def emb_label_stats(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").select(
        "label", as_double(F.col("embedding")).alias("v")
    )
    sq = F.aggregate(
        F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(F.sqrt(sq)), 6).alias("avg_norm"),
            F.round(F.avg(F.element_at("v", 1)), 6).alias("avg_first"),
        )
    )


@query(
    "emb_cosine_near_dup",
    # exact embedding-cosine near-dup pairs over a bounded id range
    # (the oracle-able baseline; the IVF-blocked scale path is
    # emb_cosine_near_dup_ivf below).
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id < 300
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= 0.4
    """,
)
def emb_cosine_near_dup(spark, sf_dir):
    from ..llm.similarity import cosine_near_dup_pairs

    e = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
    )
    pairs = cosine_near_dup_pairs(e, "vec_id", "v", threshold=0.4)
    return pairs.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


@query(
    "emb_cosine_near_dup_ivf",
    # The IVF blocking is DETERMINISTIC (id-ordered centroid seeds,
    # cell_id tiebreaks), so the full blocked search is SQL-expressible:
    # the oracle replicates centroid seeding, 3-probe cell assignment,
    # the shared-cell pair join, and the multi-probe dedup. Float
    # arithmetic matches because both engines fold the dot product in
    # array-index order.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cell_id, v AS c_vec FROM e ORDER BY vec_id
              LIMIT greatest(8, CAST(floor(sqrt((SELECT count(*) FROM e)))
                                     AS BIGINT))),
    cn AS (SELECT cell_id, c_vec, sqrt(list_dot_product(c_vec, c_vec)) AS cnorm FROM cents),
    cells AS (
      SELECT id, v, n, cell_id FROM (
        SELECT e.vec_id AS id, e.v AS v,
               sqrt(list_dot_product(e.v, e.v)) AS n, cn.cell_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, cn.c_vec) / cn.cnorm DESC,
                          cn.cell_id) AS rk
        FROM e CROSS JOIN cn) WHERE rk <= 3
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             list_dot_product(a.v, b.v) / (a.n * b.n) AS cos_sim
      FROM cells a JOIN cells b ON a.cell_id = b.cell_id AND a.id < b.id
    )
    SELECT id_a, id_b, round(max(cos_sim), 6) AS cos_sim
    FROM pairs WHERE cos_sim >= 0.4 GROUP BY id_a, id_b
    """,
)
def emb_cosine_near_dup_ivf(spark, sf_dir):
    """The scale path: same pairs search blocked by IVF cells (equi join
    on cell_id, never all-pairs). Recall vs the exact variant is
    measured in tests/test_llm.py.

    Cell count scales as sqrt(n) (floor, min 8) — a CONSTANT cell
    count is a latent quadratic: with 8 cells the per-cell pair join
    is O((n*probe/8)^2), which this round's sf1 parity window exposed
    as ~28M interpreted pair-dots at 20k vectors (the run had to be
    killed). sqrt-scaling keeps expected cell size ~sqrt(n)*probe, so
    per-cell pair work grows linearly with n — the standard IVF nlist
    rule. The one count() action here is construction-time sizing
    (parquet metadata count), mirrored exactly by the oracle's
    subquery LIMIT."""
    import math

    from ..llm.similarity import cosine_near_dup_pairs, pseudo_centroids

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    n_cells = max(8, int(math.floor(math.sqrt(e.count()))))
    cents = pseudo_centroids(e, "v", "vec_id", n_cells=n_cells)
    pairs = cosine_near_dup_pairs(e, "vec_id", "v", threshold=0.4, centroids=cents)
    return pairs.select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


@query("minhash_near_dup", oracle=None, bench=True)
def q_minhash_near_dup(spark, sf_dir):
    """MinHash-LSH near-dup pairs (recall vs exact Jaccard checked in tests)."""
    d = t(spark, sf_dir, "documents")
    return minhash_near_dup(
        d, "doc_id", "text", n_hashes=32, bands=8, jaccard_threshold=0.3
    )


@query("simhash_near_dup", oracle=None)
def q_simhash_near_dup(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return simhash_near_dup(d, "doc_id", "text", max_hamming=12)


@query(
    "ann_ivf_topk",
    # Deterministic IVF (id-ordered seeds, cell_id/c_id tiebreaks) ->
    # the whole approximate search has an exact SQL oracle: centroid
    # seeding, 1-probe candidate / 4-probe query assignment, equi join
    # on cell_id, multi-probe dedup, per-query top-5.
    # Bench flag moved to ann_ivf_numpy_topk in round 8 (VERDICT r7
    # item 1): this HOF tier stays the exactly-SQL-oracled REFERENCE
    # (interpreted aggregate/zip_with folds, ~2x the numpy tier's
    # cost); the numpy tier with identical cells/probes/ranking is the
    # measured production path. Recall floor vs brute force:
    # tests/test_llm.py::test_ivf_recall pins recall@5 >= 0.5 at this
    # config (measured 0.664-0.772, docs/ANN_RECALL.md).
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cell_id, v AS c_vec FROM e ORDER BY vec_id LIMIT 16),
    cn AS (SELECT cell_id, c_vec, sqrt(list_dot_product(c_vec, c_vec)) AS cnorm FROM cents),
    cand_cell AS (
      SELECT c_id, cv, cell_id FROM (
        SELECT e.vec_id AS c_id, e.v AS cv, cn.cell_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, cn.c_vec) / cn.cnorm DESC,
                          cn.cell_id) AS rk
        FROM e CROSS JOIN cn) WHERE rk <= 1
    ),
    q_cell AS (
      SELECT q_id, qv, cell_id FROM (
        SELECT e.vec_id AS q_id, e.v AS qv, cn.cell_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, cn.c_vec) / cn.cnorm DESC,
                          cn.cell_id) AS rk
        FROM e CROSS JOIN cn WHERE e.vec_id < 10) WHERE rk <= 4
    ),
    scored AS (
      SELECT q_id, c_id, max(list_dot_product(qv, cv)
             / (sqrt(list_dot_product(qv, qv))
                * sqrt(list_dot_product(cv, cv)))) AS cos_sim
      FROM q_cell q JOIN cand_cell c USING (cell_id)
      WHERE q.q_id <> c.c_id
      GROUP BY q_id, c_id
    )
    SELECT q_id, c_id, round(cos_sim, 6) AS cos_sim, rank FROM (
      SELECT q_id, c_id, cos_sim,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos_sim DESC, c_id) AS rank
      FROM scored) WHERE rank <= 5
    """,
)
def q_ann_ivf_topk(spark, sf_dir):
    """IVF-bucketed approximate top-k (recall vs brute force in tests)."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    cents = pseudo_centroids(e, "v", "vec_id", n_cells=16)
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    cands = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    out = ivf_topk(queries, cands, cents, k=5, n_probe=4)
    return out.withColumn("cos_sim", F.round("cos_sim", 6))


def _lang_score_sql(lg: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lg])
    return (
        f"CAST(len(list_filter(toks, t -> list_contains([{words}], t)))"
        f" AS DOUBLE) / greatest(len(toks), 1) AS s_{lg}"
    )


# The stopword vote is deterministic and pure string/array work, so it
# has an exact SQL oracle built from the SAME STOPWORDS banks. Tie
# semantics mirror lang_id's running strict-max: the earliest language
# in bank order attaining the global max wins; all-zero scores -> 'und'.
_LANG_ID_ORACLE = f"""
WITH toks AS (
  SELECT lang, regexp_extract_all(lower(text), '\\S+') AS toks FROM documents
), scored AS (
  SELECT lang, {", ".join(_lang_score_sql(lg) for lg in STOPWORDS)} FROM toks
), pred AS (
  SELECT lang,
    CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) <= 0 THEN 'und'
         WHEN s_en >= greatest(s_de, s_fr, s_es, s_zh) THEN 'en'
         WHEN s_de >= greatest(s_fr, s_es, s_zh) THEN 'de'
         WHEN s_fr >= greatest(s_es, s_zh) THEN 'fr'
         WHEN s_es >= s_zh THEN 'es'
         ELSE 'zh' END AS pred_lang
  FROM scored
)
SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY lang, pred_lang
"""


@query(
    "doc_lang_id_heuristic",
    oracle=_LANG_ID_ORACLE,
)
def doc_lang_id_heuristic(spark, sf_dir):
    """Stopword-vote language ID (mechanism check; accuracy asserted on
    crafted samples in tests, not on the synthetic corpus labels)."""
    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    return (
        d.withColumn("pred_lang", lang_id(F.col("text")))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("multimodal_features", oracle=None)
def multimodal_features(spark, sf_dir):
    """Binary-column plumbing driven end-to-end: documents' text bytes
    stand in for media payloads (no codec libs in this container — the
    decode is a deterministic byte-statistics fake, the Spark plumbing
    is production-shaped: binary column + metadata struct + Arrow
    mapInPandas batches). Rows-only driver check; exact values asserted
    in tests/test_llm.py::test_multimodal_plumbing."""
    from ..llm.multimodal import attach_meta, image_features

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    media = attach_meta(d, "doc_id", "payload")
    return image_features(media)


@query("audio_wav_features", oracle=None)
def audio_wav_features(spark, sf_dir):
    """REAL audio decoding, zero external deps: deterministic sine-tone
    WAV payloads are synthesized per doc_id (stdlib wave writer inside
    mapInPandas), then decoded by the engine's WAV path (stdlib wave
    reader) — sample rate, channels, duration, RMS. Exact RMS/duration
    values are asserted in tests/test_llm.py; driver check is rows-only
    (binary payloads have no DuckDB analogue)."""
    import io
    import wave as _wave

    import numpy as np
    import pandas as pd

    from ..llm.multimodal import decode_audio

    def synth(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                sr = 8000
                freq = 200.0 + float(did % 10) * 50.0
                n = sr // 4  # 0.25 s
                ts = np.arange(n) / sr
                pcm = (np.sin(2 * np.pi * freq * ts) * 12000).astype("<i2")
                buf = io.BytesIO()
                with _wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(pcm.tobytes())
                rows.append((did, buf.getvalue()))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 200)
        .repartition(8)
        .mapInPandas(synth, "media_id long, payload binary")
    )
    out = decode_audio(d)
    return out.select(
        "media_id",
        "sample_rate",
        "n_channels",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
    )


@query("near_dup_clusters", oracle=None)
def near_dup_clusters(spark, sf_dir):
    """MinHash pairs -> connected-component clusters -> cluster sizes
    (the complete dedup flow: each cluster keeps its min-id canonical
    doc). Self-checked: component correctness in tests/test_llm.py."""
    from ..llm.dedup import cluster_near_dups, minhash_near_dup

    d = t(spark, sf_dir, "documents")
    pairs = minhash_near_dup(d, "doc_id", "text", jaccard_threshold=0.3)
    clusters = cluster_near_dups(pairs)
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


@query(
    "doc_pii_scan",
    # The synthetic corpus carries no PII, so the query plants
    # deterministic PII into a subset (same construction both sides) —
    # the detector/redactor run against real positives AND clean docs.
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text
                    || ' contact: user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-123-4567'
                  WHEN doc_id % 11 = 0 THEN text || ' ssn 123-45-6789 ip 10.0.0.1'
                  ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
           len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS n_ssn,
           len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4,
           (len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) > 0
            OR len(regexp_extract_all(t, '\\+?\\d{1,3}[-. ]\\d{3}[-. ]\\d{3,4}[-. ]?\\d{0,4}')) > 0
            OR len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) > 0
            OR len(regexp_extract_all(t, '\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b')) > 0
            OR len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) > 0)
             AS flagged,
           NOT contains(regexp_replace(regexp_replace(
                 t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'), '@example.com')
             AS emails_gone
    FROM d
    """,
)
def doc_pii_scan(spark, sf_dir):
    from ..llm.pii import PII_PATTERNS, has_pii

    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d)).withColumn(
        "t",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-123-4567"),
            ),
        )
        .when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.col("text"), F.lit(" ssn 123-45-6789 ip 10.0.0.1")),
        )
        .otherwise(F.col("text")),
    )
    n = lambda kind: F.size(
        F.regexp_extract_all(F.col("t"), F.lit(PII_PATTERNS[kind]), 0)
    )
    redacted2 = F.regexp_replace(
        F.regexp_replace(F.col("t"), PII_PATTERNS["email"], "<EMAIL>"),
        PII_PATTERNS["ssn"],
        "<SSN>",
    )
    return d.select(
        "doc_id",
        n("email").alias("n_email"),
        n("ssn").alias("n_ssn"),
        n("ipv4").alias("n_ipv4"),
        has_pii(F.col("t")).alias("flagged"),
        (~redacted2.contains("@example.com")).alias("emails_gone"),
    )


@query(
    "doc_repetition_signals",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        FROM documents
    ),
    wstats AS (
        SELECT doc_id, len(ws) AS nw, len(list_distinct(ws)) AS ndw FROM w
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS g
        FROM w WHERE len(ws) >= 2
    ),
    bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
    bstats AS (
        SELECT doc_id, max(c) AS top, sum(c) AS tot FROM bc GROUP BY doc_id
    )
    SELECT w.doc_id,
           round(1.0 - CAST(ndw AS DOUBLE) / nw, 6) AS dup_word_frac,
           round(CAST(top AS DOUBLE) / tot, 6) AS top_bigram_frac
    FROM wstats w JOIN bstats b ON w.doc_id = b.doc_id
    """,
)
def doc_repetition_signals(spark, sf_dir):
    """Gopher-style repetition filters (duplicate-word fraction, top
    bigram share) over the documents table — the standard pre-training
    corpus hygiene signals."""
    from ..llm.pipeline import repetition_signals

    return repetition_signals(t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "doc_decontaminate",
    oracle=r"""
    WITH grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS gs
        FROM (SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS ws
              FROM documents)
    ),
    ev AS (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 97 = 0),
    tr AS (SELECT doc_id, unnest(gs) AS g FROM grams WHERE doc_id % 97 <> 0)
    SELECT tr.doc_id, count(*) AS n_overlap
    FROM tr JOIN ev ON tr.g = ev.g
    GROUP BY tr.doc_id
    """,
)
def doc_decontaminate(spark, sf_dir):
    """GPT-3-style benchmark decontamination, n=3 word-grams at this
    corpus' tiny vocabulary (the classic recipe uses 13-grams on web
    text — n is a parameter):
    every doc_id % 97 == 0 doc stands in for the held-out benchmark;
    the rest is the training corpus. Eval n-grams are broadcast; the
    corpus streams through one explode + broadcast join."""
    from ..llm.pipeline import decontaminate

    d = t(spark, sf_dir, "documents")
    return decontaminate(
        d.filter(F.col("doc_id") % 97 != 0),
        d.filter(F.col("doc_id") % 97 == 0),
        "doc_id",
        "text",
        n=3,
    )


@query(
    "doc_stratified_sample",
    oracle="""
    WITH rated AS (
        SELECT *,
               CASE WHEN CAST(substr(source, 4) AS INT) < 5  THEN 1.0
                    WHEN CAST(substr(source, 4) AS INT) < 10 THEN 0.5
                    WHEN CAST(substr(source, 4) AS INT) < 15 THEN 0.25
                    ELSE 0.1 END AS rate
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           -- split 16-bit multiplicative hash == llm.pipeline.sample_keep
           -- (overflow-safe form of (doc_id * 2654435761) % 2^32)
           CAST(sum(CASE WHEN (((doc_id % 4294967296) // 65536 * 2654435761)
                               % 65536 * 65536
                               + (doc_id % 65536) * 2654435761) % 4294967296
                              < CAST(floor(rate * 4294967296) AS BIGINT)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM rated GROUP BY source
    """,
)
def doc_stratified_sample(spark, sf_dir):
    """Deterministic per-source downsampling for training-mix
    construction: multiplicative-hash keep-predicate (engine-portable
    integer math — no rand()), rates declared per stratum. Reported as
    per-source kept counts so the driver can hash-compare; the sampled
    rows themselves are `stratified_sample(df, id, rate)`."""
    from ..llm.pipeline import sample_keep

    d = t(spark, sf_dir, "documents")
    idx = F.substring("source", 4, 10).cast("int")
    rate = (
        F.when(idx < 5, 1.0)
        .when(idx < 10, 0.5)
        .when(idx < 15, 0.25)
        .otherwise(0.1)
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(sample_keep("doc_id", rate).cast("int"))
        .cast("bigint")
        .alias("n_sampled"),
    )


@query("doc_pack_sequences", oracle=None)
def doc_pack_sequences(spark, sf_dir):
    """Training sequence packing: documents first-fit-decreasing packed
    into 256-token bins, sharded by id hash (packing is sequential per
    bin set, so shards pack independently — the scale compromise).
    Non-SQL-expressible (stateful greedy loop); invariants (every doc
    packed exactly once, bin sums within budget, determinism) are
    pinned in tests/test_llm.py."""
    from ..llm.pipeline import pack_sequences

    d = t(spark, sf_dir, "documents")
    counts = d.select(
        "doc_id", F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_tok")
    )
    return pack_sequences(counts, "doc_id", "n_tok", budget=256, n_shards=8)


@query(
    "doc_unigram_logprob",
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
        FROM documents
    ),
    vocab AS (SELECT word, count(*) AS c FROM w GROUP BY word),
    tot AS (SELECT sum(c) AS n FROM vocab)
    SELECT w.doc_id,
           count(*) AS n_tokens,
           round(avg(ln(CAST(c AS DOUBLE)) - ln(CAST(n AS DOUBLE))), 6)
               AS mean_logprob
    FROM w JOIN vocab USING (word) CROSS JOIN tot
    GROUP BY w.doc_id
    """,
)
def doc_unigram_logprob(spark, sf_dir):
    """CCNet-style corpus-LM quality proxy: mean unigram log-prob per
    doc under the corpus' own unigram distribution (the vocabulary
    count table is broadcast; docs stream through one explode)."""
    from ..llm.pipeline import unigram_logprob

    return unigram_logprob(t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "doc_repeated_ngram_frac",
    oracle=r"""
    WITH g AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(ws) - 1),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS gram
        FROM (SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\s+') AS ws
              FROM documents)
    ),
    gc AS (SELECT gram, count(*) AS docs FROM g GROUP BY gram)
    SELECT g.doc_id,
           count(*) AS n_grams,
           round(CAST(sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS repeated_frac
    FROM g JOIN gc USING (gram)
    GROUP BY g.doc_id
    """,
)
def doc_repeated_ngram_frac(spark, sf_dir):
    """RefinedWeb-style span-duplication fraction (3-grams at this
    corpus' doc length): share of each doc's distinct n-grams that
    recur in other documents — catches templated spans that doc-level
    dedup misses."""
    from ..llm.pipeline import repeated_ngram_fraction

    return repeated_ngram_fraction(
        t(spark, sf_dir, "documents"), "doc_id", "text", n=3
    )


@query(
    "doc_filter_pipeline",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, source,
               regexp_split_to_array(lower(trim(text)), '\s+') AS ws
        FROM documents
    ),
    tok AS (SELECT doc_id, unnest(ws) AS word FROM w),
    vocab AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
    tot AS (SELECT sum(c) AS n FROM vocab),
    lp AS (
        SELECT tok.doc_id,
               count(*) AS nt,
               avg(ln(CAST(c AS DOUBLE)) - ln(CAST(n AS DOUBLE))) AS mlp
        FROM tok JOIN vocab USING (word) CROSS JOIN tot
        GROUP BY tok.doc_id
    ),
    rep AS (
        SELECT doc_id,
               1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS dwf
        FROM w
    )
    SELECT w.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN nt BETWEEN 20 AND 90
                          AND dwf < 0.6
                          AND mlp > -3.42
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM w JOIN lp USING (doc_id) JOIN rep USING (doc_id)
    GROUP BY w.source
    """,
)
def doc_filter_pipeline(spark, sf_dir):
    """End-to-end corpus filter: token-count band + duplicate-word
    fraction + corpus-LM log-prob combined into a keep/drop decision,
    reported as per-source keep counts. The composition the hygiene
    ops exist for — each signal is one shuffle-light branch over the
    same scan, joined on doc_id; at 100 TB this is a single pipeline
    run, not three passes over the corpus."""
    from ..llm.pipeline import unigram_logprob
    from ..ops import data_sized_partitions

    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d), "doc_id")
    lp = unigram_logprob(d, "doc_id", "text")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    rep = d.select(
        "doc_id",
        "source",
        (1.0 - F.size(F.array_distinct(toks)) / F.size(toks)).alias("dwf"),
    )
    keep = (
        (F.col("n_tokens").between(20, 90))
        & (F.col("dwf") < 0.6)
        & (F.col("mean_logprob_raw") > -3.42)
    )
    # unigram_logprob rounds for its own oracle; recompute raw here via
    # its column, precise enough at 6dp for a strict > threshold away
    # from any rounding boundary
    scored = rep.join(
        lp.select(
            "doc_id", "n_tokens", F.col("mean_logprob").alias("mean_logprob_raw")
        ),
        "doc_id",
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(keep.cast("int")).cast("bigint").alias("n_kept"),
    )


@query("emb_pca_project", oracle=None)  # eigensolve: validated by pytest invariants
def emb_pca_project(spark, sf_dir):
    """PCA-reduce embeddings 64 -> 8 dims (llm.pca): sufficient
    statistics via Arrow-batched matmuls, driver eigensolve on the d x d
    moment matrix (O(d^2) fetch, row-count-independent), projection as
    literal-array dot products. Invariants (orthonormal components,
    descending explained variance, numpy-reference equality) are pinned
    in tests/test_pca.py."""
    from ..llm.pca import pca_fit, pca_project

    emb = t(spark, sf_dir, "embeddings")
    if emb.isEmpty():
        # no vectors -> no moments to eigensolve; the projection of an
        # empty corpus is the empty relation
        return spark.createDataFrame(
            [],
            "vec_id long, label int, "
            + ", ".join(f"p{j} double" for j in range(8)),
        )
    model = pca_fit(emb, "embedding", k=8)
    out = pca_project(emb, model, "embedding")
    return out.select(
        "vec_id",
        "label",
        *[F.round(F.col(f"p{j}"), 6).alias(f"p{j}") for j in range(8)],
    )


@query("doc_token_heavy_hitters_sketch", oracle=None)  # partitioning-dependent counts
def doc_token_heavy_hitters_sketch(spark, sf_dir):
    """Mergeable Misra-Gries frequent-tokens summary (ops.
    approx_heavy_hitters, k=200) over the exploded corpus vocabulary —
    the bounded-memory counterpart of the exact doc_token_heavy_hitters
    (which shuffles every distinct token). Per-partition state is 200
    counters regardless of vocabulary size; lower bounds are within
    N/(k+1) of true frequency and every token above that threshold is
    guaranteed present (bounds pinned in tests/test_heavy_hitters.py).
    Output depends on partition boundaries -> rows-only driver check."""
    from ..ops import approx_heavy_hitters

    toks = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    res = approx_heavy_hitters(toks, "tok", k=200)
    return (
        res.orderBy(F.col("count_lb").desc(), "item")
        .limit(20)
        .select("item", "count_lb", "n_total", "err_bound")
    )


@query(
    "doc_pretokenize_count",
    # GPT-2-style regex pre-tokenization counts (the token-budget
    # estimator that runs before any real BPE): contractions, letter
    # runs, digit runs, punctuation runs, each with its optional
    # leading space. ASCII-explicit classes so Java regex (Spark) and
    # RE2 (DuckDB) agree byte-for-byte.
    oracle=r"""
    WITH c AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
                 '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+'))
               AS n_bpe,
             len(regexp_extract_all(text, '\S+')) AS n_ws
      FROM documents
    )
    SELECT doc_id, CAST(n_bpe AS BIGINT) AS n_bpe,
           CAST(n_ws AS BIGINT) AS n_ws,
           round(n_bpe::DOUBLE / nullif(n_ws, 0), 6) AS bpe_per_word
    FROM c
    """,
)
def doc_pretokenize_count(spark, sf_dir):
    """Pre-tokenizer token counting — the cheap, model-free token
    budget estimate every corpus plan starts from: a GPT-2-style
    pre-tokenization regex (contraction suffixes, space-prefixed
    letter/digit/punctuation runs) counted per document next to the
    whitespace word count, plus tokens-per-word (the fertility proxy;
    ~1.3 for English-like text, higher means tokenizer-hostile
    content). Pure regexp_extract_all + size — one codegen'd scan, no
    explode, no shuffle beyond the scan itself; the regex is
    ASCII-explicit so Spark's Java regex and DuckDB's RE2 produce
    identical token boundaries (verified in parity)."""
    d = t(spark, sf_dir, "documents")
    bpe_re = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"
    c = d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(bpe_re), 0))
        .cast("bigint")
        .alias("n_bpe"),
        F.size(F.regexp_extract_all("text", F.lit(r"\S+"), 0))
        .cast("bigint")
        .alias("n_ws"),
    )
    return c.select(
        "doc_id",
        "n_bpe",
        "n_ws",
        F.round(
            F.col("n_bpe") / F.nullif(F.col("n_ws"), F.lit(0)), 6
        ).alias("bpe_per_word"),
    )
