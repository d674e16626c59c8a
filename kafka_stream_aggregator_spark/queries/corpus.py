"""Corpus-construction operators, part 2: cross-document chunk dedup,
training-mix temperature weights, deterministic global shuffle/sharding,
near-dup clustering with an exact SQL oracle, and the PQ (product
quantization) ANN tier beside the IVF one.

Like every other registry module, each query has a DuckDB oracle unless
the semantics are genuinely not SQL-expressible. Cross-engine hashing
uses md5 (identical hex in Spark and DuckDB); the in-engine scale path
would use xxhash64 (8-byte, cheaper) exactly as llm.dedup does — the
md5 choice here is what makes the oracle exact, and the plan shape
(hash -> groupBy -> keep-first) is identical either way.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..ops import data_sized_partitions
from .base import query, t

CHUNK = 20  # tokens per dedup chunk (C4-style paragraph analogue)


@query(
    "doc_chunk_dedup",
    # Cross-document chunk-level exact dedup (the C4/CCNet paragraph
    # dedup analogue; the corpus has no newlines, so "paragraph" =
    # fixed 20-token window). Keep-first = smallest (doc_id, chunk_idx).
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS tk
      FROM documents
    ), ch AS (
      SELECT doc_id, g AS chunk_idx,
             md5(array_to_string(tk[(g*{CHUNK}+1):(g*{CHUNK}+{CHUNK})], ' ')) AS h
      FROM tk, unnest(range(0, CAST(ceil(len(tk) / {CHUNK}.0) AS BIGINT))) AS u(g)
    ), fst AS (
      SELECT h, min(doc_id * 1000000 + chunk_idx) AS first_key
      FROM ch GROUP BY h
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN doc_id * 1000000 + chunk_idx = first_key
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN doc_id * 1000000 + chunk_idx = first_key
                          THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS kept_frac
    FROM ch JOIN fst USING (h)
    GROUP BY doc_id
    """,
)
def doc_chunk_dedup(spark, sf_dir):
    """Chunk-level exact dedup across the whole corpus: split each doc
    into fixed 20-token chunks, hash each chunk, keep only the globally
    first occurrence (min (doc_id, chunk_idx)) of every distinct chunk,
    report per-doc survival. One explode + one groupBy on the chunk
    hash + one join back — two shuffles total, both on the hash, no
    driver-side state; at 100 TB the hash groupBy is the same plan
    exact_dedup uses, just at chunk granularity."""
    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    # regexp_extract_all('\S+'), not split('\s+'): split yields [""]
    # for empty/whitespace-only text (a phantom chunk the DuckDB oracle
    # would not produce); extract-all yields [] on both engines
    toks = F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
    )
    n_chunks = F.ceil(F.size(toks) / F.lit(CHUNK)).cast("int")
    # guard n_chunks == 0: sequence(0, -1) DESCENDS in Spark, which
    # would fabricate two phantom chunks for a token-less document
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda g: F.struct(
                g.cast("bigint").alias("chunk_idx"),
                F.md5(
                    F.array_join(F.slice(toks, g * CHUNK + 1, CHUNK), " ")
                ).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk_idx:bigint,h:string>>"))
    ch = (
        d.select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.h").alias("h"))
    )
    occ_key = F.col("doc_id") * 1000000 + F.col("chunk_idx")
    fst = ch.groupBy("h").agg(F.min(occ_key).alias("first_key"))
    return (
        ch.join(fst, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((occ_key == F.col("first_key")).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
            F.round(
                F.sum((occ_key == F.col("first_key")).cast("int"))
                / F.count(F.lit(1)),
                6,
            ).alias("kept_frac"),
        )
    )


@query(
    "corpus_mix_weights",
    # Temperature-scaled domain mixing (alpha = 0.5, the multilingual-
    # LM up/down-sampling rule): w_i = p_i^a / sum(p_j^a). ratio > 1
    # means the domain is upsampled relative to natural frequency.
    oracle="""
    WITH dom AS (
      SELECT lang, source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY lang, source
    ), p AS (
      SELECT *, n_docs::DOUBLE / sum(n_docs) OVER () AS p_nat,
             pow(n_docs::DOUBLE / sum(n_docs) OVER (), 0.5) AS w_raw
      FROM dom
    )
    SELECT lang, source, n_docs, sum_chars,
           round(p_nat, 6) AS p_nat,
           round(w_raw / sum(w_raw) OVER (), 6) AS mix_weight,
           round((w_raw / sum(w_raw) OVER ()) / p_nat, 6) AS resample_ratio
    FROM p
    """,
)
def corpus_mix_weights(spark, sf_dir):
    """Training-mix construction: per-(lang, source) domain statistics
    -> temperature-resampled mixing weights (alpha=0.5). The global
    windows run over the POST-aggregation domain table (|langs| x
    |sources| rows — tiny at any corpus scale), so the single-partition
    window is bounded regardless of input size; the only data-sized
    shuffle is the groupBy."""
    d = t(spark, sf_dir, "documents")
    dom = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    wall = W.partitionBy()
    p_nat = F.col("n_docs").cast("double") / F.sum("n_docs").over(wall)
    dom = dom.withColumn("p_nat", p_nat).withColumn(
        "w_raw", F.pow(F.col("p_nat"), 0.5)
    )
    mix = F.col("w_raw") / F.sum("w_raw").over(wall)
    return dom.select(
        "lang",
        "source",
        "n_docs",
        "sum_chars",
        F.round("p_nat", 6).alias("p_nat"),
        F.round(mix, 6).alias("mix_weight"),
        F.round(mix / F.col("p_nat"), 6).alias("resample_ratio"),
    )


@query(
    "doc_global_shuffle",
    # Deterministic global shuffle for training-data ordering: order by
    # md5(doc_id), round-robin into 8 shards. Engine-portable (md5 hex
    # is identical everywhere), seedless, and reproducible run-to-run —
    # the property a training pipeline needs from its shuffle.
    oracle="""
    WITH ordered AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    )
    SELECT CAST((rn - 1) % 8 AS INT) AS shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM ordered GROUP BY 1
    """,
)
def doc_global_shuffle(spark, sf_dir):
    """Deterministic corpus shuffle + sharding: rank docs by
    md5(doc_id) (uniform pseudo-random but reproducible and
    cross-engine), deal round-robin into 8 shards, report per-shard
    stats. Round-robin on the hash rank, unlike `hash % shards`
    directly, guarantees exactly balanced shards (counts differ by at
    most 1).

    The global rank is computed WITHOUT a single-partition window —
    ops.distributed_global_rank (the shared two-phase ranking), with
    the first hash byte as the supplied bucket: 256 uniform groups,
    each windowed in parallel, plus the broadcast cumulative count of
    lexicographically-smaller prefixes. Ordering by (prefix, h, id) ==
    ordering by (h, id) because the prefix IS the head of h. Scales to
    any corpus size: the offsets table is always 256 rows."""
    from ..ops import distributed_global_rank

    d = t(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    base = d.select("doc_id", "n_chars", h.alias("h"))
    return (
        distributed_global_rank(
            base, ["h", "doc_id"], bucket=F.substring("h", 1, 2), rank_col="rn"
        )
        .withColumn("shard", ((F.col("rn") - 1) % 8).cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "doc_tfidf_topterms",
    # Corpus-wide TF-IDF with smoothed idf = ln((N+1)/(df+1)) + 1,
    # top-3 terms per doc (ties -> lexicographically smaller term).
    oracle="""
    WITH tk AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(trim(text)), '\\S+'))
               AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term,
             tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, round(tfidf, 6) AS tfidf, rank FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored) WHERE rank <= 3
    """,
)
def doc_tfidf_topterms(spark, sf_dir):
    """Per-document top TF-IDF terms — the classic corpus-relevance
    signal (keyword extraction / doc routing in a training pipeline).
    Plan: one explode -> groupBy(doc, term) with map-side partial
    counts, document frequencies as a second groupBy on term (vocab-
    sized), corpus size as a broadcast 1-row aggregate, rank windowed
    per doc. Nothing collects; the df join shuffles on term, which is
    the natural key. At 100 TB the vocab table is the small side —
    broadcast if it fits, shuffle-join otherwise (AQE decides)."""
    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    # extract-all, not split: no phantom "" term on empty text (matches
    # the oracle's regexp_extract_all — see doc_chunk_dedup)
    term = F.explode(
        F.regexp_extract_all(F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0)
    ).alias("term")
    tf = (
        d.select("doc_id", term)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                    + 1.0
                )
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", F.round("tfidf", 6).alias("tfidf"), "rank")
    )


@query(
    "ann_pq_topk",
    # Deterministic PQ (m=8 subspaces x 8 dims, k=16 codewords seeded
    # from vec_id < 16, argmin/rank tiebreaks on ids) -> the whole
    # compressed-domain search has an exact SQL oracle: encode, build
    # the per-query LUT, sum m selected entries, per-query top-5.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (
      SELECT g AS sub_id, vec_id AS cw_id, v[(g*8+1):(g*8+8)] AS cw_vec
      FROM e, unnest(range(0, 8)) AS u(g) WHERE vec_id < 16
    ),
    sv AS (
      SELECT vec_id AS c_id, g AS sub_id, v[(g*8+1):(g*8+8)] AS sv
      FROM e, unnest(range(0, 8)) AS u(g)
    ),
    codes AS (
      SELECT c_id, sub_id, cw_id FROM (
        SELECT c_id, sv.sub_id AS sub_id, cw_id,
               row_number() OVER (PARTITION BY c_id, sv.sub_id ORDER BY
                 list_dot_product(sv, sv) - 2*list_dot_product(sv, cw_vec)
                   + list_dot_product(cw_vec, cw_vec),
                 cw_id) AS rk
        FROM sv JOIN cb ON sv.sub_id = cb.sub_id)
      WHERE rk = 1
    ),
    lut AS (
      SELECT q.vec_id AS q_id, cb.sub_id, cb.cw_id,
             list_dot_product(q.v[(cb.sub_id*8+1):(cb.sub_id*8+8)], cw_vec)
               AS pdot
      FROM e q CROSS JOIN cb WHERE q.vec_id < 10
    ),
    scored AS (
      SELECT q_id, c_id,
             list_reduce(list(pdot ORDER BY sub_id),
                         (a, b) -> a + b) AS pq_score
      FROM codes JOIN lut USING (sub_id, cw_id)
      WHERE c_id <> q_id
      GROUP BY q_id, c_id
    )
    SELECT q_id, c_id, round(pq_score, 6) AS pq_score, rank FROM (
      SELECT q_id, c_id, pq_score,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY pq_score DESC, c_id) AS rank
      FROM scored) WHERE rank <= 5
    """,
)
def q_ann_pq_topk(spark, sf_dir):
    """PQ-compressed approximate top-k (ADC scoring): the third ANN
    tier beside brute force (oracle baseline) and IVF (cell-blocked).
    Recall vs brute force is measured in tests/test_llm.py; this
    registry entry pins the full encode -> LUT -> sum -> rank flow
    against the exact SQL oracle."""
    from ..llm.pq import pq_codebook, pq_encode, pq_topk
    from ..llm.similarity import as_double

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    cb = pq_codebook(e, "vec_id", "v", m=8, k=16, dim=64)
    codes = pq_encode(e, cb, "vec_id", "v", m=8, dim=64).select(
        F.col("vec_id").alias("c_id"), "sub_id", "cw_id"
    )
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    out = pq_topk(queries, codes, cb, m=8, dim=64, k=5)
    return out.withColumn("pq_score", F.round("pq_score", 6))


@query(
    "ann_pq_rerank_topk",
    # The production PQ flow end-to-end with an exact oracle: ADC
    # candidate generation (top-20 in the compressed domain) -> exact
    # cosine rerank of only those candidates -> top-5.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (
      SELECT g AS sub_id, vec_id AS cw_id, v[(g*8+1):(g*8+8)] AS cw_vec
      FROM e, unnest(range(0, 8)) AS u(g) WHERE vec_id < 16
    ),
    sv AS (
      SELECT vec_id AS c_id, g AS sub_id, v[(g*8+1):(g*8+8)] AS sv
      FROM e, unnest(range(0, 8)) AS u(g)
    ),
    codes AS (
      SELECT c_id, sub_id, cw_id FROM (
        SELECT c_id, sv.sub_id AS sub_id, cw_id,
               row_number() OVER (PARTITION BY c_id, sv.sub_id ORDER BY
                 list_dot_product(sv, sv) - 2*list_dot_product(sv, cw_vec)
                   + list_dot_product(cw_vec, cw_vec),
                 cw_id) AS rk
        FROM sv JOIN cb ON sv.sub_id = cb.sub_id)
      WHERE rk = 1
    ),
    lut AS (
      SELECT q.vec_id AS q_id, cb.sub_id, cb.cw_id,
             list_dot_product(q.v[(cb.sub_id*8+1):(cb.sub_id*8+8)], cw_vec)
               AS pdot
      FROM e q CROSS JOIN cb WHERE q.vec_id < 10
    ),
    adc AS (
      SELECT q_id, c_id, sum(pdot) AS pq_score
      FROM codes JOIN lut USING (sub_id, cw_id)
      WHERE c_id <> q_id
      GROUP BY q_id, c_id
    ),
    cand AS (
      SELECT q_id, c_id FROM (
        SELECT q_id, c_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY pq_score DESC, c_id) AS rk
        FROM adc) WHERE rk <= 20
    ),
    rescored AS (
      SELECT q_id, c_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cos_sim
      FROM cand JOIN e q ON cand.q_id = q.vec_id
                JOIN e c ON cand.c_id = c.vec_id
    )
    SELECT q_id, c_id, round(cos_sim, 6) AS cos_sim, rank FROM (
      SELECT q_id, c_id, cos_sim,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY cos_sim DESC, c_id) AS rank
      FROM rescored) WHERE rank <= 5
    """,
)
def q_ann_pq_rerank_topk(spark, sf_dir):
    """PQ candidate generation + exact-cosine rerank (the production
    ANN shape at 100 TB: the corpus-wide scan stays in the compressed
    domain; only Q x 20 exact vectors are touched)."""
    from ..llm.pq import pq_codebook, pq_encode, pq_topk_rerank
    from ..llm.similarity import as_double

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    cb = pq_codebook(e, "vec_id", "v", m=8, k=16, dim=64)
    codes = pq_encode(e, cb, "vec_id", "v", m=8, dim=64).select(
        F.col("vec_id").alias("c_id"), "sub_id", "cw_id"
    )
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    cands = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    out = pq_topk_rerank(
        queries, codes, cb, cands, m=8, dim=64, k=5, n_candidates=20
    )
    return out.withColumn("cos_sim", F.round("cos_sim", 6))


@query(
    "jaccard_dup_clusters",
    # The full dedup flow WITH an exact oracle: exact 3-gram Jaccard
    # pairs (threshold 0.02, doc_id < 150) -> connected components ->
    # cluster sizes. The SQL side computes components as the min
    # reachable node via a recursive CTE (transitive closure over the
    # undirected edge set); the Spark side via iterative min-label
    # propagation — same fixpoint, so the driver can hash-compare what
    # near_dup_clusters (MinHash pairs, rows-only) cannot.
    oracle="""
    WITH RECURSIVE dt AS (
      SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS tk
      FROM documents WHERE doc_id < 150
    ), sh0 AS (
      SELECT doc_id, array_to_string(tk[g:g+2], ' ') AS sh
      FROM dt, unnest(range(1, greatest(len(tk) - 2, 0) + 1)) AS u(g)
    ), sh AS (
      SELECT DISTINCT doc_id, sh FROM sh0
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON id_a = sa.doc_id
                 JOIN sizes sb ON id_b = sb.doc_id
      WHERE n_inter::DOUBLE / (sa.n_sh + sb.n_sh - n_inter) >= 0.02
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT src AS id, src AS lbl FROM edges
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id
    ), labeled AS (
      SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id
    )
    SELECT cluster_id, count(*) AS n_docs
    FROM labeled GROUP BY cluster_id
    """,
)
def jaccard_dup_clusters(spark, sf_dir):
    """Near-dup clustering with an exact cross-engine oracle: exact
    n-gram-Jaccard pairs feed cluster_near_dups (iterative min-label
    propagation, O(component diameter) joins). The pair join blocks on
    8-byte shingle hashes (same Jaccard, ~10x smaller shuffle than
    strings); components are computed distributed — nothing collects."""
    from ..llm.dedup import cluster_near_dups

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .repartition(data_sized_partitions(t(spark, sf_dir, "documents")))
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    shingles = F.when(
        F.size(toks) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 2),
                lambda i: F.array_join(F.slice(toks, i, 3), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", F.explode(shingles).alias("s")).select(
        "doc_id", F.xxhash64("s").alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = (
        a.join(b, (a.sh_a == b.sh_b) & (a.id_a < b.id_b))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnsRenamed({"doc_id": "id_a", "n_sh": "n_a"})
    sb = sizes.withColumnsRenamed({"doc_id": "id_b", "n_sh": "n_b"})
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    pairs = (
        inter.join(sa, "id_a").join(sb, "id_b").filter(jac >= 0.02)
        .select("id_a", "id_b")
    )
    clusters = cluster_near_dups(pairs)
    return clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query(
    "doc_char_entropy",
    # Character-level Shannon entropy (bits/char) over a bounded prefix —
    # the classic gibberish/boilerplate screen: random bytes score ~high,
    # "aaaa..." scores ~0, natural language sits ~4-4.5. DuckDB's
    # entropy() aggregate is log2-based, matching the Spark-side
    # H = log2(N) - (1/N)*sum(c_i*log2(c_i)) identity.
    oracle="""
    SELECT doc_id, round(entropy(ch), 6) AS char_entropy
    FROM (
      SELECT doc_id, unnest(string_split_regex(substr(text, 1, 2048), '')) AS ch
      FROM documents WHERE doc_id < 500
    ) WHERE ch <> ''
    GROUP BY doc_id
    """,
)
def doc_char_entropy(spark, sf_dir):
    """Per-document character entropy, computed on the first 2 KB only.

    The prefix bound is the scale contract: the explode factor is capped
    at 2048 rows/doc regardless of document length, so the op costs the
    same per document at 100 TB as at test SF (a quality screen does not
    need the whole document — the standard practice in corpus pipelines).
    Two-level aggregate: (doc, char) counts collapse map-side before the
    per-doc reduce; H = log2(N) - (1/N)*sum(c*log2 c) avoids materializing
    per-char probabilities.
    """
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 500)
        .select("doc_id", F.substring("text", 1, 2048).alias("pfx"))
        .select("doc_id", F.explode(F.split("pfx", "")).alias("ch"))
        .filter(F.col("ch") != "")
    )
    counts = d.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log2("c")).alias("clog"),
        )
        .select(
            "doc_id",
            F.round(F.log2("n") - F.col("clog") / F.col("n"), 6).alias(
                "char_entropy"
            ),
        )
    )


@query(
    "doc_bigram_logprob",
    # (1.0 - 0.7) is written as the SUBTRACTION on both sides so the
    # interpolation weight is the identical IEEE double (0.30000...04),
    # not the closer-to-3/10 literal 0.3.
    oracle=r"""
    WITH ws AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS ws
      FROM documents
    ), w AS (
      SELECT doc_id, unnest(ws) AS w FROM ws
    ), uc AS (
      SELECT w, count(*) AS c FROM w GROUP BY w
    ), tot AS (
      SELECT sum(c) AS n FROM uc
    ), bi AS (
      SELECT doc_id, ws[i] AS p, ws[i+1] AS w
      FROM ws, unnest(range(1, len(ws))) AS u(i)
      WHERE len(ws) >= 2
    ), bc AS (
      SELECT p, w, count(*) AS cb FROM bi GROUP BY p, w
    )
    SELECT bi.doc_id,
           count(*) AS n_bigrams,
           round(avg(ln(0.7 * bc.cb / cp.c + (1.0 - 0.7) * cw.c / tot.n)), 6)
             AS mean_logprob
    FROM bi
    JOIN bc ON bc.p = bi.p AND bc.w = bi.w
    JOIN uc cw ON cw.w = bi.w
    JOIN uc cp ON cp.w = bi.p
    CROSS JOIN tot
    GROUP BY bi.doc_id
    """,
)
def doc_bigram_logprob(spark, sf_dir):
    """Interpolated bigram corpus-LM scoring (llm.pipeline
    bigram_logprob): mean ln(0.7*P(w|prev) + 0.3*P(w)) per doc under
    the corpus' own counts — the coherence tier above
    doc_unigram_logprob. Unigram table broadcast, bigram counts joined
    on the hash pair (shuffle join at web scale, AQE-downgradable)."""
    from ..llm.pipeline import bigram_logprob

    return bigram_logprob(t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "doc_normalize_text",
    # DuckDB nfc_normalize implements the same Unicode NFC standard as
    # Python's unicodedata -- the oracle runs the identical cleanup
    # chain and must agree on the md5 of every normalized doc.
    oracle=r"""
    SELECT doc_id,
           md5(trim(regexp_replace(
                 regexp_replace(lower(nfc_normalize(text)),
                                '[\x00-\x1f\x7f]', ' ', 'g'),
                 '\s+', ' ', 'g'))) AS norm_hash,
           length(trim(regexp_replace(
                 regexp_replace(lower(nfc_normalize(text)),
                                '[\x00-\x1f\x7f]', ' ', 'g'),
                 '\s+', ' ', 'g'))) AS n_chars_norm
    FROM documents
    """,
)
def doc_normalize_text(spark, sf_dir):
    """Unicode-NFC text normalization (llm.text.nfc_normalize_udf):
    NFC + lowercase + control-char strip + whitespace collapse, the
    canonical cleanup before content-hash dedup. NFC is the one step
    with no Spark built-in, so it runs as an Arrow-batched pandas UDF;
    the unicode behavior itself is pinned against DuckDB's
    nfc_normalize both here (full-corpus md5 parity) and on accented
    fixtures in tests/test_corpus.py."""
    from ..llm.text import nfc_normalize_udf

    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    norm = nfc_normalize_udf()(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).alias("n_chars_norm"),
    )


@query(
    "emb_matryoshka_recall",
    # Truncate-and-renormalize retrieval quality curve: top-10 by
    # cosine of the d-dim prefix vs the full 64-dim ranking. Exact
    # oracle: same slices, same fold order, same tiebreaks.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (SELECT unnest([64, 32, 16]) AS d),
    scored AS (
      SELECT d, q.vec_id AS q_id, c.vec_id AS c_id,
             list_dot_product(q.v[1:d], c.v[1:d])
               / (sqrt(list_dot_product(q.v[1:d], q.v[1:d]))
                  * sqrt(list_dot_product(c.v[1:d], c.v[1:d]))) AS cs
      FROM e q CROSS JOIN e c CROSS JOIN dims
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY d, q_id
                                   ORDER BY cs DESC, c_id) AS rk
      FROM scored
    ), topk AS (
      SELECT d, q_id, c_id FROM ranked WHERE rk <= 10
    ), fullset AS (
      SELECT q_id, c_id FROM topk WHERE d = 64
    )
    SELECT t.d AS trunc_dim, t.q_id,
           round(CAST(count(f.c_id) AS DOUBLE) / 10, 6) AS recall_at_10
    FROM topk t LEFT JOIN fullset f
      ON f.q_id = t.q_id AND f.c_id = t.c_id
    GROUP BY t.d, t.q_id
    """,
)
def emb_matryoshka_recall(spark, sf_dir):
    """Matryoshka-style truncation quality curve: retrieval recall@10
    when embeddings are truncated to their first 32 / 16 dimensions
    (cosine renormalizes implicitly) against the full 64-dim ranking.
    The production question this answers: how many prefix dims does the
    ANN tier need before exact rerank — shorter vectors cut the
    dominant cost (bytes shuffled + dot-product flops) linearly.

    Plan: one embeddings scan, the slice is a zero-copy array prefix,
    brute-force tier reuses llm.similarity (broadcast query side,
    hoisted norms); recall join is per-query top-10 sets — tiny."""
    from ..llm.similarity import as_double, brute_force_topk

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    tops = None
    for d in (64, 32, 16):
        q = e.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("q_id"), F.slice("v", 1, d).alias("q_vec")
        )
        c = e.select(F.col("vec_id").alias("c_id"), F.slice("v", 1, d).alias("c_vec"))
        tk = brute_force_topk(q, c, k=10).select(
            F.lit(d).alias("trunc_dim"), "q_id", "c_id"
        )
        tops = tk if tops is None else tops.unionByName(tk)
    fullset = (
        tops.filter(F.col("trunc_dim") == 64)
        .select(F.col("q_id").alias("fq"), F.col("c_id").alias("fc"))
        .withColumn("__hit", F.lit(1))
    )
    return (
        tops.join(
            fullset,
            (F.col("q_id") == F.col("fq")) & (F.col("c_id") == F.col("fc")),
            "left",
        )
        .groupBy("trunc_dim", "q_id")
        .agg(F.round(F.count("__hit").cast("double") / 10, 6).alias("recall_at_10"))
    )


@query(
    "emb_semantic_decontaminate",
    # Semantic decontamination: train vectors too close (cosine) to any
    # eval vector are contaminated. The eval set is label-defined
    # (label = 0), small, and broadcast; max-sim + verdict per train
    # vector.
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    ev AS (SELECT vec_id, v FROM e WHERE label = 0),
    tr AS (SELECT vec_id, v FROM e WHERE label <> 0),
    sims AS (
      SELECT tr.vec_id,
             max(list_dot_product(tr.v, ev.v)
                 / (sqrt(list_dot_product(tr.v, tr.v))
                    * sqrt(list_dot_product(ev.v, ev.v)))) AS max_sim
      FROM tr CROSS JOIN ev
      GROUP BY tr.vec_id
    )
    SELECT vec_id, round(max_sim, 6) AS max_eval_sim,
           max_sim >= 0.35 AS contaminated
    FROM sims
    """,
)
def emb_semantic_decontaminate(spark, sf_dir):
    """Semantic decontamination — the embedding-space tier of the
    decontamination family (n-gram overlap: doc_decontaminate; set
    membership: sketch_bloom_decontaminate): a training vector whose
    cosine to ANY eval-set vector exceeds the threshold is flagged,
    catching paraphrased leakage that token overlap misses.

    Plan: eval side is small by construction and broadcast (norms
    hoisted once per vector); train side streams through one scan with
    a per-row max over the broadcast set — no shuffle of the training
    corpus at all beyond its own scan. At web scale the same query
    runs against the IVF cells of the eval set (emb_cosine_near_dup_ivf
    machinery) to cut the per-row candidate count."""
    from ..llm.similarity import as_double, dot, norm

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("v")
    )
    ev = (
        e.filter(F.col("label") == 0)
        .select(F.col("vec_id").alias("e_id"), F.col("v").alias("ev"))
        .withColumn("e_norm", norm(F.col("ev")))
    )
    tr = e.filter(F.col("label") != 0).withColumn("t_norm", norm(F.col("v")))
    # parallelism guard (sf5 catch r8): a small embeddings table is ONE
    # parquet split, so the |tr| x |ev| interpreted-HOF scoring would
    # run in ONE task (measured: 40M dots single-core at sf5). The
    # per-pair work is huge relative to row bytes, so fan the train
    # side out when the scan under-partitions; at real scale the scan
    # is already multi-split and this branch never fires (repartition
    # of a 100 TB train side would be the bug, not the fix).
    par = tr.sparkSession.sparkContext.defaultParallelism
    if tr.rdd.getNumPartitions() < par:
        tr = tr.repartition(par)
    sims = (
        tr.crossJoin(F.broadcast(ev))
        .select(
            "vec_id",
            (dot(F.col("v"), F.col("ev")) / (F.col("t_norm") * F.col("e_norm"))).alias(
                "s"
            ),
        )
        .groupBy("vec_id")
        .agg(F.max("s").alias("max_sim"))
    )
    return sims.select(
        "vec_id",
        F.round("max_sim", 6).alias("max_eval_sim"),
        (F.col("max_sim") >= 0.35).alias("contaminated"),
    )


@query("corpus_bpe_merges", oracle=None)
def corpus_bpe_merges(spark, sf_dir):
    """Distributed BPE merge training (llm.bpe): the corpus reduces
    once to the (word, count) vocabulary, then each of 12 merge
    rounds is one bounded pair-count shuffle + a 1-row argmax + a
    JVM-side fold rewriting the vocab arrays — the driver sees O(12)
    rows total (cluster_near_dups' driver-in-the-loop shape). The 12
    data-dependent iterations are not SQL-expressible -> rows-only
    driver check; exact equivalence with a pure-Python reference BPE
    (same tiebreaks, same left-to-right merge fold) is pinned in
    tests/test_bpe.py on synthetic and real corpora."""
    from ..llm.bpe import train_bpe

    d = t(spark, sf_dir, "documents")
    merges = train_bpe(d, "text", n_merges=12)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, support long"
    )


@query("emb_kmeans_clusters", oracle=None)
def emb_kmeans_clusters(spark, sf_dir):
    """K-means clustering of the embedding corpus (llm.similarity.
    kmeans_centroids, 16 cells, 2 Lloyd iterations from deterministic
    id-ordered seeds): per-cluster sizes and mean cosine-to-centroid.
    Registered rows-only: the mean-update accumulates float sums whose
    cross-engine summation order cannot be pinned (the same reason the
    Lloyd-trained IVF tier is recall-tested rather than oracled, while
    its SEEDED twin ann_ivf_topk is exactly oracled); the semantic
    invariants — partition of the corpus, inertia non-increasing per
    Lloyd iteration — are pinned in tests/test_corpus.py."""
    from ..llm.similarity import as_double, assign_cells, cosine_sim, kmeans_centroids

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    cents = kmeans_centroids(e, "vec", "vec_id", n_cells=16, n_iter=2)
    assigned = assign_cells(e, cents, "vec_id", n_probe=1)
    sim = cosine_sim(F.col("vec"), F.col("c_vec"))
    return (
        assigned.join(F.broadcast(cents), "cell_id")
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.round(F.avg(sim), 6).alias("mean_cos_to_centroid"),
        )
        .orderBy("cell_id")
    )


@query(
    "corpus_prepare_pipeline",
    # The end-to-end corpus-prep story in ONE oracled chain:
    # NFC-normalize -> token-band filter -> exact dedup on the
    # normalized hash (keep-first) -> md5-nibble train/val/test split
    # -> per-split stats. Every stage is the exact same formulation
    # its standalone query uses.
    oracle=r"""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(
               lower(nfc_normalize(text)), '[\x00-\x1f\x7f]', ' ', 'g'),
               '\s+', ' ', 'g')) AS nt
      FROM documents
    ), tok AS (
      SELECT doc_id, nt, md5(nt) AS h,
             len(regexp_extract_all(nt, '\S+')) AS n_tokens
      FROM norm
    ), kept AS (
      SELECT * FROM tok WHERE n_tokens >= 5
    ), fst AS (
      SELECT h, min(doc_id) AS keep_id FROM kept GROUP BY h
    ), deduped AS (
      SELECT k.* FROM kept k JOIN fst f ON f.h = k.h AND f.keep_id = k.doc_id
    )
    SELECT CASE
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               IN ('0','1','2','3','4','5','6','7','8','9','a','b')
               THEN 'train'
             WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
               THEN 'val'
             ELSE 'test'
           END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(length(nt)), 6) AS mean_chars
    FROM deduped GROUP BY 1
    """,
)
def corpus_prepare_pipeline(spark, sf_dir):
    """The engine's user story in one query: raw documents ->
    unicode-NFC cleanup (pandas UDF tier) -> minimum-length quality
    gate -> exact content dedup on the normalized hash (keep-first,
    one shuffle) -> deterministic md5-nibble train/val/test split ->
    per-split corpus stats. Each stage is the identical formulation
    of its standalone registry query (doc_normalize_text,
    doc_exact_dedup, doc_train_split), so the composite stays exactly
    oracle-checkable end to end — the chain a production corpus build
    runs nightly, compressed into one plan: scan -> UDF -> filter ->
    one hash groupBy + join-back -> codegen split -> tiny aggregate."""
    from ..llm.text import nfc_normalize_udf

    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    norm = d.select("doc_id", nfc_normalize_udf()(F.col("text")).alias("nt"))
    tok = norm.select(
        "doc_id",
        "nt",
        F.md5("nt").alias("h"),
        F.size(F.regexp_extract_all("nt", F.lit(r"\S+"), 0)).alias("n_tokens"),
    )
    kept = tok.filter(F.col("n_tokens") >= 5)
    fst = kept.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    deduped = kept.join(
        fst, (kept.h == fst.h) & (kept.doc_id == fst.keep_id)
    ).select(kept.doc_id, "nt", "n_tokens")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib.isin(*"0123456789ab"), F.lit("train"))
        .when(nib.isin(*"cd"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        deduped.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg(F.length("nt")), 6).alias("mean_chars"),
        )
    )


@query(
    "doc_token_budget_select",
    # Budget-constrained corpus selection: rank by type-token ratio
    # (lexical diversity) desc, keep docs while the INCLUSIVE running
    # token total fits 50% of the corpus. Integer cumsum + one exact
    # double division per doc -> exact cross-engine rows.
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             len(regexp_extract_all(lower(trim(text)), '\\S+')) AS n_tokens,
             len(list_distinct(regexp_extract_all(lower(trim(text)), '\\S+')))
               AS n_distinct
      FROM documents
    ), ranked AS (
      SELECT doc_id, n_tokens,
             n_distinct::DOUBLE / n_tokens AS ttr,
             row_number() OVER w AS rn,
             sum(n_tokens) OVER (w ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM scored WHERE n_tokens > 0
      WINDOW w AS (ORDER BY n_distinct::DOUBLE / n_tokens DESC, doc_id)
    ), budget AS (
      SELECT CAST(floor(0.5 * sum(n_tokens)) AS BIGINT) AS b FROM scored
    )
    SELECT doc_id, CAST(rn AS BIGINT) AS rn,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           round(ttr, 6) AS ttr
    FROM ranked, budget WHERE cum_tokens <= b
    """,
)
def doc_token_budget_select(spark, sf_dir):
    """Token-budget-constrained corpus selection — the 'best docs that
    fit the training budget' op: score every document (type-token
    ratio here; any deterministic quality column plugs in), take docs
    in descending-quality order until the running token total reaches
    the budget (50% of corpus tokens).

    Scale shape: the global quality ranking AND the global running
    token total both come from ops.distributed_global_rank with
    prefix_sums — the two-phase trick generalized from ranks to
    cumulative sums, so the 'sum(tokens) OVER (ORDER BY quality)' that
    a naive plan would put on one reducer is per-bucket partitioned
    windows plus a broadcast <=64-row offsets relation. The budget is a
    broadcast 1-row aggregate. Nothing about this plan changes at
    100 TB; the oracle's unpartitioned SQL window is the semantics
    spec, not the plan."""
    from ..ops import distributed_global_rank

    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
    )
    scored = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
    )
    budget = scored.agg(
        F.floor(0.5 * F.sum("n_tokens")).cast("bigint").alias("b")
    )
    pos = scored.filter(F.col("n_tokens") > 0).withColumn(
        "neg_ttr", -(F.col("n_distinct").cast("double") / F.col("n_tokens"))
    )
    ranked = distributed_global_rank(
        pos,
        ["neg_ttr", "doc_id"],
        rank_col="rn",
        prefix_sums={"n_tokens": "cum_tokens"},
    )
    return (
        ranked.crossJoin(F.broadcast(budget))
        .filter(F.col("cum_tokens") <= F.col("b"))
        .select(
            "doc_id",
            F.col("rn").cast("bigint").alias("rn"),
            "n_tokens",
            "cum_tokens",
            F.round(-F.col("neg_ttr"), 6).alias("ttr"),
        )
    )


@query(
    "doc_dedup_keep_best",
    # Quality-priority dedup on the LEADING-CONTENT key (first 20
    # tokens): boilerplate-opening dedup, keep the BEST copy (longest,
    # then highest doc_id) instead of the first — the curation-grade
    # policy (C4 keeps first; modern pipelines keep the best-scored
    # copy). The prefix key groups this corpus' near-dup variants
    # (~20 groups at sf0.01), so the keep-best branch is exercised at
    # the driver gate, not just vacuously correct.
    oracle="""
    WITH k AS (
      SELECT doc_id, n_chars,
             md5(array_to_string(
                 (regexp_extract_all(lower(trim(text)), '\\S+'))[1:20],
                 ' ')) AS h
      FROM documents
    ), p AS (
      SELECT doc_id, n_chars,
             row_number() OVER (PARTITION BY h
                                ORDER BY n_chars DESC, doc_id DESC) AS pick,
             count(*) OVER (PARTITION BY h) AS n_dups
      FROM k
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(n_dups AS BIGINT) AS n_dups
    FROM p WHERE pick = 1
    """,
)
def doc_dedup_keep_best(spark, sf_dir):
    """Keep-BEST dedup on a leading-content key: hash the first 20
    normalized tokens (boilerplate/template openings — the coarse key
    that catches near-identical variants exact hashing misses), and
    per duplicate group keep the highest-quality copy (longest text,
    doc_id tiebreak) — versus doc_exact_dedup's keep-first. One groupBy
    on the prefix hash using a declarative struct-max
    (F.max(struct(quality..., payload)))['payload'] — NOT max_by, whose
    object-hash aggregate falls back to sort-based past 128
    groups/partition (measured 12x slower at 10M rows; see
    ind_ohlc_5min) — so the whole op is one map-side-combinable
    shuffle at any corpus size."""
    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
    )
    h = F.md5(F.array_join(F.slice(toks, 1, 20), " "))
    best = F.max(
        F.struct(
            F.col("n_chars").alias("q1"),
            F.col("doc_id").alias("q2"),
        )
    )
    return (
        d.select(h.alias("h"), "doc_id", "n_chars")
        .groupBy("h")
        .agg(
            best.alias("best"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        )
        .select(
            F.col("best.q2").alias("doc_id"),
            F.col("best.q1").cast("bigint").alias("n_chars"),
            "n_dups",
        )
    )


@query(
    "corpus_rebalance_quota",
    # Rebalance to a uniform source mix: equal per-source quota from a
    # 40%-of-corpus target, each source keeps its quota docs with the
    # smallest md5(doc_id) (deterministic, engine-portable). Sources
    # smaller than the quota keep everything (no redistribution --
    # documented single-pass policy).
    oracle="""
    WITH tgt AS (
      SELECT CAST(floor(0.4 * count(*)) AS BIGINT) AS t,
             CAST(count(DISTINCT source) AS BIGINT) AS ns
      FROM documents
    ), r AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rk
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(t // ns) AS BIGINT) AS quota,
           CAST(sum(CASE WHEN rk <= t // ns THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM r, tgt GROUP BY source
    """,
)
def corpus_rebalance_quota(spark, sf_dir):
    """Target-mix rebalancing: allocate a global document budget (40%
    of the corpus) EQUALLY across sources and keep, per source, the
    quota documents with the smallest md5(doc_id) — the deterministic
    counterpart of per-domain downsampling that flattens a skewed
    source mix (the multilingual/low-resource upsampling problem in
    reverse). Per-source ranking is a PARTITIONED window (never
    global); the quota is a broadcast 1-row aggregate; sources below
    quota keep all their docs. The kept-set selection composes with
    stratified_sample for fractional follow-up passes."""
    d = t(spark, sf_dir, "documents")
    tgt = d.agg(
        F.floor(0.4 * F.count(F.lit(1))).cast("bigint").alias("t"),
        F.countDistinct("source").cast("bigint").alias("ns"),
    )
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    r = d.select("source", "doc_id").withColumn("rk", rk)
    quota = (F.col("t") / F.col("ns")).cast("bigint")  # integer floor div
    return (
        r.crossJoin(F.broadcast(tgt))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.max(quota).cast("bigint").alias("quota"),
            F.sum((F.col("rk") <= quota).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


_RAG_WIN = 24  # tokens per retrieval chunk
_RAG_STRIDE = 16  # window stride (8-token overlap between neighbors)


@query(
    "doc_chunk_overlap",
    # Sliding-window RAG chunking: windows of 24 tokens every 16
    # tokens (8-token overlap), per-chunk token offsets and a portable
    # 60-bit content hash — the chunk table a retrieval index ingests.
    # Chunk count/starts/lengths are pure integer arithmetic; the hash
    # is the canonical md5-prefix construction. sequence(0,-1) descent
    # on empty docs is guarded exactly like doc_chunk_dedup.
    oracle="""
    WITH tk AS (
      SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS tk
      FROM documents
    ), ch AS (
      SELECT doc_id, g AS chunk_idx,
             g * 16 AS start_token,
             least(24, len(tk) - g * 16) AS chunk_len,
             CAST('0x' || substr(md5(
               array_to_string(tk[(g*16+1):(g*16+24)], ' ')
             ), 1, 15) AS BIGINT) AS chunk_hash
      FROM tk,
           unnest(range(0, CAST(ceil(len(tk) / 16.0) AS BIGINT))) AS u(g)
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(start_token AS BIGINT) AS start_token,
           CAST(chunk_len AS BIGINT) AS chunk_len, chunk_hash
    FROM ch ORDER BY doc_id, chunk_idx
    """,
)
def doc_chunk_overlap(spark, sf_dir):
    """Sliding-window chunk table for retrieval indexing (RAG): every
    document becomes overlapping 24-token windows on a 16-token
    stride, each with its token offsets and a portable content hash
    (the dedup/index key). Plan: map-only — tokenize, generate the
    per-doc window index with sequence() (bounded by doc length /
    stride), explode, slice; no shuffle except the output sort. The
    overlap means boundary-crossing facts appear intact in at least
    one window — the property RAG chunking exists to provide."""
    from ..sketches import portable_u64

    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    toks = F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
    )
    n = F.size(F.col("tk"))
    nch = F.ceil(n / F.lit(float(_RAG_STRIDE))).cast("int")
    base = d.select("doc_id", toks.alias("tk")).select(
        "doc_id",
        "tk",
        F.when(nch > 0, F.sequence(F.lit(0), nch - 1))
        .otherwise(F.array().cast("array<int>"))
        .alias("gs"),
    )
    ch = base.select(
        "doc_id",
        "tk",
        F.explode("gs").alias("g"),
    ).select(
        "doc_id",
        F.col("g").cast("bigint").alias("chunk_idx"),
        (F.col("g") * _RAG_STRIDE).cast("bigint").alias("start_token"),
        F.least(
            F.lit(_RAG_WIN),
            F.size(F.col("tk")) - F.col("g") * _RAG_STRIDE,
        )
        .cast("bigint")
        .alias("chunk_len"),
        portable_u64(
            F.array_join(
                F.slice(
                    F.col("tk"),
                    F.col("g") * _RAG_STRIDE + 1,
                    _RAG_WIN,
                ),
                " ",
            )
        ).alias("chunk_hash"),
    )
    return ch.orderBy("doc_id", "chunk_idx")
