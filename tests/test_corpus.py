"""Tests for queries/corpus.py and llm/pq.py: PQ ANN tiers, chunk-level
dedup, deterministic shuffle-sharding, mixing weights, and the oracled
Jaccard cluster flow."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.llm.pq import (
    pq_codebook,
    pq_encode,
    pq_topk,
    pq_topk_rerank,
    pq_train_codebook,
)
from kafka_stream_aggregator_spark.llm.similarity import as_double, brute_force_topk
from kafka_stream_aggregator_spark.queries.base import REGISTRY
from kafka_stream_aggregator_spark.tables import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )


def test_pq_encode_invariants(spark, sf_dir):
    e = _emb(spark, sf_dir)
    n = e.count()
    cb = pq_codebook(e, "vec_id", "v", m=8, k=16, dim=64)
    assert cb.count() == 8 * 16
    codes = pq_encode(e, cb, "vec_id", "v", m=8, dim=64)
    # every vector gets exactly one code per subspace
    assert codes.count() == n * 8
    assert (
        codes.groupBy("vec_id").count().filter(F.col("count") != 8).count() == 0
    )
    # codes reference real codewords
    seed_ids = {r["cw_id"] for r in cb.select("cw_id").distinct().collect()}
    used = {r["cw_id"] for r in codes.select("cw_id").distinct().collect()}
    assert used <= seed_ids
    # deterministic: re-encoding yields the identical assignment
    again = pq_encode(e, cb, "vec_id", "v", m=8, dim=64)
    assert codes.exceptAll(again).count() == 0


def test_pq_trained_rerank_recall(spark, sf_dir):
    """ADC candidate generation + exact rerank recovers most of the
    exact top-5 (measured 0.98 at m=16,k=32,cand=50 — floor leaves
    noise margin); pure-ADC top-5 is documented-weaker but nonzero."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    exact = {
        (r["q_id"], r["c_id"]) for r in brute_force_topk(q, c, k=5).collect()
    }
    cb = pq_train_codebook(e, "vec_id", "v", m=16, k=32, dim=64, n_iter=2)
    codes = pq_encode(e, cb, "vec_id", "v", m=16, dim=64).select(
        F.col("vec_id").alias("c_id"), "sub_id", "cw_id"
    )
    adc = {
        (r["q_id"], r["c_id"])
        for r in pq_topk(q, codes, cb, m=16, dim=64, k=5).collect()
    }
    assert len(exact & adc) / len(exact) >= 0.25, "pure-ADC recall collapsed"
    rer = {
        (r["q_id"], r["c_id"])
        for r in pq_topk_rerank(
            q, codes, cb, c, m=16, dim=64, k=5, n_candidates=50
        ).collect()
    }
    recall = len(exact & rer) / len(exact)
    assert recall >= 0.7, f"PQ+rerank recall@5 too low: {recall:.2f}"


def test_chunk_dedup_invariants(spark, sf_dir):
    out = REGISTRY["doc_chunk_dedup"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(out) == docs.count()
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_chunks"]
        assert abs(r["kept_frac"] - round(r["n_kept"] / r["n_chunks"], 6)) < 1e-9
    # total kept == number of distinct chunk hashes in the corpus
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(20)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda g: F.md5(F.array_join(F.slice(toks, g * 20 + 1, 20), " ")),
    )
    distinct_chunks = (
        docs.select(F.explode(chunks).alias("h")).distinct().count()
    )
    assert sum(r["n_kept"] for r in out) == distinct_chunks


def test_global_shuffle_balanced_and_total(spark, sf_dir):
    rows = REGISTRY["doc_global_shuffle"].fn(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == total
    counts = [r["n_docs"] for r in rows]
    assert max(counts) - min(counts) <= 1, "round-robin shards must balance"
    assert sorted(r["shard"] for r in rows) == list(range(8))


def test_mix_weights_normalized(spark, sf_dir):
    rows = REGISTRY["corpus_mix_weights"].fn(spark, sf_dir).collect()
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["p_nat"] for r in rows) - 1.0) < 1e-4
    # temperature < 1 flattens: rare domains upsampled, common ones down
    rarest = min(rows, key=lambda r: r["n_docs"])
    commonest = max(rows, key=lambda r: r["n_docs"])
    if rarest["n_docs"] < commonest["n_docs"]:
        assert rarest["resample_ratio"] >= commonest["resample_ratio"]


def test_jaccard_clusters_min_size(spark, sf_dir):
    rows = REGISTRY["jaccard_dup_clusters"].fn(spark, sf_dir).collect()
    assert rows, "expected at least one cluster on the test corpus"
    for r in rows:
        assert r["n_docs"] >= 2, "clusters only form from edges"


def test_nfc_normalize_matches_duckdb_on_unicode(spark):
    """Accented/composed/decomposed fixtures through the pandas-UDF NFC
    path vs DuckDB's nfc_normalize — engines must agree beyond the
    ASCII corpus the registry query covers."""
    import duckdb

    from kafka_stream_aggregator_spark.llm.text import nfc_normalize_udf

    fixtures = [
        "Café au lait",                      # precomposed é
        "Café au lait",                     # decomposed e + combining ´
        "straße  und   \tWEGE",              # ß + messy whitespace
        "Å ring Å",              # decomposed Å
        "control\x00chars\x1fhere",
        "  mixed Ümläut Ñ case  ",
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, s) for i, s in enumerate(fixtures)],
                               "i long, s string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", nfc_normalize_udf()(F.col("s")).alias("n")).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(fixtures):
        want = con.execute(
            """SELECT trim(regexp_replace(regexp_replace(
                   lower(nfc_normalize(?)), '[\\x00-\\x1f\\x7f]', ' ', 'g'),
                   '\\s+', ' ', 'g'))""",
            [s],
        ).fetchone()[0]
        assert got[i] == want, f"fixture {i}: {got[i]!r} != {want!r}"


def test_bigram_logprob_ranks_coherent_above_shuffled(spark):
    """A doc whose bigrams all recur scores higher than one assembled
    from the same unigrams in never-repeated orders."""
    from kafka_stream_aggregator_spark.llm.pipeline import bigram_logprob

    coherent = "the cat sat on the mat " * 10
    rows = [(i, coherent.strip()) for i in range(4)]
    # same vocabulary, scrambled order per doc -> unseen bigrams
    words = ("the cat sat on the mat " * 10).split()
    import random

    rng = random.Random(7)
    for i in range(4, 8):
        w = words[:]
        rng.shuffle(w)
        rows.append((i, " ".join(w)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["mean_logprob"]
           for r in bigram_logprob(df, "doc_id", "text").collect()}
    coh = sum(out[i] for i in range(4)) / 4
    shuf = sum(out[i] for i in range(4, 8)) / 4
    assert coh > shuf
    assert all(v < 0 for v in out.values())  # log-probs


def test_kmeans_partitions_and_inertia_decreases(spark, sf_dir):
    """Lloyd invariants: every vector lands in exactly one cell, and
    mean cosine-to-centroid (the cosine analogue of inertia) does not
    degrade as iterations increase."""
    from pyspark.sql import functions as F

    from kafka_stream_aggregator_spark.llm.similarity import (
        as_double,
        assign_cells,
        cosine_sim,
        kmeans_centroids,
    )
    from kafka_stream_aggregator_spark.queries import REGISTRY
    from kafka_stream_aggregator_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    n = e.count()

    def mean_cos(n_iter):
        cents = kmeans_centroids(e, "vec", "vec_id", n_cells=8, n_iter=n_iter)
        a = assign_cells(e, cents, "vec_id", n_probe=1).join(
            F.broadcast(cents), "cell_id"
        )
        row = a.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(cosine_sim(F.col("vec"), F.col("c_vec"))).alias("m"),
        ).collect()[0]
        assert row["n"] == n  # partition: every vector exactly once
        return row["m"]

    m0, m1, m2 = mean_cos(0), mean_cos(1), mean_cos(2)
    assert m1 >= m0 - 1e-9
    assert m2 >= m1 - 1e-9

    rows = REGISTRY["emb_kmeans_clusters"].fn(spark, sf_dir).collect()
    assert sum(r["n_members"] for r in rows) == n
