"""The numpy top-k tier must return the SAME top-k sets as the exact
brute-force tier (values may differ in float-sum order)."""

from __future__ import annotations

from collections import defaultdict

from kafka_stream_aggregator_spark.queries import REGISTRY


def test_numpy_topk_sets_match_bruteforce(spark, sf_dir):
    bf = REGISTRY["cos_topk_bruteforce"].fn(spark, sf_dir).collect()
    np_ = REGISTRY["ann_numpy_topk"].fn(spark, sf_dir).collect()
    bsets = defaultdict(set)
    nsets = defaultdict(set)
    bvals = {}
    nvals = {}
    for r in bf:
        bsets[r["q_id"]].add(r["c_id"])
        bvals[(r["q_id"], r["c_id"])] = r["cos_sim"]
    for r in np_:
        nsets[r["q_id"]].add(r["c_id"])
        nvals[(r["q_id"], r["c_id"])] = r["cos_sim"]
    assert set(bsets) == set(nsets)
    for q in bsets:
        assert bsets[q] == nsets[q], q
    for k, v in bvals.items():
        assert abs(nvals[k] - v) < 1e-6


def test_ivf_numpy_topk_sets_match_hof_tier(spark, sf_dir):
    """The IVF numpy tier (measured path) must return the same top-k
    sets as ann_ivf_topk (the exactly-SQL-oracled HOF reference tier):
    identical cells, probes, and ranking — only the summation order of
    the arithmetic differs."""
    hof = REGISTRY["ann_ivf_topk"].fn(spark, sf_dir).collect()
    np_ = REGISTRY["ann_ivf_numpy_topk"].fn(spark, sf_dir).collect()
    hsets = defaultdict(set)
    nsets = defaultdict(set)
    hvals = {}
    nvals = {}
    for r in hof:
        hsets[r["q_id"]].add(r["c_id"])
        hvals[(r["q_id"], r["c_id"])] = r["cos_sim"]
    for r in np_:
        nsets[r["q_id"]].add(r["c_id"])
        nvals[(r["q_id"], r["c_id"])] = r["cos_sim"]
    assert set(hsets) == set(nsets)
    for q in hsets:
        assert hsets[q] == nsets[q], q
    for k, v in hvals.items():
        assert abs(nvals[k] - v) < 1e-6


def test_ivf_numpy_topk_empty_queries(spark, sf_dir):
    """ADVICE r7: empty query set must short-circuit, not shape-error."""
    from pyspark.sql import functions as F

    from kafka_stream_aggregator_spark.llm.numpy_topk import (
        ivf_numpy_topk,
        numpy_topk,
    )
    from kafka_stream_aggregator_spark.llm.similarity import (
        as_double,
        pseudo_centroids,
    )
    from kafka_stream_aggregator_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    cents = pseudo_centroids(e, "v", "vec_id", n_cells=8)
    assert numpy_topk(q, c, k=5).count() == 0
    assert ivf_numpy_topk(q, c, cents, k=5, n_probe=2).count() == 0


def test_hard_negatives_numpy_sets_match_hof_tier(spark, sf_dir):
    """The numpy mining tier (measured path, VERDICT r11 item 4) must
    return the same top-3 hard-negative sets per query as
    emb_hard_negatives (the oracle-exact HOF tier): identical bounded
    query set, label exclusion, and (cos DESC, neg_id) ranking — only
    the summation order of the arithmetic differs."""
    hof = REGISTRY["emb_hard_negatives"].fn(spark, sf_dir).collect()
    np_ = REGISTRY["emb_hard_negatives_numpy"].fn(spark, sf_dir).collect()
    hsets = defaultdict(set)
    nsets = defaultdict(set)
    hvals = {}
    nvals = {}
    for r in hof:
        hsets[r["q_id"]].add(r["neg_id"])
        hvals[(r["q_id"], r["neg_id"])] = (
            r["cos_sim"], r["q_label"], r["neg_label"]
        )
    for r in np_:
        nsets[r["q_id"]].add(r["neg_id"])
        nvals[(r["q_id"], r["neg_id"])] = (
            r["cos_sim"], r["q_label"], r["neg_label"]
        )
    assert set(hsets) == set(nsets)
    for q in hsets:
        assert hsets[q] == nsets[q], q
    for key, (v, ql, nl) in hvals.items():
        nv, nql, nnl = nvals[key]
        assert abs(nv - v) < 1e-6
        assert (nql, nnl) == (ql, nl)


def test_hard_negatives_numpy_empty_queries(spark, sf_dir):
    """Empty query set must short-circuit, not shape-error."""
    from pyspark.sql import functions as F

    from kafka_stream_aggregator_spark.llm.numpy_topk import (
        hard_negatives_numpy,
    )
    from kafka_stream_aggregator_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_vec"),
    )
    c = e.select(
        F.col("vec_id").alias("c_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_vec"),
    )
    assert hard_negatives_numpy(q, c, k=3).count() == 0
