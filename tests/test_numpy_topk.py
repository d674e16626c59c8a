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
