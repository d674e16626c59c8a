"""Surface-2 operators: unpivot, regression aggs, mode, HLL sketches,
variant. Oracle parity is covered by tools/parity.py; these tests pin
the self-validating invariants and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.tables import load_table


def test_hll_union_estimate_within_tolerance(spark, sf_dir):
    row = REGISTRY["agg_hll_sketch_union"].fn(spark, sf_dir).first()
    assert row["within_5pct"] is True
    assert row["est_users"] > 0 and row["exact_users"] > 0


def test_hll_merge_equals_direct_sketch(spark, sf_dir):
    """Union of per-group sketches == one global sketch over the same
    rows — the mergeability contract that makes per-partition sketch
    persistence sound at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    merged = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("s"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("est"))
        .first()["est"]
    )
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).first()["est"]
    assert merged == direct


def test_unpivot_is_expand_not_join(spark, sf_dir):
    """The melt must be a local Expand (each input row emits k rows in
    place) — never a self-join/union re-scan of the input."""
    df = REGISTRY["fn_unpivot"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert "Join" not in plan
    # one scan only: union-all rewrites would scan lineitem 3x
    assert plan.count("FileScan") == 1


def test_variant_extract_no_python(spark, sf_dir):
    df = REGISTRY["fn_variant_suite"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
