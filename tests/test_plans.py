"""Physical-plan assertions — the 100 TB design checks.

Correctness says the answer is right; these say the *plan* is the one
that survives a 1000-executor scale-up: filters reach the parquet scan,
column pruning works, dimension joins broadcast, top-k never global-sorts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.queries import REGISTRY
from kafka_stream_aggregator_spark.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    df = l.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_column_pruning(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    df = l.select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema


def test_q3_broadcasts_customer(spark, sf_dir):
    plan = _plan(REGISTRY["q3_revenue_topk"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q3_topk_no_global_sort(spark, sf_dir):
    plan = _plan(REGISTRY["q3_revenue_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_ewma_no_python_udf(spark, sf_dir):
    # The EWMA fold must be a pure Catalyst expression, never a python UDF
    plan = _plan(REGISTRY["ewma_5min"].fn(spark, sf_dir))
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_whole_stage_codegen_on_q1(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes the plan (and codegen spans) on execution
    plan = _plan(df)
    # codegen'd operators print with the '*(stageId)' prefix
    assert "*(1)" in plan and "partial_sum" in plan


def test_range_theta_broadcasts_small_side(spark, sf_dir):
    plan = _plan(REGISTRY["join_range_theta"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    # union+window as-of: exactly one Exchange (hash by group key), no
    # cartesian/nested-loop anywhere.
    plan = _plan(REGISTRY["join_asof"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q8_sixway_join_broadcasts_dims(spark, sf_dir):
    """q8's 6-way join: all four dimension sides broadcast, facts shuffle."""
    df = REGISTRY["q8_market_share"].fn(spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_anti_join(spark, sf_dir):
    plan = _plan(REGISTRY["q16_parts_supplier_count"].fn(spark, sf_dir))
    assert "LeftAnti" in plan
