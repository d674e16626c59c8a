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


def test_dynamic_partition_overwrite_replays_idempotently(spark, sf_dir, tmp_path):
    """Dynamic partition-overwrite: a replayed batch job rewrites ONLY
    the partitions it produces, leaving sibling partitions intact — the
    exactly-once idiom for re-runnable daily jobs over a partitioned
    lake (a failed day is safely re-run without touching other days and
    without duplicating its own output)."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        d = str(tmp_path / "lake")
        base = spark.createDataFrame(
            [(1, "2024-01-01"), (2, "2024-01-01"), (3, "2024-01-02")],
            "id long, day string",
        )
        base.write.partitionBy("day").mode("overwrite").parquet(d)
        # replay day-1 with corrected data (overwrite semantics, not append)
        fix = spark.createDataFrame([(9, "2024-01-01")], "id long, day string")
        fix.write.partitionBy("day").mode("overwrite").parquet(d)
        fix.write.partitionBy("day").mode("overwrite").parquet(d)  # replay again
        # partition-column type inference reads `day` back as DATE
        got = {
            (r["id"], str(r["day"]))
            for r in spark.read.parquet(d).collect()
        }
        # day-2 untouched; day-1 exactly the replayed content, no dupes
        assert got == {(9, "2024-01-01"), (3, "2024-01-02")}
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
