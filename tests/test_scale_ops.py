"""Scale-path operators: skew-salted join, bucketed co-located join.

These verify the *mechanisms* the engine reaches for at 100 TB:
salting (bound any one reducer's share of a hot key) and bucketing
(pre-shuffle data once at write time, join forever shuffle-free).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_stream_aggregator_spark.ops import salted_join
from kafka_stream_aggregator_spark.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Same result as the plain join, including under a hot key."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    # make a deliberately skewed fact: map 90% of keys to one hot key
    fact = l.withColumn(
        "k", F.when(F.col("l_orderkey") % 10 < 9, F.lit(7)).otherwise(F.col("l_orderkey"))
    )
    dim = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("dk"), "o_orderstatus")
    )
    plain = fact.join(dim, fact.k == dim.dk).groupBy("o_orderstatus").count()
    salted = (
        salted_join(fact, dim, "k", "dk", salt_buckets=8)
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The salted fact side spreads the hot key across all salt buckets."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    fact = l.withColumn("k", F.lit(7))  # 100% hot
    salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)),
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets == 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # warehouse.dir is a static conf — managed tables land in the
    # session's default warehouse; DROP TABLE below cleans them up.
    lt = load_table(spark, sf_dir, "lineitem")
    ot = load_table(spark, sf_dir, "orders")
    spark.sql("DROP TABLE IF EXISTS l_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    (
        lt.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("l_bucketed")
    )
    (
        ot.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("o_bucketed")
    )
    yield "l_bucketed", "o_bucketed"
    spark.sql("DROP TABLE IF EXISTS l_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    """Joining two tables bucketed on the join key runs with ZERO
    Exchange operators — the 100 TB co-location strategy: pay the
    shuffle once at write time, never again."""
    lb, ob = bucketed_tables
    # at sf0.001 Catalyst would just broadcast the whole orders table
    # (correct, but it bypasses bucketing); disable auto-broadcast to
    # exercise the plan shape that matters at scale, where neither side
    # fits in memory and bucketing is what removes the shuffle.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(lb).join(
            spark.table(ob), F.col("l_orderkey") == F.col("o_orderkey")
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan[:800]
    assert "SortMergeJoin" in plan and "Bucketed: true" in plan
    # and it computes the same thing as the un-bucketed join
    n_plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == n_plain


def test_hash_functions_deterministic(spark, sf_dir):
    from kafka_stream_aggregator_spark.queries import REGISTRY

    a = REGISTRY["fn_hash_spark_native"].fn(spark, sf_dir).collect()
    b = REGISTRY["fn_hash_spark_native"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sampling_deterministic_and_sized(spark, sf_dir):
    from kafka_stream_aggregator_spark.queries import REGISTRY

    a = REGISTRY["agg_sampling"].fn(spark, sf_dir).first()
    b = REGISTRY["agg_sampling"].fn(spark, sf_dir).first()
    assert tuple(a) == tuple(b)  # seed-pinned repeatability
    total = load_table(spark, sf_dir, "lineitem").count()
    assert abs(a["n_sampled"] / total - 0.1) < 0.05


def test_repetition_signals_no_expand_no_strings_shuffled(spark, sf_dir):
    """The hygiene op's plan must have no Expand (countDistinct
    rewrite) and must shuffle hashed longs, not gram strings — the two
    defects the 500k-doc stress run exposed (docs/SCALING.md)."""
    from kafka_stream_aggregator_spark.llm.pipeline import repetition_signals

    df = repetition_signals(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan[:800]
    # the gram aggregations key on xxhash64 output, never on __bg/__w
    assert "__bh" in plan and "__wh" in plan


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """The corpus side must stream through a broadcast join on the
    n-gram hash — a shuffle of the 100 TB training side would be the
    scale killer."""
    from kafka_stream_aggregator_spark.llm.pipeline import decontaminate

    d = load_table(spark, sf_dir, "documents")
    df = decontaminate(
        d.filter(F.col("doc_id") % 97 != 0),
        d.filter(F.col("doc_id") % 97 == 0),
        "doc_id",
        "text",
        n=3,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "SortMergeJoin" not in plan, plan[:800]


def test_sorted_layout_enables_rowgroup_skipping(spark, sf_dir, tmp_path):
    """Parquet row-group min/max skipping: the same selective filter
    over the same rows reads FAR fewer rows from a value-sorted layout
    (tight per-row-group min/max -> groups outside the predicate are
    skipped at scan time) than from a shuffled layout (every group
    straddles the predicate). This is the layout tier of 100 TB design:
    sort-on-write turns pushed filters into skipped I/O, on top of
    partition pruning. Small parquet.block.size forces many row groups
    so the effect is observable at test SF."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    sorted_dir = str(tmp_path / "sorted")
    shuffled_dir = str(tmp_path / "shuffled")
    (
        li.orderBy("l_extendedprice")
        .coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite")
        .parquet(sorted_dir)
    )
    (
        li.orderBy(F.xxhash64("l_orderkey", "l_extendedprice"))  # scramble
        .coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite")
        .parquet(shuffled_dir)
    )

    def rows_read(path):
        df = spark.read.parquet(path).filter(F.col("l_extendedprice") > 90000)
        n = len(df.collect())  # executes THIS df's queryExecution
        # scan-level "number of output rows" = rows surviving row-group
        # skipping + page filtering, BEFORE the post-scan filter
        def find_scan(node):
            if "FileSourceScan" in node.getClass().getSimpleName():
                return node
            if hasattr(node, "executedPlan"):  # AQE wrapper
                try:
                    return find_scan(node.executedPlan())
                except Exception:
                    pass
            it = node.children().iterator()
            while it.hasNext():
                got = find_scan(it.next())
                if got is not None:
                    return got
            return None

        scan = find_scan(df._jdf.queryExecution().executedPlan())
        assert scan is not None
        metric = scan.metrics().get("numOutputRows")
        read = metric.get().value() if metric.isDefined() else None
        return n, read

    n_sorted, read_sorted = rows_read(sorted_dir)
    n_shuffled, read_shuffled = rows_read(shuffled_dir)
    assert n_sorted == n_shuffled  # same answer either way
    assert read_sorted is not None and read_shuffled is not None
    # sorted layout must skip the bulk of the file; shuffled reads ~all
    assert read_sorted < read_shuffled / 2, (read_sorted, read_shuffled)


def test_zorder_layout_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order vs plain sort: lay the same rows out (a) sorted by x and
    (b) sorted by the Morton key of (x, y), then filter on Y ONLY. The
    x-sorted layout cannot skip any row group (y is uniform within each
    group); the z-ordered layout skips most groups (each covers a tight
    y-range too). This is why multi-dimensional clustering exists."""
    from pyspark.sql import functions as F

    from kafka_stream_aggregator_spark.ops import zorder_key_2d

    # needs enough rows for many 64 KB row groups; the default test SF
    # (6k rows) yields ~2 groups, too coarse to observe skipping
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        # multiplier spreads the (small-SF) key domains across 0..1023
        ((F.col("l_orderkey") * 53) % 1024).alias("x"),
        ((F.col("l_partkey") * 37) % 1024).alias("y"),
        "l_extendedprice",
    )
    x_dir = str(tmp_path / "xsorted")
    z_dir = str(tmp_path / "zsorted")
    li.orderBy("x").coalesce(1).write.option(
        "parquet.block.size", 64 * 1024
    ).mode("overwrite").parquet(x_dir)
    li.orderBy(zorder_key_2d(F.col("x"), F.col("y"), bits=10)).coalesce(
        1
    ).write.option("parquet.block.size", 64 * 1024).mode("overwrite").parquet(
        z_dir
    )

    def rows_read(path):
        df = spark.read.parquet(path).filter(F.col("y") > 973)  # top ~5%
        n = len(df.collect())

        def find_scan(node):
            if "FileSourceScan" in node.getClass().getSimpleName():
                return node
            it = node.children().iterator()
            while it.hasNext():
                got = find_scan(it.next())
                if got is not None:
                    return got
            return None

        scan = find_scan(df._jdf.queryExecution().executedPlan())
        metric = scan.metrics().get("numOutputRows")
        return n, metric.get().value()

    n_x, read_x = rows_read(x_dir)
    n_z, read_z = rows_read(z_dir)
    assert n_x == n_z
    assert read_z < read_x / 2, (read_z, read_x)
