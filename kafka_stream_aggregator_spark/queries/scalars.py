"""Scalar-function families (SURVEY.md §2.B "Scalar functions").

One canonical oracle query per family. All expressions are built-in
pyspark.sql.functions — JVM-side, whole-stage-codegen'd; the oracle uses
the DuckDB spelling of the same semantics (dialect deltas are noted
inline: dayofweek base, regexp_replace 'g' flag, pmod emulation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t


@query(
    "fn_string_suite",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           substring(c_name, 10, 5) AS sub5,
           length(c_name) AS name_len,
           concat_ws('|', c_name, c_mktsegment) AS joined,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           trim('  x  ') AS trimmed,
           instr(c_name, '#') AS hash_pos,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devowel,
           split_part(c_name, '#', 1) AS name_head,
           levenshtein(c_mktsegment, 'MACHINERY') AS lev,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr
    FROM customer
    """,
)
def fn_string_suite(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 10, 5).alias("sub5"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.instr("c_name", "#").alias("hash_pos"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_mktsegment", "[AEIOU]", "_").alias("devowel"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_head"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).alias("lev"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("tr"),
    )


@query(
    "fn_math_suite",
    # pmod(x, 7): DuckDB's % is signed remainder -> emulate ((x%7)+7)%7.
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS r1,
           CAST(floor(l_extendedprice) AS BIGINT) AS flr,
           CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
           abs(l_quantity - 25) AS absd,
           round(pow(l_discount, 2), 6) AS disc_sq,
           round(sqrt(l_quantity), 6) AS sqrt_qty,
           round(exp(l_discount), 6) AS exp_disc,
           round(ln(l_extendedprice), 6) AS ln_price,
           round(log10(l_extendedprice), 6) AS log10_price,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sgn,
           ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS pm7,
           round(radians(l_quantity), 6) AS rad,
           CAST(l_quantity AS BIGINT) // 10 AS qty_div
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def fn_math_suite(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        F.floor("l_extendedprice").alias("flr"),
        F.ceil("l_extendedprice").alias("cl"),
        F.abs(F.col("l_quantity") - 25).alias("absd"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.signum(F.col("l_quantity") - 25.0).alias("sgn"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("pm7"),
        F.round(F.radians("l_quantity"), 6).alias("rad"),
        (F.col("l_quantity").cast("long") / 10).cast("long").alias("qty_div"),
    )


@query(
    "fn_datetime_suite",
    # Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday -> +1.
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           dayofweek(o_orderdate) + 1 AS dow,
           quarter(o_orderdate) AS qtr,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders WHERE o_orderkey < 3000
    """,
)
def fn_datetime_suite(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd"
        ).alias("plus30"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
    )


@query(
    "fn_array_suite",
    # Higher-order array functions over the embedding vectors (cast to
    # double first — element-wise exact, so both engines fold identical
    # doubles left-to-right).
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT vec_id,
           len(v) AS dim,
           round(list_aggregate(v, 'sum'), 6) AS vsum,
           round(list_aggregate(v, 'max'), 6) AS vmax,
           round(list_aggregate(v, 'min'), 6) AS vmin,
           round(list_aggregate(list_transform(v, x -> x * x), 'sum'), 6) AS sq_norm,
           round(v[1], 6) AS first_elem,
           len(list_filter(v, x -> x > 0)) AS n_pos,
           round(list_sort(v)[len(v)], 6) AS sorted_last
    FROM e
    """,
)
def fn_array_suite(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings").withColumn(
        "v", F.transform("embedding", lambda x: x.cast("double"))
    )
    return e.select(
        "vec_id",
        F.size("v").alias("dim"),
        F.round(F.aggregate("v", F.lit(0.0), lambda a, x: a + x), 6).alias("vsum"),
        F.round(F.array_max("v"), 6).alias("vmax"),
        F.round(F.array_min("v"), 6).alias("vmin"),
        F.round(
            F.aggregate(
                F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("sq_norm"),
        F.round(F.element_at("v", 1), 6).alias("first_elem"),
        F.size(F.filter("v", lambda x: x > 0)).alias("n_pos"),
        F.round(F.element_at(F.array_sort("v"), -1), 6).alias("sorted_last"),
    )


@query(
    "fn_json_suite",
    oracle="""
    SELECT props->>'$.k' AS k_str,
           CAST(props->>'$.k' AS BIGINT) // 10 AS k_bucket,
           count(*) AS n,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def fn_json_suite(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        e.groupBy(
            k.alias("k_str"),
            (k.cast("long") / 10).cast("long").alias("k_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS tier,
           round(coalesce(nullif(c_acctbal, 0.0), -999.0), 6) AS bal_nz,
           round(greatest(c_acctbal, 1000.0), 6) AS floor1k,
           round(least(c_acctbal, 9000.0), 6) AS cap9k
    FROM customer
    """,
)
def fn_conditional(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("tier"),
        F.round(
            F.coalesce(F.nullif("c_acctbal", F.lit(0.0)), F.lit(-999.0)), 6
        ).alias("bal_nz"),
        F.round(F.greatest("c_acctbal", F.lit(1000.0)), 6).alias("floor1k"),
        F.round(F.least("c_acctbal", F.lit(9000.0)), 6).alias("cap9k"),
    )


@query(
    "fn_hash_suite",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS h_md5,
           sha256(c_name) AS h_sha256
    FROM customer
    """,
)
def fn_hash_suite(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2("c_name", 256).alias("h_sha256"),
    )


@query(
    "fn_filter_predicates",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND c_acctbal BETWEEN 0 AND 8000
      AND c_name LIKE 'Customer#%'
      AND regexp_matches(c_name, '[02468]$')
      AND c_nationkey IS NOT NULL
    """,
)
def fn_filter_predicates(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_acctbal").between(0, 8000)
        & F.col("c_name").like("Customer#%")
        & F.col("c_name").rlike("[02468]$")
        & F.col("c_nationkey").isNotNull()
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "fn_distinct_limit",
    oracle="""
    SELECT c_mktsegment FROM (
      SELECT DISTINCT c_mktsegment FROM customer
    ) ORDER BY c_mktsegment LIMIT 3 OFFSET 1
    """,
)
def fn_distinct_limit(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment")
        .distinct()
        .orderBy("c_mktsegment")
        .offset(1)
        .limit(3)
    )


@query(
    "fn_struct_ops",
    oracle="""
    SELECT o_orderkey,
           {'yr': year(o_orderdate), 'total': round(o_totalprice, 6)}.yr AS s_year,
           {'yr': year(o_orderdate), 'total': round(o_totalprice, 6)}.total AS s_total
    FROM orders WHERE o_orderkey < 1000
    """,
)
def fn_struct_ops(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    s = F.struct(
        F.year("o_orderdate").alias("yr"),
        F.round("o_totalprice", 6).alias("total"),
    )
    return o.select(
        "o_orderkey",
        s.getField("yr").alias("s_year"),
        s.getField("total").alias("s_total"),
    )


@query(
    "fn_array_suite2",
    # posexplode ≡ unnest + generate_subscripts; Spark set ops sort-
    # normalized on both sides (result order is engine-defined).
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 50
    )
    SELECT vec_id,
           array_to_string(list_transform(range(1, 4), x -> CAST(x AS VARCHAR)), ',')
             AS seq3,
           round(list_aggregate(flatten([list_slice(v, 1, 2),
                                         list_slice(v, 3, 4)]), 'sum'), 6)
             AS flat_sum,
           list_contains(list_transform(v, x -> x > 0.5), true) AS any_gt,
           round(list_slice(list_reverse_sort(v), 1, 1)[1], 6) AS top1,
           CAST(list_position(list_transform(v, x -> x > 0.5), true) AS INT)
             AS first_gt_pos
    FROM e
    """,
)
def fn_array_suite2(spark, sf_dir):
    from ..llm.similarity import as_double

    e = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 50)
        .withColumn("v", as_double(F.col("embedding")))
    )
    return e.select(
        "vec_id",
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(3)), lambda x: x.cast("string")),
            ",",
        ).alias("seq3"),
        F.round(
            F.aggregate(
                F.flatten(F.array(F.slice("v", 1, 2), F.slice("v", 3, 2))),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("flat_sum"),
        F.array_contains(F.transform("v", lambda x: x > 0.5), True).alias("any_gt"),
        F.round(
            F.element_at(F.slice(F.sort_array("v", asc=False), 1, 1), 1), 6
        ).alias("top1"),
        F.array_position(F.transform("v", lambda x: x > 0.5), True)
        .cast("int")
        .alias("first_gt_pos"),
    )


@query(
    "fn_json_from_json",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k_val,
           CAST(props->>'$.k' AS INT) % 7 AS k_mod
    FROM events WHERE event_id < 3000
    """,
)
def fn_json_from_json(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    parsed = F.from_json("props", "k INT")
    return e.select(
        "event_id",
        parsed["k"].alias("k_val"),
        (parsed["k"] % 7).alias("k_mod"),
    )


@query("fn_hash_spark_native", oracle=None)
def fn_hash_spark_native(spark, sf_dir):
    """xxhash64 / murmur3 / crc32 — Spark-native hashes with no DuckDB
    twin; determinism asserted in tests (stable across runs & partitions)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.xxhash64("c_name").alias("h_xx"),
        F.hash("c_name").alias("h_murmur"),
        F.crc32(F.col("c_name").cast("binary")).alias("h_crc"),
    )


@query(
    "fn_json_tuple",
    oracle="""
    SELECT event_id, props->>'$.k' AS k
    FROM events WHERE event_id < 2000
    """,
)
def fn_json_tuple(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select("event_id", F.json_tuple("props", "k").alias("k"))


@query(
    "fn_posexplode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(v5, 1) AS INT) - 1 AS pos,
           round(unnest(v5), 6) AS elem
    FROM (SELECT vec_id, (embedding::DOUBLE[])[1:5] AS v5
          FROM embeddings WHERE vec_id < 100)
    """,
)
def fn_posexplode(spark, sf_dir):
    from ..llm.similarity import as_double

    e = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", F.slice(as_double(F.col("embedding")), 1, 5).alias("v5"))
    )
    return e.select(
        "vec_id", F.posexplode("v5").alias("pos", "elem")
    ).select("vec_id", "pos", F.round("elem", 6).alias("elem"))


@query(
    "fn_string_suite2",
    # printf-style formatting, repeat/reverse, char codes, left/right
    # (DuckDB lacks initcap — emulated with upper(first)||rest on a
    # single-word column so the semantic matches Spark's initcap)
    oracle="""
    SELECT s_suppkey,
           printf('%s|%05d|%.3f', s_name, s_suppkey, s_acctbal) AS formatted,
           repeat('-', CAST(s_suppkey % 5 AS INT)) AS dashes,
           reverse(s_name) AS rev_name,
           ascii(s_name) AS first_code,
           chr(65 + CAST(s_suppkey % 26 AS INT)) AS letter,
           left(s_name, 8) AS l8,
           right(s_name, 4) AS r4,
           upper(substring(lower(s_name), 1, 1))
             || substring(lower(s_name), 2) AS initcapped
    FROM supplier
    """,
)
def fn_string_suite2(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.format_string("%s|%05d|%.3f", "s_name", "s_suppkey", "s_acctbal").alias(
            "formatted"
        ),
        F.repeat(F.lit("-"), (F.col("s_suppkey") % 5).cast("int")).alias("dashes"),
        F.reverse("s_name").alias("rev_name"),
        F.ascii("s_name").alias("first_code"),
        F.chr(F.lit(65) + (F.col("s_suppkey") % 26).cast("int")).alias("letter"),
        F.substring("s_name", 1, 8).alias("l8"),
        F.col("s_name").substr(F.length("s_name") - 3, F.lit(4)).alias("r4"),
        F.initcap(F.lower("s_name")).alias("initcapped"),
    )
