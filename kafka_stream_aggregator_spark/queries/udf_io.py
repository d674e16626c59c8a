"""UDF/UDAF/UDTF surface + file-format round-trips + map functions
(SURVEY.md §2.B "UDF / UDAF / UDTF surface" and "Sources / sinks").

UDF queries deliberately span the whole slow-path ladder — row-at-a-time
python UDF (the anti-pattern, present because the surface requires it),
Arrow-vectorized pandas UDF, grouped-agg pandas UDF, applyInPandas,
mapInPandas, and a lateral-join UDTF — each verified against a pure-SQL
oracle so the python path provably computes the same thing the engine
would.
"""

from __future__ import annotations

import math
import os
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf

from .base import query, t


@query(
    "udf_python_scalar",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid' ELSE 'rich' END AS tier
    FROM customer
    """,
)
def udf_python_scalar(spark, sf_dir):
    @udf(T.StringType())
    def tier(bal: float) -> str:
        return "debt" if bal < 0 else ("mid" if bal < 5000 else "rich")

    return t(spark, sf_dir, "customer").select(
        "c_custkey", tier("c_acctbal").alias("tier")
    )


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT o_orderkey, round(ln(o_totalprice + 1.0) * 2.0, 6) AS score
    FROM orders
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    @pandas_udf(T.DoubleType())
    def score(total: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(total) * 2.0

    return t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round(score("o_totalprice"), 6).alias("score")
    )


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
             AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_pandas_grouped_agg(spark, sf_dir):
    @pandas_udf(T.DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(wavg("l_extendedprice", "l_quantity"), 6).alias("wavg_price")
        )
    )


@query(
    "udf_grouped_map_zscore",
    oracle="""
    SELECT o_orderkey,
           round((o_totalprice - avg(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 6) AS z
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority)
    """,
)
def udf_grouped_map_zscore(spark, sf_dir):
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)
        return pd.DataFrame(
            {"o_orderkey": pdf["o_orderkey"], "z": (pdf["o_totalprice"] - mu) / sd}
        )

    out = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .applyInPandas(zscore, "o_orderkey long, z double")
    )
    return out.select("o_orderkey", F.round("z", 6).alias("z"))


@query(
    "udf_map_in_pandas",
    oracle="""
    SELECT c_custkey, upper(c_name) AS uname, length(c_name) AS nlen
    FROM customer WHERE length(c_name) % 2 = 0
    """,
)
def udf_map_in_pandas(spark, sf_dir):
    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "c_custkey": pdf["c_custkey"],
                    "uname": pdf["c_name"].str.upper(),
                    "nlen": pdf["c_name"].str.len(),
                }
            )
            yield out[out["nlen"] % 2 == 0]

    return t(spark, sf_dir, "customer").mapInPandas(
        project, "c_custkey long, uname string, nlen int"
    )


@query(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, tok, CAST(pos AS INT) AS pos
    FROM (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '\\S+')) AS tok,
             generate_subscripts(regexp_extract_all(lower(text), '\\S+'), 1) AS pos
      FROM documents WHERE doc_id < 20
    )
    """,
)
def udtf_tokenize(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.lower().split()):
                yield tok, i + 1

    import uuid

    sfx = uuid.uuid4().hex[:8]
    spark.udtf.register(f"tokenize_udtf{sfx}", Tokenize)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).createOrReplaceTempView(
        f"docs_udtf{sfx}"
    )
    return spark.sql(
        f"""
        SELECT d.doc_id, s.tok, s.pos
        FROM docs_udtf{sfx} d, LATERAL tokenize_udtf{sfx}(d.text) s
        """
    )


@query(
    "io_csv_roundtrip",
    # DECIMAL-exact balance sum: at sf5 the per-segment raw double fold
    # (~5.5e7 over 10k 2-dp values) differs between Spark's partial
    # order and DuckDB's sequential order in the last ulp, flipping
    # round-6 ties (the io_bucketed_join catch class).
    oracle="""
    SELECT c_mktsegment, count(*) AS n,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 6)
             AS bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def io_csv_roundtrip(spark, sf_dir):
    """csv sink + csv scan (schema'd, headered) preserve content exactly."""
    d = tempfile.mkdtemp(prefix="csv_rt_")
    t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    ).write.mode("overwrite").option("header", True).csv(d)
    back = spark.read.csv(
        d, header=True, schema="c_custkey long, c_mktsegment string, c_acctbal double"
    )
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double"), 6
        ).alias("bal"),
    )


@query(
    "io_json_roundtrip",
    # exact-decimal mean chain (the stream_static_enrich avg-tie class:
    # sums of 2-dp values over "nice" group sizes land on round-6
    # half-ties where the engines' fold orders disagree)
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS avg_total
    FROM orders WHERE o_orderkey < 5000 GROUP BY o_orderstatus
    """,
)
def io_json_roundtrip(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="json_rt_")
    t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).write.mode("overwrite").json(d)
    back = spark.read.schema(
        "o_orderkey long, o_orderstatus string, o_totalprice double"
    ).json(d)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_total"),
    )


@query(
    "io_parquet_roundtrip",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 6) AS q
    FROM lineitem GROUP BY l_returnflag
    """,
)
def io_parquet_roundtrip(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="pq_rt_")
    t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    ).write.mode("overwrite").parquet(d)
    return (
        spark.read.parquet(d)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 6).alias("q"))
    )


@query(
    "fn_map_ops",
    # DuckDB map extraction yields a 1-element list -> unwrap with [1].
    oracle="""
    SELECT o_orderkey,
           (MAP {'yr': year(o_orderdate), 'mo': month(o_orderdate)}['yr'])[1] AS yr,
           array_to_string(list_sort(map_keys(
             MAP {'yr': year(o_orderdate), 'mo': month(o_orderdate)})), ',') AS keys,
           CAST(list_aggregate(map_values(
             MAP {'yr': year(o_orderdate), 'mo': month(o_orderdate)}),
             'sum') AS BIGINT) AS vsum
    FROM orders WHERE o_orderkey < 1000
    """,
)
def fn_map_ops(spark, sf_dir):
    m = F.create_map(
        F.lit("yr"), F.year("o_orderdate"), F.lit("mo"), F.month("o_orderdate")
    )
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.element_at(m, "yr").alias("yr"),
            F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys"),
            F.aggregate(
                F.map_values(m), F.lit(0), lambda a, x: a + x
            ).cast("long").alias("vsum"),
        )
    )


@query(
    "io_jdbc_roundtrip",
    # real JDBC sink + scan against embedded Derby (ships with Spark) —
    # the R11 relational-sink contract, integration-tested in-process
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderkey < 4000 GROUP BY o_orderstatus
    """,
)
def io_jdbc_roundtrip(spark, sf_dir):
    import uuid

    url = f"jdbc:derby:memory:ksa{uuid.uuid4().hex[:10]};create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    src = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 4000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    src.write.jdbc(url, "orders_rt", mode="overwrite", properties=props)
    back = spark.read.jdbc(url, "orders_rt", properties=props)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "io_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           -- DECIMAL-exact revenue (sf5 catch r8: a raw double sum at
           -- 3e11 magnitude diverges ~0.03 between engines' fold orders
           -- — the r6 cube/grouping-sets lesson)
           round(CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)))
                      AS DOUBLE), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def io_bucketed_join(spark, sf_dir):
    """Co-located (bucketed) join: both fact tables written with
    `bucketBy(8, key).sortBy(key)` into catalog tables, then joined on
    the bucket key — the scan feeds a sort-merge join with NO exchange
    on either side (asserted in tests/test_plans.py). Only a cheap
    per-bucket local sort remains: Spark trusts write-time ordering
    only under the legacy one-file-per-bucket rule.

    This is the 100 TB pattern for repeatedly-joined fact tables: pay
    the shuffle once at write time, then every subsequent join on the
    bucket key is exchange-free. At scale the bucket count is sized so
    one bucket of the larger table fits an executor core (e.g. 16k
    buckets for 100 TB ≈ 6 GB/bucket), and both tables MUST agree on
    it: mismatched bucket counts fall back to a plain shuffle join.
    """
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    names = {"orders": f"ksa_orders_b_{tag}", "lineitem": f"ksa_lineitem_b_{tag}"}
    keys = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
    for tbl, cat_name in names.items():
        if not spark.catalog.tableExists(cat_name):
            path = os.path.join(
                tempfile.gettempdir(), f"ksa_bucketed_{tag}", tbl
            )
            (
                t(spark, sf_dir, tbl)
                .write.mode("overwrite")
                .bucketBy(8, keys[tbl])
                .sortBy(keys[tbl])
                .option("path", path)
                .saveAsTable(cat_name)
            )
    o = spark.table(names["orders"])
    li = spark.table(names["lineitem"])
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(
                    F.round("l_extendedprice", 2).cast("decimal(18,2)")
                ).cast("double"),
                2,
            ).alias("revenue"),
        )
    )
