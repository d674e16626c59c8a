"""Fourth IO/feature wave: distributed parquet footer statistics,
leave-one-out target encoding, and mutual information.

Determinism strategy:
- row-group stats are READ, not computed — both engines report the
  same parquet footer bytes;
- target encoding's LOO chain ((S - x + m*mu) / (n - 1 + m)) runs on
  exact integer cents with one shared double mu, a single identical
  IEEE chain per row;
- mutual information is the entropy family's pattern: every ln
  argument is an exact integer product/ratio.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from .base import query, t

# --------------------------------------------------------------------------
# Distributed parquet footer statistics
# --------------------------------------------------------------------------


def parquet_rowgroup_stats(spark, sf_dir):
    """Per-row-group footer statistics of the lineitem parquet,
    gathered by DISTRIBUTING footer reads: the file list becomes a
    1-column DataFrame, each partition opens its files with pyarrow
    and emits (file, row_group, rows, min, max) for the key column.
    Footer reads are O(KB) regardless of file size, so this scales
    with file COUNT — the only shape that works for a 100 TB table's
    ~1e5 files (never a driver loop over footers). The per-row-group
    detail is cross-checked against DuckDB's parquet_metadata() in
    tests/test_io4.py; the registered query below verifies footer
    TRUTHFULNESS against the data itself (the driver's oracle can
    only see table views, not file paths)."""
    import pandas as pd
    from pyspark.sql import types as T

    path = os.path.join(sf_dir, "lineitem.parquet")
    files = sorted(glob.glob(path)) or sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )
    schema = T.StructType(
        [
            T.StructField("file_name", T.StringType()),
            T.StructField("row_group_id", T.LongType()),
            T.StructField("n_rows", T.LongType()),
            T.StructField("min_orderkey", T.LongType()),
            T.StructField("max_orderkey", T.LongType()),
        ]
    )
    if not files:
        return spark.createDataFrame([], schema)
    fdf = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(min(len(files), 32))

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                base = os.path.basename(p)
                for rg_i in range(md.num_row_groups):
                    rg = md.row_group(rg_i)
                    for c_i in range(rg.num_columns):
                        col = rg.column(c_i)
                        if col.path_in_schema != "l_orderkey":
                            continue
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            continue
                        rows.append(
                            (
                                base,
                                rg_i,
                                rg.num_rows,
                                int(st.min),
                                int(st.max),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name",
                    "row_group_id",
                    "n_rows",
                    "min_orderkey",
                    "max_orderkey",
                ],
            )

    return fdf.mapInPandas(read_footers, schema)


@query(
    "io_parquet_rowgroup_stats",
    # Footer truthfulness: the row counts and key ranges the scan
    # planner would prune on, read from the parquet FOOTERS by
    # distributed pyarrow (parquet_rowgroup_stats above), must agree
    # with the data itself. The oracle recomputes the same aggregate
    # from the rows; any stale/wrong footer statistic breaks the hash.
    # Per-row-group granularity is pinned against DuckDB's
    # parquet_metadata() in tests/test_io4.py.
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_orderkey) AS BIGINT) AS min_orderkey,
           CAST(max(l_orderkey) AS BIGINT) AS max_orderkey
    FROM lineitem
    HAVING count(*) > 0
    """,
)
def io_parquet_rowgroup_stats(spark, sf_dir):
    """Aggregate of the distributed footer-statistics read (see
    parquet_rowgroup_stats): total rows and global key range as the
    FOOTERS report them, oracled against the data. Reads only
    metadata — zero data I/O on the Spark side."""
    rg = parquet_rowgroup_stats(spark, sf_dir)
    out = rg.agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.min("min_orderkey").cast("bigint").alias("min_orderkey"),
        F.max("max_orderkey").cast("bigint").alias("max_orderkey"),
    )
    return out.where(
        F.col("n_rows").isNotNull() & (F.col("n_rows") > 0)
    )


# --------------------------------------------------------------------------
# Leave-one-out target encoding
# --------------------------------------------------------------------------

_TE_M = 10


@query(
    "ml_target_encoding",
    # Smoothed leave-one-out target encoding of the customer's nation
    # against order value — the feature-engineering staple whose naive
    # form leaks the row's own label. enc_i =
    # (S_nat - x_i + m*mu) / (n_nat - 1 + m), m=10, all on exact
    # integer cents with one shared double mu. The chain is a single
    # identical IEEE sequence on both engines, so it is emitted
    # UNROUNDED (the round-6 terminating-tie lesson: at sf1 ~10 of
    # 1.5M rows landed exactly on x.xxxxxx5 shortest-decimal ties
    # where Spark's BigDecimal HALF_UP and DuckDB's scaled-multiply
    # round differently — caught by the sf1 window, fixed by removing
    # the engine-side round).
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey, c_nationkey AS nat,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
    ),
    g AS (
        SELECT nat, count(*) AS n, sum(cents) AS s
        FROM o GROUP BY nat
    ),
    mu AS (
        SELECT CAST(sum(s) AS DOUBLE) / sum(n) AS mu FROM g
    )
    SELECT o_orderkey, nat,
           (CAST(s - cents AS DOUBLE) + {_TE_M} * mu)
                 / (n - 1 + {_TE_M}) / 100.0 AS nation_enc
    FROM o JOIN g USING (nat) CROSS JOIN mu
    """,
)
def ml_target_encoding(spark, sf_dir):
    """LOO target encoding, emitted per order in dollars. Plan: the
    orders->customer join is the one fact shuffle (broadcast-able dim
    at gate scale, co-partitioned at 100 TB); the per-nation moment
    relation is BOUNDED at 25 rows and broadcast back with the 1-row
    global mean, so the encoding itself is map-only. Cents keep S - x
    exact; mu is the single shared double."""
    o = (
        t(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                t(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "o_orderkey",
            F.col("c_nationkey").alias("nat"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    g = o.groupBy("nat").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    mu = g.agg(
        (F.sum("s").cast("double") / F.sum("n")).alias("mu")
    )
    return (
        o.join(F.broadcast(g), "nat")
        .crossJoin(F.broadcast(mu))
        .select(
            "o_orderkey",
            "nat",
            (
                (
                    (F.col("s") - F.col("cents")).cast("double")
                    + _TE_M * F.col("mu")
                )
                / (F.col("n") - 1 + _TE_M)
                / 100.0
            ).alias("nation_enc"),
        )
    )


# --------------------------------------------------------------------------
# Mutual information between categorical features
# --------------------------------------------------------------------------


@query(
    "ml_mutual_information",
    # MI (nats) and normalized MI between event_type and hour-of-day:
    # the feature-redundancy screen. MI = sum c/N * ln(c*N / (r*col))
    # over the exact integer contingency cells; H(X), H(Y) from the
    # margins; NMI = MI / sqrt(Hx*Hy).
    oracle="""
    WITH cell AS (
        SELECT event_type AS x,
               CAST(extract(hour FROM ts) AS BIGINT) AS y,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    rx AS (SELECT x, sum(c) AS r FROM cell GROUP BY x),
    cy AS (SELECT y, sum(c) AS k FROM cell GROUP BY y),
    n AS (SELECT sum(c) AS nn FROM cell),
    mi AS (
        SELECT sum(CAST(c AS DOUBLE) / nn
                   * ln(CAST(c AS DOUBLE) * nn
                        / (CAST(r AS DOUBLE) * k))) AS mi
        FROM cell JOIN rx USING (x) JOIN cy USING (y) CROSS JOIN n
    ),
    hx AS (
        SELECT -sum(CAST(r AS DOUBLE) / nn
                    * ln(CAST(r AS DOUBLE) / nn)) AS h
        FROM rx CROSS JOIN n
    ),
    hy AS (
        SELECT -sum(CAST(k AS DOUBLE) / nn
                    * ln(CAST(k AS DOUBLE) / nn)) AS h
        FROM cy CROSS JOIN n
    )
    SELECT round(mi.mi, 6) AS mi_nats,
           round(hx.h, 6) AS h_x,
           round(hy.h, 6) AS h_y,
           round(mi.mi / sqrt(hx.h * hy.h), 6) AS nmi
    FROM mi CROSS JOIN hx CROSS JOIN hy
    """,
)
def ml_mutual_information(spark, sf_dir):
    """MI(event_type; hour-of-day) with normalized MI. The contingency
    relation is bounded at |types| x 24 cells; margins and entropies
    are algebra over it; one fact-sized map-side-combinable count is
    the only data-scale stage."""
    e = t(spark, sf_dir, "events")
    cell = e.groupBy(
        F.col("event_type").alias("x"),
        F.hour("ts").cast("long").alias("y"),
    ).agg(F.count(F.lit(1)).alias("c"))
    rx = cell.groupBy("x").agg(F.sum("c").alias("r"))
    cy = cell.groupBy("y").agg(F.sum("c").alias("k"))
    n = cell.agg(F.sum("c").alias("nn"))
    joined = (
        cell.join(F.broadcast(rx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(n))
    )
    mi = joined.agg(
        F.sum(
            F.col("c").cast("double")
            / F.col("nn")
            * F.log(
                F.col("c").cast("double")
                * F.col("nn")
                / (F.col("r").cast("double") * F.col("k"))
            )
        ).alias("mi")
    )
    hx = rx.crossJoin(F.broadcast(n)).agg(
        (
            -F.sum(
                F.col("r").cast("double")
                / F.col("nn")
                * F.log(F.col("r").cast("double") / F.col("nn"))
            )
        ).alias("h")
    )
    hy = cy.crossJoin(F.broadcast(n)).agg(
        (
            -F.sum(
                F.col("k").cast("double")
                / F.col("nn")
                * F.log(F.col("k").cast("double") / F.col("nn"))
            )
        ).alias("h")
    )
    return (
        mi.crossJoin(hx.select(F.col("h").alias("hx")))
        .crossJoin(hy.select(F.col("h").alias("hy")))
        .select(
            F.round(F.col("mi"), 6).alias("mi_nats"),
            F.round(F.col("hx"), 6).alias("h_x"),
            F.round(F.col("hy"), 6).alias("h_y"),
            F.round(
                F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6
            ).alias("nmi"),
        )
    )
