"""Corpus-maintenance wave 3: incremental batch-vs-corpus dedup, the
log2 size histogram, and cohort LTV curves.

Determinism strategy:
- incremental dedup replays the proven portable constructions: exact
  tier = portable_u64 content hash equality, near tier = the
  sketch_minhash_portable 16-slot signature with a >=4-slot agreement
  cut — both fully hash-replayed by the oracle, false positives
  included;
- log2 buckets come from length(bin(cents)) — pure integer/string
  ops, no cross-libm log2;
- the LTV curve is exact integer cents with DECIMAL cumulative sums
  over per-cohort PARTITIONED windows.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..ops import data_sized_partitions
from ..sketches import U64_SQL_TEMPLATE as U64
from ..sketches import portable_u64
from .base import query, t

# --------------------------------------------------------------------------
# Incremental (new-batch-vs-corpus) dedup
# --------------------------------------------------------------------------

_MH_K = 16
_MH_MIN_MATCH = 4


@query(
    "doc_incremental_dedup",
    # The nightly-ingest question: which docs of the NEW batch
    # (doc_id%10=0) already exist in the CORPUS (doc_id%10<>0)?
    # exact tier: portable content-hash anti/semi join;
    # near tier: >=4/16 agreeing portable MinHash slots against any
    # old doc. The oracle replays both hash constructions, so the
    # classification — estimation error and false positives included —
    # is hash-checked end to end.
    oracle=f"""
    WITH dt AS (
      SELECT doc_id,
             lower(trim(text)) AS txt,
             regexp_extract_all(lower(trim(text)), '\\S+') AS tk,
             doc_id % 10 = 0 AS is_new
      FROM documents
    ), ch AS (
      SELECT doc_id, is_new, {U64.format(expr="txt")} AS h FROM dt
    ), exact AS (
      SELECT DISTINCT n.doc_id
      FROM ch n JOIN ch o ON n.h = o.h AND o.is_new = FALSE
      WHERE n.is_new
    ), sh AS (
      SELECT DISTINCT doc_id, is_new,
             array_to_string(tk[g:g+2], ' ') AS s
      FROM dt, unnest(range(1, greatest(len(tk)-2,0)+1)) AS u(g)
    ), salts AS (
      SELECT unnest(range(0, {_MH_K})) AS slot
    ), sig AS (
      SELECT doc_id, is_new, slot,
             min({U64.format(expr="(s || ':' || CAST(slot AS VARCHAR))")})
                 AS mh
      FROM sh, salts GROUP BY doc_id, is_new, slot
    ), nearc AS (
      SELECT n.doc_id, o.doc_id AS od, count(*) AS nm
      FROM sig n JOIN sig o ON n.slot = o.slot AND n.mh = o.mh
                           AND o.is_new = FALSE
      WHERE n.is_new
      GROUP BY 1, 2
    ), nears AS (
      SELECT doc_id, count(*) AS n_near FROM nearc
      WHERE nm >= {_MH_MIN_MATCH} GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
                WHEN coalesce(n_near, 0) > 0 THEN 'near'
                ELSE 'clean' END AS status,
           CAST(coalesce(n_near, 0) AS BIGINT) AS n_near_matches
    FROM (SELECT doc_id FROM dt WHERE is_new) d
    LEFT JOIN exact e USING (doc_id)
    LEFT JOIN nears USING (doc_id)
    """,
)
def doc_incremental_dedup(spark, sf_dir):
    """Classify every new-batch document against the existing corpus:
    'exact' (content-hash match), 'near' (>=4/16 MinHash slots agree
    with some old doc), or 'clean'. Plan: ONE signature build over the
    whole corpus (the sketch_minhash_portable shape — one groupBy
    computes all 16 mins), then new x old joins restricted by the
    is_new flag on bounded (slot, minhash) keys — at 100 TB the old
    side's signatures are a standing table and only the batch is
    re-hashed, which is exactly what this plan degenerates to when the
    old signatures are cached."""
    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    txt = F.lower(F.trim(F.col("text")))
    toks = F.regexp_extract_all(txt, F.lit(r"\S+"), 0)
    base = d.select(
        "doc_id",
        txt.alias("txt"),
        toks.alias("tk"),
        (F.col("doc_id") % 10 == 0).alias("is_new"),
    )
    ch = base.select(
        "doc_id", "is_new", portable_u64(F.col("txt")).alias("h")
    )
    exact = (
        ch.where("is_new")
        .alias("n")
        .join(
            ch.where(~F.col("is_new")).select("h").distinct().alias("o"),
            "h",
            "left_semi",
        )
        .select("doc_id")
        .distinct()
    )
    shingles = F.when(
        F.size(F.col("tk")) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(F.col("tk")) - 2),
                lambda i: F.array_join(F.slice(F.col("tk"), i, 3), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = base.select(
        "doc_id", "is_new", F.explode(shingles).alias("s")
    )
    sig = sh.groupBy("doc_id", "is_new").agg(
        *[
            F.min(portable_u64(F.col("s"), salt=i)).alias(f"m{i}")
            for i in range(_MH_K)
        ]
    )
    slots = sig.select(
        "doc_id",
        "is_new",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("slot"),
                        F.col(f"m{i}").alias("mh"),
                    )
                    for i in range(_MH_K)
                ]
            )
        ).alias("x"),
    ).select("doc_id", "is_new", "x.slot", "x.mh")
    nearc = (
        slots.where("is_new")
        .alias("n")
        .join(
            slots.where(~F.col("is_new")).alias("o"),
            (F.col("n.slot") == F.col("o.slot"))
            & (F.col("n.mh") == F.col("o.mh")),
        )
        .groupBy(
            F.col("n.doc_id").alias("doc_id"),
            F.col("o.doc_id").alias("od"),
        )
        .agg(F.count(F.lit(1)).alias("nm"))
    )
    nears = (
        nearc.where(F.col("nm") >= _MH_MIN_MATCH)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    new_docs = base.where("is_new").select("doc_id")
    return (
        new_docs.join(
            exact.withColumn("is_exact", F.lit(True)), "doc_id", "left"
        )
        .join(nears, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact"), "exact")
            .when(F.coalesce(F.col("n_near"), F.lit(0)) > 0, "near")
            .otherwise("clean")
            .alias("status"),
            F.coalesce(F.col("n_near"), F.lit(0))
            .cast("bigint")
            .alias("n_near_matches"),
        )
    )


# --------------------------------------------------------------------------
# Log2 (power-of-two) histogram
# --------------------------------------------------------------------------


@query(
    "agg_log2_histogram",
    # Power-of-two bucket histogram of order value in cents — the
    # latency/size-histogram shape every observability stack uses.
    # bucket = length(bin(cents)) = floor(log2)+1 as pure integer and
    # string ops: no cross-libm log2 anywhere near a bucket edge.
    oracle="""
    WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    SELECT CAST(length(bin(cents)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM c GROUP BY bucket
    """,
)
def agg_log2_histogram(spark, sf_dir):
    """Log2 histogram of order totals: one map-side-combinable groupBy
    into at most 64 buckets. The bucket key is the binary-string
    length of the integer cents — both engines agree exactly where
    floor(log2(double)) could flip at 2^k boundaries."""
    c = t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents")
    )
    return c.groupBy(
        F.length(F.bin(F.col("cents"))).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("cents").cast("bigint").alias("min_cents"),
        F.max("cents").cast("bigint").alias("max_cents"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


# --------------------------------------------------------------------------
# Cohort LTV curve
# --------------------------------------------------------------------------


@query(
    "events_cohort_ltv",
    # Cumulative revenue per signup cohort by age-in-days — the LTV
    # curve. Cohort = the user's first-seen day; revenue = purchase
    # value in integer cents; cumulative sums are exact BIGINT cents over
    # per-cohort PARTITIONED windows (bounded partitions: one row per
    # age), so the money column never touches float accumulation.
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT)
                    ELSE 0 END AS cents
        FROM events
    ),
    cohort AS (
        SELECT user_id, min(day) AS c0 FROM e GROUP BY user_id
    ),
    daily AS (
        SELECT c0, day - c0 AS age,
               count(DISTINCT e.user_id) AS n_active,
               sum(cents) AS rev
        FROM e JOIN cohort USING (user_id)
        GROUP BY c0, day - c0
    )
    SELECT CAST(c0 AS BIGINT) AS cohort_day,
           CAST(age AS BIGINT) AS age_days,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(sum(rev) OVER (PARTITION BY c0 ORDER BY age
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_revenue_cents
    FROM daily
    """,
)
def events_cohort_ltv(spark, sf_dir):
    """LTV curve: per (cohort first-day, age) active users and
    cumulative purchase revenue. Two fact-sized stages (the cohort min
    and the daily aggregate, both map-side combinable); the cumulative
    window partitions by cohort over the bounded (cohort x age)
    relation. Epoch-day integers avoid timezone-dependent date
    rendering."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("cents"),
    )
    cohort = e.groupBy("user_id").agg(F.min("day").alias("c0"))
    daily = (
        e.join(cohort, "user_id")
        .groupBy("c0", (F.col("day") - F.col("c0")).alias("age"))
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.sum("cents").alias("rev"),
        )
    )
    wc = (
        W.partitionBy("c0")
        .orderBy("age")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return daily.select(
        F.col("c0").cast("bigint").alias("cohort_day"),
        F.col("age").cast("bigint").alias("age_days"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.sum("rev").over(wc).cast("bigint").alias(
            "cum_revenue_cents"
        ),
    )
