"""Fifth IO wave (round 7): custom Python DataSource scan, forward
as-of join, dedup-rate curve, session path entropy.

The DataSource row is io_python_datasource_scan's whole point: the
connector API surface (DataSource -> Reader -> partitions -> read)
is exercised end to end, and because the generated rows are a pure
function of (seed, index) over the portable md5 hash, the CUSTOM
CONNECTOR ITSELF is exactly DuckDB-oracled — the oracle regenerates
the identical rows with generate_series + md5.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sketches import U64_SQL_TEMPLATE as U64
from .base import query, t

_N_ROWS = 2000


def _u(expr: str) -> str:
    return U64.format(expr=expr)


@query(
    "io_python_datasource_scan",
    # Aggregate over the custom tradegen source: per (instrument,
    # direction) count and exact integer micro-unit price/amount sums
    # (DECIMAL outputs are driver-unsafe; *1e6 -> BIGINT is lossless at
    # the 6-dp generator grain). The oracle
    # replays the generator field-for-field from generate_series —
    # a custom connector with a full correctness gate.
    oracle=f"""
    WITH g AS (
      SELECT i,
        ['BTC-OPT-A','BTC-OPT-B','ETH-OPT-A','ETH-OPT-B']
          [({_u("('7:' || CAST(i AS VARCHAR) || ':i')")} % 4) + 1]
          AS instrument,
        ['buy','sell','zero']
          [({_u("('7:' || CAST(i AS VARCHAR) || ':d')")} % 3) + 1]
          AS direction,
        round(100.0 + ({_u("('7:' || CAST(i AS VARCHAR) || ':p')")}
                       % 1000000) / 100.0, 6) AS price,
        round(1.0 + ({_u("('7:' || CAST(i AS VARCHAR) || ':a')")}
                     % 1000) / 10.0, 6) AS amount
      FROM generate_series(0, {_N_ROWS - 1}) t(i)
    )
    SELECT instrument, direction,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(price AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS sum_price_micro,
           CAST(sum(CAST(amount AS DECIMAL(18,6))) * 1000000 AS BIGINT)
             AS sum_amount_micro
    FROM g GROUP BY instrument, direction
    """,
)
def io_python_datasource_scan(spark, sf_dir):
    """Scan the registered Python DataSource (4 range partitions — one
    task each, generator parallelism identical to a real partitioned
    connector) and aggregate. Cited: reference consumer.rs:56-111 (the
    external-feed ingest this API generalizes)."""
    from ..sources import register

    register(spark)
    df = (
        spark.read.format("tradegen")
        .option("n_rows", _N_ROWS)
        .option("n_parts", 4)
        .option("seed", 7)
        .load()
    )
    return df.groupBy("instrument", "direction").agg(
        F.count("*").cast("bigint").alias("n"),
        (F.sum(F.col("price").cast("decimal(18,6)")) * 1_000_000)
        .cast("bigint")
        .alias("sum_price_micro"),
        (F.sum(F.col("amount").cast("decimal(18,6)")) * 1_000_000)
        .cast("bigint")
        .alias("sum_amount_micro"),
    )


@query(
    "join_asof_forward",
    # FORWARD as-of: for every click, the EARLIEST purchase by the
    # same user at or after it (the conversion-lookahead direction;
    # join_asof covers backward). Same linear union+window shape with
    # the ordering reversed.
    oracle="""
    WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
         p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         j AS (
           SELECT c.event_id AS cid, p.value AS pv,
                  row_number() OVER (PARTITION BY c.event_id
                                     ORDER BY p.ts ASC, p.event_id ASC) AS rn
           FROM c JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts
         )
    SELECT c.event_id,
           CAST(CASE WHEN j.cid IS NOT NULL THEN 1.0 ELSE 0.0 END
                AS DOUBLE) AS converts,
           round(coalesce(j.pv, -1.0), 6) AS next_purchase_value
    FROM c LEFT JOIN (SELECT cid, pv FROM j WHERE rn = 1) j
      ON c.event_id = j.cid
    """,
)
def join_asof_forward(spark, sf_dir):
    """Forward direction via the same ops.asof_join machinery on
    NEGATED microsecond timestamps (first-at-or-after under t equals
    last-at-or-before under -t, with the tiebreak likewise flipped to
    keep the smallest event_id) — one group shuffle, no time-range
    join, direction is a pure ordering transform."""
    from ..ops import asof_join

    e = t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        (-F.unix_micros(F.col("ts"))).alias("neg_ts"),
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user_id"),
        (-F.unix_micros(F.col("ts"))).alias("r_neg_ts"),
        (-F.col("event_id")).alias("r_neg_event_id"),
        F.col("value").alias("r_value"),
    )
    joined = asof_join(
        left,
        right,
        left_on="neg_ts",
        right_on="r_neg_ts",
        left_by="user_id",
        right_by="r_user_id",
        right_tiebreak="r_neg_event_id",
        value_cols=["r_value"],
    )
    return joined.select(
        "event_id",
        F.when(F.col("r_value").isNotNull(), 1.0).otherwise(0.0).alias(
            "converts"
        ),
        F.round(F.coalesce("r_value", F.lit(-1.0)), 6).alias(
            "next_purchase_value"
        ),
    )


@query(
    "corpus_dedup_curve",
    # Duplicate-rate curve: distinct count and dup rate of the corpus
    # under 3 normalizations of increasing aggressiveness — raw text,
    # lowercased-whitespace-normalized, first-8-token prefix. The
    # standard "how much would dedup at each tier remove" audit.
    oracle="""
    WITH d AS (
      SELECT text,
             md5(text) AS h_raw,
             md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS h_norm,
             md5(array_to_string(
                   regexp_extract_all(lower(text), '\\S+')[1:8], ' '))
               AS h_prefix
      FROM documents
    )
    SELECT tier, n_docs, n_distinct,
           round(1.0 - CAST(n_distinct AS DOUBLE) / n_docs, 6) AS dup_rate
    FROM (
      SELECT 'raw' AS tier, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT h_raw) AS BIGINT) AS n_distinct FROM d
      UNION ALL
      SELECT 'norm', CAST(count(*) AS BIGINT),
             CAST(count(DISTINCT h_norm) AS BIGINT) FROM d
      UNION ALL
      SELECT 'prefix8', CAST(count(*) AS BIGINT),
             CAST(count(DISTINCT h_prefix) AS BIGINT) FROM d
    )
    WHERE n_docs > 0
    """,
)
def corpus_dedup_curve(spark, sf_dir):
    """Three distinct-counts over one scan (each hash tier is a
    map-side expression; the three count-distincts run as separate
    aggregates UNIONed — never one multi-distinct Expand that
    replicates rows, per the diag_table_profile rule)."""
    d = t(spark, sf_dir, "documents").select(
        F.md5("text").alias("h_raw"),
        F.md5(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("h_norm"),
        F.md5(
            F.array_join(
                F.slice(
                    F.regexp_extract_all(
                        F.lower("text"), F.lit(r"\S+"), F.lit(0)
                    ),
                    1,
                    8,
                ),
                " ",
            )
        ).alias("h_prefix"),
    )
    out = None
    for tier, col in (("raw", "h_raw"), ("norm", "h_norm"), ("prefix8", "h_prefix")):
        part = d.agg(
            F.lit(tier).alias("tier"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
        )
        out = part if out is None else out.unionAll(part)
    return out.filter(F.col("n_docs") > 0).select(
        "tier",
        "n_docs",
        "n_distinct",
        F.round(
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_docs"), 6
        ).alias("dup_rate"),
    )


@query(
    "events_session_entropy",
    # Per-user Shannon entropy of the event-type distribution — the
    # behavioral-diversity score. Counts are exact; each type's
    # -p ln p term is one identical chain on integer ratios; the <= 5
    # per-user terms sum inside one aggregate (5 doubles, order noise
    # ~1e-16 against a round-6 grain — and the per-user term count is
    # bounded, unlike a data-sized float sum).
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS k
      FROM events GROUP BY 1, 2
    ), u AS (
      SELECT user_id, CAST(sum(k) AS BIGINT) AS n FROM c GROUP BY user_id
    )
    SELECT c.user_id,
           max(u.n) AS n_events,
           round(sum(-(CAST(k AS DOUBLE) / u.n)
                     * ln(CAST(k AS DOUBLE) / u.n)), 6) AS entropy
    FROM c JOIN u ON c.user_id = u.user_id
    GROUP BY c.user_id
    """,
)
def events_session_entropy(spark, sf_dir):
    """Behavioral entropy: two aggregates on the same user key (one
    exchange reused), bounded 5-term entropy sum per user."""
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("k")
    )
    u = c.groupBy("user_id").agg(F.sum("k").cast("bigint").alias("n"))
    p = F.col("k").cast("double") / F.col("n")
    return (
        c.join(u, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("n").alias("n_events"),
            F.round(F.sum(-p * F.log(p)), 6).alias("entropy"),
        )
    )
