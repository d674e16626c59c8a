"""Eleventh analytics wave: winnowing fingerprints, the salted
heavy-key aggregation pattern, and segment migration matrices.

Determinism strategy:
- winnowing is pure array algebra on portable 60-bit hashes — window
  minima are exact integer comparisons, so fingerprint selection is
  engine-invariant by construction;
- the salted aggregate only re-routes PARTIAL integer sums; integer
  addition is associative-commutative, so the result is bit-equal to
  the direct groupBy no matter how the salt scatters rows;
- segment migration uses integer purchase-count thresholds and an
  integer epoch-day midpoint split.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sketches import portable_u64, portable_u64_sql
from .base import query, t

# --------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer et al. 2003, MOSS)
# --------------------------------------------------------------------------

_WIN_K = 4  # tokens per k-gram
_WIN_W = 5  # k-grams per winnowing window


@query(
    "doc_winnowing_fingerprint",
    # Winnowing: hash every 4-token k-gram, slide a 5-window over the
    # hash sequence, keep each window's MINIMUM — the fingerprint set
    # that guarantees any shared run of >= w+k-1 tokens shares a
    # fingerprint (the MOSS plagiarism-detection selection rule).
    # Reported per doc: fingerprints kept, how many also appear in
    # another doc, and the shared fraction.
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               regexp_extract_all(lower(trim(text)), '\\S+') AS tk
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_transform(
                   range(1, len(tk) - {_WIN_K} + 2),
                   i -> {portable_u64_sql(
                       "array_to_string(tk[i:i+" + str(_WIN_K - 1) + "], ' ')",
                       "winnow")}
               ) AS gh
        FROM b WHERE len(tk) >= {_WIN_K}
    ),
    fp AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, len(gh) - {_WIN_W} + 2),
                   j -> list_min(gh[j:j+{_WIN_W - 1}])
               ))) AS f
        FROM g WHERE len(gh) >= {_WIN_W}
    ),
    fc AS (SELECT f, count(*) AS docs FROM fp GROUP BY f)
    SELECT fp.doc_id,
           CAST(count(*) AS BIGINT) AS n_fingerprints,
           CAST(sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           round(CAST(sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS shared_frac
    FROM fp JOIN fc USING (f)
    GROUP BY fp.doc_id
    """,
)
def doc_winnowing_fingerprint(spark, sf_dir):
    """Winnowing fingerprint census. The whole selection — k-gram
    hashes, sliding window minima, per-doc dedup — happens INSIDE the
    row as array transforms (no explode until the final bounded
    fingerprint set), so the only shuffles are the fingerprint count
    and the join back. Guarantees (shared-run detection) follow from
    the winnowing theorem, and because both engines compare the same
    60-bit integers the selected set is identical — the oracle replays
    fingerprint selection itself."""
    d = t(spark, sf_dir, "documents")
    tk = F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
    )
    b = d.select("doc_id", tk.alias("tk"))
    gh = F.transform(
        F.sequence(
            F.lit(1), F.size(F.col("tk")) - (_WIN_K - 1)
        ),
        lambda i: portable_u64(
            F.concat_ws(" ", F.slice(F.col("tk"), i, F.lit(_WIN_K))),
            salt="winnow",
        ),
    )
    g = b.where(F.size(F.col("tk")) >= _WIN_K).select(
        "doc_id", gh.alias("gh")
    )
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("gh")) - (_WIN_W - 1)),
            lambda j: F.array_min(F.slice(F.col("gh"), j, F.lit(_WIN_W))),
        )
    )
    fp = (
        g.where(F.size(F.col("gh")) >= _WIN_W)
        .select("doc_id", F.explode(fps).alias("f"))
        .distinct()
    )
    fc = fp.groupBy("f").agg(F.count(F.lit(1)).alias("docs"))
    return (
        fp.join(fc, "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
            F.sum((F.col("docs") > 1).cast("long"))
            .cast("bigint")
            .alias("n_shared"),
            F.round(
                F.sum((F.col("docs") > 1).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("shared_frac"),
        )
    )


# --------------------------------------------------------------------------
# Salted heavy-key aggregation
# --------------------------------------------------------------------------

_SALT_B = 32


@query(
    "agg_salted_heavy_key",
    # The skew pattern as a first-class operator: aggregate lineitem
    # by l_returnflag (3 enormous keys — the shape where a plain
    # groupBy sends each key's entire partial stream to ONE reducer)
    # via an explicit salt: phase 1 groups on (key, hash%32), phase 2
    # merges the <= 3*32 partials. Integer sums are associative-
    # commutative, so the result is bit-equal to the direct groupBy —
    # which is exactly what this oracle computes.
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS sum_price_cents
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted_heavy_key(spark, sf_dir):
    """Two-phase salted aggregation: the anti-skew rewrite every
    100 TB pipeline needs when group keys are few and huge. Phase 1's
    shuffle spreads each heavy key over 32 reducers; phase 2 merges a
    bounded 3x32-row relation. (Spark's partial aggregation already
    de-skews simple sums — this operator exists for the shapes it
    can't, e.g. exact distinct counts per heavy key — and is pinned
    here against the direct-groupBy oracle so the rewrite is proven
    result-identical.)"""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .alias("cents"),
        F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(_SALT_B)
        ).alias("__salt"),
    )
    partial = li.groupBy("l_returnflag", "__salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("qty").alias("pq"),
        F.sum("cents").alias("pc"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("pq").cast("bigint").alias("sum_qty"),
        F.sum("pc").cast("bigint").alias("sum_price_cents"),
    )


# --------------------------------------------------------------------------
# Segment migration matrix
# --------------------------------------------------------------------------


@query(
    "events_segment_migration",
    # Retention analytics: split the timeline at its integer epoch-day
    # midpoint, segment every user in each half by purchase count
    # (low<=2 / mid 3-6 / high>=7 — integer thresholds sized to the
    # per-half distribution, median 6), and count
    # users per (before, after) cell. The matrix diagonal is
    # stability; below-diagonal is churn.
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               event_type
        FROM events
    ),
    span AS (
        SELECT (min(day) + max(day)) // 2 AS mid FROM e
    ),
    seg AS (
        SELECT user_id,
               sum(CASE WHEN event_type = 'purchase' AND day <= mid
                        THEN 1 ELSE 0 END) AS p1,
               sum(CASE WHEN event_type = 'purchase' AND day > mid
                        THEN 1 ELSE 0 END) AS p2
        FROM e CROSS JOIN span
        GROUP BY user_id
    )
    SELECT CASE WHEN p1 >= 7 THEN 'high'
                WHEN p1 >= 3 THEN 'mid' ELSE 'low' END AS seg_before,
           CASE WHEN p2 >= 7 THEN 'high'
                WHEN p2 >= 3 THEN 'mid' ELSE 'low' END AS seg_after,
           CAST(count(*) AS BIGINT) AS n_users
    FROM seg
    GROUP BY seg_before, seg_after
    """,
)
def events_segment_migration(spark, sf_dir):
    """User segment migration across the timeline midpoint. One
    conditional aggregate per user (the fact shuffle, map-side
    combinable), a broadcast 1-row midpoint, and a bounded 3x3
    classification aggregate. Integer thresholds everywhere — the
    matrix cannot flip engines."""
    e = t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        "event_type",
    )
    span = e.agg(
        F.floor((F.min("day") + F.max("day")) / 2)
        .cast("long")
        .alias("mid")
    )
    seg = (
        e.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            F.sum(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("day") <= F.col("mid"))
                ).cast("long")
            ).alias("p1"),
            F.sum(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("day") > F.col("mid"))
                ).cast("long")
            ).alias("p2"),
        )
    )

    def cls(c):
        return (
            F.when(c >= 7, "high").when(c >= 3, "mid").otherwise("low")
        )

    return seg.groupBy(
        cls(F.col("p1")).alias("seg_before"),
        cls(F.col("p2")).alias("seg_after"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
