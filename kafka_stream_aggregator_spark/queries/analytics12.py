"""Twelfth analytics wave: sequence pattern matching
(MATCH_RECOGNIZE-lite), bitmap presence aggregation, and asymmetric
containment dedup.

Determinism strategy:
- the event-sequence string is built under the total (ts, event_id)
  order, so both engines scan the identical string with the identical
  ASCII-only regex (Java regex and RE2 agree on this pattern class);
- bitmap masks are pure integer bit algebra;
- containment thresholds compare exact integer ratios (one IEEE
  division of two integers).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..ops import data_sized_partitions
from ..sketches import portable_u64, portable_u64_sql
from .base import query, t

# --------------------------------------------------------------------------
# Sequence pattern matching over per-user event strings
# --------------------------------------------------------------------------

_PATTERN = "v+c*p"  # views, optional clicks, then a purchase


@query(
    "events_pattern_regex",
    # MATCH_RECOGNIZE-lite: encode each user's totally-ordered event
    # stream as a character string (v/c/p/s/e initials) and count
    # non-overlapping matches of the funnel pattern v+c*p. The string
    # DSL expresses sequence patterns the relational funnel operators
    # can't (arbitrary regex over the event alphabet) while staying
    # exactly cross-engine: same order, same ASCII regex, same
    # greedy non-overlapping scan.
    oracle=f"""
    WITH s AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, '{_PATTERN}')) AS BIGINT)
               AS n_matches,
           len(regexp_extract_all(seq, '{_PATTERN}')) > 0
               AS has_conversion_path
    FROM s
    """,
)
def events_pattern_regex(spark, sf_dir):
    """Funnel-pattern counting by regex over per-user event strings.
    One shuffle on user_id builds the ordered string (array_sort over
    the collected (ts,event_id,initial) structs — deterministic, no
    within-group ordering assumption on collect_list); the regex scan
    is map-only. Per-user state is that user's event count — the
    per-entity bound every sessionization op already lives with."""
    e = t(spark, sf_dir, "events")
    s = (
        e.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring(F.col("event_type"), 1, 1).alias("ch"),
            ).alias("x"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list("x")),
                    lambda x: x["ch"],
                ),
            ).alias("seq")
        )
    )
    n_matches = F.size(
        F.regexp_extract_all(F.col("seq"), F.lit(_PATTERN), 0)
    ).cast("bigint")
    return s.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        n_matches.alias("n_matches"),
        (n_matches > 0).alias("has_conversion_path"),
    )


# --------------------------------------------------------------------------
# Bitmap presence aggregation
# --------------------------------------------------------------------------


@query(
    "agg_bitset_presence",
    # Bitmap-index semantics as an aggregate: one BIGINT carries which
    # of the 5 order priorities a customer nation has ever used —
    # bit_or(1 << priority_digit), popcount = exact distinct count.
    # The bitmap-aggregate trick replaces a count-distinct shuffle
    # with an 8-byte commutative OR for any low-cardinality domain.
    oracle="""
    WITH o AS (
        SELECT c_nationkey AS nation,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pidx
        FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT nation,
           CAST(bit_or(1 << pidx) AS BIGINT) AS priority_mask,
           CAST(bit_count(bit_or(1 << pidx)) AS BIGINT)
               AS n_distinct_priorities,
           CAST(count(DISTINCT pidx) AS BIGINT) AS check_distinct
    FROM o GROUP BY nation
    """,
)
def agg_bitset_presence(spark, sf_dir):
    """Per-nation priority bitmap: bit_or of 1<<digit, with popcount
    pinned against the true count(distinct) in the same row. The OR is
    commutative-associative 8-byte state — the cheapest possible
    presence summary for bounded domains, and the building block of
    relational bitmap indexes."""
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
            F.col("c_nationkey").alias("nation"),
            F.substring(F.col("o_orderpriority"), 1, 1)
            .cast("bigint")
            .alias("pidx"),
        )
    )
    mask = F.expr("bit_or(shiftleft(1L, cast(pidx as int)))")
    return o.groupBy("nation").agg(
        mask.cast("bigint").alias("priority_mask"),
        F.bit_count(mask).cast("bigint").alias("n_distinct_priorities"),
        F.countDistinct("pidx").cast("bigint").alias("check_distinct"),
    )


# --------------------------------------------------------------------------
# Asymmetric containment pairs
# --------------------------------------------------------------------------

_CONT_T = 0.05


@query(
    "doc_containment_pairs",
    # Directional near-dup: containment C(a->b) = |A n B| / |A| over
    # distinct 3-gram sets — catches a document EMBEDDED inside a
    # larger one, which symmetric Jaccard dilutes away. Same-lang
    # blocking and the doc_id < 120 bound keep the oracle's pair count
    # honest (the unbounded scale path is the MinHash/LSH family).
    # Gram identity travels as the portable hash on both sides.
    oracle=f"""
    WITH dt AS (
      SELECT doc_id, lang,
             regexp_extract_all(lower(trim(text)), '\\S+') AS tk
      FROM documents WHERE doc_id < 120
    ), sh AS (
      SELECT DISTINCT doc_id, lang,
             {portable_u64_sql("array_to_string(tk[g:g+2], ' ')", "cont")}
                 AS sh
      FROM dt, unnest(range(1, greatest(len(tk) - 2, 0) + 1)) AS u(g)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM sh a JOIN sh b
        ON a.sh = b.sh AND a.lang = b.lang AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(n_inter AS BIGINT) AS n_inter,
           round(CAST(n_inter AS DOUBLE) / sa.n_sh, 6) AS containment
    FROM inter JOIN sizes sa ON id_a = sa.doc_id
    WHERE CAST(n_inter AS DOUBLE) / sa.n_sh >= {_CONT_T}
    """,
)
def doc_containment_pairs(spark, sf_dir):
    """Directional containment C(a->b) >= 0.05 (sized to this synthetic
    word-soup corpus, where true containment runs are short) over distinct-3-gram
    sets. Plan mirrors ngram_jaccard_pairs (shared-gram equi-join on
    8-byte portable hashes — never all-pairs) but keeps BOTH
    directions: a 90%-contained small doc scores high even when the
    big doc's Jaccard is tiny. The threshold compares an exact
    integer ratio, identical in both engines."""
    docs = t(spark, sf_dir, "documents")
    d = docs.filter(F.col("doc_id") < 120).repartition(
        data_sized_partitions(docs)
    )
    toks = F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
    )
    shingles = F.when(
        F.size(toks) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 2),
                lambda i: F.array_join(F.slice(toks, i, 3), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select(
        "doc_id", "lang", F.explode(shingles).alias("s")
    ).select(
        "doc_id",
        "lang",
        portable_u64(F.col("s"), salt="cont").alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(
        F.col("doc_id").alias("id_a"),
        F.col("lang").alias("lang_a"),
        F.col("sh").alias("sh_a"),
    )
    b = sh.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("sh").alias("sh_b"),
    )
    inter = (
        a.join(
            b,
            (F.col("sh_a") == F.col("sh_b"))
            & (F.col("lang_a") == F.col("lang_b"))
            & (F.col("id_a") != F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("id_a"), F.col("n_sh")
            ),
            "id_a",
        )
        .where(
            F.col("n_inter").cast("double") / F.col("n_sh") >= _CONT_T
        )
        .select(
            "id_a",
            "id_b",
            F.col("n_inter").cast("bigint").alias("n_inter"),
            F.round(
                F.col("n_inter").cast("double") / F.col("n_sh"), 6
            ).alias("containment"),
        )
    )
