"""Join inventory (SURVEY.md §2.B "Joins").

Physical-plan intent per query (checked in tests via explain):
  * dim joins -> BroadcastHashJoin (explicit F.broadcast on sub-10MB sides)
  * fact-fact equi joins -> shuffle on the key (SMJ/SHJ, AQE decides)
  * theta/range joins -> BroadcastNestedLoop only with a broadcast-small
    side (bucket dims); never NL between two large tables
  * as-of join -> implemented scalably in ops (union + last_value window:
    one shuffle, no pairwise blowup); here oracle-checked via the
    equivalent arg_max formulation
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "join_broadcast_dim",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_customers,
           round(CAST(sum(CAST(round(c_acctbal, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / count(*), 6) AS avg_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_broadcast_dim(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.round("c_acctbal", 6).cast("decimal(18,6)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_acctbal"),
        )
    )


@query(
    "join_inner_large",
    bench=True,
    # Both sides aggregate per order first and carry the partial as an
    # EXACT integer (cents x (100-cents) products of the 2dp-clean
    # factors; no partial ROUNDING, whose 6dp boundary still flipped
    # ~1-in-50k partials at sf5 in the earlier round-to-6dp-double
    # form); the outer sum rides DECIMAL(38,0) (overflow-proof) and is
    # emitted as the identical double — order-independent on both
    # engines at any scale (r02 lesson, sharpened twice in r06).
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, count(*) AS n,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
               AS rev
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderstatus,
           year(o_orderdate) AS order_year,
           CAST(sum(n) AS BIGINT) AS n_lines,
           CAST(sum(CAST(rev AS DECIMAL(38,0))) AS DOUBLE) / 10000
             AS revenue
    FROM per_order JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus, year(o_orderdate)
    """,
)
def join_inner_large(spark, sf_dir):
    # Pre-aggregation rewrite: lineitem collapses to one partial row per
    # l_orderkey BEFORE the join (~4:1 at any scale factor), so the
    # shuffle moves (orderkey, count, revenue) triples instead of full
    # lineitem rows, and the join is orders-cardinality on both sides.
    # The final regroup on (status, year) is a rollup of partials —
    # count -> sum, sum -> sum. Same result, strictly less shuffle I/O;
    # this is the shape that survives 100x data.
    # Round-12: SQL-string construction (one JVM parse instead of ~0.1 s
    # of py4j Column building — tools/bench_decompose.py; guide §1).
    # Identical plan and identical cents-exact arithmetic.
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH per_order AS (
          SELECT l_orderkey, count(*) AS __n,
                 sum(floor(l_extendedprice * 100 + 0.5)
                     * (100 - floor(l_discount * 100 + 0.5))) AS __rev
          FROM {l} GROUP BY l_orderkey
        )
        SELECT o_orderstatus, year(o_orderdate) AS order_year,
               sum(__n) AS n_lines,
               CAST(sum(CAST(__rev AS DECIMAL(38,0))) AS DOUBLE) / 10000
                 AS revenue
        FROM per_order JOIN {o} o ON l_orderkey = o.o_orderkey
        GROUP BY o_orderstatus, year(o_orderdate)
        """,
        l=l,
        o=o,
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 6) AS sum_total
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 6).alias(
                "sum_total"
            ),
        )
    )


@query(
    "join_right_outer",
    # right-outer: every customer preserved on the build side even with
    # no 1995 orders (ref SURVEY §2.B "left / right / full"). At scale
    # this is a shuffle join on o_custkey/c_custkey; the filtered probe
    # side keeps the shuffled volume small.
    oracle="""
    SELECT c_custkey,
           count(o_orderkey) AS n_1995_orders,
           round(coalesce(sum(o_totalprice), 0.0), 6) AS sum_total
    FROM (SELECT * FROM orders WHERE year(o_orderdate) = 1995) o
         RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_right_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_1995_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 6).alias(
                "sum_total"
            ),
        )
    )


@query(
    "join_full_outer",
    oracle="""
    WITH hc AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey),
         hs AS (SELECT s_nationkey AS nk, count(*) AS n_supp
                FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
    SELECT coalesce(hc.nk, hs.nk) AS nationkey,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM hc FULL OUTER JOIN hs ON hc.nk = hs.nk
    """,
)
def join_full_outer(spark, sf_dir):
    hc = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    hs = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return hc.join(hs, hc.nk_c == hs.nk_s, "full").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND year(o_orderdate) = 1995)
    """,
)
def join_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, s.o_orderstatus AS status
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross(spark, sf_dir):
    r = t(spark, sf_dir, "region").select("r_name")
    s = t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status")
    ).distinct()
    return r.crossJoin(s)


@query(
    "join_range_theta",
    # part joined to an inline bucket dimension on a non-equi (range)
    # condition -> BroadcastNestedLoopJoin with the 5-row side broadcast.
    oracle="""
    WITH buckets(bucket, lo, hi) AS (
      VALUES ('xs', 0, 10), ('s', 10, 20), ('m', 20, 30),
             ('l', 30, 40), ('xl', 40, 50)
    )
    SELECT bucket, count(*) AS n_parts, round(CAST(sum(CAST(round(p_retailprice, 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_price
    FROM part JOIN buckets ON p_size > lo AND p_size <= hi
    GROUP BY bucket
    """,
)
def join_range_theta(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    buckets = spark.createDataFrame(
        [("xs", 0, 10), ("s", 10, 20), ("m", 20, 30), ("l", 30, 40), ("xl", 40, 50)],
        "bucket string, lo int, hi int",
    )
    return (
        p.join(
            F.broadcast(buckets),
            (p.p_size > buckets.lo) & (p.p_size <= buckets.hi),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.sum(F.round("p_retailprice", 6).cast("decimal(18,6)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_price"),
        )
    )


@query(
    "join_asof",
    bench=True,
    # For every purchase event: value/time of the latest click by the same
    # user at or before it. Spark impl = scalable union + last_value window
    # (ops.asof_join); oracle = equivalent arg_max over the time-bounded
    # join, with (ts, event_id) struct tiebreak.
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click'),
         j AS (
           SELECT p.event_id AS pid, c.value AS cv,
                  row_number() OVER (PARTITION BY p.event_id
                                     ORDER BY c.ts DESC, c.event_id DESC) AS rn
           FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
         )
    SELECT p.event_id,
           CAST(CASE WHEN j.pid IS NOT NULL THEN 1.0 ELSE 0.0 END
                AS DOUBLE) AS has_click,
           round(coalesce(j.cv, -1.0), 6) AS last_click_value
    FROM p LEFT JOIN (SELECT pid, cv FROM j WHERE rn = 1) j
      ON p.event_id = j.pid
    """,
)
def join_asof(spark, sf_dir):
    # Round-12: the ops.asof_join helper stays the generic engine
    # surface (dtypes introspection + per-column py4j builders cost a
    # measured ~0.22 s of plan construction per call —
    # tools/bench_decompose.py); this bench query is its exact inlined
    # SQL twin for the fixed purchase/click shape: ONE events scan with
    # CASE-projected sides replaces the helper's two-scan union (guide
    # §2.3 — half the input I/O for identical rows), then the same one
    # (user_id) shuffle + last(ignorenulls) running window, same
    # (ts, side, tiebreak) ordering with right rows before left at
    # equal timestamps and NULL-tie lefts first. Parity re-verified at
    # sf0.001/sf0.01/sf1.
    e = t(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH u AS (
          SELECT user_id AS __by, ts AS __on,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS __side,
                 CASE WHEN event_type = 'click' THEN event_id END AS __tie,
                 CASE WHEN event_type = 'click' THEN value END AS r_value,
                 CASE WHEN event_type = 'purchase' THEN event_id END AS event_id
          FROM {e} WHERE event_type IN ('purchase', 'click')
        ), f AS (
          SELECT event_id, __side,
                 last(r_value, true) OVER (
                   PARTITION BY __by
                   ORDER BY __on, __side, __tie ASC NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS r_value
          FROM u
        )
        SELECT event_id,
               CASE WHEN r_value IS NOT NULL THEN 1.0D ELSE 0.0D END
                 AS has_click,
               round(coalesce(r_value, -1.0D), 6) AS last_click_value
        FROM f WHERE __side = 1
        """,
        e=e,
    )


@query(
    "join_interval_overlap",
    # Self theta-join: pairs of error events of the same user within one
    # hour of each other. Equi on user_id (shuffle) + range predicate.
    oracle="""
    SELECT a.user_id, count(*) AS n_pairs
    FROM (SELECT * FROM events WHERE event_type = 'error') a
    JOIN (SELECT * FROM events WHERE event_type = 'error') b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(epoch(a.ts) - epoch(b.ts)) <= 3600
    GROUP BY a.user_id
    """,
)
def join_interval_overlap(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    a = e.select(
        F.col("user_id").alias("a_user"),
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
    )
    b = e.select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    return (
        a.join(
            b,
            (a.a_user == b.b_user)
            & (a.a_id < b.b_id)
            & (
                F.abs(
                    F.col("a_ts").cast("timestamp").cast("double")
                    - F.col("b_ts").cast("timestamp").cast("double")
                )
                <= 3600
            ),
        )
        .groupBy(F.col("a_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_fuzzy_blocked",
    # Entity-resolution fuzzy join: candidate pairs blocked on the
    # name's noun token (equi join — never all-pairs), then exact
    # Levenshtein filter. Same blocking + same distance on both
    # engines.
    oracle="""
    WITH p AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS blk,
             count(*) AS n_rows, min(p_partkey) AS canon_id
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           CAST(a.n_rows AS BIGINT) AS n_a, CAST(b.n_rows AS BIGINT) AS n_b,
           CAST(a.canon_id AS BIGINT) AS canon_a,
           CAST(b.canon_id AS BIGINT) AS canon_b
    FROM p a JOIN p b
      ON a.blk = b.blk AND a.p_name < b.p_name
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def join_fuzzy_blocked(spark, sf_dir):
    """Fuzzy (edit-distance) join with blocking — the entity-resolution
    primitive: candidates pair only inside a blocking key (here the
    name's noun token, an equi join), and the exact Levenshtein filter
    runs on that reduced set — and it runs on DISTINCT values with
    multiplicities, the canonicalization trick that makes fuzzy
    matching scale: 20k part rows hold only ~80 distinct names, so the
    quadratic stage sees 80, not 20k (measured 38s -> sub-second at
    sf0.1), and row-level linkage is a join back on the canonical id.
    At 100 TB the blocking join IS the
    algorithm — all-pairs Levenshtein is quadratic and never viable;
    block well (token, phonetic code, length band, or an LSH bucket
    from llm.dedup) and the distance pass is linear in candidate
    pairs. Two standard refinements applied and one rejected, all
    measured: (a) the length lower bound |len(a)-len(b)| <= d rides in
    the JOIN condition, skipping the expensive Levenshtein on pairs
    that cannot be within distance (edit distance >= length gap); (b)
    at larger scale add blocking keys until the largest block is
    bounded — but ONLY keys the match-class preserves: a first-letter
    key looked attractive here and silently blocked away every true
    match (this corpus' closest colors, cold/old, differ in their
    first letter) — blocking keys must be validated against known
    matches, the classic entity-resolution recall trap. Both engines implement unit-cost Levenshtein, so the query
    is exactly oracled."""
    p = (
        t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("p_partkey").cast("bigint").alias("canon_id"),
        )
        .withColumn(
            "blk", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2))
        )
    )
    a = p.select(
        F.col("p_name").alias("name_a"),
        F.col("n_rows").alias("n_a"),
        F.col("canon_id").alias("canon_a"),
        "blk",
    )
    b = p.select(
        F.col("p_name").alias("name_b"),
        F.col("n_rows").alias("n_b"),
        F.col("canon_id").alias("canon_b"),
        F.col("blk").alias("blk_b"),
    )
    pairs = a.join(
        b,
        (F.col("blk") == F.col("blk_b"))
        & (F.col("name_a") < F.col("name_b"))
        & (F.abs(F.length("name_a") - F.length("name_b")) <= 2),
    )
    d = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return pairs.filter(d <= 2).select(
        "name_a",
        "name_b",
        d.cast("bigint").alias("dist"),
        "n_a",
        "n_b",
        "canon_a",
        "canon_b",
    )


@query(
    "join_set_similarity_prefix",
    # Exact set-similarity self-join (3-gram shingle Jaccard >= 0.5)
    # across the WHOLE corpus. The oracle is brute force; the engine
    # side uses LOSSLESS prefix filtering, so the result sets are
    # identical — this oracles the blocking strategy itself.
    oracle="""
    WITH dt AS (
      SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS tk
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, array_to_string(tk[g:g+2], ' ') AS s
      FROM dt, unnest(range(1, greatest(len(tk)-2,0)+1)) AS u(g)
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(ni::DOUBLE / (sa.n + sb.n - ni), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE ni::DOUBLE / (sa.n + sb.n - ni) >= 0.5
    """,
)
def join_set_similarity_prefix(spark, sf_dir):
    """Set-similarity self-join via prefix filtering (Bayardo
    All-Pairs / PPJoin family) — the LOSSLESS blocking that makes
    high-threshold Jaccard joins scale, where LSH (minhash_near_dup)
    trades recall for speed. Canonical order = ascending document
    frequency: each doc indexes only the FIRST p = n - ceil(t*n) + 1
    of its shingles (its rarest ones); if jac(x,y) >= t, the smallest
    common shingle provably lies in BOTH prefixes, so joining on
    prefix shingles generates every qualifying pair, and the exact
    Jaccard verification on full shingle arrays then makes the output
    identical to brute force — the oracle checks exactly that.

    Scale shape: shingles ride as 8-byte xxhash64 (same trick as
    jaccard_dup_clusters); the candidate join touches only prefix
    shingles of df >= 2 (a shingle unique to one doc can't pair);
    verification is an array_intersect on the two candidates' arrays,
    linear in candidate count. At t=0.5 the prefix is half the doc, and
    rare-first ordering makes prefix shingles near-unique — candidate
    counts collapse to almost exactly the true pair count. No stage is
    quadratic in corpus size; the only corpus-wide shuffles key on
    shingle hash and doc_id."""
    from ..ops import data_sized_partitions

    thr = 0.5
    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    toks = F.regexp_extract_all(
        F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
    )
    shingles = F.when(
        F.size(toks) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 2),
                lambda i: F.xxhash64(F.array_join(F.slice(toks, i, 3), " ")),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    sh = d.select("doc_id", F.explode(shingles).alias("h"))

    # global canonical order: ascending document frequency, hash tiebreak
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    arr = (
        sh.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "h"))),
                lambda s: s["h"],
            ).alias("hs")
        )
        .withColumn("n", F.size("hs"))
    )
    p_len = (F.col("n") - F.ceil(F.lit(thr) * F.col("n")) + 1).cast("int")
    prefix = arr.select(
        "doc_id", "n", F.explode(F.slice("hs", 1, p_len)).alias("h")
    )
    # df=1 shingles can never produce a pair — drop before the self-join
    prefix = prefix.join(
        F.broadcast(dfreq.filter(F.col("df") >= 2).select("h")), "h"
    )
    # PPJoin length filter, also lossless: jac >= t forces
    # t*|x| <= |y| <= |x|/t, so size-incompatible pairs are pruned
    # INSIDE the join condition before they materialize
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("b.n") >= F.ceil(F.lit(thr) * F.col("a.n")))
            & (F.col("b.n") * F.lit(thr) <= F.col("a.n")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    av = arr.select(
        F.col("doc_id").alias("id_a"),
        F.col("hs").alias("hs_a"),
        F.col("n").alias("n_a"),
    )
    bv = arr.select(
        F.col("doc_id").alias("id_b"),
        F.col("hs").alias("hs_b"),
        F.col("n").alias("n_b"),
    )
    ni = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = ni / (F.col("n_a") + F.col("n_b") - ni)
    return (
        cand.join(av, "id_a")
        .join(bv, "id_b")
        .filter(jac >= thr)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "join_salted_skew",
    # The salted JOIN (round 8; the groupBy twin is
    # agg_salted_heavy_key): events join a 5-row weight dim on
    # event_type — 5 enormous keys, the shape where a shuffle join
    # hot-spots one reducer per key. The engine salts the DIM (each
    # key replicated x8 with a salt column) and spreads the fact side
    # with pmod(xxhash64(user_id), 8), so the equi join key becomes
    # (event_type, salt) and each hot key fans across 8 reducers.
    # Salting is result-invariant, so the oracle is the PLAIN join +
    # aggregate; sums are DECIMAL/integer-exact.
    oracle="""
    WITH dim(event_type, weight) AS (
      VALUES ('view', 1.0), ('click', 2.0), ('purchase', 10.0),
             ('signup', 5.0), ('error', 0.0)
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(e.value, 6) AS DECIMAL(18,6))
                    * CAST(d.weight AS DECIMAL(6,1))) * 10000000
                AS BIGINT) AS weighted_value_e7
    FROM events e JOIN dim d ON e.event_type = d.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    """,
)
def join_salted_skew(spark, sf_dir):
    """Salted skew join: dim replicated x SALT_N (still broadcast-size
    — salting a dim multiplies rows, not bytes that matter), fact rows
    pick a uniform salt from a row-local hash, join on the compound
    key. At 100 TB this is the standard answer when AQE's skew split
    can't see the skew (e.g. post-aggregation joins); result is
    bit-equal to the unsalted join, which the oracle verifies."""
    SALT_N = 8
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "user_id",
            F.round("value", 6).cast("decimal(18,6)").alias("v"),
        )
    )
    dim = spark.createDataFrame(
        [
            ("view", "1.0"),
            ("click", "2.0"),
            ("purchase", "10.0"),
            ("signup", "5.0"),
            ("error", "0.0"),
        ],
        "event_type string, weight string",
    ).select("event_type", F.col("weight").cast("decimal(6,1)").alias("w"))
    salted_dim = dim.crossJoin(
        spark.range(SALT_N).select(F.col("id").cast("int").alias("salt"))
    )
    fact = ev.withColumn(
        "salt", F.pmod(F.xxhash64("user_id"), F.lit(SALT_N)).cast("int")
    )
    j = fact.join(F.broadcast(salted_dim), ["event_type", "salt"])
    return j.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        (F.sum(F.col("v") * F.col("w")) * 10_000_000)
        .cast("bigint")
        .alias("weighted_value_e7"),
    )
