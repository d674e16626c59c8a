"""Third analytics wave (round 6 continuation): retrieval and
recommendation shapes — BM25 ranked retrieval, item-item co-purchase
affinity, rolling z-score anomaly flags, the Mann-Kendall trend test,
and multi-source k-hop graph reachability. Every query keeps the
round-6 portability discipline: all data-sized arithmetic is integer
(counts, fixed chains of identical double ops on exact inputs), logs
appear only inside a final rounded expression (the doc_tfidf_topterms
precedent), and orderings/tie-breaks are exact-integer so top-k
boundaries cannot flip across engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..ops import data_sized_partitions
from .base import query, t

# BM25 free parameters (Robertson/Sparck-Jones defaults) as shared
# decimal literals parsed identically by both engines.
_BM25_K1 = "1.2"
_BM25_B = "0.75"
# The fixed retrieval query: mid-frequency corpus terms. Literal on
# both sides; the engine never depends on these specific values.
_BM25_TERMS = ("hash", "join", "window")


@query(
    "doc_bm25_topk",
    # Okapi BM25 (k1=1.2, b=0.75) over the document corpus for a fixed
    # 3-term query, top-10 docs. All inputs to the scoring chain are
    # exact integers (tf, df, dl, N, sum_dl); idf uses ln on those
    # exact inputs — the same single-ln-then-round(6) exposure
    # doc_tfidf_topterms has carried green through four scale tiers.
    # Ranking ties break on doc_id, and the rank window orders by the
    # UNROUNDED score (identical double chain both engines).
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(trim(text)), '\\S+'))
               AS term
      FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM tk GROUP BY doc_id
    ), corpus AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl
    ), qterms AS (
      SELECT unnest(['{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}',
                     '{_BM25_TERMS[2]}']) AS term
    ), tf AS (
      SELECT tk.doc_id, tk.term, count(*) AS tf
      FROM tk JOIN qterms USING (term)
      GROUP BY tk.doc_id, tk.term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             sum(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * ({_BM25_K1} + 1.0))
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * (dl * n_docs / CAST(sum_dl AS DOUBLE))))
             ) AS score
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN corpus
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS bm25, rank FROM (
      SELECT doc_id, score,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored) WHERE rank <= 10
    """,
)
def doc_bm25_topk(spark, sf_dir):
    """Top-10 documents by Okapi BM25 for a fixed query — the ranked
    retrieval primitive (quality-weighted corpus selection, eval-set
    retrieval, RAG curation). Plan: one tokenize-explode feeds both
    the doc-length aggregate and the query-term tf aggregate (the
    query-term filter prunes the explode to |q| terms BEFORE the tf
    shuffle, so the data-sized stages are the dl groupBy and a
    q-term-only groupBy); df and the corpus moments are tiny
    relations joined broadcast; the final rank is a single window
    over |docs-matching-q| rows. The per-term sum uses avg doclen as
    dl*n/sum_dl (one exact-int division) so both engines evaluate an
    identical double chain. Note n_docs here = docs with >=1 token,
    which equals total docs on any corpus without empty texts (the
    testdata invariant ADVICE r5 verified); genuinely empty docs have
    no length and cannot match a term, so they score 0 either way."""
    d = t(spark, sf_dir, "documents")
    d = d.repartition(data_sized_partitions(d))
    tk = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), 0
            )
        ).alias("term"),
    )
    dl = tk.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    qterms = spark.createDataFrame(
        [(term,) for term in _BM25_TERMS], "term string"
    )
    tf = (
        tk.join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.expr(_BM25_K1), F.expr(_BM25_B)
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm_dl = (
        F.col("dl") * F.col("n_docs") / F.col("sum_dl").cast("double")
    )
    term_score = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * norm_dl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    # Top-10 via orderBy+limit (TakeOrderedAndProject — a distributed
    # per-partition top-k + driver merge, never a global sort); the
    # rank window then runs over the bounded 10-row GlobalLimit
    # output, so no unpartitioned Window ever sees a data-sized
    # relation (tools/window_audit.py invariant).
    top = scored.orderBy(F.col("score").desc(), "doc_id").limit(10)
    w = W.orderBy(F.col("score").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", F.round("score", 6).alias("bm25"), "rank"
    )


@query(
    "rec_item_affinity",
    # Item-item collaborative filtering over co-purchases: parts that
    # appear in the same order, cosine affinity co/sqrt(n_i*n_j) from
    # integer counts. The pair generation is a self-join co-partitioned
    # on l_orderkey whose fan-out is bounded by order size (<=7 lines
    # in TPC-H data, <=13 here), so it scales linearly with the fact;
    # top-20 ranks on the EXACT integer co-count (ties on part keys),
    # never on the float affinity.
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), item AS (
      SELECT l_partkey, count(*) AS n_orders FROM op GROUP BY l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS co
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    )
    SELECT part_a, part_b, co,
           round(co / sqrt(CAST(ia.n_orders AS DOUBLE)
                           * CAST(ib.n_orders AS DOUBLE)), 6) AS cosine
    FROM pairs
    JOIN item ia ON part_a = ia.l_partkey
    JOIN item ib ON part_b = ib.l_partkey
    ORDER BY co DESC, part_a, part_b
    LIMIT 20
    """,
)
def rec_item_affinity(spark, sf_dir):
    """Top-20 co-purchased part pairs with cosine affinity — the
    item-item recommender primitive ("customers who bought X also
    bought Y"). Plan: dedup to (order, part), self-join on the order
    key (both sides share one shuffle partitioning, AQE plans a
    co-partitioned sort-merge; fan-out is C(order_size, 2), a
    constant), pair groupBy with map-side combine, then two joins
    against the item-count relation — part-keyed, broadcast when it
    fits. The ranking key is the exact integer co-occurrence count,
    so the top-20 boundary is deterministic; cosine is a decoration
    computed by one identical double chain on exact counts.

    The item-count aggregate is localCheckpoint'd: it is consumed
    twice (ia/ib) and without the checkpoint each consumer re-runs
    the fact scan + distinct that feeds it (AQE only reused 2 of the
    4 op exchanges in the executed plan). The checkpoint is
    |parts|-bounded — cheap to hold — and removes two full fact
    scans; sf1 A/B: 10.3-10.7 s -> 8.0-9.9 s."""
    op = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item = (
        op.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .localCheckpoint()
    )
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("co"))
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("na")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("nb")
    )
    return (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .select(
            "part_a",
            "part_b",
            "co",
            F.round(
                F.col("co")
                / F.sqrt(
                    F.col("na").cast("double") * F.col("nb").cast("double")
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.desc("co"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "ts_rolling_zscore",
    # Rolling z-score anomaly detection on the daily event-count
    # series per type: a trailing 7-day window (ROWS BETWEEN 7
    # PRECEDING AND 1 PRECEDING — the current day is excluded so a
    # spike cannot mask itself) supplies integer moments n/sx/sxx;
    # mean, sample variance, and z are one fixed double chain on those
    # exact integers, so the |z|>=2 anomaly cut cannot flip engines.
    oracle="""
    WITH daily AS (
      SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ), framed AS (
      SELECT event_type, day, c,
             count(c) OVER w AS n,
             sum(c) OVER w AS sx,
             sum(c * c) OVER w AS sxx
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, CAST(c AS BIGINT) AS c,
           round((c - sx / 7.0)
                 / sqrt((7.0 * sxx - CAST(sx * sx AS DOUBLE)) / 42.0), 6)
             AS z,
           CASE WHEN abs((c - sx / 7.0)
                 / sqrt((7.0 * sxx - CAST(sx * sx AS DOUBLE)) / 42.0)) >= 2.0
                THEN 1 ELSE 0 END AS is_anomaly
    FROM framed
    WHERE n = 7 AND 7 * sxx > sx * sx
    ORDER BY event_type, day
    """,
)
def ts_rolling_zscore(spark, sf_dir):
    """Daily event-count anomaly flags per type via trailing-window
    z-score — the ops-monitoring primitive (error-rate spikes, traffic
    drops). Plan: the only data-sized stage is the day-grain groupBy
    (map-side combine); the rolling window runs per type over the tiny
    daily relation. Rows need a full 7-day history (n=7) and nonzero
    variance; both cuts are exact-integer predicates. The z chain
    divides by the literal frame size (7.0, 42.0 = 7*6), not by
    runtime counts, so the expression is structurally identical in
    both engines."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
    ).agg(F.count(F.lit(1)).alias("c"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    framed = daily.select(
        "event_type",
        "day",
        "c",
        F.count("c").over(w).alias("n"),
        F.sum("c").over(w).alias("sx"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("sxx"),
    )
    z = (F.col("c") - F.col("sx") / 7.0) / F.sqrt(
        (7.0 * F.col("sxx") - (F.col("sx") * F.col("sx")).cast("double"))
        / 42.0
    )
    return (
        framed.filter(
            (F.col("n") == 7)
            & (7 * F.col("sxx") > F.col("sx") * F.col("sx"))
        )
        .select(
            "event_type",
            "day",
            F.col("c").cast("bigint").alias("c"),
            F.round(z, 6).alias("z"),
            F.when(F.abs(z) >= 2.0, 1).otherwise(0).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "ts_mann_kendall",
    # Mann-Kendall trend test per event type on the daily count
    # series: S = sum over ordered day pairs of sign(c_later -
    # c_earlier) — a PURE INTEGER statistic, so the verdict column and
    # S itself are exactly portable; Kendall's tau divides by the
    # exact pair count once. The O(days^2) pair join runs on the
    # day-grain aggregate (bounded by the calendar, not the fact), so
    # it is constant-sized at any fact scale.
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             CASE WHEN b.c > a.c THEN 1
                  WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ), stat AS (
      SELECT p.event_type,
             sum(sgn) AS s,
             (SELECT count(*) FROM daily d
              WHERE d.event_type = p.event_type) AS n_days
      FROM pairs p GROUP BY p.event_type
    )
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(s AS BIGINT) AS s_stat,
           round(s / (n_days * (n_days - 1) / 2.0), 6) AS tau,
           CASE WHEN s > 0 THEN 'increasing'
                WHEN s < 0 THEN 'decreasing'
                ELSE 'no-trend' END AS trend
    FROM stat ORDER BY event_type
    """,
)
def ts_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotonic-trend test per event type — the
    nonparametric "is this series drifting" check used before
    alerting on a metric. Plan: one day-grain groupBy on the fact
    (the only data-sized stage), then a per-type self-join of the
    daily relation (|days|^2 per type, calendar-bounded — ~90x90 even
    on a quarter of data at ANY fact scale) aggregated to the integer
    S statistic. Kendall's tau = S / C(n,2) is the single double
    division; the trend verdict reads the sign of the exact integer
    S, so the classification can never flip engines."""
    ev = t(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("double") / 86400).cast("bigint")
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    sgn = (
        F.when(F.col("b.c") > F.col("a.c"), 1)
        .when(F.col("b.c") < F.col("a.c"), -1)
        .otherwise(0)
    )
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.sum(sgn).alias("s"))
    )
    n = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        s.join(n, "event_type")
        .select(
            "event_type",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("s").cast("bigint").alias("s_stat"),
            F.round(
                F.col("s")
                / (F.col("n_days") * (F.col("n_days") - 1) / 2.0),
                6,
            ).alias("tau"),
            F.when(F.col("s") > 0, "increasing")
            .when(F.col("s") < 0, "decreasing")
            .otherwise("no-trend")
            .alias("trend"),
        )
        .orderBy("event_type")
    )


@query(
    "graph_khop_reach",
    # Multi-source k-hop reachability (k=2) on the customer-supplier
    # bipartite graph from 10 supplier seeds: the labeled-BFS frontier
    # expansion every graph engine ships, expressed as k rounds of
    # edge-join + distinct (ops.graph.k_hop_reach). Pure integer
    # counting — exactly portable. The DuckDB oracle unrolls the two
    # hops as explicit joins (same fixpoint, k is a literal).
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
                      's:' || CAST(l_suppkey AS VARCHAR) AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
      SELECT c AS src, s AS dst FROM e0
      UNION ALL
      SELECT s AS src, c AS dst FROM e0
    ), seeds AS (
      SELECT DISTINCT 's:' || CAST(s_suppkey AS VARCHAR) AS seed
      FROM supplier WHERE s_suppkey <= 10
    ), h1 AS (
      SELECT DISTINCT s.seed, e.dst AS node
      FROM seeds s JOIN edges e ON e.src = s.seed
    ), reach AS (
      SELECT seed, seed AS node FROM seeds
      UNION
      SELECT seed, node FROM h1
      UNION
      SELECT h1.seed, e.dst AS node
      FROM h1 JOIN edges e ON e.src = h1.node
    )
    SELECT seed, CAST(count(*) AS BIGINT) AS n_reachable
    FROM reach GROUP BY seed ORDER BY seed
    """,
)
def graph_khop_reach(spark, sf_dir):
    """Nodes within 2 hops of each of 10 supplier seeds on the
    customer-supplier graph — blast-radius / influence-set analysis
    (fraud rings, recall impact). Plan: see ops.graph.k_hop_reach —
    each hop is one shuffle join of the (seed, frontier-node) relation
    against the edge list on the node key plus a distinct; the state
    is bounded by |seeds| x |V| worst case and the seed set is small
    by construction (10 here). localCheckpoint between hops truncates
    the lineage exactly like the near-dup connected-components loop.
    Counting includes the seed itself (distance 0)."""
    from ..graph import k_hop_reach

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
                "c"
            ),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
                "s"
            ),
        )
        .distinct()
    )
    edges = e0.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        e0.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    seeds = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 10)
        .select(
            F.concat(
                F.lit("s:"), F.col("s_suppkey").cast("string")
            ).alias("seed")
        )
        .distinct()
    )
    reach = k_hop_reach(edges, seeds, k=2)
    return (
        reach.groupBy("seed")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_reachable"))
        .orderBy("seed")
    )
