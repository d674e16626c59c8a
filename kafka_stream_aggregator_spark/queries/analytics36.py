"""Round-9 wave 47: edit-distance pair dedup and converged connected
components.

doc_edit_distance_pairs closes the one classic near-dup modality the
dedup inventory lacked (exact hash, MinHash/LSH, SimHash, n-gram
Jaccard, embedding cosine, winnowing, containment — but no
edit-distance tier): both engines ship the SAME levenshtein builtin,
so the oracle is exact. graph_wcc_converged is the engine's first
RUN-TO-CONVERGENCE iterative operator (label prop is 2 unrolled
rounds): a driver-coordinated min-label loop — each iteration one
vertex-keyed shuffle, O(diameter) iterations — against a DuckDB
recursive-CTE reachability oracle on the same bounded subgraph.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "doc_edit_distance_pairs",
    # Levenshtein near-dup screen over the bounded same-language
    # slice (doc_id < 40, the doc_token_f1_pairs convention): edit
    # distance on the lowercased 80-char prefix, similarity
    # 1 - d / max(len) — integers plus one rational.
    oracle="""
    WITH d AS (
      SELECT doc_id, lang,
             substr(lower(text), 1, 80) AS p
      FROM documents WHERE doc_id < 40
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.p, b.p) AS BIGINT) AS edit_dist,
           round(1.0 - CAST(levenshtein(a.p, b.p) AS DOUBLE)
                 / greatest(length(a.p), length(b.p)), 6) AS sim
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE greatest(length(a.p), length(b.p)) > 0
    """,
)
def doc_edit_distance_pairs(spark, sf_dir):
    """Edit-distance dedup tier: a same-lang self-join on the bounded
    slice (blocking key = lang — never all-pairs at scale; production
    composes this with the LSH/banding tiers as the verify pass),
    then one JVM levenshtein per pair — both engines share the
    builtin's semantics, so even the DP is oracle-exact."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select(
            "doc_id",
            "lang",
            F.substring(F.lower("text"), 1, 80).alias("p"),
        )
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        F.col("p").alias("pa"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        "lang",
        F.col("p").alias("pb"),
    )
    lev = F.levenshtein("pa", "pb")
    mx = F.greatest(F.length("pa"), F.length("pb"))
    return (
        a.join(b, "lang")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(mx > 0)
        .select(
            "doc_a",
            "doc_b",
            lev.cast("bigint").alias("edit_dist"),
            F.round(1.0 - lev.cast("double") / mx, 6).alias("sim"),
        )
    )


_WCC_EDGE_SQL = """
      SELECT DISTINCT a.user_id AS ua, b2.user_id AS ub
      FROM (SELECT DISTINCT user_id, event_type,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS w
            FROM events WHERE user_id < 120) a
      JOIN (SELECT DISTINCT user_id, event_type,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS w
            FROM events WHERE user_id < 120) b2
        ON a.event_type = b2.event_type AND a.w = b2.w
       AND a.user_id < b2.user_id
"""


@query(
    "graph_wcc_converged",
    # Connected components run to CONVERGENCE (not a fixed round
    # count): min-label propagation loops until no label changes.
    # Component id = min user_id reachable; output = component-size
    # census. The oracle computes true reachability with a recursive
    # CTE (bounded subgraph: user_id < 120), so a premature stop or a
    # wrong fixpoint hash-mismatches.
    oracle=f"""
    WITH RECURSIVE e AS ({_WCC_EDGE_SQL}),
    nodes AS (
      SELECT DISTINCT v FROM (
        SELECT ua AS v FROM e UNION ALL SELECT ub FROM e) z
    ),
    adj AS (
      SELECT ua AS x, ub AS y FROM e
      UNION ALL SELECT ub, ua FROM e
    ),
    reach(v, lab) AS (
      SELECT v, v FROM nodes
      UNION
      SELECT adj.x, reach.lab
      FROM adj JOIN reach ON adj.y = reach.v
    ),
    cc AS (
      SELECT v, CAST(min(lab) AS BIGINT) AS component
      FROM reach GROUP BY v
    )
    SELECT component, CAST(count(*) AS BIGINT) AS size
    FROM cc GROUP BY component
    """,
)
def graph_wcc_converged(spark, sf_dir):
    """Driver-coordinated min-label convergence loop: per iteration
    ONE vertex-keyed aggregate (min over own + neighbor labels) and a
    bounded count of changed labels; terminates after O(component
    diameter) rounds. This is the Spark shape of every iterate-until-
    stable graph op (WCC, shortest path, label prop) — the loop is
    control flow on the DRIVER, the data never leaves the cluster."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 120)
    cell = F.floor(F.col("ts").cast("double") / 300).cast("bigint")
    b = ev.select("user_id", "event_type", cell.alias("w")).distinct()
    a1 = b.select(F.col("user_id").alias("ua"), "event_type", "w")
    a2 = b.select(F.col("user_id").alias("ub"), "event_type", "w")
    e = (
        a1.join(a2, ["event_type", "w"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )
    adj = e.select(
        F.col("ua").alias("x"), F.col("ub").alias("y")
    ).unionAll(e.select(F.col("ub").alias("x"), F.col("ua").alias("y")))
    adj = adj.localCheckpoint()  # pin the edge list: the loop reuses it
    lab = (
        adj.select(F.col("x").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("lab"))
        .localCheckpoint()
    )
    for _ in range(64):  # diameter bound; breaks on convergence
        nbr = adj.join(
            lab.select(F.col("v").alias("y"), F.col("lab").alias("nl")),
            "y",
        ).select(F.col("x").alias("v"), F.col("nl").alias("lab"))
        new = (
            lab.unionByName(nbr)
            .groupBy("v")
            .agg(F.min("lab").alias("lab"))
            .localCheckpoint()
        )
        changed = (
            new.join(
                lab.select("v", F.col("lab").alias("old")), "v"
            )
            .filter(F.col("lab") != F.col("old"))
            .count()
        )
        lab = new
        if changed == 0:
            break
    return lab.groupBy(
        F.col("lab").cast("bigint").alias("component")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("size"))


@query(
    "image_phash_neardup",
    # Perceptual-hash image dedup, EXACTLY oracled: 180 synthesized
    # 32x32 grayscale images (pattern p = mid % 90 shared by twin
    # pairs, +5 brightness and per-mid %3 noise separating the copies)
    # -> 8x8 average-hash (bit = 4x4-block mean > image mean; means
    # are integer floor-divisions so the bits are exact integers) ->
    # Hamming pairs via xor + bit_count on two packed 32-bit halves.
    # aHash is mean-relative, so the +5 brightness shift cancels:
    # measured separation is twins = 0 bits vs cross-pattern >= 17
    # bits, so threshold 6 recovers EXACTLY the 90 planted twin pairs
    # — the pHash-family robustness property, verified relationally. At corpus scale the pair join is band-bucketed on
    # hash prefixes (Hamming LSH); the 180-image demo joins directly.
    oracle="""
    WITH ids AS (
      SELECT unnest(generate_series(0, 179)) AS mid
    ), px AS (
      SELECT mid, i // 4 AS by, j // 4 AS bx,
             ((i + mid % 90) * (j + 2 * (mid % 90) + 1)) % 251
               + (mid // 90) * 5 + ((i * j + mid) % 3) AS v
      FROM ids,
           (SELECT unnest(generate_series(0, 31)) AS i) a,
           (SELECT unnest(generate_series(0, 31)) AS j) b
    ), blocks AS (
      SELECT mid, by, bx, sum(v) // 16 AS bm
      FROM px GROUP BY mid, by, bx
    ), gm AS (
      SELECT mid, sum(v) // 1024 AS g FROM px GROUP BY mid
    ), bits AS (
      SELECT blocks.mid, by * 8 + bx AS k,
             CASE WHEN bm > g THEN 1 ELSE 0 END AS bit
      FROM blocks JOIN gm ON blocks.mid = gm.mid
    ), h AS (
      SELECT mid,
             CAST(sum(CASE WHEN k < 32
                      THEN bit * (CAST(1 AS BIGINT) << k) END)
                  AS BIGINT) AS lo,
             CAST(sum(CASE WHEN k >= 32
                      THEN bit * (CAST(1 AS BIGINT) << (k - 32)) END)
                  AS BIGINT) AS hi
      FROM bits GROUP BY mid
    )
    SELECT a.mid AS img_a, b.mid AS img_b,
           CAST(bit_count(xor(a.lo, b.lo))
                + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.mid < b.mid
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 6
    """,
)
def image_phash_neardup(spark, sf_dir):
    """aHash near-dup: synthesize payload bytes per image id
    (mapInPandas, the binary-column production shape), hash each
    payload in one vectorized numpy pass (reshape -> 4x4 block means
    -> mean-relative bits -> two packed 32-bit halves), then the
    Hamming self-join with xor + bit_count. sf_dir unused (synthetic
    ids 0..179 — the formula IS the dataset, as video_frame_pipeline
    established)."""
    import numpy as np
    import pandas as pd

    n = 180

    def synth_and_hash(batches):
        for pdf in batches:
            out = []
            for mid in pdf["mid"]:
                m = int(mid)
                p = m % 90
                i = np.arange(32).reshape(32, 1)
                j = np.arange(32).reshape(1, 32)
                img = (
                    ((i + p) * (j + 2 * p + 1)) % 251
                    + (m // 90) * 5
                    + ((i * j + m) % 3)
                ).astype(np.int64)
                bm = img.reshape(8, 4, 8, 4).sum(axis=(1, 3)) // 16
                g = img.sum() // 1024
                bits = (bm > g).astype(np.int64).ravel()
                ks = np.arange(64)
                lo = int((bits[ks < 32] << ks[ks < 32]).sum())
                hi = int((bits[ks >= 32] << (ks[ks >= 32] - 32)).sum())
                out.append((m, lo, hi))
            yield pd.DataFrame(out, columns=["mid", "lo", "hi"])

    h = (
        spark.range(n)
        .select(F.col("id").alias("mid"))
        .repartition(8)
        .mapInPandas(synth_and_hash, "mid long, lo long, hi long")
    )
    a = h.select(
        F.col("mid").alias("img_a"),
        F.col("lo").alias("la"),
        F.col("hi").alias("ha"),
    )
    b = h.select(
        F.col("mid").alias("img_b"),
        F.col("lo").alias("lb"),
        F.col("hi").alias("hb"),
    )
    ham = F.bit_count(
        F.col("la").bitwiseXOR(F.col("lb"))
    ) + F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, F.col("img_a") < F.col("img_b"))
        .filter(ham <= 6)
        .select(
            "img_a", "img_b", ham.cast("bigint").alias("hamming")
        )
    )


@query(
    "graph_bfs_distances",
    # Multi-source BFS run to convergence (the WCC loop's shortest-
    # path sibling): sources = the 5 lowest user ids; per node the
    # hop distance to the nearest source. Driver loop relaxes
    # dist = min(dist, neighbor+1) until no change (O(diameter)
    # rounds, one vertex-keyed shuffle each); oracle = recursive-CTE
    # BFS on the same bounded subgraph. Output: distance histogram.
    oracle=f"""
    WITH RECURSIVE e AS ({_WCC_EDGE_SQL}),
    nodes AS (
      SELECT DISTINCT v FROM (
        SELECT ua AS v FROM e UNION ALL SELECT ub FROM e) z
    ),
    adj AS (
      SELECT ua AS x, ub AS y FROM e
      UNION ALL SELECT ub, ua FROM e
    ),
    srcs AS (
      SELECT v FROM nodes ORDER BY v LIMIT 5
    ),
    walk(v, d) AS (
      SELECT v, 0 FROM srcs
      UNION
      SELECT adj.x, walk.d + 1
      FROM adj JOIN walk ON adj.y = walk.v
      WHERE walk.d < 64
    ),
    dist AS (
      SELECT v, CAST(min(d) AS BIGINT) AS d FROM walk GROUP BY v
    )
    SELECT d AS hops, CAST(count(*) AS BIGINT) AS n_nodes
    FROM dist GROUP BY d
    """,
)
def graph_bfs_distances(spark, sf_dir):
    """Frontier-free distributed BFS: keep a (v, dist) relation,
    each round join with the adjacency and take the min — converges
    in diameter rounds; the driver only counts changed rows."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 120)
    cell = F.floor(F.col("ts").cast("double") / 300).cast("bigint")
    b = ev.select("user_id", "event_type", cell.alias("w")).distinct()
    a1 = b.select(F.col("user_id").alias("ua"), "event_type", "w")
    a2 = b.select(F.col("user_id").alias("ub"), "event_type", "w")
    e = (
        a1.join(a2, ["event_type", "w"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )
    adj = e.select(
        F.col("ua").alias("x"), F.col("ub").alias("y")
    ).unionAll(e.select(F.col("ub").alias("x"), F.col("ua").alias("y")))
    adj = adj.localCheckpoint()
    nodes = adj.select(F.col("x").alias("v")).distinct()
    srcs = nodes.orderBy("v").limit(5)
    big = F.lit(1 << 30).cast("bigint")
    dist = nodes.join(
        srcs.withColumn("zero", F.lit(0)), "v", "left"
    ).select(
        "v",
        F.coalesce(F.col("zero").cast("bigint"), big).alias("d"),
    ).localCheckpoint()
    for _ in range(64):
        relaxed = adj.join(
            dist.select(F.col("v").alias("y"), F.col("d").alias("nd")),
            "y",
        ).select(F.col("x").alias("v"), (F.col("nd") + 1).alias("d"))
        new = (
            dist.unionByName(relaxed)
            .groupBy("v")
            .agg(F.min("d").alias("d"))
            .localCheckpoint()
        )
        changed = (
            new.join(dist.select("v", F.col("d").alias("od")), "v")
            .filter(F.col("d") != F.col("od"))
            .count()
        )
        dist = new
        if changed == 0:
            break
    return (
        dist.filter(F.col("d") < big)
        .groupBy(F.col("d").alias("hops"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )


@query(
    "events_absorbing_chain",
    # Absorbing Markov chain: states {view, click} transient,
    # purchase absorbing; per-user consecutive event pairs give the
    # transition counts, and the expected number of steps to
    # absorption from each transient state solves (I - Q) t = 1 with
    # Q the 2x2 transient block — closed-form 2x2 Cramer on exact
    # integer-count rationals. Rows where a user's chain ends without
    # purchase contribute to the (normalized-out) self-mass the
    # standard way: probabilities are row-normalized over OBSERVED
    # transitions only.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS s,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), c AS (
      SELECT s, nxt, CAST(count(*) AS BIGINT) AS n
      FROM seq
      WHERE nxt IS NOT NULL AND s IN ('view', 'click')
      GROUP BY s, nxt
    ), m AS (
      SELECT
        CAST(sum(CASE WHEN s = 'view' THEN n END) AS DOUBLE) AS rv,
        CAST(sum(CASE WHEN s = 'click' THEN n END) AS DOUBLE) AS rc,
        CAST(sum(CASE WHEN s = 'view' AND nxt = 'view' THEN n END)
             AS DOUBLE) AS vv,
        CAST(sum(CASE WHEN s = 'view' AND nxt = 'click' THEN n END)
             AS DOUBLE) AS vc,
        CAST(sum(CASE WHEN s = 'click' AND nxt = 'view' THEN n END)
             AS DOUBLE) AS cv,
        CAST(sum(CASE WHEN s = 'click' AND nxt = 'click' THEN n END)
             AS DOUBLE) AS cc
      FROM c
    ), q AS (
      SELECT (1 - vv / rv) * (1 - cc / rc)
             - (vc / rv) * (cv / rc) AS det,
             vv / rv AS qvv, vc / rv AS qvc,
             cv / rc AS qcv, cc / rc AS qcc
      FROM m WHERE rv > 0 AND rc > 0
    )
    SELECT round(qvv, 6) AS p_view_view,
           round(qvc, 6) AS p_view_click,
           round(qcv, 6) AS p_click_view,
           round(qcc, 6) AS p_click_click,
           round(((1 - qcc) + qvc) / det, 6) AS steps_from_view,
           round((qcv + (1 - qvv)) / det, 6) AS steps_from_click
    FROM q WHERE det <> 0
    """,
)
def events_absorbing_chain(spark, sf_dir):
    """Expected steps to purchase: lead() transition pairs, 6 integer
    counts, row-normalized 2x2 transient block, closed Cramer solve
    of (I-Q) t = 1 — deterministic rationals end to end."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("s"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull() & F.col("s").isin("view", "click"))
    c = seq.groupBy("s", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )

    def cell(s, nx):
        return F.sum(
            F.when((F.col("s") == s) & (F.col("nxt") == nx), F.col("n"))
        ).cast("double")

    m = c.agg(
        F.sum(F.when(F.col("s") == "view", F.col("n")))
        .cast("double")
        .alias("rv"),
        F.sum(F.when(F.col("s") == "click", F.col("n")))
        .cast("double")
        .alias("rc"),
        cell("view", "view").alias("vv"),
        cell("view", "click").alias("vc"),
        cell("click", "view").alias("cv"),
        cell("click", "click").alias("cc"),
    )
    qvv = F.col("vv") / F.col("rv")
    qvc = F.col("vc") / F.col("rv")
    qcv = F.col("cv") / F.col("rc")
    qcc = F.col("cc") / F.col("rc")
    det = (1 - qvv) * (1 - qcc) - qvc * qcv
    q = m.filter((F.col("rv") > 0) & (F.col("rc") > 0)).select(
        qvv.alias("qvv"),
        qvc.alias("qvc"),
        qcv.alias("qcv"),
        qcc.alias("qcc"),
        det.alias("det"),
    )
    return q.filter(F.col("det") != 0).select(
        F.round("qvv", 6).alias("p_view_view"),
        F.round("qvc", 6).alias("p_view_click"),
        F.round("qcv", 6).alias("p_click_view"),
        F.round("qcc", 6).alias("p_click_click"),
        F.round(
            ((1 - F.col("qcc")) + F.col("qvc")) / F.col("det"), 6
        ).alias("steps_from_view"),
        F.round(
            (F.col("qcv") + (1 - F.col("qvv"))) / F.col("det"), 6
        ).alias("steps_from_click"),
    )
