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
