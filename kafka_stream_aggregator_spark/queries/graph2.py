"""Second graph-analytics wave: link prediction (common neighbors /
Jaccard / Adamic-Adar) and per-vertex local clustering coefficients,
over the same user co-occurrence graph graph_triangle_count defines
(edge = two users sharing an (event_type, 5-minute) cell, user_id <
120 — the bounded demo subgraph; the operators themselves are plain
vertex-keyed shuffles that run on ANY (src,dst) edge list).

Float discipline: every per-neighbor / per-vertex float contribution
(1/ln(deg), local cc) is a bit-identical IEEE chain on exact integers,
rounded to 9 dp and summed in DECIMAL(38,9) — the chi-square pattern —
so cross-engine hashes cannot flip on accumulation order.

Scale notes: the common-neighbor wedge enumeration is inherently
quadratic in the center vertex's degree (sum over b of deg(b)^2
wedges). That is the textbook cost of EXACT CN link prediction; a
production run on a power-law graph caps or samples celebrity centers
(the same guard llm/dedup.py applies to LSH buckets). The closing /
degree joins are all vertex-keyed single shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import query, t

_EDGE_SQL = """
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


def _edges(spark, sf_dir):
    """Undirected edge list (ua < ub) of the co-occurrence graph —
    identical construction to graph_triangle_count (analytics.py)."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 120)
    cell = F.floor(F.col("ts").cast("double") / 300).cast("bigint")
    b = ev.select("user_id", "event_type", cell.alias("w")).distinct()
    a1 = b.select(F.col("user_id").alias("ua"), "event_type", "w")
    a2 = b.select(F.col("user_id").alias("ub"), "event_type", "w")
    return (
        a1.join(a2, ["event_type", "w"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )


@query(
    "graph_link_prediction",
    # Top-20 NON-adjacent user pairs by common-neighbor count, with
    # Jaccard and Adamic-Adar scores. CN and degrees are exact
    # integers (the ranking key — can never flip engines); AA is a
    # DECIMAL(38,9) sum of round-9 1/ln(deg) terms (order-safe);
    # Jaccard one exact-int division. Deterministic order
    # (cn DESC, ua, ub) LIMIT 20.
    oracle=f"""
    WITH e AS (
      {_EDGE_SQL}
    ), adj AS (
      SELECT ua AS u, ub AS v FROM e
      UNION ALL SELECT ub, ua FROM e
    ), deg AS (
      SELECT u AS vtx, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u
    ), wedge AS (
      SELECT a.u AS x, c.u AS y, a.v AS b
      FROM adj a JOIN adj c ON a.v = c.v AND a.u < c.u
    ), cand AS (
      SELECT w.x, w.y,
             CAST(count(*) AS BIGINT) AS cn,
             CAST(sum(CAST(round(1.0 / ln(CAST(d.d AS DOUBLE)), 9)
                           AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS aa
      FROM wedge w JOIN deg d ON w.b = d.vtx
      WHERE NOT EXISTS (SELECT 1 FROM e
                        WHERE e.ua = w.x AND e.ub = w.y)
      GROUP BY w.x, w.y
    )
    SELECT c.x AS ua, c.y AS ub, c.cn,
           round(c.cn / CAST(dx.d + dy.d - c.cn AS DOUBLE), 6) AS jaccard,
           CAST(c.aa AS DOUBLE) AS adamic_adar
    FROM cand c
    JOIN deg dx ON c.x = dx.vtx
    JOIN deg dy ON c.y = dy.vtx
    ORDER BY c.cn DESC, c.x, c.y
    LIMIT 20
    """,
)
def graph_link_prediction(spark, sf_dir):
    """Who should be connected but is not: rank non-adjacent user
    pairs by common-neighbor count with Jaccard and Adamic-Adar
    decorations — the classical link-prediction triple that drives
    friend/item suggestion and graph-completion pipelines. Plan:
    wedge join on the both-directions adjacency (one vertex-keyed
    shuffle; cost sum(deg^2), the exact-CN lower bound), anti
    (NOT EXISTS) against the edge list to drop existing links, degree
    joins, TakeOrderedAndProject top-20 on the INTEGER cn key with
    (ua, ub) tie-break. AA's 1/ln(deg) terms use the round-9
    DECIMAL(38,9) order-safe sum."""
    e = _edges(spark, sf_dir).localCheckpoint()  # feeds adj, anti, deg
    adj = e.select(F.col("ua").alias("u"), F.col("ub").alias("v")).unionAll(
        e.select(F.col("ub").alias("u"), F.col("ua").alias("v"))
    )
    deg = adj.groupBy(F.col("u").alias("vtx")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    a = adj.select(F.col("u").alias("x"), F.col("v").alias("b"))
    c = adj.select(F.col("u").alias("y"), F.col("v").alias("b"))
    wedge = a.join(c, "b").filter(F.col("x") < F.col("y"))
    term = F.round(
        1.0 / F.log(F.col("d").cast("double")), 9
    ).cast("decimal(38,9)")
    cand = (
        wedge.join(deg, wedge["b"] == deg["vtx"])
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum(term).cast("decimal(38,9)").alias("aa"),
        )
        .join(
            e,
            (F.col("x") == e["ua"]) & (F.col("y") == e["ub"]),
            "left_anti",
        )
    )
    dx = deg.select(F.col("vtx").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("vtx").alias("y"), F.col("d").alias("dy"))
    return (
        cand.join(dx, "x")
        .join(dy, "y")
        .select(
            F.col("x").alias("ua"),
            F.col("y").alias("ub"),
            "cn",
            F.round(
                F.col("cn")
                / (F.col("dx") + F.col("dy") - F.col("cn")).cast("double"),
                6,
            ).alias("jaccard"),
            F.col("aa").cast("double").alias("adamic_adar"),
        )
        .orderBy(F.col("cn").desc(), "ua", "ub")
        .limit(20)
    )


@query(
    "graph_clustering_local",
    # Per-vertex local clustering summarized: triangles-per-vertex
    # from the a<b<c enumeration (each triangle credited to all three
    # corners), cc_v = 2*t_v/(d_v*(d_v-1)) as an identical chain,
    # averaged via the round-9 DECIMAL pattern. Degree-1 vertices get
    # cc = 0 (count convention stated in the docstring).
    oracle=f"""
    WITH e AS (
      {_EDGE_SQL}
    ), deg AS (
      SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT ua AS v FROM e UNION ALL SELECT ub FROM e
      ) GROUP BY v
    ), tri AS (
      SELECT e1.ua AS a, e1.ub AS b, e2.ub AS c
      FROM e e1 JOIN e e2 ON e1.ub = e2.ua
      JOIN e e3 ON e1.ua = e3.ua AND e2.ub = e3.ub
    ), tv AS (
      SELECT v, CAST(count(*) AS BIGINT) AS t FROM (
        SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY v
    ), cc AS (
      SELECT deg.v, deg.d, COALESCE(tv.t, 0) AS t,
             CASE WHEN deg.d >= 2
                  THEN 2.0 * COALESCE(tv.t, 0)
                       / (CAST(deg.d AS DOUBLE) * (CAST(deg.d AS DOUBLE) - 1.0))
                  ELSE 0.0 END AS c
      FROM deg LEFT JOIN tv ON deg.v = tv.v
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vertices,
           round(CAST(sum(CAST(round(c, 9) AS DECIMAL(38,9))) AS DOUBLE)
                 / count(*), 6) AS avg_local_cc,
           CAST(count(*) FILTER (WHERE d >= 2 AND c >= 0.999999999)
                AS BIGINT) AS n_fully_clustered,
           CAST(count(*) FILTER (WHERE c = 0.0) AS BIGINT) AS n_open
    FROM cc
    """,
)
def graph_clustering_local(spark, sf_dir):
    """Average LOCAL clustering coefficient (Watts-Strogatz) plus the
    fully-clustered / open vertex census — the per-vertex complement
    of graph_triangle_count's global transitivity, and the standard
    small-world diagnostic. Plan: triangles enumerated once by the
    a<b<c convention and credited to all three corners (explode), one
    vertex groupBy, left join onto degrees, then a 1-row aggregate;
    the per-vertex cc chain is identical doubles and the average uses
    the round-9 DECIMAL(38,9) order-safe sum. The enumeration join
    here is the unoriented e1.ub=e2.ua form (correct for a<b<c-sorted
    edges); at power-law scale the oriented variant in
    graph_triangle_count bounds wedge fan-out and would be swapped
    in."""
    e = _edges(spark, sf_dir).localCheckpoint()
    deg = (
        e.select(F.explode(F.array("ua", "ub")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    e1 = e.select(F.col("ua").alias("a"), F.col("ub").alias("b"))
    e2 = e.select(F.col("ua").alias("b"), F.col("ub").alias("c"))
    e3 = e.select(F.col("ua").alias("a"), F.col("ub").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tv = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    dd = F.col("d").cast("double")
    cc = deg.join(tv, "v", "left").select(
        "d",
        F.coalesce(F.col("t"), F.lit(0)).alias("t"),
        F.when(
            F.col("d") >= 2,
            2.0 * F.coalesce(F.col("t"), F.lit(0)) / (dd * (dd - 1.0)),
        )
        .otherwise(0.0)
        .alias("c"),
    )
    return cc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
        F.round(
            F.sum(F.round(F.col("c"), 9).cast("decimal(38,9)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("avg_local_cc"),
        F.count(
            F.when((F.col("d") >= 2) & (F.col("c") >= 0.999999999), 1)
        )
        .cast("bigint")
        .alias("n_fully_clustered"),
        F.count(F.when(F.col("c") == 0.0, 1)).cast("bigint").alias("n_open"),
    ).select("n_vertices", "avg_local_cc", "n_fully_clustered", "n_open")
