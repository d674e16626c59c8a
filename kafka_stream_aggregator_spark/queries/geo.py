"""Spatial wave: grid-bucketed radius self-join and k-nearest-
neighbors over a planar point set — the two spatial primitives Spark
has no built-in for, expressed as the classic cell-grid decomposition
(the same blocking idea LSH uses for near-dup: bucket, join only
within adjacent buckets, verify exactly).

The point set is synthesized deterministically from the customer key
with the engine's portable 60-bit hash, as INTEGER thousandth
coordinates in [0, 1e6)² — so every distance² is an EXACT INTEGER,
every radius cut and every nearest-neighbor ranking is integer
arithmetic, and both engines agree bit-for-bit with no float anywhere.
A real deployment swaps the synthesized columns for lon/lat scaled to
integer microdegrees — the plan shape is identical.

Scale shape: the radius join never compares all pairs — each point
lands in one (cx, cy) cell of side = radius and is probed against the
3x3 neighborhood only (one explode to 9 candidate cells on the probe
side, one equi-join on the cell key, then the exact integer distance
filter). Cost is density-bounded per cell, the textbook spatial-join
contract; a skewed hot cell is the same failure mode as a hot LSH
bucket and takes the same cap/salt remedies.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sketches import portable_u64, portable_u64_sql
from .base import query, t

# side of the square world, in integer thousandths
_WORLD = 1_000_000
# radius for the pair join, in thousandths (15.0 units)
_R = 15_000

_PTS_SQL = f"""
      SELECT c_custkey AS pid,
             {portable_u64_sql('c_custkey', salt='gx')} % {_WORLD} AS xi,
             {portable_u64_sql('c_custkey', salt='gy')} % {_WORLD} AS yi
      FROM customer
"""


def _points(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("pid"),
        (portable_u64(F.col("c_custkey"), salt="gx") % _WORLD).alias("xi"),
        (portable_u64(F.col("c_custkey"), salt="gy") % _WORLD).alias("yi"),
    )


@query(
    "geo_radius_pairs",
    # All point pairs within distance R, via the cell-grid join:
    # build side keyed by its own cell, probe side exploded to the 3x3
    # neighborhood, exact integer d2 <= R*R filter, a<b dedup. Output:
    # total pair count + the 20 closest pairs (integer d2 ranking,
    # (pid_a, pid_b) tie-break).
    oracle=f"""
    WITH p AS (
      {_PTS_SQL}
    ), cells AS (
      SELECT pid, xi, yi, xi // {_R} AS cx, yi // {_R} AS cy FROM p
    ), probe AS (
      SELECT pid, xi, yi, cx + dx.d AS cx, cy + dy.d AS cy
      FROM cells,
           (VALUES (-1), (0), (1)) dx(d),
           (VALUES (-1), (0), (1)) dy(d)
    ), pairs AS (
      SELECT a.pid AS pid_a, b.pid AS pid_b,
             (a.xi - b.xi) * (a.xi - b.xi)
             + (a.yi - b.yi) * (a.yi - b.yi) AS d2
      FROM probe a JOIN cells b USING (cx, cy)
      WHERE a.pid < b.pid
        AND (a.xi - b.xi) * (a.xi - b.xi)
            + (a.yi - b.yi) * (a.yi - b.yi) <= {_R} * {_R}
    ), dedup AS (
      SELECT DISTINCT pid_a, pid_b, d2 FROM pairs
    ), ranked AS (
      SELECT pid_a, pid_b, d2,
             row_number() OVER (ORDER BY d2, pid_a, pid_b) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n_pairs
      FROM dedup
    )
    SELECT pid_a, pid_b, d2, n_pairs FROM ranked
    WHERE rn <= 20 ORDER BY d2, pid_a, pid_b
    """,
)
def geo_radius_pairs(spark, sf_dir):
    """Spatial radius self-join: every pair of points closer than R,
    without ever comparing all pairs — the proximity primitive behind
    store-cannibalization, sensor-dedup, and collision-screening
    queries. Plan: each point keyed by its radius-sized grid cell;
    the probe side explodes to its 3x3 cell neighborhood (9x fan-out,
    density-bounded); one equi-join on the cell key; the exact
    INTEGER d2 <= R^2 cut (coordinates are integer thousandths — no
    float comparison can flip engines); a<b + DISTINCT collapse the
    multi-cell duplicates. The 20 closest pairs ride out on a
    TakeOrderedAndProject over the integer (d2, pid_a, pid_b) key;
    n_pairs comes from a window over the deduped aggregate."""
    p = _points(spark, sf_dir)
    cells = p.select(
        "pid",
        "xi",
        "yi",
        (F.col("xi") / _R).cast("bigint").alias("cx"),
        (F.col("yi") / _R).cast("bigint").alias("cy"),
    )
    # floor-div: xi, yi are non-negative so cast-truncation == floor
    offs = F.array([F.lit(i) for i in (-1, 0, 1)])
    probe = (
        cells.withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .select(
            F.col("pid").alias("pid_a"),
            F.col("xi").alias("xa"),
            F.col("yi").alias("ya"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    build = cells.select(
        F.col("pid").alias("pid_b"),
        F.col("xi").alias("xb"),
        F.col("yi").alias("yb"),
        "cx",
        "cy",
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    pairs = (
        probe.join(build, ["cx", "cy"])
        .filter((F.col("pid_a") < F.col("pid_b")) & (d2 <= _R * _R))
        .select("pid_a", "pid_b", d2.alias("d2"))
        .distinct()
    )
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    # n_pairs window runs over the deduped pair aggregate (bounded by
    # density x n, and already the query's output-sized relation)
    ranked = pairs.select(
        "pid_a",
        "pid_b",
        "d2",
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n_pairs"),
        F.row_number()
        .over(W.orderBy("d2", "pid_a", "pid_b"))
        .alias("rn"),
    )
    return (
        ranked.filter(F.col("rn") <= 20)
        .select("pid_a", "pid_b", "d2", "n_pairs")
        .orderBy("d2", "pid_a", "pid_b")
    )


@query(
    "geo_knn",
    # Exact 3-NN for the 20 lowest-key query points against the full
    # point set: broadcast the 20 queries, map-only integer d2, per-
    # query partitioned rank on (d2, pid). All-integer ranking.
    oracle=f"""
    WITH p AS (
      {_PTS_SQL}
    ), q AS (
      SELECT pid AS qid, xi AS qx, yi AS qy FROM p
      ORDER BY pid LIMIT 20
    ), d AS (
      SELECT q.qid, p.pid,
             (p.xi - q.qx) * (p.xi - q.qx)
             + (p.yi - q.qy) * (p.yi - q.qy) AS d2
      FROM q JOIN p ON p.pid <> q.qid
    ), r AS (
      SELECT qid, pid, d2,
             row_number() OVER (PARTITION BY qid ORDER BY d2, pid) AS rnk
      FROM d
    )
    SELECT qid, rnk, pid AS neighbor, d2 FROM r
    WHERE rnk <= 3 ORDER BY qid, rnk
    """,
)
def geo_knn(spark, sf_dir):
    """Exact k-nearest-neighbors (k=3) for a 20-point query set over
    the full planar point set — the verification tier every
    approximate spatial index is measured against (the geo twin of
    cos_topk_bruteforce). Plan: the query set is a broadcast 20-row
    relation (GlobalLimit on the integer key); distances are map-only
    exact integers over one scan of the point set; the per-query rank
    window is PARTITIONED by qid. Integer (d2, pid) ordering — no
    float tie can flip the neighbor list."""
    p = _points(spark, sf_dir)
    q = (
        p.orderBy("pid")
        .limit(20)
        .select(
            F.col("pid").alias("qid"),
            F.col("xi").alias("qx"),
            F.col("yi").alias("qy"),
        )
    )
    d2 = (F.col("xi") - F.col("qx")) * (F.col("xi") - F.col("qx")) + (
        F.col("yi") - F.col("qy")
    ) * (F.col("yi") - F.col("qy"))
    d = (
        p.crossJoin(F.broadcast(q))
        .filter(F.col("pid") != F.col("qid"))
        .select("qid", "pid", d2.alias("d2"))
    )
    wq = W.partitionBy("qid").orderBy("d2", "pid")
    return (
        d.withColumn("rnk", F.row_number().over(wq))
        .filter(F.col("rnk") <= 3)
        .select("qid", "rnk", F.col("pid").alias("neighbor"), "d2")
        .orderBy("qid", "rnk")
    )
