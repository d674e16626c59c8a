"""Second spatial wave (round 7): Getis-Ord Gi*-style hotspot cells,
plus the feature-hashing collision census (the ML-side hash-bucket
twin of the same cell-bucketing idea).

Everything is integer-exact until one final z / rate chain: the point
grid is geo.py's integer-thousandths synthesis, cell counts and 3x3
neighborhood sums are integers, and the Gi* moments come from integer
totals over the FIXED 20x20 grid (absent cells are zeros by
definition, so the occupied-cell relation plus grid constants give
exact moments without materializing empties).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sketches import portable_u64, portable_u64_sql
from .base import query, t

_WORLD = 1_000_000
_CELL = 50_000  # 20 x 20 grid
_G = _WORLD // _CELL  # cells per side
_NCELLS = _G * _G

_PTS_SQL = f"""
      SELECT c_custkey AS pid,
             {portable_u64_sql('c_custkey', salt='gx')} % {_WORLD} AS xi,
             {portable_u64_sql('c_custkey', salt='gy')} % {_WORLD} AS yi
      FROM customer
"""


@query(
    "geo_hotspot_gi",
    # Gi*-style hotspot score per occupied cell of the fixed 20x20
    # grid: neighborhood sum over the 3x3 window (off-grid neighbors
    # do not exist; k_i counts the in-grid ones), z from the exact
    # global moments with N = 400 fixed cells (empties are zeros —
    # their contribution to the moments is literal 0, so only the
    # occupied relation is ever materialized). Emit cells with
    # z > 1.5.
    oracle=f"""
    WITH p AS ({_PTS_SQL}),
    cells AS (
      SELECT CAST(floor(xi / {_CELL}) AS BIGINT) AS cx,
             CAST(floor(yi / {_CELL}) AS BIGINT) AS cy,
             CAST(count(*) AS BIGINT) AS c
      FROM p GROUP BY 1, 2
    ), gstats AS (
      SELECT CAST(sum(c) AS BIGINT) AS total,
             CAST(sum(c * c) AS BIGINT) AS total2
      FROM cells
    ), nb AS (
      SELECT a.cx, a.cy, CAST(sum(b.c) AS BIGINT) AS s_i
      FROM cells a JOIN cells b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
      GROUP BY a.cx, a.cy
    ), k AS (
      SELECT cx, cy,
             CAST((least(cx + 1, {_G - 1}) - greatest(cx - 1, 0) + 1)
                  * (least(cy + 1, {_G - 1}) - greatest(cy - 1, 0) + 1)
                  AS BIGINT) AS k_i
      FROM cells
    ), z AS (
      SELECT nb.cx, nb.cy, nb.s_i, k.k_i, cells.c,
             (nb.s_i - (CAST(total AS DOUBLE) / {_NCELLS}) * k.k_i)
             / (sqrt(CAST(total2 AS DOUBLE) / {_NCELLS}
                     - (CAST(total AS DOUBLE) / {_NCELLS})
                       * (CAST(total AS DOUBLE) / {_NCELLS}))
                * sqrt(({_NCELLS}.0 * k.k_i - CAST(k.k_i AS DOUBLE) * k.k_i)
                       / {_NCELLS - 1})) AS gi
      FROM nb JOIN k ON nb.cx = k.cx AND nb.cy = k.cy
      JOIN cells ON nb.cx = cells.cx AND nb.cy = cells.cy
      CROSS JOIN gstats
    )
    SELECT cx, cy, c, s_i, k_i, round(gi, 6) AS gi_z
    FROM z WHERE gi > 1.5
    """,
)
def geo_hotspot_gi(spark, sf_dir):
    """Hotspots: cell aggregate (one shuffle), 3x3 neighborhood sum as
    a bounded cell-relation self-join, Gi* z from exact integer
    moments. The spatial-statistics layer over geo.py's grid — at any
    scale the joined relation is the CELL table, never points."""
    c = t(spark, sf_dir, "customer")
    p = c.select(
        (portable_u64(F.col("c_custkey"), salt="gx") % _WORLD).alias("xi"),
        (portable_u64(F.col("c_custkey"), salt="gy") % _WORLD).alias("yi"),
    )
    cells = p.groupBy(
        F.floor(F.col("xi") / _CELL).cast("bigint").alias("cx"),
        F.floor(F.col("yi") / _CELL).cast("bigint").alias("cy"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    glob = cells.agg(
        F.sum("c").cast("bigint").alias("total"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("total2"),
    )
    a = cells.select(
        F.col("cx").alias("acx"), F.col("cy").alias("acy")
    )
    nb = (
        a.join(
            cells,
            (F.abs(F.col("acx") - F.col("cx")) <= 1)
            & (F.abs(F.col("acy") - F.col("cy")) <= 1),
        )
        .groupBy(F.col("acx").alias("cx"), F.col("acy").alias("cy"))
        .agg(F.sum("c").cast("bigint").alias("s_i"))
    )
    k = cells.select(
        "cx",
        "cy",
        (
            (F.least(F.col("cx") + 1, F.lit(_G - 1)) - F.greatest(F.col("cx") - 1, F.lit(0)) + 1)
            * (F.least(F.col("cy") + 1, F.lit(_G - 1)) - F.greatest(F.col("cy") - 1, F.lit(0)) + 1)
        )
        .cast("bigint")
        .alias("k_i"),
    )
    xbar = F.col("total").cast("double") / _NCELLS
    sd = F.sqrt(
        F.col("total2").cast("double") / _NCELLS - xbar * xbar
    )
    gi = (F.col("s_i") - xbar * F.col("k_i")) / (
        sd
        * F.sqrt(
            (_NCELLS * F.col("k_i") - F.col("k_i").cast("double") * F.col("k_i"))
            / (_NCELLS - 1)
        )
    )
    return (
        nb.join(k, ["cx", "cy"])
        .join(cells, ["cx", "cy"])
        .crossJoin(F.broadcast(glob))
        .filter(gi > 1.5)
        .select("cx", "cy", "c", "s_i", "k_i", F.round(gi, 6).alias("gi_z"))
    )


@query(
    "ml_feature_hashing",
    # The hashing trick's collision census: cross features
    # (event_type x user_id) hash into 4096 buckets with the portable
    # hash; report the histogram of distinct-features-per-bucket and
    # the collision rate — the capacity check run before committing a
    # feature-hash width. Exact integers + one rate chain.
    oracle=f"""
    WITH f AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), b AS (
      SELECT {portable_u64_sql("(event_type || ':' || CAST(user_id AS VARCHAR))", salt='fh')}
               % 4096 AS bkt
      FROM f
    ), per AS (
      SELECT bkt, CAST(count(*) AS BIGINT) AS n_feats FROM b GROUP BY bkt
    )
    SELECT n_feats, CAST(count(*) AS BIGINT) AS n_buckets
    FROM per GROUP BY n_feats
    """,
)
def ml_feature_hashing(spark, sf_dir):
    """Feature-hash census: distinct feature relation -> bucket ->
    per-bucket distinct count -> histogram. Two bounded aggregates
    after the distinct; the 100 TB shape is identical with the
    feature relation replacing the demo cross."""
    ev = t(spark, sf_dir, "events")
    f = ev.select("event_type", "user_id").distinct()
    b = f.select(
        (
            portable_u64(
                F.concat(F.col("event_type"), F.lit(":"), F.col("user_id")),
                salt="fh",
            )
            % 4096
        ).alias("bkt")
    )
    per = b.groupBy("bkt").agg(F.count("*").cast("bigint").alias("n_feats"))
    return per.groupBy("n_feats").agg(
        F.count("*").cast("bigint").alias("n_buckets")
    )


@query(
    "geo_dbscan_core",
    # DBSCAN core-point census: a point is CORE if >= min_pts (5)
    # points (including itself) lie within eps = 15000 thousandths.
    # Grid-bucketed like geo_radius_pairs: eps-sided cells, probe side
    # exploded to its 3x3 neighborhood, one equi join on the cell key,
    # EXACT integer distance^2 filter — never all pairs. Report per
    # neighbor-count bucket how many points are core/non-core.
    oracle=f"""
    WITH p AS ({{pts}}),
    cells AS (
      SELECT pid, xi, yi, xi // {{eps}} AS cx, yi // {{eps}} AS cy FROM p
    ),
    probe AS (
      SELECT pid, xi, yi, cx + dx AS cx, cy + dy AS cy
      FROM cells,
           (SELECT unnest([-1, 0, 1]) AS dx) t1,
           (SELECT unnest([-1, 0, 1]) AS dy) t2
    ),
    nbr AS (
      SELECT a.pid,
             CAST(count(*) AS BIGINT) AS n_nbr  -- includes self (d=0)
      FROM probe a JOIN cells b ON a.cx = b.cx AND a.cy = b.cy
      WHERE (a.xi - b.xi) * (a.xi - b.xi)
            + (a.yi - b.yi) * (a.yi - b.yi) <= {{eps}} * {{eps}}
      GROUP BY a.pid
    )
    SELECT least(n_nbr, 10) AS nbr_bucket,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(count_if(n_nbr >= 5) AS BIGINT) AS n_core
    FROM nbr GROUP BY least(n_nbr, 10)
    """.format(pts=_PTS_SQL, eps=15_000),
)
def geo_dbscan_core(spark, sf_dir):
    """DBSCAN's expensive half (the eps-neighborhood census) as a
    density-bounded grid join; the label-propagation half is
    near_dup_clusters' connected components, already in-registry.
    Exact integer distances — both engines agree bit-for-bit."""
    from .geo import _points

    eps = 15_000
    p = _points(spark, sf_dir)
    cells = p.select(
        "pid",
        "xi",
        "yi",
        (F.col("xi") / eps).cast("bigint").alias("cx"),
        (F.col("yi") / eps).cast("bigint").alias("cy"),
    )
    d = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    probe = (
        cells.withColumn("dx", d)
        .withColumn("dy", d)
        .select(
            "pid",
            "xi",
            "yi",
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    b = cells.select(
        F.col("xi").alias("bx"), F.col("yi").alias("by"), "cx", "cy"
    )
    dist2 = (F.col("xi") - F.col("bx")) * (F.col("xi") - F.col("bx")) + (
        F.col("yi") - F.col("by")
    ) * (F.col("yi") - F.col("by"))
    nbr = (
        probe.join(b, ["cx", "cy"])
        .filter(dist2 <= eps * eps)
        .groupBy("pid")
        .agg(F.count("*").cast("bigint").alias("n_nbr"))
    )
    return nbr.groupBy(
        F.least(F.col("n_nbr"), F.lit(10)).alias("nbr_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.count_if(F.col("n_nbr") >= 5).cast("bigint").alias("n_core"),
    )
