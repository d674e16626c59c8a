"""Round-8 wave 30: randomness tests on count series, exact HITS, and
embedding triplet-margin evaluation.

Determinism: the count series are integers, so runs/turning-point
moments and both HITS iterations are pure integer arithmetic; triplet
cosines are fixed per-row chains (no accumulation)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .base import query, t


@query(
    "ts_runs_test",
    # Wald-Wolfowitz runs test about the MEAN of the hourly count
    # series per event type (sign = count > mean, ties below —
    # documented choice). Runs counted with one lag; n1/n2/R are
    # BIGINTs, Z is a closed-form chain.
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ), st AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM hourly GROUP BY event_type
    ), sg AS (
      SELECT h.event_type,
             CASE WHEN c * st.n > st.s THEN 1 ELSE 0 END AS up,
             lag(CASE WHEN c * st.n > st.s THEN 1 ELSE 0 END)
               OVER (PARTITION BY h.event_type ORDER BY hr) AS prev
      FROM hourly h JOIN st ON h.event_type = st.event_type
    ), m AS (
      SELECT event_type,
             CAST(sum(up) AS BIGINT) AS n1,
             CAST(count(*) - sum(up) AS BIGINT) AS n2,
             CAST(1 + count_if(prev IS NOT NULL AND up <> prev)
                  AS BIGINT) AS runs
      FROM sg GROUP BY event_type
    )
    SELECT event_type, n1, n2, runs,
           round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((CAST(n1 + n2 AS DOUBLE))
                           * (n1 + n2) * (n1 + n2 - 1))), 6) AS z_runs
    FROM m WHERE n1 > 0 AND n2 > 0
    """,
)
def ts_runs_test(spark, sf_dir):
    """Runs test: sign via the INTEGER cross-multiplied comparison
    c*n > s (no float mean ever materializes), one lag over the
    bounded hourly relation, Z from exact counts."""
    ev = t(spark, sf_dir, "events")
    hr = F.floor(F.col("ts").cast("double") / 3600).cast("bigint")
    hourly = ev.groupBy("event_type", hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    st = hourly.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    up = F.when(F.col("c") * F.col("n") > F.col("s"), 1).otherwise(0)
    w = W.partitionBy("event_type").orderBy("hr")
    sg = (
        hourly.join(F.broadcast(st), "event_type")
        .select("event_type", "hr", up.alias("up"))
        .select(
            "event_type", "up", F.lag("up").over(w).alias("prev")
        )
    )
    m = sg.groupBy("event_type").agg(
        F.sum("up").cast("bigint").alias("n1"),
        (F.count("*") - F.sum("up")).cast("bigint").alias("n2"),
        (
            1
            + F.count_if(
                F.col("prev").isNotNull() & (F.col("up") != F.col("prev"))
            )
        )
        .cast("bigint")
        .alias("runs"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("runs")
    nn = n1 + n2
    mu = 2.0 * n1 * n2 / nn + 1
    var = (
        2.0
        * n1
        * n2
        * (2.0 * n1 * n2 - n1 - n2)
        / (nn.cast("double") * nn * (nn - 1))
    )
    return m.filter((n1 > 0) & (n2 > 0)).select(
        "event_type",
        "n1",
        "n2",
        "runs",
        F.round((r - mu) / F.sqrt(var), 6).alias("z_runs"),
    )


@query(
    "ts_turning_points",
    # Turning-point randomness test on the hourly count series:
    # T = #{t : (c_t - c_{t-1})(c_{t+1} - c_t) < 0} (flat neighbors
    # are not turns — documented), E[T] = 2(n-2)/3,
    # Var[T] = (16n - 29)/90. Integers + one closed chain.
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
             count(*) AS c
      FROM events GROUP BY 1, 2
    ), lagged AS (
      SELECT event_type, c,
             lag(c, 1) OVER w AS cp,
             lead(c, 1) OVER w AS cn
      FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    ), m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count_if(cp IS NOT NULL AND cn IS NOT NULL
                   AND (c - cp) * (cn - c) < 0) AS BIGINT) AS turns
      FROM lagged GROUP BY event_type
    )
    SELECT event_type, n, turns,
           round((turns - 2.0 * (n - 2) / 3)
                 / sqrt((16.0 * n - 29) / 90), 6) AS z_turning
    FROM m WHERE n > 2
    """,
)
def ts_turning_points(spark, sf_dir):
    """Turning points: one lag + one lead over the bounded hourly
    relation; the turn predicate is integer arithmetic."""
    ev = t(spark, sf_dir, "events")
    hr = F.floor(F.col("ts").cast("double") / 3600).cast("bigint")
    hourly = ev.groupBy("event_type", hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("event_type").orderBy("hr")
    lagged = hourly.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("cp"),
        F.lead("c", 1).over(w).alias("cn"),
    )
    turn = (
        F.col("cp").isNotNull()
        & F.col("cn").isNotNull()
        & ((F.col("c") - F.col("cp")) * (F.col("cn") - F.col("c")) < 0)
    )
    m = lagged.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.count_if(turn).cast("bigint").alias("turns"),
    )
    z = (F.col("turns") - 2.0 * (F.col("n") - 2) / 3) / F.sqrt(
        (16.0 * F.col("n") - 29) / 90
    )
    return m.filter(F.col("n") > 2).select(
        "event_type", "n", "turns", F.round(z, 6).alias("z_turning")
    )


@query(
    "graph_hits_2iter",
    # Two UNNORMALIZED HITS iterations on the directed co-occurrence
    # graph (edge ua -> ub, ua < ub): from h0 = 1,
    # a1 = in-degree, h1(u) = sum a1 over u's out-neighbors,
    # a2(v) = sum h1 over v's in-neighbors — every score an exact
    # BIGINT (normalization only rescales the ranking, documented).
    # Top 15 authorities by (a2 DESC, node).
    oracle="""
    WITH e AS (
      SELECT DISTINCT a.user_id AS ua, b2.user_id AS ub
      FROM (SELECT DISTINCT user_id, event_type,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS w
            FROM events WHERE user_id < 120) a
      JOIN (SELECT DISTINCT user_id, event_type,
                   CAST(floor(epoch(ts) / 300) AS BIGINT) AS w
            FROM events WHERE user_id < 120) b2
        ON a.event_type = b2.event_type AND a.w = b2.w
       AND a.user_id < b2.user_id
    ), a1 AS (
      SELECT ub AS v, CAST(count(*) AS BIGINT) AS a1 FROM e GROUP BY ub
    ), h1 AS (
      SELECT e.ua AS u, CAST(sum(a1.a1) AS BIGINT) AS h1
      FROM e JOIN a1 ON e.ub = a1.v GROUP BY e.ua
    ), a2 AS (
      SELECT e.ub AS v, CAST(sum(h1.h1) AS BIGINT) AS a2
      FROM e JOIN h1 ON e.ua = h1.u GROUP BY e.ub
    )
    SELECT v AS node, a2.a2 AS authority2, a1.a1 AS authority1
    FROM a2 JOIN a1 USING (v)
    ORDER BY a2.a2 DESC, v LIMIT 15
    """,
)
def graph_hits_2iter(spark, sf_dir):
    """HITS without floats: unnormalized hub/authority updates are
    integer sums over edge joins (two vertex-keyed shuffles per
    iteration — the PageRank shape); ranking is scale-invariant so
    the BIGINT scores carry the exact ordering."""
    from .graph2 import _edges

    e = _edges(spark, sf_dir).localCheckpoint()
    a1 = e.groupBy(F.col("ub").alias("v")).agg(
        F.count("*").cast("bigint").alias("a1")
    )
    h1 = (
        e.join(a1, e.ub == a1.v)
        .groupBy(F.col("ua").alias("u"))
        .agg(F.sum("a1").cast("bigint").alias("h1"))
    )
    a2 = (
        e.join(h1, e.ua == h1.u)
        .groupBy(F.col("ub").alias("v"))
        .agg(F.sum("h1").cast("bigint").alias("a2"))
    )
    return (
        a2.join(a1, "v")
        .select(
            F.col("v").alias("node"),
            F.col("a2").alias("authority2"),
            F.col("a1").alias("authority1"),
        )
        .orderBy(F.col("authority2").desc(), "node")
        .limit(15)
    )


@query(
    "emb_triplet_margin",
    # Triplet-margin evaluation over deterministic (anchor, pos, neg)
    # triples built by id arithmetic (a < 40, pos = a+150,
    # neg = a+300 — present at every SF): margin = cos(a,p) - cos(a,n)
    # per triple plus the satisfied-at-0.05 flag; per-row chains, no
    # accumulation.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    tr AS (
      SELECT a.vec_id AS anchor,
             list_dot_product(a.v, p.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(p.v, p.v))) AS cos_pos,
             list_dot_product(a.v, n.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(n.v, n.v))) AS cos_neg
      FROM e a JOIN e p ON p.vec_id = a.vec_id + 150
               JOIN e n ON n.vec_id = a.vec_id + 300
      WHERE a.vec_id < 40
    )
    SELECT anchor, round(cos_pos, 6) AS cos_pos,
           round(cos_neg, 6) AS cos_neg,
           round(cos_pos - cos_neg, 6) AS margin,
           CAST(cos_pos - cos_neg > 0.05 AS BOOLEAN) AS satisfied
    FROM tr
    """,
)
def emb_triplet_margin(spark, sf_dir):
    """Triplet margins: two id-shifted self equi joins (hash joins on
    vec_id), per-row cosine chains — the eval harness shape for
    contrastive-embedding QA."""
    from ..llm.similarity import as_double, cosine_sim

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    a = e.filter(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("anchor"), F.col("v").alias("va")
    )
    p = e.select((F.col("vec_id") - 150).alias("anchor"), F.col("v").alias("vp"))
    n = e.select((F.col("vec_id") - 300).alias("anchor"), F.col("v").alias("vn"))
    tr = a.join(p, "anchor").join(n, "anchor")
    cp = cosine_sim(F.col("va"), F.col("vp"))
    cn = cosine_sim(F.col("va"), F.col("vn"))
    return tr.select(
        "anchor",
        F.round(cp, 6).alias("cos_pos"),
        F.round(cn, 6).alias("cos_neg"),
        F.round(cp - cn, 6).alias("margin"),
        (cp - cn > 0.05).alias("satisfied"),
    )


@query(
    "events_hazard_rate",
    # Discrete-time churn hazard: week k's hazard = users whose LAST
    # activity falls in week k / users still at risk at week k
    # (last activity >= k). Exact integer counts; the at-risk series
    # is a reversed cumulative sum over the bounded week relation.
    oracle="""
    WITH u AS (
      SELECT user_id,
             CAST(max(floor(epoch(ts) / 604800)) AS BIGINT) AS last_wk
      FROM events GROUP BY user_id
    ), wk AS (
      SELECT last_wk AS wk, CAST(count(*) AS BIGINT) AS churned
      FROM u GROUP BY last_wk
    ), r AS (
      SELECT wk, churned,
             CAST(sum(churned) OVER (ORDER BY wk DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS at_risk
      FROM wk
    )
    SELECT wk, churned, at_risk,
           round(CAST(churned AS DOUBLE) / at_risk, 6) AS hazard
    FROM r
    """,
)
def events_hazard_rate(spark, sf_dir):
    """Churn hazard: one user-grain max (map-combinable), one count
    over the bounded week relation, one reversed cumulative window on
    it — at 100 TB only the first aggregate sees data."""
    ev = t(spark, sf_dir, "events")
    wk = F.floor(F.col("ts").cast("double") / 604800).cast("bigint")
    u = ev.groupBy("user_id").agg(F.max(wk).alias("last_wk"))
    wkr = u.groupBy(F.col("last_wk").alias("wk")).agg(
        F.count("*").cast("bigint").alias("churned")
    )
    rev = W.orderBy(F.col("wk").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    r = wkr.select(
        "wk",
        "churned",
        F.sum("churned").over(rev).cast("bigint").alias("at_risk"),
    )
    return r.select(
        "wk",
        "churned",
        "at_risk",
        F.round(F.col("churned").cast("double") / F.col("at_risk"), 6).alias(
            "hazard"
        ),
    )
