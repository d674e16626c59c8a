"""Second LLM-ops wave file (round 7): the Arrow-batched numpy
cosine top-k tier (see llm/numpy_topk.py).

Registered oracle-less BY DESIGN: numpy's pairwise summation and the
fold's left-to-right summation differ in ulps, so exact value parity
with the SQL oracle is not claimed — instead the top-k SET equality
with cos_topk_bruteforce (the exact gate tier) is pinned in
tests/test_numpy_topk.py, and the driver records the rows-only check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llm.numpy_topk import ivf_numpy_topk, numpy_topk
from ..llm.similarity import as_double, pseudo_centroids
from .base import query, t


@query("ann_numpy_topk", oracle=None)
def ann_numpy_topk(spark, sf_dir):
    """Vectorized exact top-k: one numpy matmul per Arrow batch
    (mapInPandas), per-batch top-k, bounded global reduce — the
    constant-factor answer to the interpreted-HOF watch item in
    docs/PERF_WEAK_r07.md. Top-k sets equal the brute-force tier's
    (pinned); values agree to float-sum order."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    cands = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    out = numpy_topk(queries, cands, k=5)
    return out.select(
        "q_id", "c_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


@query("ann_ivf_numpy_topk", oracle=None, bench=True)
def ann_ivf_numpy_topk_q(spark, sf_dir):
    """IVF + Arrow/numpy scoring — the production measured ANN tier
    (VERDICT r7 item 1): same cells/probes/ranking as ann_ivf_topk
    (the exactly-SQL-oracled reference tier, llm/similarity.py), with
    candidate cell-assignment and pair scoring as per-batch numpy
    matmuls in one mapInPandas pass instead of interpreted
    higher-order-function folds. Top-k sets pinned equal to the HOF
    tier in tests/test_numpy_topk.py; recall floor vs brute force in
    docs/ANN_RECALL.md. oracle=None by design (float-sum order)."""
    # raw array<float> throughout: driver-side np.array / in-batch
    # astype widen float32->float64 exactly, so values match the HOF
    # tier's transform(cast) without an interpreted pass over the table
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("v")
    )
    cents = pseudo_centroids(e, "v", "vec_id", n_cells=16)
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    cands = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    out = ivf_numpy_topk(queries, cands, cents, k=5, n_probe=4)
    return out.select(
        "q_id", "c_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    )


@query(
    "ann_recall_at5",
    # Recall@5 of the IVF tier against exact brute force, as a
    # REGISTERED RELATIONAL OP (the recall number the tests pin is
    # here made oracle-verifiable): both tiers are deterministic
    # (id-ordered seeds, cell/c_id tiebreaks), so the per-query
    # intersection size is exact on both engines. 16 cells, 4 probes,
    # queries vec_id < 10 — the ann_ivf_topk config.
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cell_id, v AS c_vec FROM e ORDER BY vec_id LIMIT 16),
    cn AS (SELECT cell_id, c_vec, sqrt(list_dot_product(c_vec, c_vec)) AS cnorm FROM cents),
    cand_cell AS (
      SELECT c_id, cv, cell_id FROM (
        SELECT e.vec_id AS c_id, e.v AS cv, cn.cell_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, cn.c_vec) / cn.cnorm DESC,
                          cn.cell_id) AS rk
        FROM e CROSS JOIN cn) WHERE rk <= 1
    ),
    q_cell AS (
      SELECT q_id, qv, cell_id FROM (
        SELECT e.vec_id AS q_id, e.v AS qv, cn.cell_id,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_dot_product(e.v, cn.c_vec) / cn.cnorm DESC,
                          cn.cell_id) AS rk
        FROM e CROSS JOIN cn WHERE e.vec_id < 10) WHERE rk <= 4
    ),
    ivf AS (
      SELECT q_id, c_id FROM (
        SELECT q_id, c_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cos_sim DESC, c_id) AS rank
        FROM (SELECT q_id, c_id, max(list_dot_product(qv, cv)
                     / (sqrt(list_dot_product(qv, qv))
                        * sqrt(list_dot_product(cv, cv)))) AS cos_sim
              FROM q_cell q JOIN cand_cell c USING (cell_id)
              WHERE q.q_id <> c.c_id GROUP BY q_id, c_id))
      WHERE rank <= 5
    ),
    exact AS (
      SELECT q_id, c_id FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_dot_product(q.v, c.v)
                          / (sqrt(list_dot_product(q.v, q.v))
                             * sqrt(list_dot_product(c.v, c.v))) DESC,
                          c.vec_id) AS rank
        FROM e q JOIN e c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10)
      WHERE rank <= 5
    )
    SELECT exact.q_id,
           CAST(count(ivf.c_id) AS BIGINT) AS n_hit,
           round(count(ivf.c_id) / 5.0, 6) AS recall_at5
    FROM exact LEFT JOIN ivf
      ON exact.q_id = ivf.q_id AND exact.c_id = ivf.c_id
    GROUP BY exact.q_id
    """,
)
def ann_recall_at5(spark, sf_dir):
    """Per-query recall@5 of IVF vs brute force — the ANN quality
    metric as a first-class relational op (both tiers deterministic,
    so even the RECALL of the approximation is oracle-checked)."""
    from ..llm.similarity import brute_force_topk, ivf_topk, pseudo_centroids

    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    cents = pseudo_centroids(e, "v", "vec_id", n_cells=16)
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    cands = e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec"))
    ivf = ivf_topk(queries, cands, cents, k=5, n_probe=4).select(
        "q_id", "c_id", F.lit(1).alias("hit")
    )
    exact = brute_force_topk(queries, cands, k=5).select("q_id", "c_id")
    j = exact.join(ivf, ["q_id", "c_id"], "left")
    return j.groupBy("q_id").agg(
        F.count("hit").cast("bigint").alias("n_hit"),
        F.round(F.count("hit") / 5.0, 6).alias("recall_at5"),
    )
