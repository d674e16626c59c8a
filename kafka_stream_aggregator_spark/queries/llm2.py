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
