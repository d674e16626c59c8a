"""Arrow-batched numpy cosine top-k — the vectorized tier for the
ann constant-factor watch item (docs/PERF_WEAK_r07.md).

The interpreted higher-order-function dot product costs ~16 folds x
64 mults per row in cos_topk_bruteforce / ivf scoring; this tier moves
the same arithmetic into ONE numpy matrix multiply per Arrow batch
(mapInPandas), which is the standard way to buy back the constant
factor until Spark codegens HOFs.

Semantics: identical ranking to brute_force_topk up to float-sum
order (numpy pairwise-sums the dot; the fold sums left-to-right) —
top-k SET equality is pinned in tests; exact value parity is NOT
claimed, which is why the query registers oracle=None with the exact
brute-force tier as its gate-tier twin.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numpy_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k via per-partition numpy matmul against the
    broadcast query matrix.

    queries: (q_id long, q_vec array<double>) — SMALL (collected to a
    broadcast numpy matrix: Q x dim doubles, the same driver-side
    footprint brute_force_topk's broadcast join ships).
    candidates: (c_id long, c_vec array<double>) — streamed through
    mapInPandas in Arrow batches; each batch does one (B x dim) @
    (dim x Q) matmul and emits per-batch top-k rows, then a global
    per-query top-k reduces the per-batch candidates (k rows per
    query per batch — bounded shuffle).
    """
    import numpy as np

    spark = queries.sparkSession
    q_rows = queries.collect()
    q_ids = np.array([r["q_id"] for r in q_rows], dtype="int64")
    q_mat = np.array([r["q_vec"] for r in q_rows], dtype="float64")
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    bq = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, qn = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["c_id"].to_numpy(dtype="int64")
            c_mat = np.stack(pdf["c_vec"].to_numpy())
            cn = np.sqrt((c_mat * c_mat).sum(axis=1))
            sims = (c_mat @ mat.T) / (cn[:, None] * qn[None, :])
            out_q, out_c, out_s = [], [], []
            for j in range(len(ids)):
                col = sims[:, j]
                mask = c_ids != ids[j]
                cc, ss = c_ids[mask], col[mask]
                if len(cc) == 0:
                    continue
                top = min(len(cc), k)
                # deterministic: sort by (-sim, c_id)
                order = sorted(range(len(cc)), key=lambda i: (-ss[i], cc[i]))[:top]
                out_q.extend([ids[j]] * top)
                out_c.extend(cc[i] for i in order)
                out_s.extend(ss[i] for i in order)
            yield pd.DataFrame(
                {"q_id": out_q, "c_id": out_c, "cos_sim": out_s}
            )

    scored = candidates.mapInPandas(
        score, "q_id long, c_id long, cos_sim double"
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
