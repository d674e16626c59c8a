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
    if not q_rows:
        # guard (ADVICE r7): np.array([]) is 1-D (0,), so the batch
        # matmul would raise a shape error inside mapInPandas; an empty
        # query set has an empty answer.
        return spark.createDataFrame(
            [], "q_id long, c_id long, cos_sim double, rank int"
        )
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


def hard_negatives_numpy(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Arrow-batched numpy tier for contrastive hard-negative mining —
    the measured twin of the oracle-exact HOF tier (VERDICT r11 item 4,
    mirroring numpy_topk/ivf_numpy_topk).

    Same semantics as queries/analytics42.py emb_hard_negatives: for
    each query vector, the top-k most-cosine-similar candidates with a
    DIFFERENT label, ranked (cos DESC, neg_id ASC). The difference is
    WHERE the arithmetic runs: the bounded query set is collected
    driver-side (Q x dim doubles — the identical footprint the HOF
    tier broadcasts), and each Arrow batch of candidates does ONE
    (B x dim) @ (dim x Q) matmul instead of per-pair interpreted
    aggregate() folds. Per-batch output is bounded by Q*k rows, then a
    global per-query window reduces — the only shuffle.

    Value parity with the HOF tier holds to float-sum order only
    (numpy pairwise summation vs left-to-right fold), so top-k SET
    equality per query is pinned in tests (tests/test_numpy_topk.py)
    and the registry row is oracle=None by design.

    queries: (q_id long, q_label long, q_vec array<double>), SMALL.
    candidates: (c_id long, c_label long, c_vec array<double>).
    Returns (q_id, rk, neg_id, q_label, neg_label, cos_sim) matching
    the HOF tier's column names.
    """
    import numpy as np

    spark = queries.sparkSession
    q_rows = queries.collect()
    if not q_rows:
        return spark.createDataFrame(
            [],
            "q_id long, rk long, neg_id long, q_label long,"
            " neg_label long, cos_sim double",
        )
    q_ids = np.array([r["q_id"] for r in q_rows], dtype="int64")
    q_labels = [r["q_label"] for r in q_rows]
    q_mat = np.array([r["q_vec"] for r in q_rows], dtype="float64")
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    bq = spark.sparkContext.broadcast((q_ids, q_labels, q_mat, q_norm))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, labels, mat, qn = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["c_id"].to_numpy(dtype="int64")
            c_labels = pdf["c_label"].to_numpy()
            c_mat = np.stack(pdf["c_vec"].to_numpy()).astype(
                "float64", copy=False
            )
            cn = np.sqrt((c_mat * c_mat).sum(axis=1))
            sims = (c_mat @ mat.T) / (cn[:, None] * qn[None, :])
            out_q, out_c, out_s, out_ql, out_cl = [], [], [], [], []
            for j in range(len(ids)):
                mask = c_labels != labels[j]
                cc, ss, cl = c_ids[mask], sims[mask, j], c_labels[mask]
                if len(cc) == 0:
                    continue
                top = min(len(cc), k)
                order = sorted(
                    range(len(cc)), key=lambda i: (-ss[i], cc[i])
                )[:top]
                out_q.extend([ids[j]] * top)
                out_ql.extend([labels[j]] * top)
                out_c.extend(cc[i] for i in order)
                out_cl.extend(cl[i] for i in order)
                out_s.extend(ss[i] for i in order)
            yield pd.DataFrame(
                {
                    "q_id": out_q,
                    "q_label": out_ql,
                    "neg_id": out_c,
                    "neg_label": out_cl,
                    "cos": out_s,
                }
            )

    scored = candidates.mapInPandas(
        score,
        "q_id long, q_label long, neg_id long, neg_label long,"
        " cos double",
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neg_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= k)
        .select(
            "q_id",
            "rk",
            "neg_id",
            "q_label",
            "neg_label",
            F.round("cos", 6).alias("cos_sim"),
        )
    )


def ivf_numpy_topk(
    queries: DataFrame,
    candidates: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-bucketed approximate cosine top-k with Arrow-batched numpy
    scoring — the production measured tier (VERDICT r7 item 1).

    Same IVF semantics as similarity.ivf_topk (reference tier, exactly
    SQL-oracled): candidates live in their 1 nearest cell, queries
    probe their n_probe nearest cells (both by dot/centroid_norm, ties
    to the smaller cell_id), scored pairs are exact cosine, final rank
    per query by (sim DESC, c_id). The difference is WHERE the
    arithmetic runs: centroids and queries are collected driver-side
    (k_cells x dim + Q x dim doubles — the identical footprint the HOF
    tier broadcasts), candidate cell-assignment AND pair scoring happen
    as numpy matmuls inside ONE mapInPandas pass over the candidate
    stream. No cell-assignment join, no per-pair interpreted
    higher-order-function folds; the only shuffle is the bounded
    per-batch top-k reduce (<= Q*k rows per Arrow batch).

    100 TB shape: candidates stream map-only through executors in Arrow
    batches; per-batch output is bounded by Q*k; the final window
    partitions on q_id (Q keys, k rows each). Structurally identical to
    the HOF tier minus one equi-join stage, at ~vectorized-matmul cost
    per pair instead of interpreted folds.

    Value parity with the HOF tier holds to float-sum order only
    (numpy pairwise summation vs left-to-right fold), so top-k SET
    equality is pinned in tests (tests/test_numpy_topk.py) and the
    registry row is oracle=None by design; near-tie cell assignments
    could in principle flip between tiers, which the set-equality pin
    would surface. Zero-norm vectors yield NaN sims (excluded from
    top-k by the mask ordering); empty query sets short-circuit.

    queries: (q_id long, q_vec array<double>), SMALL.
    candidates: (c_id long, c_vec array<double>), the big stream.
    centroids: (cell_id long, c_vec array<double>), SMALL.
    """
    import numpy as np

    spark = queries.sparkSession
    # Round-12 (guide §1/§5): ONE tagged-union collect instead of two —
    # each driver collect is a full job round trip (~100 ms of
    # scheduler/py4j latency at any data size); both relations are
    # bounded-small by contract. array<float> inputs widen to
    # array<double> exactly (same float64 the numpy path used).
    from pyspark.sql import functions as F

    tagged = queries.select(
        F.lit(0).alias("__t"),
        F.col("q_id").alias("__id"),
        F.col("q_vec").cast("array<double>").alias("__v"),
    ).unionByName(
        centroids.select(
            F.lit(1).alias("__t"),
            F.col("cell_id").alias("__id"),
            F.col("c_vec").cast("array<double>").alias("__v"),
        )
    )
    rows = tagged.collect()
    q_rows = [
        {"q_id": r["__id"], "q_vec": r["__v"]} for r in rows if r["__t"] == 0
    ]
    cent_rows = [
        {"cell_id": r["__id"], "c_vec": r["__v"]} for r in rows if r["__t"] == 1
    ]
    if not q_rows or not cent_rows:
        return spark.createDataFrame(
            [], "q_id long, c_id long, cos_sim double, rank int"
        )
    # centroid matrix sorted by cell_id ASC so np.argmax's
    # first-occurrence rule == the (sim DESC, cell_id ASC) tie-break
    cent_rows = sorted(cent_rows, key=lambda r: r["cell_id"])
    cell_ids = np.array([r["cell_id"] for r in cent_rows], dtype="int64")
    cent_mat = np.array([r["c_vec"] for r in cent_rows], dtype="float64")
    cent_norm = np.sqrt((cent_mat * cent_mat).sum(axis=1))

    q_ids = np.array([r["q_id"] for r in q_rows], dtype="int64")
    q_mat = np.array([r["q_vec"] for r in q_rows], dtype="float64")
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    # driver-side query->cells probe: rank cells by (-dot/cnorm, cell_id)
    q_cell_sims = (q_mat @ cent_mat.T) / cent_norm[None, :]
    probes: dict[int, list[int]] = {}  # cell index -> query indices
    np_probe = min(n_probe, len(cell_ids))
    for qi in range(len(q_ids)):
        order = sorted(
            range(len(cell_ids)),
            key=lambda ci: (-q_cell_sims[qi, ci], cell_ids[ci]),
        )[:np_probe]
        for ci in order:
            probes.setdefault(ci, []).append(qi)
    bc = spark.sparkContext.broadcast(
        (cell_ids, cent_mat, cent_norm, q_ids, q_mat, q_norm, probes)
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cids, cmat, cnormv, qids, qmat, qnormv, prb = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["c_id"].to_numpy(dtype="int64")
            # float32 -> float64 widening is exact, so accepting the raw
            # array<float> column here skips an interpreted per-element
            # transform(cast) over the whole candidate table
            c_mat = np.stack(pdf["c_vec"].to_numpy()).astype(
                "float64", copy=False
            )
            cn = np.sqrt((c_mat * c_mat).sum(axis=1))
            # 1 nearest cell per candidate; argmax first-occurrence ==
            # smaller cell_id on ties (rows sorted by cell_id)
            cell_idx = np.argmax((c_mat @ cmat.T) / cnormv[None, :], axis=1)
            out_q, out_c, out_s = [], [], []
            for ci in np.unique(cell_idx):
                qis = prb.get(int(ci))
                if not qis:
                    continue
                sel = cell_idx == ci
                sub_ids, sub_mat, sub_n = c_ids[sel], c_mat[sel], cn[sel]
                qsub = qmat[qis]  # (Qc x dim)
                sims = (sub_mat @ qsub.T) / (
                    sub_n[:, None] * qnormv[qis][None, :]
                )
                for j, qi in enumerate(qis):
                    mask = sub_ids != qids[qi]
                    cc, ss = sub_ids[mask], sims[mask, j]
                    if len(cc) == 0:
                        continue
                    top = min(len(cc), k)
                    order = sorted(
                        range(len(cc)), key=lambda i: (-ss[i], cc[i])
                    )[:top]
                    out_q.extend([qids[qi]] * top)
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
