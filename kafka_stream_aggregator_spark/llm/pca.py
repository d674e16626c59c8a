"""Distributed PCA for embedding columns.

The 100 TB shape: sufficient statistics (count, sum vector, sum of
outer products) are computed with Arrow-batched numpy matmuls inside
``mapInPandas`` — one pass over the data, one tiny partial row per
batch — then reduced in Spark. Only the reduced d x d moment matrix
(d=64 -> 32 KB) is fetched to the driver for the eigensolve; the fetch
is O(d^2), INDEPENDENT of row count, exactly like materializing any
fitted model. The projection back over the data is pure Catalyst
column algebra (zip_with dot products against literal component
arrays), no Python in the big pass.

Sign convention: each component is flipped so its largest-magnitude
coordinate is positive — eigenvectors are otherwise sign-ambiguous and
results would be run-dependent.

Reference parity: the reference has no linear algebra; this extends the
north-star LLM-pipeline surface (dimensionality reduction ahead of the
IVF/PQ ANN tiers in llm/similarity.py and llm/pq.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: list[float]          # d
    components: list[list[float]]  # k rows of d (descending eigenvalue)
    explained_variance: list[float]  # k eigenvalues


def _sum_array_column(df: DataFrame, col: str) -> list[float]:
    """Elementwise sum of an array<double> column -> one python list.
    Shuffle cardinality = array length (tiny); the terminal fetch is a
    single row."""
    row = (
        df.select(F.posexplode(col).alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("v"))
        .agg(F.array_sort(F.collect_list(F.struct("i", "v"))).alias("a"))
        .first()
    )
    return [x["v"] for x in row["a"]]


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> PCAModel:
    import numpy as np
    import pandas as pd

    def moments(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            yield pd.DataFrame(
                {
                    "n": [float(len(m))],
                    "s": [m.sum(axis=0).tolist()],
                    "o": [(m.T @ m).ravel().tolist()],
                }
            )

    mom = df.select(vec_col).mapInPandas(
        moments, schema="n double, s array<double>, o array<double>"
    )
    # localCheckpoint would re-run the pass 3x otherwise (n, s, o reads)
    mom = mom.localCheckpoint(eager=True)
    n = mom.agg(F.sum("n")).first()[0]
    s = _sum_array_column(mom, "s")
    o = _sum_array_column(mom, "o")
    d = len(s)
    mean = np.array(s) / n
    cov = np.array(o).reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:  # sign canonicalization
            v = -v
        comps.append(v.tolist())
    return PCAModel(
        mean=mean.tolist(),
        components=comps,
        explained_variance=[float(evals[i]) for i in order],
    )


def _dot_lit(vec_col, weights: list[float]):
    lit = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_project(
    df: DataFrame, model: PCAModel, vec_col: str = "embedding"
) -> DataFrame:
    """Append p0..p{k-1} projection columns: (v - mean) . comp_j,
    expanded to dot(v, comp_j) - const_j so the hot path is one literal
    dot product per component — codegen'd, no Python, no shuffle."""
    cols = [df[c] for c in df.columns]
    for j, comp in enumerate(model.components):
        const = float(sum(m * c for m, c in zip(model.mean, comp)))
        cols.append((_dot_lit(F.col(vec_col), comp) - F.lit(const)).alias(f"p{j}"))
    return df.select(*cols)
