"""Distributed PCA (llm.pca): the eigensolve has no SQL oracle, so the
invariants ARE the correctness contract — orthonormal components,
descending explained variance matching the projected variance, and
equality with a numpy reference PCA on the same rows."""

from __future__ import annotations

import numpy as np
import pytest

from kafka_stream_aggregator_spark.llm.pca import pca_fit, pca_project
from kafka_stream_aggregator_spark.tables import load_table


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb, "embedding", k=8)
    rows = emb.select("vec_id", "embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype="float64")
    ids = [r["vec_id"] for r in rows]
    return model, x, ids, emb


def test_components_orthonormal(fitted):
    model, _, _, _ = fitted
    c = np.array(model.components)
    gram = c @ c.T
    assert np.allclose(gram, np.eye(len(c)), atol=1e-9)


def test_explained_variance_descending_nonnegative(fitted):
    model, _, _, _ = fitted
    ev = model.explained_variance
    assert all(a >= b for a, b in zip(ev, ev[1:]))
    assert all(v >= -1e-12 for v in ev)


def test_matches_numpy_reference(fitted):
    """Same mean, same eigenvalues, same components (up to the pinned
    sign convention), same projections as numpy on the collected rows."""
    model, x, ids, emb = fitted
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / len(x)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][: len(model.components)]
    assert np.allclose(model.mean, mean, atol=1e-9)
    assert np.allclose(
        model.explained_variance, evals[order], rtol=1e-9, atol=1e-12
    )
    for j, idx in enumerate(order):
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        assert np.allclose(model.components[j], v, atol=1e-8), f"component {j}"
    # distributed projection == numpy projection, row for row
    proj = {
        r["vec_id"]: [r[f"p{j}"] for j in range(len(model.components))]
        for r in pca_project(emb, model, "embedding").collect()
    }
    ref = (x - mean) @ np.array(model.components).T
    for i, vid in enumerate(ids):
        assert np.allclose(proj[vid], ref[i], atol=1e-6)


def test_projected_variance_equals_eigenvalue(fitted):
    model, x, _, _ = fitted
    ref = (x - np.array(model.mean)) @ np.array(model.components).T
    got = ref.var(axis=0)
    assert np.allclose(got, model.explained_variance, rtol=1e-6)
