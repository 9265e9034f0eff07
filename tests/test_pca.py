"""PCA basis + projection property gates (the non-SQL-expressible
consumer of embed_covariance — eigendecomposition has no DuckDB twin,
so the contract is pinned by algebraic properties instead of an
oracle row-compare)."""

import numpy as np
import pytest

from webextract import corpus

SF = "/root/testdata/sf0.01"
R = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def basis(emb):
    return corpus.pca_basis(emb, r=R)


def test_basis_orthonormal(basis):
    _, W, _ = basis
    g = W @ W.T
    assert np.allclose(g, np.eye(R), atol=1e-10)


def test_eigenvalues_descending_positive(basis):
    _, _, evals = basis
    assert all(evals[i] >= evals[i + 1] for i in range(R - 1))
    assert evals[-1] > 0


def test_sign_convention(basis):
    """Each component's largest-|entry| is positive — the basis is a
    deterministic artifact, not an eigh sign quirk."""
    _, W, _ = basis
    for row in W:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_projected_covariance_is_diagonal(spark, emb, basis):
    """Sample covariance of the projections == diag(top-r eigenvalues)
    of the input covariance (the defining PCA identity), up to the
    micro-unit quantization noise embed_covariance's integer contract
    introduces (|err| ~ 1e-6 * |x|, far under the 1e-4 gate)."""
    _, _, evals = basis
    rows = corpus.pca_project(emb, r=R).collect()
    P = np.array([r["proj"] for r in rows])
    cov = np.cov(P, rowvar=False, ddof=1)
    assert np.allclose(np.diag(cov), evals, rtol=1e-3, atol=1e-4)
    off = cov - np.diag(np.diag(cov))
    assert np.max(np.abs(off)) < 1e-4


def test_projection_plan_is_narrow(emb):
    """The corpus-side stage is one Arrow kernel + projection: no
    exchange, no join — pq_encode's stage profile."""
    plan = corpus.pca_project(emb, r=R)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
