"""Distributed PCA (stages/pca.py): exact covariance vs numpy twin,
partition invariance, projection correctness, whitening."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from rdfa_ray.stages.pca import (
    covariance_pairs,
    embedding_mean,
    pca_components,
    pca_project,
)

DIM = 6


def _embs(X):
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(X), dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in X],
        }
    )
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _X(n=50, seed=3):
    rng = np.random.RandomState(seed)
    base = rng.randn(n, 2)
    # rank-2 structure + small noise: two dominant components
    lift = np.random.RandomState(0).randn(2, DIM)
    return (base @ lift + 0.01 * rng.randn(n, DIM)).astype(np.float32)


def _twin_cov(X):
    x64 = X.astype(np.float64)
    sq = np.floor(x64 * 1e9 + 0.5).astype(np.int64).sum(axis=0)
    mu = (sq.astype(np.float64) / 1e9) / len(X)
    c = x64 - mu
    q = np.zeros((DIM, DIM), np.int64)
    for r in range(len(c)):
        q += np.floor(np.outer(c[r], c[r]) * 1e9 + 0.5).astype(np.int64)
    return mu, q


def test_covariance_matches_twin_and_partitions(ray_session):
    X = _X()
    mu_t, q_t = _twin_cov(X)
    for parts in (1, 7):
        ds = _embs(X).repartition(parts)
        mu, n = embedding_mean(ds.materialize(), DIM)
        assert n == len(X)
        np.testing.assert_array_equal(mu, mu_t)
        pairs = covariance_pairs(ds, DIM).to_pandas()
        got = np.zeros((DIM, DIM), np.int64)
        got[
            pairs["i"].to_numpy(np.int64) - 1,
            pairs["j"].to_numpy(np.int64) - 1,
        ] = pairs["cov_q"].to_numpy(np.int64)
        np.testing.assert_array_equal(got, q_t)


def test_components_capture_planted_structure(ray_session):
    X = _X(n=200)
    comp, lam, mu, n = pca_components(_embs(X), DIM, n_components=DIM)
    assert n == 200
    # eigenvalues descending; rank-2 structure -> big gap after 2
    assert all(lam[k] >= lam[k + 1] for k in range(DIM - 1))
    assert lam[1] > 100 * lam[2]
    # orthonormal rows, deterministic sign
    np.testing.assert_allclose(comp @ comp.T, np.eye(DIM), atol=1e-9)
    for r in range(DIM):
        assert comp[r, int(np.argmax(np.abs(comp[r])))] > 0


def test_projection_matches_numpy_and_is_invariant(ray_session):
    X = _X(n=80)
    out1 = (
        pca_project(_embs(X), DIM, n_components=2)
        .to_pandas()
        .sort_values("vec_id")
    )
    out2 = (
        pca_project(_embs(X).repartition(5), DIM, n_components=2)
        .to_pandas()
        .sort_values("vec_id")
    )
    q1 = np.stack(out1["proj_q"].to_numpy())
    q2 = np.stack(out2["proj_q"].to_numpy())
    np.testing.assert_array_equal(q1, q2)  # bit-identical across layouts
    comp, _lam, mu, _n = pca_components(_embs(X), DIM, 2)
    want = (X.astype(np.float64) - mu) @ comp.T
    got = np.stack(out1["proj"].to_numpy())
    np.testing.assert_allclose(got, want, atol=1e-12)
    # projections reconstruct the rank-2 data well
    recon = got @ comp + mu
    assert np.abs(recon - X.astype(np.float64)).max() < 0.1


def test_whitening_unit_variance(ray_session):
    X = _X(n=300)
    out = pca_project(_embs(X), DIM, n_components=2, whiten=True).to_pandas()
    z = np.stack(out["proj"].to_numpy())
    v = z.var(axis=0)
    np.testing.assert_allclose(v, [1.0, 1.0], rtol=0.05)


def test_empty_embeddings_raise(ray_session):
    ds = _embs(np.zeros((0, DIM), np.float32))
    with pytest.raises(ValueError):
        embedding_mean(ds, DIM)


def test_pca_checked_invariants(ray_session):
    from rdfa_ray.stages.pca import pca_checked

    rng = np.random.default_rng(11)
    X = rng.normal(0, 1, (200, DIM)).astype(np.float32)
    row = pca_checked(_embs(X), DIM, n_components=3).to_pandas().iloc[0]
    assert row["n_rows"] == 200 and row["trace_q"] > 0
    assert bool(row["orthonormal_ok"])
    assert bool(row["var_monotone_ok"])
    assert bool(row["proj_var_ok"])
