"""Distributed PCA over an embedding column — the preprocessing step
embedding-dedup / retrieval pipelines run before clustering (decorrelate
and reduce d-dim vectors, whiten for cosine work).

Distribution shape (the 100-TB plan):

* pass 1 (mean): per-block per-dimension sums of integer-quantized
  coordinates — d int64 rows per block, ONE tiny groupby.
* pass 2 (covariance): per-block partial Gram of the mean-centered
  rows, with every per-(row, i, j) product quantized to integer
  nano-units BEFORE summation — int64 totals are exact under any block
  layout, so the covariance (and everything derived from it:
  eigenvectors, projections) is bit-identical at any parallelism or
  resume point.  The exchange is d*d rows per block (4,096 for d=64),
  never proportional to the corpus.
* eigendecomposition on the driver (a d x d symmetric matrix —
  trivial), then projection is one broadcast-components map over the
  vectors.

``pca_covariance`` is SQL-oracle-checked end to end (DuckDB computes
the identical quantized sums via unnest + self-join on vec_id);
projection is rows-only (LAPACK eigh), pinned by a numpy twin and
partition-invariance pytests.  Eigenvector sign is fixed by the
largest-|component|-positive convention so projections are stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_Q = 1_000_000_000.0

_EMPTY_PAIRS = {
    "k": pd.Series([], dtype="int64"),
    "q": pd.Series([], dtype="int64"),
}


def _block_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.stack(
        [np.asarray(v, np.float32) for v in batch["embedding"]]
    ).astype(np.float64)


def embedding_mean(embs_ds, dim: int):
    """Exact integer-quantized per-dimension mean: returns (mu, n).
    mu_i = (sum_rows floor(x_i * 1e9 + 0.5) / 1e9) / n — the division
    order is part of the oracle contract."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "i": pd.Series([], dtype="int64"),
                    "sq": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        x = _block_matrix(batch)
        sq = np.floor(x * _Q + 0.5).astype(np.int64).sum(axis=0)
        return pd.DataFrame(
            {
                "i": np.arange(1, dim + 1, dtype=np.int64),
                "sq": sq,
                "n": np.full(dim, len(batch), dtype=np.int64),
            }
        )

    sums = (
        embs_ds.map_batches(partial, batch_format="pandas")
        .groupby("i")
        .aggregate(Sum("sq", alias_name="sq"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    if not len(sums):  # all-empty: Ray drops the columns too
        raise ValueError("empty embeddings dataset")
    sums = sums.sort_values("i")
    n = int(sums["n"].iloc[0])
    mu = (sums["sq"].to_numpy(np.int64).astype(np.float64) / _Q) / n
    return mu, n


def covariance_pairs(embs_ds, dim: int, chunk: int = 256, _mu=None):
    """(vec_id, embedding) -> (i, j, cov_q): un-normalized centered
    covariance sums ``sum_rows floor((x_i - mu_i)(x_j - mu_j) * 1e9 +
    0.5)`` as int64, 1-based dims (matching SQL generate_subscripts).
    Exact at any partitioning."""
    import ray
    from ray.data.aggregate import Sum

    embs_ds = embs_ds.materialize()  # two passes: mean + gram
    mu = _mu if _mu is not None else embedding_mean(embs_ds, dim)[0]
    mu_ref = ray.put(mu)

    def gram_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(_EMPTY_PAIRS)
        m = ray.get(mu_ref)
        c = _block_matrix(batch) - m
        total = np.zeros((dim, dim), np.int64)
        for s in range(0, len(c), chunk):
            blk = c[s : s + chunk]
            # quantize each row's outer product BEFORE summing: int64
            # totals are immune to block layout
            total += (
                np.floor(blk[:, :, None] * blk[:, None, :] * _Q + 0.5)
                .astype(np.int64)
                .sum(axis=0)
            )
        k = np.arange(dim * dim, dtype=np.int64)  # (i-1)*dim + (j-1)
        return pd.DataFrame({"k": k, "q": total.ravel()})

    def unpack(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "i": pd.Series([], dtype="int64"),
                    "j": pd.Series([], dtype="int64"),
                    "cov_q": pd.Series([], dtype="int64"),
                }
            )
        k = batch["k"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "i": k // dim + 1,
                "j": k % dim + 1,
                "cov_q": batch["q"].to_numpy(np.int64),
            }
        )

    return (
        embs_ds.map_batches(gram_partial, batch_format="pandas")
        .groupby("k")
        .aggregate(Sum("q", alias_name="q"))
        .map_batches(unpack, batch_format="pandas")
    )


def pca_components(embs_ds, dim: int, n_components: int):
    """Driver-side eigendecomposition of the exact covariance: returns
    (components [n_components x dim], eigenvalues desc, mu, n).  Sign
    convention: each component's largest-|entry| is positive."""
    embs_ds = embs_ds.materialize()
    mu, n = embedding_mean(embs_ds, dim)
    pairs = covariance_pairs(embs_ds, dim, _mu=mu).to_pandas()
    cov = np.zeros((dim, dim), np.float64)
    cov[
        pairs["i"].to_numpy(np.int64) - 1, pairs["j"].to_numpy(np.int64) - 1
    ] = pairs["cov_q"].to_numpy(np.int64).astype(np.float64) / _Q / n
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comp = evecs[:, order].T.copy()
    lam = evals[order]
    # deterministic sign: the largest-|entry| coordinate is positive
    for r in range(comp.shape[0]):
        j = int(np.argmax(np.abs(comp[r])))
        if comp[r, j] < 0:
            comp[r] = -comp[r]
    return comp, lam, mu, n


def pca_project(embs_ds, dim: int, n_components: int, whiten: bool = False,
                quantize: float = 1e6):
    """Project every vector onto the top principal components (one
    broadcast-components map): (vec_id, proj list<double>, plus
    proj_q list<int64> micro-quantized for stable comparisons)."""
    import ray

    embs_ds = embs_ds.materialize()
    comp, lam, mu, _n = pca_components(embs_ds, dim, n_components)
    scale = 1.0 / np.sqrt(np.maximum(lam, 1e-12)) if whiten else None
    b_ref = ray.put((comp, mu, scale))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "proj": [],
                    "proj_q": [],
                }
            )
        c, m, sc = ray.get(b_ref)
        z = (_block_matrix(batch) - m) @ c.T
        if sc is not None:
            z = z * sc
        q = np.floor(z * quantize + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": batch["vec_id"].to_numpy(np.int64),
                "proj": list(z),
                "proj_q": list(q),
            }
        )

    return embs_ds.map_batches(project, batch_format="pandas")
