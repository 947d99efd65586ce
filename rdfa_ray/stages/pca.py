"""Distributed PCA over an embedding column — the preprocessing step
embedding-dedup / retrieval pipelines run before clustering (decorrelate
and reduce d-dim vectors, whiten for cosine work).

Distribution shape (the 100-TB plan):

* pass 1 (mean): per-block per-dimension sums of integer-quantized
  coordinates — ONE row per block (a d-long int64 list), no shuffle.
* pass 2 (covariance): per-block partial Gram of the mean-centered
  rows, with every per-(row, i, j) product quantized to integer
  nano-units BEFORE summation — int64 totals are exact under any block
  layout, so the covariance (and everything derived from it:
  eigenvectors, projections) is bit-identical at any parallelism or
  resume point.  Each block contributes ONE fixed-size row (d*d int64,
  32 KB for d=64), never proportional to the corpus.
* the partials are tree-combined: a coalescing ``map_batches``
  (``batch_size=_FANIN``) sums every _FANIN block-partials into one,
  so the driver finalize reads n_blocks/_FANIN tiny rows — at 800k
  input blocks that is ~3k rows.  int64 addition commutes exactly, so
  the combine order cannot change a single bit.  NO groupby/sort
  shuffle anywhere: a grouped exchange with ~1 group per row is the
  worst case for a sort-based aggregate (measured 27 s vs 0.3 s on the
  same 262k rows), and a fixed-size total never needs one.
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
_FANIN = 256  # block-partials combined per tree-reduce row


def _block_matrix(batch: pd.DataFrame) -> np.ndarray:
    return np.stack(
        [np.asarray(v, np.float32) for v in batch["embedding"]]
    ).astype(np.float64)


def _combine_partials(batch: pd.DataFrame) -> pd.DataFrame:
    """Sum <=_FANIN one-row-per-block partials into one row: int64
    list columns add element-wise, scalar int64 columns add."""
    if not len(batch):
        return batch
    out = {}
    for c in batch.columns:
        col = batch[c]
        first = col.iloc[0]
        if isinstance(first, (list, np.ndarray)):
            out[c] = [
                np.sum(
                    np.stack([np.asarray(v, np.int64) for v in col]), axis=0
                )
            ]
        else:
            out[c] = np.array([col.to_numpy(np.int64).sum()], dtype=np.int64)
    return pd.DataFrame(out)


def _tree_sum(parts_ds) -> pd.DataFrame:
    """One combine level (fan-in _FANIN) then a driver-side final sum
    of the surviving rows — returns the single-row total as a dict of
    numpy values."""
    df = parts_ds.map_batches(
        _combine_partials, batch_format="pandas", batch_size=_FANIN
    ).to_pandas()
    if not len(df):
        return {}
    combined = _combine_partials(df)
    return {c: combined[c].iloc[0] for c in combined.columns}


def embedding_mean(embs_ds, dim: int):
    """Exact integer-quantized per-dimension mean: returns (mu, n).
    mu_i = (sum_rows floor(x_i * 1e9 + 0.5) / 1e9) / n — the division
    order is part of the oracle contract."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {"sq": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        x = _block_matrix(batch)
        sq = np.floor(x * _Q + 0.5).astype(np.int64).sum(axis=0)
        return pd.DataFrame(
            {"sq": [sq], "n": np.array([len(batch)], dtype=np.int64)}
        )

    total = _tree_sum(embs_ds.map_batches(partial, batch_format="pandas"))
    if not total:
        raise ValueError("empty embeddings dataset")
    n = int(total["n"])
    sq = np.asarray(total["sq"], np.int64)
    if len(sq) != dim:
        raise ValueError("embedding dim mismatch: %d != %d" % (len(sq), dim))
    mu = (sq.astype(np.float64) / _Q) / n
    return mu, n


def covariance_pairs(embs_ds, dim: int, chunk: int = 256, _mu=None):
    """(vec_id, embedding) -> (i, j, cov_q): un-normalized centered
    covariance sums ``sum_rows floor((x_i - mu_i)(x_j - mu_j) * 1e9 +
    0.5)`` as int64, 1-based dims (matching SQL generate_subscripts).
    Exact at any partitioning."""
    import ray
    import ray.data as rd

    if _mu is None:
        embs_ds = embs_ds.materialize()  # two passes: mean + gram
        mu = embedding_mean(embs_ds, dim)[0]
    else:
        mu = _mu
    mu_ref = ray.put(mu)

    def gram_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"gq": pd.Series([], dtype=object)})
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
        return pd.DataFrame({"gq": [total.ravel()]})

    total = _tree_sum(
        embs_ds.map_batches(gram_partial, batch_format="pandas")
    )
    gq = (
        np.asarray(total["gq"], np.int64)
        if total
        else np.zeros(dim * dim, np.int64)
    )
    k = np.arange(dim * dim, dtype=np.int64)
    return rd.from_pandas(
        pd.DataFrame({"i": k // dim + 1, "j": k % dim + 1, "cov_q": gq})
    )


def _cov_from_pairs(pairs: pd.DataFrame, dim: int, n: int) -> np.ndarray:
    cov = np.zeros((dim, dim), np.float64)
    cov[
        pairs["i"].to_numpy(np.int64) - 1, pairs["j"].to_numpy(np.int64) - 1
    ] = pairs["cov_q"].to_numpy(np.int64).astype(np.float64) / _Q / n
    return cov


def _eig_components(cov: np.ndarray, n_components: int):
    """Top-n_components eigenpairs of the symmetric covariance, sign
    fixed by the largest-|entry|-positive convention."""
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comp = evecs[:, order].T.copy()
    lam = evals[order]
    for r in range(comp.shape[0]):
        j = int(np.argmax(np.abs(comp[r])))
        if comp[r, j] < 0:
            comp[r] = -comp[r]
    return comp, lam


def pca_components(embs_ds, dim: int, n_components: int):
    """Driver-side eigendecomposition of the exact covariance: returns
    (components [n_components x dim], eigenvalues desc, mu, n).  Sign
    convention: each component's largest-|entry| is positive."""
    embs_ds = embs_ds.materialize()
    mu, n = embedding_mean(embs_ds, dim)
    pairs = covariance_pairs(embs_ds, dim, _mu=mu).to_pandas()
    comp, lam = _eig_components(_cov_from_pairs(pairs, dim, n), n_components)
    return comp, lam, mu, n


def pca_project(embs_ds, dim: int, n_components: int, whiten: bool = False,
                quantize: float = 1e6, _components=None):
    """Project every vector onto the top principal components (one
    broadcast-components map): (vec_id, proj list<double>, plus
    proj_q list<int64> micro-quantized for stable comparisons).
    ``_components``: optional precomputed (comp, lam, mu) — a caller
    that already ran the mean/gram passes (``pca_checked``) passes
    them in so the dominant O(n·d²) covariance pass is not repeated."""
    import ray

    embs_ds = embs_ds.materialize()
    if _components is None:
        comp, lam, mu, _n = pca_components(embs_ds, dim, n_components)
    else:
        comp, lam, mu = _components
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


def pca_checked(embs_ds, dim: int, n_components: int):
    """One driver-checkable invariant row for the PCA projection (the
    sketch-family oracle pattern): ``n_rows`` and ``trace_q`` (the sum
    of the quantized covariance diagonal) are EXACT SQL twins of the
    engine's integer-quantized arithmetic, and three flags assert the
    algebra end to end:

    * ``orthonormal_ok`` — components are orthonormal (|CCᵀ−I|∞≤1e-9),
    * ``var_monotone_ok`` — eigenvalues are non-increasing,
    * ``proj_var_ok`` — the VARIANCE OF THE ACTUAL PROJECTIONS matches
      its eigenvalue per component (Σ zᵣ²/n ≈ λᵣ), computed as one
      distributed partial-sum pass over ``pca_project``'s output — a
      corrupted projection map breaks this even if the eigensolve is
      fine.

    Projected values themselves stay pytest-pinned (numpy twin,
    partition invariance)."""
    import ray.data as rd

    embs_ds = embs_ds.materialize()
    mu, n = embedding_mean(embs_ds, dim)
    pairs = covariance_pairs(embs_ds, dim, _mu=mu).to_pandas()
    trace_q = int(
        pairs.loc[pairs["i"] == pairs["j"], "cov_q"].to_numpy(np.int64).sum()
    )
    cov = _cov_from_pairs(pairs, dim, n)
    comp, lam = _eig_components(cov, n_components)
    orthonormal_ok = bool(
        np.abs(comp @ comp.T - np.eye(n_components)).max() <= 1e-9
    )
    var_monotone_ok = bool(np.all(np.diff(lam) <= 1e-12))

    proj = pca_project(embs_ds, dim, n_components,
                       _components=(comp, lam, mu))

    def sq_partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"zsq": pd.Series([], dtype=object)})
        z = np.stack([np.asarray(v, np.float64) for v in batch["proj"]])
        return pd.DataFrame(
            {"zsq": [np.floor(z * z * _Q + 0.5).astype(np.int64).sum(axis=0)]}
        )

    total = _tree_sum(proj.map_batches(sq_partial, batch_format="pandas"))
    zsq = (
        np.asarray(total["zsq"], np.int64).astype(np.float64) / _Q / n
        if total
        else np.zeros(n_components)
    )
    tol = 1e-6 * max(float(lam[0]) if len(lam) else 1.0, 1.0)
    proj_var_ok = bool(np.abs(zsq - lam).max() <= tol)

    out = pd.DataFrame(
        {
            "n_rows": np.array([n], dtype=np.int64),
            "trace_q": np.array([trace_q], dtype=np.int64),
            "orthonormal_ok": [orthonormal_ok],
            "var_monotone_ok": [var_monotone_ok],
            "proj_var_ok": [proj_var_ok],
        }
    )
    return rd.from_pandas(out)
