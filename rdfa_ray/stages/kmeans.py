"""Distributed k-means (Lloyd's algorithm) over an embedding column —
corpus clustering for training-data curation (domain balancing,
near-dup triage, IVF coarse quantizers).

Superstep shape (the broadcast-iteration pattern shared with
``pagerank``/``closure``): centroids (k x d floats — kilobytes) are
``ray.put`` ONCE per iteration; every batch computes its assignment
with one numpy matmul and reduces to k partial (sum-vector, count)
pairs, so the per-iteration traffic is k x d floats per BLOCK and the
combine is a tiny driver-side sum — the embedding table itself never
moves, regardless of scale.  This is exactly the aggregation tree a
100-TB run needs; no shuffle appears anywhere.

Determinism: init takes the k vectors with the smallest ids (one
bounded sort-limit), iteration order is fixed, and per-batch partials
are summed after a driver-side sort by block — floating-point
variation across parallelism levels stays below any sane tolerance
(verified by the pytest against a single-process numpy twin).

Empty-cluster rule: a cluster that captures no points keeps its
previous centroid (the standard Lloyd fallback; sklearn re-seeds
instead, which is RNG-dependent — rejected for determinism).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack(batch: pa.Table, id_col: str, vec_col: str):
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
    return ids, vecs


def _local_lloyd(vecs: np.ndarray, k: int, n_iters: int) -> np.ndarray:
    """Driver-side Lloyd's for vector sets that fit in one heap — the
    identical update rule / init / empty-cluster handling as the
    distributed supersteps, without the ~0.5 s-per-iteration Ray
    orchestration (adaptive small-input path)."""
    cents = vecs[:k].astype(np.float64).copy()
    for _ in range(n_iters):
        d2 = (vecs * vecs).sum(axis=1)[:, None] - 2.0 * (vecs @ cents.T)
        assign = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(k):
            m = assign == c
            if m.any():
                new[c] = vecs[m].mean(axis=0)
        if np.allclose(new, cents, rtol=0.0, atol=1e-12):
            return new
        cents = new
    return cents


def kmeans_fit(
    embeddings_ds,
    k: int,
    n_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    local_limit: int = 200_000,
):
    """Fit k-means; returns the (k, d) centroid ndarray.

    ``embeddings_ds`` is materialized once (each iteration re-reads the
    shared object-store blocks zero-copy).  Vector sets at or below
    ``local_limit`` rows run one driver-side fit instead of distributed
    supersteps."""
    import ray

    ds = embeddings_ds.materialize()
    if ds.count() <= local_limit:
        df = ds.to_pandas().sort_values(id_col)
        vecs = np.asarray(df[vec_col].tolist(), dtype=np.float64)
        if len(vecs) < k:
            raise ValueError(
                "k=%d exceeds the %d input vectors" % (k, len(vecs))
            )
        return _local_lloyd(vecs, k, n_iters)
    seed_rows = ds.sort(id_col).limit(k).take_all()
    cents = np.asarray(
        [r[vec_col] for r in seed_rows], dtype=np.float64
    )
    if len(cents) < k:
        raise ValueError("k=%d exceeds the %d input vectors" % (k, len(cents)))
    d = cents.shape[1]

    for _ in range(n_iters):
        cref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            _ids, vecs = _stack(batch, id_col, vec_col)
            if not len(vecs):
                return pa.Table.from_pydict(
                    {
                        "cluster": pa.array([], pa.int32()),
                        "n": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                    }
                )
            # squared euclidean via the expanded form: one matmul
            d2 = (vecs * vecs).sum(axis=1)[:, None] - 2.0 * (vecs @ c.T)
            assign = d2.argmin(axis=1)
            uniq = np.unique(assign)
            sums = np.zeros((len(uniq), c.shape[1]))
            counts = np.zeros(len(uniq), dtype=np.int64)
            for j, cl in enumerate(uniq):
                m = assign == cl
                sums[j] = vecs[m].sum(axis=0)
                counts[j] = int(m.sum())
            return pa.Table.from_pydict(
                {
                    "cluster": pa.array(uniq.astype("int32")),
                    "n": pa.array(counts),
                    "vsum": pa.array([row.tolist() for row in sums]),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        new = cents.copy()  # empty clusters keep their centroid
        if len(parts):
            parts = parts.sort_values("cluster", kind="mergesort")
            for cl, grp in parts.groupby("cluster", sort=True):
                n = int(grp["n"].sum())
                if n:
                    vs = np.asarray(grp["vsum"].tolist(), dtype=np.float64)
                    new[int(cl)] = vs.sum(axis=0) / n
        if np.allclose(new, cents, rtol=0.0, atol=1e-12):
            cents = new
            break
        cents = new
    return cents


def kmeans_assign(
    embeddings_ds,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Assign every vector to its nearest centroid: (id, cluster)."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, vecs = _stack(batch, id_col, vec_col)
        if not len(vecs):
            return pa.Table.from_pydict(
                {id_col: pa.array([], pa.int64()),
                 "cluster": pa.array([], pa.int32())}
            )
        d2 = (vecs * vecs).sum(axis=1)[:, None] - 2.0 * (vecs @ c.T)
        return pa.Table.from_pydict(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(d2.argmin(axis=1).astype("int32")),
            }
        )

    return embeddings_ds.map_batches(assign, batch_format="pyarrow")


def kmeans_cluster_sizes(embeddings_ds, k: int, n_iters: int = 10):
    """Fit + assign + per-cluster count — the bounded summary a driver
    check can hash (assignments themselves are checked by pytest)."""
    from ray.data.aggregate import Count

    cents = kmeans_fit(embeddings_ds, k, n_iters)
    assigns = kmeans_assign(embeddings_ds, cents)
    return assigns.groupby("cluster").aggregate(Count(alias_name="n_vectors"))
