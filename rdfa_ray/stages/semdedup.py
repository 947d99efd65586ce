"""SemDeDup — semantic deduplication via within-cluster embedding
similarity (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540).

The web-scale trick: instead of an all-pairs cosine sweep (quadratic,
one giant exchange), k-means partitions the embedding space first and
semantic duplicates are only searched WITHIN a cluster — the paper's
observation is that pairs above a high cosine threshold co-cluster
almost always, so the quadratic work shrinks to ~(n/k)^2 per cluster.
Pairs split across cluster boundaries are missed by design (the
paper's documented recall tradeoff; raising k trades recall for
speed).

Ray Data shape — ONE exchange end-to-end:

1. ``kmeans_fit`` (stages/kmeans.py) learns centroids; the (k, d)
   float matrix is kilobytes and rides to every task via ``ray.put``.
2. One ``map_batches`` pass assigns each vector its nearest centroid
   and its cosine similarity TO that centroid, map-side.
3. ``groupby(cluster).map_groups`` — the single all-to-all — runs the
   paper's kernel per cluster, fully vectorized: L2-normalize, order
   by (centroid_sim ASC, vec_id ASC), pairwise dot matrix, and drop
   any row whose similarity to an EARLIER row exceeds ``eps``.
   Ordering ascending by centroid similarity implements the paper's
   "keep the example with the LOWEST similarity to the centroid"
   rule (edge-of-cluster examples are the informative ones);
   the vec_id tiebreak makes the survivor set deterministic at any
   parallelism.
4. Clusters larger than ``cap`` rows split into contiguous chunks of
   the sorted order before the pairwise matrix (memory stays
   O(cap^2) per task; cross-chunk pairs are missed — same observable
   tradeoff as the LSH star fallback in stages/dedup.py, and the
   emitted ``chunked`` flag makes it visible rather than silent).

The reference has no embedding operators; this is part of the
LLM-training-data family mandated alongside SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kmeans import _stack, kmeans_fit

_OUT_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("cluster", pa.int32()),
        ("keep", pa.bool_()),
        ("chunked", pa.bool_()),
    ]
)


def _empty_out() -> pa.Table:
    return _OUT_SCHEMA.empty_table()


def semdedup(
    embeddings_ds,
    k: int = 8,
    eps: float = 0.95,
    n_iters: int = 10,
    cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Per-vector keep/drop decisions: ``(vec_id, cluster, keep,
    chunked)``.  ``eps`` is the cosine threshold above which two
    same-cluster vectors are semantic duplicates; exactly one of each
    duplicate group survives (the one farthest from its centroid,
    smallest id on ties)."""
    import ray

    centroids = kmeans_fit(
        embeddings_ds, k=k, n_iters=n_iters, id_col=id_col, vec_col=vec_col
    )
    cnorm = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    cref = ray.put(np.ascontiguousarray(cnorm))

    def assign(batch: pa.Table) -> pa.Table:
        ids, vecs = _stack(batch, id_col, vec_col)
        if not len(ids):
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int32()),
                    "csim": pa.array([], pa.float64()),
                    "embedding": batch.column(vec_col),
                }
            )
        cn = ray.get(cref)
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        xn = vecs / norms
        cluster = np.argmax(xn @ cn.T, axis=1)  # (n, k) cosine argmax
        # csim via a PER-ROW reduction, not the matmul: BLAS blocking
        # makes matmul results batch-shape-dependent in the last ulp,
        # which would break the deterministic (csim, id) keep order for
        # identical vectors landing in different batches
        csim = np.einsum("ij,ij->i", xn, cn[cluster])
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
                "cluster": pa.array(cluster.astype(np.int32), pa.int32()),
                "csim": pa.array(csim),
                "embedding": batch.column(vec_col),
            }
        )

    assigned = embeddings_ds.map_batches(assign, batch_format="pyarrow")

    def dedup_cluster(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_out()
        ids, vecs = _stack(group, "vec_id", "embedding")
        csim = group.column("csim").to_numpy(zero_copy_only=False)
        cluster = int(group.column("cluster")[0].as_py())
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        xn = vecs / norms
        # the paper's keep rule: lowest centroid similarity first
        order = np.lexsort((ids, csim))
        keep = np.ones(len(ids), dtype=bool)
        chunked = len(ids) > cap
        for lo in range(0, len(ids), cap):
            sel = order[lo : lo + cap]
            xs = xn[sel]
            sims = xs @ xs.T
            # drop i when an EARLIER (lower-index-in-order) row is a
            # semantic duplicate; tril excludes self and later rows
            dup = (np.tril(sims, k=-1) > eps).any(axis=1)
            keep[sel[dup]] = False
        return pa.table(
            {
                "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
                "cluster": pa.array(
                    np.full(len(ids), cluster, dtype=np.int32), pa.int32()
                ),
                "keep": pa.array(keep),
                "chunked": pa.array(np.full(len(ids), chunked)),
            }
        )

    return assigned.groupby("cluster").map_groups(
        dedup_cluster, batch_format="pyarrow"
    )


def semdedup_summary(embeddings_ds, k: int = 8, eps: float = 0.95, **kw):
    """Per-cluster census of the keep/drop decisions: ``(cluster, n,
    n_kept)`` — the driver-facing result shape (tiny: k rows)."""
    import pyarrow.compute as pc

    decisions = semdedup(embeddings_ds, k=k, eps=eps, **kw)

    def census(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cluster": batch.column("cluster"),
                "n": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
                "n_kept": pc.cast(
                    pc.cast(batch.column("keep"), pa.int8()), pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum

    return (
        decisions.map_batches(census, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n"), Sum("n_kept", alias_name="n_kept"))
    )
