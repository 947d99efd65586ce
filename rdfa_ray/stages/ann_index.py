"""Persisted cell-partitioned IVF index — the 100-TB ANN path.

``ivf_topk`` (stages/ann.py) re-derives centroids and re-scans the
embedding table per query batch; that is the right shape for ad-hoc
queries but wrong for a standing corpus.  This module splits the two
phases the way a production pipeline would:

* ``build_ivf_index``: ONE pass — deterministic sampled k-means
  centroids (driver-side, tiny), then every vector is assigned its
  cell in ``map_batches`` and written as ``cell=NN/``-partitioned
  Parquet.  Centroids are written atomically (tmp+rename), so a
  partially-built index is never visible; the build is idempotent.
* ``ivf_search``: reads ONLY the probed cells' partitions
  (``read_parquet`` partition filter → directory pruning at the
  storage layer; scan fraction ≈ n_probe/n_cells), scores each cell
  group against the queries probing it, and merges per-query top-k.

At cluster scale the index build is the only full-data pass; every
search touches a bounded, partition-pruned subset.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _kmeans, _normalize, _stack


def build_ivf_index(embeddings_ds, index_dir: str, n_cells: int = 16, sample_limit: int = 2048):
    """One-shot index build; returns the centroid matrix."""
    sample_df = embeddings_ds.limit(sample_limit).to_pandas()
    sample = np.array(sample_df["embedding"].tolist(), dtype=np.float64)
    cents = _normalize(_kmeans(sample, n_cells))

    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "centroids.tmp.npy")  # np.save appends .npy otherwise
    np.save(tmp, cents)
    os.replace(tmp, os.path.join(index_dir, "centroids.npy"))

    def assign(batch: pa.Table) -> pa.Table:
        ids, embs = _stack(batch)
        if len(ids) == 0:
            return pa.Table.from_pydict(
                {"vec_id": pa.array([], pa.int64()),
                 "cell": pa.array([], pa.int32()),
                 "embedding": batch.column("embedding")}
            )
        cells = (_normalize(embs) @ cents.T).argmax(axis=1).astype(np.int32)
        return pa.Table.from_pydict(
            {"vec_id": pa.array(ids, pa.int64()),
             "cell": pa.array(cells, pa.int32()),
             "embedding": batch.column("embedding")}
        )

    embeddings_ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "vectors"), partition_cols=["cell"]
    )
    return cents


def ivf_search(index_dir: str, queries_df: pd.DataFrame, k: int = 10, n_probe: int = 4):
    """Search the persisted index.  ``queries_df``: (vec_id, embedding).
    Returns a Dataset of (query_id, vec_id, sim) rows, top-k per query."""
    import ray
    import ray.data as rd

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    qdf = queries_df.sort_values("vec_id")
    qmat = _normalize(np.array(qdf["embedding"].tolist(), dtype=np.float64))
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe]
    probed_union = sorted(int(c) for c in np.unique(probe))

    # partition-pruned read: list ONLY the probed cells' hive
    # directories — never-probed partitions are not even opened.  Ray's
    # parquet reader recovers the `cell` column (as a string) from the
    # `cell=N` path segment.
    import glob as _glob

    paths = [
        f
        for c in probed_union
        for f in sorted(
            _glob.glob(os.path.join(index_dir, "vectors", "cell=%d" % c, "*.parquet"))
        )
    ]
    if not paths:
        return rd.from_items([])
    vectors = rd.read_parquet(paths)

    state_ref = ray.put(
        {"ids": qdf["vec_id"].to_numpy(), "mat": qmat, "probe": probe}
    )

    def score_cell(group: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(state_ref)
        cell = int(group["cell"].iloc[0])
        probing = np.flatnonzero((st["probe"] == cell).any(axis=1))
        if len(probing) == 0 or len(group) == 0:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "vec_id": pd.Series(dtype="int64"),
                 "sim": pd.Series(dtype="float64")}
            )
        ids = group["vec_id"].to_numpy()
        m = _normalize(np.array(group["embedding"].tolist(), dtype=np.float64))
        sims = st["mat"][probing] @ m.T
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out = []
        for row, qi in enumerate(probing):
            sel = top[row]
            out.append(pd.DataFrame(
                {"query_id": st["ids"][qi], "vec_id": ids[sel], "sim": sims[row, sel]}
            ))
        return pd.concat(out, ignore_index=True)

    partials = vectors.groupby("cell").map_groups(score_cell, batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
