"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — the exact baseline: per-batch numpy matmul
  against a broadcast query matrix, batch-local top-k partials, then a
  tiny groupby merge.  The broadcast matrix is ``ray.put`` once.
* ``ivf_topk`` — the scale path: k-means-ish coarse quantizer (sampled,
  driver-side, deterministic), assign batches to cells, search only the
  ``n_probe`` nearest cells per query.
* ``cosine_dup_pairs`` — near-duplicate detection by sign-LSH buckets
  + in-bucket exact cosine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
    embs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, embs


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceScorer:
    """Actor: scores each batch against the broadcast query matrix and
    emits batch-local top-k candidate rows."""

    def __init__(self, query_ref, k: int):
        import ray

        q = ray.get(query_ref)  # fetched once per actor
        self.qids = q["ids"]
        self.qmat = _normalize(q["mat"])
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, embs = _stack(batch)
        if len(ids) == 0:
            return pa.Table.from_pydict(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        sims = self.qmat @ _normalize(embs).T  # (n_query, n_batch)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            for ci in top[qi]:
                out_q.append(self.qids[qi])
                out_v.append(ids[ci])
                out_s.append(sims[qi, ci])
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )


def brute_force_topk(embeddings_ds, query_ids: list[int], k: int = 10, concurrency=(2, 8)):
    """Exact cosine top-k for the given query vec_ids."""
    import pyarrow.compute as pc
    import ray

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("vec_id"), value_set=pa.array(query_ids))
        )

    qdf = embeddings_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    qdf = qdf.sort_values("vec_id")
    query_ref = ray.put(
        {
            "ids": qdf["vec_id"].to_numpy(),
            "mat": np.array(qdf["embedding"].tolist(), dtype=np.float64),
        }
    )

    partials = embeddings_ds.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF (coarse-quantized) variant — the 100 TB path: centroids from a
# deterministic sample, each vector searched only within its cell.


def _kmeans(sample: np.ndarray, n_cells: int, iters: int = 10) -> np.ndarray:
    # deterministic init: evenly spaced sample rows
    idx = np.linspace(0, len(sample) - 1, n_cells).astype(int)
    cents = sample[idx].copy()
    for _ in range(iters):
        d = _normalize(sample) @ _normalize(cents).T
        assign = d.argmax(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_topk(
    embeddings_ds,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    concurrency=(2, 8),
):
    """Approximate top-k: scores only vectors whose cell is among the
    query's n_probe nearest cells."""
    import pyarrow.compute as pc
    import ray

    sample_df = embeddings_ds.limit(2048).to_pandas()
    sample = np.array(sample_df["embedding"].tolist(), dtype=np.float64)
    cents = _normalize(_kmeans(sample, n_cells))

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column("vec_id"), value_set=pa.array(query_ids))
        )

    qdf = embeddings_ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    qdf = qdf.sort_values("vec_id")
    qmat = _normalize(np.array(qdf["embedding"].tolist(), dtype=np.float64))
    probe_cells = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe]
    probed_union = np.unique(probe_cells)
    state_ref = ray.put(
        {
            "ids": qdf["vec_id"].to_numpy(),
            "mat": qmat,
            "cents": cents,
            "probe": probe_cells,
        }
    )

    # cell-partitioned plan (the 100-TB path): assign each vector its
    # cell ONCE in map_batches, drop vectors in never-probed cells at
    # the map side (scan fraction ~ n_probe/n_cells), then ONE shuffle
    # by cell so each per-cell task scores only the queries probing it.
    # Round-1 instead re-scanned and re-filtered every batch for every
    # query.
    def assign_cells(batch: pa.Table) -> pa.Table:
        ids, embs = _stack(batch)
        if len(ids) == 0:
            return pa.Table.from_pydict(
                {"vec_id": pa.array([], pa.int64()),
                 "cell": pa.array([], pa.int32()),
                 "embedding": batch.column("embedding")}
            )
        cells = (_normalize(embs) @ cents.T).argmax(axis=1).astype(np.int32)
        keep = np.isin(cells, probed_union)
        idx = np.flatnonzero(keep)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[idx], pa.int64()),
                "cell": pa.array(cells[idx], pa.int32()),
                "embedding": batch.column("embedding").take(pa.array(idx, pa.int64())),
            }
        )

    celled = embeddings_ds.map_batches(assign_cells, batch_format="pyarrow")

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
        sims = st["mat"][probing] @ m.T  # (n_probing, n_members)
        kk = min(k, sims.shape[1])
        out = []
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        for row, qi in enumerate(probing):
            sel = top[row]
            out.append(pd.DataFrame(
                {"query_id": st["ids"][qi], "vec_id": ids[sel], "sim": sims[row, sel]}
            ))
        return pd.concat(out, ignore_index=True)

    partials = celled.groupby("cell").map_groups(score_cell, batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding near-duplicate pairs via sign-LSH


def cosine_dup_pairs(embeddings_ds, threshold: float = 0.95, n_planes: int = 16, seed: int = 11):
    """Pairs with cosine >= threshold: bucket by sign-LSH of random
    hyperplanes (broadcast), exact cosine within buckets.  Multi-table
    (2 rotations) to keep recall high at this threshold."""
    rs = np.random.RandomState(seed)
    planes = [None, None]

    def make_bucketer(table_id: int):
        def bucketer(batch: pa.Table) -> pa.Table:
            ids, embs = _stack(batch)
            if planes[table_id] is None:
                dim = embs.shape[1] if len(ids) else 8
                local = np.random.RandomState(seed + table_id).randn(dim, n_planes)
                planes[table_id] = local
            signs = (_normalize(embs) @ planes[table_id]) > 0 if len(ids) else np.zeros((0, n_planes))
            keys = [
                int("".join("1" if b else "0" for b in row), 2) for row in signs
            ]
            return pa.Table.from_pydict(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "bucket": pa.array(keys, pa.int64()),
                    "embedding": batch.column("embedding"),
                }
            )

        return bucketer

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "sim": pd.Series(dtype="float64"),
             "pair_mode": pd.Series(dtype="string")}
        )

    def bucket_pairs(g: pd.DataFrame, cap: int = 100) -> pd.DataFrame:
        """Pairs within ONE sign-LSH bucket (>=2 members)."""
        ids = g["vec_id"].to_numpy()
        m = _normalize(np.array(g["embedding"].tolist(), dtype=np.float64))
        if len(ids) <= cap:
            mode = "full"
            sims = m @ m.T
            ii, jj = np.triu_indices(len(ids), k=1)
            hit = sims[ii, jj] >= threshold
            a_out = ids[ii[hit]].tolist()
            b_out = ids[jj[hit]].tolist()
            s_out = sims[ii[hit], jj[hit]].tolist()
        else:
            # degenerate bucket: star-compare against the min vec_id
            # (O(n), keeps every member connected to the group's keeper
            # instead of silently truncating at `cap`)
            mode = "star"
            sims = m[1:] @ m[0]
            hit = sims >= threshold
            a_out = [int(ids[0])] * int(hit.sum())
            b_out = ids[1:][hit].tolist()
            s_out = sims[hit].tolist()
        return pd.DataFrame(
            {"a": a_out, "b": b_out, "sim": s_out,
             "pair_mode": pd.Series([mode] * len(a_out), dtype="object")}
        )

    def pairs_block(group: pd.DataFrame) -> pd.DataFrame:
        # one coarse group holds many LSH buckets; drop singletons
        # vectorized, loop only over buckets that actually collide
        g = group.drop_duplicates(["bucket", "vec_id"]).sort_values(["bucket", "vec_id"])
        sizes = g.groupby("bucket")["vec_id"].transform("size")
        g = g[sizes >= 2]
        if len(g) == 0:
            return _empty()
        outs = [bucket_pairs(sub) for _, sub in g.groupby("bucket", sort=False)]
        return pd.concat(outs, ignore_index=True)

    results = []
    for t in range(2):
        bucketed = embeddings_ds.map_batches(make_bucketer(t), batch_format="pyarrow")

        def add_coarse(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            coarse = pc.cast(
                pc.bit_wise_and(batch.column("bucket"), 63), pa.int32()
            )
            return batch.append_column("__g", coarse)

        results.append(
            bucketed.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("__g")
            .map_groups(pairs_block, batch_format="pandas")
        )

    from .distinct import distinct

    merged = results[0].union(results[1])
    return distinct(merged, ["a", "b"], extra=["sim", "pair_mode"])
