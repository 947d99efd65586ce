"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — the exact baseline: per-batch numpy matmul
  against a broadcast query matrix, batch-local top-k partials, then a
  coalesced vectorized merge.  The broadcast matrix is ``ray.put`` once.
* ``ivf_topk`` — the scale path: k-means-ish coarse quantizer (sampled,
  driver-side, deterministic); vectors in never-probed cells are
  dropped at the map side (scan fraction ~ n_probe/n_cells) and the
  survivors are scored IN PLACE against a per-query probe mask — the
  embedding payloads are never shuffled.  (Round 2 shuffled the kept
  vectors by cell to score each cell only against its probing queries;
  that saves matmul FLOPs but moves every surviving embedding through
  an all-to-all — at 100 TB the shuffle dwarfs the vectorized matmul,
  and the sort-based ``map_groups`` emitted schema-less empty blocks.)
* ``cosine_dup_pairs`` — near-duplicate detection by sign-LSH buckets
  + in-bucket exact cosine.

No stage in this module shuffles embedding payloads; the only
all-to-all anywhere is the LSH-bucket groupby in ``cosine_dup_pairs``
(hash rows, not vectors, dominate that exchange's input).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TOPK_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("vec_id", pa.int64()),
        ("sim", pa.float64()),
    ]
)


def _empty_topk() -> pa.Table:
    return pa.Table.from_pydict(
        {name: [] for name in TOPK_SCHEMA.names}, schema=TOPK_SCHEMA
    )


def _stack(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
    embs = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, embs


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _topk_rows(qids: np.ndarray, ids: np.ndarray, sims: np.ndarray, k: int) -> pa.Table:
    """Batch-local top-k per query from a (n_query, n_batch) sim matrix
    — fully vectorized (np.repeat/ravel, no per-row Python).  Rows with
    sim == -inf (masked-out candidates) are dropped."""
    if sims.shape[1] == 0:
        return _empty_topk()
    k = min(k, sims.shape[1])
    top = np.argpartition(-sims, k - 1, axis=1)[:, :k]  # (n_query, k)
    rows = np.repeat(np.arange(sims.shape[0]), k)
    cols = top.ravel()
    vals = sims[rows, cols]
    keep = np.isfinite(vals)
    return pa.Table.from_pydict(
        {
            "query_id": pa.array(qids[rows[keep]], pa.int64()),
            "vec_id": pa.array(ids[cols[keep]], pa.int64()),
            "sim": pa.array(vals[keep], pa.float64()),
        },
        schema=TOPK_SCHEMA,
    )


def merge_topk(partials_ds, k: int):
    """Final per-query top-k merge WITHOUT a shuffle: the partials are
    already bounded (<= k rows per (block, query)), so the merge input
    is tiny relative to the corpus — coalesce into one block and run a
    single vectorized grouped head-k.  (A groupby here would sort-range
    partition a tiny table into mostly-empty blocks; Ray forwards
    empty map_groups outputs as schema-less bundles.)  For query sets
    too large for one task, raise the partial bound instead: the merge
    input scales as n_blocks x n_queries x k, independent of corpus
    bytes."""

    def grouped_head(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pa.Table.from_pydict(
                {n: [] for n in TOPK_SCHEMA.names}, schema=TOPK_SCHEMA
            ).to_pandas()
        return (
            batch.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
            .groupby("query_id", sort=False)
            .head(k)
            .reset_index(drop=True)
        )

    return partials_ds.repartition(1).map_batches(
        grouped_head, batch_format="pandas", batch_size=None
    )


class BruteForceScorer:
    """Scores each batch against the broadcast query matrix and emits
    batch-local top-k candidate rows.  Usable as an actor class or via
    ``score_batch_brute`` as a cached elastic task."""

    def __init__(self, query_ref=None, k: int = 10, state: dict | None = None):
        if state is None:
            import ray

            state = ray.get(query_ref)  # fetched once per actor/worker
        self.qids = state["ids"]
        self.qmat = _normalize(state["mat"])
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, embs = _stack(batch)
        if len(ids) == 0:
            return _empty_topk()
        sims = self.qmat @ _normalize(embs).T  # (n_query, n_batch)
        return _topk_rows(self.qids, ids, sims, self.k)


_SCORER_CACHE: dict = {}


def _cached_scorer(cls, ref, **kwargs):
    from ..state.broadcast import bcast_cached

    key = (cls.__name__, ref.hex() if hasattr(ref, "hex") else id(ref), repr(sorted(kwargs.items())))
    scorer = _SCORER_CACHE.get(key)
    if scorer is None:
        scorer = cls(state=bcast_cached(ref), **kwargs)
        _SCORER_CACHE.clear()
        _SCORER_CACHE[key] = scorer
    return scorer


def score_batch_brute(batch: pa.Table, query_ref=None, k: int = 10) -> pa.Table:
    return _cached_scorer(BruteForceScorer, query_ref, k=k)(batch)


def brute_force_topk(embeddings_ds, query_ids: list[int], k: int = 10):
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
        score_batch_brute,
        fn_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    return merge_topk(partials, k)


# ---------------------------------------------------------------------------
# IVF (coarse-quantized) variant — the 100 TB path: centroids from a
# deterministic sample, never-probed cells dropped map-side, survivors
# scored in place against each query's probe mask.


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


class MaskedIVFScorer:
    """Scores a batch's (already cell-filtered) vectors against the
    broadcast queries, masking out candidates whose cell is not probed
    by the query — IVF semantics with zero embedding shuffle.

    ``state``: {ids, mat (normalized), probe (n_query, n_probe), n_cells}.
    """

    def __init__(self, state_ref=None, k: int = 10, state: dict | None = None):
        if state is None:
            import ray

            state = ray.get(state_ref)
        self.qids = state["ids"]
        self.qmat = state["mat"]
        self.k = k
        probe = state["probe"]
        n_cells = int(state["n_cells"])
        self.probe_mask = np.zeros((len(self.qids), n_cells), dtype=bool)
        rows = np.repeat(np.arange(probe.shape[0]), probe.shape[1])
        self.probe_mask[rows, probe.ravel()] = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, embs = _stack(batch)
        if len(ids) == 0:
            return _empty_topk()
        cells = np.asarray(batch.column("cell").to_pylist(), dtype=np.int64)
        sims = self.qmat @ _normalize(embs).T  # (n_query, n_batch)
        allowed = self.probe_mask[:, cells]  # (n_query, n_batch)
        sims = np.where(allowed, sims, -np.inf)
        return _topk_rows(self.qids, ids, sims, self.k)


def score_batch_ivf(batch: pa.Table, state_ref=None, k: int = 10) -> pa.Table:
    return _cached_scorer(MaskedIVFScorer, state_ref, k=k)(batch)


def ivf_topk(
    embeddings_ds,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
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
            "probe": probe_cells,
            "n_cells": n_cells,
        }
    )

    # map-side cell assignment + never-probed drop (scan fraction
    # ~ n_probe/n_cells); the kept vectors are scored IN PLACE by the
    # masked scorer — embeddings never shuffle
    def assign_cells(batch: pa.Table) -> pa.Table:
        ids, embs = _stack(batch)
        if len(ids) == 0:
            return pa.Table.from_pydict(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int32()),
                    "embedding": batch.column("embedding"),
                }
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

    partials = embeddings_ds.map_batches(
        assign_cells, batch_format="pyarrow"
    ).map_batches(
        score_batch_ivf,
        fn_kwargs={"state_ref": state_ref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4096,
    )
    return merge_topk(partials, k)


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
