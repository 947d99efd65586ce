"""Deterministic train/holdout splitting — the standard first step of
a training-data pipeline (held-out eval set carved from the corpus).

Assignment is a pure function of the document CONTENT (md5 of the
text), not of row order, partitioning, or an RNG: the same document
lands in the same split at every scale factor, parallelism level, and
resume — the property that makes the split reproducible across a
256-node rerun and immune to input re-sharding.  Exact duplicates land
in the same split (no train/eval leakage of duplicated text — why
content, not doc_id, is hashed).

Shape at scale: map-only, zero shuffle; the md5 is the same digest the
exact-dedup stage computes, so a fused pipeline pays it once.  The hex
comparison makes the op exactly reproducible in SQL (DuckDB ``md5``),
so the driver's oracle hash-checks it.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

_FRACTION_DENOM = 256  # first two hex chars = one byte


def assign_split(docs_ds, holdout_bytes: int = 64, keep_cols: list | None = None):
    """(doc_id, text, ...) -> (doc_id, *keep_cols, split) with ``split``
    ∈ {'train', 'holdout'}: holdout iff the first byte of md5(text) is
    below ``holdout_bytes`` (64/256 = a 25% holdout).  ``keep_cols``:
    extra columns to pass through unchanged (e.g. lang for a per-split
    language census) — still map-only, zero shuffle."""
    if not 0 < holdout_bytes < _FRACTION_DENOM:
        raise ValueError("holdout_bytes must be in (0, 256)")
    limit = "%02x" % holdout_bytes
    extra = list(keep_cols or [])

    def batch_assign(batch: pa.Table) -> pa.Table:
        splits = [
            "holdout"
            if hashlib.md5((t or "").encode()).hexdigest()[:2] < limit
            else "train"
            for t in batch.column("text").to_pylist()
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                **{c: batch.column(c) for c in extra},
                "split": pa.array(splits, pa.string()),
            }
        )

    return docs_ds.map_batches(batch_assign, batch_format="pyarrow")


def mixture_sample(docs_ds, weights: dict, default: float = 1.0):
    """Deterministic dataset mixing / epoching — the sampling step that
    turns per-source target weights into the training stream: a
    document from source ``s`` with weight ``w`` appears
    ``floor(w) + [md5_frac(text) < frac(w)]`` times (w > 1 duplicates —
    extra epochs of a prized source; w < 1 downsamples).

    Content-hashed like ``assign_split``: the decision is a pure
    function of (text, weight) — reproducible at any parallelism,
    duplicates of a document sample identically (no mixture skew from
    dup groups), and the fractional comparison is a fixed-width hex
    string compare so a SQL oracle reproduces it exactly.  Map-only,
    zero shuffle; row expansion happens inside the batch.

    Returns (doc_id, source, copy_idx) with copy_idx in [0, n)."""
    import pandas as pd

    thresholds = {
        s: (int(w), "%04x" % min(65535, int(round((w - int(w)) * 65536))))
        for s, w in weights.items()
    }
    default_thr = (int(default), "%04x" % min(65535, int(round((default - int(default)) * 65536))))

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "source": pd.Series([], dtype="object"),
                "copy_idx": pd.Series([], dtype="int64"),
            }
        )
        if not len(batch):
            return empty
        counts = []
        for text, src in zip(batch["text"], batch["source"]):
            n_full, thr = thresholds.get(src, default_thr)
            h = hashlib.md5((text or "").encode()).hexdigest()[:4]
            counts.append(n_full + (1 if h < thr else 0))
        counts = pd.Series(counts, dtype="int64")
        keep = counts > 0
        reps = counts[keep]
        out = batch.loc[keep, ["doc_id", "source"]].loc[
            batch.loc[keep].index.repeat(reps)
        ]
        copy_idx = [i for n in reps for i in range(n)]
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(),
                "source": out["source"].to_numpy(),
                "copy_idx": pd.Series(copy_idx, dtype="int64"),
            }
        )

    return docs_ds.map_batches(expand, batch_format="pandas")


def epoch_shuffle(docs_ds, seed: int, key_col: str = "doc_id",
                  keep_cols: list | None = None):
    """Deterministic epoch shuffle: global reorder by
    ``md5(seed || key)`` — the reproducible shuffle a training data
    loader needs per epoch.

    Semantics: a different ``seed`` gives an (effectively) independent
    permutation; the SAME (seed, corpus) gives the SAME order at ANY
    parallelism, partitioning, or resume point — unlike an RNG-based
    shuffle, a crashed epoch resumes mid-stream bit-identically.

    Shape at scale: one map-side hash column + ONE range-sort exchange
    (Ray's distributed sort) — the standard hash-ordered shuffle; no
    driver-side materialization, no RNG state to ship.  Exactly
    reproducible in SQL (``ORDER BY md5(seed || key)``), so the op is
    oracle-checkable end to end."""
    keep = [key_col] + [c for c in (keep_cols or []) if c != key_col]

    def add_key(batch: pa.Table, _seed=str(int(seed))) -> pa.Table:
        keys = [
            hashlib.md5((_seed + "|" + str(k)).encode()).hexdigest()
            for k in batch.column(key_col).to_pylist()
        ]
        return pa.Table.from_pydict(
            {
                **{c: batch.column(c) for c in keep},
                "shuffle_key": pa.array(keys, pa.string()),
            }
        )

    return docs_ds.map_batches(add_key, batch_format="pyarrow").sort(
        "shuffle_key"
    )
