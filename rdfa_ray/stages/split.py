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
