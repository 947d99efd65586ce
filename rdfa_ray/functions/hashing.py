"""Vectorized hash/bucket kernels for shuffle-key derivation.

Every all-to-all in the engine (flagship partitioning, canonicalize
buckets, the bucketed hash join, distincts) keys on
``crc32(key) % B``.  Computing that with a per-row Python list-comp
sat directly upstream of the only shuffle (round-1 finding); these
kernels compute crc32 only over the batch's *unique* values
(``dictionary_encode``) and broadcast via a numpy ``take`` — identical
assignment (crc32 is unchanged), a fraction of the Python-level work
(conv_id repeats ~20x per batch, graph IRIs ~3-5x).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def crc32_bucket(col, n_buckets: int) -> pa.Array:
    """``crc32(str(x)) % n_buckets`` per row, int32.

    Bit-identical to ``[zlib.crc32(str(x).encode()) % B for x in col]``
    (the round-1 per-row implementation) — manifest shas and partition
    assignment are unchanged.
    """
    arr = _as_array(col)
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = pc.cast(arr, pa.string())
    arr = pc.fill_null(arr, "")
    enc = pc.dictionary_encode(arr)
    uniques = enc.dictionary.to_pylist()
    lut = np.fromiter(
        (zlib.crc32(u.encode()) % n_buckets for u in uniques),
        dtype=np.int32,
        count=len(uniques),
    )
    idx = enc.indices.to_numpy(zero_copy_only=False)
    if len(lut) == 0:
        return pa.array(np.zeros(0, dtype=np.int32))
    return pa.array(lut[idx])


def crc32_bucket_concat(table: pa.Table, cols: list[str], n_buckets: int, sep: str = "\x1f") -> pa.Array:
    """Bucket on the concatenation of several key columns (for
    multi-column distincts).  Null-safe: nulls render as ''."""
    parts = []
    for c in cols:
        a = _as_array(table.column(c))
        if not pa.types.is_large_string(a.type):
            a = pc.cast(a, pa.large_string())
        parts.append(pc.fill_null(a, ""))
    joined = pc.binary_join_element_wise(*parts, pa.scalar(sep, pa.large_string()))
    return crc32_bucket(joined, n_buckets)
