"""Bloom-prefiltered semi join — the classic big-data join
optimization: build a compact bit-set summary of the build side's
keys, broadcast it, and drop probe-side rows map-side BEFORE the
shuffle, then run the exact semi join on the survivors.

Exactness: a Bloom filter has false POSITIVES only, and the survivors
still pass through the exact ``bucketed_hash_join(how='semi')`` — the
result is provably identical to the unfiltered semi join; the filter
only reduces how many rows reach the exchange.  With an x% match rate
the shuffle shrinks ~(1-x)-fold, and the bit-set costs m/8 bytes
regardless of data size (the per-block partial is a fixed-size bitset,
OR-merged — a mergeable summary like the engine's KMV/Misra-Gries
sketches).

False-positive rate ~ (1 - e^(-kn/m))^k; the default m=2^23 bits
(1 MiB) and k=4 keeps FPR < 1% up to ~1M build keys.  Size ``m_bits``
to the build side's distinct-key estimate (the KMV sketch provides
exactly that number at scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .join import bucketed_hash_join

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return x ^ (x >> np.uint64(31))


def _hash2_u64(values) -> tuple:
    """Two independent vectorized 64-bit hashes per value (double
    hashing: probe i uses h1 + i*h2)."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        u = arr.astype(np.uint64)
        with np.errstate(over="ignore"):
            h1 = _splitmix64(u)
            h2 = _splitmix64(u ^ np.uint64(0xA5A5A5A5A5A5A5A5))
    else:
        import polars as pl

        s = pl.Series([str(v) for v in values])
        h1 = s.hash(seed=7).to_numpy().astype(np.uint64)
        h2 = s.hash(seed=13).to_numpy().astype(np.uint64)
    return h1, (h2 | np.uint64(1))


def _bit_positions(h1, h2, m_bits: int, n_hashes: int):
    with np.errstate(over="ignore"):
        for i in range(n_hashes):
            yield ((h1 + np.uint64(i) * h2) & _MASK64) % np.uint64(m_bits)


def _pc():
    import pyarrow.compute as pc

    return pc


def _broadcast_keys(right_ds, on: str, limit: int):
    """If the (materialized) build side holds <= ``limit`` keys,
    return them as a distinct pa.Array for a map-side exact is_in;
    else None.  count() on a materialized dataset is metadata-free."""
    if limit <= 0 or right_ds.count() > limit:
        return None
    df = right_ds.to_pandas()
    if on not in df.columns:  # schema-less empty side
        return pa.array([], pa.string())
    return pa.Array.from_pandas(df[on].drop_duplicates())


def build_bloom(right_ds, on: str, m_bits: int = 1 << 23, n_hashes: int = 4):
    """One pass over the build side -> the OR of per-block fixed-size
    bitsets (uint64-packed numpy array, m_bits/8 bytes)."""
    n_words = m_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(on).to_numpy(zero_copy_only=False)
        bits = np.zeros(n_words, dtype=np.uint64)
        if len(col):
            h1, h2 = _hash2_u64(col)
            for idx in _bit_positions(h1, h2, m_bits, n_hashes):
                words = (idx >> np.uint64(6)).astype(np.int64)
                masks = np.uint64(1) << (idx & np.uint64(63))
                np.bitwise_or.at(bits, words, masks)
        return pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

    merged = np.zeros(n_words, dtype=np.uint64)
    parts = right_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # an empty build side yields a schema-less 0-row frame
    if "bits" in parts.columns:
        for part in parts["bits"]:
            merged |= np.frombuffer(part, dtype=np.uint64)
    return merged


def bloom_semi_join(
    left_ds,
    right_ds,
    on: str,
    n_buckets: int = 64,
    m_bits: int = 1 << 23,
    n_hashes: int = 4,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    broadcast_limit: int = 200_000,
):
    """Exact semi join with a Bloom pre-filter on the probe side.
    ``right_ds`` should be pre-projected to its key column (the same
    contract as the plain semi join).

    Build sides at or below ``broadcast_limit`` keys skip the Bloom +
    bucketed join entirely: the exact key set broadcasts once
    (``ray.put``) and the join is ONE map-side ``is_in`` — zero
    exchange.  Curation drop-sets (duplicate ids, contaminated ids)
    are usually this small even at corpus scale."""
    import ray

    right_ds = right_ds.materialize()
    small = _broadcast_keys(right_ds, on, broadcast_limit)
    if small is not None:
        keys_ref = ray.put(small)

        def semi_small(batch: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            return batch.filter(
                _pc().is_in(batch.column(on), value_set=keys)
            )

        return left_ds.map_batches(semi_small, batch_format="pyarrow")
    bits_ref = ray.put(build_bloom(right_ds, on, m_bits, n_hashes))

    def prefilter(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)
        col = batch.column(on).to_numpy(zero_copy_only=False)
        if not len(col):
            return batch
        h1, h2 = _hash2_u64(col)
        keep = np.ones(len(col), dtype=bool)
        for idx in _bit_positions(h1, h2, m_bits, n_hashes):
            words = (idx >> np.uint64(6)).astype(np.int64)
            hit = (bits[words] >> (idx & np.uint64(63))) & np.uint64(1)
            keep &= hit.astype(bool)
        return batch.filter(pa.array(keep))

    survivors = left_ds.map_batches(prefilter, batch_format="pyarrow")
    return bucketed_hash_join(
        survivors,
        right_ds,
        on=on,
        n_buckets=n_buckets,
        how="semi",
        left_schema=left_schema,
        right_schema=right_schema,
    )


def bloom_anti_join(
    left_ds,
    right_ds,
    on: str,
    n_buckets: int = 64,
    m_bits: int = 1 << 23,
    n_hashes: int = 4,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    broadcast_limit: int = 200_000,
):
    """Exact ANTI join (left rows with no right match) with a Bloom
    pre-filter: rows whose key misses the filter are DEFINITELY
    unmatched — they pass through map-side with zero shuffle; only the
    Bloom hits (true matches + false positives) go through the exact
    bucketed anti join.  With a small right side (a drop-list of
    duplicates or contaminated ids — the curation shape) the exchange
    carries a sliver of the data while the result stays provably equal
    to the unfiltered anti join.

    Build sides at or below ``broadcast_limit`` keys skip Bloom + join
    entirely — the exact key set broadcasts once and the anti join is
    ONE map-side negated ``is_in`` (zero exchange, zero union): the
    usual case for drop-lists even at corpus scale."""
    import ray

    right_ds = right_ds.materialize()
    small = _broadcast_keys(right_ds, on, broadcast_limit)
    if small is not None:
        keys_ref = ray.put(small)

        def anti_small(batch: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            pc = _pc()
            return batch.filter(
                pc.invert(pc.is_in(batch.column(on), value_set=keys))
            )

        return left_ds.map_batches(anti_small, batch_format="pyarrow")
    bits_ref = ray.put(build_bloom(right_ds, on, m_bits, n_hashes))

    def split_mask(batch: pa.Table):
        bits = ray.get(bits_ref)
        col = batch.column(on).to_numpy(zero_copy_only=False)
        if not len(col):
            return np.zeros(0, dtype=bool)
        h1, h2 = _hash2_u64(col)
        hit = np.ones(len(col), dtype=bool)
        for idx in _bit_positions(h1, h2, m_bits, n_hashes):
            words = (idx >> np.uint64(6)).astype(np.int64)
            bit = (bits[words] >> (idx & np.uint64(63))) & np.uint64(1)
            hit &= bit.astype(bool)
        return hit

    def keep_misses(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(~split_mask(batch)))

    def keep_hits(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(split_mask(batch)))

    definite = left_ds.map_batches(keep_misses, batch_format="pyarrow")
    candidates = left_ds.map_batches(keep_hits, batch_format="pyarrow")
    cleared = bucketed_hash_join(
        candidates,
        right_ds,
        on=on,
        n_buckets=n_buckets,
        how="anti",
        left_schema=left_schema,
        right_schema=right_schema,
    )
    return definite.union(cleared)
