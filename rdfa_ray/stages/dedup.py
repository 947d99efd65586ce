"""Deduplication stages for large-scale training-data pipelines.

All operate on a ``documents``-shaped Dataset (doc_id, text, ...):

* exact dedup     — content-hash + hash-partitioned group, keep first
* MinHash + LSH   — shingle -> minhash -> banded buckets -> candidate
                    pairs -> exact-Jaccard verify
* SimHash         — 64-bit simhash + banded hamming LSH
* n-gram Jaccard  — the verify kernel, exposed standalone

Scale notes: every stage pre-computes signatures inside vectorized /
tight-loop ``map_batches`` (hashing is numpy where possible); the only
shuffles are groupbys on hash keys (uniformly distributed by
construction, so no salting needed).  Candidate verification joins
shingle sets through the bucket groupby — never a cross join.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = re.compile(r"[A-Za-z0-9]+")


def _text_md5_batch(batch: pa.Table) -> pa.Table:
    hashes = [
        hashlib.md5((t or "").encode()).hexdigest()
        for t in batch.column("text").to_pylist()
    ]
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"), "h": pa.array(hashes)}
    )


def exact_dedup(docs_ds):
    """Exact duplicate groups: (h, keeper=min doc_id, n).  Hash first in
    map_batches (so only (doc_id, 16-byte hash) rows shuffle), then a
    hash-partitioned groupby."""
    from ray.data.aggregate import Count, Min

    hashed = docs_ds.map_batches(_text_md5_batch, batch_format="pyarrow")
    return hashed.groupby("h").aggregate(
        Min("doc_id", alias_name="keeper"), Count(alias_name="n")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH

N_HASHES = 128
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = (1 << 61) - 1


def _hash_params(n=N_HASHES, seed=7):
    """Deterministic (a, b) pairs for universal hashing."""
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MERSENNE, size=n, dtype=np.int64)
    b = rs.randint(0, _MERSENNE, size=n, dtype=np.int64)
    return a, b


def shingles(text: str, k: int = 3) -> set[int]:
    """Word k-shingles as 32-bit hashes."""
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < k:
        return {zlib.crc32(" ".join(words).encode())} if words else set()
    return {
        zlib.crc32(" ".join(words[i : i + k]).encode()) for i in range(len(words) - k + 1)
    }


class MinHasher:
    """Actor: text -> (doc_id, band, band_hash) rows (one per band)."""

    def __init__(self, k: int = 3):
        self.k = k
        self.a, self.b = _hash_params()

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.k)
        if not sh:
            return np.full(N_HASHES, _MERSENNE, dtype=np.int64)
        x = np.fromiter(sh, dtype=np.int64, count=len(sh))
        # (a*x + b) mod p for all hash funcs: vectorized outer product
        vals = (np.multiply.outer(self.a, x) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids_out, bands, band_hashes = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = self.signature(text)
            for band in range(N_BANDS):
                chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                doc_ids_out.append(doc_id)
                bands.append(band)
                band_hashes.append(hashlib.md5(chunk.tobytes()).hexdigest()[:16])
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids_out, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(band_hashes),
            }
        )


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(group["doc_id"]))
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    a_out, b_out = [], []
    # buckets are tiny (same 8-minhash band); cap degenerate buckets
    ids = ids[:50]
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a_out.append(ids[i])
            b_out.append(ids[j])
    return pd.DataFrame({"a": a_out, "b": b_out})


def jaccard(t1: str, t2: str, k: int = 3) -> float:
    s1, s2 = shingles(t1, k), shingles(t2, k)
    if not s1 and not s2:
        return 1.0
    inter = len(s1 & s2)
    return inter / (len(s1) + len(s2) - inter) if (s1 or s2) else 0.0


def minhash_dedup(docs_ds, threshold: float = 0.8, concurrency=(2, 8)):
    """Near-duplicate pairs (a, b, jaccard>=threshold).

    shingle->minhash->band (actor pool) -> groupby(band, band_hash)
    -> candidate pairs -> distinct -> exact-Jaccard verify with the
    texts joined in via a broadcast of candidate ids (candidate sets
    are small relative to the corpus; the verify re-reads only the
    needed texts)."""
    import ray

    banded = docs_ds.map_batches(
        MinHasher, batch_format="pyarrow", batch_size=1024, concurrency=concurrency
    )
    pairs = (
        banded.groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )

    # verify: broadcast texts of candidate ids only
    cand = pairs.to_pandas()
    if len(cand) == 0:
        return pairs
    needed = set(cand["a"]) | set(cand["b"])

    def collect_texts(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("doc_id"), value_set=pa.array(list(needed)))
        return batch.filter(mask).select(["doc_id", "text"])

    texts_df = docs_ds.map_batches(collect_texts, batch_format="pyarrow").to_pandas()
    text_map = dict(zip(texts_df["doc_id"], texts_df["text"]))
    text_ref = ray.put(text_map)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        tm = ray.get(text_ref)
        sims = [
            jaccard(tm.get(a, ""), tm.get(b, ""))
            for a, b in zip(batch["a"], batch["b"])
        ]
        batch = batch.copy()
        batch["jaccard"] = sims
        return batch[batch["jaccard"] >= threshold][["a", "b", "jaccard"]]

    import ray.data as rd

    return rd.from_pandas(cand).map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash

_SIM_BANDS = 4  # 16 bits each; hamming<=3 guarantees one identical band


class SimHasher:
    """Actor: text -> 64-bit simhash + 4 16-bit LSH band keys."""

    def __init__(self):
        self._word = _WORD_RE

    @staticmethod
    def simhash64(words) -> int:
        if not words:
            return 0
        v = np.zeros(64, dtype=np.int64)
        for w in words:
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8), bitorder="little"
            ).astype(np.int64)
            v += 2 * bits - 1
        return int(
            sum(1 << i for i in range(64) if v[i] > 0)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_sim, out_band, out_key = [], [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sh = self.simhash64(self._word.findall((text or "").lower()))
            for band in range(_SIM_BANDS):
                out_id.append(doc_id)
                out_sim.append(sh)
                out_band.append(band)
                out_key.append((sh >> (16 * band)) & 0xFFFF)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "simhash": pa.array(out_sim, pa.uint64()),
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int32()),
            }
        )


def _sim_pairs(group: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    rows = group.drop_duplicates("doc_id").sort_values("doc_id")
    ids = rows["doc_id"].tolist()[:50]
    sims = rows["simhash"].tolist()[:50]
    a_out, b_out, d_out = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(int(sims[i]) ^ int(sims[j])).count("1")
            if d <= max_hamming:
                a_out.append(ids[i])
                b_out.append(ids[j])
                d_out.append(d)
    return pd.DataFrame(
        {
            "a": pd.Series(a_out, dtype="int64"),
            "b": pd.Series(b_out, dtype="int64"),
            "hamming": pd.Series(d_out, dtype="int32"),
        }
    )


def simhash_dedup(docs_ds, max_hamming: int = 3, concurrency=(2, 8)):
    banded = docs_ds.map_batches(
        SimHasher, batch_format="pyarrow", batch_size=1024, concurrency=concurrency
    )
    pairs = banded.groupby(["band", "key"]).map_groups(
        lambda g: _sim_pairs(g, max_hamming), batch_format="pandas"
    )
    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
