"""Vectorized word-shingle hashing shared by the curation ops
(contamination sweep, repetition signals, quality gate).

Building shingle STRINGS (n shifted object-array concatenations) costs
one Python-level string add per token per shift — the dominant cost of
the first implementation.  This helper instead hashes each token once
(pandas ``hash_array``: stable 64-bit siphash, identical across
processes and machines) and combines windows with a vectorized
polynomial roll in uint64 (wrapping multiply-add, n numpy ops total) —
no per-token Python.

Hash equality stands in for string equality, so matchers that must be
EXACT (the contamination sweep is oracle-checked) re-verify their few
candidates against the real strings; per-document distinct counts
accept the ~2^-64-per-pair collision odds (9e8 windows at sf0.1 ->
~5e-11 aggregate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_B = np.uint64(1099511628211)  # FNV prime: odd -> invertible mod 2^64


def token_hashes(words: np.ndarray) -> np.ndarray:
    """Stable per-token 64-bit hashes for an object array of strings."""
    return pd.util.hash_array(words, categorize=True)


def explode_tokens(texts: pd.Series):
    """Split single-space texts to (words object array, parent row
    positions).  ``texts`` must be positionally indexed (0..len-1)."""
    toks = texts.fillna("").str.split(" ")
    flat = toks.explode()
    return flat.to_numpy(dtype=object), flat.index.to_numpy()


def md5_token_hashes(words: np.ndarray) -> np.ndarray:
    """SQL-reproducible per-token hash: little-endian uint64 of the
    first 8 md5 bytes (DuckDB's ``md5_number_upper``).  One hashlib
    call per DISTINCT token (vocab-bounded), mapped back via factorize
    — used by oracle-checkable fingerprinting; the default siphash
    ``token_hashes`` stays the hot-path choice."""
    import hashlib

    codes, uniq = pd.factorize(words, use_na_sentinel=False)
    lut = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(w).encode()).digest()[:8], "little")
            for w in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return lut[codes]


def window_hashes(words: np.ndarray, parents: np.ndarray, n: int, hasher=None):
    """Rolling polynomial hash of every n-token window.

    Returns ``(hashes, win_parents)`` for the windows that lie fully
    inside one parent row (document), or two empty arrays.  ``hasher``
    overrides the per-token hash (default: siphash ``token_hashes``;
    pass ``md5_token_hashes`` for SQL-reproducible output)."""
    total = len(words)
    if total < n:
        return np.array([], np.uint64), np.array([], np.int64)
    h = (hasher or token_hashes)(words)
    m = total - n + 1
    out = np.zeros(m, np.uint64)
    mult = np.uint64(1)
    with np.errstate(over="ignore"):
        for k in range(n):
            out += h[k : m + k] * mult
            mult *= _B
    valid = parents[:m] == parents[n - 1 :]
    return out[valid], parents[:m][valid].astype(np.int64)


def phrase_hash(phrase: str, n: int) -> np.uint64:
    """Hash of one n-word phrase under the same polynomial roll (the
    needle side of a window match)."""
    words = np.array(phrase.split(" "), dtype=object)
    assert len(words) == n, "phrase must be exactly n words"
    h = token_hashes(words)
    out = np.uint64(0)
    mult = np.uint64(1)
    with np.errstate(over="ignore"):
        for k in range(n):
            out += h[k] * mult
            mult *= _B
    return out
