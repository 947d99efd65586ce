"""KMV (K-minimum-values) distinct-count sketch — the mergeable
approximate counterpart of ``relational.events_distinct_users``.

At 100-TB scale an exact distinct count shuffles every unique key; a
KMV sketch shuffles at most K 8-byte hashes per (block, group):

* map side: per block and group, hash each key (md5 -> uint64 fraction
  of hash space) and keep the K smallest values — a mergeable partial.
* reduce: union the partials per group, re-take the K smallest, and
  estimate ``n_distinct ~= (K - 1) / kth_smallest_fraction`` (the
  classic KMV estimator; exact when fewer than K distinct values were
  seen).  Deterministic: hashing, no RNG.

Relative error ~ 1/sqrt(K); K=256 gives ~6%.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MAX64 = float(1 << 64)


def _hash_fractions(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.float64)
    for i, v in enumerate(values):
        h = hashlib.md5(str(v).encode()).digest()[:8]
        out[i] = int.from_bytes(h, "little") / _MAX64
    return out


def kmv_distinct(ds, group_col: str, key_col: str, k: int = 256):
    """Dataset -> (group_col, n_distinct_est:int64, exactish:bool).

    ``exactish`` is True when the sketch held every distinct value
    (fewer than K seen), in which case the count is exact.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch.column(group_col).to_pylist(),
                "key": batch.column(key_col).to_pylist(),
            }
        ).drop_duplicates()
        df["frac"] = _hash_fractions(df["key"].tolist())
        groups, fracs, seens = [], [], []
        for g, sub in df.groupby("g", sort=False):
            u = np.unique(sub["frac"].to_numpy())
            smallest = np.sort(u)[:k]
            groups.append(g)
            fracs.append(smallest.tolist())
            seens.append(len(u))
        return pa.Table.from_pydict(
            {
                "g": pa.array(groups),
                "fracs": pa.array(fracs, pa.list_(pa.float64())),
                "n_seen": pa.array(seens, pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        allv = np.unique(np.concatenate([np.asarray(f) for f in group["fracs"]]))
        smallest = np.sort(allv)[:k]
        if len(smallest) < k:
            est = len(smallest)  # saw everything: exact
            exact = True
        else:
            est = int(round((k - 1) / smallest[-1]))
            exact = False
        return pd.DataFrame(
            {
                group_col: [group["g"].iloc[0]],
                "n_distinct_est": pd.Series([est], dtype="int64"),
                "exactish": [exact],
            }
        )

    return partials.groupby("g").map_groups(merge, batch_format="pandas")
