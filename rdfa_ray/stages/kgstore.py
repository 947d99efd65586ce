"""Persisted predicate-partitioned triple store — the 100-TB KG path.

Every ``kg_*`` query so far re-distills the graph from the source
documents per run; that is the right shape for one-shot pipelines but
wrong for a standing knowledge graph that is queried many times.  This
module splits construction from querying the way a production triple
store would (vertical partitioning by predicate — the classic SW-Store
/ property-table layout):

* ``persist_kg``: ONE construction pass — each triple gets a
  deterministic ``pred_key`` partition token in ``map_batches`` and the
  table is written as ``pred_key=…/``-partitioned Parquet.  The
  ``_META`` json is the store's completeness sentinel, so it is written
  (atomically, tmp+rename) only AFTER the triples dataset write
  finishes — a crash mid-build leaves no sentinel and the next run
  rebuilds; a partially-built store is never visible (same contract as
  stages/ann_index.py).
* ``read_kg``: reads ONLY the requested predicates' partitions
  (directory pruning at the storage layer; scan fraction ≈
  |preds| / |distinct preds|), with a residual equality filter because
  sanitization may collide distinct predicate IRIs into one token.

At cluster scale the store build is the only full-data pass; a BGP
whose patterns bind 2 of 40 predicates opens 2/40ths of the files.
Reference parity: rdflib persists graphs through its Store plugin API
(rdflib/graph.py Graph.open/commit); this is that capability expressed
as partitioned Parquet + pruned ``read_parquet``.
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa

_META = "_meta.json"
_PRED_TOKEN_RE = re.compile(r"[^A-Za-z0-9]+")


def pred_key(pred: str) -> str:
    """Deterministic partition token for a predicate IRI: the last two
    path/fragment segments, sanitized to [A-Za-z0-9_] and length-capped
    (hive directory names must stay filesystem-safe).  Collisions are
    allowed — readers re-filter on the full IRI."""
    tail = re.split(r"[/#]", pred.rstrip("/#"))
    token = _PRED_TOKEN_RE.sub("_", "_".join(tail[-2:])).strip("_")
    return (token or "p")[:48]


def store_is_complete(store_dir: str) -> bool:
    """The meta file doubles as the build-complete sentinel: it is the
    LAST artifact written (atomically)."""
    return os.path.exists(os.path.join(store_dir, _META))


def persist_kg(triples_ds, store_dir: str) -> dict:
    """One-shot store build from a (subj, pred, obj_value) Dataset.
    Returns the meta dict.  Predicate-partitioned so later reads prune;
    within a partition Ray writes one file per block, so reads
    parallelize without a repartition."""
    os.makedirs(store_dir, exist_ok=True)
    # a previous crashed build (no sentinel) may have left partial
    # triple files; clear them so the rebuild can't mix generations
    tri_dir = os.path.join(store_dir, "triples")
    if os.path.isdir(tri_dir):
        import shutil

        shutil.rmtree(tri_dir)

    def add_key(batch: pa.Table) -> pa.Table:
        preds = batch.column("pred")
        # vectorized via dictionary-encode: one pred_key() call per
        # DISTINCT predicate in the block, not per row
        enc = preds.combine_chunks().dictionary_encode() if isinstance(
            preds, pa.ChunkedArray
        ) else preds.dictionary_encode()
        keys = pa.array([pred_key(p) for p in enc.dictionary.to_pylist()], pa.string())
        col = pa.DictionaryArray.from_arrays(enc.indices, keys).cast(pa.string())
        return batch.append_column("pred_key", col)

    triples_ds.map_batches(add_key, batch_format="pyarrow").write_parquet(
        tri_dir, partition_cols=["pred_key"]
    )

    parts = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(tri_dir)
        if d.startswith("pred_key=")
    )
    meta = {"format": 1, "partitions": parts}
    # sentinel LAST: callers key "store already built" off this file,
    # so it must not exist before the triples write completed
    tmp = os.path.join(store_dir, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(store_dir, _META))
    return meta


def read_kg(store_dir: str, preds=None, columns=None):
    """Read the store back as a Dataset; ``preds`` (list of predicate
    IRIs) prunes to only those predicates' hive directories and applies
    the residual exact filter.  ``columns`` prunes at the Parquet
    reader (pred is added transparently when a residual filter needs
    it, then dropped)."""
    import glob as _glob

    import pyarrow.compute as pc
    import ray.data as rd

    if not store_is_complete(store_dir):
        raise FileNotFoundError("KG store at %s is absent or incomplete" % store_dir)
    tri_dir = os.path.join(store_dir, "triples")
    if preds is None:
        return rd.read_parquet(tri_dir, columns=columns)

    keys = sorted({pred_key(p) for p in preds})
    paths = [
        f
        for k in keys
        for f in sorted(_glob.glob(os.path.join(tri_dir, "pred_key=%s" % k, "*.parquet")))
    ]
    want = list(columns) if columns is not None else None
    read_cols = want if want is None or "pred" in want else [*want, "pred"]
    if not paths:  # no partition for any requested predicate
        empty = {c: pa.array([], pa.string()) for c in (read_cols or ["subj", "pred", "obj_value"])}
        ds = rd.from_arrow(pa.Table.from_pydict(empty))
    else:
        ds = rd.read_parquet(paths, columns=read_cols)
    pred_set = set(preds)

    def residual(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.is_in(batch.column("pred"), pa.array(sorted(pred_set))))
        if want is not None and "pred" not in want:
            out = out.select(want)
        return out

    return ds.map_batches(residual, batch_format="pyarrow")
