"""Incremental exact dedup against a PERSISTED content-hash store —
the production ingestion pattern: each new data drop dedups against
everything ever accepted WITHOUT rescanning the corpus, then commits
its own hashes as a new store generation.

Reference analogue: none in pyrdfa3 — beyond-reference data-ops stage
in the dedup family (the standing-store counterpart of
``dedup.exact_dedup``, structured like ``kgstore``: hash-prefix
partition directories + an atomically-swapped ``_meta.json`` manifest
written LAST as the completeness sentinel).

Scale shape (the whole point):

* the store holds ONLY md5 hex hashes (16 B of entropy per accepted
  document), hash-prefix partitioned into 256 directories;
* deduping a drop reads ONLY the prefix partitions its own hashes
  touch (directory pruning — a small drop against a 100-TB corpus
  reads a 1/256 slice per distinct prefix, and only the thin hash
  column);
* document text NEVER crosses an exchange: the drop hashes map-side,
  keep-first resolves on a hash-keyed groupby of (h, doc_id) rows, and
  the against-store check is a bucketed anti join of hash rows;
* committing appends one parquet per touched prefix (append-only —
  a membership set only ever grows) and swaps the manifest, so a
  crashed commit leaves the previous snapshot fully readable and a
  re-run is idempotent.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.compute as pc

_META = "_meta.json"


def _read_meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, _META)) as f:
        return json.load(f)


def _write_meta(store_dir: str, meta: dict) -> None:
    tmp = os.path.join(store_dir, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(store_dir, _META))


def hash_store_is_complete(store_dir: str) -> bool:
    path = os.path.join(store_dir, _META)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            return json.load(f).get("format") == 1
    except (OSError, ValueError):
        return False


def _hash_prefix_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, h, p): md5 hex + 2-hex-char prefix."""
    from .dedup import _text_md5_batch

    t = _text_md5_batch(batch)
    return t.append_column("p", pc.utf8_slice_codeunits(t.column("h"), 0, 2))


def _store_files(store_dir: str, meta: dict, prefixes) -> list:
    return [
        os.path.join(store_dir, rel)
        for p in prefixes
        for rel in meta["partitions"].get(p, [])
    ]


def persist_hash_store(docs_ds, store_dir: str) -> dict:
    """Build the store from an existing corpus: one hash pass, one
    hash-prefix shuffle, one parquet file per non-empty prefix.
    Returns the meta dict; manifest written LAST (sentinel)."""
    import shutil

    os.makedirs(store_dir, exist_ok=True)
    if not hash_store_is_complete(store_dir):
        p = os.path.join(store_dir, "parts")
        if os.path.isdir(p):  # crashed build: clear partial generations
            shutil.rmtree(p)

    hashed = docs_ds.map_batches(_hash_prefix_batch, batch_format="pyarrow")
    parts = _write_generation(hashed, store_dir, gen=1)
    meta = {"format": 1, "generation": 1,
            "partitions": {p: [rel] for p, rel in parts.items()}}
    _write_meta(store_dir, meta)
    return meta


def _write_generation(hashed_ds, store_dir: str, gen: int) -> dict:
    """One file per prefix for this generation: distinct hashes only.
    Returns {prefix: relpath}."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(store_dir, "parts"), exist_ok=True)

    def write_group(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {"p": pa.array([], pa.string()), "rel": pa.array([], pa.string())}
            )
        prefix = t.column("p")[0].as_py()
        h = pc.unique(pc.cast(t.column("h"), pa.string()))
        rel = os.path.join("parts", "%s-g%d-%s.parquet" % (
            prefix, gen, uuid.uuid4().hex[:8]))
        tmp = os.path.join(store_dir, rel + ".tmp")
        pa.set_cpu_count(1)
        pq.write_table(pa.table({"h": h}), tmp)
        os.replace(tmp, os.path.join(store_dir, rel))
        return pa.Table.from_pydict({"p": pa.array([prefix]), "rel": pa.array([rel])})

    rows = (
        hashed_ds.select_columns(["h", "p"])
        .groupby("p")
        .map_groups(write_group, batch_format="pyarrow")
        .to_pandas()
    )
    return dict(zip(rows["p"], rows["rel"]))


def incremental_exact_dedup(new_docs_ds, store_dir: str, commit: bool = False):
    """Dedup a new drop against the store AND itself.

    Returns the surviving (doc_id, h) rows — drop-internal keep-first
    (min doc_id per hash) minus anything the store has already
    accepted.  ``commit=True`` appends the survivors' hashes as a new
    generation and swaps the manifest (append-only membership; crash
    before the swap leaves the old snapshot; the survivors Dataset is
    materialized first so the caller's result and the committed set
    cannot diverge)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from ..sources.io import read_parquet as read_parquet_clean
    from .join import bucketed_hash_join

    if not hash_store_is_complete(store_dir):
        raise FileNotFoundError(
            "hash store at %s is absent or incomplete — build it with "
            "persist_hash_store first" % store_dir
        )
    meta = _read_meta(store_dir)

    hashed = new_docs_ds.map_batches(
        _hash_prefix_batch, batch_format="pyarrow"
    ).materialize()  # thin (doc_id, h, p) rows: consumed 2-3 times

    # drop-internal keep-first: hash-keyed exchange of hash rows only
    keepers = hashed.groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))

    # prune the store read to the prefixes this drop actually touches
    from ray.data.aggregate import Count

    prefixes = sorted(
        r["p"]
        for r in hashed.map_batches(
            lambda t: pa.Table.from_pydict({"p": pc.unique(t.column("p"))}),
            batch_format="pyarrow",
        )
        .groupby("p")
        .aggregate(Count(alias_name="_n"))
        .take_all()
    )
    paths = _store_files(store_dir, meta, prefixes)
    if paths:
        store_hashes = read_parquet_clean(paths, columns=["h"])
        survivors = bucketed_hash_join(
            keepers, store_hashes, "h", how="anti",
            left_schema=pa.schema([("h", pa.string()), ("doc_id", pa.int64())]),
            right_schema=pa.schema([("h", pa.string())]),
        )
    else:  # brand-new prefixes only: nothing to check against
        survivors = keepers
    survivors = survivors.select_columns(["doc_id", "h"]).materialize()

    if commit and survivors.count() > 0:
        gen = meta["generation"] + 1
        with_prefix = survivors.map_batches(
            lambda t: t.append_column(
                "p", pc.utf8_slice_codeunits(pc.cast(t.column("h"), pa.string()), 0, 2)
            ),
            batch_format="pyarrow",
        )
        new_parts = _write_generation(with_prefix, store_dir, gen)
        partitions = {p: list(rels) for p, rels in meta["partitions"].items()}
        for p, rel in new_parts.items():
            partitions.setdefault(p, []).append(rel)
        _write_meta(store_dir, {
            "format": 1, "generation": gen, "partitions": partitions,
        })
    return survivors
