"""Persisted predicate-partitioned triple store — the 100-TB KG path.

Every ``kg_*`` query so far re-distills the graph from the source
documents per run; that is the right shape for one-shot pipelines but
wrong for a standing knowledge graph that is queried many times.  This
module splits construction from querying the way a production triple
store would (vertical partitioning by predicate — the classic SW-Store
/ property-table layout), and supports in-place evolution the way a
table format would (manifest-swapped partition generations):

* ``persist_kg``: ONE construction pass — each triple gets a
  deterministic ``pred_key`` partition token in ``map_batches`` and the
  table is written as one Parquet directory per predicate token.
* ``read_kg``: reads ONLY the requested predicates' partitions
  (directory pruning at the storage layer; scan fraction ≈
  |preds| / |distinct preds|), with a residual equality filter because
  sanitization may collide distinct predicate IRIs into one token.
* ``update_kg``: SPARQL-Update analogue (INSERT DATA / DELETE DATA,
  rdflib Graph.update / add / remove): ONLY the partitions named by
  the delta are rewritten, each as a new generation directory; the
  manifest — rewritten atomically LAST — maps every predicate token to
  its current generation's directory, so untouched partitions are
  re-pointed, never copied, and a crash mid-update leaves the old
  manifest reading the old snapshot (snapshot isolation for free).

The ``_meta.json`` manifest doubles as the completeness sentinel: it
is the LAST artifact written (atomically, tmp+rename) on both build
and update — a store without it is invisible and gets rebuilt; stale
generation directories are unreferenced, not corrupting (same contract
as stages/ann_index.py).

At cluster scale the store build is the only full-data pass; a BGP
whose patterns bind 2 of 40 predicates opens 2/40ths of the files, and
a vocabulary-migration update touching one predicate rewrites 1/40th.
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa
from ..sources.io import read_parquet as read_parquet_clean

_META = "_meta.json"
_PRED_TOKEN_RE = re.compile(r"[^A-Za-z0-9]+")
_COLS = ("subj", "pred", "obj_value")
_QCOLS = ("subj", "pred", "obj_value", "graph")


def pred_key(pred: str) -> str:
    """Deterministic partition token for a predicate IRI: the last two
    path/fragment segments, sanitized to [A-Za-z0-9_] and length-capped
    (partition directory names must stay filesystem-safe).  Collisions
    are allowed — readers re-filter on the full IRI."""
    tail = re.split(r"[/#]", pred.rstrip("/#"))
    token = _PRED_TOKEN_RE.sub("_", "_".join(tail[-2:])).strip("_")
    return (token or "p")[:48]


def store_is_complete(store_dir: str) -> bool:
    """The manifest doubles as the build/update-complete sentinel: it
    is the LAST artifact written (atomically).  A manifest of an older
    layout format counts as incomplete — callers rebuild rather than
    silently misread a foreign generation scheme (the same fail-loud
    rule the flagship's resume meta guard follows)."""
    path = os.path.join(store_dir, _META)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            return json.load(f).get("format") == 2
    except (OSError, ValueError):
        return False


def store_has_graph(store_dir: str) -> bool:
    """Is this a quad store (rows carry a ``graph`` column)?  Answered
    from the manifest's recorded form; older manifests (or ones written
    before the flag existed) fall back to sniffing one partition file's
    schema.  An empty store with no recorded form reads as triple-form
    — the next insert's delta schema decides what it becomes."""
    meta = _read_meta(store_dir)
    if "quads" in meta:
        return bool(meta["quads"])
    return _sniff_quads(store_dir, meta["partitions"])


def _sniff_quads(store_dir: str, partitions: dict) -> bool:
    """Schema-sniff a freshly written generation for the graph column."""
    if not partitions:
        return False
    import pyarrow.parquet as pq

    paths = _partition_files(store_dir, partitions, sorted(partitions)[:1])
    return bool(paths) and "graph" in pq.read_schema(paths[0]).names


def _read_meta(store_dir: str) -> dict:
    with open(os.path.join(store_dir, _META)) as f:
        return json.load(f)


def _write_meta(store_dir: str, meta: dict) -> None:
    tmp = os.path.join(store_dir, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(store_dir, _META))


def _add_key(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    preds = batch.column("pred")
    # vectorized via dictionary-encode: one pred_key() call per
    # DISTINCT predicate in the block, not per row
    enc = (
        preds.combine_chunks().dictionary_encode()
        if isinstance(preds, pa.ChunkedArray)
        else preds.dictionary_encode()
    )
    keys = pa.array([pred_key(p) for p in enc.dictionary.to_pylist()], pa.string())
    col = pa.DictionaryArray.from_arrays(enc.indices, keys).cast(pa.string())
    # extra columns (e.g. a named-graph column -> a quad store) pass
    # through untouched; only the triple columns are canonicalized
    extra = {
        c: batch.column(c) for c in batch.column_names if c not in _COLS
    }
    def filled(c):
        # null term slots normalize to '' exactly like update_kg's
        # norm(): otherwise a persisted null-graph row packs to a null
        # set-key and can never be matched by a later DELETE
        cast = pc.cast(batch.column(c), pa.string())
        return pc.fill_null(cast, "")

    return pa.Table.from_pydict(
        {
            **{c: filled(c) for c in _COLS},
            **{
                c: (filled(c) if pa.types.is_string(batch.column(c).type)
                    or pa.types.is_large_string(batch.column(c).type)
                    else v)
                for c, v in extra.items()
            },
            "pred_key": col,
        }
    )


def _write_generation(keyed_ds, store_dir: str, gen: int) -> dict:
    """Write one hive pass under a staging dir, then move each
    partition to its generation directory.  Returns {token: relpath}."""
    import shutil

    staging = os.path.join(store_dir, "_stage_g%d" % gen)
    if os.path.isdir(staging):
        shutil.rmtree(staging)
    keyed_ds.write_parquet(staging, partition_cols=["pred_key"])
    if not os.path.isdir(staging):  # empty dataset writes nothing
        return {}

    parts = {}
    for d in sorted(os.listdir(staging)):
        if not d.startswith("pred_key="):
            continue
        token = d.split("=", 1)[1]
        rel = os.path.join("parts", "%s-g%d" % (token, gen))
        dst = os.path.join(store_dir, rel)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(os.path.join(staging, d), dst)
        parts[token] = rel
    shutil.rmtree(staging)
    return parts


def _partition_files(store_dir: str, partitions: dict, tokens) -> list:
    """Expand partition directories to their Parquet files (the pruned
    read takes explicit file lists)."""
    import glob as _glob

    return [
        f
        for t in tokens
        for f in sorted(
            _glob.glob(os.path.join(store_dir, partitions[t], "*.parquet"))
        )
    ]


def persist_kg(triples_ds, store_dir: str) -> dict:
    """One-shot store build from a (subj, pred, obj_value) Dataset.
    Returns the meta dict.  Predicate-partitioned so later reads prune;
    within a partition Ray writes one file per block, so reads
    parallelize without a repartition."""
    import shutil

    os.makedirs(store_dir, exist_ok=True)
    # a previous crashed build (no manifest) may have left partial
    # generation dirs; clear them so the rebuild can't mix generations.
    # Over a COMPLETE store, build into a FRESH generation instead —
    # rewriting gen-1 dirs in place would destroy the live snapshot the
    # still-valid old manifest points at (a crash mid-build would leave
    # store_is_complete()==True over mixed old/new data).
    if not store_is_complete(store_dir):
        gen = 1
        for d in ("parts", "triples"):
            p = os.path.join(store_dir, d)
            if os.path.isdir(p):
                shutil.rmtree(p)
    else:
        gen = _read_meta(store_dir)["generation"] + 1

    parts = _write_generation(
        triples_ds.map_batches(_add_key, batch_format="pyarrow"), store_dir, gen
    )
    meta = {
        "format": 2,
        "generation": gen,
        "partitions": parts,
        "quads": _sniff_quads(store_dir, parts),
    }
    # manifest LAST: callers key "store already built" off this file,
    # so it must not exist before the partition writes completed
    _write_meta(store_dir, meta)
    return meta


def update_kg(store_dir: str, insert_ds=None, delete_ds=None, quads=None) -> dict:
    """INSERT DATA / DELETE DATA against the store (deletes apply
    first, matching SPARQL Update's single-request semantics).  Only
    partitions whose predicate appears in the delta are rewritten —
    each as a NEW generation directory, with the manifest re-pointed
    atomically at the end.  Untouched partitions are carried by
    reference.  A crash before the manifest write leaves the previous
    snapshot fully readable.

    Works on triple stores and quad stores alike: ``quads`` forces the
    mode (True = deltas carry / default to a ``graph`` column, set
    semantics key on all four columns); ``None`` auto-detects from the
    store's recorded form.  Mixing a quad delta into a triple store
    raises — the row shapes are incompatible and a silent widen would
    corrupt every existing reader's schema."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .distinct import distinct
    from .graphops import graph_difference

    meta = _read_meta(store_dir)
    gen = meta["generation"] + 1
    # each delta's lineage is consumed twice (predicate collection +
    # the merge); pin the key-sized delta rows once
    if insert_ds is not None:
        insert_ds = insert_ds.materialize()
    if delete_ds is not None:
        delete_ds = delete_ds.materialize()

    def delta_keys(ds):
        if ds is None:
            return set()

        def uniq(b: pa.Table) -> pa.Table:
            # an empty upstream block may arrive schemaless
            if "pred" not in b.column_names:
                return pa.Table.from_pydict({"pred": pa.array([], pa.string())})
            return pa.Table.from_pydict(
                {"pred": pc.unique(pc.cast(b.column("pred"), pa.string()))}
            )

        df = ds.map_batches(uniq, batch_format="pyarrow").to_pandas()
        if "pred" not in df.columns:  # zero-block dataset
            return set()
        return {pred_key(p) for p in df["pred"].unique()}

    touched = sorted(delta_keys(insert_ds) | delta_keys(delete_ds))
    if not touched:
        return meta

    if quads is None:
        quads = store_has_graph(store_dir)
    elif meta["partitions"] and bool(quads) != store_has_graph(store_dir):
        # a forced form that contradicts a NON-EMPTY store must refuse
        # even when every delta predicate is new — otherwise the delta
        # writes partitions of the other shape next to the existing
        # ones and flips the recorded form (silent schema widening)
        raise ValueError(
            "update_kg(quads=%r) against a non-empty %s store — the row"
            " shapes are incompatible; rebuild via persist_kg"
            % (quads, "quad" if store_has_graph(store_dir) else "triple")
        )
    cols = list(_QCOLS) if quads else list(_COLS)

    # current rows of ONLY the touched partitions (pruned read)
    paths = _partition_files(
        store_dir, meta["partitions"], [t for t in touched if t in meta["partitions"]]
    )
    if paths:
        import pyarrow.parquet as pq

        extra = set(pq.read_schema(paths[0]).names) - set(cols)
        if extra:
            raise ValueError(
                "store rows carry columns %s beyond the %s layout this"
                " update targets — a quad delta cannot apply to a"
                " triple store (and vice versa); rebuild via persist_kg"
                % (sorted(extra), "quad" if quads else "triple")
            )

    def norm(b: pa.Table) -> pa.Table:
        # an empty upstream block may arrive schemaless (same hazard
        # delta_keys' uniq defends against)
        if b.num_rows == 0:
            return pa.Table.from_pydict(
                {c: pa.array([], pa.string()) for c in cols}
            )
        # quad mode: a graph-less delta lands in the default graph ''
        out = {}
        for c in cols:
            if c == "graph" and "graph" not in b.column_names:
                out[c] = pa.nulls(b.num_rows, pa.string()).fill_null("")
            else:
                out[c] = pc.fill_null(pc.cast(b.column(c), pa.string()), "")
        return pa.Table.from_pydict(out)

    if paths:
        current = read_parquet_clean(paths, columns=cols)
    else:
        current = rd.from_arrow(
            pa.Table.from_pydict({c: pa.array([], pa.string()) for c in cols})
        )

    updated = current
    if delete_ds is not None:
        # one bucketed anti join, key-sized rows on the delete side
        updated = graph_difference(
            updated, delete_ds.map_batches(norm, batch_format="pyarrow"),
            cols=tuple(cols),
        )
    if insert_ds is not None:
        ins = insert_ds.map_batches(norm, batch_format="pyarrow")
        updated = distinct(updated.union(ins), cols)

    new_parts = _write_generation(
        updated.map_batches(_add_key, batch_format="pyarrow"), store_dir, gen
    )
    partitions = dict(meta["partitions"])
    for t in touched:
        partitions.pop(t, None)  # delta may have emptied the partition
    partitions.update(new_parts)
    meta = {
        "format": 2,
        "generation": gen,
        "partitions": partitions,
        "quads": bool(quads),
    }
    _write_meta(store_dir, meta)
    return meta


def clear_kg(store_dir: str) -> dict:
    """SPARQL ``CLEAR DEFAULT`` analogue: swap in a manifest with no
    partitions (a new, empty generation).  The old generation
    directories stay on disk for crash safety / time travel until
    ``vacuum_store``."""
    meta = _read_meta(store_dir)
    meta = {
        "format": 2,
        "generation": meta["generation"] + 1,
        "partitions": {},
        "quads": meta.get("quads", False),  # an emptied store keeps its form
    }
    _write_meta(store_dir, meta)
    return meta


def transform_graphs(store_dir: str, affected, rewrite) -> dict:
    """Generational map-only rewrite of the partitions whose ``graph``
    column matches ``affected`` — the engine of SPARQL Update's graph
    management (§3.2: DROP / CLEAR GRAPH, COPY, MOVE), all of which are
    PARTITION-LOCAL under predicate partitioning: a graph's rows for
    predicate P live in P's partition, and so do their retagged copies.

    * ``affected(graph_array) -> bool mask``: which graph values the
      operation touches (vectorized, pyarrow).
    * ``rewrite(batch) -> batch``: the per-batch rewrite applied to
      every row batch of the touched partitions (drop rows, retag
      graphs, duplicate-and-retag — anything row-local).

    Two passes, no exchange anywhere:

    1. a PRUNE scan reading ONLY the (pred, graph) columns finds the
       partitions that contain any affected graph (columnar projection
       — at 100 TB this reads two thin columns, not the store);
    2. only those partitions re-write through ``rewrite`` as a new
       generation; every other partition is carried by reference in
       the manifest swap, exactly like ``update_kg``.

    Requires a quad store (``store_has_graph``); raises otherwise."""
    import pyarrow.compute as pc
    import ray.data as rd

    meta = _read_meta(store_dir)
    if not store_has_graph(store_dir):
        raise ValueError(
            "graph management needs a quad store (rows with a 'graph'"
            " column); this store at %s is triple-form" % store_dir
        )
    gen = meta["generation"] + 1
    partitions = meta["partitions"]
    all_paths = _partition_files(store_dir, partitions, sorted(partitions))
    if not all_paths:
        return meta

    # pass 1: (pred, graph)-only prune scan -> touched pred_keys
    def hit_preds(b: pa.Table) -> pa.Table:
        g = pc.fill_null(pc.cast(b.column("graph"), pa.string()), "")
        hits = b.filter(affected(g))
        return pa.Table.from_pydict(
            {"pred": pc.unique(pc.cast(hits.column("pred"), pa.string()))}
        )

    df = (
        read_parquet_clean(all_paths, columns=["pred", "graph"])
        .map_batches(hit_preds, batch_format="pyarrow")
        .to_pandas()
    )
    touched = (
        sorted({pred_key(p) for p in df["pred"].unique()})
        if "pred" in df.columns and len(df)
        else []
    )
    touched = [t for t in touched if t in partitions]
    if not touched:
        return meta

    # pass 2: rewrite ONLY the touched partitions, map-side
    paths = _partition_files(store_dir, partitions, touched)
    updated = read_parquet_clean(paths, columns=list(_QCOLS)).map_batches(
        rewrite, batch_format="pyarrow"
    )
    new_parts = _write_generation(
        updated.map_batches(_add_key, batch_format="pyarrow"), store_dir, gen
    )
    partitions = dict(partitions)
    for t in touched:
        partitions.pop(t, None)  # rewrite may have emptied the partition
    partitions.update(new_parts)
    meta = {
        "format": 2,
        "generation": gen,
        "partitions": partitions,
        "quads": True,
    }
    _write_meta(store_dir, meta)
    return meta


def vacuum_store(store_dir: str) -> list:
    """Delete generation directories the current manifest no longer
    references (superseded partitions left behind by ``update_kg`` for
    crash safety / time travel).  Returns the removed relative paths.
    Safe at any time: the manifest is the source of truth, and a
    concurrent reader of the CURRENT snapshot only touches referenced
    directories."""
    import shutil

    if not store_is_complete(store_dir):
        raise FileNotFoundError("KG store at %s is absent or incomplete" % store_dir)
    live = set(_read_meta(store_dir)["partitions"].values())
    parts_dir = os.path.join(store_dir, "parts")
    removed = []
    if os.path.isdir(parts_dir):
        for d in sorted(os.listdir(parts_dir)):
            rel = os.path.join("parts", d)
            if rel not in live:
                shutil.rmtree(os.path.join(store_dir, rel))
                removed.append(rel)
    return removed


def read_kg(store_dir: str, preds=None, columns=None):
    """Read the store back as a Dataset; ``preds`` (list of predicate
    IRIs) prunes to only those predicates' partition directories and
    applies the residual exact filter.  ``columns`` prunes at the
    Parquet reader (pred is added transparently when a residual filter
    needs it, then dropped)."""
    import pyarrow.compute as pc
    import ray.data as rd

    if not store_is_complete(store_dir):
        raise FileNotFoundError("KG store at %s is absent or incomplete" % store_dir)
    meta = _read_meta(store_dir)
    partitions = meta["partitions"]

    want = list(columns) if columns is not None else None
    # pred is read transparently ONLY when the residual exact filter
    # needs it (preds given); a plain projection must return exactly
    # the requested columns and not scan pred for nothing
    need_pred = preds is not None and want is not None and "pred" not in want
    read_cols = [*want, "pred"] if need_pred else want
    tokens = (
        sorted(partitions)
        if preds is None
        else sorted({pred_key(p) for p in preds} & set(partitions))
    )
    paths = _partition_files(store_dir, partitions, tokens)
    if not paths:
        layout = list(_QCOLS) if meta.get("quads") else list(_COLS)
        empty = {
            c: pa.array([], pa.string()) for c in (want or layout)
        }
        return rd.from_arrow(pa.Table.from_pydict(empty))
    ds = read_parquet_clean(paths, columns=read_cols)
    if preds is None:
        return ds
    pred_arr = pa.array(sorted(set(preds)))

    def residual(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.is_in(batch.column("pred"), pred_arr))
        if want is not None and "pred" not in want:
            out = out.select(want)
        return out

    return ds.map_batches(residual, batch_format="pyarrow")
