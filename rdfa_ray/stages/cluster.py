"""Duplicate-group clustering: connected components over candidate
pairs -> one canonical id (the component's min doc_id) per document.

This is the step a dedup pipeline actually acts on: pair lists
(exact, MinHash, SimHash, embedding) become groups, and every group
keeps its canonical member.

Distributed min-label propagation (the classic Pregel-style CC):

    labels(node) := node
    repeat `iters` times:
        messages = labels             (keep-own)
                 u edges x labels(a) -> (b, label_a)
                 u edges x labels(b) -> (a, label_b)
        labels = min(message) per node       [Ray-native groupby Min]

Each iteration is two ``bucketed_hash_join`` shuffles + one hash
aggregate.  ``iters`` must be >= the component diameter; the engine's
pair producers emit STAR pairs around the min id for large duplicate
groups (stages/dedup.py), so diameters are ~2 and the default
converges.  Chain-shaped components need iters ~ log(diameter) with
pointer-doubling — out of scope; documented assumption.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .join import bucketed_hash_join


def connected_components(edges_ds, nodes_ds, iters: int = 3, n_buckets: int = 64):
    """``edges_ds``: (a:int64, b:int64); ``nodes_ds``: (node:int64).
    Returns a Dataset (node, label) — label = min node id reachable
    within ``iters`` hops (= the component min for star/short graphs).
    """
    from ray.data.aggregate import Min

    # Iterative algorithm: every superstep references `edges` and
    # `labels` MULTIPLE times, and Ray Datasets re-execute their whole
    # lineage per consumer — without materializing each superstep the
    # DAG re-runs combinatorially (measured: 127 s for what runs in
    # ~10 s materialized).  Labels are one small row per node; edges
    # are the candidate pairs — both bounded, the canonical case for
    # mid-pipeline materialization.
    edges_ds = edges_ds.materialize()
    labels = nodes_ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node": t.column("node"), "label": t.column("node")}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        lab_a = labels.map_batches(
            lambda t: pa.Table.from_pydict(
                {"a": t.column("node"), "label_a": t.column("label")}
            ),
            batch_format="pyarrow",
        )
        with_a = bucketed_hash_join(edges_ds, lab_a, on="a", n_buckets=n_buckets)
        msg_ab = with_a.map_batches(
            lambda t: pa.Table.from_pydict(
                {"node": t.column("b"), "cand": t.column("label_a")}
            ),
            batch_format="pyarrow",
        )
        lab_b = labels.map_batches(
            lambda t: pa.Table.from_pydict(
                {"b": t.column("node"), "label_b": t.column("label")}
            ),
            batch_format="pyarrow",
        )
        with_b = bucketed_hash_join(edges_ds, lab_b, on="b", n_buckets=n_buckets)
        msg_ba = with_b.map_batches(
            lambda t: pa.Table.from_pydict(
                {"node": t.column("a"), "cand": t.column("label_b")}
            ),
            batch_format="pyarrow",
        )
        keep_own = labels.map_batches(
            lambda t: pa.Table.from_pydict(
                {"node": t.column("node"), "cand": t.column("label")}
            ),
            batch_format="pyarrow",
        )
        labels = (
            keep_own.union(msg_ab, msg_ba)
            .groupby("node")
            .aggregate(Min("cand", alias_name="label"))
        ).materialize()
    return labels


def exact_dup_clusters(docs_ds, n_buckets: int = 64, iters: int = 1):
    """(doc_id, cluster_id) for EVERY document: cluster_id = min doc_id
    among documents with identical text (singletons label themselves).

    Exact-dup star edges (content-hash groupby, coarse-bucketed like
    stages/dedup.py) -> connected components.  Star edges have
    diameter 1 from the keeper, so ONE propagation round is exact.
    SQL-oracle-equivalent: ``MIN(doc_id) OVER (PARTITION BY md5(text))``.
    """
    from ..functions.hashing import crc32_bucket
    from .dedup import _text_md5_batch

    hashed = docs_ds.map_batches(_text_md5_batch, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column("__g", crc32_bucket(batch.column("h"), n_buckets))

    def star_edges(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        sizes = g.groupby("h")["doc_id"].transform("size")
        g = g[sizes >= 2]
        if len(g) == 0:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}
            )
        keeper = g.groupby("h")["doc_id"].transform("min")
        rest = g[g["doc_id"] != keeper]
        return pd.DataFrame(
            {"a": keeper[g["doc_id"] != keeper].to_numpy(),
             "b": rest["doc_id"].to_numpy()}
        )

    edges = (
        hashed.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__g")
        .map_groups(star_edges, batch_format="pandas")
    )
    nodes = docs_ds.map_batches(
        lambda t: pa.Table.from_pydict({"node": t.column("doc_id")}),
        batch_format="pyarrow",
    )
    labels = connected_components(edges, nodes, iters=iters, n_buckets=n_buckets)
    return labels.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": t.column("node"), "cluster_id": t.column("label")}
        ),
        batch_format="pyarrow",
    )
