"""Canonicalization: rewrite linked subjects to canonical entity IRIs
(SURVEY.md §2.5 D2, §7.3).

Semantics (deterministic):
  * For every (graph, subj) with >=1 link row, the canonical IRI is the
    entity of the best link (max score, ties broken by smallest entity
    IRI).
  * All triples of that subject are rewritten subj -> canonical IRI;
    an ``owl:sameAs`` provenance triple is added when the original
    subject was a non-bnode IRI different from the canonical one
    (bnode subjects are replaced silently — they were document-local).
  * Object positions referencing a canonicalized subject in the same
    graph are rewritten too (a second vectorized merge keyed on
    (graph, obj_value)), so intra-document edges stay consistent.

Physical plan: an explicit partitioned hash join — both row kinds get
``bucket = crc32(graph|subj) % B``; ``groupby(bucket)`` co-locates a
subject's triples with its link evidence; inside each bucket the work
is a VECTORIZED pandas merge (never per-(graph,subj) Python calls —
group cardinality is ~rows/3, and per-group overhead dominated an
earlier map_groups implementation).  Keys include the per-turn graph
IRI, so bucket load is uniform; genuinely hot keys would be salted by
raising B and sub-splitting (see stages.aggregate for the combiner
alternative used for algebraic aggregates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

OWL_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"

N_BUCKETS = 256

_DROP = ["_row_kind", "entity", "score", "bucket"]


def _add_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    # bucket by graph (per-turn document IRI): co-locates a document's
    # whole triple set, which both the subject- and the object-position
    # rewrites need; per-graph size is bounded by document size, so the
    # key is uniform (hot ENTITIES only emerge after rewrite, in
    # downstream aggregates — see stages.aggregate combiners).
    # crc32 over batch-unique graphs (vectorized broadcast), identical
    # assignment to the per-row list-comp it replaces.
    from ..functions.hashing import crc32_bucket

    return batch.append_column(
        "bucket", crc32_bucket(batch.column("graph"), n_buckets)
    )


def _canonicalize_bucket(bucket_df: pd.DataFrame) -> pd.DataFrame:
    links = bucket_df[bucket_df["_row_kind"] == "link"]
    keep = bucket_df[bucket_df["_row_kind"] != "link"]
    if len(links) == 0:
        return keep.drop(columns=_DROP, errors="ignore")

    # best link per (graph, subj): max score, then smallest entity IRI
    best = (
        links.sort_values(["graph", "subj", "score", "entity"],
                          ascending=[True, True, False, True])
        .drop_duplicates(["graph", "subj"])[["graph", "subj", "entity"]]
        .rename(columns={"entity": "_canonical"})
    )

    keep = keep.merge(best, on=["graph", "subj"], how="left")
    matched = keep["_canonical"].notna() & (keep["_row_kind"] == "triple")

    # provenance rows BEFORE rewriting (need the original subject)
    prov_src = keep[
        matched & (keep["subj_kind"] == "iri") & (keep["subj"] != keep["_canonical"])
    ].drop_duplicates(["graph", "subj"])
    prov = prov_src.copy()
    if len(prov):
        prov["pred"] = OWL_SAME_AS
        prov["obj_value"] = prov["subj"]
        prov["obj_kind"] = "iri"
        prov["obj_lang"] = None
        prov["obj_datatype"] = None

    keep.loc[matched, "subj"] = keep.loc[matched, "_canonical"]
    keep.loc[matched, "subj_kind"] = "iri"

    # object-position rewrite: references to a canonicalized subject
    # (within the same graph — bnodes/IRIs are document-scoped, and the
    # partition co-locates the whole graph) follow it to the canonical
    # IRI, keeping intra-document edges consistent
    obest = best.rename(columns={"subj": "obj_value", "_canonical": "_ocanon"})
    keep = keep.merge(obest, on=["graph", "obj_value"], how="left")
    omatched = (
        keep["_ocanon"].notna()
        & (keep["_row_kind"] == "triple")
        & keep["obj_kind"].isin(["iri", "bnode"])
    )
    keep.loc[omatched, "obj_value"] = keep.loc[omatched, "_ocanon"]
    keep.loc[omatched, "obj_kind"] = "iri"

    if len(prov):
        prov["subj"] = prov["_canonical"]
        prov["subj_kind"] = "iri"
        keep = pd.concat([keep, prov], ignore_index=True)
    return keep.drop(columns=_DROP + ["_canonical", "_ocanon"], errors="ignore")


def canonicalize(augmented_ds, n_buckets: int = N_BUCKETS,
                 pre_blocks: int = 64):
    """Bucketed vectorized join over the AugmentingLinker output.
    Diag rows ride along untouched.

    ``pre_blocks``: narrow (no-shuffle) repartition before the
    exchange — Ray's sort-based groupby inherits its reduce-task count
    from its INPUT block count, and the fused read->distill->link
    chain bundles small reads into a couple of giant map tasks, which
    serialized the canonicalize kernel into 2 reduce tasks (measured
    2 x 1.8 s at sf0.1; 2.5 s -> 1.0 s of exchange+kernel after the
    split).  0 disables."""
    if pre_blocks:
        augmented_ds = augmented_ds.repartition(pre_blocks)
    bucketed = augmented_ds.map_batches(
        lambda b: _add_bucket(b, n_buckets), batch_format="pyarrow"
    )
    return bucketed.groupby("bucket").map_groups(
        _canonicalize_bucket, batch_format="pandas"
    )
