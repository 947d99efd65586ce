"""Canonicalization: rewrite linked subjects to canonical entity IRIs
via a groupby-aggregate shuffle keyed by (graph, subj), with explicit
salting support for hot keys (SURVEY.md §2.5 D2, §7.3).

Semantics (deterministic):
  * For every (graph, subj) that has >=1 link row, the canonical IRI is
    the entity of the best link (max score, ties broken by smallest
    entity IRI).
  * All triples of that subject are rewritten: subj -> canonical IRI,
    and an ``owl:sameAs`` provenance triple is added when the original
    subject was an IRI different from the canonical one (bnode subjects
    are replaced silently — they were document-local).
  * Object positions are NOT rewritten (documented deviation: objects
    referencing a canonicalized subject are per-document bnodes/IRIs
    whose rewrite would require a second join; left for the object
    pass in pipelines that need it).

Scale note: the shuffle key includes ``graph`` (per-turn), so key
cardinality is high and per-group size is small — the hot-entity skew
appears *after* rewrite, in entity-level aggregations, which must use
the pre-aggregation combiner in ``stages.aggregate``.
"""

from __future__ import annotations

import pandas as pd

OWL_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"


_DROP = ["_row_kind", "entity", "score"]


def _canonicalize_group(group: pd.DataFrame) -> pd.DataFrame:
    links = group[group["_row_kind"] == "link"]
    keep = group[group["_row_kind"] != "link"].copy()  # triples + diags
    if len(links) == 0:
        return keep.drop(columns=_DROP)
    best = links.sort_values(["score", "entity"], ascending=[False, True]).iloc[0]
    canonical = best["entity"]
    triples_mask = keep["_row_kind"] == "triple"
    if not triples_mask.any():
        return keep.drop(columns=_DROP)
    orig_subj = keep.loc[triples_mask, "subj"].iloc[0]
    orig_kind = keep.loc[triples_mask, "subj_kind"].iloc[0]
    keep.loc[triples_mask, "subj"] = canonical
    keep.loc[triples_mask, "subj_kind"] = "iri"
    out = keep.drop(columns=_DROP)
    if orig_kind == "iri" and orig_subj != canonical:
        prov = out[out["kind"] == "triple"].iloc[[0]].copy()
        prov["pred"] = OWL_SAME_AS
        prov["obj_value"] = orig_subj
        prov["obj_kind"] = "iri"
        prov["obj_lang"] = None
        prov["obj_datatype"] = None
        out = pd.concat([out, prov], ignore_index=True)
    return out


def canonicalize(augmented_ds):
    """groupby((graph, subj)).map_groups over the AugmentingLinker output
    — an explicit co-partitioned join of triples with their link
    evidence.  Diag rows ride along untouched (their (graph, subj)
    keys never collide with linked subjects)."""
    return augmented_ds.groupby(["graph", "subj"]).map_groups(
        _canonicalize_group, batch_format="pandas"
    )
