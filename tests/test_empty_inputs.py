"""Empty-input robustness for the round-3 operator families: a 100-TB
pipeline routinely produces empty partitions and occasionally empty
intermediate datasets (a filter that matches nothing); every operator
must return an EMPTY, correctly-typed result — not crash, not emit a
schema-less block."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

EMPTY_TRIPLES = pa.schema(
    [("subj", pa.string()), ("pred", pa.string()), ("obj_value", pa.string())]
)
EMPTY_EDGES = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _empty(schema):
    return rd.from_arrow(schema.empty_table())


def test_bgp_empty_triples(ray_session):
    from rdfa_ray.stages.bgp import bgp_match

    out = bgp_match(
        _empty(EMPTY_TRIPLES), [("?s", "p", "?o")], n_buckets=2
    ).to_pandas()
    assert len(out) == 0


def test_sparql_ops_empty(ray_session):
    from rdfa_ray.stages.sparql import ask, optional_match, path_edges

    e = _empty(EMPTY_TRIPLES)
    assert ask(e, [("?s", "p", "?o")], n_buckets=2) is False
    out = optional_match(
        e, [("?s", "p", "?o")], [("?s", "q", "?v")], n_buckets=2
    ).to_pandas()
    assert len(out) == 0
    assert len(path_edges(e, ("plus", "p"), 2).to_pandas()) == 0


def test_closure_and_pagerank_empty(ray_session):
    from rdfa_ray.stages.closure import transitive_closure
    from rdfa_ray.stages.pagerank import pagerank

    assert len(transitive_closure(_empty(EMPTY_EDGES), n_buckets=2).to_pandas()) == 0
    pr = pagerank(_empty(EMPTY_EDGES), n_buckets=2)
    # Ray's to_pandas() drops schema on 0 rows; the typed contract
    # lives on the Dataset schema
    assert pr.schema().names == ["node", "rank"]
    assert pr.count() == 0


def test_graphops_empty_sides(ray_session):
    from rdfa_ray.stages.graphops import (
        graph_difference,
        graph_intersection,
        graph_union,
    )

    e = _empty(EMPTY_TRIPLES)
    g = rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(["s"], pa.string()),
                "pred": pa.array(["p"], pa.string()),
                "obj_value": pa.array(["o"], pa.string()),
            }
        )
    )
    assert len(graph_intersection(g, e, 2).to_pandas()) == 0
    assert len(graph_difference(e, g, 2).to_pandas()) == 0
    diff = graph_difference(g, e, 2).to_pandas()
    assert len(diff) == 1
    assert len(graph_union(e, e, 2).to_pandas()) == 0
    assert len(graph_union(g, e, 2).to_pandas()) == 1


def test_heavy_hitters_empty(ray_session):
    from rdfa_ray.stages.sketch import heavy_hitters

    e = rd.from_arrow(pa.schema([("v", pa.string())]).empty_table())
    out = heavy_hitters(e, "v", k=4).to_pandas()
    assert len(out) == 0


def test_bloom_empty_sides(ray_session):
    from rdfa_ray.stages.bloom import bloom_semi_join

    sch = pa.schema([("k", pa.int64())])
    e = rd.from_arrow(sch.empty_table())
    g = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    out = bloom_semi_join(
        g, e, on="k", n_buckets=2, left_schema=sch, right_schema=sch
    ).to_pandas()
    assert len(out) == 0
    out = bloom_semi_join(
        e, g, on="k", n_buckets=2, left_schema=sch, right_schema=sch
    ).to_pandas()
    assert len(out) == 0


def test_scrub_empty(ray_session):
    from rdfa_ray.stages.scrub import scrub_documents

    e = rd.from_arrow(
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]).empty_table()
    )
    out = scrub_documents(e).to_pandas()
    assert len(out) == 0


def test_tfidf_empty(ray_session):
    from rdfa_ray.stages.tfidf import tfidf_topk

    e = rd.from_arrow(
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]).empty_table()
    )
    out = tfidf_topk(e, n_docs=1, k=5, n_buckets=2).to_pandas()
    assert len(out) == 0


EMPTY_DOCS = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])


def test_round3_curation_ops_empty(ray_session):
    from rdfa_ray.stages.contamination import extract_needles, flag_contaminated
    from rdfa_ray.stages.dedup import exact_dup_drops
    from rdfa_ray.stages.packing import pack_sequences
    from rdfa_ray.stages.text import quality_gate, repetition_signals

    e = _empty(EMPTY_DOCS)
    assert extract_needles(e) == []
    assert flag_contaminated(e, ["a b c d e f g h"]).count() == 0
    assert exact_dup_drops(e, n_buckets=2).count() == 0
    assert quality_gate(e).count() == 0
    assert repetition_signals(e).count() == 0
    assert pack_sequences(e, budget=8, range_size=2).count() == 0


def test_grouped_aggregate_empty(ray_session):
    from rdfa_ray.stages.bgp import bgp_match
    from rdfa_ray.stages.sparql import grouped_aggregate

    b = bgp_match(_empty(EMPTY_TRIPLES), [("?s", "p", "?o")], n_buckets=2)
    out = grouped_aggregate(
        b, ["s"], [("count", None, "n"), ("sum", "o", "t")], n_buckets=2
    ).to_pandas()
    assert len(out) == 0


def test_kgstore_empty_build(ray_session, tmp_path):
    from rdfa_ray.stages.kgstore import persist_kg, read_kg

    store = str(tmp_path / "kg")
    meta = persist_kg(_empty(EMPTY_TRIPLES), store)
    assert meta["partitions"] == {}
    assert read_kg(store).count() == 0
    assert read_kg(store, preds=["http://x/p"]).count() == 0


def test_sparql_text_empty_graph(ray_session):
    from rdfa_ray.stages.sparql_text import execute

    out = execute(
        _empty(EMPTY_TRIPLES),
        "SELECT ?s WHERE { ?s <http://x/p> ?o }",
        n_buckets=2,
    ).to_pandas()
    # Ray's to_pandas drops column schemas for all-empty datasets (the
    # blocks themselves are typed); assert emptiness, not columns
    assert len(out) == 0


def test_outer_join_empty_sides(ray_session):
    from rdfa_ray.stages.join import bucketed_hash_join

    l = _empty(pa.schema([("k", pa.int64()), ("x", pa.string())]))
    r = rd.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "y": pa.array(["Y"], pa.string())})
    )
    out = bucketed_hash_join(
        l, r, on="k", how="outer", n_buckets=2,
        left_schema=pa.schema([("k", pa.int64()), ("x", pa.string())]),
        right_schema=pa.schema([("k", pa.int64()), ("y", pa.string())]),
    ).to_pandas()
    assert len(out) == 1 and out["y"].iloc[0] == "Y" and pd.isna(out["x"].iloc[0])


def test_late_round3_ops_empty(ray_session):
    from rdfa_ray.stages.graphalgo import neighbor_similarity
    from rdfa_ray.stages.jsonx import json_field
    from rdfa_ray.stages.lmscore import bigram_logppl
    from rdfa_ray.stages.profile import profile_table
    from rdfa_ray.stages.quantile import grouped_quantiles_cont

    ee = _empty(EMPTY_EDGES)
    assert neighbor_similarity(ee, n_buckets=2).count() == 0

    ed = _empty(EMPTY_DOCS)
    assert bigram_logppl(ed).count() == 0
    prof = profile_table(ed, ["doc_id", "text"])
    # profiler over zero rows: one row per column, n = 0, all-null mins
    assert len(prof) in (0, 2)
    if len(prof):
        assert (prof["n"] == 0).all()

    js = pa.schema([("doc", pa.string())])
    assert json_field(_empty(js), "doc", "k", out="k").count() == 0

    q = pa.schema([("g", pa.string()), ("v", pa.int64())])
    assert grouped_quantiles_cont(_empty(q), "g", "v", [50]).count() == 0


def test_zorder_empty_domain_but_no_rows(ray_session, tmp_path):
    from rdfa_ray.stages.layout import zorder_key

    t = pa.schema([("x", pa.int64()), ("y", pa.int64())]).empty_table()
    out = zorder_key(t, ["x", "y"], {"x": (0, 10), "y": (0, 10)})
    assert out.num_rows == 0 and "zkey" in out.column_names
