"""Tests for RDF graph set operations (rdflib Graph + / & / - and
rdflib.compare.graph_diff parity — rdflib/graph.py, rdflib/compare.py)."""

import pyarrow as pa
import ray.data as rd

from rdfa_ray.stages.graphops import (
    graph_diff,
    graph_difference,
    graph_intersection,
    graph_union,
)


def _g(rows):
    subj, pred, obj = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "subj": pa.array(subj, pa.string()),
                "pred": pa.array(pred, pa.string()),
                "obj_value": pa.array(obj, pa.string()),
            }
        )
    )


A = [("s1", "p", "o1"), ("s2", "p", "o2"), ("s3", "p", "o3")]
B = [("s2", "p", "o2"), ("s3", "p", "o3"), ("s4", "p", "o4")]


def _rows(ds):
    df = ds.to_pandas()
    cols = [c for c in ("subj", "pred", "obj_value", "region") if c in df.columns]
    return sorted(map(tuple, df[cols].to_records(index=False).tolist()))


def test_intersection_difference_union(ray_session):
    a, b = _g(A), _g(B)
    assert _rows(graph_intersection(a, b, 4)) == sorted(B[:2])
    assert _rows(graph_difference(a, b, 4)) == [("s1", "p", "o1")]
    assert _rows(graph_difference(b, a, 4)) == [("s4", "p", "o4")]
    assert _rows(graph_union(a, b, 4)) == sorted(set(A) | set(B))


def test_set_semantics_with_duplicates(ray_session):
    # multiset inputs collapse to sets, like rdflib Graphs
    a = _g(A + A)
    b = _g(B + B[:1])
    assert _rows(graph_intersection(a, b, 4)) == sorted(B[:2])
    assert _rows(graph_difference(a, b, 4)) == [("s1", "p", "o1")]
    assert _rows(graph_union(a, b, 4)) == sorted(set(A) | set(B))


def test_graph_diff_labels(ray_session):
    got = _rows(graph_diff(_g(A), _g(B), 4))
    want = sorted(
        [t + ("both",) for t in B[:2]]
        + [("s1", "p", "o1", "only_a"), ("s4", "p", "o4", "only_b")]
    )
    assert got == want
