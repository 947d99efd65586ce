"""Tests for the distributed N-Triples file source
(rdflib/plugins/parsers/ntriples.py parity at the wire-format level)."""

import os

import pyarrow as pa
import ray.data as rd

from rdfa_ray.rdf.ntriples import graph_to_ntriples
from rdfa_ray.rdf.terms import BNODE, IRI, LIT
from rdfa_ray.sources.ntfiles import read_ntriples

TRIPLES = {
    ((IRI, "http://ex/s"), (IRI, "http://ex/p"), (IRI, "http://ex/o")),
    ((IRI, "http://ex/s"), (IRI, "http://ex/p"), (LIT, 'esc "q\\t\n', None, None)),
    ((BNODE, "b0"), (IRI, "http://ex/p"), (LIT, "de", "de", None)),
    (
        (IRI, "http://ex/s2"),
        (IRI, "http://ex/p"),
        (LIT, "42", None, "http://www.w3.org/2001/XMLSchema#integer"),
    ),
}


def test_read_ntriples_roundtrip(ray_session, tmp_path):
    text = graph_to_ntriples(TRIPLES)
    # split across two files: any line partitioning is valid
    lines = [ln for ln in text.splitlines() if ln.strip()]
    (tmp_path / "a.nt").write_text("\n".join(lines[:2]) + "\n# comment\n")
    (tmp_path / "b.nt").write_text("\n".join(lines[2:]) + "\n")

    ds = read_ntriples([str(tmp_path / "a.nt"), str(tmp_path / "b.nt")])
    df = ds.to_pandas()
    assert len(df) == len(TRIPLES)

    got = set()
    for r in df.itertuples(index=False):
        if r.obj_kind == "literal":
            o = (LIT, r.obj_value, r.obj_lang or None, r.obj_datatype or None)
        else:
            o = (BNODE if r.obj_kind == "bnode" else IRI, r.obj_value)
        s = (BNODE if r.subj_kind == "bnode" else IRI, r.subj)
        got.add((s, (IRI, r.pred), o))
    assert got == TRIPLES


def test_read_nquads_preserves_graphs(ray_session, tmp_path):
    """The flagship sink emits N-Quads; the file source must read the
    graph term back (round-3 fix: quads silently projected to triples,
    dropping the named graph)."""
    import pyarrow as pa

    from rdfa_ray.rdf.ntriples import nquads_lines_arrow
    from rdfa_ray.sources.ntfiles import read_ntriples

    quads = pa.table(
        {
            "subj": pa.array(["http://s1", "_:b0"]),
            "subj_kind": pa.array(["iri", "bnode"]),
            "pred": pa.array(["http://p", "http://p"]),
            "obj_value": pa.array(["hello", "http://o"]),
            "obj_kind": pa.array(["literal", "iri"]),
            "obj_lang": pa.array(["en", ""]),
            "obj_datatype": pa.array(["", ""]),
            "graph": pa.array(["http://g/1", "http://g/2"]),
        }
    )
    path = tmp_path / "out.nq"
    path.write_text("\n".join(nquads_lines_arrow(quads).to_pylist()) + "\n")
    df = read_ntriples(str(path)).to_pandas().sort_values("subj")
    assert sorted(df["graph"]) == ["http://g/1", "http://g/2"]
    row = df[df["subj"] == "http://s1"].iloc[0]
    assert (row["obj_value"], row["obj_lang"], row["graph"]) == (
        "hello", "en", "http://g/1"
    )
