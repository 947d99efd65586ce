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


def test_malformed_lines_raise_typed_value_error():
    """Truncated terms / unknown escapes must surface as ValueError —
    never raw IndexError/KeyError (garbage-fuzz regressions)."""
    import pytest

    from rdfa_ray.rdf.ntriples import parse_nquads

    for bad in [
        '<urn:a> <urn:p  "x <urn:g>\n .',        # unterminated IRI-ish
        '<urn:a> <urn:p> "x\\q" .',               # unknown escape
        '<urn:a> <urn:p> "unterminated .',        # unterminated literal
        '_',                                       # lone underscore
        '<urn:a> <urn:p> "v"^^urn:dt .',          # datatype missing <
    ]:
        with pytest.raises(ValueError):
            parse_nquads(bad)


def test_on_malformed_skip_quarantines_bad_lines(ray_session, tmp_path):
    """A corrupt line in one shard must not kill a 100-TB read:
    on_malformed='skip' drops it and keeps every good statement."""
    from rdfa_ray.sources.ntfiles import read_ntriples

    path = tmp_path / "dirty.nt"
    path.write_text(
        '<urn:a> <urn:p> "good" .\n'
        '<urn:a> <urn:p "truncated .\n'
        '<urn:b> <urn:p> <urn:c> .\n'
    )
    import pytest

    with pytest.raises(Exception):  # default: typed failure, read dies
        read_ntriples(str(path)).to_pandas()
    df = read_ntriples(str(path), on_malformed="skip").to_pandas()
    assert sorted(df["subj"]) == ["urn:a", "urn:b"]


def test_jsonld_reader_accepts_array_and_rejects_garbage():
    from rdfa_ray.kernel.state import BnodeGen
    from rdfa_ray.rdf.jsonld import jsonld_to_graph

    # bare top-level node array is valid JSON-LD shape
    g = jsonld_to_graph(
        '[{"@id": "urn:a", "http://p": [{"@value": "x"}]}]', BnodeGen()
    )
    assert len(g) == 1
    # structural garbage -> ValueError, never AttributeError/KeyError
    import pytest

    for bad in [
        '"just a string"',
        '{"@context": [], "@graph": []}',
        '{"@graph": [["not", "a", "node"]]}',
        '{"@graph": [{"no_id": 1}]}',
        '{"@graph": [{"@id": "urn:a", "http://p": [{"@value": "x", '
        '"@list": 3}]}]}',
    ]:
        with pytest.raises(ValueError):
            jsonld_to_graph(bad, BnodeGen())


def test_parse_error_classes_are_value_errors():
    """One typed failure mode across every read surface: callers can
    catch ValueError for any malformed input document."""
    from rdfa_ray.dom.xml_builder import XMLParseError
    from rdfa_ray.kernel.embedded import EmbeddedParseError

    assert issubclass(XMLParseError, ValueError)
    assert issubclass(EmbeddedParseError, ValueError)


def test_markup_files_source(ray_session, tmp_path):
    """Directory-of-HTML-files source: the reference CLI's file mode as
    a Ray Data source — decode errors quarantine under
    on_malformed='skip', and rows feed the distiller unchanged."""
    import pytest

    from rdfa_ray.pipelines.flagship import build_triples
    from rdfa_ray.sources.markupfiles import read_markup_documents

    html = (
        '<!DOCTYPE html><html prefix="schema: http://schema.org/"><body>'
        '<div about="#me" typeof="schema:Person">'
        '<span property="schema:name">Doc %d</span></div></body></html>'
    )
    for i in range(3):
        (tmp_path / ("doc%d.html" % i)).write_text(html % i)
    (tmp_path / "bad.html").write_bytes(b"\xff\xfe\x00garbage\x80")

    with pytest.raises(Exception):  # undecodable file fails loudly
        read_markup_documents(str(tmp_path)).materialize()

    turns = read_markup_documents(str(tmp_path), on_malformed="skip")
    df = turns.to_pandas()
    assert len(df) == 3
    assert set(df["tool"]) == {"text/html"}
    assert all(df["conv_id"].str.endswith(".html"))

    out = build_triples(turns).to_pandas()
    triples = out[out["kind"] == "triple"]
    # 2 triples per doc: rdf:type + schema:name
    assert len(triples) == 6
    assert set(triples["pred"]) == {
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://schema.org/name",
    }


def test_parse_query_two_call_workflow(ray_session, tmp_path):
    """rdflib-parity happy path: rdfa_ray.parse(dir) -> rdfa_ray.query —
    Graph().parse + graph.query in two distributed calls."""
    import rdfa_ray

    html = (
        '<!DOCTYPE html><html prefix="schema: http://schema.org/"><body>'
        '<div about="#me" typeof="schema:Person">'
        '<span property="schema:name">P%d</span></div></body></html>'
    )
    for i in range(3):
        (tmp_path / ("d%d.html" % i)).write_text(html % i)
    g = rdfa_ray.parse(str(tmp_path))
    res = rdfa_ray.query(
        g,
        'SELECT ?n WHERE { ?p a <http://schema.org/Person> ; '
        '<http://schema.org/name> ?n }',
    ).to_pandas()
    assert sorted(res["n"]) == ["P0", "P1", "P2"]
    # ntriples format routes to the file source
    nt = tmp_path / "x.nt"
    nt.write_text('<urn:a> <urn:p> "v" .\n')
    assert rdfa_ray.parse(str(nt), format="ntriples").count() == 1
    import pytest

    with pytest.raises(ValueError):
        rdfa_ray.parse(str(nt), format="turtle-files")
