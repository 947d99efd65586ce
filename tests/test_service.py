"""processURI-analogue service tests (rdfa_ray/service.py)."""

from rdfa_ray.kernel.embedded import parse_turtle
from rdfa_ray.kernel.state import BnodeGen
from rdfa_ray.rdf.isomorphism import isomorphic
from rdfa_ray.rdf.ntriples import parse_ntriples
from rdfa_ray.service import process_source

DOC = (
    '<div vocab="http://schema.org/" about="#x" typeof="Person">'
    '<span property="name">Ada</span></div>'
)
BASE = "http://svc.example/doc"


def test_turtle_default_output():
    mt, body = process_source(DOC, base=BASE)
    assert mt == "text/turtle"
    graph = parse_turtle(body, "", BnodeGen())
    assert any(p[1] == "http://schema.org/name" for (_, p, _) in graph)


def test_unknown_format_raises_loudly():
    # deliberate deviation from the reference's silent turtle fallback
    # (pyRdfa/__init__.py:464): a silent format switch corrupts
    # downstream consumers
    import pytest

    with pytest.raises(ValueError, match="unknown output format"):
        process_source(DOC, "n3000", base=BASE)


def test_reference_alias_matrix():
    # every name the reference accepts (pyRdfa/__init__.py:464 + the
    # documented 'json' synonym at :694) resolves to the right
    # serializer + media type
    want_mt = {
        "turtle": "text/turtle",
        "n3": "text/turtle",
        "xml": "application/rdf+xml",
        "pretty-xml": "application/rdf+xml",
        "nt": "text/plain",
        "json-ld": "application/ld+json",
        "json": "application/ld+json",
    }
    for name, mt in want_mt.items():
        got_mt, body = process_source(DOC, name, base=BASE)
        assert got_mt == mt, name
        assert body


def test_nt_output_parses():
    mt, body = process_source(DOC, "nt", base=BASE)
    assert mt == "text/plain"
    graph = parse_ntriples(body)
    assert len(graph) == 3  # type + name + usesVocabulary


def test_formats_agree():
    from rdfa_ray.rdf.jsonld import jsonld_to_graph
    from rdfa_ray.rdf.rdfxml import rdfxml_to_graph

    _, nt = process_source(DOC, "nt", base=BASE)
    want = parse_ntriples(nt)
    _, ttl = process_source(DOC, "turtle", base=BASE)
    _, xml = process_source(DOC, "xml", base=BASE)
    _, jd = process_source(DOC, "json", base=BASE)
    assert isomorphic(parse_turtle(ttl, "", BnodeGen()), want)
    assert isomorphic(rdfxml_to_graph(xml, BnodeGen()), want)
    assert isomorphic(jsonld_to_graph(jd, BnodeGen()), want)


def test_processor_graph_selection():
    broken = '<div about="[undef:x]" property="undef:y">v</div>'
    # output only (default): the bad safe-CURIE subject falls back to
    # base; 'undef:y' still resolves as an absolute IRI (RDFa 1.1
    # TERMorCURIEorAbsURI semantics) -> exactly one triple
    _, body = process_source(broken, "nt", base=BASE)
    out = parse_ntriples(body)
    assert out == {(("iri", BASE), ("iri", "undef:y"), ("lit", "v", None, None))}
    # processor graph carries the warnings as RDF
    _, body = process_source(broken, "nt", form={"graph": "processor"}, base=BASE)
    pg = parse_ntriples(body)
    assert any(
        o[1] == "http://www.w3.org/ns/rdfa#Warning"
        for (_, p, o) in pg
        if p[1].endswith("type")
    )
    # both graphs merged
    _, body = process_source(
        DOC, "nt", form={"graph": "output,processor"}, base=BASE
    )
    assert len(parse_ntriples(body)) >= 3


def test_embedded_rdf_default_differs_from_library():
    # CGI default embedded_rdf=False (reference __init__.py:853) vs the
    # library default True
    doc = (
        '<script type="text/turtle">@prefix ex: <http://e/> .'
        " <http://s/> ex:p 1 .</script>"
    )
    _, body = process_source(doc, "nt", base=BASE)
    assert parse_ntriples(body) == set()
    _, body = process_source(doc, "nt", form={"embedded_rdf": "true"}, base=BASE)
    assert len(parse_ntriples(body)) == 1
    # old '-' spelling accepted too
    _, body = process_source(doc, "nt", form={"embedded-rdf": "true"}, base=BASE)
    assert len(parse_ntriples(body)) == 1


def test_rdfa_version_pin():
    doc = (
        '<div about="#a" typeof=""><span property="http://e/p">v</span></div>'
    )
    _, v11 = process_source(doc, "nt", base=BASE)
    _, v10 = process_source(doc, "nt", form={"rdfa_version": "1.0"}, base=BASE)
    # both produce something deterministic; 1.0 literal rules differ on
    # other inputs — here just assert the pin is honored without crash
    assert isinstance(v11, str) and isinstance(v10, str)
