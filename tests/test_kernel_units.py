"""Unit tests for kernel pieces not covered by the corpus fixtures:
opt-in transformers (T6-T10), datatype sniffing edges, bnode
determinism, vocab closure, and the turtle subset parser."""

from rdfa_ray.kernel import KernelOptions, distill
from rdfa_ray.kernel.state import BnodeGen
from rdfa_ray.kernel.transform import (
    DATETIME_TYPE,
    DURATION_TYPE,
    G_YEAR,
    PLAIN,
    dublincore_transform,
    format_test,
    meta_transform,
    openid_transform,
)
from rdfa_ray.kernel.vocab import build_expansion_maps, expand_data_graph, schema_closure
from rdfa_ray.kernel.embedded import parse_turtle
from rdfa_ray.rdf.terms import iri, literal

BASE = "http://www.example.org/t"


def test_meta_transform():
    opts = KernelOptions(transformers=(meta_transform,))
    g, d = distill(
        '<html><head><meta name="author" content="Jo"/></head><body about="#x">t</body></html>',
        base=BASE,
        options=opts,
    )
    # meta@name -> @property; 'author' is not a defined term in html5 ->
    # warning, no triple; use a CURIE-valued name instead
    opts = KernelOptions(transformers=(meta_transform,))
    g, d = distill(
        '<html prefix="dc: http://purl.org/dc/terms/"><head>'
        '<meta name="dc:creator" content="Jo"/></head><body>t</body></html>',
        base=BASE,
        options=opts,
    )
    assert (iri(BASE), iri("http://purl.org/dc/terms/creator"), literal("Jo")) in g


def test_openid_transform():
    opts = KernelOptions(transformers=(openid_transform,))
    g, d = distill(
        '<html><head><link rel="openid.server" href="http://server.example.com/"/>'
        "</head><body>t</body></html>",
        base=BASE,
        options=opts,
    )
    assert (
        iri(BASE),
        iri("http://xmlns.openid.net/auth#server"),
        iri("http://server.example.com/"),
    ) in g


def test_dublincore_transform():
    opts = KernelOptions(transformers=(dublincore_transform,))
    g, d = distill(
        '<html><head><link rel="schema.DC" href="http://purl.org/dc/elements/1.1/"/>'
        '<meta name="DC.Creator" content="Ada"/></head><body>t</body></html>',
        base=BASE,
        options=opts,
    )
    assert (iri(BASE), iri("http://purl.org/dc/elements/1.1/Creator"), literal("Ada")) in g


def test_lite_check_warns():
    opts = KernelOptions(check_lite=True)
    g, d = distill('<div rel="next" about="#a" resource="#b">x</div>', base=BASE, options=opts)
    assert any("RDFa Lite" in x.message for x in d)


def test_atom_host():
    g, d = distill(
        '<feed xmlns="http://www.w3.org/2005/Atom"><entry>'
        '<title property="title">Hello</title></entry></feed>',
        base=BASE,
    )
    # atom default vocab = iana relations; entry gets typeof="" -> bnode subject
    assert any(
        p == iri("http://www.iana.org/assignments/relation/title") for (s, p, o) in g
    )


def test_format_test_edges():
    assert format_test("2012") == G_YEAR
    assert format_test("P3DT2H") == DURATION_TYPE
    # "-P3D": the reference's negative-duration branch (host/html5.py:88-95)
    # re-runs strptime on the full string incl. the '-' which never
    # matches -> plain; reproduced faithfully
    assert format_test("-P3D") == PLAIN
    assert format_test("2012-03-18T12:00:00+05:30") == DATETIME_TYPE
    assert format_test("not a date") == PLAIN
    assert format_test("P3X") == PLAIN


def test_bnode_gen_determinism():
    g1 = BnodeGen()
    g2 = BnodeGen()
    seq1 = [g1.new(), g1.for_curie_ref("x"), g1.new(), g1.for_curie_ref("x")]
    seq2 = [g2.new(), g2.for_curie_ref("x"), g2.new(), g2.for_curie_ref("x")]
    assert seq1 == seq2
    assert seq1[1] == seq1[3]  # stable per-doc _:x
    assert g1.for_curie_ref("") == g1.for_curie_ref("")  # the empty bnode


def test_vocab_closure_chains():
    sub = iri("http://www.w3.org/2000/01/rdf-schema#subPropertyOf")
    a, b, c = iri("http://v/a"), iri("http://v/b"), iri("http://v/c")
    schema = {(a, sub, b), (b, sub, c)}
    closed = schema_closure(schema)
    assert (a, sub, c) in closed
    pmap, cmap = build_expansion_maps(schema)
    data = {(iri("http://x/s"), a, literal("v"))}
    out = expand_data_graph(data, pmap, cmap)
    assert (iri("http://x/s"), c, literal("v")) in out


def test_turtle_subset():
    bn = BnodeGen()
    g = parse_turtle(
        """
        @prefix ex: <http://e/> .
        @base <http://b/> .
        <doc> ex:p "v"@en , "w"^^ex:dt ;
              ex:q 3.14 ;
              ex:r [ ex:nested true ] .
        _:x a ex:T .
        """,
        "http://orig/",
        bn,
    )
    assert (iri("http://b/doc"), iri("http://e/p"), literal("v", "en")) in g
    assert (iri("http://b/doc"), iri("http://e/p"), literal("w", datatype="http://e/dt")) in g
    assert any(
        p == iri("http://e/nested") and o == literal("true", datatype="http://www.w3.org/2001/XMLSchema#boolean")
        for (s, p, o) in g
    )


def test_malformed_never_crashes():
    bad = [
        "<div about='[' property='x'>",
        "<?xml version='1.0'?><not-closed",
        "<div prefix='a'>x</div>",
        "\x00\x01\x02",
        "<div about='" + "x" * 100000 + "'>big</div>",
    ]
    for t in bad:
        g, d = distill(t, base=BASE)  # must not raise


def test_rdfa10_pin_and_hturtle():
    from rdfa_ray.kernel.walk import distill_rdfa10, extract_hturtle

    doc = (
        '<div about="#a" prefix="ex: http://e/"><span property="ex:p">a<b>x</b></span></div>'
        '<script type="text/turtle">@prefix ex: <http://e/> . <#t> ex:q "v" .</script>'
    )
    # pinned 1.0: @prefix ignored, auto-XMLLiteral path; turtle still extracted
    g10, d10 = distill_rdfa10(doc, base=BASE)
    assert not any(p == iri("http://e/p") for (s, p, o) in g10)
    assert (iri(BASE + "#t"), iri("http://e/q"), literal("v")) in g10
    # hturtle-only: RDFa attributes ignored entirely
    ght, dht = extract_hturtle(doc, base=BASE)
    assert ght == {(iri(BASE + "#t"), iri("http://e/q"), literal("v"))}


def test_processor_graph_triples():
    from rdfa_ray.kernel.options import diagnostics_to_triples
    from rdfa_ray.kernel.state import BnodeGen
    from rdfa_ray.rdf.terms import IRI

    g, d = distill('<div about="[undef:x]" property="ex:p">v</div>', base=BASE)
    assert d
    triples = diagnostics_to_triples(d, BnodeGen())
    types = {o[1] for (s, p, o) in triples if p[1].endswith("#type")}
    assert "http://www.w3.org/ns/rdfa#Warning" in types
    assert "http://www.w3.org/ns/rdfa#UnresolvedCURIE" in types
    assert any(p[1].endswith("description") for (s, p, o) in triples)
