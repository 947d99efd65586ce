"""Microdata-to-RDF kernel tests (kernel/microdata.py) and the
StructuredDataParser-chain mode (walk.distill_structured)."""

from rdfa_ray.kernel.walk import distill_structured
from rdfa_ray.kernel.microdata import extract_microdata
from rdfa_ray.kernel.walk import _MicrodataBnodes
from rdfa_ray.dom.sniff import parse_document
from rdfa_ray.rdf.terms import BNODE, RDF_TYPE, iri, literal

BASE = "http://b.example/doc"


def _md(text):
    doc, _h, _v = parse_document(text)
    return extract_microdata(doc.root, BASE, _MicrodataBnodes())


def test_itemid_typed_item_with_props():
    t = _md(
        '<div itemscope itemtype="http://schema.org/Person"'
        ' itemid="http://people.example/p1">'
        '<span itemprop="name">Ada</span>'
        '<a itemprop="url" href="/ada">home</a>'
        '<meta itemprop="birthDate" content="1815-12-10"></div>'
    )
    p = iri("http://people.example/p1")
    assert (p, RDF_TYPE, iri("http://schema.org/Person")) in t
    assert (p, iri("http://schema.org/name"), literal("Ada")) in t
    assert (p, iri("http://schema.org/url"), iri("http://b.example/ada")) in t
    assert (p, iri("http://schema.org/birthDate"), literal("1815-12-10")) in t


def test_untyped_item_uses_base_hash_vocab():
    t = _md('<div itemscope><span itemprop="note">x</span></div>')
    assert len(t) == 1
    ((s, p, o),) = t
    assert s[0] == BNODE
    assert p == iri(BASE + "#note")
    assert o == literal("x")


def test_nested_itemscope_becomes_object():
    t = _md(
        '<div itemscope itemtype="http://schema.org/Person" itemid="http://e/p">'
        '<div itemprop="address" itemscope itemtype="http://schema.org/PostalAddress">'
        '<span itemprop="addressLocality">Oslo</span></div></div>'
    )
    p = iri("http://e/p")
    addr = [o for (s, pr, o) in t if pr == iri("http://schema.org/address") and s == p]
    assert len(addr) == 1 and addr[0][0] == BNODE
    assert (addr[0], iri("http://schema.org/addressLocality"), literal("Oslo")) in t
    assert (addr[0], RDF_TYPE, iri("http://schema.org/PostalAddress")) in t
    # nested item's props must NOT leak onto the outer item
    assert (p, iri("http://schema.org/addressLocality"), literal("Oslo")) not in t


def test_itemref_pulls_external_properties():
    t = _md(
        '<div itemscope itemtype="http://schema.org/Person" itemid="http://e/p"'
        ' itemref="extra"></div>'
        '<p id="extra"><span itemprop="jobTitle">Engineer</span></p>'
    )
    assert (iri("http://e/p"), iri("http://schema.org/jobTitle"),
            literal("Engineer")) in t


def test_absolute_itemprop_name_stands_alone():
    t = _md(
        '<div itemscope itemtype="http://schema.org/Thing" itemid="http://e/x">'
        '<span itemprop="http://purl.org/dc/terms/title">T</span></div>'
    )
    assert (iri("http://e/x"), iri("http://purl.org/dc/terms/title"),
            literal("T")) in t


def test_multiple_itemprop_names():
    t = _md(
        '<div itemscope itemtype="http://schema.org/Thing" itemid="http://e/x">'
        '<span itemprop="name alternateName">N</span></div>'
    )
    assert (iri("http://e/x"), iri("http://schema.org/name"), literal("N")) in t
    assert (iri("http://e/x"), iri("http://schema.org/alternateName"),
            literal("N")) in t


def test_time_data_meter_value_sources():
    t = _md(
        '<div itemscope itemtype="http://schema.org/Event" itemid="http://e/ev">'
        '<time itemprop="startDate" datetime="2026-08-17">aug</time>'
        '<data itemprop="position" value="3">third</data></div>'
    )
    ev = iri("http://e/ev")
    assert (ev, iri("http://schema.org/startDate"), literal("2026-08-17")) in t
    assert (ev, iri("http://schema.org/position"), literal("3")) in t


def test_structured_mode_unions_rdfa_and_microdata():
    triples, diags = distill_structured(
        '<div itemscope itemtype="http://schema.org/Thing" itemid="http://e/x">'
        '<span itemprop="name">N</span>'
        '<span about="http://e/x" property="http://purl.org/dc/terms/title">T</span>'
        "</div>",
        base=BASE,
    )
    assert (iri("http://e/x"), iri("http://schema.org/name"), literal("N")) in triples
    assert (iri("http://e/x"), iri("http://purl.org/dc/terms/title"),
            literal("T")) in triples


def test_structured_mode_deterministic_bnodes():
    text = '<div itemscope><span itemprop="a">1</span></div>' * 3
    t1, _ = distill_structured(text, base=BASE)
    t2, _ = distill_structured(text, base=BASE)
    assert t1 == t2
