"""RDF term model.

The reference uses rdflib ``URIRef`` / ``BNode`` / ``Literal`` objects
(imported at ``/root/reference/pyRdfa/__init__.py:182-184``).  Here a
term is a plain tuple — hashable, comparable, cheap to build in the hot
per-turn kernel, and trivially flattened into Arrow columns:

* IRI      -> ``("iri", value)``
* BNode    -> ``("bnode", label)``          (label without the ``_:``)
* Literal  -> ``("lit", value, lang, datatype)``  (lang/datatype: str | None)

A triple is a 3-tuple of terms.  A "graph" in the kernel is a
``set`` of triples (rdflib Graph set semantics: duplicate ``add`` is a
no-op — mirrors e.g. ``/root/reference/pyRdfa/parse.py:254``).
"""

from __future__ import annotations

IRI = "iri"
BNODE = "bnode"
LIT = "lit"

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RDFA_NS = "http://www.w3.org/ns/rdfa#"
XHV_NS = "http://www.w3.org/1999/xhtml/vocab#"
OWL_NS = "http://www.w3.org/2002/07/owl#"

RDF_TYPE = (IRI, RDF_NS + "type")
RDF_FIRST = (IRI, RDF_NS + "first")
RDF_REST = (IRI, RDF_NS + "rest")
RDF_NIL = (IRI, RDF_NS + "nil")
RDF_XMLLITERAL = RDF_NS + "XMLLiteral"
RDF_HTML = RDF_NS + "HTML"
RDFA_USES_VOCABULARY = (IRI, RDFA_NS + "usesVocabulary")
RDFA_PATTERN = (IRI, RDFA_NS + "Pattern")
RDFA_COPY = (IRI, RDFA_NS + "copy")


def iri(value: str):
    return (IRI, value)


def bnode(label: str):
    return (BNODE, label)


def literal(value: str, lang: str | None = None, datatype: str | None = None):
    # rdflib Literal ignores lang when a datatype is present; the kernel
    # only ever passes one of the two, but normalize defensively.
    if datatype:
        return (LIT, value, None, datatype)
    return (LIT, value, lang if lang else None, None)


def is_iri(term) -> bool:
    return term[0] == IRI


def is_bnode(term) -> bool:
    return term[0] == BNODE


def is_literal(term) -> bool:
    return term[0] == LIT


def term_value(term) -> str:
    return term[1]
